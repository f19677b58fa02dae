"""Sessionization — gap-based session windows over an event stream.

The reference has no session operator (SURVEY §2.8: session windows /
mapGroupsWithState unused); a training-data pipeline needs one (user
behavior slicing, conversation threading).  Two tiers:

- **Batch** (:func:`sessionize`): the classic gap-and-islands plan —
  a lag window flags session starts, a running sum numbers sessions,
  one aggregation emits session rows.  Exactly two shuffles on
  ``user_id`` (the window sort and the final groupBy share the hash
  partitioning, so Catalyst reuses the exchange).  SQL-expressible ⇒
  DuckDB-oracle-checked.

- **Streaming** (:func:`sessionize_stream`): custom stateful operator
  via ``applyInPandasWithState`` — per-user state carries the open
  session; an event-time timeout (watermark-driven) closes and emits
  sessions after ``gap`` of inactivity.  State is O(active users), not
  O(events): the scale-critical property.
"""

from __future__ import annotations

import datetime as _dt

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", IntegerType()),
    ]
)


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Batch gap-based sessions: a new session starts when the gap to
    the previous event of the same user exceeds ``gap_seconds``."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = F.col(ts_col).cast("double") - F.lag(F.col(ts_col)).over(w).cast("double")
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    numbered = events.withColumn("session_no", F.sum(is_new).over(w))
    return (
        numbered.groupBy(F.col(user_col).alias("user_id"), "session_no")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").cast("int").alias("n_events"),
        )
        .select("user_id", "session_no", "session_start", "session_end", "n_events")
    )


def sessionize_native(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    streaming_watermark: str | None = None,
) -> DataFrame:
    """Gap sessions via Spark's built-in ``session_window`` — the
    fully JVM-side tier (no window functions, no Python state): one
    groupBy((user, session_window)) aggregation with map-side partial
    merge of overlapping windows.  Works identically for batch frames
    and streams (pass ``streaming_watermark`` for append-mode
    emission).

    Contract matches :func:`sessionize` except ``session_no`` (a
    global per-user ordinal needs a second windowed pass; the native
    tier identifies sessions by their start instead):
    ``session_window.end`` is ``last_event + gap``, so ``session_end``
    is emitted as ``end - gap`` to equal the batch tier's
    max-event-time semantics.
    """
    if streaming_watermark is not None:
        events = events.withWatermark(ts_col, streaming_watermark)
    win = F.session_window(F.col(ts_col), f"{gap_seconds} seconds")
    return (
        events.groupBy(F.col(user_col).alias("user_id"), win)
        .agg(F.count(F.lit(1)).cast("int").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            (
                F.col("session_window.end") - F.expr(f"INTERVAL {gap_seconds} SECONDS")
            ).alias("session_end"),
            "n_events",
        )
    )


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming sessions via ``applyInPandasWithState``.

    Per-user state holds the open session (start, last event, count);
    incoming micro-batch rows extend or rotate it, closed sessions are
    emitted immediately, and the event-time timeout flushes the final
    open session once the watermark passes ``last + gap``.  Output
    mode must be ``append``.

    Robustness contract (ADVICE r1):

    - Timestamps flow through the state function as **epoch-micro
      longs** (``unix_micros`` on the way in, tz-aware UTC datetimes
      on the way out), so the logic is independent of
      ``spark.sql.session.timeZone`` — an Arrow-naive-timestamp round
      trip would offset the timeout by the session tz.
    - Rows older than the current watermark are dropped here:
      ``applyInPandasWithState`` does not auto-drop late data, and a
      group consisting only of pre-watermark events would otherwise
      request a timeout in the past.
    - The requested timeout is clamped to ``watermark + 1ms`` — Spark
      rejects earlier values with an IllegalArgumentException that
      fails the whole query, not just the group.
    """
    gap_us = gap_seconds * 1_000_000

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        out = []

        def emit(start_us: int, end_us: int, n: int) -> None:
            out.append(
                (
                    user_id,
                    _dt.datetime.fromtimestamp(start_us / 1e6, tz=_dt.timezone.utc),
                    _dt.datetime.fromtimestamp(end_us / 1e6, tz=_dt.timezone.utc),
                    n,
                )
            )

        wm_ms = state.getCurrentWatermarkMs()
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            emit(start_us, end_us, n)
            state.remove()
        else:
            ts_us: list[int] = []
            for pdf in pdfs:
                ts_us.extend(int(v) for v in pdf["__ts_us"])
            ts_us = sorted(t for t in ts_us if t >= wm_ms * 1000)
            if ts_us:
                if state.exists:
                    start_us, end_us, n = state.get
                else:
                    start_us, end_us, n = ts_us[0], ts_us[0], 0
                for t in ts_us:
                    if t - end_us > gap_us:
                        emit(start_us, end_us, n)
                        start_us, end_us, n = t, t, 1
                    else:
                        end_us = max(end_us, t)
                        n += 1
                state.update((start_us, end_us, n))
                state.setTimeoutTimestamp(
                    max(end_us // 1000 + gap_seconds * 1000, wm_ms + 1)
                )

        yield pd.DataFrame(
            out, columns=["user_id", "session_start", "session_end", "n_events"]
        )

    return (
        events.withWatermark(ts_col, watermark)
        .withColumn("__ts_us", F.unix_micros(F.col(ts_col)))
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_tws(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming sessions on the Spark 4 ``transformWithStateInPandas``
    API — the successor to ``applyInPandasWithState`` (SPARK-49770):
    named state variables instead of one opaque tuple, explicit timers
    instead of a single group timeout, and a processor object whose
    lifecycle (init/input/timer) replaces the closure-over-GroupState
    protocol.

    Same contract as :func:`sessionize_stream` (append mode, state
    O(active users), emitted rows match the batch tier): per-user
    ``ValueState`` holds the open session; each batch's rows extend or
    rotate it; an event-time timer at ``end + gap`` flushes the final
    open session.  A stale timer (one that fired after newer events
    already extended the session) re-registers itself at the updated
    deadline instead of emitting — timers are not deleted on update,
    so the guard in the expiry handler is the correctness point.

    Environment note: transformWithState's Python state server speaks
    protobuf, so the ``protobuf`` package must be installed on driver
    and executors (it is absent in the offline dev sandbox, where the
    e2e test skips — the same implemented-but-environment-gated status
    as the Kafka source).  ``sessionize_stream`` is the tier verified
    end-to-end here and remains the default.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_us = gap_seconds * 1_000_000
    cols = ["user_id", "session_start", "session_end", "n_events"]

    def _utc(us: int) -> _dt.datetime:
        return _dt.datetime.fromtimestamp(us / 1e6, tz=_dt.timezone.utc)

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState(
                "open_session", "start_us long, end_us long, n_events int"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            (user_id,) = key
            wm_ms = timerValues.getCurrentWatermarkInMs()
            ts_us: list[int] = []
            for pdf in rows:
                ts_us.extend(int(v) for v in pdf["__ts_us"])
            # late rows are dropped (same clamp contract as the
            # applyInPandasWithState tier)
            ts_us = sorted(t for t in ts_us if t >= wm_ms * 1000)
            out = []
            if ts_us:
                cur = self._state.get() if self._state.exists() else None
                start_us, end_us, n = cur if cur else (ts_us[0], ts_us[0], 0)
                for t in ts_us:
                    if t - end_us > gap_us:
                        out.append((user_id, _utc(start_us), _utc(end_us), n))
                        start_us, end_us, n = t, t, 1
                    else:
                        end_us = max(end_us, t)
                        n += 1
                self._state.update((start_us, end_us, int(n)))
                self._handle.registerTimer(
                    max(end_us // 1000 + gap_seconds * 1000, wm_ms + 1)
                )
            yield pd.DataFrame(out, columns=cols)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            import pandas as pd

            (user_id,) = key
            out = []
            cur = self._state.get() if self._state.exists() else None
            if cur:
                start_us, end_us, n = cur
                deadline_ms = end_us // 1000 + gap_seconds * 1000
                if expiredTimerInfo.getExpiryTimeInMs() >= deadline_ms:
                    out.append((user_id, _utc(start_us), _utc(end_us), n))
                    self._state.clear()
                else:
                    # stale timer: the session was extended after this
                    # timer was set — rearm at the current deadline
                    self._handle.registerTimer(
                        max(deadline_ms, timerValues.getCurrentWatermarkInMs() + 1)
                    )
            yield pd.DataFrame(out, columns=cols)

        def close(self) -> None:
            pass

    return (
        events.withWatermark(ts_col, watermark)
        .withColumn("__ts_us", F.unix_micros(F.col(ts_col)))
        .groupBy(user_col)
        .transformWithStateInPandas(
            SessionProcessor(),
            outputStructType=SESSION_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


FUNNEL_SCHEMA = (
    "user_id long, funnel_start timestamp, funnel_end timestamp, duration_s long"
)
FUNNEL_STATE_SCHEMA = (
    "stage int, start_us long, buf_ts array<long>, buf_step array<string>"
)


def streaming_funnel(
    events: DataFrame,
    steps: tuple[str, ...],
    window_seconds: int = 3600,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stateful streaming conversion funnel via
    ``applyInPandasWithState``: per user, a funnel instance starts at a
    ``steps[0]`` event and completes when the remaining steps occur IN
    EVENT-TIME ORDER within ``window_seconds`` of the start;
    completions emit as soon as the watermark finalizes them.

    Event-time correctness, not arrival order: strict-order funnels
    are NOT reorder-tolerant (consuming a later event first loses the
    conversion), so incoming events are BUFFERED in state and the
    policy advances only over events at or below the current
    watermark — the region where no earlier event can still arrive —
    in sorted order.  State is (stage, start) plus the pending buffer,
    O(events inside the watermark horizon) per user; the event-time
    timeout re-fires the group as the watermark passes buffered
    events so they drain without new data.

    Policy over the finalized stream (the batch replica in the tests
    mirrors it): only the EXPECTED next step advances the instance;
    other funnel events are ignored; a ``steps[0]`` event while no
    instance is open starts one; an event past the window closes the
    stale instance un-emitted and may itself start a new instance.
    Late rows (already below the watermark on arrival) are processed
    immediately with the finalized set — by watermark contract they
    are the at-risk residue the lateness bound allows."""
    step_list = list(steps)
    if len(step_list) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    window_us = window_seconds * 1_000_000

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        out = []
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.exists:
            stage, start_us, buf_ts, buf_step = state.get
            pending = list(zip(buf_ts, buf_step))
        else:
            stage, start_us, pending = -1, 0, []
        if not state.hasTimedOut:
            for pdf in pdfs:
                pending.extend(
                    (int(t), str(s)) for t, s in zip(pdf["__ts_us"], pdf["__step"])
                )
        pending.sort()
        ready = [e for e in pending if e[0] <= wm_us]
        pending = [e for e in pending if e[0] > wm_us]
        for t, st in ready:
            if stage >= 0 and t - start_us > window_us:
                stage, start_us = -1, 0  # stale instance dies silently
            if stage == -1:
                if st == step_list[0]:
                    stage, start_us = 1, t
            elif st == step_list[stage]:
                stage += 1
                if stage == len(step_list):
                    out.append(
                        (
                            user_id,
                            _dt.datetime.fromtimestamp(
                                start_us / 1e6, tz=_dt.timezone.utc
                            ),
                            _dt.datetime.fromtimestamp(t / 1e6, tz=_dt.timezone.utc),
                            (t - start_us) // 1_000_000,
                        )
                    )
                    stage, start_us = -1, 0
        # an open instance whose window the watermark has passed can
        # never complete (any remaining in-window event is finalized
        # already) — drop it
        if stage >= 0 and wm_us > start_us + window_us:
            stage, start_us = -1, 0
        if pending or stage >= 0:
            state.update(
                (
                    stage,
                    start_us,
                    [t for t, _ in pending],
                    [st for _, st in pending],
                )
            )
            # re-fire when the watermark passes the next buffered event
            # (drains the buffer without new data) or the open window
            next_us = min(
                [t for t, _ in pending]
                + ([start_us + window_us] if stage >= 0 else [])
            )
            state.setTimeoutTimestamp(max(next_us // 1000 + 1, wm_us // 1000 + 1))
        elif state.exists:
            state.remove()

        yield pd.DataFrame(
            out, columns=["user_id", "funnel_start", "funnel_end", "duration_s"]
        )

    return (
        events.where(F.col(type_col).isin(step_list))
        .withWatermark(ts_col, watermark)
        .withColumn("__ts_us", F.unix_micros(F.col(ts_col)))
        .withColumn("__step", F.col(type_col))
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=FUNNEL_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
