"""Behavioral analytics: funnels, cohort retention, inter-event gaps.

The product-analytics trio every event pipeline eventually needs (the
reference ships its events to Amplitude precisely to get these; this
module computes them in-engine).  All three are single-key-shuffle
plans over the event log, with integer/epoch arithmetic only — no
floats — so the DuckDB oracles hash-match exactly.

- :func:`conversion_funnel`: per-user ordered stage matching.  A user
  "reaches" stage k if there exist events e1 < e2 < ... < ek of the
  stage types in strict timestamp order.  Stage 1 is a conditional
  min-aggregate per user; stage k is the min ts of type t_k strictly
  after that user's stage k-1 ts — one filtered aggregate-join per
  stage, everything keyed and shuffled on the user id and carrying
  (user, long) rows only.  k is the (small) funnel length, so the
  plan is k narrow user-key aggregates, never a per-user event
  array buffer (which a collect_list formulation would need).

- :func:`cohort_retention`: users grouped by first-seen period
  (cohort); for each offset d >= 0, how many of the cohort were active
  in cohort_period + d.  Two aggregates: first-seen per user (one
  shuffle), then distinct (user, period) activity joined back — the
  join key is the user id, already the partitioning key.

- :func:`inter_event_gaps`: per-user consecutive-event gaps via
  ``lag`` over the user window (one shuffle + sort), binned to a
  log-ish integer histogram entirely in integer arithmetic.

At 100TB: everything shuffles on user_id once; bot-grade hot users
are the skew risk and the standard guards apply (salt or pre-filter
with :func:`~telemetry_streaming_spark.operators.frequency.heavy_hitters`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from telemetry_streaming_spark.functions import epoch_seconds


def conversion_funnel(
    events: DataFrame,
    stages: list[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strictly-ordered funnel: one row per user with ``stage{k}_ts``
    epoch-second columns (NULL once the funnel is broken) and
    ``stages_completed``.

    Stage k's timestamp is the earliest event of ``stages[k]``
    strictly after stage k-1's timestamp — the standard unbounded-
    window funnel.  Each stage adds one conditional min-aggregate over
    the same user-key exchange; stage columns stay (user, long).
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    ts_s = epoch_seconds(ts_col)
    base = events.select(
        F.col(user_col), F.col(type_col).alias("__t"), ts_s.alias("__s")
    )
    cur = base.where(F.col("__t") == stages[0]).groupBy(user_col).agg(
        F.min("__s").alias("stage1_ts")
    )
    for k, stage in enumerate(stages[1:], start=2):
        nxt = (
            base.where(F.col("__t") == stage)
            .join(cur.select(user_col, f"stage{k - 1}_ts"), user_col)
            .where(F.col("__s") > F.col(f"stage{k - 1}_ts"))
            .groupBy(user_col)
            .agg(F.min("__s").alias(f"stage{k}_ts"))
        )
        cur = cur.join(nxt, user_col, "left")
    completed = sum(
        [F.when(F.col(f"stage{k}_ts").isNotNull(), 1).otherwise(0) for k in range(1, len(stages) + 1)],
        F.lit(0),
    )
    return cur.withColumn("stages_completed", completed.cast("long"))


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 86_400,
) -> DataFrame:
    """Cohort x offset retention counts.

    Returns ``(cohort_period, offset, n_active)``: users whose first
    event fell in ``cohort_period`` (epoch seconds, floored to the
    period grid) and who were active ``offset`` periods later
    (offset 0 = the cohort size itself).  All integer arithmetic.
    """
    if period_seconds < 1:
        raise ValueError(f"period_seconds must be >= 1, got {period_seconds}")
    p = int(period_seconds)
    ts_s = epoch_seconds(ts_col)
    activity = (
        events.select(F.col(user_col), (ts_s - (ts_s % p)).alias("period"))
        .distinct()
    )
    firsts = activity.groupBy(user_col).agg(F.min("period").alias("cohort_period"))
    return (
        activity.join(firsts, user_col)
        .select(
            "cohort_period",
            ((F.col("period") - F.col("cohort_period")) / p).cast("long").alias("offset"),
            user_col,
        )
        .groupBy("cohort_period", "offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


def inter_event_gaps(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user consecutive-event gap rows ``(user, gap_s, gap_bucket)``.

    ``gap_bucket`` is the bit-length of the gap in seconds (0 for
    0-gap) — an integer log2 histogram bin computed without floats.
    One shuffle + sort on the user key; first events (no predecessor)
    emit nothing.
    """
    from pyspark.sql import Window

    ts_s = epoch_seconds(ts_col)
    w = Window.partitionBy(user_col).orderBy(F.col("__s").asc())
    gaps = (
        events.select(F.col(user_col), ts_s.alias("__s"))
        .withColumn("gap_s", F.col("__s") - F.lag("__s").over(w))
        .where(F.col("gap_s").isNotNull())
    )
    # bit_length(gap) = floor(log2(gap)) + 1 via string length of the
    # binary representation — integer-only, engine-portable.
    bucket = F.when(F.col("gap_s") <= 0, F.lit(0)).otherwise(
        F.length(F.conv(F.col("gap_s").cast("string"), 10, 2))
    )
    return gaps.select(user_col, "gap_s", bucket.cast("long").alias("gap_bucket"))
