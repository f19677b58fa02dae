"""Sessionization tests: batch gap-and-islands vs streaming
applyInPandasWithState — same session contract, two execution tiers."""

import os
import uuid

import pytest

import pyspark.sql.functions as F

from telemetry_streaming_spark.operators.sessions import sessionize, sessionize_stream
from telemetry_streaming_spark.sources.registry import load_table
from tests.conftest import SF_SMOKE


def test_batch_sessionize_gap_semantics(spark):
    rows = [
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-01 10:10:00"),
        (1, "2024-01-01 11:30:00"),  # > 30 min gap -> new session
        (2, "2024-01-01 09:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {(r.user_id, r.session_no): r for r in sessionize(df, 1800).collect()}
    assert len(out) == 3
    s1 = out[(1, 1)]
    assert s1.n_events == 2 and s1.session_end.minute == 10
    assert out[(1, 2)].n_events == 1
    assert out[(2, 1)].n_events == 1


def test_batch_sessionize_covers_all_events(spark):
    events = load_table(spark, SF_SMOKE, "events")
    sessions = sessionize(events, 1800)
    assert sessions.agg(F.sum("n_events")).first()[0] == events.count()
    # sessions of one user never overlap
    overlaps = (
        sessions.alias("a")
        .join(
            sessions.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.session_no") < F.col("b.session_no"))
            & (F.col("a.session_end") >= F.col("b.session_start")),
        )
        .count()
    )
    assert overlaps == 0


def test_streaming_sessionize_emits_on_rotation_and_timeout(spark, tmp_path):
    """Events in batch 1 open sessions; a later batch rotates the old
    session out (gap exceeded) and the emitted rows match the batch
    tier's session contract."""
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)

    def write(lines, name):
        with open(os.path.join(in_dir, name), "w") as f:
            f.write("\n".join(lines) + "\n")

    write(["1,2024-01-01 10:00:00", "1,2024-01-01 10:05:00", "2,2024-01-01 10:00:00"], "a.csv")

    raw = (
        spark.readStream.format("text")
        .load(in_dir)
        .select(F.split("value", ",").alias("p"))
        .select(
            F.col("p")[0].cast("long").alias("user_id"),
            F.to_timestamp(F.col("p")[1]).alias("ts"),
        )
    )
    sessions = sessionize_stream(raw, gap_seconds=1800, watermark="0 seconds")
    name = f"sessions_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.queryName(name)
        .format("memory")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # user 1 returns 3 hours later -> old session rotates out
        write(["1,2024-01-01 13:00:00"], "b.csv")
        q.processAllAvailable()
        # one more batch so the watermark (13:00) closes via timeout the
        # sessions whose end+gap < watermark (10:05 and 10:00 sessions)
        write(["3,2024-01-01 14:00:00"], "c.csv")
        q.processAllAvailable()
        got = {
            (r.user_id, r.session_start.isoformat()): r
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
        first = got[(1, "2024-01-01T10:00:00")]
        assert first.n_events == 2
        assert first.session_end.isoformat() == "2024-01-01T10:05:00"
    finally:
        q.stop()


def test_streaming_sessionize_survives_late_data(spark, tmp_path):
    """A group arriving entirely below the watermark must not crash the
    query with a timeout-before-watermark error (ADVICE r1): late rows
    are dropped and live groups clamp their timeout past the watermark."""
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)

    def write(lines, name):
        with open(os.path.join(in_dir, name), "w") as f:
            f.write("\n".join(lines) + "\n")

    write(["1,2024-01-01 10:00:00"], "a.csv")

    raw = (
        spark.readStream.format("text")
        .load(in_dir)
        .select(F.split("value", ",").alias("p"))
        .select(
            F.col("p")[0].cast("long").alias("user_id"),
            F.to_timestamp(F.col("p")[1]).alias("ts"),
        )
    )
    sessions = sessionize_stream(raw, gap_seconds=1800, watermark="0 seconds")
    name = f"sessions_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.queryName(name)
        .format("memory")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # advance the watermark far ahead, then deliver a user whose
        # events are entirely before it (even before watermark - gap)
        write(["2,2024-01-01 15:00:00"], "b.csv")
        q.processAllAvailable()
        write(["3,2024-01-01 05:00:00", "3,2024-01-01 05:10:00"], "c.csv")
        q.processAllAvailable()  # would raise without the clamp/guard
        write(["4,2024-01-01 16:00:00"], "d.csv")
        q.processAllAvailable()
        rows = spark.sql(f"SELECT * FROM {name}").collect()
        users = {r.user_id for r in rows}
        # the all-late group must not appear; earlier sessions flush fine
        assert 3 not in users
        assert 1 in users
    finally:
        q.stop()


def test_native_session_window_tier_matches_batch_tier(spark):
    """sessionize_native (built-in session_window) must produce the
    same sessions as the gap-and-islands tier on the smoke data."""
    from telemetry_streaming_spark.operators.sessions import sessionize_native

    events = load_table(spark, SF_SMOKE, "events")
    native = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize_native(events, 1800).collect()
    }
    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize(events, 1800).collect()
    }
    assert native == batch


def test_native_session_window_streaming(spark, tmp_path):
    """The same native tier runs as a streaming aggregation with
    watermark-driven append emission."""
    import uuid as _uuid

    from telemetry_streaming_spark.operators.sessions import sessionize_native

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "a.csv"), "w") as f:
        f.write("1,2024-01-01 10:00:00\n1,2024-01-01 10:05:00\n")

    raw = (
        spark.readStream.format("text")
        .load(in_dir)
        .select(F.split("value", ",").alias("p"))
        .select(
            F.col("p")[0].cast("long").alias("user_id"),
            F.to_timestamp(F.col("p")[1]).alias("ts"),
        )
    )
    sessions = sessionize_native(raw, 1800, streaming_watermark="0 seconds")
    name = f"native_{_uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.queryName(name)
        .format("memory")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # push the watermark past session end + gap -> flush
        with open(os.path.join(in_dir, "b.csv"), "w") as f:
            f.write("2,2024-01-01 13:00:00\n")
        q.processAllAvailable()
        with open(os.path.join(in_dir, "c.csv"), "w") as f:
            f.write("3,2024-01-01 14:00:00\n")
        q.processAllAvailable()
        rows = {r.user_id: r for r in spark.sql(f"SELECT * FROM {name}").collect()}
        assert rows[1].n_events == 2
        assert rows[1].session_end.isoformat() == "2024-01-01T10:05:00"
    finally:
        q.stop()


def test_tws_sessionize_matches_stream_tier(spark, tmp_path):
    """The transformWithStateInPandas tier must emit the same session
    rows as the applyInPandasWithState tier: rotation on gap, timeout
    flush via its timer, late rows dropped.  Requires the protobuf
    package (the TWS Python state-server protocol); skipped where it
    is not installed."""
    pytest.importorskip("google.protobuf")
    from telemetry_streaming_spark.operators.sessions import sessionize_tws

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)

    def write(lines, name):
        with open(os.path.join(in_dir, name), "w") as f:
            f.write("\n".join(lines) + "\n")

    write(["1,2024-01-01 10:00:00", "1,2024-01-01 10:05:00", "2,2024-01-01 10:00:00"], "a.csv")

    raw = (
        spark.readStream.format("text")
        .load(in_dir)
        .select(F.split("value", ",").alias("p"))
        .select(
            F.col("p")[0].cast("long").alias("user_id"),
            F.to_timestamp(F.col("p")[1]).alias("ts"),
        )
    )
    sessions = sessionize_tws(raw, gap_seconds=1800, watermark="0 seconds")
    name = f"tws_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.queryName(name)
        .format("memory")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        write(["1,2024-01-01 13:00:00"], "b.csv")  # rotates user 1
        q.processAllAvailable()
        write(["3,2024-01-01 14:00:00"], "c.csv")  # watermark closes the rest
        q.processAllAvailable()
        got = {
            (r.user_id, r.session_start.isoformat()): r
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
        first = got[(1, "2024-01-01T10:00:00")]
        assert first.n_events == 2
        assert first.session_end.isoformat() == "2024-01-01T10:05:00"
        # user 2's single-event session flushed by timer once the
        # watermark passed 10:00 + 30min
        assert (2, "2024-01-01T10:00:00") in got
        assert got[(2, "2024-01-01T10:00:00")].n_events == 1
    finally:
        q.stop()


def _funnel_replica(rows, steps, window_s):
    """Python replica of streaming_funnel's documented policy."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, ts, t in rows:
        if t in steps:
            by_user[u].append((ts, t))
    out = []
    for u, evs in by_user.items():
        stage, start = -1, None
        for ts, t in sorted(evs):
            if stage >= 0 and (ts - start).total_seconds() > window_s:
                stage, start = -1, None
            if stage == -1:
                if t == steps[0]:
                    stage, start = 1, ts
            elif t == steps[stage]:
                stage += 1
                if stage == len(steps):
                    out.append((u, start, ts, int((ts - start).total_seconds())))
                    stage, start = -1, None
    return sorted(out)


def test_streaming_funnel_completes_across_batches(spark, tmp_path):
    """Stateful funnel: steps spread over micro-batches complete and
    emit; out-of-window instances die silently; output matches the
    python replica of the documented policy."""
    from datetime import datetime

    from telemetry_streaming_spark.operators.sessions import streaming_funnel

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)

    def write(lines, name):
        with open(os.path.join(in_dir, name), "w") as f:
            f.write("\n".join(lines) + "\n")

    # user 1 completes view->click->purchase across two batches;
    # user 2 views then stalls past the window; user 3 clicks first
    # (never starts)
    write([
        "1,2024-01-01 10:00:00,view",
        "1,2024-01-01 10:05:00,click",
        "2,2024-01-01 10:00:00,view",
        "3,2024-01-01 10:00:00,click",
    ], "a.csv")

    raw = (
        spark.readStream.format("text").load(in_dir)
        .select(F.split("value", ",").alias("p"))
        .select(
            F.col("p")[0].cast("long").alias("user_id"),
            F.to_timestamp(F.col("p")[1]).alias("ts"),
            F.col("p")[2].alias("event_type"),
        )
    )
    funnels = streaming_funnel(
        raw, ("view", "click", "purchase"), window_seconds=3600,
        watermark="0 seconds",
    )
    name = f"funnel_{uuid.uuid4().hex[:8]}"
    q = (
        funnels.writeStream.queryName(name).format("memory")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    all_rows = [
        (1, datetime(2024, 1, 1, 10, 0), "view"),
        (1, datetime(2024, 1, 1, 10, 5), "click"),
        (2, datetime(2024, 1, 1, 10, 0), "view"),
        (3, datetime(2024, 1, 1, 10, 0), "click"),
        (1, datetime(2024, 1, 1, 10, 20), "purchase"),
        (2, datetime(2024, 1, 1, 12, 30), "click"),  # past 1h window: dead
    ]
    try:
        q.processAllAvailable()
        write([
            "1,2024-01-01 10:20:00,purchase",
            "2,2024-01-01 12:30:00,click",
        ], "b.csv")
        q.processAllAvailable()
        got = sorted(
            (r.user_id, r.funnel_start.replace(tzinfo=None),
             r.funnel_end.replace(tzinfo=None), r.duration_s)
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        )
        expect = _funnel_replica(all_rows, ("view", "click", "purchase"), 3600)
        assert got == expect
        assert got == [(1, datetime(2024, 1, 1, 10, 0), datetime(2024, 1, 1, 10, 20), 1200)]
    finally:
        q.stop()


def test_streaming_funnel_tolerates_in_watermark_reordering(spark, tmp_path):
    """An out-of-order middle step that is NOT late (still above the
    watermark lateness bound) must not lose the conversion: events
    buffer in state and the policy runs over the watermark-finalized
    prefix in event-time order (review finding)."""
    from datetime import datetime

    from telemetry_streaming_spark.operators.sessions import streaming_funnel

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)

    def write(lines, name):
        with open(os.path.join(in_dir, name), "w") as f:
            f.write("\n".join(lines) + "\n")

    # batch 1: view@10:00 and purchase@10:20 arrive BEFORE the click
    write(["1,2024-01-01 10:00:00,view", "1,2024-01-01 10:20:00,purchase"], "a.csv")
    raw = (
        spark.readStream.format("text").load(in_dir)
        .select(F.split("value", ",").alias("p"))
        .select(
            F.col("p")[0].cast("long").alias("user_id"),
            F.to_timestamp(F.col("p")[1]).alias("ts"),
            F.col("p")[2].alias("event_type"),
        )
    )
    funnels = streaming_funnel(
        raw, ("view", "click", "purchase"), window_seconds=3600,
        watermark="10 minutes",
    )
    name = f"funnel_{uuid.uuid4().hex[:8]}"
    q = (
        funnels.writeStream.queryName(name).format("memory")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: the click arrives out of order but within lateness
        # (watermark is 10:20 - 10min = 10:10; click ts == 10:10 is
        # exactly at the bound — use 10:11 to be strictly above it)
        write(["1,2024-01-01 10:11:00,click"], "b.csv")
        q.processAllAvailable()
        # batch 3: advance the watermark past the purchase so the
        # buffered tail finalizes
        write(["9,2024-01-01 11:30:00,view"], "c.csv")
        q.processAllAvailable()
        write(["9,2024-01-01 12:40:00,view"], "d.csv")
        q.processAllAvailable()
        got = sorted(
            (r.user_id, r.funnel_start.replace(tzinfo=None),
             r.funnel_end.replace(tzinfo=None), r.duration_s)
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        )
        assert got == [
            (1, datetime(2024, 1, 1, 10, 0), datetime(2024, 1, 1, 10, 20), 1200)
        ], got
    finally:
        q.stop()
