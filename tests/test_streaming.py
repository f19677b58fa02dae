"""Streaming-semantics tests (SURVEY §2.8 W1-W11, §5 layers 4/6).

The reference's streaming e2e tests feed Kafka and use a
StreamingQueryListener + the "send a later message twice" trick to
push the watermark past a window boundary and force the append-mode
parquet flush (ErrorAggregatorTest.scala:270-344).  We reproduce the
same mechanics with a text-file source: dropping a file into the
watched directory ≙ producing to the topic.

Golden *values* are asserted via the batch path (same transform fns);
streaming tests assert mechanics — emission timing, watermark
advancement, state-bounded dedup — per SURVEY §7.4 risk 1.
"""

import json
import os
import time
import uuid

import pyspark.sql.functions as F
import pytest

from telemetry_streaming_spark.jobs import error_aggregator
from telemetry_streaming_spark.streaming.core import (
    CollectingListener,
    checkpoint_path,
    drain,
    stop_quietly,
    text_file_source,
)
from tests.fixtures import TEST_TIMESTAMP_NS, main_ping, to_df

HOUR_NS = 3_600_000_000_000


def _write_lines(dir_path: str, lines: list[str]) -> None:
    os.makedirs(dir_path, exist_ok=True)
    tmp = os.path.join(dir_path, f".{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.rename(tmp, os.path.join(dir_path, f"{uuid.uuid4().hex}.txt"))


@pytest.fixture
def stream_dirs(tmp_path):
    return {
        "in": str(tmp_path / "in"),
        "out": str(tmp_path / "out"),
        "ckpt": checkpoint_path("test_stream", str(tmp_path / "ckpt")),
    }


def test_checkpoint_path_convention(tmp_path):
    """W7: {root}/{JobName} (StreamingJobBase.scala:73-77)."""
    assert checkpoint_path("ErrorAggregator", "/tmp/checkpoints") == (
        "/tmp/checkpoints/ErrorAggregator"
    )


def test_error_aggregator_append_flush_on_watermark(spark, stream_dirs):
    """K1/W1/W3/W5 e2e: 5-min windows flush to parquet only after a
    later event pushes the 1-min watermark past window end — the
    reference's double-send orchestration
    (ErrorAggregatorTest.scala:290-328)."""
    first_batch = [main_ping() for _ in range(3)]
    _write_lines(stream_dirs["in"], first_batch)
    os.makedirs(stream_dirs["out"], exist_ok=True)

    raw = text_file_source(spark, stream_dirs["in"])
    query = error_aggregator.write_streaming(
        raw, stream_dirs["out"], stream_dirs["ckpt"]
    )
    try:
        drain(query)
        # watermark still at epoch after first batch -> nothing emitted
        early = [f for f in os.listdir(stream_dirs["out"]) if f.startswith("submission")]
        # (dir may not even have partition dirs yet)

        # a ping 2 hours later, sent twice (watermark updates at end of
        # batch N; the flush happens in batch N+1 — exactly the
        # reference's trick, comment at ErrorAggregatorTest.scala:308-312)
        late = main_ping(meta={"Timestamp": TEST_TIMESTAMP_NS + 2 * HOUR_NS})
        _write_lines(stream_dirs["in"], [late])
        drain(query)
        _write_lines(stream_dirs["in"], [late])
        drain(query)
    finally:
        stop_quietly(query)

    got = spark.read.parquet(stream_dirs["out"])
    # the first window (3 pings x 2 experiment slices: old-style
    # experiment1 + the (null,null) fan-out row) must have flushed
    flushed = got.collect()
    assert len(flushed) >= 2
    sums = {
        (r.experiment_id, r.experiment_branch): r["count"]
        for r in flushed
        if r.usage_hours is not None and r["count"] == 3
    }
    assert ("experiment1", "control") in sums
    # streaming result == batch result for the flushed window
    batch = (
        error_aggregator.aggregate(to_df(spark, first_batch))
        .select("window_start", "experiment_id", "count")
        .collect()
    )
    batch_counts = {(r.experiment_id): r["count"] for r in batch}
    for r in flushed:
        if r["count"] == 3:
            assert batch_counts.get(r.experiment_id) == 3


def test_listener_observes_progress_and_watermark(spark, stream_dirs):
    """W11: StreamingQueryListener sees per-batch input rows and the
    advancing event-time watermark."""
    listener = CollectingListener()
    spark.streams.addListener(listener)
    _write_lines(stream_dirs["in"], [main_ping() for _ in range(4)])

    raw = text_file_source(spark, stream_dirs["in"])
    agg = error_aggregator.aggregate(raw, streaming=True)
    query = (
        agg.writeStream.queryName(f"listener_test_{uuid.uuid4().hex[:8]}")
        .format("memory")
        .outputMode("append")
        .option("checkpointLocation", stream_dirs["ckpt"])
        .start()
    )
    try:
        drain(query)
        _write_lines(
            stream_dirs["in"],
            [main_ping(meta={"Timestamp": TEST_TIMESTAMP_NS + HOUR_NS})],
        )
        drain(query)
        deadline = time.time() + 10
        while listener.total_input_rows < 5 and time.time() < deadline:
            time.sleep(0.2)
        assert listener.total_input_rows == 5
        wms = [p["watermark"] for p in listener.progress if p.get("watermark")]
        assert wms, "no watermark observed in progress events"
        # watermark eventually reflects the late event minus 1 minute
        assert any(w >= "2016-04-07T03:14" for w in wms)
    finally:
        stop_quietly(query)
        spark.streams.removeListener(listener)


def test_streaming_dedup_exact_within_watermark(spark, stream_dirs):
    """Extension: exact streaming dedup with watermark-bounded state —
    replayed insert_ids within the horizon are dropped."""
    from telemetry_streaming_spark.operators.dedup import streaming_dedup_exact

    base = int(TEST_TIMESTAMP_NS // 1_000_000_000)
    rows1 = [
        json.dumps({"insert_id": f"id-{i}", "ts_s": base + i}) for i in range(5)
    ]
    # replay ids 0-2 plus two fresh ids
    rows2 = [
        json.dumps({"insert_id": f"id-{i}", "ts_s": base + i}) for i in range(3)
    ] + [json.dumps({"insert_id": f"id-{i}", "ts_s": base + i}) for i in (7, 8)]
    _write_lines(stream_dirs["in"], rows1)

    raw = text_file_source(spark, stream_dirs["in"])
    parsed = raw.select(
        F.get_json_object("value", "$.insert_id").alias("insert_id"),
        F.timestamp_seconds(
            F.get_json_object("value", "$.ts_s").cast("long")
        ).alias("timestamp"),
    )
    deduped = streaming_dedup_exact(parsed, key_cols=("insert_id",))
    name = f"dedup_test_{uuid.uuid4().hex[:8]}"
    query = (
        deduped.writeStream.queryName(name)
        .format("memory")
        .outputMode("append")
        .option("checkpointLocation", stream_dirs["ckpt"])
        .start()
    )
    try:
        drain(query)
        _write_lines(stream_dirs["in"], rows2)
        drain(query)
        got = spark.sql(f"SELECT insert_id FROM {name}").collect()
        ids = sorted(r.insert_id for r in got)
        assert ids == sorted({f"id-{i}" for i in list(range(5)) + [7, 8]})
    finally:
        stop_quietly(query)
