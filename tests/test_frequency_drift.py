"""Pins for windowed_l1_drift (operators/frequency.py): hand-case
math, self-vs-literal-reference agreement, and the streaming tier's
batch equivalence under watermark append emission."""

import json
import uuid

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from telemetry_streaming_spark.operators.frequency import windowed_l1_drift
from telemetry_streaming_spark.streaming.core import (
    checkpoint_path,
    drain,
    stop_quietly,
    text_file_source,
)

BASE = 1_600_000_000  # window-aligned epoch seconds


def _events(spark, spec):
    """spec: list of (ts_s, key)"""
    return spark.createDataFrame(
        [Row(ts=t, k=k) for t, k in spec]
    ).select(F.timestamp_seconds("ts").alias("ts"), F.col("k"))


def test_self_referenced_hand_case(spark):
    # window A: 3a+1b; window B: 1a+3b -> global 4a+4b, T=8
    day = 86_400
    spec = [(BASE, "a")] * 3 + [(BASE, "b")] + [(BASE + day, "a")] + [(BASE + day, "b")] * 3
    out = {
        int(r["window_start"].timestamp()): r
        for r in windowed_l1_drift(_events(spark, spec), "ts", "k").collect()
    }
    a = out[BASE - BASE % day]
    # per window: T_w=4, T=8; |3*8-4*4| + |1*8-4*4| = 8+8 = 16; den 32
    assert (a["n_window"], a["l1_num"], a["l1_den"]) == (4, 16, 32)
    b = out[BASE - BASE % day + day]
    assert (b["l1_num"], b["l1_den"]) == (16, 32)


def test_one_sided_keys_contribute_full_mass(spark):
    day = 86_400
    # window A only 'a', window B only 'b': maximal drift L1 = 1 each side
    spec = [(BASE, "a")] * 2 + [(BASE + day, "b")] * 2
    out = sorted(
        windowed_l1_drift(_events(spark, spec), "ts", "k").collect(),
        key=lambda r: r["window_start"],
    )
    for r in out:
        # |2*4 - 2*2| + absent-key term (4-2)*2 = 4 + 4 = 8; den = 2*4
        assert (r["l1_num"], r["l1_den"]) == (8, 8)


def test_identical_windows_have_zero_drift(spark):
    day = 86_400
    spec = []
    for w in range(3):
        spec += [(BASE + w * day, "a")] * 2 + [(BASE + w * day, "b")]
    out = windowed_l1_drift(_events(spark, spec), "ts", "k").collect()
    assert all(r["l1_num"] == 0 for r in out)


def test_literal_reference_equals_self_reference_when_ref_is_global(spark):
    import random

    rng = random.Random(23)
    day = 86_400
    spec = [
        (BASE + rng.randint(0, 3) * day, rng.choice("abcde")) for _ in range(500)
    ]
    df = _events(spark, spec)
    self_ref = {
        (r["window_start"], r["l1_num"], r["l1_den"])
        for r in windowed_l1_drift(df, "ts", "k").collect()
    }
    global_counts = {}
    for _, k in spec:
        global_counts[k] = global_counts.get(k, 0) + 1
    lit_ref = {
        (r["window_start"], r["l1_num"], r["l1_den"])
        for r in windowed_l1_drift(df, "ts", "k", reference=global_counts).collect()
    }
    assert self_ref == lit_ref


def test_null_keys_fold_into_others_bucket(spark):
    """~isin(...) is NULL for NULL input, so without the explicit
    isNull() fold NULL-key rows vanish from l1_num while still counting
    in n_window/l1_den — drift under-reported on streams with NULL
    categories (ADVICE r5).  NULL must behave exactly like an
    unseen key: full |n_other * T_ref| mass."""
    spec_known = [(BASE, "a")] * 2
    df = spark.createDataFrame(
        [Row(ts=t, k=k) for t, k in spec_known]
        + [Row(ts=BASE, k=None), Row(ts=BASE, k=None)]
    ).select(F.timestamp_seconds("ts").alias("ts"), F.col("k"))
    ref = {"a": 1}  # T_ref = 1
    (row,) = windowed_l1_drift(df, "ts", "k", reference=ref).collect()
    # T_w=4, T_ref=1: |n_a*1 - 1*4| + n_other*1 = |2-4| + 2 = 4
    assert (row["n_window"], row["l1_num"], row["l1_den"]) == (4, 4, 4)
    # and the literal branch must agree with the batch (self-ref uses
    # groupBy, which keeps NULL as its own key) on mass conservation:
    unseen = spark.createDataFrame(
        [Row(ts=BASE, k="zzz"), Row(ts=BASE, k="zzz")]
    ).select(F.timestamp_seconds("ts").alias("ts"), F.col("k"))
    both = df.where(F.col("k").isNotNull()).unionByName(unseen)
    (row2,) = windowed_l1_drift(both, "ts", "k", reference=ref).collect()
    assert (row2["l1_num"], row2["l1_den"]) == (row["l1_num"], row["l1_den"])


def test_validation(spark):
    df = _events(spark, [(BASE, "a")])
    with pytest.raises(ValueError):
        windowed_l1_drift(df, "ts", "k", watermark="1 minute")  # self-ref stream
    with pytest.raises(ValueError):
        windowed_l1_drift(df, "ts", "k", reference={})
    with pytest.raises(ValueError):
        windowed_l1_drift(df, "ts", "k", reference={"a": 0})


def _write_lines(dir_path, lines):
    import os

    os.makedirs(dir_path, exist_ok=True)
    tmp = f"{dir_path}/.{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
    import os as _os

    _os.rename(tmp, f"{dir_path}/{uuid.uuid4().hex}.txt")


@pytest.mark.full  # r11: >=5s; fast-tier siblings cover this surface
def test_streaming_drift_matches_batch(spark, tmp_path):
    """The literal-reference tier is one stateful aggregate: it runs
    under a watermark with append emission, and a closed window's row
    equals the batch run on the same events."""
    ref = {"a": 3, "b": 1}
    win_a = [(BASE + i, "a" if i % 2 else "b") for i in range(10)]
    flusher = [(BASE + 7_200, "a")]  # advances watermark past window A

    in_dir = str(tmp_path / "in")
    _write_lines(in_dir, [json.dumps({"ts_s": t, "k": k}) for t, k in win_a])

    raw = text_file_source(spark, in_dir)
    parsed = raw.select(
        F.timestamp_seconds(
            F.get_json_object("value", "$.ts_s").cast("long")
        ).alias("ts"),
        F.get_json_object("value", "$.k").alias("k"),
    )
    drifted = windowed_l1_drift(
        parsed, "ts", "k", window="1 hour", reference=ref, watermark="0 seconds"
    )
    name = f"drift_test_{uuid.uuid4().hex[:8]}"
    query = (
        drifted.writeStream.queryName(name)
        .format("memory")
        .outputMode("append")
        .option("checkpointLocation", checkpoint_path("drift", str(tmp_path / "ck")))
        .start()
    )
    try:
        drain(query)
        _write_lines(in_dir, [json.dumps({"ts_s": t, "k": k}) for t, k in flusher])
        drain(query)
        got = [
            (int(r["window_start"].timestamp()), r["n_window"], r["l1_num"], r["l1_den"])
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        ]
    finally:
        stop_quietly(query)
    batch = [
        (int(r["window_start"].timestamp()), r["n_window"], r["l1_num"], r["l1_den"])
        for r in windowed_l1_drift(
            _events(spark, win_a), "ts", "k", window="1 hour", reference=ref
        ).collect()
    ]
    assert got == batch and len(got) == 1
