"""Pins for operators/validation.py: planted violations of every rule
kind, NULL-handling contracts, and bloom-vs-exact referential
agreement."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from telemetry_streaming_spark.operators.validation import (
    accepted_values,
    in_range,
    matches,
    not_null,
    referential,
    unique,
    validate,
)


def _counts(df):
    return {r["rule"]: r["n_violations"] for r in df.collect()}


def test_row_rules_count_planted_violations(spark):
    df = spark.createDataFrame(
        [
            Row(a=1, s="ok", v="x"),
            Row(a=None, s="ok", v="y"),      # null a
            Row(a=99, s="bad!", v="x"),      # out of range + bad format
            Row(a=5, s="ok", v="zz"),        # bad domain
        ]
    )
    got = _counts(
        validate(
            df,
            [
                not_null("a_nn", "a"),
                in_range("a_rng", "a", 0, 10),
                matches("s_fmt", "s", "^[a-z]+$"),
                accepted_values("v_dom", "v", ["x", "y"]),
            ],
        )
    )
    assert got == {"a_nn": 1, "a_rng": 1, "s_fmt": 1, "v_dom": 1}


def test_nulls_only_flagged_by_not_null(spark):
    df = spark.createDataFrame([Row(a=None, s=None, v=None)], "a int, s string, v string")
    got = _counts(
        validate(
            df,
            [
                in_range("rng", "a", 0, 10),
                matches("fmt", "s", "^x$"),
                accepted_values("dom", "v", ["x"]),
            ],
        )
    )
    assert got == {"rng": 0, "fmt": 0, "dom": 0}


def test_unique_counts_extra_rows(spark):
    df = spark.createDataFrame(
        [Row(k=1, j=1), Row(k=1, j=1), Row(k=1, j=2), Row(k=2, j=1)]
    )
    got = _counts(validate(df, [unique("k_uni", "k"), unique("kj_uni", "k", "j")]))
    # k: 4 rows, 2 distinct -> 2 extras; (k,j): 4 rows, 3 distinct -> 1
    assert got == {"k_uni": 2, "kj_uni": 1}


def test_unique_ignores_null_key_rows(spark):
    """NULL-key rows are not_null's business: 2 dup rows + 3 NULL-key
    rows must report 1 violation, not 4 (ADVICE r5 — COUNT(*) in the
    minuend double-counted NULLs across the two rules)."""
    df = spark.createDataFrame(
        [Row(k=1), Row(k=1), Row(k=None), Row(k=None), Row(k=None)],
        schema="k int",
    )
    got = _counts(validate(df, [unique("k_uni", "k"), not_null("k_nn", "k")]))
    assert got == {"k_uni": 1, "k_nn": 3}
    # composite key: a row with ANY NULL component is skipped
    df2 = spark.createDataFrame(
        [Row(k=1, j=1), Row(k=1, j=1), Row(k=1, j=None), Row(k=None, j=1)],
        schema="k int, j int",
    )
    got2 = _counts(validate(df2, [unique("kj_uni", "k", "j")]))
    assert got2 == {"kj_uni": 1}


@pytest.mark.parametrize("use_bloom", [True, False])
def test_referential_counts_dangling_fks(spark, use_bloom):
    df = spark.createDataFrame(
        [Row(fk=1), Row(fk=2), Row(fk=999), Row(fk=999), Row(fk=None)]
    )
    ref = spark.createDataFrame([Row(pk=i) for i in range(10)])
    got = _counts(
        validate(
            df,
            [referential("fk_ref", "fk", ref, "pk", use_bloom=use_bloom)],
        )
    )
    # two dangling rows (999 twice); NULL fk skipped by contract
    assert got == {"fk_ref": 2}


def test_bloom_and_exact_referential_agree_on_random_data(spark):
    import random

    rng = random.Random(31)
    df = spark.createDataFrame([Row(fk=rng.randint(0, 3_000)) for _ in range(2_000)])
    ref = spark.createDataFrame([Row(pk=i) for i in range(0, 3_000, 2)])
    a = _counts(validate(df, [referential("r", "fk", ref, "pk", use_bloom=True)]))
    b = _counts(validate(df, [referential("r", "fk", ref, "pk", use_bloom=False)]))
    assert a == b


def test_validate_rejects_bad_input(spark):
    df = spark.createDataFrame([Row(a=1)])
    with pytest.raises(ValueError):
        validate(df, [])
    with pytest.raises(ValueError):
        validate(df, [not_null("x", "a"), in_range("x", "a", 0, 1)])  # dup name
    with pytest.raises(ValueError):
        validate(df, [not_null("bad name'", "a")])
    with pytest.raises(ValueError):
        not_null("nn")  # no columns
    with pytest.raises(ValueError):
        accepted_values("d", "a", [])
    with pytest.raises(ValueError):
        unique("u")


def test_clean_table_reports_zero_rows_per_rule(spark):
    df = spark.createDataFrame([Row(a=1), Row(a=2)])
    got = _counts(validate(df, [not_null("nn", "a"), unique("u", "a")]))
    assert got == {"nn": 0, "u": 0}


def test_validate_windowed_hand_case(spark):
    """Per-window exact counts, including an exact referential flag:
    bloom miss OR confirmed-dangling hit, NULL FK skipped."""
    from telemetry_streaming_spark.operators.validation import validate_windowed

    base = 1_600_000_000  # window-aligned
    hour = 3600
    rows = [
        # window A: one range violation, one dangling fk, one NULL fk
        (base + 10, 500.0, 1),
        (base + 20, 5.0, 999),
        (base + 30, 5.0, None),
        # window B: clean
        (base + hour + 10, 5.0, 2),
    ]
    df = spark.createDataFrame(
        [Row(ts=t, v=v, fk=k) for t, v, k in rows],
        "ts long, v double, fk int",
    ).select(F.timestamp_seconds("ts").alias("ts"), "v", "fk")
    ref = spark.createDataFrame([Row(pk=i) for i in range(10)])
    out = validate_windowed(
        df,
        [
            in_range("rng", "v", 0, 100),
            not_null("nn", "fk"),
            referential("ref", "fk", ref, "pk"),
        ],
        "ts",
        window="1 hour",
    )
    got = {
        (int(r["window_start"].timestamp()), r["rule"]): r["n_violations"]
        for r in out.collect()
    }
    wa = base - base % hour
    assert got == {
        (wa, "rng"): 1, (wa, "nn"): 1, (wa, "ref"): 1,
        (wa + hour, "rng"): 0, (wa + hour, "nn"): 0, (wa + hour, "ref"): 0,
    }


def test_validate_windowed_sums_to_batch_validate(spark):
    """Window totals summed over all windows must equal the batch
    audit's counts — the two tiers share one definition."""
    import random

    from telemetry_streaming_spark.operators.validation import validate_windowed

    rng = random.Random(41)
    rows = [
        (1_600_000_000 + rng.randint(0, 3 * 86_400),
         float(rng.randint(-50, 150)),
         rng.choice([rng.randint(0, 30), None]))
        for _ in range(400)
    ]
    df = spark.createDataFrame(
        [Row(ts=t, v=v, fk=k) for t, v, k in rows], "ts long, v double, fk int"
    ).select(F.timestamp_seconds("ts").alias("ts"), "v", "fk")
    ref = spark.createDataFrame([Row(pk=i) for i in range(0, 30, 2)])
    rules = lambda: [
        in_range("rng", "v", 0, 100),
        not_null("nn", "fk"),
        referential("ref", "fk", ref, "pk"),
    ]
    windowed = validate_windowed(df, rules(), "ts", window="6 hours")
    summed = {
        r["rule"]: r["total"]
        for r in windowed.groupBy("rule")
        .agg(F.sum("n_violations").alias("total"))
        .collect()
    }
    batch = _counts(validate(df, rules()))
    assert summed == batch


def test_validate_windowed_drops_null_ts_rows(spark):
    """A NULL event time has no window: the row is excluded from every
    windowed count (documented contract — catch it with not_null(ts)
    in the batch audit, which counts all rows)."""
    from telemetry_streaming_spark.operators.validation import validate_windowed

    df = spark.createDataFrame(
        [Row(ts=1_600_000_000, v=500.0), Row(ts=None, v=500.0)],
        "ts long, v double",
    ).select(F.timestamp_seconds("ts").alias("ts"), "v")
    out = validate_windowed(
        df, [in_range("rng", "v", 0, 100)], "ts", window="1 hour"
    ).collect()
    assert len(out) == 1 and out[0]["n_violations"] == 1
    # the batch audit still sees both rows
    assert _counts(validate(df, [in_range("rng", "v", 0, 100)])) == {"rng": 2}


def test_validate_windowed_rejects_unique(spark):
    from telemetry_streaming_spark.operators.validation import validate_windowed

    df = spark.createDataFrame([Row(ts=1, k=1)]).select(
        F.timestamp_seconds("ts").alias("ts"), "k"
    )
    with pytest.raises(ValueError, match="unique"):
        validate_windowed(df, [unique("u", "k")], "ts")
    with pytest.raises(ValueError):
        validate_windowed(df, [], "ts")


def test_validate_windowed_streams_and_matches_batch(spark, tmp_path):
    """The monitor is ONE stateful windowed aggregate: it runs under a
    watermark with append emission, and a closed window's rows equal
    the batch run on the same events."""
    import json
    import uuid

    from telemetry_streaming_spark.operators.validation import validate_windowed
    from telemetry_streaming_spark.streaming.core import (
        checkpoint_path,
        drain,
        stop_quietly,
        text_file_source,
    )

    base = 1_600_000_000
    win_a = [
        (base + 10, 500.0, 1),
        (base + 20, 5.0, 999),
        (base + 30, 5.0, 3),
    ]
    flusher = [(base + 7_200, 5.0, 2)]

    def write(rows):
        import os

        d = str(tmp_path / "in")
        os.makedirs(d, exist_ok=True)
        with open(f"{d}/{uuid.uuid4().hex}.txt", "w") as f:
            f.write("\n".join(
                json.dumps({"ts_s": t, "v": v, "fk": k}) for t, v, k in rows
            ) + "\n")
        return d

    in_dir = write(win_a)
    raw = text_file_source(spark, in_dir)
    parsed = raw.select(
        F.timestamp_seconds(
            F.get_json_object("value", "$.ts_s").cast("long")
        ).alias("ts"),
        F.get_json_object("value", "$.v").cast("double").alias("v"),
        F.get_json_object("value", "$.fk").cast("int").alias("fk"),
    )
    ref = spark.createDataFrame([Row(pk=i) for i in range(10)])
    rules = lambda: [
        in_range("rng", "v", 0, 100),
        referential("ref", "fk", ref, "pk"),
    ]
    monitored = validate_windowed(
        parsed, rules(), "ts", window="1 hour", watermark="0 seconds"
    )
    name = f"viol_test_{uuid.uuid4().hex[:8]}"
    query = (
        monitored.writeStream.queryName(name)
        .format("memory")
        .outputMode("append")
        .option("checkpointLocation", checkpoint_path("viol", str(tmp_path / "ck")))
        .start()
    )
    try:
        drain(query)
        write(flusher)
        drain(query)
        got = sorted(
            (int(r["window_start"].timestamp()), r["rule"], r["n_violations"])
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        )
    finally:
        stop_quietly(query)
    batch_df = spark.createDataFrame(
        [Row(ts=t, v=v, fk=k) for t, v, k in win_a], "ts long, v double, fk int"
    ).select(F.timestamp_seconds("ts").alias("ts"), "v", "fk")
    batch = sorted(
        (int(r["window_start"].timestamp()), r["rule"], r["n_violations"])
        for r in validate_windowed(batch_df, rules(), "ts", window="1 hour").collect()
    )
    assert got == batch and len(got) == 2


def test_validate_empty_frame_reports_zero_not_null(spark):
    """An empty (or fully filtered) frame must report 0 violations per
    rule, not NULL: SUM over zero rows is NULL and the fused aggregate
    must coalesce it (consumers compare n_violations == 0)."""
    df = spark.createDataFrame(
        [], "a int, s string"
    )
    out = _counts(
        validate(
            df,
            [not_null("nn", "a"), in_range("rng", "a", 0, 10), unique("uni", "a", "s")],
        )
    )
    assert out == {"nn": 0, "rng": 0, "uni": 0}
    assert all(v is not None for v in out.values())


def test_validate_windowed_restart_recovers_and_matches_batch(spark, tmp_path):
    """Kill-and-resume discipline for the streaming monitor (r6 verdict
    item 5): run with a checkpoint, hard-stop mid-stream BEFORE any
    window flushes, restart from the same checkpoint, push the
    watermark past the open windows — the flushed violation counts
    must equal the batch audit on the same events, with no lost and no
    duplicated (window, rule) rows."""
    import json
    import os
    import uuid

    from telemetry_streaming_spark.operators.validation import validate_windowed
    from telemetry_streaming_spark.streaming.core import (
        checkpoint_path,
        drain,
        stop_quietly,
        text_file_source,
    )

    base = 1_600_000_000
    hour = 3600
    win_a = [
        (base + 10, 500.0, 1),   # range violation
        (base + 20, 5.0, 999),   # dangling fk
        (base + 30, 5.0, 3),
    ]
    win_b = [
        (base + hour + 10, -1.0, 999),  # range + dangling in window B
    ]
    flusher = [(base + 4 * hour, 5.0, 2)]  # pushes watermark past A and B

    in_dir = str(tmp_path / "in")

    def write(rows):
        os.makedirs(in_dir, exist_ok=True)
        with open(f"{in_dir}/{uuid.uuid4().hex}.txt", "w") as f:
            f.write("\n".join(
                json.dumps({"ts_s": t, "v": v, "fk": k}) for t, v, k in rows
            ) + "\n")

    def monitored():
        raw = text_file_source(spark, in_dir)
        parsed = raw.select(
            F.timestamp_seconds(
                F.get_json_object("value", "$.ts_s").cast("long")
            ).alias("ts"),
            F.get_json_object("value", "$.v").cast("double").alias("v"),
            F.get_json_object("value", "$.fk").cast("int").alias("fk"),
        )
        ref = spark.createDataFrame([Row(pk=i) for i in range(10)])
        return validate_windowed(
            parsed,
            [in_range("rng", "v", 0, 100), referential("ref", "fk", ref, "pk")],
            "ts",
            window="1 hour",
            watermark="0 seconds",
        )

    out_dir = str(tmp_path / "out")
    ckpt = checkpoint_path("viol_restart", str(tmp_path / "ck"))
    os.makedirs(out_dir, exist_ok=True)

    def start():
        return (
            monitored().writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .start()
        )

    # phase 1: ingest windows A and B, then KILL — watermark sits at
    # win_b's max event, so neither window has flushed yet
    write(win_a)
    write(win_b)
    q1 = start()
    try:
        drain(q1)
    finally:
        stop_quietly(q1)  # hard stop mid-stream

    # phase 2: restart from the SAME checkpoint; the flusher advances
    # the watermark past A and B on the next trigger
    write(flusher)
    q2 = start()
    try:
        drain(q2)
        write(flusher)  # second send advances the watermark past B
        drain(q2)
    finally:
        stop_quietly(q2)

    got = sorted(
        (int(r["window_start"].timestamp()), r["rule"], r["n_violations"])
        for r in spark.read.parquet(out_dir).collect()
    )
    # no duplicate (window, rule) rows across the restart
    keys = [(w, rule) for w, rule, _ in got]
    assert len(keys) == len(set(keys)), f"duplicate rows after restart: {got}"

    # flushed counts equal the batch audit on the same events
    all_rows = win_a + win_b
    batch_df = spark.createDataFrame(
        [Row(ts=t, v=v, fk=k) for t, v, k in all_rows], "ts long, v double, fk int"
    ).select(F.timestamp_seconds("ts").alias("ts"), "v", "fk")
    ref = spark.createDataFrame([Row(pk=i) for i in range(10)])
    batch = sorted(
        (int(r["window_start"].timestamp()), r["rule"], r["n_violations"])
        for r in validate_windowed(
            batch_df,
            [in_range("rng", "v", 0, 100), referential("ref", "fk", ref, "pk")],
            "ts",
            window="1 hour",
        ).collect()
    )
    assert got == batch and len(got) == 4
