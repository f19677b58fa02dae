"""Behavioral tests for deterministic sampling/splitting
(operators/sampling.py): layout independence, growth stability,
rate accuracy."""

import pyspark.sql.functions as F


def _docs(spark, n=2000, parts=None):
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias("source"),
    )
    return df.repartition(parts) if parts else df


def test_sample_membership_is_layout_independent(spark):
    from telemetry_streaming_spark.operators.sampling import deterministic_sample

    a = {r.doc_id for r in deterministic_sample(_docs(spark, parts=2), "doc_id", 0.3).collect()}
    b = {r.doc_id for r in deterministic_sample(_docs(spark, parts=7), "doc_id", 0.3).collect()}
    assert a == b and 0.25 < len(a) / 2000 < 0.35


def test_split_stable_under_corpus_growth(spark):
    from telemetry_streaming_spark.operators.sampling import train_eval_split

    small = train_eval_split(_docs(spark, 1000), "doc_id").collect()
    large = train_eval_split(_docs(spark, 2000), "doc_id").collect()
    small_map = {r.doc_id: r.split for r in small}
    large_map = {r.doc_id: r.split for r in large}
    assert all(large_map[k] == v for k, v in small_map.items())
    evals = sum(1 for v in large_map.values() if v == "eval")
    assert 0.03 < evals / 2000 < 0.07


def test_split_and_sample_compose(spark):
    from telemetry_streaming_spark.operators.sampling import (
        deterministic_sample,
        train_eval_split,
    )

    tagged = train_eval_split(_docs(spark), "doc_id")
    sampled = deterministic_sample(tagged, "doc_id", 0.5)
    # sampling never flips a split: re-derive and compare
    re_tagged = {r.doc_id: r.split for r in tagged.collect()}
    for r in sampled.collect():
        assert re_tagged[r.doc_id] == r.split


def test_stratified_rates(spark):
    from telemetry_streaming_spark.operators.sampling import stratified_sample

    out = stratified_sample(
        _docs(spark, 4000), "doc_id", "source",
        rates={"src0": 1.0, "src1": 0.2}, default_rate=0.5,
    )
    counts = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["src0"] == 1000            # rate 1.0 keeps everything
    assert 120 < counts["src1"] < 280        # ~200
    assert 400 < counts["src2"] < 600        # default ~500
    assert 400 < counts["src3"] < 600


def test_zero_default_drops_unlisted(spark):
    from telemetry_streaming_spark.operators.sampling import stratified_sample

    out = stratified_sample(
        _docs(spark, 400), "doc_id", "source", rates={"src0": 1.0}
    )
    assert {r.source for r in out.select("source").distinct().collect()} == {"src0"}


def test_weighted_sample_is_deterministic_and_weight_monotone(spark):
    """Same (key, salt) -> same sample across runs and partitionings;
    across many independent salts, heavier items are sampled more
    often (the property that makes it *weighted* sampling)."""
    import pyspark.sql.functions as F

    from telemetry_streaming_spark.operators.sampling import weighted_sample

    rows = [(i, 10.0 if i < 10 else 1.0) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, w double")
    a = sorted(r.id for r in weighted_sample(df, "id", "w", 8, salt="s1").collect())
    b = sorted(r.id for r in weighted_sample(df.repartition(7), "id", "w", 8, salt="s1").collect())
    assert a == b and len(a) == 8
    heavy_hits = light_hits = 0
    for i in range(60):
        picked = {r.id for r in weighted_sample(df, "id", "w", 8, salt=f"r{i}").collect()}
        heavy_hits += len([x for x in picked if x < 10])
        light_hits += len([x for x in picked if x >= 10])
    # 10 heavy (w=10) vs 30 light (w=1): heavies must dominate their
    # population share by a wide margin
    assert heavy_hits / 10 > 2.5 * (light_hits / 30)


def test_weighted_sample_grouped_quota(spark):
    import pytest

    from telemetry_streaming_spark.operators.sampling import weighted_sample

    rows = [(f"g{i % 3}", i, 1.0) for i in range(30)]
    df = spark.createDataFrame(rows, "g string, id long, w double")
    out = weighted_sample(df, "id", "w", 2, group_cols=["g"]).collect()
    per_group = {}
    for r in out:
        per_group[r.g] = per_group.get(r.g, 0) + 1
    assert per_group == {"g0": 2, "g1": 2, "g2": 2}
    with pytest.raises(ValueError):
        weighted_sample(df, "id", "w", 0)
