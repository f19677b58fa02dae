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
