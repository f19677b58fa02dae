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


class TestPerGroupCap:
    def _docs(self, spark, n=500, groups=3):
        return spark.createDataFrame(
            [(i, f"g{i % groups}") for i in range(n)], "doc_id long, source string"
        )

    def test_cap_enforced_and_deterministic(self, spark):
        from telemetry_streaming_spark.operators.sampling import per_group_cap

        docs = self._docs(spark)
        out = per_group_cap(docs, "source", "doc_id", cap=40)
        counts = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
        assert all(v == 40 for v in counts.values())
        again = {tuple(r) for r in per_group_cap(docs, "source", "doc_id", cap=40).collect()}
        assert {tuple(r) for r in out.collect()} == again

    def test_growth_outside_group_stable(self, spark):
        """Adding documents to OTHER groups never changes a group's
        surviving set (the contamination-stability contract)."""
        from telemetry_streaming_spark.operators.sampling import per_group_cap

        docs = self._docs(spark, n=300)
        before = {
            r.doc_id
            for r in per_group_cap(docs, "source", "doc_id", cap=25).collect()
            if r.source == "g0"
        }
        grown = docs.union(
            spark.createDataFrame(
                [(10_000 + i, "g1") for i in range(200)], "doc_id long, source string"
            )
        )
        after = {
            r.doc_id
            for r in per_group_cap(grown, "source", "doc_id", cap=25).collect()
            if r.source == "g0"
        }
        assert before == after

    def test_matches_single_window_reference(self, spark):
        """The salted two-level rank must equal the naive one-window
        ranking exactly (same survivors, same ranks)."""
        from pyspark.sql import Window

        from telemetry_streaming_spark.operators.sampling import per_group_cap

        docs = self._docs(spark, n=400, groups=2)
        w = Window.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
        naive = {
            (r.doc_id, r.source, r.rk)
            for r in docs.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= 33)
            .collect()
        }
        got = {
            (r.doc_id, r.source, r["__rk"])
            for r in per_group_cap(docs, "source", "doc_id", cap=33, keep_rank=True).collect()
        }
        assert naive == got

    def test_plan_has_no_group_only_window(self, spark):
        """Scale gate: every Window node must partition by the salt
        bucket too — a group-only window is the hot-domain straggler
        this operator exists to avoid."""
        import re

        from telemetry_streaming_spark.operators.sampling import per_group_cap

        docs = self._docs(spark)
        plan = per_group_cap(docs, "source", "doc_id", cap=10)._jdf.queryExecution().executedPlan().toString()
        for m in re.finditer(r"row_number\(\).*?windowspecdefinition\(([^)]*)\)", plan):
            assert "__b" in m.group(1), plan[:2000]


def test_per_group_cap_keeps_null_group_and_null_keys(spark):
    """NULL group is a group of its own; NULL-key rows rank last but
    are kept when the group is under cap (the review-found silent-drop
    bug)."""
    from telemetry_streaming_spark.operators.sampling import per_group_cap

    docs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, None), (None, "b")],
        "doc_id long, source string",
    )
    out = {(r.doc_id, r.source) for r in per_group_cap(docs, "source", "doc_id", 10).collect()}
    assert out == {(1, "a"), (2, "a"), (3, None), (4, None), (None, "b")}
    # under a tight cap, NULL keys are the first evicted (rank last)
    mixed = spark.createDataFrame(
        [(1, "g"), (2, "g"), (None, "g")], "doc_id long, source string"
    )
    kept = {r.doc_id for r in per_group_cap(mixed, "source", "doc_id", 2).collect()}
    assert kept == {1, 2}


def test_apply_mixture_executes_plan(spark):
    """plan -> apply round-trip: realized sizes land within hash noise
    of planned sizes, zero-weight strata vanish, and the run is
    reproducible."""
    from telemetry_streaming_spark.operators.sampling import apply_mixture, mixture_plan

    docs = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(3000)], "doc_id long, source string"
    )
    plan = mixture_plan(docs, "source", {"s0": 0.5, "s1": 0.1})
    out = apply_mixture(docs, plan, "doc_id", "source")
    counts = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    planned = {r.source: r.planned_size for r in plan.collect()}
    assert "s2" not in counts                      # unweighted stratum dropped
    for k in ("s0", "s1"):
        assert abs(counts.get(k, 0) - planned[k]) < 0.1 * 3000, (k, counts, planned)
    again = {tuple(r) for r in apply_mixture(docs, plan, "doc_id", "source").collect()}
    assert {tuple(r) for r in out.collect()} == again
