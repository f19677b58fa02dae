"""Plan-lint tool (cli.py lint): the detector must fire on real plans
containing each anti-pattern and stay quiet on the registry's plans
(the full-registry clean sweep runs via `lint --all --strict`;
measured clean at r6 — this test keeps a fast representative sample
in CI)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from telemetry_streaming_spark.cli import lint_plan, main


def _plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_lint_flags_cartesian_product(spark):
    a = spark.createDataFrame([Row(x=i) for i in range(10)])
    b = spark.createDataFrame([Row(y=i) for i in range(10)])
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(a.crossJoin(b).where(F.col("x") * F.col("y") > 3))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    sevs = [s for s, _ in lint_plan(plan)]
    assert "error" in sevs, plan[:500]


def test_lint_flags_row_at_a_time_python_udf(spark):
    bad = F.udf(lambda v: v + 1, "long")
    df = spark.createDataFrame([Row(x=1)]).select(bad("x"))
    findings = lint_plan(_plan(df))
    assert any("BatchEvalPython" in m for _, m in findings)


def test_lint_warns_on_unbounded_global_sort_but_not_topk(spark):
    df = spark.createDataFrame([Row(x=i) for i in range(10)])
    warn = lint_plan(_plan(df.orderBy("x")))
    assert any(s == "warn" for s, _ in warn)
    topk = lint_plan(_plan(df.orderBy("x").limit(3)))
    assert not topk, topk
    # Arrow-batched pandas UDFs are the SANCTIONED python path
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def ok(v):
        return v + 1

    assert not lint_plan(_plan(df.select(ok("x"))))


def test_lint_cli_sample_is_clean_and_strict_passes(spark, capsys):
    main([
        "lint", "--strict", "--sf-dir", "/root/testdata/sf0.001",
        "--query",
        "pricing_summary,dedup_minhash_lsh,bloom_semi_join,pagerank_top,"
        "similarity_topk,bigram_path_stats,windowed_violations,asof_join",
    ], spark=spark)
    out = capsys.readouterr().out
    assert out.count("clean") == 8, out


def test_lint_rejects_unknown_names(spark):
    with pytest.raises(SystemExit):
        main(["lint", "--query", "no_such_query"], spark=spark)
    with pytest.raises(SystemExit):
        main(["lint"], spark=spark)


def test_lint_flags_monotonic_id_join_hazard(spark):
    """r10: a plan carrying monotonically_increasing_id draws a warn —
    the id re-evaluates per physical subtree and is unsafe as a join
    key (the with_psl_domain review class)."""
    import pyspark.sql.functions as F

    from telemetry_streaming_spark.cli import lint_plan

    df = spark.range(5).withColumn("rid", F.monotonically_increasing_id())
    buf_plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    sevs = {s for s, m in lint_plan(buf_plan) if "monotonically" in m}
    assert sevs == {"warn"}
