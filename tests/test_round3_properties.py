"""Property pins for round-3 additions whose edge behaviors were
established in verification drives — held here so CI keeps them."""

import pyspark.sql.functions as F


def test_mixture_plan_surfaces_absent_stratum(spark):
    """A weighted stratum with zero corpus rows must still get a plan
    row (available=0, planned=0 < target) — not silently vanish with
    its budget share unassigned."""
    from telemetry_streaming_spark.operators.sampling import mixture_plan

    docs = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 50), (3, "b", 25)],
        "doc_id long, source string, n_chars long",
    )
    plan = {r["source"]: r for r in
            mixture_plan(docs, "source", {"a": 0.5, "ghost": 0.4},
                         size_col="n_chars").collect()}
    g = plan["ghost"]
    assert g["available"] == 0 and g["planned_size"] == 0 and g["rate"] == 0.0
    assert g["target_size"] == int(0.4 * 175)
    # present strata keep exact sizes and capped rates
    assert plan["a"]["available"] == 150 and plan["a"]["rate"] <= 1.0
    assert plan["b"]["available"] == 25  # unweighted stratum still listed


def test_event_dedup_key_propagates_null(spark):
    """A NULL key field must produce a NULL dedup key (excluded from
    the distinct count), matching the oracle's || semantics — not a
    concat_ws-style field drop that aliases NULL users together."""
    import datetime as dt

    from telemetry_streaming_spark.plans.queries import QUERIES  # noqa: F401

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 5), None, "click", 1.0, "p"),
        (2, dt.datetime(2024, 1, 1, 0, 6), None, "click", 1.0, "p"),
        (3, dt.datetime(2024, 1, 1, 0, 7), 7, "click", 1.0, "p"),
        (4, dt.datetime(2024, 1, 1, 0, 8), 7, "click", 1.0, "p"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    key = F.md5(
        F.concat(
            F.col("user_id").cast("string"), F.lit("|"),
            F.col("event_type"), F.lit("|"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").cast("string"), F.lit("|"),
            F.coalesce(F.col("props"), F.lit("")),
        )
    )
    got = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(key).alias("nd"),
    ).first()
    # the two NULL-user rows contribute NO key (not a shared one):
    # distinct keys == 1 (the real user's), not 2
    assert got["n"] == 4 and got["nd"] == 1


def test_pareto_bands_monotone_and_reconcile(spark):
    from telemetry_streaming_spark.plans.queries import QUERIES

    rows = sorted(
        QUERIES["pareto_spend_bands"].fn(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: -r.band,
    )
    assert all(rows[i].cum_cust <= rows[i + 1].cum_cust for i in range(len(rows) - 1))
    assert rows[-1].cum_spend_cents == sum(r.spend_cents for r in rows)
    assert rows[-1].cum_cust == sum(r.n_cust for r in rows)
