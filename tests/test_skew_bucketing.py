"""Scale utilities: skew salting (results identical to plain ops,
placement spread over salts) and bucketed co-located joins (exchange
elision verified at the plan level)."""

import contextlib
import io

import pyspark.sql.functions as F
import pytest

from telemetry_streaming_spark.operators.skew import (
    salted_agg,
    salted_join,
    split_hot_keys,
    with_salt,
)
from telemetry_streaming_spark.sources.bucketing import bucketed_join, write_bucketed
from telemetry_streaming_spark.sources.registry import load_table
from tests.conftest import SF_SMOKE


def _explain(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def skewed(spark):
    # one heavy-hitter user (80% of rows) + a uniform tail
    rows = [(0, float(i % 7)) for i in range(4000)] + [
        (i % 50 + 1, float(i % 11)) for i in range(1000)
    ]
    return spark.createDataFrame(rows, "user_id long, value double")


def test_salted_agg_matches_plain_agg(spark, skewed):
    got = {
        r.user_id: (r.n, r.sum_v, r.mx)
        for r in salted_agg(
            skewed,
            ["user_id"],
            {
                "n": (F.count(F.lit(1)), F.sum(F.col("n"))),
                "sum_v": (F.sum("value"), F.sum(F.col("sum_v"))),
                "mx": (F.max("value"), F.max(F.col("mx"))),
            },
            n_salts=16,
        ).collect()
    }
    want = {
        r.user_id: (r.n, r.sum_v, r.mx)
        for r in skewed.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_v"), F.max("value").alias("mx"))
        .collect()
    }
    assert got == want
    assert got[0][0] == 4000  # the hot key survived intact


def test_salt_spreads_hot_key(spark, skewed):
    n = (
        with_salt(skewed.where(F.col("user_id") == 0), 16)
        .select("__salt")
        .distinct()
        .count()
    )
    assert n > 8  # hot key's rows land on many salts


def test_salted_join_matches_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [(i, f"u{i}") for i in range(0, 51)], "user_id long, name string"
    )
    got = sorted(
        (r.user_id, r.value, r.name)
        for r in salted_join(skewed, dim, ["user_id"], n_salts=8).collect()
    )
    want = sorted(
        (r.user_id, r.value, r.name) for r in skewed.join(dim, ["user_id"]).collect()
    )
    assert got == want


def test_split_hot_keys(spark, skewed):
    hot, cold, keys = split_hot_keys(skewed, ["user_id"], threshold=1000)
    assert [r.user_id for r in keys.collect()] == [0]
    assert hot.count() == 4000
    assert cold.count() == 1000


def test_bucketed_join_has_no_exchange(spark):
    """Co-bucketed, co-sorted tables must join with zero Exchange and
    zero Sort nodes — the pay-the-shuffle-once-at-write contract."""
    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "k"), "bt_orders", ["k"], 4, sort_cols=["k"]
    )
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "k"), "bt_lineitem", ["k"], 4, sort_cols=["k"]
    )
    try:
        joined = bucketed_join(spark, "bt_orders", "bt_lineitem", ["k"], strategy="merge")
        plan = _explain(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # values survive the storage round trip
        want = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
        assert joined.count() == want
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_orders")
        spark.sql("DROP TABLE IF EXISTS bt_lineitem")


def test_bucketed_agg_has_no_exchange(spark):
    """Aggregation keyed on the bucket column reads pre-partitioned
    data — no exchange before the hash aggregate."""
    orders = load_table(spark, SF_SMOKE, "orders").select("o_custkey", "o_totalprice")
    write_bucketed(orders, "bt_orders_agg", ["o_custkey"], 4)
    try:
        out = (
            spark.table("bt_orders_agg")
            .groupBy("o_custkey")
            .agg(F.sum("o_totalprice").alias("s"))
        )
        plan = _explain(out)
        assert "Exchange" not in plan, plan
        assert out.count() == orders.select("o_custkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_orders_agg")
