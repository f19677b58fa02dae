"""Property tests: incremental merge and CDC compaction vs brute force.

Random row sets, random partition assignments, and random merge trees
must always reproduce the one-pass answer — the algebraic property the
production foreachBatch loop depends on."""

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from telemetry_streaming_spark.operators.incremental import merge_aggregates
from telemetry_streaming_spark.operators.timeseries import latest_snapshot

rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 3),      # key
        st.integers(-50, 50),   # value
        st.integers(0, 2),      # partition assignment
    ),
    min_size=1,
    max_size=30,
)


@pytest.mark.usefixtures("spark")
@given(rows=rows_strategy, pairwise=st.booleans())
@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@pytest.mark.full  # r11: >=5s; fast-tier siblings cover this surface
def test_any_partitioning_and_merge_tree_equals_one_pass(spark, rows, pairwise):
    df = spark.createDataFrame([(k, v) for k, v, _ in rows], "k long, v long")

    def agg(part):
        return part.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )

    parts = []
    for p in range(3):
        sub = [(k, v) for k, v, part in rows if part == p]
        if sub:
            parts.append(agg(spark.createDataFrame(sub, "k long, v long")))
    kw = dict(count_cols=["n"], sum_cols=["s"], min_cols=["lo"], max_cols=["hi"])
    if pairwise and len(parts) > 1:
        acc = parts[0]
        for nxt in parts[1:]:
            acc = merge_aggregates([acc, nxt], ["k"], **kw)
        merged = acc
    else:
        merged = merge_aggregates(parts, ["k"], **kw)
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in agg(df).collect()}


snapshot_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 5), st.integers(0, 5)),
    min_size=1,
    max_size=25,
)


@pytest.mark.usefixtures("spark")
@given(rows=snapshot_rows)
@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@pytest.mark.full  # r11: >=5s; fast-tier siblings cover this surface
def test_latest_snapshot_ties_resolve_deterministically(spark, rows):
    """With duplicate (key, ts) rows the tie column must decide, and
    the result is exactly one row per key — the max (ts, tie) pair."""
    df = spark.createDataFrame(rows, "k long, ts long, seq long")
    got = {r.k: (r.ts, r.seq) for r in latest_snapshot(
        df, on="k", ts_col="ts", tie_cols=["seq"]).collect()}
    expected = {}
    for k, ts, seq in rows:
        if k not in expected or (ts, seq) > expected[k]:
            expected[k] = (ts, seq)
    assert got == expected


@pytest.mark.usefixtures("spark")
@given(rows=snapshot_rows)
@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@pytest.mark.full  # r11: >=5s; fast-tier siblings cover this surface
def test_latest_snapshot_tombstones_match_replica(spark, rows):
    """delete_when: a key whose NEWEST row is a tombstone vanishes; an
    older tombstone is superseded by any later upsert.  seq % 3 == 0
    marks the tombstones, so the property mixes deletes freely into
    the change log."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "k long, ts long, seq long")
    got = {r.k: (r.ts, r.seq) for r in latest_snapshot(
        df, on="k", ts_col="ts", tie_cols=["seq"],
        delete_when=F.col("seq") % 3 == 0,
    ).collect()}
    newest = {}
    for k, ts, seq in rows:
        if k not in newest or (ts, seq) > newest[k]:
            newest[k] = (ts, seq)
    expected = {k: v for k, v in newest.items() if v[1] % 3 != 0}
    assert got == expected


def test_latest_snapshot_null_tombstone_predicate_keeps_row(spark):
    """A NULL delete predicate on the survivor (e.g. op column absent)
    is 'not a tombstone' — pinned, because raw three-valued logic
    would silently drop the row."""
    from pyspark.sql import Row, functions as F

    df = spark.createDataFrame(
        [Row(k=1, ts=1, op=None), Row(k=2, ts=1, op="d")],
        "k long, ts long, op string",
    )
    got = {r.k for r in latest_snapshot(
        df, on="k", ts_col="ts", delete_when=F.col("op") == "d"
    ).collect()}
    assert got == {1}
