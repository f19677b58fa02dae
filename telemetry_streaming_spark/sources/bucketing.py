"""Bucketed-table support: co-located joins and aggregations.

At 100TB the dominant cost of a fact-fact join is shuffling both
sides.  Writing the tables bucketed (hash-partitioned into a fixed
number of files per partition) and sorted on the join key lets Spark
plan the join with **zero exchanges and zero sorts**: each task zips
bucket i of both tables.  Same for repeated aggregations on the bucket
key.  This is the storage-level analog of the reference's
"repartition before sink" discipline (R1-R6) — pay the shuffle once at
write time, reuse it for every downstream read.

Bucket metadata lives in the session catalog (``saveAsTable``) — plain
``.parquet(path)`` writes cannot record it.  Keep bucket counts equal
across tables meant to be joined; Spark only elides the exchange when
both sides agree (or one side's count divides the other's with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) parquet
    table in the session catalog."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left: str,
    right: str,
    on: Sequence[str],
    how: str = "inner",
    strategy: str | None = None,
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key.  With
    matching bucket counts the physical plan contains no Exchange (and
    with co-sorted buckets, no Sort) for either side — verified by
    tests/test_skew_bucketing.py.

    ``strategy`` forwards a join hint ("merge" / "shuffle_hash"): at
    fact-fact scale the planner picks sort-merge naturally, but on
    small inputs it would prefer a broadcast, which ignores bucketing —
    pass "merge" to exercise/force the co-located path."""
    lt, rt = spark.table(left), spark.table(right)
    if strategy:
        lt, rt = lt.hint(strategy), rt.hint(strategy)
    return lt.join(rt, list(on), how)
