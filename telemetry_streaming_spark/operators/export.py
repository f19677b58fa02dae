"""Deterministic training-data export: global pseudorandom shuffle,
fixed shard count, verifiable manifest.

The last mile of a curation pipeline: the cleaned corpus must be
written as N shards whose *membership and internal order* are pure
functions of the data — so a re-run after a cluster failure, a
different partition layout, or a different executor count produces
byte-identical training input (and therefore an identical data order
for the training job).  ``df.repartition(N)`` + ``df.sample``-style
shuffling fails this: both depend on physical partition layout.

Scheme (same md5 contract as ``operators/sampling.py``):

- ``shard``     = 32-bit md5 slice of the salted key, mod n_shards —
  uniform, engine-portable, independent of the sort key bits.
- ``sort_key``  = full md5 hex of the salted key — the intra-shard
  pseudorandom order (seeded by ``salt``: a different salt is a fresh
  global shuffle, e.g. per epoch).
- checksum      = per-shard SUM of (48-bit md5 slice mod P) mod P —
  order-independent integer arithmetic, so the manifest is comparable
  across engines and runs regardless of aggregation order.  With
  P ~ 1e6 the running sum stays exact (< 2^63) up to ~9e12 rows per
  shard — far beyond any real shard.

Plan shape: ONE exchange (hash on the shard column) + an intra-task
sort.  Nothing global: no ``orderBy`` over the corpus, no
single-partition stage, no sampled range boundaries (RangePartitioner
sampling would make shard membership data-dependent).  Each task owns
whole shards, so ``partitionBy(shard)`` emits exactly one file per
shard directory.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

CHECKSUM_MOD = 1_000_003  # prime; SUM stays exact to ~9e12 rows/shard


def _salted_md5(key: Column, salt: str) -> Column:
    return F.md5(F.concat(key.cast("string"), F.lit(salt)))


def shard_assignments(
    df: DataFrame, id_col: str = "doc_id", n_shards: int = 16, salt: str = ""
) -> DataFrame:
    """Append ``shard`` (int) and ``sort_key`` (md5 hex) columns.

    Pure per-row map — membership and order are functions of
    (id, salt) only, never of layout or executor count.
    """
    h = _salted_md5(F.col(id_col), salt)
    shard = (
        F.conv(F.substring(h, 25, 8), 16, 10).cast("long") % F.lit(n_shards)
    ).cast("int")
    return df.withColumn("shard", shard).withColumn("sort_key", h)


def shard_manifest(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 16,
    salt: str = "",
    size_col: str | None = None,
) -> DataFrame:
    """Per-shard manifest: row count, optional payload size sum, an
    order-independent checksum, and the first/last sort keys.

    This is the verification artifact shipped next to the shards: a
    consumer (or a re-run) recomputes it and compares — equal
    manifests mean equal shard membership with overwhelming
    probability, without re-reading payload bytes.
    """
    assigned = shard_assignments(df, id_col, n_shards, salt)
    h48 = F.conv(F.substring(F.col("sort_key"), 1, 12), 16, 10).cast("long")
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        # n_keys < n_rows exposes duplicate ids — which void the
        # byte-identical-re-run guarantee (equal sort keys tie, and
        # tie order follows physical arrival): the manifest makes the
        # uniqueness contract checkable instead of assumed.
        F.count_distinct("sort_key").alias("n_keys"),
        (F.sum(h48 % F.lit(CHECKSUM_MOD)) % F.lit(CHECKSUM_MOD)).alias("checksum"),
        F.min("sort_key").alias("first_key"),
        F.max("sort_key").alias("last_key"),
    ]
    if size_col is not None:
        aggs.insert(1, F.sum(size_col).alias("sum_size"))
    return assigned.groupBy("shard").agg(*aggs)


def export_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_shards: int = 16,
    salt: str = "",
    mode: str = "error",
) -> None:
    """Write ``df`` as ``path/shard=K/`` parquet, one file per shard,
    rows in deterministic pseudorandom order.

    CONTRACT: ``id_col`` must be unique — duplicate ids share a sort
    key, and the tied rows' relative order follows physical arrival,
    which is exactly the layout-dependence this writer exists to
    eliminate.  The manifest's ``n_keys`` column makes a violation
    visible (n_keys < n_rows) without a separate validation job.

    ``repartition(n_shards, shard)`` hash-partitions on the SHARD
    VALUE (not the row), so every task owns whole shards and each
    shard directory receives exactly one file; ``sortWithinPartitions``
    fixes the intra-file order.  One exchange total.  A shard count
    chosen so that shard_bytes ~ a few hundred MB keeps both the write
    tasks and the training-side readers balanced at 100TB.
    """
    assigned = shard_assignments(df, id_col, n_shards, salt)
    (
        assigned.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "sort_key")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )
