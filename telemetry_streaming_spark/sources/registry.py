"""Batch source registry over the driver's parquet testdata.

Mirrors the reference's source layer (SURVEY §2.1): the heka-S3
day-partitioned scan (S2) becomes a plain parquet read — Spark's
DataSource v2 gives partition pruning, predicate pushdown and column
pruning for free once plans are declarative.  Streaming variants live
in ``telemetry_streaming_spark.streaming.sources``.
"""

from __future__ import annotations

import calendar
import datetime as _dt
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Tables whose scans deserve a local fan-out repartition.  The
# driver's testdata writes each table as ONE parquet file with ONE row
# group, so Spark's split planner hands the whole scan to a single
# task.  On a real cluster a 100TB table arrives as many
# files/row-groups and this is a no-op concern.
#
# Round 2 measurement: the fan-out pays ONLY where downstream per-row
# map work is heavy (shingle explosion, md5 signatures, vector math) —
# dedup_ngram at sf0.1 is 3.8s fanned-out vs 17.6s single-scan.  For
# cheap column arithmetic (TPC-H aggregates/joins, event windows) the
# extra exchange + stage costs ~2x more than the single-threaded map
# work it parallelizes (pricing_summary 0.83s -> 0.35s without it):
# those queries' own groupBy/join shuffles already redistribute the
# rows after a trivially cheap map side.  So only the corpora with
# heavy per-row pipelines fan out by default; any query can override
# via load_table(..., parallelize=...).
_PARALLELIZE_TABLES = frozenset({"documents", "embeddings"})

# Timestamp columns whose physical encoding varies across testdata
# generations: INT64 TIMESTAMP(NANOS) (read as LongType under the
# legacy conf, then normalized — the same ns->timestamp conversion the
# reference does for its ingest timestamps, Ping.scala:169-171, SURVEY
# §2.3 P9) or TIMESTAMP(MICROS, isAdjustedToUTC=false) (read natively
# as TIMESTAMP_NTZ, normalized to session-UTC TimestampType so every
# downstream epoch expression — unix_micros, window(), date_format —
# sees one type regardless of the writer).
_NANOS_TS_COLUMNS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def _utc_micros(ts: str) -> int:
    """Epoch microseconds of a UTC 'YYYY-MM-DD[ HH:MM:SS]' literal."""
    fmt = "%Y-%m-%d %H:%M:%S" if " " in ts else "%Y-%m-%d"
    d = _dt.datetime.strptime(ts, fmt)
    return calendar.timegm(d.timetuple()) * 1_000_000


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    *,
    parallelize: bool = True,
    ts_bounds: dict[str, tuple[str | None, str | None]] | None = None,
) -> DataFrame:
    """Read one parquet table. Column pruning / filter pushdown is left
    to Catalyst — callers should select/filter on the returned frame,
    not materialize it.

    ``parallelize=False`` skips the local single-row-group fan-out
    repartition: right for queries whose first projection is narrow
    (the map work is cheap, so an exchange of raw rows costs more than
    it buys; at cluster scale the scan is already split by file).

    ``ts_bounds`` maps a nanos-encoded timestamp column to inclusive
    ``(lo, hi)`` UTC literals.  The bounds are applied to the **raw
    INT64 nanos column before conversion**, so they reach the parquet
    scan as pushable long-range predicates (row-group stats pruning at
    scale) — the ``timestamp_micros`` conversion below is opaque to
    Catalyst, which otherwise loses pushdown for every ts predicate
    (the caller still applies its exact post-conversion filter; these
    bounds are an equivalent-or-superset guard).  ``lo`` maps to
    ``nanos >= lo_us*1000``; ``hi`` to ``nanos < (hi_us+1)*1000`` —
    both exact under the μs truncation the conversion performs.
    """
    # Set at read time, not session-build time, so the contract holds
    # even under a caller-provided default SparkSession (the driver
    # builds its own).  Both are runtime-settable confs.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANOS_TS_COLUMNS.get(name, ()):
        field = df.schema[col] if col in df.columns else None
        if field is None:
            continue
        lo, hi = (ts_bounds or {}).get(col, (None, None))
        if isinstance(field.dataType, LongType):
            if lo is not None:
                df = df.where(F.col(col) >= F.lit(_utc_micros(lo) * 1000))
            if hi is not None:
                df = df.where(F.col(col) < F.lit((_utc_micros(hi) + 1) * 1000))
            # integer division: ns epoch values exceed 2^53, so a
            # double-division roundtrip is off by ±1us — DIV keeps the
            # conversion exact and floor-consistent with readers that
            # truncate nanos natively (DuckDB).
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` DIV 1000")))
        elif isinstance(field.dataType, TimestampNTZType):
            # Bounds go on the raw NTZ column (plain comparisons on the
            # scan column — pushable row-group-stats predicates); the
            # NTZ->LTZ cast below is value-preserving under the UTC
            # session timezone but opaque to pushdown, same as the
            # nanos conversion above.
            if lo is not None:
                df = df.where(F.col(col) >= F.expr(f"TIMESTAMP_NTZ '{lo}'"))
            if hi is not None:
                hi_us = _utc_micros(hi) + 1
                hi_dt = _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=hi_us)
                lit = hi_dt.strftime("%Y-%m-%d %H:%M:%S.%f")
                df = df.where(F.col(col) < F.expr(f"TIMESTAMP_NTZ '{lit}'"))
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    if parallelize and name in _PARALLELIZE_TABLES:
        try:
            target = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except Exception:
            target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < max(2, target // 2):
            df = df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so spark.sql() plans against
    them (used by SQL-expressed queries and tests)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
