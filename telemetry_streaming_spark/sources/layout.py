"""Storage-layout writers: the data-organization half of the 100TB
story.

Query-side pruning (PushedFilters, PartitionFilters) only pays off if
the write side laid the data out so pruning has something to skip:

- ``write_range_sorted``: global range partitioning on the sort key
  (``repartitionByRange`` samples the key distribution, so output
  files get *disjoint* key ranges) + ``sortWithinPartitions`` (rows
  sorted inside every row group).  Parquet footers then carry tight,
  non-overlapping min/max stats per file and per row group, and a
  range predicate on the key skips everything but the matching
  files — the poor man's clustered index.  The disjointness is
  asserted from the actual footers in tests/test_layout.py.

- ``write_partitioned``: hive-style directory partitioning
  (``partitionBy``) for low-cardinality columns (day, channel).  A
  reader's predicate on the partition column never opens non-matching
  directories at all (PartitionFilters, no file I/O); an optional
  in-partition sort layers the row-group pruning on top.

Choosing between them: directory partitioning for the column every
query filters on and whose cardinality stays in the thousands
(days × channels); range-sort for high-cardinality keys (ids,
timestamps) *within* those directories.  Too many tiny partitions is
the classic failure (one dir per user = millions of S3 listings) —
that is what the cardinality guard is for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Hive-style partitioning explodes into one directory per distinct
# value; past a few thousand the file listing dominates query time.
MAX_PARTITION_CARDINALITY = 10_000


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: str | list[str],
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_files`` parquet files with globally disjoint,
    internally sorted ``sort_cols`` ranges (range-partition + in-file
    sort)."""
    cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
    if n_files <= 0:
        raise ValueError("n_files must be positive")
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: str | list[str],
    sort_cols: str | list[str] | None = None,
    mode: str = "overwrite",
    max_cardinality: int = MAX_PARTITION_CARDINALITY,
) -> None:
    """Write hive-partitioned parquet, optionally range-sorting rows
    inside each partition for row-group pruning on a second key.

    Refuses layouts whose partition-column cardinality exceeds
    ``max_cardinality`` — the small-files failure mode is cheaper to
    reject at write time than to compact later.
    """
    pcols = [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
    n = df.select(*pcols).distinct().limit(max_cardinality + 1).count()
    if n > max_cardinality:
        raise ValueError(
            f"partition columns {pcols} have >{max_cardinality} distinct values; "
            "use write_range_sorted for high-cardinality keys"
        )
    out = df
    if sort_cols is not None:
        scols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        # one task per partition-value group keeps each output file's
        # sort range tight; the sort covers partition cols first so
        # rows land in their directory already clustered
        out = df.repartitionByRange(*pcols, *scols).sortWithinPartitions(*pcols, *scols)
    out.write.mode(mode).partitionBy(*pcols).parquet(path)


# Edge resolution is capped: 2^12 - 1 interior quantiles per column is
# ample rank resolution for file-level clustering (files number in the
# thousands, not millions), and it keeps the percentile literal array
# and the sketch memory bounded.  Requested bits beyond the cap shift
# the found bin into the high bits so the z-value contract ([0, 2^bits)
# per column) is unchanged.
_MAX_EDGE_BITS = 12


def _prefix_decimal(c, dtype: str):
    """Exact big-endian integer of a string/binary column's first 8
    bytes (zero-padded) as decimal(24,0) — preserves the lexicographic
    order of 8-byte prefixes."""
    from pyspark.sql import functions as F

    b = c.cast("binary") if dtype == "string" else c
    return F.conv(F.hex(F.rpad(F.substring(b, 1, 8), 8, bytes([0]))), 16, 10).cast(
        "decimal(24,0)"
    )


def _numeric_proj(c, dtype: str, shift=None):
    """Order-preserving numeric projection of an orderable column.

    Numeric/timestamp/date cast directly.  String/binary map through
    their exact 8-byte-prefix decimal MINUS ``shift`` (the column
    minimum, computed once by the caller) before the double cast: raw
    prefix integers sit near 2^63 where a double's ulp is ~2^11, so
    without the shift every key sharing a long common prefix collapses
    into one double — the shift re-centers the range at 0, where
    differences up to 2^53 stay exact.
    """
    from pyspark.sql import functions as F

    if dtype in ("string", "binary"):
        dec = _prefix_decimal(c, dtype)
        if shift is not None:
            dec = dec - F.lit(shift)
        return dec.cast("double")
    if dtype.startswith("timestamp"):
        return c.cast("double")
    if dtype == "date":
        return c.cast("timestamp").cast("double")
    return c.cast("double")


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16):
    """Z-value (Morton) column interleaving ``cols`` bit-by-bit.

    Each column is rank-normalized to ``[0, 2^bits)`` against bin
    edges from ONE ``percentile_approx`` aggregate (distribution-
    adaptive — a skewed column still spreads over the full bit range,
    which raw min/max scaling does not give); rows are then bucketed
    with ``pyspark.ml.feature.Bucketizer`` — a JVM-side binary search
    over the splits, map-only.  No global sort, no un-partitioned
    window (the old ``percent_rank`` form funneled the whole dataset
    through one task per column), no UDF; the only exchange is the
    sketch's partial-merge aggregate, and the only driver-side
    materialization is the edge list itself (< 2^12 doubles per
    column by construction — the same bounded-sample contract as
    Spark's own RangePartitioner).

    Returns ``(df_with_binned_cols, z_column)``; the z expression is
    a pure sum of shift/mask terms over the bin columns.
    """
    from pyspark.ml.feature import Bucketizer
    from pyspark.sql import functions as F

    if not 1 <= len(cols) <= 4:
        raise ValueError("zorder_key supports 1-4 columns")
    if bits * len(cols) > 63:
        raise ValueError(f"bits={bits} x {len(cols)} cols exceeds a signed long")

    edge_bits = min(bits, _MAX_EDGE_BITS)
    dtypes = dict(df.dtypes)
    # string/binary columns need their prefix-decimal minimum (one
    # tiny agg) so the double projection is precision-safe — see
    # _numeric_proj
    dec_cols = [c for c in cols if dtypes[c] in ("string", "binary")]
    shifts = {}
    if dec_cols:
        mins = df.agg(
            *[F.min(_prefix_decimal(F.col(c), dtypes[c])).alias(c) for c in dec_cols]
        ).collect()[0]
        from decimal import Decimal

        shifts = {c: (mins[c] if mins[c] is not None else Decimal(0)) for c in dec_cols}
    probs = [i / (1 << edge_bits) for i in range(1, 1 << edge_bits)]
    edge_row = df.agg(
        *[
            F.percentile_approx(
                _numeric_proj(F.col(c), dtypes[c], shifts.get(c)),
                probs,
                max(10_000, 4 << edge_bits),
            ).alias(c)
            for c in cols
        ]
    ).collect()[0]

    out = df
    binned = []
    for c in cols:
        out = out.withColumn(
            f"__zsrc_{c}", _numeric_proj(F.col(c), dtypes[c], shifts.get(c))
        )
        # the sketch repeats an edge where the data is heavy; splits
        # must be strictly increasing, so dedupe (bins stay monotone)
        edges = sorted(set(edge_row[c] or []))
        b = f"__zbin_{c}"
        if not edges:  # empty or constant column: single bin
            out = out.withColumn(b, F.lit(0).cast("long"))
            binned.append(b)
            continue
        n_bins = len(edges) + 1
        bucketizer = Bucketizer(
            inputCol=f"__zsrc_{c}",
            outputCol=f"__zraw_{c}",
            splits=[float("-inf"), *edges, float("inf")],
            handleInvalid="keep",  # null/NaN -> extra bucket, clamped below
        )
        out = bucketizer.transform(out)
        raw = F.col(f"__zraw_{c}").cast("long")
        raw = F.when(raw >= n_bins, F.lit(0)).otherwise(raw)  # nulls sort first
        out = out.withColumn(
            b, F.floor(raw * F.lit(float(1 << bits)) / F.lit(float(n_bins))).cast("long")
        )
        binned.append(b)
    out = out.drop(*[f"__zsrc_{c}" for c in cols], *[f"__zraw_{c}" for c in cols])
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(binned):
            z = z + F.shiftleft(
                F.shiftright(F.col(b), i).bitwiseAND(F.lit(1)),
                i * len(binned) + j,
            )
    return out, z.alias("__z")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet: multi-column data skipping.

    A single-column range sort gives tight footer stats on ONE column;
    Z-ordering interleaves the bit planes of several, so every output
    file covers a small hyper-box of the value space and predicates on
    ANY of the clustered columns (or boxes over several) skip most
    files.  The footer-level effect is asserted in
    ``tests/test_layout.py``: per-file (min, max) boxes from the
    actual parquet metadata must be dramatically tighter than a
    linear sort's on the secondary column.
    """
    if n_files <= 0:
        raise ValueError("n_files must be positive")
    keyed, z = zorder_key(df, cols, bits)
    (
        keyed.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__zbin_{c}" for c in cols])
        .write.mode(mode)
        .parquet(path)
    )
