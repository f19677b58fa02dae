"""Z-order (Morton) clustering key for multi-column data skipping.

Parquet row-group pruning works off per-file min/max statistics, so a
compaction that sorts by ONE column gives that column tight per-file
ranges and leaves every other filter column unbounded.  Interleaving
the bits of several columns' quantized values (the Morton curve) makes
files contiguous in a space-filling order: per-file min/max tightens
on ALL interleaved columns at once, and a conjunctive filter on any
subset prunes files multiplicatively.  This is the technique behind
Delta Lake's ``OPTIMIZE ZORDER BY`` and ClickHouse/Iceberg z-ordering,
built here from plain Column expressions so the whole pipeline stays
codegen'd — no UDF, no extra shuffle beyond the range partition the
compaction already pays.

Quantization: each column linearly maps [min, max] (one 1-row
aggregate, collected once and inlined as plan literals) onto
``bits``-bit integers; NULL quantizes to 0 (sorts first, same as SQL
NULLS FIRST).  Linear scaling is skew-sensitive — a pathological
column concentrates codes in few cells and degrades toward the
single-column sort, never below it.  At 100 TB the stats aggregate is
one cheap scan (or comes free from catalog/file-footer stats); the
key itself is a per-row map.

``bits * len(cols)`` must stay <= 63 so the interleaved key fits one
BIGINT (validated).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map [lo, hi] -> [0, 2^bits - 1] as a BIGINT; NULL -> 0."""
    cells = (1 << bits) - 1
    if hi <= lo:  # constant column: every row in cell 0
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    clamped = F.least(F.lit(1.0), F.greatest(F.lit(0.0), scaled))
    return F.coalesce(
        F.floor(clamped * F.lit(float(cells)) + F.lit(0.5)).cast("long"),
        F.lit(0).cast("long"),
    )


def zorder_key(
    quantized: list[Column],
    bits: int,
) -> Column:
    """Interleave ``bits``-bit codes into one Morton key: output bit
    ``i*len(cols) + j`` is bit ``i`` of column ``j``.  Pure shifts and
    masks — one codegen'd expression."""
    n = len(quantized)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a 63-bit key")
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, q in enumerate(quantized):
            key = key + F.shiftleft(
                F.shiftright(q, i).bitwiseAND(F.lit(1)), i * n + j
            )
    return key


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 12,
    out_col: str = "__zkey",
) -> DataFrame:
    """Attach the Morton key over ``cols`` (numeric or timestamp —
    anything Spark casts to double; cast dates to timestamp first).

    One 1-row min/max aggregate (collected, inlined as literals), then
    a stateless projection.  Sort or range-partition by ``out_col`` to
    cluster; drop it before writing if the schema must stay clean.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    if bits < 1 or bits * len(cols) > 63:
        raise ValueError(f"need 1 <= bits and bits*{len(cols)} <= 63")
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__lo{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"__hi{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    qs = []
    for i, c in enumerate(cols):
        lo, hi = stats[f"__lo{i}"], stats[f"__hi{i}"]
        if lo is None or hi is None:  # all-NULL column: constant cell
            lo, hi = 0.0, 0.0
        qs.append(_quantize(F.col(c), float(lo), float(hi), bits))
    return df.withColumn(out_col, zorder_key(qs, bits))
