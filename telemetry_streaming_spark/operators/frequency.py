"""Heavy-hitter (frequent-item) operators.

A 100TB corpus needs its dominating keys surfaced cheaply — bot users,
templated boilerplate, runaway event emitters — both to report them and
to feed the skew guards (`operators/skew.py` hot-key split,
`_drop_hot_keys` in the dedup family take exactly this shape of input).

Two tiers, mirroring the dedup/ANN tier discipline:

- :func:`heavy_hitters` — exact phi-heavy-hitters: every key whose
  count is >= ``total / k``.  One narrow shuffle of (key, partial
  count) rows with map-side combine, plus a 1-row broadcast of the
  total; the comparison is pure-integer cross-multiplication, so the
  result is engine-portable (DuckDB oracle: ``heavy_hitters``).
- :func:`approx_heavy_hitters` — single-pass sketch tier via Spark's
  ``approx_top_k`` (a SpaceSaving-style summary): the whole table
  collapses to ONE sketch row (partial sketches merge map-side), so
  shuffle volume is O(max_tracked), independent of row count.  Counts
  are exact whenever the tracker is wider than the key cardinality;
  otherwise they are upper bounds that still contain every true
  phi-heavy-hitter (SpaceSaving guarantee).  Tested against the exact
  tier in ``tests/test_frequency.py``.

At scale the sketch tier is the scan: no shuffle of per-key rows at
all.  The exact tier is the verifier — run it over the sketch's
candidate set (a semi-join) when exact counts for the survivors are
needed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import broadcast


def heavy_hitters(df: DataFrame, key_col: str, *, k: int) -> DataFrame:
    """Exact phi-heavy-hitters: keys occurring >= 1/k of the time.

    Returns ``(key_col, cnt, total)`` sorted nowhere (callers order).
    ``cnt * k >= total`` is evaluated in integer arithmetic — no
    float share is ever computed, so the predicate is exact and
    engine-portable.

    Plan shape: partial count -> exchange on key -> final count,
    then a broadcast nested-loop join against the single total row
    (1 row broadcast — the degenerate join Spark plans for a scalar).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    counts = df.groupBy(key_col).agg(F.count("*").alias("cnt"))
    total = df.agg(F.count("*").alias("total"))
    return counts.join(broadcast(total)).where(F.col("cnt") * k >= F.col("total"))


def approx_heavy_hitters(
    df: DataFrame, key_col: str, *, top_k: int, max_tracked: int = 10_000
) -> DataFrame:
    """Sketch-tier frequent items via ``approx_top_k``.

    Returns ``(key_col, approx_cnt)`` for the ``top_k`` most frequent
    keys.  ``max_tracked`` is the SpaceSaving capacity: counts are
    exact while distinct keys <= max_tracked, and otherwise
    overestimates by at most the smallest tracked count — every true
    heavy hitter above that floor is still present.

    The aggregation state is one sketch of ``max_tracked`` entries;
    partials merge map-side, so the exchange carries a handful of
    sketch blobs, not per-key rows — at 100TB this is the cheapest
    possible frequent-item scan.
    """
    if top_k < 1 or max_tracked < top_k:
        raise ValueError(f"need 1 <= top_k <= max_tracked, got {top_k}/{max_tracked}")
    sketch = df.selectExpr(
        f"approx_top_k(`{key_col}`, {int(top_k)}, {int(max_tracked)}) AS tk"
    )
    return sketch.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias(key_col), F.col("e.count").alias("approx_cnt")
    )


def windowed_top_keys(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    window: str = "30 minutes",
    top_k: int = 5,
    max_tracked: int = 10_000,
    watermark: str | None = None,
) -> DataFrame:
    """Trending keys per tumbling time window.

    Returns ``(window_start, window_end, rank, key_col, approx_cnt)``.
    The same plan runs batch or streaming: pass ``watermark`` on a
    stream and each window's sketch finalizes on watermark close
    (append emission — one result row set per window, exactly the
    ErrorAggregator emission discipline).  State per window is ONE
    SpaceSaving sketch, so streaming state is O(open windows x
    max_tracked) regardless of event rate.
    """
    if top_k < 1 or max_tracked < top_k:
        raise ValueError(f"need 1 <= top_k <= max_tracked, got {top_k}/{max_tracked}")
    src = df.withWatermark(ts_col, watermark) if watermark else df
    agg = src.groupBy(F.window(ts_col, window).alias("w")).agg(
        F.expr(f"approx_top_k(`{key_col}`, {int(top_k)}, {int(max_tracked)})").alias("tk")
    )
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        F.posexplode("tk").alias("pos", "e"),
    ).select(
        "window_start",
        "window_end",
        (F.col("pos") + 1).alias("rank"),
        F.col("e.item").alias(key_col),
        F.col("e.count").alias("approx_cnt"),
    )


def heavy_hitters_verified(
    df: DataFrame, key_col: str, *, top_k: int, max_tracked: int = 10_000
) -> DataFrame:
    """Two-phase frequent items: sketch first, verify survivors exactly.

    Phase 1 (:func:`approx_heavy_hitters`) collapses the table to one
    sketch row; phase 2 broadcasts the <= top_k candidate keys into a
    semi-join and counts ONLY those keys exactly.  The expensive exact
    count never sees the full key space — the same tier discipline as
    minhash-LSH candidate verification.  Returns ``(key_col, cnt)``
    with exact counts, descending-count-then-key deterministic order
    left to the caller.
    """
    cand = approx_heavy_hitters(df, key_col, top_k=top_k, max_tracked=max_tracked)
    keys = cand.select(key_col)
    return (
        df.join(broadcast(keys), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
