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


def windowed_l1_drift(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    *,
    window: str = "1 day",
    reference: dict | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Per-window categorical distribution drift as an exact integer
    fraction: for each tumbling window, the L1 distance between the
    window's ``key_col`` distribution and a reference distribution,
    cross-multiplied so no division ever happens —

        l1_num = sum_k |n_{w,k} * T_ref  -  ref_k * T_w|
        l1_den = T_w * T_ref

    (``l1_num/l1_den`` is the L1 / twice the total-variation distance,
    in [0, 2]).  Keys observed on one side only contribute their full
    mass, so mass is never silently dropped.

    Two reference tiers:

    - ``reference=None`` (batch only): the reference is ``df``'s own
      GLOBAL distribution — the "which window looks unlike the whole"
      monitor.  One grouped count over the raw rows; global and
      per-window totals are window sums over that aggregate-sized cell
      frame (bounded by windows x keys, never the corpus).
    - ``reference={key: count}`` (STREAM-SAFE): the reference rides the
      plan as literals — one conditional sum per reference key plus an
      others bucket, i.e. a single stateful aggregate, so it runs
      under a watermark with append emission exactly like
      :func:`windowed_top_keys`.  Contract: the reference domain is
      bounded (plan-literal discipline — the quality-weights /
      centroid pattern); unseen keys fold into one |n_other * T_ref|
      term.

    Overflow contract: ``count * T_ref`` must fit int64 (~3e9 rows
    each side) — pre-aggregate per shard past that, as with
    chi_square_cells.

    Returns ``(window_start, window_end, n_window, l1_num, l1_den)``.
    """
    from pyspark.sql import Window as W

    src = df.withWatermark(ts_col, watermark) if watermark else df
    win = F.window(ts_col, window).alias("w")
    if reference is None:
        if watermark is not None:
            raise ValueError(
                "self-referenced drift needs the global distribution — "
                "batch only; pass an explicit reference for streams"
            )
        cells = src.groupBy(win, F.col(key_col).alias("k")).agg(
            F.count(F.lit(1)).alias("n")
        )
        m = cells.select(
            "w",
            "k",
            "n",
            F.sum("n").over(W.partitionBy("w")).alias("t_w"),
            F.sum("n").over(W.partitionBy("k")).alias("r_k"),
            F.sum("n").over(W.partitionBy()).alias("t"),
        )
        out = m.groupBy("w").agg(
            F.min("t_w").alias("n_window"),
            (
                F.sum(F.abs(F.col("n") * F.col("t") - F.col("r_k") * F.col("t_w")))
                + (F.min("t") - F.sum("r_k")) * F.min("t_w")
            ).alias("l1_num"),
            (F.min("t_w") * F.min("t")).alias("l1_den"),
        )
    else:
        if not reference or any(v <= 0 for v in reference.values()):
            raise ValueError("reference must be non-empty with positive counts")
        t_ref = int(sum(reference.values()))
        key = F.col(key_col)
        n_of = {
            k: F.sum(F.when(key == F.lit(k), 1).otherwise(0)) for k in reference
        }
        # NULL keys fold into the others bucket: ~isin(...) is NULL for
        # NULL input (lands in neither branch), which would drop their
        # mass from l1_num while still counting them in n_window/l1_den.
        n_other = F.sum(
            F.when(key.isNull() | ~key.isin(*reference.keys()), 1).otherwise(0)
        )
        t_w = F.count(F.lit(1))
        l1 = n_other * F.lit(t_ref)
        for k, ref_k in reference.items():
            l1 = l1 + F.abs(n_of[k] * F.lit(t_ref) - F.lit(int(ref_k)) * t_w)
        out = src.groupBy(win).agg(
            t_w.alias("n_window"),
            l1.alias("l1_num"),
            (t_w * F.lit(t_ref)).alias("l1_den"),
        )
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "n_window",
        F.col("l1_num").cast("long").alias("l1_num"),
        F.col("l1_den").cast("long").alias("l1_den"),
    )
