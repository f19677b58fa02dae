"""Outlier handling: per-group winsorization (percentile clamping).

Training pipelines clip heavy-tailed numeric features before
aggregation/normalization; the grouped form ("clamp each metric within
its cohort") is the one that needs an engine, because the bounds are
data-dependent per group.

Shape: one exact-percentile aggregation per group (the same
sort-within-group plan as ``value_quantiles`` — one shuffle of the
group's values), broadcast the |groups|-row bounds table back, clamp
map-side.  The clamp itself is ``least(greatest(x, lo), hi)`` on the
same IEEE doubles in any engine, so results stay bit-portable given
bit-portable bounds — and Spark's ``percentile`` matches DuckDB's
``quantile_cont`` interpolation exactly (proven by the
``value_quantiles`` hash gate).

At 100TB: the bounds aggregate is the only wide operation and it
carries (group, value) pairs once; if exact per-group sorts are too
hot, swap ``exact=False`` for ``approx_percentile`` — same plan shape
as every other sketch tier, mergeable partials, no per-group sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    lo: float = 0.05,
    hi: float = 0.95,
    exact: bool = True,
    accuracy: int = 10_000,
    out_col: str | None = None,
) -> DataFrame:
    """Clamp ``value_col`` to its per-group [lo, hi] percentile band.

    Returns ``df`` plus ``out_col`` (default ``{value_col}_w``) and the
    per-group ``lo_bound`` / ``hi_bound`` columns.  ``exact=True`` uses
    the sort-based percentile (bit-portable); ``exact=False`` the
    mergeable sketch (``approx_percentile``) for the 100TB path.
    """
    if not 0.0 <= lo <= hi <= 1.0:
        raise ValueError(f"need 0 <= lo <= hi <= 1, got {lo}/{hi}")
    out_col = out_col or f"{value_col}_w"
    v = F.col(value_col)
    if exact:
        lo_agg = F.percentile(value_col, F.lit(lo))
        hi_agg = F.percentile(value_col, F.lit(hi))
    else:
        lo_agg = F.expr(f"approx_percentile(`{value_col}`, {lo}, {accuracy})")
        hi_agg = F.expr(f"approx_percentile(`{value_col}`, {hi}, {accuracy})")
    bounds = df.groupBy(*group_cols).agg(
        lo_agg.alias("lo_bound"), hi_agg.alias("hi_bound")
    )
    return df.join(F.broadcast(bounds), group_cols).withColumn(
        out_col, F.least(F.greatest(v, F.col("lo_bound")), F.col("hi_bound"))
    )
