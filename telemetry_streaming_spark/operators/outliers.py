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


def robust_stats(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    k: float = 3.0,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group median / MAD / robust-outlier counts.

    MAD (median absolute deviation) is the robust scale estimate:
    ``median(|x - median(x)|)``.  Rows with ``|x - med| > k * MAD``
    count as outliers — the classic heavy-tail-safe alternative to
    mean/stddev flagging (a single bot user moves a mean; it cannot
    move a median).

    Two grouped percentile aggregates with a broadcast join between
    them (bounds tables are |groups| rows); every derived double is
    the same IEEE subtraction/abs/multiply in any engine, and Spark's
    ``percentile`` matches DuckDB ``quantile_cont`` bit-exactly, so
    the whole output is hash-portable.  ``exact=False`` swaps both
    medians for ``approx_percentile`` (mergeable sketch, no per-group
    sort) — the 100TB default.
    """
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    v = F.col(value_col)

    def _median(col_expr_sql: str):
        if exact:
            return F.expr(f"percentile({col_expr_sql}, 0.5D)")
        return F.expr(f"approx_percentile({col_expr_sql}, 0.5D, {accuracy})")

    med = df.groupBy(*group_cols).agg(_median(f"`{value_col}`").alias("med"))
    dev = df.join(F.broadcast(med), group_cols).withColumn(
        "__adev", F.abs(v - F.col("med"))
    )
    mad = dev.groupBy(*group_cols).agg(_median("__adev").alias("mad"))
    return (
        dev.join(F.broadcast(mad), group_cols)
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.sum(
                F.when(F.col("__adev") > F.lit(float(k)) * F.col("mad"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
    )
