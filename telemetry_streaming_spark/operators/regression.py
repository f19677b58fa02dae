"""Grouped closed-form linear regression — trend/drift detection.

Per-group OLS of y against x from the five classic sums (n, Σx, Σy,
Σxy, Σx²): one shuffle, map-side combine, no iteration.  The trick
that makes it *hash-portable against DuckDB* is doing every sum in
scaled integers:

- y is scaled to cents; x is centered per group (``x' = x - min(x)``)
  BEFORE squaring, so Σx'² stays far under 2^63 even with epoch-second
  axes (raw epoch seconds squared overflow a signed long after ~2000
  rows).
- slope numerator/denominator (``nΣx'y - Σx'Σy``, ``nΣx'² - (Σx')²``)
  are then exact integers; the final slope/intercept/r are one IEEE
  division (and one correctly-rounded sqrt) on exact operands —
  bit-identical in any engine.

Centering needs the per-group min first — a cheap count-style
aggregate broadcast back — so the full plan is two narrow aggregates
on the group key.  Centering changes the intercept's reference point
(reported at ``x = min(x)``), not the slope or correlation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_linreg(
    df: DataFrame,
    group_cols: list[str],
    x_long: str,
    y_long: str,
) -> DataFrame:
    """Per-group OLS over pre-scaled integer columns.

    ``x_long`` / ``y_long`` must already be long-valued (epoch
    seconds, cents).  Returns n, the exact integer moment sums, and
    ``slope`` (y units per x unit), ``intercept_at_xmin``, ``r``
    (Pearson correlation; NULL when either variance is zero).
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    mins = df.groupBy(*group_cols).agg(F.min(x_long).alias("__x0"))
    centered = df.join(F.broadcast(mins), group_cols).select(
        *group_cols,
        (F.col(x_long) - F.col("__x0")).alias("__x"),
        F.col(y_long).alias("__y"),
        F.col("__x0"),
    )
    s = centered.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("__x0").alias("x_min"),
        F.sum("__x").alias("sx"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("syy"),
    )
    num = s.n * s.sxy - s.sx * s.sy
    den_x = s.n * s.sxx - s.sx * s.sx
    den_y = s.n * s.syy - s.sy * s.sy
    slope = F.when(den_x != 0, num.cast("double") / den_x.cast("double"))
    intercept = (s.sy.cast("double") - slope * s.sx.cast("double")) / s.n.cast("double")
    r = F.when(
        (den_x != 0) & (den_y != 0),
        num.cast("double") / F.sqrt(den_x.cast("double") * den_y.cast("double")),
    )
    return s.select(
        *group_cols,
        "n",
        "x_min",
        "sx",
        "sy",
        "sxy",
        "sxx",
        "syy",
        slope.alias("slope"),
        intercept.alias("intercept_at_xmin"),
        r.alias("r"),
    )
