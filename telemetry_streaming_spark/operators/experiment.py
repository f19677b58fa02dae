"""Experiment / lifecycle inference: contingency chi-square and the
Kaplan-Meier risk table.

The reference's experiment surface ships enrollment counts to external
dashboards (``ExperimentsEnrollmentsToTestTube.scala:21-44``,
``ExperimentEnrollmentsAggregator.scala``) and leaves the actual
inference to them; these operators close that loop in-engine with the
two classical tests an experimentation pipeline needs, computed so the
results hash bit-exactly against a SQL oracle:

- :func:`chi_square_cells`: the per-cell chi-squared decomposition of
  an r x c contingency table.  Everything derives from ONE grouped
  count over the raw rows (a single shuffle on the tiny (row, col) key
  space); marginals come from window sums over that aggregate-sized
  cell frame, never a second scan.  The cell statistic is emitted two
  ways: ``delta = n*N - R*C`` as an exact BIGINT (the signed
  cross-multiplied deviation, zero iff the cell is exactly at
  independence), and ``chi2_micro`` = floor(1e6 * delta^2 / (N*R*C))
  where the square/divide are single IEEE double ops on exactly-
  representable integers — deterministic across engines (the module
  doc of plans/queries.py spells out the recipe).  Exactness contract:
  ``n*N`` must fit int64, i.e. total rows below ~3e9; past that,
  pre-aggregate per shard or lift delta to DECIMAL(38,0).

- :func:`kaplan_meier`: the (t, d_t, c_t, n_at_risk_t) risk table from
  per-subject (duration, observed) rows — deaths, censorings, and the
  reverse-cumulative at-risk count.  These integer columns are the
  sufficient statistics of the KM estimator; the survival *product* is
  intentionally not emitted (a float product is order-dependent and a
  log-sum needs libm, neither hash-portable — consumers fold the
  product over the sorted table, which is trivial at its size).  The
  grouped frame is one shuffle on ``duration``; the at-risk cumsum
  runs on the aggregate-sized distinct-duration table (bounded by the
  observation horizon in days — document/assert that bound at call
  sites), so its single-partition window is a non-issue at any corpus
  scale.

At 100TB: both operators reduce the raw table to an aggregate-sized
frame in their first exchange (cells bounded by |rows| x |cols|,
durations bounded by the horizon); nothing downstream ever sees a
per-subject row again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chi_square_cells(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Per-cell chi-squared decomposition of the ``row_col`` x
    ``col_col`` contingency table.

    Returns one row per observed cell: ``(row, col, n_obs, delta,
    chi2_micro)`` with ``delta = n_obs*N - R*C`` (exact BIGINT; the
    cell is over-represented iff positive) and ``chi2_micro`` the
    cell's chi-squared contribution scaled by 1e6 and floored.  The
    total statistic is ``sum(chi2_micro)/1e6`` up to the per-cell
    floor — consumers wanting the exact total should sum
    ``delta^2/(N*R*C)`` themselves from the exact columns.
    """
    cells = (
        df.groupBy(F.col(row_col).alias("row_key"), F.col(col_col).alias("col_key"))
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    # Marginals via window sums over the aggregate-sized cell frame.
    # The unpartitioned window is a single task over <= |rows|*|cols|
    # rows — bounded by the categorical domains, not the corpus.
    w_row = Window.partitionBy("row_key")
    w_col = Window.partitionBy("col_key")
    w_all = Window.partitionBy()
    enriched = cells.select(
        "row_key",
        "col_key",
        "n_obs",
        F.sum("n_obs").over(w_row).alias("row_total"),
        F.sum("n_obs").over(w_col).alias("col_total"),
        F.sum("n_obs").over(w_all).alias("grand_total"),
    )
    delta = F.col("n_obs") * F.col("grand_total") - F.col("row_total") * F.col("col_total")
    den = F.col("grand_total") * F.col("row_total") * F.col("col_total")
    delta_d = delta.cast("double")
    chi2_micro = F.floor(delta_d * delta_d / den.cast("double") * F.lit(1e6)).cast("long")
    return enriched.select(
        "row_key",
        "col_key",
        "n_obs",
        delta.cast("long").alias("delta"),
        chi2_micro.alias("chi2_micro"),
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str = "duration",
    observed_col: str = "observed",
) -> DataFrame:
    """Kaplan-Meier risk table from per-subject ``(duration,
    observed)`` rows (observed=1: event/death at ``duration``;
    observed=0: right-censored at ``duration``).

    Returns one row per distinct duration ``t``: ``(t, d, c,
    n_at_risk)`` — events at t, censorings at t, and subjects with
    duration >= t.  All-integer: the at-risk count is the reverse
    cumulative of (d+c) over durations sorted descending, computed on
    the aggregate-sized distinct-duration frame.
    """
    obs = F.col(observed_col).cast("long")
    grouped = (
        df.groupBy(F.col(duration_col).cast("long").alias("t"))
        .agg(
            F.sum(obs).alias("d"),
            F.sum(F.lit(1) - obs).alias("c"),
        )
    )
    w = Window.orderBy(F.desc("t")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return grouped.select(
        "t",
        "d",
        "c",
        F.sum(F.col("d") + F.col("c")).over(w).alias("n_at_risk"),
    )


def rank_corr_stats(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Integer sufficient statistics of the Spearman rank correlation
    per group: ``(group..., n, sum_rx, sum_ry, sum_rx2, sum_ry2,
    sum_rxy)`` over ``RANK()`` ranks (min-rank tie semantics —
    deterministic and identical across engines, unlike average-rank
    which is fractional).

    Spearman-with-ties is Pearson over the ranks, so these BIGINT
    moment sums determine rho exactly; the final float division is the
    consumer's one-liner — the same transcendental-free contract as
    ``chi_square_cells`` / ``logistic_sufficient_stats``.

    Plan: one exchange on the group key, two in-partition sorts (one
    per rank order — Catalyst reuses the exchange), one hash aggregate
    to a group-sized frame.  NULL x or y rows are excluded up front
    (both ranks must exist).  Overflow contract: ``sum(rank^2) <=
    n^3/3`` must fit int64 — n per group below ~2e6; shard or lift to
    DECIMAL(38,0) past that.
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    src = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    wx = Window.partitionBy(*group_cols).orderBy(x_col)
    wy = Window.partitionBy(*group_cols).orderBy(y_col)
    ranked = src.select(
        *group_cols,
        F.rank().over(wx).cast("long").alias("__rx"),
        F.rank().over(wy).cast("long").alias("__ry"),
    )
    return ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__rx").cast("long").alias("sum_rx"),
        F.sum("__ry").cast("long").alias("sum_ry"),
        F.sum(F.col("__rx") * F.col("__rx")).cast("long").alias("sum_rx2"),
        F.sum(F.col("__ry") * F.col("__ry")).cast("long").alias("sum_ry2"),
        F.sum(F.col("__rx") * F.col("__ry")).cast("long").alias("sum_rxy"),
    )
