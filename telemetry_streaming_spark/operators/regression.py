"""Grouped closed-form linear regression + distributed logistic fit.

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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from telemetry_streaming_spark.operators.checkpointing import cut_lineage


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


# ---------------------------------------------------------------------------
# Distributed logistic regression (IRLS / Newton) — the trainer that
# produces the weights functions/text.py:quality_logit applies frozen.
# Mirrors the reference's trainer-in-the-loop design
# (FederatedLearningSearchOptimizerS3Sink.scala:37-77): the cluster
# computes aggregate-sized sufficient statistics, the driver performs a
# bounded solve (here a (d+1)x(d+1) linear system, like the reference's
# RProp step on 22 weights), and the updated weights ride back into the
# next pass as plan literals.
# ---------------------------------------------------------------------------


def logistic_sufficient_stats(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    quant: int = 1000,
) -> DataFrame:
    """Exact-integer sufficient statistics of the Newton step at w = 0.

    At w = 0 every predicted probability is exactly 1/2, so the first
    IRLS iteration needs only ``X^T (y - 1/2)`` and ``X^T X / 4`` —
    both linear in the moment sums emitted here.  Features (assumed in
    [0, 1]) are quantized to ``floor(f * quant)`` BEFORE any product or
    sum, so every aggregate is a BIGINT-exact integer: identical in any
    aggregation order and in any engine, hence hash-checkable against a
    SQL oracle (the same discipline as ``grouped_linreg`` /
    ``kmeans_update``).

    Output: one row with n, sy (= Σy), per-feature s{i} (= Σq_i) and
    s{i}y (= Σ q_i·y), and the upper-triangle second moments
    s{i}_{j} (= Σ q_i·q_j).  Overflow bound: q ≤ quant so q_i·q_j ≤
    quant²; with quant=1000 the signed-long sum holds past 9e12 rows —
    beyond that, shard the sum per partition key and combine in
    DECIMAL(38,0).

    One fused map + one hash aggregate to a single row: the exchange
    carries O(d²) partial cells per partition, never O(n).
    """
    d = len(feature_cols)
    if d == 0:
        raise ValueError("feature_cols must be non-empty")
    q = [
        F.floor(F.col(c) * quant).cast("long").alias(f"q{i + 1}")
        for i, c in enumerate(feature_cols)
    ]
    t = df.select(*q, F.col(label_col).cast("long").alias("y"))
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
    ]
    for i in range(1, d + 1):
        aggs.append(F.sum(F.col(f"q{i}")).alias(f"s{i}"))
        aggs.append(F.sum(F.col(f"q{i}") * F.col("y")).alias(f"s{i}y"))
    # second moments use a delimited alias (s{i}_{j}): the undelimited
    # form collides at d >= 10 ('s111' = (1,11) or (11,1)) and at
    # d >= 12 duplicates the first-moment names ('s12' = Σq12 or Σq1·q2)
    for i in range(1, d + 1):
        for j in range(i, d + 1):
            aggs.append(F.sum(F.col(f"q{i}") * F.col(f"q{j}")).alias(f"s{i}_{j}"))
    return t.agg(*aggs)


def fit_logistic(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    *,
    max_iters: int = 25,
    tol: float = 1e-9,
    ridge: float = 1e-6,
) -> tuple[list[float], int]:
    """Fit ``P(y=1) = sigmoid(w0 + Σ w_i·x_i)`` by IRLS, distributed.

    Per iteration: ONE scan of the cached feature projection computes
    the full gradient and Hessian as a single hash aggregate to one row
    (O(d²) sums, map-side combined — the ``kmeans_update`` exchange
    discipline); the driver solves the (d+1)-dim Newton system (bounded
    work, like the reference's RProp step, A7) and the new weights ride
    into the next pass as plan literals.  A small ridge term keeps the
    Hessian invertible and the weights finite on separable data.

    Saturated probabilities are IEEE-safe: exp(-eta) overflows to +inf
    -> p = 0 exactly, and p·(1-p) = 0, so extreme rows contribute
    nothing rather than NaN.

    Returns (weights [bias first], iterations_run).  Raises on an empty
    input (no rows to fit).
    """
    import numpy as np

    d = len(feature_cols) + 1
    cols = ["__x0"] + [f"__x{i + 1}" for i in range(len(feature_cols))]
    feats = df.select(
        F.lit(1.0).alias("__x0"),
        *[
            F.col(c).cast("double").alias(f"__x{i + 1}")
            for i, c in enumerate(feature_cols)
        ],
        F.col(label_col).cast("double").alias("__y"),
    ).na.drop()
    feats.persist()
    try:
        w = np.zeros(d)
        iters_run = 0
        for it in range(max_iters):
            eta = F.lit(float(w[0])) * F.col(cols[0])
            for j in range(1, d):
                eta = eta + F.lit(float(w[j])) * F.col(cols[j])
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
            s = p * (F.lit(1.0) - p)
            aggs = []
            for j in range(d):
                aggs.append(
                    F.sum(F.col(cols[j]) * (F.col("__y") - p)).alias(f"g{j}")
                )
            for j in range(d):
                for k in range(j, d):
                    aggs.append(
                        F.sum(F.col(cols[j]) * F.col(cols[k]) * s).alias(
                            f"h{j}_{k}"
                        )
                    )
            row = feats.agg(*aggs).collect()[0]  # 1 row, O(d²) cells
            if row[0] is None:
                raise ValueError("fit_logistic: no rows after null-drop")
            g = np.array([float(row[f"g{j}"]) for j in range(d)]) - ridge * w
            H = np.zeros((d, d))
            for j in range(d):
                for k in range(j, d):
                    H[j, k] = H[k, j] = float(row[f"h{j}_{k}"])
            H += ridge * np.eye(d)
            step = np.linalg.solve(H, g)
            w = w + step
            iters_run = it + 1
            if float(np.abs(step).max()) < tol:
                break
        return [float(x) for x in w], iters_run
    finally:
        feats.unpersist()


def fit_quality_logit(
    docs: DataFrame,
    label,
    *,
    text_col: str = "text",
    max_iters: int = 25,
    tol: float = 1e-9,
    ridge: float = 1e-6,
) -> tuple[list[float], int]:
    """Train the quality classifier whose frozen twin is
    ``functions/text.py:quality_logit``: logistic regression of a
    caller-supplied boolean ``label`` Column (the teacher signal — a
    human-labeled sample, an LLM judge, or a held-out heuristic)
    against the same three structure features the scorer applies.  The
    returned weights plug straight into ``quality_logit(text, weights)``
    so scoring stays a map-only codegen'd expression — train here,
    deploy as literals.
    """
    from telemetry_streaming_spark.functions.text import quality_features

    text = F.col(text_col)
    f1, f2, f3 = quality_features(text)
    feats = docs.where(text.isNotNull() & (F.length(text) > 0)).select(
        f1.alias("f_len"),
        f2.alias("f_punct"),
        f3.alias("f_atl"),
        label.cast("int").alias("__label"),
    )
    return fit_logistic(
        feats,
        ["f_len", "f_punct", "f_atl"],
        "__label",
        max_iters=max_iters,
        tol=tol,
        ridge=ridge,
    )


def theilsen_slope(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str],
    *,
    slope_scale: int = 1_000_000,
) -> DataFrame:
    """Per-group Theil-Sen slope estimator (Theil 1950, Sen 1968):
    the median of all pairwise slopes ``(y_j - y_i) / (x_j - x_i)``
    over ``x_i < x_j`` — the robust companion to ``grouped_linreg``
    (up to ~29% contaminated points before breakdown, vs OLS's zero).

    **Exact-portable median over rationals**: pairwise slopes are
    rationals, and engines cannot ORDER BY a rational without a float
    division whose ties are not portably broken.  So each slope is
    first quantized to ``slope_e6 = (slope_scale * dy) div dx`` —
    BIGINT division, truncating toward zero in BOTH engines (Spark
    ``div``, DuckDB ``//``; truncation, not floor, for negative
    slopes — stated contract) — and the reported estimate is the
    LOWER MEDIAN of the quantized slopes under the total order
    ``(slope_e6, x_i, x_j)``: ``row_number = (n_pairs + 1) div 2``.
    Deterministic and hash-exact everywhere; resolution 1e-6 of a
    y-unit per x-unit.

    Both x and y must already be integers (grain/cents — house rule).
    Overflow: |dy| * slope_scale must stay under 2^63, i.e. per-group
    y spreads to ~9.2e12 at e6.

    Complexity is Theil-Sen's own O(n^2) pairs per group — callers
    aggregate to a bounded grain FIRST (e.g. monthly rollups: 84
    points -> 3.5k pairs).  The pair join is a within-group self-join
    (one shuffle on the group key, pairs generated partition-local);
    the median window partitions by group over pair rows only.
    """
    gx = [F.col(c) for c in group_cols]
    # Materialized: the (group, x, y) frame feeds both self-join sides
    # AND the n_points aggregate — without the cut the caller's
    # upstream (often a multi-join rollup) runs three times.  The
    # frame is the bounded grain itself (n points per group).
    df = cut_lineage(df.select(*gx, F.col(x_col), F.col(y_col)))
    a = df.select(*gx, F.col(x_col).alias("__x1"), F.col(y_col).alias("__y1"))
    b = df.select(*gx, F.col(x_col).alias("__x2"), F.col(y_col).alias("__y2"))
    pairs = (
        a.join(b, group_cols)
        .where(F.col("__x1") < F.col("__x2"))
        .select(
            *gx,
            "__x1",
            "__x2",
            F.expr(
                f"(CAST({int(slope_scale)} AS BIGINT) * (__y2 - __y1))"
                " div (__x2 - __x1)"
            ).alias("__slope"),
        )
    )
    w = Window.partitionBy(*group_cols).orderBy("__slope", "__x1", "__x2")
    counted = pairs.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy(*group_cols))
    )
    npoints = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_points")
    )
    med = counted.where(
        F.col("__rn") == F.expr("(__n + 1) div 2")
    ).select(
        *gx,
        F.col("__n").cast("long").alias("n_pairs"),
        F.col("__slope").cast("long").alias("theilsen_slope_e6"),
    )
    # LEFT join: a group with no valid pair (one point, or all x
    # equal) is reported with n_pairs = 0 and a NULL slope, matching
    # grouped_linreg's degenerate-group behavior instead of silently
    # vanishing (r10 review).
    return npoints.join(med, group_cols, "left").select(
        *group_cols,
        "n_points",
        F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long").alias("n_pairs"),
        "theilsen_slope_e6",
    )


def mann_kendall(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Per-group Mann-Kendall trend test (Mann 1945, Kendall 1975) —
    the non-parametric significance companion to ``theilsen_slope``,
    INTEGER-EXACT end to end:

    - ``s_stat`` = sum over pairs x_i < x_j of sign(y_j - y_i);
    - ``var_s_num18`` = 18 * Var(S) = n(n-1)(2n+5) -
      sum_ties t(t-1)(2t+5) — the tie-corrected variance kept as its
      integer numerator (Var(S) itself is the rational /18);
    - ``significant`` — the two-sided alpha=0.05 normal test
      |z| > 1.96 with continuity correction, evaluated WITHOUT sqrt
      or doubles by cross-multiplication:
      ``180000 * (|S| - 1)^2 > 38416 * var_s_num18``
      (both sides of z^2 > 1.96^2 scaled by 18 * 10^4; S = 0 is never
      significant).  The comparison is lifted to DECIMAL(38,0) —
      in BIGINT its left side overflows once |S| > ~7.2e6, i.e.
      n > ~3.8k under strong trend (r10 review; ANSI mode would
      crash, not wrap).  The binding bound is now ``var_s_num18``
      itself: ~2n^3 must fit int64, n <= ~1.6M points per group;
      past that lift the column to DECIMAL(38,0) as well.

    Same plan as theilsen_slope: lineage-cut input, within-group pair
    self-join on the bounded grain, plus one (group, y) tie aggregate;
    output is one row per group.
    """
    gx = [F.col(c) for c in group_cols]
    df = cut_lineage(df.select(*gx, F.col(x_col), F.col(y_col)))
    a = df.select(*gx, F.col(x_col).alias("__x1"), F.col(y_col).alias("__y1"))
    b = df.select(*gx, F.col(x_col).alias("__x2"), F.col(y_col).alias("__y2"))
    s = (
        a.join(b, group_cols)
        .where(F.col("__x1") < F.col("__x2"))
        .groupBy(*group_cols)
        .agg(
            F.sum(F.signum(F.col("__y2") - F.col("__y1")).cast("long")).alias(
                "s_stat"
            )
        )
    )
    n = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n_points"))
    ties = (
        df.groupBy(*group_cols, y_col)
        .agg(F.count(F.lit(1)).alias("__t"))
        .where(F.col("__t") > 1)
        .groupBy(*group_cols)
        .agg(
            F.sum(
                F.col("__t") * (F.col("__t") - 1) * (2 * F.col("__t") + 5)
            ).alias("__tie_sum")
        )
    )
    # LEFT join + COALESCE(S, 0): a pair-less group (n = 1) is a
    # defined row — S = 0, variance numerator 0, never significant —
    # not a silent drop (r10 review).
    out = (
        n.join(s, group_cols, "left")
        .withColumn("s_stat", F.coalesce(F.col("s_stat"), F.lit(0)))
        .join(ties, group_cols, "left")
        .withColumn(
            "var_s_num18",
            (
                F.col("n_points")
                * (F.col("n_points") - 1)
                * (2 * F.col("n_points") + 5)
                - F.coalesce(F.col("__tie_sum"), F.lit(0))
            ).cast("long"),
        )
    )
    return out.select(
        *group_cols,
        "n_points",
        F.col("s_stat").cast("long").alias("s_stat"),
        "var_s_num18",
        _mk_trend_col(),
        _mk_significant_col(),
    )


def _mk_trend_col():
    return F.signum(F.col("s_stat")).cast("long").alias("trend")


def _mk_significant_col():
    """The decimal-lifted |z| > 1.96 verdict over (s_stat,
    var_s_num18) — shared by the plain and seasonal tests."""
    abs_s = F.abs(F.col("s_stat"))
    return (
        F.when(
            (F.col("s_stat") != 0)
            & (
                F.lit(180000).cast("decimal(38,0)")
                * (abs_s - 1).cast("decimal(38,0)")
                * (abs_s - 1).cast("decimal(38,0)")
                > F.lit(38416).cast("decimal(38,0)")
                * F.col("var_s_num18").cast("decimal(38,0)")
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("significant")
    )


def seasonal_mann_kendall(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str],
    season_col: str,
) -> DataFrame:
    """Per-group SEASONAL Mann-Kendall test (Hirsch & Slack 1984):
    the Mann-Kendall statistic computed WITHIN each season (so only
    like-seasons compare — January against January across years) and
    summed per group:

        S' = sum_seasons S_season
        18*Var(S') = sum_seasons var_s_num18_season

    which removes a periodic cycle that would otherwise read as
    noise (deflating S) or as spurious trend.  The verdict is the
    same decimal-lifted continuity-corrected |z| > 1.96 test on the
    summed statistics.  Plan: one ``mann_kendall`` pass at (group,
    season) grain — the pair stage stays bounded by per-season series
    length — plus one narrow aggregate per group.
    """
    per_season = mann_kendall(
        df, x_col, y_col, [*group_cols, season_col]
    )
    return (
        per_season.groupBy(*group_cols)
        .agg(
            F.sum("n_points").cast("long").alias("n_points"),
            F.count(F.lit(1)).cast("long").alias("n_seasons"),
            F.sum("s_stat").cast("long").alias("s_stat"),
            F.sum("var_s_num18").cast("long").alias("var_s_num18"),
        )
        .select(
            *group_cols,
            "n_points",
            "n_seasons",
            "s_stat",
            "var_s_num18",
            _mk_trend_col(),
            _mk_significant_col(),
        )
    )
