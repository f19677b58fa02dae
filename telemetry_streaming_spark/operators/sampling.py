"""Deterministic sampling and splitting for training-data pipelines.

A curation run needs *reproducible* subsets: the same document must
land in the same train/eval split on every run, on every engine, at
any parallelism — so membership must be a pure function of a stable
key, never of partition layout or an RNG stream.  (Spark's
``df.sample`` / ``randomSplit`` are seeded per-partition: repartition
the input and the membership changes — unusable for split contracts.)

Everything here keys membership off ``md5(key)``: engine-portable
(identical in Spark, DuckDB, Python), uniform in the low bits, and
independent of physical layout.  All operators are stateless column
expressions — no shuffle beyond what the caller's plan already has,
trivially parallel at 100TB.

The bucket is the integer value of md5 hex digits 25-32 (the last
eight → 32 bits, taken mod ``buckets``).  Using the *trailing* digits
keeps this hash family independent of the fingerprint-prefix bucketing
in functions/text.py (leading digits), so sampling never correlates
with fingerprint-bucket partitioning.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

HASH_BUCKETS = 10_000


def hash_bucket(key: Column, buckets: int = HASH_BUCKETS) -> Column:
    """Deterministic uniform bucket in [0, buckets) from a stable key.

    conv(hex, 16, 10) of 8 hex chars fits in 32 bits — exact in the
    signed-64 arithmetic both engines use."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 25, 8), 16, 10).cast("long")
        % F.lit(buckets)
    )


def deterministic_sample(
    df: DataFrame, key_col: str, rate: float, buckets: int = HASH_BUCKETS
) -> DataFrame:
    """Keep ~``rate`` of rows, membership a pure function of the key.

    Exact contract: keep iff hash_bucket(key) < rate * buckets.  The
    same key is kept or dropped identically on every run/engine —
    unlike ``df.sample``, whose membership depends on partition
    layout."""
    return df.where(hash_bucket(F.col(key_col), buckets) < F.lit(int(rate * buckets)))


def train_eval_split(
    df: DataFrame,
    key_col: str,
    eval_rate: float = 0.05,
    buckets: int = HASH_BUCKETS,
    split_col: str = "split",
) -> DataFrame:
    """Tag each row 'eval' (lowest ``eval_rate`` hash buckets) or
    'train'.  Holdout membership is stable under corpus growth: a
    document's split never changes when other documents are added or
    removed — the property that keeps eval sets uncontaminated across
    pipeline re-runs."""
    is_eval = hash_bucket(F.col(key_col), buckets) < F.lit(int(eval_rate * buckets))
    return df.withColumn(split_col, F.when(is_eval, F.lit("eval")).otherwise(F.lit("train")))


def group_split(
    df: DataFrame,
    group_col: str,
    splits: list[tuple[str, int]],
    split_col: str = "split",
) -> DataFrame:
    """Leakage-safe multi-way split: every row of a GROUP lands in the
    same split, decided by ``md5(group)`` alone — the group-aware
    train/val/test assignment web-corpus pipelines need (splitting by
    doc hash leaks near-identical pages of one site across splits;
    splitting by registrable domain cannot).

    ``splits`` is an ordered list of (name, weight_e4) with weights
    summing to 10000 (e.g. ``[("train", 9000), ("val", 500),
    ("test", 500)]``).  Assignment compares the group's first four md5
    hex chars — a fixed-width lowercase hex string, so lexicographic
    order IS numeric order — against precomputed hex boundaries
    (``floor(65536 * cum_weight / 10000)`` formatted %04x).  Pure
    string expressions, no UDF, and the identical CASE is one line of
    portable SQL for any oracle.  Stable under corpus growth: a
    group's split never changes when other groups appear.

    A NULL group has no hash; every comparison is NULL and the CASE
    falls through to the LAST split — documented, not accidental (the
    last split is the one an auditor already inspects hardest).
    """
    _check_splits(splits)
    b = F.substring(F.md5(F.col(group_col).cast("string")), 1, 4)
    expr = F.lit(splits[-1][0])
    cum = 0
    arms = []
    for name, w in splits[:-1]:
        cum += w
        arms.append((name, format(65536 * cum // 10000, "04x")))
    for name, bound in reversed(arms):
        expr = F.when(b < F.lit(bound), F.lit(name)).otherwise(expr)
    # reversed WHEN-chain nesting evaluates boundaries ascending:
    # b < bound_1 -> split_1, elif b < bound_2 -> split_2, ...
    return df.withColumn(split_col, expr)


def _check_splits(splits: list[tuple[str, int]]) -> None:
    """Shared by the Column and SQL builders: a malformed weight list
    must fail loudly in BOTH, or the 'one boundary arithmetic' claim
    holds only for callers who remember to build the engine side
    first (r10 review)."""
    if sum(w for _, w in splits) != 10000:
        raise ValueError("split weights must sum to 10000 (e4)")
    if any(w <= 0 for _, w in splits):
        raise ValueError("split weights must be positive")


def group_split_sql_case(group_expr: str, splits: list[tuple[str, int]]) -> str:
    """The ANSI-SQL twin of :func:`group_split`'s assignment — shared
    by the registry oracles so the boundary arithmetic can never fork
    between the engine and the check."""
    _check_splits(splits)
    cum = 0
    arms = []
    for name, w in splits[:-1]:
        cum += w
        arms.append(
            f"WHEN substring(md5({group_expr}), 1, 4) < '"
            + format(65536 * cum // 10000, "04x")
            + f"' THEN '{name}'"
        )
    return "CASE " + " ".join(arms) + f" ELSE '{splits[-1][0]}' END"


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Per-stratum deterministic sampling — the "mixture weights" pass
    that up/down-samples sources into a target training mix.

    ``rates`` maps stratum value -> keep fraction; strata not listed
    use ``default_rate``.  Same hash-threshold contract as
    ``deterministic_sample``, so per-source membership is reproducible
    and composable with the split above (a document sampled into the
    mix keeps its train/eval assignment)."""
    threshold = F.lit(int(default_rate * buckets))
    for value, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(strata_col) == value, F.lit(int(rate * buckets))
        ).otherwise(threshold)
    return df.where(hash_bucket(F.col(key_col), buckets) < threshold)


def mixture_plan(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    size_col: str | None = None,
    default_weight: float = 0.0,
) -> DataFrame:
    """Per-stratum sampling-rate plan toward TARGET mixture weights —
    the planning half of mixture sampling (``stratified_sample`` is
    the execution half; feed it ``rate`` from here).

    For each stratum: available size (rows, or ``size_col`` sums —
    tokens for an LLM mix), its target share of the total budget, and
    ``rate`` = min(1, target/available) — the downsampling fraction
    that realizes the mix, capped at keep-everything (a stratum short
    of its target is NOT upsampled; the shortfall is visible as
    planned < target, which is the signal to re-weight or crawl more).

    One aggregate + a 1-row total cross-joined back (broadcast) —
    aggregate-sized work regardless of corpus scale.  All outputs are
    exact integers plus single IEEE divisions, so the plan is
    engine-portable.

    A WEIGHTED stratum absent from the corpus still gets a row
    (available=0, planned=0 < target) — without the outer join on the
    weight keys, an entirely-missing source would vanish from the plan
    and its share of the budget would go silently unassigned."""
    sz = F.sum(size_col) if size_col else F.count(F.lit(1))
    per = df.groupBy(strata_col).agg(sz.cast("long").alias("available"))
    if weights:
        key_type = per.schema[strata_col].dataType.simpleString()
        keys = df.sparkSession.createDataFrame(
            [(k,) for k in sorted(weights)], f"{strata_col} {key_type}"
        )
        per = (
            keys.join(per, strata_col, "full_outer")
            .withColumn("available", F.coalesce(F.col("available"), F.lit(0)))
        )
    total = per.agg(F.sum("available").alias("__total"))
    w = F.lit(float(default_weight))
    for k, v in sorted(weights.items()):
        w = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(w)
    target = w * F.col("__total").cast("double")
    rate = F.when(
        F.col("available") > 0,
        F.least(F.lit(1.0), target / F.col("available").cast("double")),
    ).otherwise(F.lit(0.0))
    return per.crossJoin(F.broadcast(total)).select(
        strata_col,
        "available",
        w.alias("weight"),
        F.floor(target).cast("long").alias("target_size"),
        rate.alias("rate"),
        F.floor(rate * F.col("available").cast("double")).cast("long").alias("planned_size"),
    )


def weighted_sample(
    df: DataFrame,
    key: Column | str,
    weight: Column | str,
    k: int,
    *,
    salt: str = "",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (top-k by
    exponential priority), optionally per group.

    The A-ES scheme: each row draws priority ``-ln(u) / w`` with ``u``
    uniform from the stable hash of (key, salt); the k SMALLEST
    priorities are the sample.  Inclusion probability rises with
    weight exactly as weighted sampling without replacement requires,
    yet membership is a pure function of (key, salt, weight) — same
    sample on every run, engine, and partitioning.  Vary ``salt`` for
    independent replicates (bootstrap / cross-validation folds).

    This is the "sample documents proportional to quality" mixture
    step of a curation pipeline.  One shuffle when grouped (the
    rank window), a TakeOrdered when global.  Priorities are doubles,
    so membership is NOT DuckDB-hash-portable (ln); determinism and
    weight-monotonicity are pinned in tests instead.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    kc = F.col(key) if isinstance(key, str) else key
    wc = F.col(weight) if isinstance(weight, str) else weight
    # A-ES is defined for strictly positive weights: w <= 0 would be a
    # DIVIDE_BY_ZERO under ANSI mode (w == 0) or a priority that sorts
    # first and silently guarantees selection (w < 0).  Zero/negative/
    # null weight == zero inclusion probability, so filter, not crash.
    df = df.where(wc.isNotNull() & (wc > 0))
    # u in (0, 1]: 32 trailing md5 bits of the salted key, +1 to avoid ln(0)
    u = (
        F.conv(F.substring(F.md5(F.concat(kc.cast("string"), F.lit(salt))), 25, 8), 16, 10)
        .cast("double")
        + F.lit(1.0)
    ) / F.lit(float(1 << 32))
    pr = -F.log(u) / wc
    out = df.withColumn("__priority", pr)
    if group_cols:
        from pyspark.sql import Window

        w = Window.partitionBy(*group_cols).orderBy(F.col("__priority").asc(), kc.cast("string").asc())
        return out.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") <= k).drop(
            "__rn", "__priority"
        )
    return out.orderBy(F.col("__priority").asc(), kc.cast("string").asc()).limit(k).drop("__priority")


def per_group_cap(
    df: DataFrame,
    group_col: str,
    key_col: str,
    cap: int,
    keep_rank: bool = False,
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen deterministically by
    key hash (the C4-style per-host document cap: bound any single
    domain's contribution to the corpus without order bias).

    Membership is a pure function of (group, key): rows rank by
    ``md5(key)`` with the key itself as tie-break, so re-runs, engine
    changes, and corpus growth OUTSIDE a group never change which of
    that group's rows survive — adding rows to a group can only evict
    hash-later rows.

    Scale shape: a naive ``row_number() OVER (PARTITION BY group)``
    sorts every group in ONE task — a hot domain becomes a straggler.
    Instead rows are split into 256 sub-buckets by their md5 hash's
    first byte (a PREFIX of the sort key, so ordering by (bucket, md5,
    key) equals ordering by (md5, key)); the window ranks within
    (group, bucket) — tasks are ~1/256 of a group — and a
    groups-x-256-row offset table (cumulative counts of earlier
    buckets, aggregate-sized at any corpus scale) is broadcast back to
    reconstruct the exact global-within-group rank.

    NULLs: a NULL group is a group of its own (null-safe join), and a
    NULL key ranks after every hashed key (bucket 256, nulls-last
    ordering — matching a SQL ``ORDER BY md5(key)`` with NULLS LAST);
    multiple NULL-key rows in one group have no hash to order by, so
    which of THEM survive is arbitrary (still capped) — give rows real
    keys if that matters."""
    from pyspark.sql import Window

    key_s = F.col(key_col).cast("string")
    bucketed = df.withColumn("__h", F.md5(key_s)).withColumn(
        "__b",
        F.coalesce(F.conv(F.substring("__h", 1, 2), 16, 10).cast("int"), F.lit(256)),
    )
    counts = bucketed.groupBy(group_col, "__b").agg(F.count(F.lit(1)).alias("__n"))
    cum = Window.partitionBy(group_col).orderBy("__b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        F.col(group_col).alias("__g"),
        F.col("__b").alias("__ob"),
        F.coalesce(F.sum("__n").over(cum), F.lit(0)).alias("__off"),
    ).where(F.col("__off") < cap)  # buckets past the cap can never contribute
    within = Window.partitionBy(group_col, "__b").orderBy(
        F.col("__h").asc_nulls_last(), F.col(key_col).asc_nulls_last()
    )
    out = (
        bucketed.withColumn("__wrk", F.row_number().over(within))
        # inner join: rows in offset-pruned buckets are dropped here
        # without ever consulting their rank
        .join(
            F.broadcast(offsets),
            F.col(group_col).eqNullSafe(F.col("__g")) & (F.col("__b") == F.col("__ob")),
        )
        .withColumn("__rk", (F.col("__off") + F.col("__wrk")).cast("int"))
        .where(F.col("__rk") <= cap)
        .drop("__h", "__b", "__wrk", "__g", "__ob", "__off")
    )
    return out if keep_rank else out.drop("__rk")


def per_group_budget(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weight_col: str,
    budget: int,
    keep_cum: bool = False,
) -> DataFrame:
    """Keep rows per group, in deterministic ``md5(key)`` order, until
    the group's cumulative ``weight_col`` reaches ``budget`` — the
    token-budget variant of :func:`per_group_cap` (cap the CONTRIBUTION
    of a source in tokens, not documents; a source of ten huge docs
    and one of ten thousand tweets get the same token share).

    A row survives iff it STARTS strictly under the budget
    (``cum - weight < budget``), so the boundary-crossing row is kept
    and every group with any rows contributes at least one (budget
    must be positive).  Membership is a pure function of
    (group, key, weight) — with ``per_group_cap``'s caveat one step
    stronger: rows sharing a KEY within a group tie on the entire sort
    key, so when a budget boundary falls between tied rows, WHICH of
    them survives is arbitrary (and here ties also shift every later
    row's cumulative start).  Give rows unique keys if that matters.

    Scale shape mirrors ``per_group_cap``: 256 md5-prefix sub-buckets,
    a within-(group, bucket) running SUM window, and an
    aggregate-sized broadcast offset table carrying each bucket's
    EXCLUSIVE cumulative weight — no hot source ever sorts or sums in
    one task, and buckets whose offset already exceeds the budget are
    pruned before their rows consult the window.  NULL keys rank last
    (bucket 256); NULL weights count as 0."""
    from pyspark.sql import Window

    key_s = F.col(key_col).cast("string")
    w = F.coalesce(F.col(weight_col).cast("long"), F.lit(0))
    bucketed = (
        df.withColumn("__h", F.md5(key_s))
        .withColumn(
            "__b",
            F.coalesce(
                F.conv(F.substring("__h", 1, 2), 16, 10).cast("int"), F.lit(256)
            ),
        )
        .withColumn("__w", w)
    )
    sums = bucketed.groupBy(group_col, "__b").agg(F.sum("__w").alias("__n"))
    cum = Window.partitionBy(group_col).orderBy("__b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = sums.select(
        F.col(group_col).alias("__g"),
        F.col("__b").alias("__ob"),
        F.coalesce(F.sum("__n").over(cum), F.lit(0)).alias("__off"),
    ).where(F.col("__off") < budget)  # bucket starts past budget: prune
    within = Window.partitionBy(group_col, "__b").orderBy(
        F.col("__h").asc_nulls_last(), F.col(key_col).asc_nulls_last()
    ).rowsBetween(Window.unboundedPreceding, 0)
    out = (
        bucketed.withColumn("__run", F.sum("__w").over(within))
        .join(
            F.broadcast(offsets),
            F.col(group_col).eqNullSafe(F.col("__g")) & (F.col("__b") == F.col("__ob")),
        )
        .withColumn("__cum", F.col("__off") + F.col("__run"))
        .where(F.col("__cum") - F.col("__w") < budget)
        .drop("__h", "__b", "__w", "__run", "__g", "__ob", "__off")
    )
    return out if keep_cum else out.drop("__cum")


def apply_mixture(
    df: DataFrame,
    plan: DataFrame,
    key_col: str,
    strata_col: str,
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Execute a :func:`mixture_plan`: collect the (aggregate-sized)
    plan's per-stratum rates and run :func:`stratified_sample` with
    them — the planning/execution loop in one call.

    Rates come from the plan verbatim, so re-running with a stored
    plan reproduces the mix exactly (hash-threshold membership, no
    randomness); strata absent from the plan are dropped (rate 0),
    which is the plan's explicit contract — every stratum the mix
    wants has a row."""
    rates = {
        r[strata_col]: float(r["rate"])
        for r in plan.select(strata_col, "rate").collect()
        # a NULL stratum (unsourced rows) cannot key a rate; it falls
        # to default_rate 0 like any unplanned stratum
        if r[strata_col] is not None
    }
    return stratified_sample(
        df, key_col, strata_col, rates, default_rate=0.0, buckets=buckets
    )
