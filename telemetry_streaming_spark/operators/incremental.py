"""Incremental aggregate maintenance: merge partial aggregates
instead of recomputing from raw data.

The production shape for every continuously-loaded aggregate table:
batch N's aggregate merges into the running state with one
keys-shuffle of *aggregate-sized* frames — the raw history is never
re-scanned.  This is exactly the algebra Spark's partial+final
aggregation uses inside one query, lifted to cross-batch/cross-day
granularity (a ``foreachBatch`` upsert, a daily rollup catch-up, a
backfill merged into a live table).

Only **re-aggregable** statistics merge losslessly: counts and sums
add, mins/maxes fold, and anything derivable from them (avg =
sum/count) is computed at read time.  Medians/percentiles/distincts do
NOT merge exactly — use their sketch forms (approx_percentile, HLL),
which are mergeable by construction.  :func:`merge_aggregates`
enforces the distinction by only accepting the four lossless kinds.

Exactness is oracle-provable: aggregating each half of a table and
merging equals aggregating the whole — the ``incremental_merge``
registry query hash-checks precisely that against DuckDB.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_aggregates(
    parts: list[DataFrame],
    keys: list[str],
    *,
    count_cols: list[str] = (),
    sum_cols: list[str] = (),
    min_cols: list[str] = (),
    max_cols: list[str] = (),
) -> DataFrame:
    """Merge partial-aggregate frames sharing the ``keys +
    count/sum/min/max`` schema into one consolidated aggregate.

    One union (no shuffle) + one hash-aggregate on the keys; input
    frames are aggregate-sized, so the merge cost is independent of
    how much raw data produced them.
    """
    if not parts:
        raise ValueError("parts must be non-empty")
    cols = list(keys) + list(count_cols) + list(sum_cols) + list(min_cols) + list(max_cols)
    if not (len(cols) > len(keys)):
        raise ValueError("need at least one aggregate column to merge")
    for p in parts:
        missing = [c for c in cols if c not in p.columns]
        if missing:
            raise ValueError(f"part missing columns {missing}")
    unioned = reduce(lambda a, b: a.unionByName(b), [p.select(*cols) for p in parts])
    aggs = (
        [F.sum(c).cast("long").alias(c) for c in count_cols]
        + [F.sum(c).alias(c) for c in sum_cols]
        + [F.min(c).alias(c) for c in min_cols]
        + [F.max(c).alias(c) for c in max_cols]
    )
    return unioned.groupBy(*keys).agg(*aggs)


def distinct_sketch(col: str):
    """HLL sketch aggregate for a column — the mergeable form of
    COUNT(DISTINCT).  Store the binary in the state table; merge with
    :func:`merge_sketch_aggregates`; read with
    ``hll_sketch_estimate``."""
    return F.expr(f"hll_sketch_agg(`{col}`)")


def topk_sketch(col: str, max_tracked: int = 10_000):
    """Accumulating top-k sketch (``approx_top_k_accumulate``) — the
    mergeable form of frequent-items state."""
    return F.expr(f"approx_top_k_accumulate(`{col}`, {int(max_tracked)})")


def merge_sketch_aggregates(
    parts: list[DataFrame],
    keys: list[str],
    *,
    hll_cols: list[str] = (),
    topk_cols: list[str] = (),
) -> DataFrame:
    """Merge sketch-typed partial aggregates (HLL distinct, top-k).

    HLL union is register-wise max and the top-k combine merges the
    SpaceSaving summaries, so ``merge(sketch(A), sketch(B)) ==
    sketch(A union B)`` holds exactly (identical binaries, not just
    close estimates) — the sketch algebra that makes distinct counts
    and frequent items incrementally maintainable at all.  Estimates
    are read out with ``hll_sketch_estimate`` /
    ``approx_top_k_estimate``.
    """
    if not parts:
        raise ValueError("parts must be non-empty")
    cols = list(keys) + list(hll_cols) + list(topk_cols)
    if not (len(cols) > len(keys)):
        raise ValueError("need at least one sketch column to merge")
    for p in parts:
        missing = [c for c in cols if c not in p.columns]
        if missing:
            raise ValueError(f"part missing columns {missing}")
    unioned = reduce(lambda a, b: a.unionByName(b), [p.select(*cols) for p in parts])
    aggs = [F.expr(f"hll_union_agg(`{c}`)").alias(c) for c in hll_cols] + [
        F.expr(f"approx_top_k_combine(`{c}`)").alias(c) for c in topk_cols
    ]
    return unioned.groupBy(*keys).agg(*aggs)


def segment_overlap(
    df: DataFrame, key_col: str, segment_col: str
) -> DataFrame:
    """Pairwise segment overlap via theta sketches: for every segment
    pair (a < b), the distinct-key sizes, intersection, and a-only
    counts.

    COUNT(DISTINCT) intersections across N segments are not
    expressible as one aggregation — exactly the query theta sketches
    exist for: one sketch per segment (a single scan + one narrow
    shuffle), then set algebra on the |segments|^2/2 sketch pairs,
    which is driver-trivial because segments are few by definition.
    Below the sketch's nominal-entries threshold (4096 keys) the
    estimates are exact — the oracle hash-checks that regime; beyond
    it they degrade to ~2% relative error while the plan cost stays
    one scan.
    """
    sk = df.groupBy(segment_col).agg(
        F.expr(f"theta_sketch_agg(`{key_col}`)").alias("__sk")
    )
    a = sk.select(F.col(segment_col).alias("seg_a"), F.col("__sk").alias("__ska"))
    b = sk.select(F.col(segment_col).alias("seg_b"), F.col("__sk").alias("__skb"))
    pairs = a.join(F.broadcast(b), F.col("seg_a") < F.col("seg_b"))
    est = lambda e: F.expr(e).cast("long")  # noqa: E731
    return pairs.select(
        "seg_a",
        "seg_b",
        est("theta_sketch_estimate(__ska)").alias("n_a"),
        est("theta_sketch_estimate(__skb)").alias("n_b"),
        est("theta_sketch_estimate(theta_intersection(__ska, __skb))").alias("n_common"),
        est("theta_sketch_estimate(theta_difference(__ska, __skb))").alias("n_only_a"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Diff two table snapshots: one row per changed key with
    ``change_type`` in ``insert`` / ``delete`` / ``update``.

    The reconciliation primitive behind CDC backfills, migration
    validation, and "what did yesterday's rerun change" audits.  One
    full-outer join on the keys; rows are compared via an md5 over the
    concatenated compare columns (computed map-side, so the join only
    ever carries keys + one hash per side).  Unchanged keys are
    filtered out before anything leaves the join stage.

    Each compare column is hashed SEPARATELY to a fixed-width token
    (``v`` + 32-hex md5, or a distinct null token) before the outer
    concat+md5 — separator/sentinel characters appearing inside values
    therefore cannot alias across column boundaries, and a literal NUL
    string stays distinct from SQL NULL.
    """
    if not keys or not compare_cols:
        raise ValueError("keys and compare_cols must be non-empty")

    def hashed(df: DataFrame, alias: str) -> DataFrame:
        tokens = [
            F.coalesce(
                F.concat(F.lit("v"), F.md5(F.col(c).cast("string"))),
                F.lit("n" + "0" * 32),
            )
            for c in compare_cols
        ]
        return df.select(
            *keys, F.md5(F.concat(*tokens)).alias(alias), F.lit(1).alias(f"_{alias}_present")
        )

    o = hashed(old, "old_hash")
    n = hashed(new, "new_hash")
    joined = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("_old_hash_present").isNull(), F.lit("insert"))
        .when(F.col("_new_hash_present").isNull(), F.lit("delete"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("update"))
    )
    return (
        joined.withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select(*keys, "change_type")
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Data-quality profile: one row per column with non-null / null /
    exact-distinct counts.

    The ANALYZE-style table profile every ingest gate runs.  All
    columns profile in ONE aggregation pass (count + count-distinct
    per column in the same agg — Spark plans a single scan with an
    expand for the distincts), then the wide row unpivots to the long
    (column, stat) shape with ``stack`` — no per-column jobs, no
    second scan.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    aggs = []
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            F.count_distinct(c).alias(f"__nd_{c}"),
        ]
    wide = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __n - __nn_{c}, __nd_{c}" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (column, n_nonnull, n_null, n_distinct)"
    )
