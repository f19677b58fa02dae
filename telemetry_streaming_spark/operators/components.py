"""Connected components over near-duplicate pair edges.

The dedup tiers (operators/dedup.py) emit PAIRS; a curation run needs
CLUSTERS — transitive closure of the pair graph — so it can keep one
representative per duplicate group (A~B and B~C must collapse A,B,C
together even when A~C was never scored).

Algorithm: alternating large-star / small-star (Kiveris et al. 2014,
"Connected Components in MapReduce and Beyond"), the standard
shuffle-based formulation:

- **large-star**: for every node u, connect every strictly-larger
  neighbor to u's minimum neighborhood label;
- **small-star**: connect every not-larger neighbor to the minimum.

Each round is two narrow (node, label) aggregations + self-unions; the
edge list only ever carries 16-byte pairs, and the rounds converge in
O(log n) iterations on any graph (near-dup graphs — small dense
cliques — converge in 2-3).  Convergence is detected by an exact
per-round label-sum/count check (two numbers to the driver, not the
labels).  No vertex-centric framework needed: plain DataFrame ops,
AQE-sized shuffles, nothing resident on the driver.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from telemetry_streaming_spark.operators.checkpointing import cut_lineage


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large- or small-star round over the undirected edge list.
    ``edges`` has columns (u, v); returns the new edge list."""
    # neighborhoods including self, in both directions
    nbrs = edges.select("u", "v").union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    nbrs = nbrs.union(nbrs.select("u", F.col("u").alias("v"))).distinct()
    m = nbrs.groupBy("u").agg(F.min("v").alias("mn"))
    joined = nbrs.join(m, "u")
    if large:
        kept = joined.where(F.col("v") > F.col("u"))
    else:
        kept = joined.where(F.col("v") <= F.col("u"))
    return (
        kept.select(F.col("v").alias("u"), F.col("mn").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    id1: str = "id1",
    id2: str = "id2",
    max_iterations: int = 20,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Resolve pair edges to components.

    Returns (id, component) where ``component`` is the minimum id in
    the component — a deterministic representative, so downstream
    "keep the keeper" joins are reproducible.  Isolated ids never
    appear in ``pairs`` and so never appear here (they are their own
    keepers by definition).

    Each iteration materializes the shrinking edge list via
    ``cut_lineage`` — at 100TB this truncates the lineage (20 chained
    shuffles would otherwise replan the whole history each round) and
    lets the driver read the two-number convergence probe cheaply.
    ``checkpoint_mode="reliable"`` writes each round to the
    SparkContext checkpoint dir so a multi-round run survives executor
    loss (see operators/checkpointing.py for the contract).
    """
    edges = (
        pairs.select(F.col(id1).cast("long").alias("u"), F.col(id2).cast("long").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    prev_probe = None
    for _ in range(max_iterations):
        edges = _star_round(edges, large=True)
        edges = cut_lineage(_star_round(edges, large=False), checkpoint_mode)
        probe = edges.agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.col("u") + F.col("v")).alias("s")
        ).first()
        cur = (probe.n, probe.s)
        if cur == prev_probe:
            break
        prev_probe = cur
    # post-convergence every edge is (node -> component min)
    return edges.select(F.col("u").alias("id"), F.col("v").alias("component")).distinct()


def incremental_components(
    labels: DataFrame,
    new_pairs: DataFrame,
    id1: str = "id1",
    id2: str = "id2",
    max_iterations: int = 20,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Update a persisted component labeling with NEW pair edges —
    the nightly flow that completes the incremental dedup story
    (band-index admission decides which documents enter; this decides
    which CLUSTERS they join or bridge) without re-resolving history.

    ``labels``: the stored ``(id, component)`` output of
    :func:`connected_components` over all prior pairs.  That labeling
    is itself a star-shaped edge list (every member points directly at
    its component's min-id root), so unioning it with the new pairs
    yields a graph that is already converged everywhere except where
    new edges attach or bridge — large-star/small-star re-converges in
    rounds bounded by the longest NEW bridge chain, not by the
    historical graph's diameter.  Cost per night:
    O(|labels| + |new pairs|) edge rows through the usual two
    shuffles/round, with the round count ~1-2 in practice.

    The result is exactly ``connected_components(old pairs ∪ new
    pairs)`` — set-identical to a from-scratch resolve (the registry
    query's oracle states the from-scratch semantics and the driver
    hash-checks the equality).
    """
    star = labels.select(
        F.col("id").alias(id1), F.col("component").alias(id2)
    )
    return connected_components(
        star.unionByName(new_pairs.select(id1, id2)),
        id1,
        id2,
        max_iterations=max_iterations,
        checkpoint_mode=checkpoint_mode,
    )


def dedup_clusters(
    pairs: DataFrame,
    id1: str = "id1",
    id2: str = "id2",
) -> DataFrame:
    """Duplicate clusters from near-dup pairs: (component, ids,
    n_members, keeper_id).  ``keeper_id`` == component == min id —
    the same keeper rule as the exact tier (`dedup_exact`), so mixing
    tiers in one pipeline keeps consistent representatives."""
    cc = connected_components(pairs, id1, id2)
    members = cc.union(
        cc.select(F.col("component").alias("id"), F.col("component"))
    ).distinct()
    return members.groupBy("component").agg(
        F.sort_array(F.collect_list("id")).alias("ids"),
        F.count(F.lit(1)).alias("n_members"),
    ).select(
        "component",
        "ids",
        "n_members",
        F.col("component").alias("keeper_id"),
    )


def quality_representatives(
    cc: DataFrame,
    quality: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
) -> DataFrame:
    """Quality-based keeper per duplicate cluster — the end step of
    near-dup dedup when "keep the lowest id" (dedup_clusters) is the
    wrong policy: keep the BEST copy (longest / highest-scored), drop
    the rest.

    ``cc`` is connected_components output (id, component — the
    representative row itself is not emitted and is folded back in
    here); ``quality`` maps id -> quality_col.  Returns (component,
    keep_id, keep_quality, csize).  Ties break to the LOWEST id, so
    the keeper is deterministic.

    Plan: the member list is cluster-membership-sized (not corpus-
    sized); one shuffle joins quality on id, one narrow aggregation
    folds to per-cluster argmax via max_by over the (quality, -id)
    struct — no window sort, no collect."""
    members = cc.select(F.col("id"), "component").union(
        cc.select(F.col("component").alias("id"), F.col("component"))
    ).distinct()
    q = quality.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(quality_col).cast("long").alias("__q"),
    )
    joined = members.join(q, "id")
    rank = F.struct(F.col("__q"), (-F.col("id")).alias("__negid"))
    return joined.groupBy("component").agg(
        F.max_by("id", rank).alias("keep_id"),
        F.max(rank).getField("__q").alias("keep_quality"),
        F.count(F.lit(1)).alias("csize"),
    )
