"""Connected components / dedup clusters (operators/components.py):
transitive closure correctness on planted graphs, determinism, and
integration with the minhash pair tier."""

import pytest


def _pairs(spark, edges):
    return spark.createDataFrame(edges, ["id1", "id2"])


def _cc_map(df):
    return {r.id: r.component for r in df.collect()}


def test_chain_collapses_transitively(spark):
    from telemetry_streaming_spark.operators.components import connected_components

    # 1-2, 2-3, 3-4: one component although 1~4 never scored
    cc = _cc_map(connected_components(_pairs(spark, [(1, 2), (2, 3), (3, 4)])))
    assert cc == {2: 1, 3: 1, 4: 1}


def test_two_components_and_reversed_edges(spark):
    from telemetry_streaming_spark.operators.components import connected_components

    cc = _cc_map(connected_components(_pairs(spark, [(2, 1), (5, 6), (7, 6), (3, 1)])))
    assert cc == {2: 1, 3: 1, 6: 5, 7: 5}


def test_long_path_converges(spark):
    from telemetry_streaming_spark.operators.components import connected_components

    n = 33
    edges = [(i, i + 1) for i in range(n)]
    cc = _cc_map(connected_components(_pairs(spark, edges)))
    assert cc == {i: 0 for i in range(1, n + 1)}


def test_clusters_shape_and_keeper(spark):
    from telemetry_streaming_spark.operators.components import dedup_clusters

    out = {r.component: r for r in dedup_clusters(
        _pairs(spark, [(10, 11), (11, 12), (20, 21)])
    ).collect()}
    assert out[10].ids == [10, 11, 12] and out[10].n_members == 3
    assert out[10].keeper_id == 10
    assert out[20].ids == [20, 21] and out[20].keeper_id == 20


def test_clusters_from_minhash_pairs(spark):
    """End-to-end: minhash LSH pairs over planted near-dups resolve to
    one cluster with the minimum doc as keeper."""
    from telemetry_streaming_spark.operators.components import dedup_clusters
    from telemetry_streaming_spark.operators.dedup import minhash_lsh_pairs

    base = (
        "the quick brown fox jumps over the lazy dog while the cat sleeps "
        "near the warm fire and the birds sing in the tall green trees"
    )
    rows = [
        (1, base),
        (2, base.replace("lazy dog", "lazy wolf")),
        (3, base.replace("warm fire", "cold fire")),
        (4, "entirely different text about distributed query engines and shuffles today friends"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    clusters = {r.component: r for r in dedup_clusters(pairs).collect()}
    assert 1 in clusters and clusters[1].keeper_id == 1
    assert set(clusters[1].ids) == {1, 2, 3}
    assert 4 not in clusters  # isolated: its own keeper by definition


def test_incremental_components_equals_from_scratch(spark):
    """Nightly update semantics: CC(old) labeling + new pairs must
    resolve set-identically to CC(all pairs) — including new edges
    that BRIDGE two previously separate components and edges
    introducing brand-new ids."""
    import random

    from telemetry_streaming_spark.operators.components import (
        connected_components,
        incremental_components,
    )

    rng = random.Random(13)
    old_pairs = [(i, i + 1) for i in range(0, 20, 2)]          # 10 two-node comps
    new_pairs = [
        (1, 2),          # bridges comp {0,1} and {2,3}
        (5, 100),        # attaches a brand-new id to {4,5}
        (100, 101),      # chains further
        (40, 41),        # entirely new component
    ] + [(rng.randrange(20), rng.randrange(20)) for _ in range(10)]

    def df(pairs):
        return spark.createDataFrame(
            [p for p in pairs if p[0] != p[1]], "id1 long, id2 long"
        )

    labels = connected_components(df(old_pairs))
    got = {
        (r["id"], r["component"])
        for r in incremental_components(labels, df(new_pairs)).collect()
    }
    want = {
        (r["id"], r["component"])
        for r in connected_components(df(old_pairs + new_pairs)).collect()
    }
    assert got == want
