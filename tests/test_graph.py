"""Replica pins for operators/graph.py — the fixed-point PageRank must
be BIT-exact against a pure-python integer replica (that exactness is
what makes the iterative oracle possible), and the co-occurrence edge
builder must cap hub groups before the self-join."""

import random

import pytest
from pyspark.sql import Row

from telemetry_streaming_spark.operators.graph import (
    cooccurrence_edges,
    pagerank_fixed_point,
)


def _replica(edges, nodes, iterations, num=17, den=20, scale=1_000_000):
    outw = {}
    for s, d, w in edges:
        outw[s] = outw.get(s, 0) + w
    base = (scale * (den - num)) // den
    r = {n: scale for n in nodes}
    for _ in range(iterations):
        nxt = {n: base for n in nodes}
        for s, d, w in edges:
            nxt[d] += (r[s] * num * w) // (den * outw[s])
        r = nxt
    return r


def test_pagerank_matches_integer_replica_bit_exactly(spark):
    rng = random.Random(17)
    nodes = list(range(30))
    edge_set = {}
    for _ in range(150):
        s, d = rng.sample(nodes, 2)
        edge_set[(s, d)] = rng.randint(1, 5)
    edges = [(s, d, w) for (s, d), w in edge_set.items()]
    df = spark.createDataFrame([Row(src=s, dst=d, w=w) for s, d, w in edges])
    ndf = spark.createDataFrame([Row(node=n) for n in nodes])
    got = {
        r["node"]: r["rank_micros"]
        for r in pagerank_fixed_point(df, ndf, iterations=5).collect()
    }
    assert got == _replica(edges, nodes, 5)


def test_pagerank_isolated_node_holds_base_mass(spark):
    df = spark.createDataFrame([Row(src=1, dst=2, w=1)])
    ndf = spark.createDataFrame([Row(node=n) for n in (1, 2, 3)])
    got = {
        r["node"]: r["rank_micros"]
        for r in pagerank_fixed_point(df, ndf, iterations=3).collect()
    }
    # 1 and 3 have no in-edges: base term only; 2 receives 1's mass
    assert got[1] == got[3] == 150_000
    assert got[2] > 150_000


def test_pagerank_releases_its_caches_and_checkpoints_lineage(spark):
    """A long-lived session must not accumulate cached frames across
    calls (r5 verdict): after pagerank_fixed_point returns, no RDD may
    remain persisted, and the returned frame must still be usable
    (localCheckpoint materializes it before the unpersist).  Also pin
    that a checkpoint_every smaller than iterations — which cuts
    lineage mid-loop — leaves the bit-exact result unchanged."""
    rng = random.Random(19)
    nodes = list(range(20))
    edge_set = {}
    for _ in range(80):
        s, d = rng.sample(nodes, 2)
        edge_set[(s, d)] = rng.randint(1, 5)
    edges = [(s, d, w) for (s, d), w in edge_set.items()]
    df = spark.createDataFrame([Row(src=s, dst=d, w=w) for s, d, w in edges])
    ndf = spark.createDataFrame([Row(node=n) for n in nodes])
    before = set(dict(spark.sparkContext._jsc.getPersistentRDDs()).keys())
    out = pagerank_fixed_point(df, ndf, iterations=6, checkpoint_every=2)
    got = {r["node"]: r["rank_micros"] for r in out.collect()}
    assert got == _replica(edges, nodes, 6)
    # the ONLY storage left behind is the localCheckpoint backing the
    # returned frame itself (one RDD); edge/node caches and mid-loop
    # checkpoint blocks are all released before returning
    after = dict(spark.sparkContext._jsc.getPersistentRDDs())
    leaked = {k: v for k, v in after.items() if k not in before}
    assert len(leaked) <= 1, f"leaked persisted RDDs: {leaked}"
    from telemetry_streaming_spark.operators.graph import (
        _release_local_checkpoint,
    )

    _release_local_checkpoint(out)  # simulate the caller dropping it
    end = set(dict(spark.sparkContext._jsc.getPersistentRDDs()).keys())
    assert end <= before, f"leaked persisted RDDs: {end - before}"


def test_pagerank_validates_params(spark):
    df = spark.createDataFrame([Row(src=1, dst=2, w=1)])
    with pytest.raises(ValueError):
        pagerank_fixed_point(df, iterations=0)
    with pytest.raises(ValueError):
        pagerank_fixed_point(df, damping_num=20, damping_den=20)


def test_cooccurrence_edges_symmetric_and_capped(spark):
    rows = (
        # group a: items 1,2 -> one symmetric pair
        [Row(g="a", item=1), Row(g="a", item=2), Row(g="a", item=2)]
        # group b: 5 items, above the cap of 4 -> dropped entirely
        + [Row(g="b", item=i) for i in range(10, 15)]
        # group c: items 1,2 again -> pair weight accumulates to 2
        + [Row(g="c", item=1), Row(g="c", item=2)]
    )
    df = spark.createDataFrame(rows)
    got = {
        (r["src"], r["dst"]): r["w"]
        for r in cooccurrence_edges(df, "g", "item", max_items_per_group=4).collect()
    }
    assert got == {(1, 2): 2, (2, 1): 2}


def test_triangle_counts_hand_graph(spark):
    """K4 plus a pendant: every K4 vertex closes C(3,2)=3 triangles,
    the pendant closes none; duplicate/reversed/self-loop edges must
    not change counts."""
    from telemetry_streaming_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = k4 + [(3, 4)]               # pendant
    edges += [(b, a) for a, b in k4]    # reversed duplicates
    edges += [(1, 1), (0, 1), (0, 1)]   # self-loop + repeats
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_counts_matches_naive_on_random_graph(spark):
    """Degree-oriented schedule == naive triple enumeration on a
    random graph (orientation independence of the counts)."""
    import itertools
    import random

    from telemetry_streaming_spark.operators.graph import triangle_counts

    rng = random.Random(7)
    n = 40
    edges = [(a, b) for a in range(n) for b in range(a + 1, n) if rng.random() < 0.2]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}

    eset = set(edges)
    want: dict[int, int] = {}
    for a, b, c in itertools.combinations(range(n), 3):
        if (a, b) in eset and (b, c) in eset and (a, c) in eset:
            for v in (a, b, c):
                want[v] = want.get(v, 0) + 1
    assert got == want


def test_clustering_coefficients_hand_graph(spark):
    """K4 + pendant: inside the clique every node has coeff 1.0
    (1e6 micro-units); node 3 additionally neighbors the pendant
    (degree 4, still 3 triangles -> 2*1e6*3 div 12 = 500000); the
    pendant has degree 1 -> 0 by contract."""
    from telemetry_streaming_spark.operators.graph import clustering_coefficients

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    df = spark.createDataFrame(k4 + [(3, 4)], "src long, dst long")
    got = {
        r["node"]: (r["degree"], r["n_triangles"], r["coeff_e6"])
        for r in clustering_coefficients(df).collect()
    }
    assert got == {
        0: (3, 3, 1_000_000),
        1: (3, 3, 1_000_000),
        2: (3, 3, 1_000_000),
        3: (4, 3, 500_000),
        4: (1, 0, 0),
    }


def test_edge_link_scores_hand_verified(spark):
    """r8: common-neighbor / Jaccard link scores on a hand-checkable
    graph (square 1-2-3-4 with diagonal 1-3, pendant 5, plus a
    reversed duplicate edge that must canonicalize away): cn = number
    of triangles through the edge, jaccard_e6 = floor(1e6 * cn /
    (deg_u + deg_v - 2 - cn)), pendant edges score 0."""
    from pyspark.sql import Row

    from telemetry_streaming_spark.operators.graph import edge_link_scores

    edges = spark.createDataFrame(
        [Row(src=a, dst=b)
         for a, b in [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (5, 1), (2, 1)]]
    )
    got = {
        (r.u, r.v): (r.cn, r.deg_u, r.deg_v, r.jaccard_e6)
        for r in edge_link_scores(edges).collect()
    }
    expect = {
        (1, 2): (1, 4, 2, 333333),
        (1, 3): (2, 4, 3, 666666),
        (1, 4): (1, 4, 2, 333333),
        (1, 5): (0, 4, 1, 0),
        (2, 3): (1, 2, 3, 500000),
        (3, 4): (1, 3, 2, 500000),
    }
    assert got == expect


def test_edge_link_scores_empty_and_triangle_free(spark):
    from pyspark.sql import Row

    from telemetry_streaming_spark.operators.graph import edge_link_scores

    # a path graph has edges but no triangles: all cn = 0
    path = spark.createDataFrame(
        [Row(src=i, dst=i + 1) for i in range(1, 5)]
    )
    rows = edge_link_scores(path).collect()
    assert len(rows) == 4
    assert all(r.cn == 0 and r.jaccard_e6 == 0 for r in rows)


def test_kcore_peel_rounds_and_convergence(spark):
    """r8: fixed-round k-core peeling on a hand graph — K4 with a
    3-node tail.  rounds=1 strips only the outermost layer (the
    degree-1 tail end); rounds=3 cascades the whole tail away and
    leaves exactly the K4 at residual degree 3; extra rounds past
    convergence are no-ops."""
    from pyspark.sql import Row

    from telemetry_streaming_spark.operators.graph import kcore_peel

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    tail = [(4, 5), (5, 6), (6, 7)]
    edges = spark.createDataFrame([Row(src=a, dst=b) for a, b in k4 + tail])

    one = {(r.node, r.core_degree) for r in kcore_peel(edges, k=2, rounds=1).collect()}
    assert one == {(1, 3), (2, 3), (3, 3), (4, 4), (5, 2), (6, 1)}

    for rounds in (3, 5):
        got = {
            (r.node, r.core_degree)
            for r in kcore_peel(edges, k=2, rounds=rounds).collect()
        }
        assert got == {(1, 3), (2, 3), (3, 3), (4, 3)}, (rounds, got)

    # k above the max degree: everything peels, empty result
    assert kcore_peel(edges, k=5, rounds=2).count() == 0

    import pytest

    with pytest.raises(ValueError):
        kcore_peel(edges, k=0)
    with pytest.raises(ValueError):
        kcore_peel(edges, k=2, rounds=0)


def test_edge_ra_scores_hand_verified(spark):
    """late r8: resource-allocation link scores on the same square +
    diagonal + pendant graph as the Jaccard test.  For edge (1,3) the
    common neighbors are 2 and 4 (deg 2 each): ra = 2 * floor(1e9/2);
    for (1,2) / (1,4) the single common neighbor is node 3 (deg 3);
    for (2,3) / (3,4) it is node 1 (deg 4); the pendant edge scores
    0."""
    from pyspark.sql import Row

    from telemetry_streaming_spark.operators.graph import edge_ra_scores

    edges = spark.createDataFrame(
        [Row(src=a, dst=b)
         for a, b in [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (5, 1), (2, 1)]]
    )
    got = {(r.u, r.v): (r.cn, r.ra_e9) for r in edge_ra_scores(edges).collect()}
    expect = {
        (1, 2): (1, 333333333),
        (1, 3): (2, 1000000000),
        (1, 4): (1, 333333333),
        (1, 5): (0, 0),
        (2, 3): (1, 250000000),
        (3, 4): (1, 250000000),
    }
    assert got == expect


def test_edge_ra_scores_triangle_free(spark):
    from pyspark.sql import Row

    from telemetry_streaming_spark.operators.graph import edge_ra_scores

    path = spark.createDataFrame([Row(src=i, dst=i + 1) for i in range(1, 5)])
    rows = edge_ra_scores(path).collect()
    assert len(rows) == 4
    assert all(r.cn == 0 and r.ra_e9 == 0 for r in rows)


def test_degree_assortativity_star_and_regular(spark):
    """late r8: a star K1,3 is perfectly disassortative (r = -1:
    every edge joins the deg-3 hub to a deg-1 leaf); a K4 is
    degree-regular, so the stub variance is 0 and r is NULL."""
    from pyspark.sql import Row

    from telemetry_streaming_spark.operators.graph import degree_assortativity

    star = spark.createDataFrame(
        [Row(src=0, dst=i) for i in (1, 2, 3)]
    )
    r = degree_assortativity(star).collect()[0]
    assert (r.n_edges, r.sum_deg, r.sum_prod2, r.sum_sq) == (3, 12, 18, 30)
    # (2*3*18 - 144) / (2*3*30 - 144) = -36/36, computed in doubles
    # (the BIGINT num/den form overflowed at the 64x replication
    # smoke: N*Sxy exceeds int64 on graphs that are merely large)
    assert r.assortativity == -1.0

    k4 = spark.createDataFrame(
        [Row(src=a, dst=b) for a in range(4) for b in range(a + 1, 4)]
    )
    r = degree_assortativity(k4).collect()[0]
    assert r.assortativity is None


def test_edge_scores_match_naive_on_random_graph(spark):
    """late r8: the shared wedge schedule's per-EDGE outputs — common
    neighbors, Jaccard, resource allocation — equal naive adjacency-set
    computation on a random graph (the node-grain triangle test's edge
    analogue, covering the explode-to-three-edges canonicalization and
    the apex attribution)."""
    import random

    from telemetry_streaming_spark.operators.graph import (
        edge_link_scores,
        edge_ra_scores,
    )

    rng = random.Random(11)
    n = 40
    edges = [(a, b) for a in range(n) for b in range(a + 1, n) if rng.random() < 0.15]
    df = spark.createDataFrame(edges, "src long, dst long")

    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    want_link = {}
    want_ra = {}
    for a, b in edges:
        cn = adj[a] & adj[b]
        du, dv = len(adj[a]), len(adj[b])
        union = du + dv - 2 - len(cn)
        want_link[(a, b)] = (
            len(cn),
            du,
            dv,
            (1_000_000 * len(cn)) // union if union > 0 else 0,
        )
        want_ra[(a, b)] = (
            len(cn),
            sum(1_000_000_000 // len(adj[w]) for w in cn),
        )

    got_link = {
        (r.u, r.v): (r.cn, r.deg_u, r.deg_v, r.jaccard_e6)
        for r in edge_link_scores(df).collect()
    }
    got_ra = {(r.u, r.v): (r.cn, r.ra_e9) for r in edge_ra_scores(df).collect()}
    assert got_link == want_link
    assert got_ra == want_ra


def test_label_propagation_matches_python_replica(spark):
    """r9: fixed-round synchronous LPA == a plain Python replica of
    the same rounds/tie rule, on two triangles joined by one bridge
    edge — each triangle must converge onto its own minimum label, and
    the replica guards every intermediate round's semantics."""
    from pyspark.sql import Row

    from telemetry_streaming_spark.operators.graph import label_propagation

    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)]
    rounds = 3

    # python replica: synchronous, most-frequent neighbor label,
    # ties -> smallest label
    nbrs = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    lab = {n: n for n in nbrs}
    for _ in range(rounds):
        new = {}
        for n in nbrs:
            counts = {}
            for m in nbrs[n]:
                counts[lab[m]] = counts.get(lab[m], 0) + 1
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[n] = best
        lab = new

    df = spark.createDataFrame([Row(src=u, dst=v) for u, v in edges])
    got = {
        r.node: r.community for r in label_propagation(df, rounds=rounds).collect()
    }
    assert got == lab
    # each triangle is internally uniform, and the two differ (the
    # bridge leaks label 3 into the 10-triangle via the round-1 tie,
    # which is exactly what the replica predicts)
    assert got[1] == got[2] == got[3]
    assert got[10] == got[11] == got[12]
    assert got[1] != got[10]


def test_label_propagation_mode_tie_breaks_to_smallest_label(spark):
    """r10: the per-round count+argmax aggregate pair was collapsed
    into ONE ``mode(lab, deterministic=true)`` aggregate — this pins
    the tie semantics that rewrite depends on: with EQUALLY-frequent
    neighbor labels, the smallest label must win.  Star center 100
    sees leaves {1, 2, 3}, each with frequency 1 -> must adopt 1 (not
    an arbitrary tie pick); each leaf sees only the center -> adopts
    100."""
    from pyspark.sql import Row

    from telemetry_streaming_spark.operators.graph import label_propagation

    edges = [(100, 1), (100, 2), (100, 3)]
    df = spark.createDataFrame([Row(src=u, dst=v) for u, v in edges])
    got = {
        r.node: r.community
        for r in label_propagation(df, rounds=1).collect()
    }
    assert got == {100: 1, 1: 100, 2: 100, 3: 100}


def test_label_propagation_rejects_bad_rounds(spark):
    import pytest

    from telemetry_streaming_spark.operators.graph import label_propagation

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        label_propagation(df, rounds=0)


def test_label_propagation_cut_cadence_is_semantics_free(spark):
    """r10 session 2: the per-round lineage cut became periodic
    (``cut_every``, default 8 — rounds=3 runs as one straight-line
    plan).  The cut cadence is an execution detail: results must be
    identical whether labels are cut every round, mid-chain, or never
    within the committed round count."""
    import random as _random

    from telemetry_streaming_spark.operators.graph import label_propagation

    rng = _random.Random(7)
    edges = list({
        (rng.randint(0, 39), rng.randint(0, 39)) for _ in range(120)
    })
    df = spark.createDataFrame(
        [Row(src=u, dst=v) for u, v in edges if u != v]
    )
    base = {
        r.node: r.community
        for r in label_propagation(df, rounds=3, cut_every=8).collect()
    }
    for cadence in (1, 2):
        got = {
            r.node: r.community
            for r in label_propagation(df, rounds=3, cut_every=cadence).collect()
        }
        assert got == base, f"cut_every={cadence} diverged"


def test_label_propagation_round1_shortcut_equals_explicit_labels(spark):
    """r11: round 1's ``stubs ⋈ identity-labels`` join folds to
    ``stubs.select(n, nbr AS lab)`` (the initial label table IS the
    identity map).  Pin the rewrite against the pre-r11 shape — an
    explicit identity label frame joined for EVERY round — on a seeded
    random graph, for 1, 2 and 3 rounds."""
    import random as _random

    from pyspark.sql import functions as F

    from telemetry_streaming_spark.operators.checkpointing import cut_lineage
    from telemetry_streaming_spark.operators.graph import (
        _canonical_edges,
        label_propagation,
    )

    rng = _random.Random(11)
    edges = list({(rng.randint(0, 59), rng.randint(0, 59)) for _ in range(200)})
    df = spark.createDataFrame([Row(src=u, dst=v) for u, v in edges if u != v])

    def reference(rounds: int) -> dict:
        canon = cut_lineage(_canonical_edges(df, "src", "dst"))
        stubs = canon.select(
            F.col("u").alias("n"), F.col("v").alias("nbr")
        ).unionAll(canon.select(F.col("v").alias("n"), F.col("u").alias("nbr")))
        labels = stubs.select("n").distinct().select(
            F.col("n").alias("node"), F.col("n").cast("long").alias("lab")
        )
        for _ in range(rounds):
            msgs = stubs.join(
                labels.withColumnRenamed("node", "nbr"), "nbr"
            ).select("n", "lab")
            labels = (
                msgs.groupBy("n")
                .agg(F.mode("lab", True).alias("lab"))
                .select(
                    F.col("n").alias("node"),
                    F.col("lab").cast("long").alias("lab"),
                )
            )
        return {r.node: r.lab for r in labels.collect()}

    for rounds in (1, 2, 3):
        got = {
            r.node: r.community
            for r in label_propagation(df, rounds=rounds).collect()
        }
        assert got == reference(rounds), f"rounds={rounds} diverged"


def test_cooccurrence_edge_weights_mirror_exactly(spark):
    """r10 session 2: the capped path aggregates the src < dst pair
    stream once and mirrors AFTER the count — every (a, b, w) must
    have its exact mirror (b, a, w), and w must count the groups
    containing both endpoints."""
    rows = [
        ("g1", "x"), ("g1", "y"), ("g1", "z"),
        ("g2", "x"), ("g2", "y"),
        ("g3", "x"), ("g3", "y"), ("g3", "y"),  # dup item collapses
    ]
    df = spark.createDataFrame([Row(g=g, item=i) for g, i in rows])
    got = {
        (r.src, r.dst): r.w
        for r in cooccurrence_edges(df, "g", "item", max_items_per_group=4).collect()
    }
    assert got[("x", "y")] == 3 and got[("y", "x")] == 3
    assert got[("x", "z")] == 1 and got[("z", "x")] == 1
    assert got[("y", "z")] == 1 and got[("z", "y")] == 1
    assert set(got) == {("x", "y"), ("y", "x"), ("x", "z"),
                        ("z", "x"), ("y", "z"), ("z", "y")}
