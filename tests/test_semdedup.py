"""Numpy-replica verification for the embedding-space curation ops
(operators/similarity.py: ivf_assign_scored / prototypicality /
semdedup).  These are iterative + per-cluster-greedy, so they carry no
SQL oracle; this file IS their correctness gate: an independent numpy
implementation of Lloyd refinement (same deterministic lowest-id
seeding, same larger-index tie-break as the (score, idx) struct
array_max) must reproduce assignments, survivor sets, and similarity
values exactly."""

import math

import numpy as np
import pytest

SF = "/root/testdata/sf0.01"


def _load(spark):
    from telemetry_streaming_spark.sources.registry import load_table

    df = load_table(spark, SF, "embeddings", parallelize=False).select("vec_id", "embedding")
    pdf = df.toPandas().sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy()
    V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    return df, ids, V


def _cos(a, b):
    # sequential fold, mirroring the JVM aggregate() order
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
    for x in a:
        na += x * x
    for y in b:
        nb += y * y
    return dot / (math.sqrt(na) * math.sqrt(nb))


def _ref_centroids(ids, V, nlist, iters):
    order = np.argsort(ids)
    cents = [V[i].tolist() for i in order[:nlist]]
    for _ in range(iters):
        assign = _ref_assign(V, cents)
        new = []
        for c in range(len(cents)):
            members = V[assign == c]
            new.append(members.mean(axis=0).tolist() if len(members) else cents[c])
        cents = new
    return cents


def _ref_assign(V, cents):
    out = np.empty(len(V), dtype=int)
    for r in range(len(V)):
        best, best_s = 0, -np.inf
        for i, c in enumerate(cents):
            s = _cos(V[r], c)
            if s >= best_s:  # ties -> larger index, like array_max on (s, i)
                best, best_s = i, s
        out[r] = best
    return out


def test_prototypicality_matches_numpy_replica(spark):
    from telemetry_streaming_spark.operators.similarity import prototypicality

    df, ids, V = _load(spark)
    got = {r.vec_id: (r.ivf_cluster, r.centroid_sim) for r in prototypicality(df, nlist=8, iters=2).collect()}

    cents = _ref_centroids(ids, V, nlist=8, iters=2)
    assign = _ref_assign(V, cents)
    assert len(got) == len(ids)
    for row, vid in enumerate(ids):
        cl, sim = got[vid]
        assert cl == assign[row]
        assert sim == pytest.approx(_cos(V[row], cents[cl]), abs=1e-9)


def test_semdedup_matches_greedy_replica(spark):
    from telemetry_streaming_spark.operators.similarity import semdedup

    df, ids, V = _load(spark)
    thr = 0.92
    got = {r.vec_id: r for r in semdedup(df, threshold=thr, nlist=8, iters=2).collect()}

    cents = _ref_centroids(ids, V, nlist=8, iters=2)
    assign = _ref_assign(V, cents)
    n = V / np.linalg.norm(V, axis=1)[:, None]
    for c in set(assign):
        rows = [i for i in range(len(ids)) if assign[i] == c]  # ids sorted asc
        kept = []
        for i in rows:
            r = got[ids[i]]
            assert r.ivf_cluster == c
            if kept:
                ms = max(float(n[j] @ n[i]) for j in kept)
                assert r.max_kept_sim == pytest.approx(ms, abs=1e-9)
                expect_keep = ms <= thr
            else:
                assert r.max_kept_sim is None
                expect_keep = True
            assert r.keep == expect_keep
            if expect_keep:
                kept.append(i)


def test_semdedup_drops_planted_duplicates(spark):
    """Two identical vectors must never both survive."""
    import pyspark.sql.functions as F

    from telemetry_streaming_spark.operators.similarity import semdedup

    df, _, _ = _load(spark)
    clone = df.withColumn("vec_id", F.col("vec_id") + F.lit(1_000_000))
    out = semdedup(df.unionAll(clone), threshold=0.9999, nlist=8, iters=1).collect()
    kept = {r.vec_id for r in out if r.keep}
    # every clone pairs with its original at cos=1 > threshold, so the
    # greedy-by-id scan keeps at most the original of each pair
    assert all(v < 1_000_000 for v in kept)
    assert not any(v + 1_000_000 in kept for v in kept)


def test_semdedup_cluster_cap_raises(spark):
    import telemetry_streaming_spark.operators.similarity as sim

    df, _, _ = _load(spark)
    old = sim.MAX_SEMDEDUP_CLUSTER
    sim.MAX_SEMDEDUP_CLUSTER = 10
    try:
        with pytest.raises(Exception, match="exceeds"):
            sim.semdedup(df, nlist=1, iters=0).collect()
    finally:
        sim.MAX_SEMDEDUP_CLUSTER = old


def test_top_principal_component_matches_eigh(spark):
    """Power iteration over the distributed gram matrix must find the
    same leading eigenpair as numpy.linalg.eigh on the same data
    (|cos| > 0.999, eigenvalue within 1%), including the
    mean-centering step."""
    import numpy as np

    from telemetry_streaming_spark.operators.similarity import top_principal_component

    rng = np.random.RandomState(11)
    # anisotropic cloud: a dominant direction plus noise
    direction = rng.randn(16)
    direction /= np.linalg.norm(direction)
    X = (
        np.outer(rng.randn(300) * 5.0, direction)
        + rng.randn(300, 16) * 0.3
        + rng.randn(16) * 2.0  # nonzero mean: centering matters
    ).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<float>",
    )
    lam, v = top_principal_component(df, iters=100)
    # numpy reference on the QUANTIZED data (the operator scales to e4
    # ints by contract)
    Xq = np.floor(X.astype("float64") * 10000 + 0.5) / 10000
    C = np.cov(Xq, rowvar=False, bias=True)
    w, V = np.linalg.eigh(C)
    ref_lam, ref_v = w[-1], V[:, -1]
    assert abs(abs(np.dot(v, ref_v)) - 1.0) < 1e-3
    assert abs(lam - ref_lam) / ref_lam < 0.01
    # deterministic sign: largest-|loading| entry is positive
    assert v[int(np.argmax(np.abs(v)))] > 0


def test_centroid_scores_loop_form_is_bit_identical_to_unrolled(spark):
    """r8: centroid_scores collapsed k unrolled per-centroid fold trees
    into ONE transform loop over flat 2-D literals (the pq.py plan-cost
    lesson).  The loop must be BIT-identical to the unrolled form —
    same dot fold operand order, same norms, same labels — across real
    embeddings, including the NULL score of a zero-norm vector."""
    import struct as st

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from telemetry_streaming_spark.operators.similarity import (
        _centroid_lit,
        _py_norm,
        centroid_scores,
        dot,
        ivf_centroids,
        norm,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    zero = spark.createDataFrame(
        [Row(vec_id=10_000_000, embedding=[0.0] * 64)]
    )
    emb = emb.select("vec_id", "embedding").unionByName(zero)
    cents = ivf_centroids(emb, nlist=8, iters=1)
    labels = [3, 7, 11, 20, 21, 30, 40, 55][: len(cents)]

    def unrolled(vec_col, centroids, labs):
        v = F.col(vec_col)
        nrm = norm(v)
        return F.array(
            *[
                F.struct(
                    F.try_divide(
                        dot(v, _centroid_lit(c)), nrm * F.lit(_py_norm(c))
                    ).alias("s"),
                    F.lit(lab).alias("i"),
                )
                for lab, c in zip(labs, centroids)
            ]
        )

    old = {
        r.vec_id: r.a
        for r in emb.select(
            "vec_id", unrolled("embedding", cents, labels).alias("a")
        ).collect()
    }
    new = {
        r.vec_id: r.a
        for r in emb.select(
            "vec_id", centroid_scores("embedding", cents, labels).alias("a")
        ).collect()
    }
    assert old.keys() == new.keys()
    for vid in old:
        for so, sn in zip(old[vid], new[vid]):
            assert so.i == sn.i
            bo = None if so.s is None else st.pack("d", so.s)
            bn = None if sn.s is None else st.pack("d", sn.s)
            assert bo == bn, (vid, so, sn)
    # the zero-norm row scored NULL against every centroid (try_divide)
    assert all(s.s is None for s in new[10_000_000])
