"""Similarity search over embedding columns (array<float>).

Two tiers:

- **Brute force** (`cosine_topk`): broadcast the (small) query set,
  score every (query, candidate) pair with a JVM-side fold, take
  per-query top-k with a rank window.  Exact; at 100TB this is the
  verifier / reranker, not the primary path.

- **LSH-bucketed** (`signed_random_projection_buckets`,
  `cosine_topk_lsh`): random-hyperplane signatures (deterministic,
  seeded from md5 so runs are reproducible) bucket vectors so only
  same-bucket pairs are scored.  Probing all buckets within one sign
  flip trades recall for cost; shuffle volume is O(n x probes), never
  O(n^2).

Dot products are sequential IEEE-double folds over the array (via
``aggregate``), so scores are bit-deterministic — important both for
the DuckDB oracle and for reproducible top-k cuts.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def dot(a: Column, b: Column) -> Column:
    """Sequential double fold of the elementwise product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def _scaled_int(c: Column, scale: int) -> Column:
    """The exact-quantization contract shared by the k-means and
    gram/PCA tiers (and mirrored by plans/queries.py:cents):
    floor(x*scale + 0.5) as BIGINT — one definition, so the engines'
    exactness guarantees cannot desynchronize."""
    return F.floor(c.cast("double") * scale + F.lit(0.5)).cast("long")


def cosine(a: Column, b: Column) -> Column:
    """``try_divide``: a zero-norm vector scores NULL rather than
    raising DIVIDE_BY_ZERO under ANSI mode (one padding row must not
    abort a corpus scan); DuckDB's double division by zero is NULL, so
    the oracle contract is unchanged."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` must have (query_id, query_vec) columns; it is
    broadcast, so the candidate scan is a single map stage + one
    rank-window shuffle partitioned by query_id.

    Norms are computed once per row before the pair expansion (one
    fold per pair instead of three — the pairwise stage dominates at
    any scale); the cosine value is bit-identical because the division
    operands are unchanged.
    """
    cand = df.withColumn("_nrm", norm(F.col(vec_col)))
    q = queries.withColumn("_qnrm", norm(F.col("query_vec")))
    scored = (
        cand.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col(id_col))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.try_divide(dot(F.col("query_vec"), F.col(vec_col)), F.col("_qnrm") * F.col("_nrm")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _hyperplane(seed: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5: each
    coordinate in [-1, 1) derived from the seeded digest (reproducible
    across runs/engines/languages)."""
    coords: list[float] = []
    counter = 0
    while len(coords) < dim:
        digest = hashlib.md5(f"{seed}:{counter}".encode()).hexdigest()
        for off in range(0, 32, 8):
            if len(coords) >= dim:
                break
            coords.append(int(digest[off : off + 8], 16) / 2**31 - 1.0)
        counter += 1
    return coords


def signed_random_projection_buckets(
    df: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Append an SRP-LSH bucket id: bit i = sign(v . plane_i).

    Cosine-similar vectors agree on most signs, so same-bucket
    collision probability rises with cosine similarity (Charikar
    2002 SRP-LSH).  8 planes -> 256 buckets.

    Deliberately stays a JVM-side fold even though higher-order
    functions run interpreted: an Arrow-batched numpy variant (the
    rewrite that won 3x for the exact verifier's 2M-pair scoring)
    measured dead even here — n_planes x dim flops per row is too
    little compute to amortize serializing every row out to Python
    and back, and ``mapInPandas`` would also drag the row's OTHER
    columns through Arrow, which only worsens with row width at
    scale.  Rule of thumb this codifies: vectorize per-PAIR scoring,
    keep per-ROW projections in the JVM.
    """
    bucket = F.lit(0)
    for i in range(n_planes):
        plane = _centroid_lit(_hyperplane(seed * 1000 + i, dim))
        bit = F.when(dot(F.col(vec_col), plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return df.withColumn("srp_bucket", bucket)


MAX_NEARDUP_SIDE_ROWS = 200_000


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (cos >= threshold).

    All-pairs — this is the *verifier* tier (ground truth for recall
    measurement and final re-check of LSH candidates); at corpus scale
    use :func:`embedding_neardup_lsh`.  The verifier contract is that
    the comparison side fits on one node (the prior broadcast-join
    formulation had the identical bound), enforced by
    ``MAX_NEARDUP_SIDE_ROWS``.

    Scoring is Arrow-batched numpy over ``mapInPandas`` — each input
    partition scores its rows against the collected matrix — with
    **dimension-ordered** accumulation: the dot/norm loops add one
    dimension at a time across the whole batch, which is the exact
    left-fold summation order of the JVM ``aggregate`` fold and
    DuckDB's ``list_dot_product``, so the cos doubles (and therefore
    the >= threshold cut) are bit-identical to both.  A BLAS matmul
    (``A @ B.T``) would be ~2x faster but sums in blocked order —
    not reproducible against the oracle, so deliberately not used.
    The interpreted per-pair HOF fold this replaces was measured 5x
    slower at 2k vectors (2M pairs) and scales worse: the numpy path
    is O(dim) vectorized passes per batch, the HOF path O(pairs x
    dim) interpreter steps.
    """
    import numpy as np
    import pandas as pd

    side = df.select(F.col(id_col), F.col(vec_col)).limit(MAX_NEARDUP_SIDE_ROWS + 1).toPandas()
    if len(side) > MAX_NEARDUP_SIDE_ROWS:
        raise ValueError(
            f"exact near-dup verifier side exceeds {MAX_NEARDUP_SIDE_ROWS} rows; "
            "use embedding_neardup_lsh for the at-scale path"
        )
    if side.empty:
        # empty corpus: no pairs, keep the output schema
        return df.sparkSession.createDataFrame([], "id1 long, id2 long, cos double")
    ids_b = side[id_col].to_numpy()
    B = np.stack(side[vec_col].to_numpy()).astype(np.float64)
    nb = np.zeros(len(ids_b))
    for d in range(B.shape[1]):
        nb += B[:, d] * B[:, d]
    nb = np.sqrt(nb)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids_a = pdf[id_col].to_numpy()
            A = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            acc = np.zeros((len(ids_a), len(ids_b)))
            na = np.zeros(len(ids_a))
            for d in range(A.shape[1]):
                acc += A[:, d : d + 1] * B[None, :, d]
                na += A[:, d] * A[:, d]
            cos = acc / (np.sqrt(na)[:, None] * nb[None, :])
            keep = (ids_a[:, None] < ids_b[None, :]) & (cos >= threshold)
            i, j = np.nonzero(keep)
            yield pd.DataFrame(
                {"id1": ids_a[i], "id2": ids_b[j], "cos": cos[i, j]}
            )

    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        score, schema="id1 long, id2 long, cos double"
    )


def embedding_neardup_lsh(
    df: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Scale-path embedding near-dup: SRP same-bucket candidates
    verified with exact cosine.

    One equi-join on the 2^n_planes-way bucket key — shuffle volume is
    O(n), candidate scoring is O(sum of bucket_size^2), bounded by the
    bucket fan-out.  Recall rises with cosine similarity exactly as in
    SRP-LSH theory (Charikar 2002); true near-dups (cos -> 1) collide
    in every band with probability -> 1.
    """
    c = signed_random_projection_buckets(df, n_planes, dim, vec_col, seed).withColumn(
        "_nrm", norm(F.col(vec_col))
    )
    a = c.select(
        F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"),
        F.col("srp_bucket").alias("b1"), F.col("_nrm").alias("n1"),
    )
    b = c.select(
        F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"),
        F.col("srp_bucket").alias("b2"), F.col("_nrm").alias("n2"),
    )
    return (
        a.join(b, (F.col("b1") == F.col("b2")) & (F.col("id1") < F.col("id2")))
        .select(
            "id1",
            "id2",
            F.try_divide(dot(F.col("v1"), F.col("v2")), F.col("n1") * F.col("n2")).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    positives: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10_000,
) -> DataFrame:
    """Hard-negative mining — for each query vector, the top-``k``
    most-similar corpus vectors EXCLUDING its known positives: the
    standard construction of contrastive training data for retrieval /
    embedding models (the "hard" negatives are the near-misses the
    model must learn to separate).

    ``queries``: (query_id, query_vec); ``positives``: (query_id,
    pos_id) label pairs.  Scores are BIGINT dot products of
    e4-quantized vectors (the gram-matrix convention), so ranking —
    including the (score DESC, neighbor_id ASC) tie-break — is
    hash-exact in any engine.

    Plan: both the query frame and the label pairs broadcast (bounded
    by contract: this is the brute-force tier, query batches are
    training-set-sized; compose :func:`cosine_topk_lsh` / IVF pruning
    upstream for web-scale query sets).  The corpus quantizes ONCE per
    row before pair expansion, the positive exclusion is a broadcast
    anti-join on the pair key BEFORE scoring (a positive's dot product
    is never computed), and the per-query top-k rides one
    rank-window exchange that WindowGroupLimit prunes map-side to k
    rows per query per mapper — corpus vectors never shuffle.
    """
    if k < 1:
        raise ValueError("k must be positive")
    # NULL or mis-dimensioned vectors on either side would score a
    # NULL dot product yet still occupy ranks <= k when non-null
    # candidates are scarce (desc sort puts NULLs last, not out),
    # diverging from the oracle's unnest join which drops them — so
    # drop them BEFORE pair expansion (r7 ADVICE; the pq.py
    # convention).  Dimension = the corpus modal size; a handful of
    # corrupted rows must not redefine it, and queries must match it.
    dim_row = (
        corpus.where(F.col(vec_col).isNotNull() & (F.size(vec_col) > 0))
        .groupBy(F.size(vec_col).alias("d"))
        .count()
        .orderBy(F.col("count").desc(), F.col("d").asc())
        .limit(1)
        .collect()
    )
    if not dim_row:
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, score_e8 long, rank int"
        )
    dim = dim_row[0]["d"]
    cand = corpus.where(
        F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(F.col(vec_col), lambda x: _scaled_int(x, scale)).alias("__cq"),
    )
    q = queries.where(
        F.col("query_vec").isNotNull() & (F.size("query_vec") == dim)
    ).select(
        "query_id",
        F.transform(F.col("query_vec"), lambda x: _scaled_int(x, scale)).alias(
            "__qq"
        ),
    )
    pairs = cand.crossJoin(F.broadcast(q)).join(
        F.broadcast(
            positives.select(
                F.col("query_id"), F.col("pos_id").alias("neighbor_id")
            )
        ),
        ["query_id", "neighbor_id"],
        "left_anti",
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.aggregate(
            F.zip_with("__qq", "__cq", lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("score_e8"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_e8").desc(), F.col("neighbor_id").asc()
    )
    # belt-and-braces: a NULL ELEMENT inside a correctly-sized vector
    # still nulls the fold — drop it like the oracle's unnest join does
    return (
        scored.where(F.col("score_e8").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score_e8", "rank")
    )


def rrf_fuse(
    rankings: DataFrame,
    rrf_k: int = 60,
    scale: int = 1_000_000_000,
    list_col: str = "list_id",
    item_col: str = "item_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) of any
    number of ranked retrieval lists — the standard score-free way to
    combine heterogeneous retrievers (dense ANN + BM25, two prompts,
    multiple query expansions): each list contributes
    ``floor(scale / (rrf_k + rank))`` to every item it ranked, and
    items are fused by the SUM.  Using integer floor division instead
    of the float ``1/(k+r)`` makes the fused score — not just the
    input ranks — hash-exact in any engine (the registry contract);
    with ``scale = 1e9`` the quantization never reorders items for
    any realistic list depth (adjacent ranks differ by ≥ scale/(k+r)²
    ≫ 1 for r up to tens of thousands).

    Input: one row per (list, item) with the item's 1-based rank in
    that list.  Output: one row per distinct item — ``n_lists`` (how
    many lists retrieved it), ``best_rank``, ``rrf_e9``.  ONE
    aggregate on the item key; list size × list count rows in, one row
    per item out — at web scale the lists are already top-k-bounded by
    the retrievers, so the exchange is k·|lists| rows, never
    corpus-sized."""
    return rankings.groupBy(F.col(item_col).alias("item_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_lists"),
        F.min(rank_col).cast("int").alias("best_rank"),
        F.sum(F.expr(f"{scale} div ({rrf_k} + {rank_col})"))
        .cast("long")
        .alias("rrf_e9"),
    )


def cosine_topk_lsh(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: score only candidates whose SRP bucket is
    within Hamming distance 1 of the query's bucket (multi-probe).

    The probe expansion happens on the tiny query side — each query
    fans out to n_planes+1 probe buckets before the broadcast — so the
    big side still sees a plain equi-join on bucket.  That is the
    scale-critical property: candidate work is O(n x probes/buckets),
    never a cross join or a range join.
    """
    cand = signed_random_projection_buckets(df, n_planes, dim, vec_col)
    q0 = signed_random_projection_buckets(
        queries.withColumnRenamed("query_vec", vec_col), n_planes, dim, vec_col
    ).select(
        "query_id", F.col(vec_col).alias("query_vec"), F.col("srp_bucket").alias("q_bucket")
    )
    probes = F.array(
        F.col("q_bucket"),
        *[F.col("q_bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
    )
    q = q0.select(
        "query_id", "query_vec", F.explode(probes).alias("q_bucket")
    ).withColumn("_qnrm", norm(F.col("query_vec")))
    cand = cand.withColumn("_nrm", norm(F.col(vec_col)))
    scored = (
        cand.join(F.broadcast(q), cand.srp_bucket == q.q_bucket)
        .where(F.col("query_id") != F.col(id_col))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.try_divide(dot(F.col("query_vec"), F.col(vec_col)), F.col("_qnrm") * F.col("_nrm")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _centroid_lit(vec: list[float]) -> Column:
    # one py4j literal call — element-wise F.lit() costs a JVM round
    # trip per element (dim x nlist of them adds seconds of pure
    # client time to plan construction; values and fold order are
    # identical either way)
    return F.lit([float(x) for x in vec]).cast("array<double>")


def _py_norm(c: list[float]) -> float:
    """sqrt(dot(c, c)) with the same left-fold order, in driver Python
    (IEEE doubles, identical bits to the SQL fold)."""
    import math

    acc = 0.0
    for x in c:
        acc = acc + float(x) * float(x)
    return math.sqrt(acc)


def ivf_centroids(
    df: DataFrame,
    nlist: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic IVF coarse quantizer: seed centroids are the
    ``nlist`` lowest-id vectors, refined with ``iters`` Lloyd steps.

    Each step is one broadcast-assign map + one groupBy(cluster) mean —
    the centroid set (nlist x dim floats) is tiny, so it rides the
    driver<->executor boundary as literals, never a shuffle of the
    corpus.  Empty clusters keep their previous centroid."""
    seeds = (
        df.orderBy(id_col)
        .limit(nlist)
        .select(vec_col)
        .collect()
    )
    centroids = [[float(x) for x in r[0]] for r in seeds]
    if not centroids:
        return []
    for _ in range(iters):
        assign = ivf_assign(df, centroids, vec_col).groupBy("ivf_cluster").agg(
            *[F.avg(F.col(vec_col)[i].cast("double")).alias(f"c{i}") for i in range(len(centroids[0]))]
        )
        by_cluster = {
            r["ivf_cluster"]: [float(r[f"c{i}"]) for i in range(len(centroids[0]))]
            for r in assign.collect()
        }
        centroids = [by_cluster.get(i, c) for i, c in enumerate(centroids)]
    return centroids


def centroid_scores(
    vec_col: str,
    centroids: list[list[float]],
    labels: list[int] | None = None,
) -> Column:
    """(cosine, idx) struct array vs every centroid with the fold work
    HOISTED: the naive ``cosine(col, _centroid_lit(c))`` per centroid
    runs 3 interpreted folds each (dot, self-norm, centroid-norm —
    24 folds for k=8); here the vector's self-norm is ONE fold reused
    across centroids and each centroid's norm is a driver-side
    literal, leaving k+1 folds total (measured ~2.5x faster on the
    assignment map).  Fold order per operand is unchanged, so every
    division operand — and hence the cosine — is bit-identical to the
    naive form and to the SQL oracle.  (A fully codegen'd scalar-chain
    expansion of the dot was measured SLOWER at dim=64: ~1000 scalar
    expression nodes per row blow past the JIT's profitable-method
    size, and the interpreted fold's tight loop wins.)

    ``labels`` replaces the positional index as the emitted cluster id
    (e.g. the seed row's actual key) — it must be sorted ascending so
    the array_max struct tie-break ("larger i wins") keeps the same
    direction either way.  ``try_divide``: a zero-norm vector (padding
    row, failed encoder) scores NULL against every centroid instead of
    aborting the job under ANSI mode — matching DuckDB, whose double
    division by zero is NULL.

    r8: the k per-centroid fold TREES collapsed into ONE transform
    loop probing flat 2-D literals (the pq.py plan-cost lesson —
    unrolled fold expressions cost plan/codegen time at ANY data
    scale, and k-means/IVF rebuild this expression once per Lloyd
    step).  The inner dot fold and the element_at lookups evaluate the
    identical operand sequence, so every score stays bit-identical to
    the unrolled form and the SQL oracle (pinned in
    tests/test_semdedup.py)."""
    if labels is None:
        labels = list(range(len(centroids)))
    if sorted(labels) != list(labels):
        raise ValueError("labels must be ascending to preserve tie-break order")
    k = len(centroids)
    v = F.col(vec_col)
    nrm = norm(v)
    cents = F.lit([[float(x) for x in c] for c in centroids]).cast(
        "array<array<double>>"
    )
    norms = F.lit([_py_norm(c) for c in centroids]).cast("array<double>")
    labs = F.lit([int(x) for x in labels])
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.struct(
            F.try_divide(
                dot(v, F.element_at(cents, i + F.lit(1))),
                nrm * F.element_at(norms, i + F.lit(1)),
            ).alias("s"),
            F.element_at(labs, i + F.lit(1)).alias("i"),
        ),
    )


def ivf_assign(df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding") -> DataFrame:
    """Append ``ivf_cluster`` = argmax cosine(vec, centroid).  One
    map-side expression (array_max over (score, idx) structs) — no
    shuffle, no Python, whole-stage codegen throughout
    (``centroid_scores``)."""
    if not centroids:
        raise ValueError("ivf_assign needs at least one centroid (empty corpus?)")
    return df.withColumn("ivf_cluster", F.array_max(centroid_scores(vec_col, centroids))["i"])


def cosine_topk_ivf(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: probe the ``nprobe`` closest centroid
    lists per query instead of the whole corpus.

    Scale shape: candidates per query = nprobe/nlist of the corpus; the
    probe fan-out happens on the tiny query side before the broadcast,
    so the big side sees one equi-join on ivf_cluster — the same
    O(n x probes/lists) bound as the SRP path, with data-adaptive
    partitioning (clusters follow density, buckets don't)."""
    centroids = ivf_centroids(df, nlist, iters, id_col, vec_col)
    if not centroids:
        # empty corpus: no neighbors, keep the output schema
        return df.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cos double, rank int"
        )
    cand = ivf_assign(df, centroids, vec_col)
    return cosine_topk_ivf_index(cand, centroids, queries, k, nprobe, id_col, vec_col)


def cosine_topk_ivf_index(
    index_df: DataFrame,
    centroids: list[list[float]],
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe against a PREBUILT index: ``index_df`` is
    (id, vec, ivf_cluster) — typically the persisted output of the
    ``ann_index`` CLI build, a parquet table partitioned by
    ivf_cluster.

    The union of probed cluster ids is computed first and pushed as a
    STATIC ``isin`` partition filter on the index scan (the set is at
    most nlist ints — a bounded-by-contract collect), so a query batch
    probing p of nlist lists reads ~p/nlist of the corpus files.
    Explicit rather than DPP: Spark's dynamic pruning does not trigger
    for a broadcast probe side built in memory, and the static filter
    is strictly more predictable."""
    probe_lists = F.slice(
        F.sort_array(centroid_scores("query_vec", centroids), asc=False), 1, nprobe
    )
    probed = sorted(
        r[0]
        for r in queries.select(
            F.explode(F.transform(probe_lists, lambda p: p["i"])).alias("c")
        )
        .distinct()
        .collect()
    )
    cand = index_df.where(F.col("ivf_cluster").isin(probed)).withColumn(
        "_nrm", norm(F.col(vec_col))
    )
    # the join fan-out reuses probe_lists verbatim: the partition
    # prefilter above MUST stay a superset of the per-query probes
    q = queries.select(
        "query_id",
        "query_vec",
        F.explode(F.transform(probe_lists, lambda p: p["i"])).alias("ivf_cluster"),
    )
    q = q.withColumn("_qnrm", norm(F.col("query_vec")))
    scored = (
        cand.join(F.broadcast(q), "ivf_cluster")
        .where(F.col("query_id") != F.col(id_col))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.try_divide(dot(F.col("query_vec"), F.col(vec_col)), F.col("_qnrm") * F.col("_nrm")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def embedding_cross_neardup(
    corpus: DataFrame,
    probes: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cross-SET near-duplicate scan: corpus vectors semantically close
    to any probe vector — the embedding tier of benchmark
    decontamination (the n-gram tier is
    ``operators/contamination.py``): an eval item paraphrased in the
    training corpus shares no 8-gram but still sits next to it in
    embedding space.

    ``probes`` must have (probe_id, probe_vec); it is the benchmark /
    eval set, small by contract, and is BROADCAST — the corpus side
    sees one map-only pass (norms precomputed per side, one fold per
    pair).  Emits (probe_id, vec_id, cos) for every pair at or above
    the threshold; downstream decontamination anti-joins the distinct
    vec_ids.  At 100TB: O(corpus x probes) multiply-adds distributed
    over the corpus partitions, zero shuffles.
    """
    cand = corpus.withColumn("_nrm", norm(F.col(vec_col)))
    q = probes.withColumn("_qnrm", norm(F.col("probe_vec")))
    return (
        cand.crossJoin(F.broadcast(q))
        .select(
            "probe_id",
            F.col(id_col),
            (
                F.try_divide(
                    dot(F.col("probe_vec"), F.col(vec_col)),
                    F.col("_qnrm") * F.col("_nrm"),
                )
            ).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    levels: int = 255,
) -> DataFrame:
    """Per-vector scalar quantization to ``levels+1`` integer codes —
    the storage tier of a vector index (int8 codes are 4x smaller than
    float32; IVF/SRP candidate generation runs on codes, the exact
    verifier re-reads the float column for the final cut).

    Affine per-vector map: q_i = floor((x_i - min) / (max - min) *
    levels + 0.5), with constant vectors mapped to code 0.  Every step
    is the same IEEE op on the same operand in any engine (array
    min/max are exact, the scale divide is one IEEE division), so
    codes — unlike the reconstructed floats — are engine-exact and
    oracle-checkable.  Per-row map, no shuffle; the transform lambda
    runs interpreted, which is acceptable for a one-time O(dim)
    projection per row (see signed_random_projection_buckets for the
    rule of thumb).

    Returns (id, q: array<int>, q_min, q_scale) — enough to
    dequantize: x_i ~ q_min + q_i * q_scale.
    """
    v = F.col(vec_col)
    lo = F.array_min(v).cast("double")
    hi = F.array_max(v).cast("double")
    scale = (hi - lo) / F.lit(float(levels))
    q = F.when(
        hi > lo,
        F.transform(v, lambda x: F.floor((x.cast("double") - lo) / scale + F.lit(0.5)).cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    return df.select(
        F.col(id_col),
        q.alias("q"),
        lo.alias("q_min"),
        scale.alias("q_scale"),
    )


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup, Abbas et al. 2023) and prototypicality
# pruning (Sorscher et al. 2022) — embedding-space corpus curation
# built on the IVF coarse quantizer above: cluster once, then do the
# O(m^2)-shaped work only *inside* clusters, never across the corpus.
# ---------------------------------------------------------------------------

MAX_SEMDEDUP_CLUSTER = 8_192


def ivf_assign_scored(
    df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """`ivf_assign` that also keeps the winning cosine: appends
    ``ivf_cluster`` and ``centroid_sim``.  Same map-only plan — the
    argmax runs over (score, idx) structs, so ties break to the
    larger index, which the numpy test replica mirrors."""
    if not centroids:
        raise ValueError("ivf_assign_scored needs at least one centroid")
    best = F.array_max(centroid_scores(vec_col, centroids))
    return df.withColumn("ivf_cluster", best["i"]).withColumn(
        "centroid_sim", best["s"]
    )


def prototypicality(
    df: DataFrame,
    nlist: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, ivf_cluster, centroid_sim): cosine of each vector to its
    cluster centroid — the SSL-prototypes pruning signal (drop the
    most prototypical fraction to keep the informative tail, or the
    least to denoise).  Centroids ride as literals; the scoring pass
    is map-only, so the whole operator is one corpus scan after the
    bounded Lloyd refinement."""
    centroids = ivf_centroids(df, nlist, iters, id_col, vec_col)
    if not centroids:  # empty corpus: schema-stable empty result
        return df.sparkSession.createDataFrame(
            [], f"{id_col} long, ivf_cluster int, centroid_sim double"
        )
    return ivf_assign_scored(df, centroids, vec_col).select(
        id_col, "ivf_cluster", "centroid_sim"
    )


def semdedup(
    df: DataFrame,
    threshold: float = 0.95,
    nlist: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup: within each IVF cluster, greedily drop vectors whose
    cosine to an already-kept vector exceeds ``threshold`` (scan in
    ascending id order, so the survivor set is deterministic).

    Cross-corpus comparisons never happen: candidate pairs exist only
    inside a cluster, and each cluster is processed independently by
    an Arrow-batched ``applyInPandas`` group (shuffle key = cluster
    id).  Per-group work is O(m x kept x dim) numpy, bounded by
    ``MAX_SEMDEDUP_CLUSTER`` — a cluster bigger than that means nlist
    is too small for the corpus, which is a sizing error worth failing
    loudly on rather than silently grinding through.

    Returns (id, ivf_cluster, keep, max_kept_sim) where
    ``max_kept_sim`` is the candidate's highest cosine to any vector
    kept before it (null for the first vector of a cluster).
    """
    import numpy as np
    import pandas as pd

    out_schema = f"{id_col} long, ivf_cluster int, keep boolean, max_kept_sim double"
    centroids = ivf_centroids(df, nlist, iters, id_col, vec_col)
    if not centroids:  # empty corpus: schema-stable empty result
        return df.sparkSession.createDataFrame([], out_schema)
    assigned = ivf_assign_scored(df, centroids, vec_col).select(
        F.col(id_col), F.col(vec_col), F.col("ivf_cluster")
    )

    def prune(pdf: "pd.DataFrame") -> "pd.DataFrame":
        m = len(pdf)
        if m > MAX_SEMDEDUP_CLUSTER:
            raise ValueError(
                f"semdedup cluster of {m} rows exceeds {MAX_SEMDEDUP_CLUSTER}; "
                "increase nlist so clusters stay bounded"
            )
        pdf = pdf.sort_values(id_col, kind="mergesort")
        V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        nrm = np.linalg.norm(V, axis=1)
        nrm[nrm == 0.0] = 1.0
        V = V / nrm[:, None]
        kept_rows: list[int] = []
        keep = np.zeros(m, dtype=bool)
        max_sim = np.full(m, np.nan)
        for i in range(m):
            if kept_rows:
                sims = V[kept_rows] @ V[i]
                max_sim[i] = float(sims.max())
                keep[i] = max_sim[i] <= threshold
            else:
                keep[i] = True
            if keep[i]:
                kept_rows.append(i)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                "ivf_cluster": pdf["ivf_cluster"].to_numpy(),
                "keep": keep,
                "max_kept_sim": max_sim,
            }
        )

    return assigned.groupBy("ivf_cluster").applyInPandas(prune, schema=out_schema)


def kmeans_update(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    labels: list[int] | None = None,
    scale: int = 10_000,
) -> DataFrame:
    """Lloyd's M-step, distributed: assign every vector to its argmax-
    cosine centroid (the same map-only expression as the assignment
    query — centroid_scores), then compute per-(cluster, dimension)
    member counts and coordinate sums.

    Returns (cluster, pos, n_members, sum_e4, mean_e4): the long-form
    new centroid matrix.  Coordinates are scaled to integers
    (floor(x*scale+0.5)) BEFORE summing, so the sums are exact in any
    aggregation order and bit-identical across engines; mean_e4 is the
    one final IEEE division.  Shape: one fused map (assignment) ->
    posexplode to (cluster, pos, val) triples -> hash aggregate with
    map-side partial combine, so the exchange carries
    O(k x dim x partitions) partial rows, never O(n x dim).
    The E-step/M-step pair makes the full Lloyd iteration runnable as
    two registry ops; the driver loop feeds the returned means back in
    as the next round's literals (aggregate-sized: k x dim doubles).
    """
    if labels is None:
        labels = list(range(len(centroids)))
    best = F.array_max(centroid_scores(vec_col, centroids, labels))
    e4 = lambda c: _scaled_int(c, scale)  # noqa: E731
    # two selects: Spark's Generate analysis drops the (s, i) struct
    # field names when the argmax field access shares a projection with
    # posexplode, so resolve the cluster id first
    assigned = df.select(best["i"].cast("int").alias("cluster"), F.col(vec_col))
    return (
        assigned.select(
            "cluster",
            F.posexplode(F.col(vec_col)).alias("pos", "val"),
        )
        .groupBy("cluster", "pos")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(e4(F.col("val"))).alias("sum_e4"),
        )
        .select(
            "cluster",
            F.col("pos").cast("int").alias("pos"),
            "n_members",
            "sum_e4",
            (F.col("sum_e4").cast("double") / F.col("n_members")).alias("mean_e4"),
        )
    )


def gram_matrix(
    df: DataFrame, vec_col: str = "embedding", scale: int = 10_000
) -> DataFrame:
    """Exact second-moment matrix of an embedding column: per (i, j)
    dimension pair, n, sum of cross products of integer-scaled
    coordinates, and the two coordinate sums — everything covariance /
    PCA needs (cov = cross/n - (si/n)(sj/n)), all BIGINT-exact so the
    matrix hashes identically across engines and aggregation orders.

    Shape: two chained posexplodes emit dim^2 (i, j, xi*xj) cells per
    vector, map-side combined before one exchange carrying
    O(dim^2 x partitions) partial rows — the classic distributed
    X^T X.  dim^2 cells is the budget knob: at dim=1024 that is ~1M
    aggregate cells, still executor-trivial; beyond that, block the
    matrix."""
    e4 = lambda c: _scaled_int(c, scale)  # noqa: E731
    a = df.select(F.col(vec_col).alias("__v"), F.posexplode(F.col(vec_col)).alias("i", "xi"))
    b = a.select("i", "xi", F.posexplode(F.col("__v")).alias("j", "xj"))
    return (
        b.groupBy("i", "j")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(e4(F.col("xi")) * e4(F.col("xj"))).alias("sum_cross_e8"),
            F.sum(e4(F.col("xi"))).alias("sum_i_e4"),
            F.sum(e4(F.col("xj"))).alias("sum_j_e4"),
        )
        .select(
            F.col("i").cast("int").alias("i"),
            F.col("j").cast("int").alias("j"),
            "n", "sum_cross_e8", "sum_i_e4", "sum_j_e4",
        )
    )


def top_principal_component(
    df: DataFrame, vec_col: str = "embedding", iters: int = 50
) -> tuple[float, list[float]]:
    """First principal component of the embedding cloud: the heavy
    O(n x dim^2) covariance accumulation runs distributed
    (gram_matrix); the dim x dim eigen-solve is a driver-side power
    iteration on the collected matrix (bounded by dim^2 cells — the
    same driver/executor split as the k-means and RProp trainers).

    Returns (eigenvalue, component) with the component sign-normalized
    so its largest-|coordinate| entry is positive (eigenvectors are
    sign-ambiguous; pick deterministically)."""
    import numpy as np

    rows = gram_matrix(df, vec_col).collect()
    if not rows:
        return 0.0, []
    ns = {r["n"] for r in rows}
    if len(ns) > 1:
        # ragged embeddings (mixed lengths / NULL elements) would make
        # per-cell n differ and the covariance silently wrong
        raise ValueError(
            f"gram cells disagree on n ({sorted(ns)[:4]}...): embeddings "
            "must all have the same length and no NULL elements"
        )
    dim = max(r["i"] for r in rows) + 1
    n = ns.pop()
    cross = np.zeros((dim, dim))
    si = np.zeros(dim)
    for r in rows:
        cross[r["i"], r["j"]] = r["sum_cross_e8"] / 1e8
        si[r["i"]] = r["sum_i_e4"] / 1e4
    mu = si / n
    cov = cross / n - np.outer(mu, mu)

    def iterate(v0):
        v = v0 / np.linalg.norm(v0)
        for _ in range(iters):
            w = cov @ v
            nw = np.linalg.norm(w)
            if nw == 0:
                return None  # v0 lies in the null space — try another init
            v = w / nw
        return v

    # deterministic multi-init: the all-ones direction can be exactly
    # orthogonal to the dominant eigenvector (e.g. perfectly
    # anticorrelated coordinates); fall through the top-variance basis
    # vectors and keep the best Rayleigh quotient
    inits = [np.ones(dim)]
    for k in np.argsort(np.diag(cov))[::-1][:3]:
        e = np.zeros(dim)
        e[int(k)] = 1.0
        inits.append(e)
    best_lam, best_v = 0.0, np.ones(dim) / np.sqrt(dim)
    for v0 in inits:
        v = iterate(v0)
        if v is None:
            continue
        lam = float(v @ cov @ v)
        if lam > best_lam:
            best_lam, best_v = lam, v
    v = best_v
    if v[int(np.argmax(np.abs(v)))] < 0:
        v = -v
    return best_lam, [float(x) for x in v]
