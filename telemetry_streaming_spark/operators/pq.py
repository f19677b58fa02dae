"""Product quantization — the compressed tier of the ANN family.

At 100 TB the raw float32 embedding column (dim 1024 ≈ 4 KB/row) is
itself the bottleneck: a brute-force or IVF scan moves terabytes of
vectors.  PQ (Jégou et al. 2011, "Product Quantization for Nearest
Neighbor Search") cuts that ~dim·4/m bytes → m bytes: split each
vector into ``m`` subvectors, k-means each subspace into ``k``
centroids, store each vector as m small codes, and score queries with
an asymmetric-distance lookup table (ADC) — m table lookups per
candidate instead of a dim-wide dot product.

Training is trainer-in-the-loop (the RProp / IRLS / BPE pattern): per
Lloyd iteration ONE distributed pass assigns all m subspaces at once
(Arrow-batched numpy argmin — at dim/m floats per distance the
vectorized batch beats any per-element JVM fold) and reduces to
integer-scaled coordinate sums with map-side combine — the exchange
carries O(k × dim × partitions) partial cells, never O(n × dim) —
and the driver's codebook update is k × dim doubles (the bounded-
collect contract of ``kmeans_update``).  Scaled-integer sums make the
trained codebooks deterministic in any aggregation order.

Scoring (``pq_topk``) never touches a vector: the query's LUT
(m × k squared-L2 cells, driver-side numpy) rides in as a plan
literal and each candidate costs m array lookups + a fold add,
followed by TakeOrdered — no shuffle wider than the top-k.

Complements the exact tiers in ``operators/similarity.py``
(brute-force cosine, SRP-LSH, IVF): IVF prunes WHICH candidates are
read, PQ shrinks WHAT is read per candidate; production ANN composes
both (IVF-PQ).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _codes_udf(codebooks):
    """Arrow-batched assignment: per vector, the argmin-L2 centroid in
    each subspace (numpy argmin — first minimum wins, mirrored by the
    replica in tests).  Codebooks travel in the closure: m*k*(dim/m) =
    k*dim floats, kilobytes."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    import pandas as pd

    cbs = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    m = len(cbs)
    d_sub = cbs[0].shape[1]

    @pandas_udf("array<int>")
    def codes(vecs):
        out = []
        for v in vecs:
            if v is None or len(v) != m * d_sub:
                out.append(None)
                continue
            x = np.asarray(v, dtype=np.float64)
            cs = []
            for j in range(m):
                sub = x[j * d_sub : (j + 1) * d_sub]
                d2 = ((cbs[j] - sub) ** 2).sum(axis=1)
                cs.append(int(np.argmin(d2)))
            out.append(cs)
        return pd.Series(out)

    return codes


def pq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    k: int = 16,
    iters: int = 5,
    scale: int = 10_000,
) -> list[list[list[float]]]:
    """Train PQ codebooks: returns ``m`` codebooks of ``k`` centroids
    each (dim/m floats per centroid).

    Deterministic end to end: seeds are the ``k`` lowest-``id_col``
    rows' subvectors (bounded collect, ascending id), the M-step sums
    scaled integers (order-free exact), and an emptied cluster keeps
    its previous centroid.  Requires dim divisible by ``m``.
    """
    import numpy as np

    # infer dim from a row that would actually train: a NULL first
    # vector must not abort (or silently empty) a corpus of valid ones
    first = (
        df.where(F.col(vec_col).isNotNull() & (F.size(vec_col) > 0))
        .select(F.size(vec_col).alias("d"))
        .first()
    )
    if first is None:
        raise ValueError("pq_train: empty input")
    dim = int(first["d"])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d_sub = dim // m

    seeds = (
        df.where(F.col(vec_col).isNotNull() & (F.size(vec_col) == dim))
        .orderBy(id_col)
        .limit(k)
        .select(vec_col)
        .collect()
    )
    if len(seeds) < k:
        raise ValueError(f"pq_train: need >= {k} vectors, got {len(seeds)}")
    mat = np.asarray([list(r[0]) for r in seeds], dtype=np.float64)
    codebooks = [
        mat[:, j * d_sub : (j + 1) * d_sub].copy().tolist() for j in range(m)
    ]

    vecs = df.select(F.col(vec_col).alias("__v")).where(
        F.col("__v").isNotNull() & (F.size("__v") == dim)
    )
    for _ in range(iters):
        codes = _codes_udf(codebooks)
        # one pass: assign all m subspaces, posexplode the vector once,
        # route each coordinate to its (subspace, code, local-pos) cell
        e = vecs.select(codes(F.col("__v")).alias("__c"), F.posexplode("__v"))
        j = (F.col("pos") / d_sub).cast("int")
        cell = e.select(
            j.alias("j"),
            F.element_at("__c", j + 1).alias("code"),
            (F.col("pos") % d_sub).alias("lpos"),
            F.floor(F.col("col") * scale + F.lit(0.5)).cast("long").alias("q"),
        )
        rows = (
            cell.groupBy("j", "code", "lpos")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("q").alias("s"))
            .collect()
        )  # bounded: m * k * d_sub = k * dim cells
        sums = np.zeros((m, k, d_sub))
        counts = np.zeros((m, k), dtype=np.int64)
        for r in rows:
            sums[r["j"], r["code"], r["lpos"]] = r["s"] / scale
            # n is per-(j, code, lpos) and identical across lpos — the
            # member count of that (subspace, cluster)
            if r["lpos"] == 0:
                counts[r["j"], r["code"]] = r["n"]
        for jj in range(m):
            for c in range(k):
                if counts[jj, c] > 0:
                    codebooks[jj][c] = (sums[jj, c] / counts[jj, c]).tolist()
    return codebooks


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "pq_codes",
) -> DataFrame:
    """Attach the m-byte PQ code array — a pure Arrow-batched map, no
    shuffle; rows whose vector is NULL or mis-sized code to NULL."""
    return df.withColumn(out_col, _codes_udf(codebooks)(F.col(vec_col)))


def pq_topk(
    encoded: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
) -> DataFrame:
    """Approximate k-nearest (squared L2) to ``query_vec`` by ADC: the
    m x k lookup table is computed driver-side from the query and
    rides in as a plan literal; each candidate's distance is m
    ``element_at`` lookups summed by one fold, then TakeOrdered.
    Returns (id, adc_dist) ascending."""
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    if len(q) != m * d_sub:
        raise ValueError("query dim mismatch")
    lut = [
        [
            float(((np.asarray(c) - q[j * d_sub : (j + 1) * d_sub]) ** 2).sum())
            for c in codebooks[j]
        ]
        for j in range(m)
    ]
    lut_lit = F.array(*[
        F.array(*[F.lit(v) for v in row]) for row in lut
    ])
    per_sub = F.transform(
        F.col(codes_col),
        lambda c, i: F.element_at(F.element_at(lut_lit, i + 1), c + 1),
    )
    dist = F.aggregate(per_sub, F.lit(0.0), lambda acc, x: acc + x)
    return (
        encoded.where(F.col(codes_col).isNotNull())
        .select(F.col(id_col), dist.alias("adc_dist"))
        .orderBy("adc_dist", id_col)
        .limit(k)
    )


def pq_distortion_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    k: int = 8,
    scale: int = 10_000,
) -> DataFrame:
    """Integer-exact E-step cost of the SEEDED (iteration-0) codebook:
    per subspace, the count of assigned vectors, the summed squared-L2
    distortion, and the summed assigned code index.

    This is the hash-checkable companion to the rows-only ``pq_train``
    / ``pq_encode`` tier: vectors are quantized to BIGINT
    (``floor(x*scale + 0.5)``, the gram-matrix convention) BEFORE any
    arithmetic, the codebook is the same deterministic seed rule the
    trainer uses (the ``k`` lowest-``id_col`` rows' subvectors), and
    assignment ties break to the lowest code via a combined
    ``d2 * k + code`` min — so every output cell is exact in any
    engine and any aggregation order, and an independent SQL engine
    can replay the whole assignment geometry (subvector slicing,
    argmin, tie-break) from the raw table.

    Pure JVM expressions — the m*k distance terms are codegen'd
    zip_with/aggregate folds over plan-literal centroids (the
    kmeans_update pattern); one narrow scan, one m-row aggregate.
    Overflow: ``d2 * k`` with d2 <= d_sub * (2*scale*|x|_max)^2 must
    fit int64 — at scale=1e4 and unit-normalized embeddings that
    leaves ~6 orders of magnitude of headroom.
    """
    first = (
        df.where(F.col(vec_col).isNotNull() & (F.size(vec_col) > 0))
        .select(F.size(vec_col).alias("d"))
        .first()
    )
    if first is None:
        raise ValueError("pq_distortion_stats: empty input")
    dim = int(first["d"])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d_sub = dim // m

    seeds = (
        df.where(F.col(vec_col).isNotNull() & (F.size(vec_col) == dim))
        .orderBy(id_col)
        .limit(k)
        .select(vec_col)
        .collect()
    )
    if len(seeds) < k:
        raise ValueError(f"pq_distortion_stats: need >= {k} vectors, got {len(seeds)}")
    # quantize seeds EXACTLY as the vectors are quantized below
    seed_q = [
        [int(math.floor(float(x) * scale + 0.5)) for x in r[0]]
        for r in seeds
    ]

    qv = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("long"),
    )
    vecs = df.where(
        F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
    ).select(qv.alias("__q"))

    # ONE nested loop expression over ONE flattened centroid literal
    # (m*k*d_sub longs, laid out [subspace][code][i]) — not m separate
    # fold trees each with its own literal: plan/analysis/codegen cost
    # scales with expression-tree size, and collapsing the m trees into
    # a single subspace loop cut the fixed plan cost by a further ~35%
    # on top of the r6 loop-expression rewrite (measured, SCALE.md;
    # r6 verdict item 8).  Element-wise F.lit() stays banned: one py4j
    # call ships the whole table.  The per-row arithmetic is identical.
    cents_flat = F.lit(
        [
            int(seed_q[code][j * d_sub + i])
            for j in range(m)
            for code in range(k)
            for i in range(d_sub)
        ]
    ).cast("array<long>")
    q = F.col("__q")
    subs = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.struct(
            j.cast("int").alias("subspace"),
            F.array_min(
                F.transform(
                    F.sequence(F.lit(0), F.lit(k - 1)),
                    lambda code: F.aggregate(
                        F.sequence(F.lit(0), F.lit(d_sub - 1)),
                        F.lit(0).cast("long"),
                        lambda acc, i: acc
                        + (
                            F.element_at(q, (j * d_sub + i + 1).cast("int"))
                            - F.element_at(
                                cents_flat,
                                (
                                    (j * k + code) * d_sub + i + 1
                                ).cast("int"),
                            )
                        )
                        * (
                            F.element_at(q, (j * d_sub + i + 1).cast("int"))
                            - F.element_at(
                                cents_flat,
                                (
                                    (j * k + code) * d_sub + i + 1
                                ).cast("int"),
                            )
                        ),
                    )
                    * F.lit(k)
                    + code,
                )
            ).alias("best"),
        ),
    )
    return (
        vecs.select(F.explode(subs).alias("s"))
        .groupBy(F.col("s.subspace").alias("subspace"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.sum(F.expr(f"s.best div {k}")).cast("long").alias("distortion_q2"),
            F.sum(F.pmod("s.best", F.lit(k))).cast("long").alias("code_sum"),
        )
    )


def int8_quant_error_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    group_col: str = "label",
    scale: int = 10_000,
) -> DataFrame:
    """Integer-exact reconstruction-error profile of int8 SCALAR
    quantization — the simplest compressed-vector tier (4 bytes/dim ->
    1 byte/dim; PQ's m-bytes-per-VECTOR is the next step down).

    Per group: ``(group, n_vectors, sum_sq_err_q, max_abs_err_q)``
    where each element's error is measured between the e4-quantized
    original (``floor(x*scale+0.5)``, the gram-matrix convention) and
    the int8 code (``clamp(floor(x*127+0.5), -127, 127)``), cross-
    scaled to the common grid: ``err = qx*127 - q8*scale``.  All
    BIGINT, exact in any engine/order — the hash-checkable audit a
    deployment runs before switching its ANN scan to the int8 column.

    Plan: pure codegen'd array expressions (transform/zip_with/
    aggregate) -> one group-sized hash aggregate; the vector column is
    scanned once and never shuffled.  Contract: elements in ~[-1, 1]
    (clamping past that inflates err by design and the BIGINT sum
    holds to ~5e9 vectors/group at dim 64); larger corpora shard the
    group key first.
    """
    vec = F.col(vec_col)
    qx = F.transform(
        vec, lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("long")
    )
    q8 = F.transform(
        vec,
        lambda x: F.greatest(
            F.lit(-127).cast("long"),
            F.least(
                F.lit(127).cast("long"),
                F.floor(x.cast("double") * 127 + F.lit(0.5)).cast("long"),
            ),
        ),
    )
    err = F.zip_with(qx, q8, lambda a, b: a * 127 - b * scale)
    sq = F.aggregate(
        err, F.lit(0).cast("long"), lambda acc, e: acc + e * e
    )
    mx = F.array_max(F.transform(err, lambda e: F.abs(e)))
    return (
        df.where(vec.isNotNull() & (F.size(vec) > 0))
        .select(F.col(group_col), sq.alias("__sq"), mx.alias("__mx"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.sum("__sq").cast("long").alias("sum_sq_err_q"),
            F.max("__mx").cast("long").alias("max_abs_err_q"),
        )
    )
