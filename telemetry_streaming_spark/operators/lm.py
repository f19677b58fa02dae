"""N-gram language-model quality scoring — the CCNet-style filter.

CCNet / RefinedWeb rank crawl documents by language-model perplexity
and keep the low-perplexity head.  This module is that filter with a
count-based bigram LM: train gram statistics on a reference corpus
(one aggregate pass), score any corpus against them (one equi-join on
the full bigram key + one per-doc aggregate).

Scores are ``avg_neg_logprob`` (mean token negative log-probability —
monotone in perplexity, which is ``exp`` of it).  Log outputs are NOT
bit-portable across engines (JVM StrictMath vs libm), so the scoring
queries are rows-only with a pure-python replica pin
(tests/test_lm.py), the same contract as ``token_entropy``.  The gram
COUNT table itself is exact integers and oracle-checkable.

Scale posture: the LM table is vocabulary²-bounded (distinct observed
bigrams), built with map-side combine; the scoring join probes on the
full (prefix, token) pair key, so stopword-prefix heat spreads across
that prefix's distinct successors rather than landing in one
partition (a prefix-only join or count-over-window-by-prefix would
straggle — same argument as rare_token_score's rejected window form).
Only 8-byte xxhash64 keys cross the exchanges.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from telemetry_streaming_spark.operators.checkpointing import cut_lineage


def _doc_bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, prefix_hash, pair_hash) per adjacent token pair — hash
    INSIDE a per-document transform, then explode the 16-byte pair
    structs.  Exploding token *positions* and hashing afterwards would
    carry the document's whole token array on every exploded row
    (tokens-per-doc × grams-per-doc string copies — measured 2× the
    whole scorer's runtime at sf0.1); here the array is consumed once
    per document and nothing wider than two 8-byte keys leaves the
    generate."""
    toks = F.split(F.expr(rf"trim(BOTH ' \t\r\n' FROM lower({text_col}))"), r"\s+")
    base = df.where(F.col(text_col).rlike(r"\S")).select(
        F.col(id_col), toks.alias("__toks")
    )
    t = F.col("__toks")
    pairs = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.struct(
                F.xxhash64(F.element_at(t, i)).alias("p_h"),
                F.xxhash64(
                    F.element_at(t, i), F.element_at(t, i + 1)
                ).alias("g_h"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<p_h:bigint,g_h:bigint>>"))
    return base.select(F.col(id_col), F.explode(pairs).alias("__bs")).select(
        F.col(id_col),
        F.col("__bs.p_h").alias("p_h"),
        F.col("__bs.g_h").alias("g_h"),
    )


def bigram_lm_table(
    lm_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    grams: DataFrame | None = None,
) -> DataFrame:
    """The trained LM: (p_h, g_h, c2, c1) — bigram count and its
    prefix's total continuation count.  c1 is derived by re-aggregating
    the ALREADY-reduced bigram table (vocabulary²-sized), never the
    corpus stream, then joined back — both sides aggregate-sized, AQE
    plans the join.  ``grams`` lets a SELF-scoring caller pass its own
    (lineage-cut) gram frame so the corpus explodes once, not twice."""
    if grams is None:
        grams = _doc_bigrams(lm_docs, text_col, id_col)
    c2 = grams.groupBy("p_h", "g_h").agg(F.count(F.lit(1)).alias("c2"))
    c2 = cut_lineage(c2)  # feeds both the c1 rollup and the output join
    c1 = c2.groupBy("p_h").agg(F.sum("c2").alias("c1"))
    return c2.join(c1, "p_h").select("p_h", "g_h", "c2", "c1")


def bigram_lm_score(
    docs: DataFrame,
    lm_docs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    lm_table: DataFrame | None = None,
) -> DataFrame:
    """Per-document bigram-LM quality score against ``lm_docs``
    (default: the corpus itself — self-scoring flags the outliers;
    pass a clean reference corpus for the CCNet setup, or a
    PRE-TRAINED table via ``lm_table`` — the `train --task lm` CLI
    job's parquet — to skip the LM build entirely).

    Returns (id, n_bigrams, n_unseen, avg_neg_logprob) where each
    bigram contributes ``-log((c2 + alpha) / (c1 + alpha * V))`` —
    add-alpha smoothing over the LM vocabulary size ``V``, so unseen
    continuations (c2 = 0, including wholly unseen prefixes) score
    finite-but-poor instead of infinite.  Lower = more natural under
    the LM.

    V rides in as a broadcast 1-row aggregate (lazily planned, no
    driver job).  TWO left joins, not one: the pair join (on g_h)
    recovers c2, and a separate prefix join (on p_h, against the
    vocabulary-sized c1 rollup) recovers c1 — a single pair-key join
    would zero the prefix count for every unseen continuation,
    systematically over-penalizing near-misses (caught by
    test_round5_fuzz's cross-corpus property).  The prefix join is
    where a stopword prefix concentrates; its build side is
    vocabulary-sized (AQE broadcasts it when it fits, splits skew
    otherwise)."""
    grams = _doc_bigrams(docs, text_col, id_col)
    if lm_table is not None:
        lm = lm_table
    elif lm_docs is not None:
        lm = bigram_lm_table(lm_docs, text_col, id_col)
    else:
        # self-scoring recomputes the gram explode for the LM build
        # rather than lineage-cutting the shared frame: an eager
        # localCheckpoint would materialize the CORPUS-SIZED gram
        # stream to executor storage (and ignore any reliable-
        # checkpoint policy), which costs more than the one extra
        # codegen'd scan+explode it saves — measured equal-or-worse at
        # sf0.1, and strictly worse storage at scale.  Callers who DO
        # want sharing (a persisted/cached gram frame) pass ``grams``
        # to bigram_lm_table themselves.
        lm = bigram_lm_table(docs, text_col, id_col)
    c1_tbl = lm.select("p_h", "c1").distinct()
    vocab = c1_tbl.agg(F.count(F.lit(1)).alias("v"))
    scored = (
        grams.join(lm.select("g_h", "c2"), "g_h", "left")
        .join(c1_tbl, "p_h", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            (F.coalesce(F.col("c2"), F.lit(0)) == 0).cast("int").alias("unseen"),
            (
                F.log(F.coalesce(F.col("c1"), F.lit(0)) + F.lit(alpha) * F.col("v"))
                - F.log(F.coalesce(F.col("c2"), F.lit(0)) + F.lit(alpha))
            ).alias("nlp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("unseen").cast("long").alias("n_unseen"),
        F.avg("nlp").alias("avg_neg_logprob"),
    )


MAX_LM_GRAMS = 5_000_000


def bigram_lm_score_stream(
    df: DataFrame,
    lm_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """Streaming tier of :func:`bigram_lm_score`: score a document
    STREAM against a static reference LM, row-locally — no state, no
    watermark, no shuffle, safe in any output mode (the
    ``decontaminate_stream`` contract one step up: counts instead of
    membership).

    The LM table collects once, driver-side, bounded by
    ``MAX_LM_GRAMS`` (a reference LM is a curated corpus's gram table,
    not the crawl), and rides to executors as three sorted numpy
    arrays inside an Arrow-batched UDF; per document the gram hashes
    are computed JVM-side into an array column and each gram is a
    ``searchsorted`` probe.  Scores match the batch tier exactly on
    the same LM corpus (pinned in tests/test_lm.py).

    Emits every input column plus (n_bigrams, n_unseen,
    avg_neg_logprob); docs with no bigrams score NULL.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    lm_rows = (
        bigram_lm_table(lm_docs, text_col, id_col)
        .limit(MAX_LM_GRAMS + 1)
        .collect()
    )
    if len(lm_rows) > MAX_LM_GRAMS:
        raise ValueError(
            f"LM gram table exceeds {MAX_LM_GRAMS}; score with the batch "
            "join tier (bigram_lm_score) for corpus-sized LMs"
        )
    g = np.array([r["g_h"] for r in lm_rows], dtype=np.int64)
    order = np.argsort(g)
    g_sorted = g[order]
    c2_sorted = np.array([r["c2"] for r in lm_rows], dtype=np.int64)[order]
    # prefix table: lookup c1 by p_h even when the PAIR is unseen (a
    # pair-only lookup would zero the prefix count for near-misses —
    # the batch-tier bug test_round5_fuzz caught, fixed in both tiers)
    p_c1 = {}
    for r in lm_rows:
        p_c1[r["p_h"]] = r["c1"]
    p_sorted = np.sort(np.array(list(p_c1), dtype=np.int64))
    c1_by_p = np.array(
        [p_c1[int(p)] for p in p_sorted], dtype=np.int64
    ) if len(p_c1) else np.array([], dtype=np.int64)
    v = len(p_c1)

    def _lookup(keys_sorted, vals, q):
        if len(keys_sorted) == 0:
            return np.zeros(len(q), dtype=np.int64), np.zeros(len(q), bool)
        pos = np.clip(np.searchsorted(keys_sorted, q), 0, len(keys_sorted) - 1)
        found = keys_sorted[pos] == q
        return np.where(found, vals[pos], 0), found

    @pandas_udf("struct<n_bigrams:long,n_unseen:long,avg_neg_logprob:double>")
    def score(prefix_arrays, gram_arrays):
        ns, unseens, avgs = [], [], []
        for parr, garr in zip(prefix_arrays, gram_arrays):
            if garr is None or len(garr) == 0:
                ns.append(None)
                unseens.append(None)
                avgs.append(None)
                continue
            qg = np.asarray(garr, dtype=np.int64)
            qp = np.asarray(parr, dtype=np.int64)
            c2, found = _lookup(g_sorted, c2_sorted, qg)
            c1, _ = _lookup(p_sorted, c1_by_p, qp)
            nlp = np.log(c1 + alpha * v) - np.log(c2 + alpha)
            ns.append(len(qg))
            unseens.append(int((~found).sum()))
            avgs.append(float(nlp.mean()))
        return pd.DataFrame(
            {"n_bigrams": ns, "n_unseen": unseens, "avg_neg_logprob": avgs}
        )

    toks = F.split(F.expr(rf"trim(BOTH ' \t\r\n' FROM lower({text_col}))"), r"\s+")
    idx = F.when(
        F.col(text_col).rlike(r"\S") & (F.size(toks) >= 2),
        F.sequence(F.lit(1), F.size(toks) - 1),
    ).otherwise(F.array().cast("array<int>"))
    prefix_hashes = F.transform(idx, lambda i: F.xxhash64(F.element_at(toks, i)))
    gram_hashes = F.transform(
        idx,
        lambda i: F.xxhash64(F.element_at(toks, i), F.element_at(toks, i + 1)),
    )
    s = score(prefix_hashes, gram_hashes)
    return df.select(
        "*",
        s["n_bigrams"].alias("n_bigrams"),
        s["n_unseen"].alias("n_unseen"),
        s["avg_neg_logprob"].alias("avg_neg_logprob"),
    )


def bigram_path_stats(
    docs: DataFrame,
    lm_docs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Integer sufficient statistics of :func:`bigram_lm_score`'s
    scoring path — the hash-checkable companion to the rows-only score
    (whose ``log`` is not bit-portable across engines).

    Per document: ``(id, n_bigrams, n_unseen, sum_c2, sum_c1,
    lm_vocab)`` where ``sum_c2``/``sum_c1`` total the pair and prefix
    counts the scorer's two left joins recover and ``lm_vocab`` is the
    smoothing vocabulary size V.  All BIGINT-exact in any aggregation
    order; together they determine ``avg_neg_logprob`` modulo the log,
    so an oracle hash over these checks the ENTIRE scoring join
    machinery (pair join, prefix join, unseen detection, V broadcast)
    — only the final transcendental stays replica-pinned.

    Same plan shape as the scorer: gram explode, two joins keyed on
    8-byte hashes, broadcast 1-row V, one per-doc aggregate.
    """
    grams = _doc_bigrams(docs, text_col, id_col)
    lm = bigram_lm_table(
        lm_docs if lm_docs is not None else docs, text_col, id_col
    )
    c1_tbl = lm.select("p_h", "c1").distinct()
    vocab = c1_tbl.agg(F.count(F.lit(1)).alias("v"))
    joined = (
        grams.join(lm.select("g_h", "c2"), "g_h", "left")
        .join(c1_tbl, "p_h", "left")
        .crossJoin(F.broadcast(vocab))
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum((F.coalesce(F.col("c2"), F.lit(0)) == 0).cast("int"))
        .cast("long")
        .alias("n_unseen"),
        F.sum(F.coalesce(F.col("c2"), F.lit(0))).cast("long").alias("sum_c2"),
        F.sum(F.coalesce(F.col("c1"), F.lit(0))).cast("long").alias("sum_c1"),
        F.min("v").cast("long").alias("lm_vocab"),
    )
