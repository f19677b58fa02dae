"""Per-group distinctive terms (c-TF-IDF).

The corpus-curation question "what vocabulary characterizes each
source/cluster/language slice?" is the grouped variant of TF-IDF
(class-based TF-IDF): term frequency within the group, inverse
*group* frequency across groups.  Group-level document frequency is
the right denominator here — and, unlike per-document df, it falls
out of the same aggregate that produces tf, so the whole operator is
two narrow aggregations instead of a second pass over the exploded
corpus:

    explode(tokens) -> agg (group, term) -> tf      [1 shuffle, combine]
    tf -> agg (term) -> group-df                    [shuffle of terms x groups]
    tf join group-df on term -> score -> top-k/group [window, N rows/group]

Nothing after the first exchange is proportional to corpus size: the
tf table is |groups| x |vocabulary|, the group-df table |vocabulary|.

Scoring is **integer-linearized idf**: ``score = tf * ((n_groups *
idf_scale) div group_df)``.  A log-idf would rank near-identically but
``ln`` is not bit-identical across engines (JVM StrictMath vs DuckDB
libm), which would make the DuckDB oracle flaky at ties; integer
cross-multiplication is exact everywhere.  Ranking ties break on the
term string, so top-k is fully deterministic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import broadcast

from telemetry_streaming_spark.functions.text import tokenize
from telemetry_streaming_spark.operators.checkpointing import cut_lineage


def distinctive_terms(
    docs: DataFrame,
    *,
    text_col: str = "text",
    group_col: str = "source",
    top_k: int = 10,
    min_tf: int = 1,
    idf_scale: int = 1000,
) -> DataFrame:
    """Top ``top_k`` c-TF-IDF terms per ``group_col``.

    Returns ``(group_col, term, tf, group_df, score, rnk)`` — all
    integer/string columns, bit-portable across engines.
    ``min_tf`` prunes singleton noise before the join and window.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    tokens = docs.select(
        F.col(group_col), F.explode(tokenize(F.col(text_col))).alias("term")
    )
    tf = tokens.groupBy(group_col, "term").agg(F.count("*").alias("tf"))
    if min_tf > 1:
        tf = tf.where(F.col("tf") >= min_tf)
    # Materialized: tf feeds three consumers (scoring join, group-df
    # agg, n_groups) — without the cut each one re-runs the corpus
    # explode + aggregate.  tf is |groups| x |vocabulary| rows, the
    # natural checkpoint of the pipeline.  Eager checkpoint rather
    # than persist(): blocks self-clean when the frame goes out of
    # scope, so callers owe no clearCache/unpersist.
    tf = cut_lineage(tf)
    group_df = tf.groupBy("term").agg(F.count("*").alias("group_df"))
    n_groups = tf.select(group_col).distinct().agg(F.count("*").alias("n_groups"))
    scored = (
        tf.join(group_df, "term")
        .join(broadcast(n_groups))
        .withColumn(
            "score",
            F.col("tf")
            * F.expr(f"(n_groups * {int(idf_scale)}) div group_df").cast("long"),
        )
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= top_k)
        .select(group_col, "term", "tf", "group_df", "score", "rnk")
    )


def token_entropy(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document token-distribution Shannon entropy (nats).

    ``H = ln(n) - sum(c * ln(c)) / n`` over the doc's token counts — a
    standard quality/repetition signal (templated or keyword-stuffed
    text scores low, natural prose high).  Two narrow aggregations:
    (doc, token) counts, then the per-doc fold; both shuffles carry
    count rows only, never text.

    Uses IEEE ``ln`` — NOT oracle-hash-portable across engines (libm
    last-ulp differences), so the registry query is rows-only and the
    values are pinned against an independent Python reference in
    ``tests/test_frequency.py``.
    """
    tokens = docs.select(F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("tok"))
    counts = tokens.groupBy(id_col, "tok").agg(F.count("*").alias("c"))
    return (
        counts.groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("vocab"),
            F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))).alias("__clc"),
        )
        .select(
            id_col,
            "n_tokens",
            "vocab",
            (F.log(F.col("n_tokens").cast("double")) - F.col("__clc") / F.col("n_tokens"))
            .alias("entropy"),
        )
    )


def target_likeness(
    df: DataFrame,
    is_target_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance scoring (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"), integer-exact
    variant: score every document by how much its unigram mass looks
    like the TARGET slice vs the rest of the corpus.

    DSIR proper weights by sum of log(p_target/p_source) over hashed
    n-gram features; ``ln`` is not bit-identical across engines, so
    this emits the EXACT sufficient statistics instead — score_t =
    sum over token occurrences of the target-corpus count of that
    token, score_s likewise for the source/background — and the
    linearized verdict ``target_like`` via one cross-multiplied
    integer comparison against the corpus totals:

        score_t * s_total > score_s * t_total
        (i.e. mean target-frequency ratio exceeds mean source ratio)

    Per-token products fit BIGINT up to ~1e9-count vocabularies; past
    that (trillion-token corpora with billion-count heads) cast the
    two comparison operands to DECIMAL(38,0) — the flag stays exact.

    Plan: one shuffle builds the (token, t_cnt, s_cnt) frequency table
    (vocabulary-sized), one shuffle joins it back to token occurrences
    (count grains only — 8B counts ride the wire, never text), one
    narrow fold to per-doc sums; the corpus totals are a broadcast
    1-row aggregate.  Degenerate slices are well-defined: an all-
    target corpus has s_total = 0, so no document tests target_like
    (0 > score_s * t_total never holds) — callers gate on slice
    sizes, not this operator."""
    toks = df.where(F.col(text_col).rlike(r"\S")).select(
        F.col(id_col),
        F.col(is_target_col).cast("long").alias("__t"),
        F.explode(
            F.split(
                F.expr(rf"trim(BOTH ' \t\r\n' FROM lower({text_col}))"),
                r"\s+",
            )
        ).alias("token"),
    )
    stats = toks.groupBy("token").agg(
        F.sum("__t").alias("t_cnt"),
        F.sum(F.lit(1) - F.col("__t")).alias("s_cnt"),
    )
    totals = stats.agg(
        F.sum("t_cnt").alias("__t_tot"), F.sum("s_cnt").alias("__s_tot")
    )
    scored = (
        toks.join(stats, "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("t_cnt").alias("score_t"),
            F.sum("s_cnt").alias("score_s"),
        )
    )
    return scored.crossJoin(F.broadcast(totals)).select(
        id_col,
        "n_tokens",
        "score_t",
        "score_s",
        (F.col("score_t") * F.col("__s_tot") > F.col("score_s") * F.col("__t_tot"))
        .cast("int")
        .cast("long")
        .alias("target_like"),
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[tuple[str, list[str]]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 10,
    idf_scale: int = 1_000_000,
) -> DataFrame:
    """Rational-exact BM25 retrieval: top ``top_k`` documents per query
    (Robertson et al., Okapi BM25), re-expressed so every score is a
    BIGINT and the DuckDB oracle hash-matches bit-for-bit.

    Two substitutions make the classic formula integer-exact, both
    following the house rule that ``ln`` is not portably rounded
    across engines (JVM StrictMath vs libm — see distinctive_terms):

    * **idf** — the Robertson-Sparck Jones log argument
      ``(N - df + 0.5) / (df + 0.5)`` is the rational
      ``(2N - 2df + 1) / (2df + 1)``; the log is DROPPED and the
      ratio itself is the idf weight, floor-scaled to
      ``idf_e6 = (idf_scale * (2N - 2df + 1)) div (2df + 1)``.
      Monotone in df, so per-term document ordering is identical to
      BM25; cross-term additivity weights rare terms harder than the
      log variant (documented, deterministic).
    * **tf saturation** — with k1 = 6/5 and b = 3/4 fixed,
      ``tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` with
      ``avgdl = L/N`` multiplies through by ``20*L`` into
      ``sat_e6 = (idf_scale * 44 * L * tf)
                 div (20*L*tf + 6*L + 18*dl*N)`` — one integer
      division, no float anywhere.

    Per-term contribution ``(idf_e6 * sat_e6) div idf_scale`` is
    summed per (query, doc); ties in the final top-k break on
    ``id_col`` so the cut is total-ordered.

    Overflow contract: the saturation numerator ``idf_scale*44*L*tf``
    must stay under 2^63 — with e6 scaling that is ``L*tf < 2.1e11``,
    i.e. corpora to ~100B tokens at tf <= 100; past that drop
    ``idf_scale`` to 1e4 or lift the expression to DECIMAL(38,0).

    Plan shape: two corpus passes and ONE tiny shuffle.  Pass one is
    the 1-row corpus-totals aggregate (``size(split(...))`` — never
    exploded, partial-aggregated to a single row, broadcast).  Pass
    two explodes tokens WITH the doc length riding each row, broadcast-
    semi-joins to the query vocabulary BEFORE any aggregate — so the
    only shuffle over corpus-derived rows carries query-term hits
    (docs-matching-terms grain, map-side combined, ``F.min(dl)``
    recovering the constant) — and is lineage-cut for its two
    consumers (per-term df, scoring).  Downstream there is NO
    non-broadcast join; the final window partitions by query_id over
    candidate docs only, never the corpus.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    rows = [(qid, t) for qid, terms in query_terms for t in terms]
    if not rows:
        raise ValueError("query_terms must name at least one (query, term)")
    if len(set(rows)) != len(rows):
        dupes = sorted({r for r in rows if rows.count(r) > 1})
        raise ValueError(
            f"duplicate (query, term) entries would double-count: {dupes}"
        )
    spark = docs.sparkSession
    q = spark.createDataFrame(rows, schema="query_id string, term string")

    nonblank = docs.where(F.col(text_col).rlike(r"\S"))
    # whitespace-SET trim (not F.trim, which strips spaces only): a
    # leading tab/CR/LF would otherwise yield an empty first token on
    # the Spark side only and break the oracle hash (r10 review)
    tokens = F.split(
        F.expr(rf"trim(BOTH ' \t\r\n' FROM lower({text_col}))"), r"\s+"
    )
    # Corpus totals: one straight 1-row aggregate (partial agg to a
    # single row — no shuffle, no per-doc frame).
    tot = nonblank.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens).cast("long")).alias("total_len"),
    )
    # Doc length RIDES the token stream (constant per doc, F.min in
    # the aggregate recovers it), so the scoring path needs no
    # per-doc length join — postings + three broadcasts is the whole
    # downstream plan, with NO non-broadcast join.
    toks = nonblank.select(
        F.col(id_col).alias("__id"),
        F.size(tokens).cast("long").alias("dl"),
        F.explode(tokens).alias("term"),
    )
    qterms = q.select("term").distinct()
    # Materialized: postings feeds the per-term-df broadcast AND the
    # scoring projection — without the cut each one re-runs the
    # corpus explode.  Docs-matching-terms count rows only.
    postings = cut_lineage(
        toks.join(broadcast(qterms), "term")
        .groupBy("__id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.min("dl").alias("dl"))
    )
    df_t = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        postings.join(broadcast(q), "term")
        .join(broadcast(df_t), "term")
        .crossJoin(broadcast(tot))
        .withColumn(
            "idf_e6",
            F.expr(
                f"(CAST({int(idf_scale)} AS BIGINT) * (2*n_docs - 2*df + 1))"
                " div (2*df + 1)"
            ),
        )
        .withColumn(
            "sat_e6",
            F.expr(
                f"(CAST({int(idf_scale)} AS BIGINT) * 44 * total_len * tf)"
                " div (20*total_len*tf + 6*total_len + 18*dl*n_docs)"
            ),
        )
    )
    agg = scored.groupBy("query_id", "__id").agg(
        F.count(F.lit(1)).alias("n_terms_hit"),
        F.sum(F.expr(f"(idf_e6 * sat_e6) div {int(idf_scale)}")).alias("score_e6"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_e6").desc(), F.col("__id").asc()
    )
    return (
        agg.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= top_k)
        .select(
            "query_id",
            F.col("__id").alias(id_col),
            "n_terms_hit",
            "score_e6",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )
