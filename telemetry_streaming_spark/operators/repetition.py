"""Repetition / boilerplate metrics for training-data quality filtering.

Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
Models: ... Gopher", §A1.1): a document dominated by a few repeated
n-grams is boilerplate (navigation chrome, SEO spam, generated filler)
and gets dropped before training.  The two standard signals:

- **duplicate n-gram fraction** — 1 - distinct/total n-grams: how much
  of the document is repeated phrasing at all;
- **top n-gram fraction** — occurrences of the single most frequent
  n-gram / total: whether one phrase dominates.

Plan shape (scales to 100TB): explode word n-grams (reusing the dedup
tier's codegen'd explode — no interpreted higher-order functions),
count per (doc, gram) with map-side partial aggregation, then fold to
per-doc stats with a second narrow aggregation on doc_id.  Two
shuffles, both carrying counts (8B key + 8B count grains), never raw
text; no collect, no UDFs.

Documents with fewer than ``n`` tokens have no n-grams and emit no
row — the caller treats absence as "no repetition signal" (they are
length-filtered by other quality rules anyway).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from telemetry_streaming_spark.operators.dedup import _exploded_grams


def ngram_repetition(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 2
) -> DataFrame:
    """Per-document n-gram repetition stats.

    Returns (id, n_grams, n_distinct, top_count) — all exact BIGINTs
    so downstream thresholds (and the DuckDB oracle hash) are
    engine-exact; the fractions are single IEEE divisions the caller
    derives when needed.
    """
    grams = _exploded_grams(df, text_col, id_col, n)
    per_gram = grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    return per_gram.groupBy(id_col).agg(
        F.sum("c").alias("n_grams"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_count"),
    )


def repetition_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    max_dup_frac: float = 0.75,
    max_top_frac: float = 0.10,
) -> DataFrame:
    """Quality-filter verdict per document: flagged when the duplicate
    n-gram fraction exceeds ``max_dup_frac`` OR the top n-gram exceeds
    ``max_top_frac`` of the document (Gopher drops at 0.75/0.10 for
    2-grams).  Thresholds are evaluated on exact integer cross
    products (count * 100 >= limit * total) so the flag is not subject
    to float rounding at the boundary."""
    stats = ngram_repetition(df, text_col, id_col, n)
    dup_scaled = (F.col("n_grams") - F.col("n_distinct")) * F.lit(100)
    top_scaled = F.col("top_count") * F.lit(100)
    flagged = (dup_scaled >= F.lit(int(max_dup_frac * 100)) * F.col("n_grams")) | (
        top_scaled >= F.lit(int(max_top_frac * 100)) * F.col("n_grams")
    )
    return stats.select(
        F.col(id_col),
        "n_grams",
        "n_distinct",
        "top_count",
        flagged.cast("int").cast("long").alias("flagged"),
    )


def _chunk_doc_counts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str,
    words_per_chunk: int,
) -> DataFrame:
    """Per-(group, doc, chunk-hash) occurrence/token counts over
    NON-overlapping word windows — the shared first stage of the
    boilerplate ops below.  Chunking reuses the retrieval tier's
    tokenizer (contamination.text_chunks, overlap=0) so one chunking
    convention serves dedup, contamination, and hygiene; only the
    16-byte-equivalent md5 hex of each chunk crosses the exchange,
    never chunk text.  One shuffle, map-side combine."""
    from telemetry_streaming_spark.operators.contamination import text_chunks

    ch = text_chunks(
        df,
        text_col=text_col,
        id_col=id_col,
        chunk_tokens=words_per_chunk,
        overlap=0,
        keep_cols=(group_col,),
    )
    return ch.groupBy(group_col, id_col, F.md5(F.col("chunk")).alias("h")).agg(
        F.count(F.lit(1)).alias("occ"),
        F.sum("n_tokens").alias("toks"),
    )


def chunk_boilerplate_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    words_per_chunk: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """C4-style within-source boilerplate detection, per-document
    stats (Raffel et al. 2020 §2.2 drop lines occurring in >= 3 docs;
    RefinedWeb's line-wise filter is the same rule).  A chunk is
    boilerplate within its group (source / domain) when it appears in
    at least ``min_docs`` DISTINCT documents of that group —
    navigation chrome, footers, templated headers.

    Returns (id, n_chunks, n_boiler, kept_tokens), all exact BIGINTs:
    ``n_boiler`` counts occurrences of boilerplate chunks (all
    occurrences are removable), ``kept_tokens`` the token mass that
    survives removal.

    Plan (scales to 100TB): chunk+hash map-side, then three count-
    grain exchanges — (group, doc, hash) occurrence counts [the
    distinct-docs-per-chunk prerequisite], (group, hash) doc
    frequency [small: |groups| x |chunk vocab|], and the join-back +
    per-doc fold.  Raw chunk text never crosses an exchange.  The
    frequency side joins on (group, hash), so a hot template line in
    ONE source cannot skew a global key."""
    per_doc = _chunk_doc_counts(df, text_col, id_col, group_col, words_per_chunk)
    freq = per_doc.groupBy(group_col, "h").agg(F.count(F.lit(1)).alias("n_docs"))
    boiler = F.col("n_docs") >= F.lit(min_docs)
    return (
        per_doc.join(freq, [group_col, "h"])
        .groupBy(id_col)
        .agg(
            F.sum("occ").alias("n_chunks"),
            F.sum(F.when(boiler, F.col("occ")).otherwise(F.lit(0))).alias("n_boiler"),
            F.sum(F.when(boiler, F.lit(0)).otherwise(F.col("toks"))).alias(
                "kept_tokens"
            ),
        )
    )


def remove_boilerplate_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    words_per_chunk: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """The APPLY step of :func:`chunk_boilerplate_stats`: rebuild each
    document from its non-boilerplate chunks, in original order.

    Returns (id, group, clean_text, n_kept) — documents whose every
    chunk is boilerplate survive with ``clean_text = ''`` (the caller
    length-filters; silently dropping rows would break joins keyed on
    the corpus).  The rebuild is whitespace-normalized (chunks re-join
    on single spaces), same contract as the dedup tier's normalized
    text.  The per-doc collect_list is bounded by document size — the
    same bound the chunker itself already assumes."""
    from telemetry_streaming_spark.operators.contamination import text_chunks

    ch = text_chunks(
        df,
        text_col=text_col,
        id_col=id_col,
        chunk_tokens=words_per_chunk,
        overlap=0,
        keep_cols=(group_col,),
    )
    per_doc = _chunk_doc_counts(df, text_col, id_col, group_col, words_per_chunk)
    boiler = (
        per_doc.groupBy(group_col, "h")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= F.lit(min_docs))
        .select(group_col, "h")
    )
    kept = ch.withColumn("h", F.md5(F.col("chunk"))).join(
        boiler, [group_col, "h"], "left_anti"
    )
    rebuilt = kept.groupBy(id_col, group_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    all_docs = df.where(F.col(text_col).rlike(r"\S")).select(id_col, group_col)
    return all_docs.join(rebuilt, [id_col, group_col], "left").select(
        id_col,
        group_col,
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias("n_kept"),
    )
