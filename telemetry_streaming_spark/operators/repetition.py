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
