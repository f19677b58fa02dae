"""End-to-end training-data curation pipeline.

Composes the engine's quality / dedup / compliance / split operators
into the standard corpus-curation funnel, in the order a 100TB run
wants them:

1. **length + quality gate** — cheapest per-row predicates first, so
   everything downstream sees fewer rows;
2. **language filter** — keep target languages (column-expression
   heuristic; a model-based ID would slot in via mapInPandas);
3. **repetition filter** — drop Gopher-flagged boilerplate (two narrow
   count shuffles);
4. **exact dedup** — keep the minimum doc_id per fingerprint (one
   shuffle on the md5 key; near-dup tiers are run separately and fed
   back in as an id-list when wanted);
5. **PII redaction** — rewrite the surviving text (pure column map);
6. **train/eval split** — hash-deterministic tag, stable across runs.

Every stage is a DataFrame -> DataFrame function of its own module;
this file only sequences them and keeps per-stage row counts
observable.  Filters are staged most-selective-per-dollar first, and
nothing here adds a shuffle beyond what the member operators already
do: the whole funnel is 3 narrow shuffles (repetition x2, dedup x1)
plus pure column maps.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from telemetry_streaming_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    redact_pii,
    token_count,
)
from telemetry_streaming_spark.operators.repetition import repetition_flags
from telemetry_streaming_spark.operators.sampling import train_eval_split


@dataclass(frozen=True)
class CurationConfig:
    min_tokens: int = 10
    max_tokens: int = 100_000
    min_quality: float = 0.5
    keep_langs: tuple[str, ...] = ("en",)
    repetition_n: int = 2
    max_dup_frac: float = 0.75
    max_top_frac: float = 0.10
    eval_rate: float = 0.05
    # optional corpus-hygiene stages (default off — the oracle-checked
    # default funnel is unchanged): chunk-level dedup rewrite width
    chunk_dedup_words: int | None = None
    contamination_n: int = 4


def curate(
    df: DataFrame,
    config: CurationConfig = CurationConfig(),
    text_col: str = "text",
    id_col: str = "doc_id",
    near_dup_pairs: DataFrame | None = None,
    benchmark: DataFrame | None = None,
) -> DataFrame:
    """Run the full funnel; returns the curated corpus with
    ``split`` and ``redacted`` columns added.

    Optional hygiene stages (both default off): ``benchmark`` drops
    documents sharing any ``config.contamination_n``-gram with the
    given eval set (test-set decontamination, after dedup so the gram
    join sees the smallest corpus); ``config.chunk_dedup_words``
    rewrites survivors with globally repeated chunks removed and
    re-applies the min-token gate to docs the rewrite emptied.

    The repetition join carries *flagged ids only*; no hard broadcast
    hint — boilerplate is usually the exception, but on web-scale
    corpora it can be a double-digit fraction of documents, so the
    join strategy is left to autoBroadcastJoinThreshold / AQE
    (broadcast while the flagged set is small, shuffle when not).
    Exact dedup keeps min(id) per fingerprint with a window on the
    fingerprint — ONE shuffle, and no corpus-sized keeper set is ever
    broadcast or joined back.

    ``near_dup_pairs`` (optional, columns id1/id2 — the output of any
    dedup tier) extends the exact-dedup stage to NEAR-dup collapse:
    pairs are resolved to clusters with connected components and every
    non-representative member is dropped, so A~B~C keeps only min(A,B,
    C) even when A~C was never scored.  The drop set is one id column
    (anti-join), never the pair graph."""
    c = F.col(text_col)
    gated = df.where(
        (token_count(c) >= config.min_tokens)
        & (token_count(c) <= config.max_tokens)
        & (quality_score(c) >= config.min_quality)
        & (lang_id(c).isin(*config.keep_langs))
    )
    flagged = (
        repetition_flags(
            gated, text_col, id_col, config.repetition_n,
            config.max_dup_frac, config.max_top_frac,
        )
        .where(F.col("flagged") == 1)
        .select(id_col)
    )
    clean = gated.join(flagged, id_col, "left_anti")
    from pyspark.sql import Window

    fp_w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
    deduped = (
        clean.withColumn("__fp", fingerprint(c))
        .withColumn("__rn", F.row_number().over(fp_w))
        .where(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )
    if near_dup_pairs is not None:
        from telemetry_streaming_spark.operators.components import connected_components

        losers = connected_components(near_dup_pairs).select(
            F.col("id").alias(id_col)
        )
        deduped = deduped.join(losers, id_col, "left_anti")
    if benchmark is not None:
        from telemetry_streaming_spark.operators.contamination import decontaminate

        deduped = decontaminate(
            deduped, benchmark, text_col, id_col, config.contamination_n
        )
    if config.chunk_dedup_words:
        from telemetry_streaming_spark.operators.contamination import chunk_dedup_apply

        # length(text) > 0 guard in addition to the token re-gate:
        # split('') yields [''] so token_count('') == 1, and a doc the
        # rewrite fully emptied would pass min_tokens=1 (run_hygiene
        # applies the same pair of predicates)
        deduped = chunk_dedup_apply(
            deduped, text_col, id_col, config.chunk_dedup_words
        ).where((F.length(c) > 0) & (token_count(c) >= config.min_tokens))
    redacted = deduped.withColumn("redacted", redact_pii(c))
    return train_eval_split(redacted, id_col, eval_rate=config.eval_rate)


def repetition_stats_expr(text_col: str = "text", n: int = 2):
    """Per-row repetition stats as a single column expression —
    struct(n_grams, n_distinct, top_count).

    The batch tier (operators/repetition.py) computes these with two
    narrow shuffles, the right shape for a corpus-wide pass.  A
    *streaming* pipeline wants them stateless — per row, no shuffle,
    no state store — so this version builds the gram array in-row and
    finds the longest run of the sorted array with an ``aggregate``
    fold.  Higher-order functions run interpreted, but the fold is
    O(grams) per row on a map stage — acceptable for a per-document
    expression, unlike the O(pairs) folds the dedup tiers avoid.
    Verified against the batch operator in tests (identical stats on
    the same rows).
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(n)]
    )
    grams = F.when(F.size(toks) >= n, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )
    srt = F.array_sort(grams)
    run_state = F.aggregate(
        srt,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda s, g: F.struct(
            g.alias("prev"),
            F.when(g.eqNullSafe(s.prev), s.run + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                s.best,
                F.when(g.eqNullSafe(s.prev), s.run + 1).otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
    )
    return F.struct(
        F.size(grams).cast("long").alias("n_grams"),
        F.size(F.array_distinct(grams)).cast("long").alias("n_distinct"),
        run_state.best.alias("top_count"),
    )


def curate_stream(
    df: DataFrame,
    config: CurationConfig = CurationConfig(),
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "timestamp",
    watermark: str = "10 minutes",
    benchmark: DataFrame | None = None,
) -> DataFrame:
    """Streaming variant of :func:`curate` — the same funnel on an
    unbounded stream.

    Stage mapping vs batch:
    - quality / language / repetition gates become stateless per-row
      predicates (``repetition_stats_expr``) — no shuffle, no state;
    - exact dedup becomes ``dropDuplicatesWithinWatermark`` on the
      fingerprint: state is O(fingerprints per watermark window), and
      the survivor is the FIRST arrival rather than the batch tier's
      min-id (the id is not known until the horizon closes — callers
      that need min-id semantics run the batch dedup over the sink);
    - redaction and split are the identical stateless expressions.
    """
    c = F.col(text_col)
    stats = repetition_stats_expr(text_col, config.repetition_n)
    gated = (
        df.where(
            (token_count(c) >= config.min_tokens)
            & (token_count(c) <= config.max_tokens)
            & (quality_score(c) >= config.min_quality)
            & (lang_id(c).isin(*config.keep_langs))
        )
        .withColumn("_rep", stats)
        .where(
            ~(
                ((F.col("_rep.n_grams") - F.col("_rep.n_distinct")) * 100
                 >= F.lit(int(config.max_dup_frac * 100)) * F.col("_rep.n_grams"))
                | (F.col("_rep.top_count") * 100
                   >= F.lit(int(config.max_top_frac * 100)) * F.col("_rep.n_grams"))
            )
        )
        .drop("_rep")
    )
    deduped = (
        gated.withColumn("fp", fingerprint(c))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )
    if benchmark is not None:
        from telemetry_streaming_spark.operators.contamination import (
            decontaminate_stream,
        )

        # the stateless Arrow-batched probe — the join-based batch
        # tier would add a stateful stream-side aggregation here
        deduped = decontaminate_stream(
            deduped, benchmark, text_col, id_col, config.contamination_n
        )
    # chunk-level dedup is deliberately NOT offered on the stream
    # path: rewriting documents against global chunk state is not
    # expressible in append mode — run streaming_chunk_dedup on the
    # chunk stream, or the batch rewrite over the sink.
    redacted = deduped.withColumn("redacted", redact_pii(c))
    return train_eval_split(redacted, id_col, eval_rate=config.eval_rate)


def funnel_counts(
    df: DataFrame,
    config: CurationConfig = CurationConfig(),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Stage-by-stage survivor counts — the number a curation run
    reports while it executes.  One row per stage, exact BIGINTs."""
    c = F.col(text_col)
    gated = df.where(
        (token_count(c) >= config.min_tokens)
        & (token_count(c) <= config.max_tokens)
        & (quality_score(c) >= config.min_quality)
    )
    lang_kept = gated.where(lang_id(c).isin(*config.keep_langs))
    flagged = (
        repetition_flags(
            lang_kept, text_col, id_col, config.repetition_n,
            config.max_dup_frac, config.max_top_frac,
        )
        .where(F.col("flagged") == 1)
        .select(id_col)
    )
    unflagged = lang_kept.join(flagged, id_col, "left_anti")
    deduped = (
        unflagged.select(fingerprint(c).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
    )
    split = train_eval_split(deduped, id_col, eval_rate=config.eval_rate)
    stages = [
        ("0_input", df.select(F.count(F.lit(1)))),
        ("1_quality_gate", gated.select(F.count(F.lit(1)))),
        ("2_lang_filter", lang_kept.select(F.count(F.lit(1)))),
        ("3_repetition_filter", unflagged.select(F.count(F.lit(1)))),
        ("4_exact_dedup", deduped.select(F.count(F.lit(1)))),
        ("5_eval_holdout", split.where(F.col("split") == "eval").select(F.count(F.lit(1)))),
    ]
    out = None
    for name, cnt in stages:
        row = cnt.select(F.lit(name).alias("stage"), F.col("count(1)").cast("long").alias("n_docs"))
        out = row if out is None else out.unionByName(row)
    return out
