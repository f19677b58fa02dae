"""Distributed BPE tokenizer training — trainer-in-the-loop.

The third trainer in the family (after the reference-mirroring RProp
optimizer, A7, and the r5 logistic IRLS fit): the cluster computes an
aggregate-sized statistic per iteration — here the corpus-weighted
adjacent-symbol-pair counts — the driver takes a bounded decision (the
single most frequent pair), and the decision rides back into the next
pass as plan literals.  Mirrors the reference's
FederatedLearningSearchOptimizerS3Sink.scala:37-77 loop structure.

The scale move is VOCAB-FIRST (same as ``plans/queries.py:
bpe_pair_stats``): the corpus collapses to its distinct words with
counts in ONE shuffle, and every merge iteration runs over vocabulary
rows (~1e5-1e7 at any corpus size), never re-scanning the corpus.
Every per-iteration aggregate is exact-integer, the driver holds one
row per iteration, and the evolving symbol arrays stay cluster-side
(``localCheckpoint`` per iteration keeps the plan flat instead of
stacking K fold expressions).

Standard BPE semantics (Sennrich et al. 2016): pair counts are
adjacent symbol positions (overlaps counted) weighted by word
frequency; the merge applies left-to-right greedily within each word;
ties break lexicographically for a deterministic merge list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over lowercased whitespace tokens — the one
    corpus-wide shuffle; everything after runs over the vocabulary.
    Explicit whitespace-set trim (not F.trim, which strips only
    spaces): a tab/newline-edged doc must not contribute an
    empty-string token — matching the python replica's .strip() and
    lm.py's trim discipline."""
    words = df.select(
        F.explode(
            F.split(
                F.expr(rf"trim(BOTH ' \t\r\n' FROM lower({text_col}))"), r"\s+"
            )
        ).alias("w")
    ).where(F.length("w") >= 2)
    return words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))


def _pair_counts(vocab_syms: DataFrame) -> DataFrame:
    """Corpus-weighted adjacent-pair counts over the current symbol
    arrays: explode positions, never strings (the pair is built from
    the carried array with codegen'd element_at)."""
    e = vocab_syms.select(
        "c",
        F.col("syms").alias("__s"),
        F.explode(
            F.when(
                F.size("syms") >= 2, F.sequence(F.lit(1), F.size("syms") - 1)
            ).otherwise(F.array().cast("array<int>"))
        ).alias("i"),
    )
    return (
        e.select(
            F.element_at("__s", F.col("i")).alias("a"),
            F.element_at("__s", F.col("i") + 1).alias("b"),
            "c",
        )
        .groupBy("a", "b")
        .agg(F.sum("c").cast("long").alias("cnt"))
    )


def _apply_merge(syms, a: str, b: str):
    """Greedy left-to-right merge of adjacent (a, b) into a+b, as a
    JVM-side fold — no per-row Python.  Leftmost-first: in 'aaa' with
    merge (a,a), the fold merges positions 1-2 and leaves position 3,
    exactly the sequential re-scan semantics."""
    merged = F.lit(a + b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn the first ``n_merges`` BPE merges over the corpus.

    Returns [(left, right, corpus_count), ...] in merge order —
    deterministic: each iteration picks the max-count pair with the
    (count DESC, left ASC, right ASC) tie-break, and stops early when
    the best pair's count falls below ``min_pair_count`` (merging a
    once-seen pair can never help a tokenizer).

    Per iteration: one vocabulary-sized aggregate down to a 1-row
    driver collect (TakeOrdered, no global sort), one fold-map over the
    vocabulary, one ``localCheckpoint`` to keep the plan flat.  The
    corpus is scanned exactly once, by :func:`word_vocab`.
    """
    vocab = word_vocab(docs, text_col).select(
        F.split("w", "").alias("syms"), "c"
    )
    vocab = vocab.localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(n_merges):
            top = (
                _pair_counts(vocab)
                .orderBy(F.col("cnt").desc(), "a", "b")
                .limit(1)
                .collect()
            )
            if not top or top[0]["cnt"] < min_pair_count:
                break
            a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
            merges.append((a, b, cnt))
            nxt = vocab.select(
                _apply_merge(F.col("syms"), a, b).alias("syms"), "c"
            ).localCheckpoint(eager=True)
            vocab.unpersist()
            vocab = nxt
    finally:
        vocab.unpersist()
    return merges


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list: per word, chars
    fold through each merge in order — K stacked JVM folds over word
    arrays, a pure map (no shuffle, no Python).  Intended for bounded
    K (the trained merge list); for production-sized merge tables the
    lever is a broadcast trie + mapInPandas, stated not hidden."""
    toks = F.split(
        F.expr(rf"trim(BOTH ' \t\r\n' FROM lower({text_col}))"), r"\s+"
    )
    word_syms = lambda w: F.split(w, "")  # noqa: E731
    def merged_word(w):
        syms = word_syms(w)
        for m in merges:
            a, b = m[0], m[1]
            syms = _apply_merge(syms, a, b)
        return syms

    return df.withColumn(
        out_col,
        F.flatten(F.transform(toks, lambda w: merged_word(w))),
    )
