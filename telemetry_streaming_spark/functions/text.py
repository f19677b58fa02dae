"""Text-analysis column library for large-scale training-data pipelines.

Everything here is a pure Column expression (JVM-side, whole-stage
codegen) — no Python UDFs on the hot path.  Designed to run over a
100TB ``documents`` corpus: per-row maps with no shuffle; aggregations
are standard partial+final hash-aggs.

Cross-engine determinism: hashes are md5-hex (identical in DuckDB /
Spark / Python), never engine-native ``hash()``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Tiny per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic.  Real pipelines would plug fastText or CLD3
# in via mapInPandas; the heuristic keeps the operator dependency-free
# and oracle-checkable.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "los"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une"),
    "de": ("der", "die", "und", "das", "nicht", "ist", "ein", "zu"),
    "zh": ("的", "是", "不", "了", "在", "人", "有", "我"),
}


def tokenize(text: Column) -> Column:
    """Whitespace tokenization (split on runs of whitespace)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokenize(text))


def char_count(text: Column) -> Column:
    return F.length(text)


def avg_token_len(text: Column) -> Column:
    """Mean token length as one IEEE division (deterministic).

    Total token chars == non-whitespace chars of the trimmed text —
    a codegen'd scalar expression; the F.aggregate(tokens, +length)
    equivalent runs as an interpreted higher-order function.
    ``try_divide``: a degenerate doc yields NULL instead of an ANSI
    DIVIDE_BY_ZERO that would kill a 100TB job on one bad row —
    matching DuckDB, whose double division by zero is NULL, so the
    oracle contract is unchanged."""
    total = F.length(F.regexp_replace(F.trim(text), r"\s+", ""))
    return F.try_divide(total.cast("double"), F.size(tokenize(text)))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not [A-Za-z0-9 ].  NULL for an
    empty doc (``try_divide`` — see avg_token_len): one empty string
    in a corpus must not abort the job under ANSI mode, and NULL
    propagates into quality gates as "drop", which is the right
    curation outcome for an empty document."""
    stripped = F.regexp_replace(text, "[A-Za-z0-9 ]", "")
    return F.try_divide(F.length(stripped).cast("double"), F.length(text))


def stopword_hits(text: Column, lang: str) -> Column:
    """Number of tokens that are markers for ``lang``.

    Counted with a whole-token regexp (lookaround-bounded alternation)
    — a codegen'd scalar scan, verified bit-identical to the
    tokenize-then-filter formulation, which runs as an interpreted
    higher-order function ~1.6x slower."""
    import re as _re

    alts = "|".join(_re.escape(m) for m in LANG_MARKERS[lang])
    return F.regexp_count(F.lower(text), F.lit(rf"(?<=^|\s)(?:{alts})(?=\s|$)"))


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax of marker-token hits, 'und' when
    no marker appears.  Ties break by language-code order (stable
    across engines)."""
    hits = {code: stopword_hits(text, code) for code in sorted(LANG_MARKERS)}
    best = F.greatest(*hits.values())
    pred = F.lit("und")
    # build reverse so the first (lowest) code wins ties via the
    # cascade order of when()
    for code in sorted(LANG_MARKERS, reverse=True):
        pred = F.when(hits[code] == best, F.lit(code)).otherwise(pred)
    return F.when(best > 0, pred).otherwise(F.lit("und"))


def quality_score(text: Column) -> Column:
    """Length/structure quality heuristic in [0,1]:
    0.5 * min(1, tokens/100) + 0.3 * (1 - punct_ratio) +
    0.2 * min(1, avg_token_len/8).  All one IEEE expression."""
    toks = token_count(text).cast("double")
    return (
        F.lit(0.5) * F.least(F.lit(1.0), toks / F.lit(100.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio(text))
        + F.lit(0.2) * F.least(F.lit(1.0), avg_token_len(text) / F.lit(8.0))
    )


# Fixed weights of a trained linear quality classifier (offline
# logistic regression over the three structure features; the model is
# frozen here as literals — the deployment pattern for any linear /
# logistic scorer at 100TB is exactly this: weights ride the plan,
# scoring is a map-only codegen'd expression, no model server, no UDF).
QUALITY_LOGIT_WEIGHTS = (-1.5, 2.0, -4.0, 0.35)  # bias, len, punct, tok_len


def quality_features(text: Column) -> tuple[Column, Column, Column]:
    """The quality classifier's three structure features — THE single
    definition: ``quality_logit`` applies weights to exactly these, and
    the trainer (``operators/regression.py:fit_quality_logit``) and its
    sufficient-statistics oracle query fit exactly these, so retuning a
    feature here retrains and redeploys consistently everywhere."""
    f1 = F.least(F.lit(1.0), token_count(text).cast("double") / F.lit(100.0))
    f2 = punct_ratio(text)
    f3 = F.least(F.lit(1.0), avg_token_len(text) / F.lit(8.0))
    return f1, f2, f3


def quality_logit(
    text: Column, weights: tuple[float, float, float, float] = QUALITY_LOGIT_WEIGHTS
) -> Column:
    """Linear classifier logit over (length, punctuation, token-length)
    features.  Kept as the LOGIT, not sigmoid(logit): the decision
    boundary (logit > 0) and ranking are identical, and +, *, / are
    IEEE-exact in a fixed association order while exp() is not
    correctly rounded — so the logit is engine-portable where the
    probability would drift in the last ulp.  Association order is
    ((bias + w1*f1) + w2*f2) + w3*f3, mirrored in the SQL oracle.

    ``weights`` defaults to the frozen offline model; pass the output
    of ``operators/regression.py:fit_quality_logit`` to deploy a
    freshly trained model — still a map-only codegen'd expression."""
    w0, w1, w2, w3 = weights
    f1, f2, f3 = quality_features(text)
    return (
        (F.lit(w0) + F.lit(w1) * f1) + F.lit(w2) * f2
    ) + F.lit(w3) * f3


# BPE-ish tokenizer: a GPT-2-style pretokenization regex (contraction
# suffixes, letter runs, digit runs, punctuation runs, each with an
# optional leading space).  Token *counts* from this pattern track BPE
# vocabulary tokenizers closely enough for corpus cost estimation,
# and the pattern stays inside the common Java-regex/RE2 subset so the
# DuckDB oracle runs the identical expression.  (A real tokenizer —
# tiktoken et al. — would plug in via mapInPandas; this keeps the
# operator dependency-free and engine-portable.)
BPE_TOKEN_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|'"


def bpe_token_count(text: Column) -> Column:
    """Number of BPE-ish pretokens (see BPE_TOKEN_PATTERN) — a single
    codegen'd regexp scan, no array materialization."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_PATTERN))


# PII patterns, restricted to the Java-regex ∩ RE2 common subset
# (character classes, bounded repetition, non-capturing groups, \b)
# so Spark and the DuckDB oracle compile the identical pattern.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b"
IPV4_PATTERN = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"


def count_emails(text: Column) -> Column:
    return F.regexp_count(text, F.lit(EMAIL_PATTERN))


def count_phones(text: Column) -> Column:
    return F.regexp_count(text, F.lit(PHONE_PATTERN))


def count_ipv4(text: Column) -> Column:
    return F.regexp_count(text, F.lit(IPV4_PATTERN))


def redact_pii(text: Column) -> Column:
    """Replace emails / phone numbers / IPv4 literals with typed
    placeholder tags.  Order matters: emails first (their local parts
    can contain digit runs a later pattern would mangle), then IPs
    (dotted digits would otherwise half-match the phone pattern), then
    phones.  Three chained codegen'd regexp_replace scans — the same
    per-row cost profile as any other column map, no UDFs."""
    out = F.regexp_replace(text, EMAIL_PATTERN, "[EMAIL]")
    out = F.regexp_replace(out, IPV4_PATTERN, "[IP]")
    return F.regexp_replace(out, PHONE_PATTERN, "[PHONE]")


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, strip non-alnum,
    collapse whitespace."""
    return F.trim(F.regexp_replace(F.regexp_replace(F.lower(text), "[^a-z0-9 ]", " "), " +", " "))


def fingerprint(text: Column) -> Column:
    """Document fingerprint = md5 of the normalized text (exact-dup
    key; engine-portable)."""
    return F.md5(normalize_text(text))


