"""Hypothesis fuzz for the round-5 operators: BPE training, bigram-LM
scoring, and the streaming-span island merge — each compared against a
naive pure-python reference on adversarially small vocabularies (dense
collisions, repeated words, degenerate docs)."""

import math
import random
import re
from collections import Counter

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


@pytest.fixture(scope="module")
def sess(spark):
    return spark


def _rand_corpus(seed, n_docs, vocab, max_len):
    rng = random.Random(seed)
    syms = [chr(ord("a") + i) for i in range(vocab)]
    docs = {}
    for i in range(n_docs):
        n = rng.randint(0, max_len)
        docs[i] = " ".join(
            "".join(rng.choice(syms) for _ in range(rng.randint(1, 4)))
            for _ in range(n)
        )
    return docs


# --- BPE replica (same as test_tokenizer, kept independent) ---------------


def _py_apply(syms, a, b):
    out = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def _py_train(texts, n_merges, min_pair_count=2):
    vocab = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.strip().lower()):
            if len(w) >= 2:
                vocab[w] += 1
    state = {w: (list(w), c) for w, c in vocab.items()}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for syms, c in state.values():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append((a, b, cnt))
        state = {w: (_py_apply(s, a, b), c) for w, (s, c) in state.items()}
    return merges


@given(seed=st.integers(min_value=0, max_value=10_000))
@settings(max_examples=6, deadline=None)
@pytest.mark.full  # r11: >=5s; fast-tier siblings cover this surface
def test_bpe_train_matches_replica_fuzz(sess, seed):
    """Tiny alphabets force dense pair collisions and tie-breaks."""
    from telemetry_streaming_spark.operators.tokenizer import train_bpe

    docs = _rand_corpus(seed, n_docs=8, vocab=3, max_len=12)
    df = sess.createDataFrame(list(docs.items()), "doc_id long, text string")
    assert train_bpe(df, n_merges=5) == _py_train(docs.values(), 5)


# --- bigram LM replica ------------------------------------------------------


def _py_bigrams(text):
    toks = re.split(r"\s+", text.strip().lower()) if text and text.strip() else []
    return list(zip(toks, toks[1:]))


def _py_lm_score(texts_by_id, lm_texts, alpha=1.0):
    c2, c1 = Counter(), Counter()
    for t in lm_texts:
        c2.update(_py_bigrams(t))
    for (w1, _), c in c2.items():
        c1[w1] += c
    v = len(c1)
    out = {}
    for i, t in texts_by_id.items():
        bgs = _py_bigrams(t)
        if not bgs:
            continue
        nlp = [
            math.log(c1.get(w1, 0) + alpha * v)
            - math.log(c2.get((w1, w2), 0) + alpha)
            for w1, w2 in bgs
        ]
        out[i] = (len(bgs), sum(nlp) / len(nlp))
    return out


@given(seed=st.integers(min_value=0, max_value=10_000))
@settings(max_examples=6, deadline=None)
@pytest.mark.full  # r11: >=5s; fast-tier siblings cover this surface
def test_bigram_lm_cross_corpus_matches_replica_fuzz(sess, seed):
    """Random LM corpus vs random probe corpus: batch join tier and
    stateless probe tier must both match the replica (and so each
    other), unseen grams included."""
    from telemetry_streaming_spark.operators.lm import (
        bigram_lm_score,
        bigram_lm_score_stream,
    )

    lm_docs = _rand_corpus(seed, n_docs=6, vocab=3, max_len=10)
    probe_docs = _rand_corpus(seed + 77, n_docs=6, vocab=4, max_len=10)
    lm = sess.createDataFrame(list(lm_docs.items()), "doc_id long, text string")
    probe = sess.createDataFrame(
        list(probe_docs.items()), "doc_id long, text string"
    )
    want = _py_lm_score(probe_docs, lm_docs.values())
    if not any(_py_bigrams(t) for t in lm_docs.values()):
        return  # degenerate empty LM: scores are -inf by definition
    got_b = {
        r.doc_id: (r.n_bigrams, r.avg_neg_logprob)
        for r in bigram_lm_score(probe, lm_docs=lm).collect()
    }
    got_s = {
        r.doc_id: (r.n_bigrams, r.avg_neg_logprob)
        for r in bigram_lm_score_stream(probe, lm).collect()
        if r.n_bigrams is not None
    }
    assert set(got_b) == set(want) and set(got_s) == set(want)
    for k in want:
        assert got_b[k][0] == want[k][0] and got_s[k][0] == want[k][0]
        assert got_b[k][1] == pytest.approx(want[k][1], rel=1e-12)
        assert got_s[k][1] == pytest.approx(want[k][1], rel=1e-12)


# --- streaming-span island merge (the array-expression fold) ---------------


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n=st.integers(min_value=2, max_value=4),
)
@settings(max_examples=6, deadline=None)
def test_span_island_merge_matches_replica_fuzz(sess, seed, n):
    """The fold that merges duplicated-window positions into maximal
    spans (streaming_duplicated_spans' array expression) must equal
    the naive interval-union reference for ANY kept/dup split."""
    from telemetry_streaming_spark.operators.contamination import (
        duplicated_spans,
    )

    rng = random.Random(seed)
    syms = ["a", "b"]
    docs = {
        i: " ".join(rng.choice(syms) for _ in range(rng.randint(0, 15)))
        for i in range(6)
    }
    df = sess.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(df, n=n, min_count=2).collect()
    )

    # replica: positions of windows occurring >= 2 corpus-wide, merged
    wins = Counter()
    per_doc = {}
    for i, t in docs.items():
        toks = re.split(r"\s+", t.strip()) if t.strip() else []
        ps = []
        for p in range(len(toks) - n + 1):
            g = " ".join(toks[p : p + n])
            wins[g] += 1
            ps.append((p + 1, g))
        per_doc[i] = ps
    want = []
    for i, ps in per_doc.items():
        dup = [p for p, g in ps if wins[g] >= 2]
        start = end = None
        for p in sorted(dup):
            if start is None:
                start, end = p, p + n - 1
            elif p <= end + 1:
                end = p + n - 1
            else:
                want.append((i, start, end))
                start, end = p, p + n - 1
        if start is not None:
            want.append((i, start, end))
    assert got == sorted(want)


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    budget=st.integers(min_value=1, max_value=60),
)
@settings(max_examples=6, deadline=None)
def test_per_group_budget_matches_naive_reference_fuzz(sess, seed, budget):
    """The 256-way bucketed two-level prefix sum must keep EXACTLY the
    rows a naive per-group md5-ordered cumulative sum keeps, for any
    budget and any weight mix (zeros, boundary hits, huge rows)."""
    import hashlib

    from telemetry_streaming_spark.operators.sampling import per_group_budget

    rng = random.Random(seed)
    rows = []
    for g in ("a", "b", None):
        for i in range(rng.randint(0, 25)):
            key = g if g else "n"
            rows.append((f"{key}{i}", g, rng.choice([0, 1, 2, 7, 40])))
    df = sess.createDataFrame(rows, "k string, g string, w long")
    got = {
        r.k for r in per_group_budget(df, "g", "k", "w", budget=budget).collect()
    }
    want = set()
    by_g = {}
    for k, g, w in rows:
        by_g.setdefault(g, []).append((hashlib.md5(k.encode()).hexdigest(), k, w))
    for g, items in by_g.items():
        cum = 0
        for _, k, w in sorted(items):
            if cum < budget:
                want.add(k)
            cum += w
    assert got == want


def test_null_text_docs_parity_for_budget_and_drift(sess, tmp_path):
    """Third-review pin: NULL-text documents must not diverge the
    engines — token_budget_sample once kept a NULL row (coalesced
    weight 0) that the oracle's NULL comparison dropped, and ks_drift
    once counted NULL-bucket docs in totals but never in CDFs.  Both
    now exclude NULL-text docs explicitly, in BOTH engines."""
    import duckdb

    from telemetry_streaming_spark.plans.queries import QUERIES
    from tests.oracle_harness import compare_query

    rows = [
        (1, "alpha beta gamma delta", "a"),
        (2, None, "a"),
        (3, "one two three four five six", "a"),
        (4, "x " * 30, "b"),
        (5, None, "b"),
        (6, "y z " * 10, "b"),
    ]
    d = str(tmp_path / "sf_null")
    import os

    import pandas as pd

    os.makedirs(d)
    # single parquet FILE (not a Spark part-dir): DuckDB's
    # read_parquet in the harness expects the testdata layout
    pd.DataFrame(rows, columns=["doc_id", "text", "source"]).to_parquet(
        os.path.join(d, "documents.parquet")
    )
    duck = duckdb.connect()
    for name in ("token_budget_sample", "ks_drift"):
        spec = QUERIES[name]
        compare_query(sess, duck, name, spec.fn, spec.oracle, d)
