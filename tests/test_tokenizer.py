"""Distributed BPE training (operators/tokenizer.py).

Pin: the Spark trainer-in-the-loop must produce the IDENTICAL merge
list as an independent pure-python BPE on the same corpus (same
Sennrich-style semantics: adjacent-position pair counts weighted by
word frequency, greedy leftmost application, (count DESC, pair ASC)
tie-break), and ``apply_bpe`` must tokenize exactly as the replica.
"""

import re
from collections import Counter

from pyspark.sql import functions as F

from telemetry_streaming_spark.operators.tokenizer import (
    apply_bpe,
    train_bpe,
    word_vocab,
)


def _py_vocab(texts):
    c = Counter()
    for t in texts:
        if t is None:
            continue
        for w in re.split(r"\s+", t.strip().lower()):
            if len(w) >= 2:
                c[w] += 1
    return c


def _py_apply(syms, a, b):
    out = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def _py_train(texts, n_merges, min_pair_count=2):
    vocab = {w: (list(w), c) for w, c in _py_vocab(texts).items()}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for syms, c in vocab.values():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append((a, b, cnt))
        vocab = {w: (_py_apply(s, a, b), c) for w, (s, c) in vocab.items()}
    return merges


TOY = [
    "low lower lowest low low",
    "new newer newest new",
    "wider wide wide widest",
    None,
    "   ",
    "low newer wide",
]


class TestTrainBpe:
    def test_matches_python_replica_on_toy_corpus(self, spark):
        docs = spark.createDataFrame([(t,) for t in TOY], "text string")
        got = train_bpe(docs, n_merges=8)
        want = _py_train(TOY, n_merges=8)
        assert got == want
        assert len(got) == 8  # toy corpus has at least 8 productive merges

    def test_matches_python_replica_on_real_documents(self, spark):
        sf = "/root/testdata/sf0.001"
        docs = spark.read.parquet(f"{sf}/documents.parquet").select("text")
        texts = [r.text for r in docs.collect()]
        got = train_bpe(docs, n_merges=6)
        want = _py_train(texts, n_merges=6)
        assert got == want

    def test_early_stop_on_min_pair_count(self, spark):
        # every word distinct chars, each pair appears exactly once
        docs = spark.createDataFrame([("ab cd ef",)], "text string")
        got = train_bpe(docs, n_merges=5, min_pair_count=2)
        assert got == []

    def test_vocab_is_the_only_corpus_scan(self, spark):
        """word_vocab output drives everything: one (word, count) row
        per distinct word, counts exact."""
        docs = spark.createDataFrame([(t,) for t in TOY], "text string")
        got = {r.w: r.c for r in word_vocab(docs).collect()}
        assert got == dict(_py_vocab(TOY))


class TestApplyBpe:
    def test_tokenization_matches_replica(self, spark):
        docs = spark.createDataFrame([(t,) for t in TOY if t], "text string")
        merges = train_bpe(docs, n_merges=6)
        out = {
            r.text: r.bpe_tokens
            for r in apply_bpe(docs, merges).select("text", "bpe_tokens").collect()
        }
        for t in (t for t in TOY if t and t.strip()):
            want = []
            for w in re.split(r"\s+", t.strip().lower()):
                syms = list(w)
                for a, b, _ in merges:
                    syms = _py_apply(syms, a, b)
                want.extend(syms)
            assert out[t] == want, t

    def test_no_shuffle_pure_map(self, spark):
        import contextlib
        import io

        docs = spark.createDataFrame([("low lower",)], "text string")
        plan = apply_bpe(docs, [("l", "o", 3), ("lo", "w", 2)])
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            plan.explain("formatted")
        txt = buf.getvalue()
        assert "Exchange" not in txt and "Join" not in txt
