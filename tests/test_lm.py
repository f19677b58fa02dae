"""Bigram LM quality scoring (operators/lm.py).

avg_neg_logprob is log-based (not bit-portable across engines), so
the pin is a pure-python replica on identical rows — same contract as
token_entropy.  The gram table itself is integer-exact and checked
directly.
"""

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from telemetry_streaming_spark.operators.lm import (
    bigram_lm_score,
    bigram_lm_table,
)


def _py_bigrams(text):
    toks = re.split(r"\s+", text.strip().lower()) if text and text.strip() else []
    return list(zip(toks, toks[1:]))


def _py_lm(texts):
    c2 = Counter()
    for t in texts:
        c2.update(_py_bigrams(t))
    c1 = Counter()
    for (w1, _), c in c2.items():
        c1[w1] += c
    return c2, c1


def _py_score(texts_by_id, lm_texts, alpha=1.0):
    c2, c1 = _py_lm(lm_texts)
    v = len(c1)
    out = {}
    for i, t in texts_by_id.items():
        bgs = _py_bigrams(t)
        if not bgs:
            continue
        nlp = [
            math.log(c1.get(w1, 0) + alpha * v) - math.log(c2.get((w1, w2), 0) + alpha)
            for w1, w2 in bgs
        ]
        unseen = sum(1 for w1, w2 in bgs if c2.get((w1, w2), 0) == 0)
        out[i] = (len(bgs), unseen, sum(nlp) / len(nlp))
    return out


CORPUS = {
    1: "the cat sat on the mat",
    2: "the cat sat on the cat",
    3: "completely novel gibberish tokens here",
    4: "the the the the",
    5: "  ",
    6: "single",
}


def _docs(spark, d=CORPUS):
    return spark.createDataFrame(
        [(k, v) for k, v in d.items()], "doc_id long, text string"
    )


class TestLmTable:
    def test_counts_match_replica(self, spark):
        rows = bigram_lm_table(_docs(spark)).collect()
        c2, c1 = _py_lm(CORPUS.values())
        assert len(rows) == len(c2)
        # c1 of every row equals the replica's prefix total; spot the
        # hot prefix 'the' (continuations: cat x2, mat... from doc 4)
        got_c1 = {}
        for r in rows:
            got_c1.setdefault(r.p_h, r.c1)
        assert sorted(r.c2 for r in rows) == sorted(c2.values())
        assert sorted(got_c1.values()) == sorted(c1.values())

    def test_gram_table_is_integer_exact_and_joinable(self, spark):
        t = bigram_lm_table(_docs(spark))
        assert dict(t.dtypes)["c2"] == "bigint" and dict(t.dtypes)["c1"] == "bigint"


class TestLmScore:
    def test_self_score_matches_replica(self, spark):
        got = {
            r.doc_id: (r.n_bigrams, r.n_unseen, r.avg_neg_logprob)
            for r in bigram_lm_score(_docs(spark)).collect()
        }
        want = _py_score(CORPUS, CORPUS.values())
        assert set(got) == set(want)  # empty/1-token docs emit nothing
        for k in want:
            assert got[k][0] == want[k][0]
            assert got[k][1] == want[k][1]
            assert got[k][2] == pytest.approx(want[k][2], rel=1e-12)

    def test_cross_corpus_unseen_handled(self, spark):
        lm = _docs(spark, {10: "the cat sat on the mat"})
        probe = _docs(spark, {1: "the cat sat", 2: "zz qq ww"})
        got = {
            r.doc_id: r
            for r in bigram_lm_score(probe, lm_docs=lm).collect()
        }
        # doc 1: all bigrams in-LM; doc 2: fully out-of-vocabulary but
        # finite (add-alpha smoothing)
        assert got[1].n_unseen == 0
        assert got[2].n_unseen == got[2].n_bigrams == 2
        assert math.isfinite(got[2].avg_neg_logprob)
        assert got[2].avg_neg_logprob > got[1].avg_neg_logprob
        want = _py_score(
            {1: "the cat sat", 2: "zz qq ww"}, ["the cat sat on the mat"]
        )
        for k in (1, 2):
            assert got[k].avg_neg_logprob == pytest.approx(want[k][2], rel=1e-12)

    def test_self_score_on_real_documents_matches_replica(self, spark):
        sf = "/root/testdata/sf0.001"
        docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
        texts = {r.doc_id: r.text for r in docs.collect()}
        got = {
            r.doc_id: (r.n_bigrams, r.n_unseen, r.avg_neg_logprob)
            for r in bigram_lm_score(docs).collect()
        }
        want = _py_score(texts, texts.values())
        assert set(got) == set(want)
        for k in want:
            assert got[k][0] == want[k][0] and got[k][1] == want[k][1]
            assert got[k][2] == pytest.approx(want[k][2], rel=1e-9)

    def test_low_perplexity_head_is_the_natural_text(self, spark):
        """The filter's purpose: templated/repeated text scores lower
        (more predictable) than gibberish under a self-trained LM."""
        got = {
            r.doc_id: r.avg_neg_logprob
            for r in bigram_lm_score(_docs(spark)).collect()
        }
        assert got[4] < got[3]  # 'the the the' highly predictable
        assert got[1] < got[3]  # natural sentence beats novel gibberish


class TestLmScoreStream:
    def test_batch_equivalence_same_lm(self, spark):
        """The stateless probe tier must reproduce the batch join tier
        exactly on the same LM corpus (docs with >=1 bigram)."""
        from telemetry_streaming_spark.operators.lm import bigram_lm_score_stream

        lm = _docs(spark, {10: "the cat sat on the mat", 11: "the dog sat"})
        probe = _docs(spark)
        got = {
            r.doc_id: (r.n_bigrams, r.n_unseen, r.avg_neg_logprob)
            for r in bigram_lm_score_stream(probe, lm).collect()
            if r.n_bigrams is not None
        }
        want = {
            r.doc_id: (r.n_bigrams, r.n_unseen, r.avg_neg_logprob)
            for r in bigram_lm_score(probe, lm_docs=lm).collect()
        }
        assert set(got) == set(want)
        for k in want:
            assert got[k][0] == want[k][0] and got[k][1] == want[k][1]
            assert got[k][2] == pytest.approx(want[k][2], rel=1e-12)

    def test_no_bigram_docs_score_null_and_pass_through(self, spark):
        from telemetry_streaming_spark.operators.lm import bigram_lm_score_stream

        lm = _docs(spark, {10: "the cat sat"})
        probe = _docs(spark, {1: "single", 2: "  ", 3: "the cat"})
        got = {r.doc_id: r for r in bigram_lm_score_stream(probe, lm).collect()}
        assert set(got) == {1, 2, 3}  # every row passes through
        assert got[1].n_bigrams is None and got[2].n_bigrams is None
        assert got[3].n_bigrams == 1 and got[3].n_unseen == 0

    def test_oversized_lm_raises(self, spark):
        import telemetry_streaming_spark.operators.lm as lm_mod

        lm = _docs(spark, {10: "a b c d e f"})
        probe = _docs(spark, {1: "a b"})
        old = lm_mod.MAX_LM_GRAMS
        lm_mod.MAX_LM_GRAMS = 2
        try:
            with pytest.raises(ValueError, match="exceeds"):
                lm_mod.bigram_lm_score_stream(probe, lm)
        finally:
            lm_mod.MAX_LM_GRAMS = old

    def test_streams_end_to_end(self, spark, tmp_path):
        """True streaming run: file source -> stateless score -> memory
        sink, append mode, no watermark needed."""
        import json
        import os
        import uuid

        from telemetry_streaming_spark.operators.lm import bigram_lm_score_stream
        from telemetry_streaming_spark.streaming.core import (
            drain,
            stop_quietly,
            text_file_source,
        )

        src = str(tmp_path / "in")
        os.makedirs(src)
        p = os.path.join(src, "batch1.txt")
        with open(p, "w") as f:
            f.write(json.dumps({"doc_id": 1, "text": "the cat sat"}) + "\n")
            f.write(json.dumps({"doc_id": 2, "text": "zz qq ww"}) + "\n")

        lm = _docs(spark, {10: "the cat sat on the mat"})
        raw = text_file_source(spark, src)
        parsed = raw.select(
            F.get_json_object("value", "$.doc_id").cast("long").alias("doc_id"),
            F.get_json_object("value", "$.text").alias("text"),
        )
        scored = bigram_lm_score_stream(parsed, lm)
        name = f"lmscore_{uuid.uuid4().hex[:8]}"
        q = (
            scored.writeStream.queryName(name)
            .format("memory")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            drain(q)
            got = {
                r.doc_id: r
                for r in spark.sql(f"SELECT * FROM {name}").collect()
            }
        finally:
            stop_quietly(q)
        assert got[1].n_unseen == 0
        assert got[2].n_unseen == 2
        assert got[2].avg_neg_logprob > got[1].avg_neg_logprob


class TestBigramPathStats:
    def test_matches_python_replica_exactly(self, spark):
        """The hash-checked companion must reproduce the integer
        sufficient statistics of the scorer's join path exactly,
        including the unseen path when the LM is a sub-corpus."""
        from telemetry_streaming_spark.operators.lm import bigram_path_stats

        lm_ids = {1, 2, 4}  # the "reference corpus" slice
        c2, c1 = _py_lm([CORPUS[i] for i in sorted(lm_ids)])
        v = len(c1)
        want = {}
        for i, t in CORPUS.items():
            bgs = _py_bigrams(t)
            if not bgs:
                continue
            want[i] = (
                len(bgs),
                sum(1 for b in bgs if c2.get(b, 0) == 0),
                sum(c2.get(b, 0) for b in bgs),
                sum(c1.get(b[0], 0) for b in bgs),
                v,
            )
        docs = _docs(spark)
        got = {
            r["doc_id"]: (
                r["n_bigrams"],
                r["n_unseen"],
                r["sum_c2"],
                r["sum_c1"],
                r["lm_vocab"],
            )
            for r in bigram_path_stats(
                docs, lm_docs=docs.where(F.col("doc_id").isin(*lm_ids))
            ).collect()
        }
        assert got == want

    def test_consistent_with_the_rows_only_scorer(self, spark):
        """n_bigrams / n_unseen must agree with bigram_lm_score on the
        same inputs — the companion and the scorer share one join
        path, so a divergence means the paths drifted apart."""
        from telemetry_streaming_spark.operators.lm import bigram_path_stats

        docs = _docs(spark)
        lm = docs.where(F.col("doc_id") < 4)
        stats = {
            r["doc_id"]: (r["n_bigrams"], r["n_unseen"])
            for r in bigram_path_stats(docs, lm_docs=lm).collect()
        }
        score = {
            r["doc_id"]: (r["n_bigrams"], r["n_unseen"])
            for r in bigram_lm_score(docs, lm_docs=lm).collect()
        }
        assert stats == score
