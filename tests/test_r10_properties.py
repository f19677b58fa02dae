"""Seeded-random property layer for the r10 additions (the
test_url_properties precedent): each new operator must equal its
independent plain-Python replica on a randomized corpus, not only on
hand-picked rows.

Deterministic seeds — no flaky margins; the replicas live in the
per-operator test modules and are imported, not re-derived, so one
reference implementation serves both tiers.
"""

import random
import string

from tests.test_bm25 import _replica as bm25_replica
from tests.test_mannkendall import _replica as mk_replica
from tests.test_theilsen import _replica as ts_replica
from tests.test_winnow import _replica as winnow_replica

from telemetry_streaming_spark.operators.dedup import winnow_fingerprints
from telemetry_streaming_spark.operators.regression import (
    mann_kendall,
    theilsen_slope,
)
from telemetry_streaming_spark.operators.tfidf import bm25_topk


def _random_text(rng, n_words, vocab):
    words = [rng.choice(vocab) for _ in range(n_words)]
    # sprinkle punctuation/whitespace noise the normalizers must absorb
    out = []
    for w in words:
        if rng.random() < 0.2:
            w = w + rng.choice(",.!?;:")
        if rng.random() < 0.05:
            w = w.upper()
        out.append(w)
    sep = [" ", "  ", "\t"]
    return rng.choice(["", " "]) + rng.choice(sep).join(out)


def test_winnow_random_corpus_equals_replica(spark):
    rng = random.Random(1041)
    vocab = ["".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(2, 9))) for _ in range(40)]
    docs = [(i, _random_text(rng, rng.randint(0, 30), vocab)) for i in range(60)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {}
    for r in winnow_fingerprints(df, k=5, w=3).collect():
        got.setdefault(r["doc_id"], set()).add((r["fppos"], r["fp"]))
    for doc_id, text in docs:
        assert got.get(doc_id, set()) == winnow_replica(text, k=5, w=3), doc_id


def test_bm25_random_corpus_equals_replica(spark):
    rng = random.Random(1042)
    vocab = [f"w{i}" for i in range(25)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40))))
        for i in range(80)
    ]
    queries = [
        ("qa", rng.sample(vocab, 3)),
        ("qb", rng.sample(vocab, 2)),
        ("qc", ["w0", "missing_term"]),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = sorted(tuple(r) for r in bm25_topk(df, queries, top_k=7).collect())
    assert got == bm25_replica(docs, queries, top_k=7)


def test_theilsen_and_mk_random_series_equal_replicas(spark):
    rng = random.Random(1043)
    pts = []
    for g in range(8):
        xs = rng.sample(range(100), rng.randint(2, 25))
        for x in xs:
            drift = g - 4
            pts.append((f"g{g}", x, drift * x + rng.randint(-20, 20)))
    df = spark.createDataFrame(pts, ["g", "x", "y"])
    got_ts = {
        r["g"]: (r["n_points"], r["n_pairs"], r["theilsen_slope_e6"])
        for r in theilsen_slope(df, "x", "y", ["g"]).collect()
    }
    assert got_ts == ts_replica(pts)
    got_mk = {
        r["g"]: (r["n_points"], r["s_stat"], r["var_s_num18"], r["trend"], r["significant"])
        for r in mann_kendall(df, "x", "y", ["g"]).collect()
    }
    assert got_mk == mk_replica(pts)
