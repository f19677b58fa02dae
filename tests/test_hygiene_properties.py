"""Independent Python-reference cross-checks for the round-3 operator
families over a seeded random corpus.

The DuckDB oracles share SQL semantics with the queries; this layer
verifies the operators against plain-Python reimplementations on a
randomized corpus (fixed seed — deterministic, but none of the values
are hand-picked), so a shared misunderstanding between the Spark and
SQL formulations would still be caught."""

import random

import pyspark.sql.functions as F
import pytest

WORDS = [f"w{i}" for i in range(12)]  # small vocab -> real collisions


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(20260814)
    docs = []
    for i in range(200):
        n = rng.randint(0, 40)
        text = " ".join(rng.choice(WORDS) for _ in range(n))
        if rng.random() < 0.15 and docs:  # plant exact dups
            text = docs[rng.randrange(len(docs))][1]
        docs.append((i, text))
    return docs


def _toks(text):
    return text.strip().split() if text.strip() else [""]


def _chunks(text, w):
    t = _toks(text)
    return [" ".join(t[i * w : (i + 1) * w]) for i in range((len(t) + w - 1) // w)]


def test_chunk_dedup_matches_python_reference(spark, corpus):
    from telemetry_streaming_spark.operators.contamination import chunk_dedup

    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {r.doc_id: (r.n_chunks, r.kept_chunks, r.dropped_chunks)
           for r in chunk_dedup(df, words_per_chunk=5).collect()}

    seen = {}
    want = {}
    for doc_id, text in corpus:  # ids ascending = keeper order
        ch = _chunks(text, 5)
        kept = 0
        for idx, c in enumerate(ch):
            if c not in seen:
                seen[c] = (doc_id, idx)
                kept += 1
        want[doc_id] = (len(ch), kept, len(ch) - kept)
    assert got == want


def test_chunk_dedup_apply_matches_python_reference(spark, corpus):
    from telemetry_streaming_spark.operators.contamination import chunk_dedup_apply

    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {r.doc_id: r.text for r in chunk_dedup_apply(df, words_per_chunk=5).collect()}

    seen = set()
    for doc_id, text in corpus:
        out = []
        for c in _chunks(text, 5):
            if c not in seen:
                seen.add(c)
                out.append(c)
        assert got[doc_id] == " ".join(out), doc_id


def test_contamination_matches_python_reference(spark, corpus):
    from telemetry_streaming_spark.operators.contamination import contamination_report

    n = 3
    bench_rows = [(i, t) for i, t in corpus if i % 7 == 0]
    train_rows = [(i, t) for i, t in corpus if i % 7 != 0]
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    got = {r.doc_id: r.contaminated_grams
           for r in contamination_report(train, bench, n=n).collect()}

    def grams(text):
        t = _toks(text)
        return {" ".join(t[i:i + n]) for i in range(len(t) - n + 1)} if len(t) >= n else set()

    bgrams = set().union(*(grams(t) for _, t in bench_rows)) if bench_rows else set()
    want = {}
    for doc_id, text in train_rows:
        hit = grams(text) & bgrams
        if hit:
            want[doc_id] = len(hit)
    assert got == want


def test_dup_window_fraction_matches_python_reference(spark, corpus):
    from telemetry_streaming_spark.operators.contamination import dup_window_fraction

    n = 4
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {r.doc_id: (r.n_windows, r.dup_windows)
           for r in dup_window_fraction(df, n=n).collect()}

    from collections import Counter
    occ = Counter()
    wins = {}
    for doc_id, text in corpus:
        t = _toks(text)
        ws = [" ".join(t[i:i + n]) for i in range(len(t) - n + 1)] if len(t) >= n else []
        wins[doc_id] = ws
        occ.update(ws)
    want = {
        d: (len(ws), sum(1 for w in ws if occ[w] > 1))
        for d, ws in wins.items() if ws
    }
    assert got == want


@pytest.mark.full  # r11: >=5s; fast-tier siblings cover this surface
def test_sequence_packing_matches_python_reference(spark, corpus):
    from telemetry_streaming_spark.operators.packing import sequence_packing

    df = spark.createDataFrame(corpus, "doc_id long, text string").repartition(9)
    got = {r.doc_id: (r.n_tokens, r.start_offset)
           for r in sequence_packing(df, 64, n_buckets=13).collect()}

    run = 0
    for doc_id, text in corpus:
        nt = len(_toks(text))
        assert got[doc_id] == (nt, run), doc_id
        run += nt


def test_pattern_match_matches_python_reference(spark):
    from telemetry_streaming_spark.operators.timeseries import pattern_match_topk

    import datetime as dt

    rng = random.Random(7)
    rows = []
    for uid in range(20):
        for i in range(rng.randint(0, 30)):
            rows.append((uid, uid * 1000 + i, dt.datetime(2024, 1, 1, 0, 0, 0)
                         + dt.timedelta(seconds=i), round(rng.uniform(0, 50), 2)))
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, value double")
    pattern = [1000, 2000, 1500]
    got = [(r.user_id, r.ts_s, r.dist2)
           for r in pattern_match_topk(df, pattern, k=15).collect()]

    import math
    series = {}
    for uid, eid, ts, v in sorted(rows, key=lambda r: (r[0], r[2], r[1])):
        series.setdefault(uid, []).append((int(ts.timestamp()), int(math.floor(v * 100 + 0.5))))
    cands = []
    for uid, sv in series.items():
        for i in range(len(sv) - 2):
            d = sum((sv[i + j][1] - pattern[j]) ** 2 for j in range(3))
            cands.append((d, uid, sv[i][0]))
    cands.sort()
    want = [(u, t, d) for d, u, t in cands[:15]]
    assert got == want
