"""bm25_topk: rational-exact BM25 retrieval (operators/tfidf.py).

The registry oracle re-states the same integer pipeline in SQL, so
these tests pin the semantics against an INDEPENDENT plain-Python
replica (no Spark, no SQL) plus closed-form hand values, and pin the
plan shape (query/df/totals frames broadcast, no Python eval in the
scoring path).
"""

import contextlib
import io
import re

import pytest

from telemetry_streaming_spark.operators.tfidf import bm25_topk

SCALE = 10**6


def _replica(docs, queries, top_k=10):
    """Plain-Python reference: same integer formulas, no shared code."""
    toks = {
        d: re.split(r"\s+", t.strip().lower())
        for d, t in docs
        if re.search(r"\S", t)
    }
    dl = {d: len(ts) for d, ts in toks.items()}
    n, total = len(dl), sum(dl.values())
    out = []
    for qid, terms in queries:
        scores, hits = {}, {}
        for term in terms:
            df = sum(1 for ts in toks.values() if term in ts)
            if df == 0:
                continue
            idf = (SCALE * (2 * n - 2 * df + 1)) // (2 * df + 1)
            for d, ts in toks.items():
                tf = ts.count(term)
                if tf == 0:
                    continue
                sat = (SCALE * 44 * total * tf) // (
                    20 * total * tf + 6 * total + 18 * dl[d] * n
                )
                scores[d] = scores.get(d, 0) + (idf * sat) // SCALE
                hits[d] = hits.get(d, 0) + 1
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
        out.extend((qid, d, hits[d], s, i) for i, (d, s) in enumerate(ranked, 1))
    return sorted(out)


DOCS = [
    (1, "hash join hash probe build"),
    (2, "sort merge join spill"),
    (3, "table scan filter scan scan"),
    (4, "hash agg partial hash hash hash"),
    (5, "   "),  # blank: excluded from N and avgdl
    (6, "window frame sort sort"),
]
QUERIES = [
    ("qa", ["hash", "join"]),
    ("qb", ["scan", "sort"]),
    ("qc", ["absent_term"]),  # zero-df: contributes nothing, query emits no rows
]


def _run(spark, docs=DOCS, queries=QUERIES, **kw):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    return sorted(
        tuple(r) for r in bm25_topk(df, queries, **kw).collect()
    )


def test_bm25_matches_python_replica(spark):
    assert _run(spark) == _replica(DOCS, QUERIES)


def test_bm25_hand_closed_form(spark):
    """One doc, one term — every factor computed by hand.

    Corpus 'a a b' (d1) and 'b c' (d2): N=2, L=5.  Query 'a':
    df=1, idf = (1e6 * (4-2+1)) // 3 = 1e6.  d1: tf=2, dl=3,
    sat = (1e6*44*5*2) // (20*5*2 + 6*5 + 18*3*2) = 440000000 // 338
        = 1301775.  score = (1e6 * 1301775) // 1e6 = 1301775.
    """
    rows = _run(
        spark,
        docs=[(1, "a a b"), (2, "b c")],
        queries=[("q", ["a"])],
    )
    assert rows == [("q", 1, 1, 1301775, 1)]


def test_bm25_topk_cut_and_doc_id_tiebreak(spark):
    """Identical docs tie exactly; rank must break on doc_id ascending
    and the cut must respect top_k."""
    docs = [(i, "x y") for i in range(1, 6)] + [(99, "z")]
    rows = _run(spark, docs=docs, queries=[("q", ["x"])], top_k=3)
    assert [(r[1], r[4]) for r in rows] == [(1, 1), (2, 2), (3, 3)]
    scores = {r[3] for r in rows}
    assert len(scores) == 1  # exact integer ties, no float fuzz


def test_bm25_blank_and_zero_df_behavior(spark):
    rows = _run(spark)
    assert all(r[0] != "qc" for r in rows)  # absent term -> no rows
    assert all(r[1] != 5 for r in rows)  # blank doc never scored


def test_bm25_plan_broadcasts_small_frames(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = bm25_topk(df, QUERIES)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_bm25_validates_inputs(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    with pytest.raises(ValueError, match="top_k"):
        bm25_topk(df, QUERIES, top_k=0)
    with pytest.raises(ValueError, match="at least one"):
        bm25_topk(df, [])


def test_bm25_rejects_duplicate_query_terms(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    with pytest.raises(ValueError, match="double-count"):
        bm25_topk(df, [("q", ["hash", "hash"])])
