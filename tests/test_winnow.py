"""Winnowing fingerprints (operators/dedup.py:winnow_fingerprints).

Pins the string-encoded sliding-MIN selection against an independent
plain-Python replica that implements the Schleimer/Wilkerson/Aiken
algorithm directly (explicit window scan, rightmost-min tie-break),
plus the paper's structural guarantees and the partial-overlap
matching property that motivates the operator.
"""

import hashlib
import re

import pytest

from telemetry_streaming_spark.operators.dedup import (
    winnow_fingerprints,
    winnow_match_pairs,
    winnow_profile,
)


def _replica(text, k=8, w=4):
    """Direct winnowing per the paper: for each window of w k-gram
    hashes, select the min hash, rightmost on ties; dedup (pos, hash)."""
    s = re.sub(r"[^a-z0-9]", "", text.lower())
    if len(s) < k:
        return set()
    hashes = [
        hashlib.md5(s[i : i + k].encode()).hexdigest()
        for i in range(len(s) - k + 1)
    ]
    out = set()
    for end in range(w - 1, len(hashes)):
        window = hashes[end - w + 1 : end + 1]
        m = min(window)
        # rightmost occurrence of the min
        off = max(i for i, h in enumerate(window) if h == m)
        out.add((end - w + 1 + off + 1, m))  # 1-based position
    return out


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "The quick, brown fox! jumps over the lazy dog?"),  # same after norm
    (3, "completely different text about spark shuffles and joins"),
    (4, "zz"),  # shorter than k after norm: no fingerprints
    (5, "abababababababababab"),  # periodic: exercises exact hash ties
]


def _spark_fps(spark, docs=DOCS, **kw):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = winnow_fingerprints(df, **kw).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add((r["fppos"], r["fp"]))
    return by_doc


def test_winnow_matches_python_replica(spark):
    got = _spark_fps(spark)
    for doc_id, text in DOCS:
        assert got.get(doc_id, set()) == _replica(text), f"doc {doc_id}"


def test_winnow_normalization_makes_punct_edits_invisible(spark):
    got = _spark_fps(spark)
    assert got[1] == got[2]


def test_winnow_every_window_is_covered(spark):
    """Paper guarantee: consecutive selected positions are <= w apart
    (at least one fingerprint per window), and the first selection is
    inside the first full window."""
    w = 4
    got = _spark_fps(spark, w=w)
    for doc_id, positions in (
        (d, sorted(p for p, _ in fps)) for d, fps in got.items()
    ):
        assert positions[0] <= w
        gaps = [b - a for a, b in zip(positions, positions[1:])]
        assert all(g <= w for g in gaps), (doc_id, gaps)


def test_winnow_short_doc_yields_nothing(spark):
    assert 4 not in _spark_fps(spark)


def test_winnow_partial_overlap_is_matched(spark):
    """A paragraph copied into an otherwise-different document still
    collides — the property whole-document MinHash dilutes away."""
    shared = "this exact paragraph was copied verbatim between documents"
    docs = [
        (1, shared + " and then the first document continues its own way"),
        (2, "a totally unrelated opening before " + shared),
        (3, "no overlap with anything else whatsoever in this row"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    pairs = {
        (r["id1"], r["id2"]): r["n_shared"]
        for r in winnow_match_pairs(df, min_shared=3).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 3
    assert all(3 not in p for p in pairs)


def test_winnow_profile_digest_is_position_ordered(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    prof = {r["doc_id"]: r for r in winnow_profile(df).collect()}
    for doc_id, text in DOCS:
        ref = _replica(text)
        if not ref:
            assert doc_id not in prof
            continue
        expected = hashlib.md5(
            "".join(h for _, h in sorted(ref)).encode()
        ).hexdigest()
        assert prof[doc_id]["fp_digest"] == expected
        assert prof[doc_id]["n_fp"] == len(ref)
        norm = re.sub(r"[^a-z0-9]", "", text.lower())
        assert prof[doc_id]["n_kgrams"] == len(norm) - 7


def test_winnow_hot_fingerprint_cap_bounds_fanout(spark):
    """With the cap below the duplicate count, boilerplate shared by
    every doc produces ZERO pairs — the all-pairs guard."""
    docs = [(i, "identical boilerplate content everywhere") for i in range(30)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    assert winnow_match_pairs(df, max_docs_per_fp=20).count() == 0
    assert winnow_match_pairs(df, max_docs_per_fp=64).count() == 30 * 29 // 2


def test_winnow_validates_inputs(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    with pytest.raises(ValueError, match="k and w"):
        winnow_fingerprints(df, k=0)
    with pytest.raises(ValueError, match="min_shared"):
        winnow_match_pairs(df, min_shared=0)


def test_winnow_pairs_plan_shape(spark):
    """No CartesianProduct, no Python eval: the pair stage must be the
    bucketed fp equi-join, entirely JVM-side."""
    import contextlib
    import io

    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = winnow_match_pairs(df)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
