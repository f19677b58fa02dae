"""Late-round-5 operator tests: C4-style chunk boilerplate, quality
cluster representatives, DSIR-lite target likeness, and the k-means
silhouette margin — each pinned against an independent Python replica
(the oracle-parity run in test_oracle_parity covers the registry
queries themselves; these tests cover the operator contracts and the
adversarial cases SQL parity can't see)."""

from __future__ import annotations

import math
import random
import re
from collections import Counter, defaultdict

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


@pytest.fixture(scope="module")
def sess(spark):
    return spark


# --- chunk boilerplate ------------------------------------------------------


def _py_chunks(text: str, w: int) -> list[tuple[str, int]]:
    toks = text.strip(" \t\r\n").split()
    n = max(1, math.ceil(len(toks) / w))
    return [
        (" ".join(toks[i * w : (i + 1) * w]), min(w, len(toks) - i * w))
        for i in range(n)
    ]


def _py_boiler(docs: dict, group_of: dict, w: int, min_docs: int):
    """Replica of chunk_boilerplate_stats: returns {doc: (n_chunks,
    n_boiler, kept_tokens)} and the boilerplate set per group."""
    chunks = {
        d: _py_chunks(t, w) for d, t in docs.items() if re.search(r"\S", t)
    }
    docs_per = defaultdict(set)
    for d, ch in chunks.items():
        for c, _ in ch:
            docs_per[(group_of[d], c)].add(d)
    boiler = {k for k, v in docs_per.items() if len(v) >= min_docs}
    out = {}
    for d, ch in chunks.items():
        g = group_of[d]
        n_boiler = sum(1 for c, _ in ch if (g, c) in boiler)
        kept = sum(nt for c, nt in ch if (g, c) not in boiler)
        out[d] = (len(ch), n_boiler, kept)
    return out, boiler


def test_boilerplate_planted_template(sess):
    """A chunk repeated across two docs of ONE source is boilerplate
    there; the same chunk appearing once in another source is not —
    and a chunk repeated twice WITHIN one doc is not boilerplate
    either (frequency counts distinct documents)."""
    from telemetry_streaming_spark.operators.repetition import (
        chunk_boilerplate_stats,
    )

    tpl = "nav home about contact"  # one 4-word chunk at w=4
    rows = [
        (0, "a", f"{tpl} alpha beta gamma delta"),
        (1, "a", f"{tpl} epsilon zeta eta theta"),
        (2, "b", f"{tpl} iota kappa lamda mu"),  # other source: once only
        (3, "b", f"solo solo solo solo solo solo solo solo"),
        # chunk repeated twice inside ONE doc -> occ 2, 1 doc -> kept
        (4, "c", f"{tpl} {tpl}"),
    ]
    df = sess.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_boiler"], r["kept_tokens"])
        for r in chunk_boilerplate_stats(
            df, words_per_chunk=4, min_docs=2
        ).collect()
    }
    assert got[0] == (2, 1, 4) and got[1] == (2, 1, 4)  # template dropped
    assert got[2] == (2, 0, 8)  # cross-source isolation
    assert got[3] == (2, 0, 8)
    assert got[4] == (2, 0, 8)  # within-doc repeat alone is not boilerplate


@settings(max_examples=8, deadline=None)
@given(seed=st.integers(0, 10_000))
@pytest.mark.full  # r11: >=5s; fast-tier siblings cover this surface
def test_boilerplate_stats_match_replica_fuzz(sess, seed):
    from telemetry_streaming_spark.operators.repetition import (
        chunk_boilerplate_stats,
    )

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(6)]  # tiny vocab => real collisions
    rows, docs, group_of = [], {}, {}
    for d in range(rng.randint(1, 14)):
        text = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12)))
        g = f"s{rng.randint(0, 2)}"
        rows.append((d, g, text))
        docs[d], group_of[d] = text, g
    df = sess.createDataFrame(rows, "doc_id long, source string, text string")
    w = rng.choice([2, 3])
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_boiler"], r["kept_tokens"])
        for r in chunk_boilerplate_stats(
            df, words_per_chunk=w, min_docs=2
        ).collect()
    }
    want, _ = _py_boiler(docs, group_of, w, 2)
    assert got == want


def test_remove_boilerplate_rebuild_consistent(sess):
    """The apply step: clean_text token count == the stats frame's
    kept_tokens, order is preserved, and an all-boilerplate document
    survives as an empty row rather than vanishing."""
    from telemetry_streaming_spark.operators.repetition import (
        chunk_boilerplate_stats,
        remove_boilerplate_chunks,
    )

    tpl = "x1 x2 x3"
    rows = [
        (0, "a", f"{tpl} keep1 keep2 keep3"),
        (1, "a", f"{tpl} other words here"),
        (2, "a", tpl),  # all boilerplate
    ]
    df = sess.createDataFrame(rows, "doc_id long, source string, text string")
    stats = {
        r["doc_id"]: r["kept_tokens"]
        for r in chunk_boilerplate_stats(df, words_per_chunk=3, min_docs=2).collect()
    }
    cleaned = {
        r["doc_id"]: r["clean_text"]
        for r in remove_boilerplate_chunks(df, words_per_chunk=3, min_docs=2).collect()
    }
    assert set(cleaned) == {0, 1, 2}
    assert cleaned[2] == ""
    assert cleaned[0] == "keep1 keep2 keep3"
    assert cleaned[1] == "other words here"
    for d, t in cleaned.items():
        assert len(t.split()) == stats[d] if t else stats[d] == 0


# --- quality representatives ------------------------------------------------


def test_quality_representatives_keeps_best_then_lowest_id(sess):
    from telemetry_streaming_spark.operators.components import (
        connected_components,
        quality_representatives,
    )

    pairs = sess.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id1 long, id2 long"
    )
    quality = sess.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (10, 4), (11, 4)],
        "doc_id long, n_chars long",
    )
    cc = connected_components(pairs)
    got = {
        r["component"]: (r["keep_id"], r["keep_quality"], r["csize"])
        for r in quality_representatives(cc, quality).collect()
    }
    # cluster {1,2,3}: best quality 9 shared by 2 and 3 -> lowest id 2
    assert got[1] == (2, 9, 3)
    # cluster {10,11}: tie at 4 -> lowest id 10
    assert got[10] == (10, 4, 2)


# --- target likeness --------------------------------------------------------


def _py_likeness(docs: dict[int, str], is_target: dict[int, bool]):
    t_cnt, s_cnt = Counter(), Counter()
    for d, text in docs.items():
        if not re.search(r"\S", text):
            continue
        for tok in text.lower().strip(" \t\r\n").split():
            (t_cnt if is_target[d] else s_cnt)[tok] += 1
    t_tot, s_tot = sum(t_cnt.values()), sum(s_cnt.values())
    out = {}
    for d, text in docs.items():
        if not re.search(r"\S", text):
            continue
        toks = text.lower().strip(" \t\r\n").split()
        st_, ss = sum(t_cnt[x] for x in toks), sum(s_cnt[x] for x in toks)
        out[d] = (len(toks), st_, ss, int(st_ * s_tot > ss * t_tot))
    return out


@settings(max_examples=8, deadline=None)
@given(seed=st.integers(0, 10_000))
@pytest.mark.full  # r11: >=5s; fast-tier siblings cover this surface
def test_target_likeness_matches_replica_fuzz(sess, seed):
    from telemetry_streaming_spark.operators.tfidf import target_likeness

    rng = random.Random(seed)
    # two vocab regimes so the flag has real signal
    tv = [f"t{i}" for i in range(4)]
    sv = [f"s{i}" for i in range(4)]
    rows, docs, is_t = [], {}, {}
    for d in range(rng.randint(1, 12)):
        tgt = rng.random() < 0.5
        pool = tv + sv[:1] if tgt else sv + tv[:1]
        text = " ".join(rng.choice(pool) for _ in range(rng.randint(0, 10)))
        rows.append((d, int(tgt), text))
        docs[d], is_t[d] = text, tgt
    df = sess.createDataFrame(rows, "doc_id long, is_t long, text string")
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["score_t"], r["score_s"], r["target_like"]
        )
        for r in target_likeness(df, "is_t").collect()
    }
    assert got == _py_likeness(docs, is_t)


def test_target_likeness_all_target_degenerate(sess):
    """All-target corpus: s_total = 0, so no doc can test target_like
    (documented contract) — but scores still come back exact."""
    from telemetry_streaming_spark.operators.tfidf import target_likeness

    df = sess.createDataFrame(
        [(0, 1, "a b a"), (1, 1, "b b")], "doc_id long, is_t long, text string"
    )
    rows = {r["doc_id"]: r for r in target_likeness(df, "is_t").collect()}
    assert all(r["target_like"] == 0 for r in rows.values())
    assert rows[0]["score_t"] == 2 + 3 + 2  # a:2 counted twice + b:3


# --- k-means silhouette margin ----------------------------------------------


def test_kmeans_silhouette_consistent_with_assign(sess):
    """Silhouette's argmax must agree with kmeans_assign; the margin
    is non-negative and the runner-up is a different centroid."""
    from telemetry_streaming_spark.plans.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    sil = {r["vec_id"]: r for r in QUERIES["kmeans_silhouette"].fn(sess, sf).collect()}
    asg = {r["vec_id"]: r for r in QUERIES["kmeans_assign"].fn(sess, sf).collect()}
    assert set(sil) == set(asg)
    for vid, r in sil.items():
        assert r["cluster"] == asg[vid]["cluster"]
        assert r["centroid_sim"] == asg[vid]["centroid_sim"]
        assert r["runner_up"] != r["cluster"]
        assert r["margin"] >= 0.0
