"""Hypothesis fuzz for the intricate round-4 operators: each property
compares the scalable implementation against a naive reference on
randomized inputs (few examples — every example runs Spark jobs — but
adversarially shaped: duplicate values, boundary slices, tiny vocab
for dense dup windows)."""

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


@pytest.fixture(scope="module")
def sess(spark):
    return spark


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    per_day=st.integers(min_value=30, max_value=45),
    days=st.integers(min_value=2, max_value=4),
    lookback=st.integers(min_value=5, max_value=29),
)
@settings(max_examples=8, deadline=None)
@pytest.mark.full  # r11: >=5s; fast-tier siblings cover this surface
def test_sliced_window_equals_reference_fuzz(sess, seed, per_day, days, lookback):
    """Sliced trailing stats == single-window reference on random
    value streams, any (per_day >= lookback, days, lookback) combo."""
    import random

    from telemetry_streaming_spark.operators.timeseries import trailing_window_stats

    rng = random.Random(seed)
    rows = []
    for p in range(2):
        i = 0
        for d in range(days):
            for _ in range(per_day):
                rows.append((f"t{p}", d, i, rng.randint(-50, 50)))
                i += 1
    df = sess.createDataFrame(rows, "part string, day int, seq long, v long")
    ref = {
        (r.part, r.seq): (r.n, r.s1, r.s2)
        for r in trailing_window_stats(df, "part", ["seq"], "v", lookback=lookback).collect()
    }
    sliced = {
        (r.part, r.seq): (r.n, r.s1, r.s2)
        for r in trailing_window_stats(
            df, "part", ["seq"], "v", lookback=lookback, slice_col="day"
        ).collect()
    }
    assert ref == sliced


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n=st.integers(min_value=2, max_value=4),
    vocab=st.integers(min_value=3, max_value=6),
)
@settings(max_examples=8, deadline=None)
@pytest.mark.full  # r11: >=5s; fast-tier siblings cover this surface
def test_span_removal_matches_replica_fuzz(sess, seed, n, vocab):
    """remove_duplicated_spans == brute-force python replica on random
    tiny-vocab corpora (dense duplicated windows, adjacent and
    overlapping spans arise naturally)."""
    import random

    from telemetry_streaming_spark.operators.contamination import (
        remove_duplicated_spans,
    )

    rng = random.Random(seed)
    words = [f"w{k}" for k in range(vocab)]
    docs = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(0, 12))))
        for i in range(12)
    ]
    df = sess.createDataFrame(docs, "doc_id long, text string")
    toks = {d: t.split() for d, t in docs}
    from collections import Counter

    counts = Counter()
    for t in toks.values():
        for i in range(len(t) - n + 1):
            counts[" ".join(t[i : i + n])] += 1
    expect = {}
    for d, t in toks.items():
        covered = set()
        for i in range(len(t) - n + 1):
            if counts[" ".join(t[i : i + n])] >= 2:
                covered.update(range(i, i + n))
        expect[d] = " ".join(tok for j, tok in enumerate(t) if j not in covered)
    got = {
        r.doc_id: r.text
        for r in remove_duplicated_spans(df, n=n, min_count=2).collect()
    }
    assert got == expect


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    cap=st.integers(min_value=1, max_value=60),
    groups=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=8, deadline=None)
@pytest.mark.full  # r11: >=5s; fast-tier siblings cover this surface
def test_per_group_cap_equals_naive_fuzz(sess, seed, cap, groups):
    """Salted two-level cap == naive one-window ranking for random
    group sizes and caps (including cap > group size)."""
    import random

    from pyspark.sql import Window

    from telemetry_streaming_spark.operators.sampling import per_group_cap

    rng = random.Random(seed)
    rows = [
        (i, f"g{rng.randrange(groups)}") for i in range(rng.randint(1, 150))
    ]
    df = sess.createDataFrame(rows, "doc_id long, source string")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    naive = {
        (r.doc_id, r.source)
        for r in df.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= cap)
        .collect()
    }
    got = {
        (r.doc_id, r.source)
        for r in per_group_cap(df, "source", "doc_id", cap=cap).collect()
    }
    assert naive == got
