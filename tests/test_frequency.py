"""Heavy-hitter operators: exact tier, sketch tier, and plan shapes."""

import contextlib
import io

import pytest

from telemetry_streaming_spark.operators.frequency import (
    approx_heavy_hitters,
    heavy_hitters,
)
from telemetry_streaming_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


def _events(spark):
    return load_table(spark, SF, "events", parallelize=False)


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    return buf.getvalue()


def test_exact_heavy_hitters_matches_manual(spark):
    ev = _events(spark)
    out = {r.user_id: (r.cnt, r.total) for r in heavy_hitters(ev, "user_id", k=18).collect()}
    counts = {r.user_id: r.cnt for r in ev.groupBy("user_id").count().withColumnRenamed("count", "cnt").collect()}
    total = sum(counts.values())
    expected = {u: c for u, c in counts.items() if c * 18 >= total}
    assert {u: c for u, (c, _) in out.items()} == expected
    assert all(t == total for _, t in out.values())


def test_exact_heavy_hitters_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        heavy_hitters(_events(spark), "user_id", k=0)


def test_sketch_counts_exact_when_tracker_wide(spark):
    """With max_tracked >= key cardinality the SpaceSaving summary
    degenerates to exact counting: every returned count must equal the
    true count, and every key strictly above the k-th count must be
    present (ties at the boundary are the sketch's to break)."""
    ev = _events(spark)
    approx = {r.user_id: r.approx_cnt for r in
              approx_heavy_hitters(ev, "user_id", top_k=5, max_tracked=10_000).collect()}
    exact = {r.user_id: r["count"] for r in ev.groupBy("user_id").count().collect()}
    assert len(approx) == 5
    for uid, cnt in approx.items():
        assert cnt == exact[uid]
    kth = sorted(exact.values(), reverse=True)[4]
    must_have = {u for u, c in exact.items() if c > kth}
    assert must_have <= set(approx)


def test_sketch_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        approx_heavy_hitters(_events(spark), "user_id", top_k=10, max_tracked=5)


def test_exact_tier_plan_broadcasts_scalar_total(spark):
    """The total must join in as a broadcast (1 row), never a shuffle;
    the count aggregation keeps its map-side combine."""
    plan = _explain(heavy_hitters(_events(spark), "user_id", k=18))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "partial_count" in plan


def test_sketch_tier_plan_is_one_sketch_row(spark):
    """approx_top_k must aggregate to a single sketch (partial+final
    agg, SinglePartition exchange of sketch blobs only)."""
    plan = _explain(approx_heavy_hitters(_events(spark), "user_id", top_k=5))
    assert "approx_top_k" in plan
    assert "Exchange hashpartitioning" not in plan


def test_distinctive_terms_rank_is_deterministic(spark):
    from telemetry_streaming_spark.operators.tfidf import distinctive_terms

    docs = load_table(spark, SF, "documents", parallelize=False)
    a = distinctive_terms(docs, top_k=5).collect()
    b = distinctive_terms(docs, top_k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_group = {}
    for r in a:
        by_group.setdefault(r.source, []).append(r)
    for rows in by_group.values():
        ranks = sorted(r.rnk for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        ordered = sorted(rows, key=lambda r: (-r.score, r.term))
        assert [r.rnk for r in ordered] == ranks


@pytest.mark.full  # r11: >=5s; fast-tier siblings cover this surface
def test_windowed_top_keys_stream_matches_batch(spark, tmp_path):
    """The windowed sketch must emit identical rows from a file stream
    (append on watermark close) and from the same data as a batch."""
    import json
    import os

    from telemetry_streaming_spark.operators.frequency import windowed_top_keys

    src = tmp_path / "src"
    src.mkdir()
    with open(src / "a.jsonl", "w") as f:
        for i in range(600):
            f.write(json.dumps({"ts": f"2024-01-01 00:{i % 50:02d}:00", "k": f"u{i % 7}"}) + "\n")
    schema = "ts timestamp, k string"

    stream = windowed_top_keys(
        spark.readStream.schema(schema).json(str(src)),
        "k", "ts", window="30 minutes", top_k=3, watermark="10 minutes",
    )
    q = (
        stream.writeStream.outputMode("append").format("memory")
        .queryName("wtk").option("checkpointLocation", str(tmp_path / "chk")).start()
    )
    q.processAllAvailable()
    # advance the watermark past the first window so it flushes
    with open(src / "b.jsonl", "w") as f:
        f.write(json.dumps({"ts": "2024-01-01 02:00:00", "k": "u0"}) + "\n")
    q.processAllAvailable()
    streamed = {tuple(r) for r in spark.sql("select * from wtk").collect()}
    q.stop()

    batch = windowed_top_keys(
        spark.read.schema(schema).json(str(src)), "k", "ts", window="30 minutes", top_k=3
    )
    # the stream has emitted only closed windows; compare those
    horizon = max(t[1] for t in streamed)
    flushed = {tuple(r) for r in batch.collect() if r.window_end <= horizon}
    assert streamed == flushed
    assert len(streamed) > 0


def test_windowed_top_keys_ranks_are_dense(spark):
    from telemetry_streaming_spark.operators.frequency import windowed_top_keys

    out = windowed_top_keys(_events(spark), "user_id", "ts", window="1 hour", top_k=5).collect()
    by_w = {}
    for r in out:
        by_w.setdefault(r.window_start, []).append(r.rank)
    for ranks in by_w.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_verified_tier_counts_are_exact(spark):
    from telemetry_streaming_spark.operators.frequency import heavy_hitters_verified

    ev = _events(spark)
    got = {r.user_id: r.cnt for r in
           heavy_hitters_verified(ev, "user_id", top_k=5).collect()}
    exact = {r.user_id: r["count"] for r in ev.groupBy("user_id").count().collect()}
    assert len(got) == 5
    for uid, cnt in got.items():
        assert cnt == exact[uid]


def test_verified_tier_plan_semi_joins_broadcast_candidates(spark):
    from telemetry_streaming_spark.operators.frequency import heavy_hitters_verified

    plan = _explain(heavy_hitters_verified(_events(spark), "user_id", top_k=5))
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_token_entropy_matches_python_reference(spark):
    import math

    from telemetry_streaming_spark.operators.tfidf import token_entropy

    docs = load_table(spark, SF, "documents", parallelize=False).limit(50)
    got = {r.doc_id: r for r in token_entropy(docs).collect()}
    for row in docs.select("doc_id", "text").collect():
        toks = row.text.strip().split()
        counts = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        n = len(toks)
        want = math.log(n) - sum(c * math.log(c) for c in counts.values()) / n
        r = got[row.doc_id]
        assert r.n_tokens == n and r.vocab == len(counts)
        assert abs(r.entropy - want) < 1e-9
    # uniform text has maximal entropy ln(vocab); constant text zero
    tiny = spark.createDataFrame(
        [(1, "a b c d"), (2, "a a a a")], "doc_id long, text string"
    )
    e = {r.doc_id: r.entropy for r in token_entropy(tiny).collect()}
    assert abs(e[1] - math.log(4)) < 1e-12
    assert abs(e[2]) < 1e-12
