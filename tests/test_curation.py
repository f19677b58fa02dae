"""End-to-end curation pipeline behavior (ext/curation.py): each
funnel stage drops exactly the documents it should, survivors come out
redacted and split-tagged."""

import pytest

EN = (
    "the quick brown fox jumps over the lazy dog and the birds sing "
    "in the tall green trees while the cat sleeps near the warm fire "
    "and the dog dreams of running in the open fields all day"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, EN),                                    # survives
        (2, "too short"),                           # killed: quality/length gate
        (3, "el la de que y en un los " * 8),       # killed: not English
        (4, ("the spam beacon " * 25).strip()),     # killed: repetitive (top 2-gram dominates)
        (5, EN + "."),                              # killed: exact dup of 1 after normalization
        (6, EN + " email me at a@b.io today ok"),   # survives, PII redacted
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_funnel_counts_stages(spark, corpus):
    from telemetry_streaming_spark.ext.curation import funnel_counts

    counts = {r.stage: r.n_docs for r in funnel_counts(corpus).collect()}
    assert counts["0_input"] == 6
    assert counts["1_quality_gate"] == 5        # drops 2
    assert counts["2_lang_filter"] == 4         # drops 3
    assert counts["3_repetition_filter"] == 3   # drops 4
    assert counts["4_exact_dedup"] == 2         # 1+5 collapse; 6 distinct


def test_curate_survivors_redacted_and_split(spark, corpus):
    from telemetry_streaming_spark.ext.curation import curate

    out = {r.doc_id: r for r in curate(corpus).collect()}
    assert set(out) == {1, 6}
    assert "[EMAIL]" in out[6].redacted and "a@b.io" not in out[6].redacted
    assert out[1].redacted == EN                # clean text untouched
    assert all(r.split in ("train", "eval") for r in out.values())


def test_curate_is_deterministic(spark, corpus):
    from telemetry_streaming_spark.ext.curation import curate

    a = sorted((r.doc_id, r.split) for r in curate(corpus).collect())
    b = sorted((r.doc_id, r.split) for r in curate(corpus.repartition(5)).collect())
    assert a == b


def test_repetition_expr_matches_batch_operator(spark, corpus):
    """The stateless per-row repetition expression must produce the
    identical stats the shuffle-based batch operator computes."""
    import pyspark.sql.functions as F

    from telemetry_streaming_spark.ext.curation import repetition_stats_expr
    from telemetry_streaming_spark.operators.repetition import ngram_repetition

    expr = {
        r.doc_id: (r.s.n_grams, r.s.n_distinct, r.s.top_count)
        for r in corpus.select(
            "doc_id", repetition_stats_expr().alias("s")
        ).collect()
        if r.s.n_grams > 0
    }
    batch = {
        r.doc_id: (r.n_grams, r.n_distinct, r.top_count)
        for r in ngram_repetition(corpus).collect()
    }
    assert expr == batch


def test_curate_stream_e2e(spark, tmp_path):
    """File-source streaming curation: gates drop the same docs as
    batch, the watermarked dedup collapses replayed fingerprints, and
    survivors arrive redacted + split-tagged."""
    import json
    import uuid

    import pyspark.sql.functions as F

    from telemetry_streaming_spark.ext.curation import curate_stream
    from telemetry_streaming_spark.streaming.core import text_file_source

    indir = tmp_path / "in"
    indir.mkdir()
    ckpt = tmp_path / "ckpt"

    def write(name, rows):
        p = indir / name
        p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")

    base = 1_700_000_000
    write("b1.jsonl", [
        {"doc_id": 1, "text": EN, "ts_s": base},
        {"doc_id": 2, "text": "too short", "ts_s": base + 1},
        {"doc_id": 3, "text": "el la de que y en un los " * 8, "ts_s": base + 2},
        {"doc_id": 4, "text": ("the spam beacon " * 25).strip(), "ts_s": base + 3},
        {"doc_id": 6, "text": EN + " email me at a@b.io today ok", "ts_s": base + 5},
    ])

    raw = text_file_source(spark, str(indir))
    parsed = raw.select(F.from_json("value", "doc_id long, text string, ts_s long").alias("j")).select(
        F.col("j.doc_id").alias("doc_id"),
        F.col("j.text").alias("text"),
        F.timestamp_seconds(F.col("j.ts_s")).alias("timestamp"),
    )
    curated = curate_stream(parsed)
    name = f"curate_stream_{uuid.uuid4().hex[:8]}"
    query = (
        curated.writeStream.queryName(name)
        .format("memory")
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        while query.status["isDataAvailable"] or query.status["isTriggerActive"]:
            query.processAllAvailable()
            break
        query.processAllAvailable()
        # replay doc 1's text under a new id (same fingerprint) plus a
        # fresh survivor
        write("b2.jsonl", [
            {"doc_id": 7, "text": EN + ".", "ts_s": base + 10},   # dup fp of 1
            {"doc_id": 8, "text": EN + " more words here now", "ts_s": base + 11},
        ])
        query.processAllAvailable()
        rows = spark.sql(f"SELECT * FROM {name}").collect()
        got = {r.doc_id: r for r in rows}
        assert set(got) == {1, 6, 8}
        assert "[EMAIL]" in got[6].redacted
        assert all(r.split in ("train", "eval") for r in rows)
    finally:
        query.stop()


def test_curate_with_near_dup_pairs(spark, corpus):
    """Near-dup pairs collapse transitively: feeding (1,6)-style pair
    edges drops every non-representative member of each component."""
    from telemetry_streaming_spark.ext.curation import curate

    # without pairs both 1 and 6 survive (different fingerprints)
    pairs = spark.createDataFrame([(1, 6)], ["id1", "id2"])
    out = {r.doc_id for r in curate(corpus, near_dup_pairs=pairs).collect()}
    assert out == {1}  # 6 is in 1's component; 1 is the keeper


def test_curate_optional_hygiene_stages(spark):
    """benchmark + chunk_dedup_words compose into the funnel: the
    result has no benchmark-contaminated docs, no cross-doc repeated
    chunks, and the default funnel is untouched when both are off."""
    import pyspark.sql.functions as F

    from telemetry_streaming_spark.ext.curation import CurationConfig, curate
    from telemetry_streaming_spark.operators.contamination import (
        chunk_dedup,
        contamination_report,
    )
    from telemetry_streaming_spark.sources.registry import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents", parallelize=False)
    bench = docs.where(F.col("doc_id") % 17 == 0)
    cfg = CurationConfig(
        min_tokens=3, min_quality=0.0,
        keep_langs=("en", "es", "fr", "de", "zh", "und"),
        chunk_dedup_words=10,
    )
    out = curate(docs, cfg, benchmark=bench)
    n = out.count()
    assert 0 < n < docs.count()
    # no survivor shares a 4-gram with the benchmark
    rep = contamination_report(out.select("doc_id", "text"), bench, n=4)
    assert rep.count() == 0
    # no cross-doc duplicate chunks remain among survivors
    cd = chunk_dedup(out.select("doc_id", "text"), words_per_chunk=10)
    assert cd.where(F.col("dropped_chunks") > 0).count() == 0
    # defaults-off path unchanged (same rows as before this feature)
    base_cfg = CurationConfig(
        min_tokens=3, min_quality=0.0,
        keep_langs=("en", "es", "fr", "de", "zh", "und"),
    )
    base = curate(docs, base_cfg)
    assert base.count() >= n
