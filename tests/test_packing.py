"""Behavioral tests for sequence packing (operators/packing.py):
prefix-sum exactness under any bucketing, span arithmetic, occupancy
accounting."""

import pyspark.sql.functions as F
import pytest


def _docs(spark, n_tokens_list, parts=None):
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(nt))) for i, nt in enumerate(n_tokens_list)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.repartition(parts) if parts else df


def test_offsets_match_serial_prefix_sum(spark):
    from telemetry_streaming_spark.operators.packing import sequence_packing

    counts = [5, 3, 8, 1, 12, 2, 7, 4, 9, 6]
    out = {r.doc_id: r for r in sequence_packing(_docs(spark, counts), seq_len=10).collect()}
    run = 0
    for i, nt in enumerate(counts):
        r = out[i]
        assert (r.n_tokens, r.start_offset) == (nt, run)
        assert r.first_seq == run // 10
        assert r.last_seq == (run + nt - 1) // 10
        assert r.n_seqs_spanned == r.last_seq - r.first_seq + 1
        run += nt


@pytest.mark.parametrize("n_buckets", [1, 3, 1024])
def test_bucketing_is_an_implementation_detail(spark, n_buckets):
    """Same offsets whatever the bucket count or input layout."""
    from telemetry_streaming_spark.operators.packing import sequence_packing

    counts = [4, 9, 2, 2, 5, 30, 1, 1, 1, 8, 17, 3]
    a = sequence_packing(_docs(spark, counts, parts=7), 8, n_buckets=n_buckets).collect()
    got = sorted((r.doc_id, r.start_offset) for r in a)
    run, want = 0, []
    for i, nt in enumerate(counts):
        want.append((i, run))
        run += nt
    assert got == want


def test_sparse_and_negative_like_ids(spark):
    """Non-dense ids (gaps, huge range) still pack in id order."""
    from telemetry_streaming_spark.operators.packing import sequence_packing

    rows = [(10**12, "a b c"), (5, "x"), (999, "p q")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        ((r.doc_id, r.start_offset) for r in sequence_packing(df, 4).collect())
    )
    assert out == [(5, 0), (999, 1), (10**12, 3)]


def test_packing_stats_counts_boundary_docs(spark):
    from telemetry_streaming_spark.operators.packing import packing_stats, sequence_packing

    # seq_len 10: doc0 fills 0..7, doc1 spans 8..12 (seqs 0-1), doc2 13..14
    packed = sequence_packing(_docs(spark, [8, 5, 2]), 10)
    stats = {r.seq_id: r for r in packing_stats(packed).collect()}
    assert (stats[0].n_docs, stats[0].n_boundary_docs) == (2, 1)
    assert (stats[1].n_docs, stats[1].n_boundary_docs) == (2, 0)


def test_packing_rejects_bad_params(spark):
    from telemetry_streaming_spark.operators.packing import sequence_packing

    with pytest.raises(ValueError):
        sequence_packing(_docs(spark, [1]), 0)
    with pytest.raises(ValueError):
        sequence_packing(_docs(spark, [1]), 10, n_buckets=0)
