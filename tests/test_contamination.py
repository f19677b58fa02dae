"""Behavioral tests for corpus-hygiene operators
(operators/contamination.py): chunk dedup keeper semantics,
decontamination overlap rules, duplicated-window accounting."""

import pyspark.sql.functions as F
import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_table_shape_and_determinism(spark):
    from telemetry_streaming_spark.operators.contamination import chunk_table

    df = _docs(spark, [(1, " ".join(f"w{i}" for i in range(25))), (2, "a b"), (3, "")])
    rows = chunk_table(df, words_per_chunk=10).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.chunk_idx)
    # 25 words -> chunks 0,1,2 (last partial); 2 words -> chunk 0;
    # empty text tokenizes to [''] (split of ''), one chunk
    assert sorted(by_doc[1]) == [0, 1, 2]
    assert by_doc[2] == [0]
    # same text, same chunk -> same hash regardless of doc
    df2 = _docs(spark, [(1, "x y z"), (2, "x y z")])
    h = chunk_table(df2, words_per_chunk=10).collect()
    assert len({r.chunk_h for r in h}) == 1


def test_chunk_dedup_keeps_first_occurrence(spark):
    from telemetry_streaming_spark.operators.contamination import chunk_dedup

    shared = " ".join(f"s{i}" for i in range(10))
    uniq1 = " ".join(f"a{i}" for i in range(10))
    uniq2 = " ".join(f"b{i}" for i in range(10))
    df = _docs(
        spark,
        [
            (1, shared + " " + uniq1),  # chunk0=shared (first), chunk1=uniq
            (2, uniq2 + " " + shared),  # chunk1=shared (dup)
            (3, shared),  # chunk0=shared (dup)
        ],
    )
    out = {r.doc_id: r for r in chunk_dedup(df, words_per_chunk=10).collect()}
    assert (out[1].kept_chunks, out[1].dropped_chunks) == (2, 0)
    assert (out[2].kept_chunks, out[2].dropped_chunks) == (1, 1)
    assert (out[3].kept_chunks, out[3].dropped_chunks) == (0, 1)
    assert all(out[d].n_chunks == out[d].kept_chunks + out[d].dropped_chunks for d in out)


def test_chunk_dedup_rejects_bad_width(spark):
    from telemetry_streaming_spark.operators.contamination import chunk_table

    with pytest.raises(ValueError):
        chunk_table(_docs(spark, [(1, "a")]), words_per_chunk=0)


def test_contamination_and_decontaminate(spark):
    from telemetry_streaming_spark.operators.contamination import (
        contamination_report,
        decontaminate,
    )

    bench = _docs(spark, [(100, "the quick brown fox jumps")])
    train = _docs(
        spark,
        [
            (1, "the quick brown fox runs"),  # shares 4-gram "the quick brown fox"
            (2, "quick brown fox jumps high"),  # shares "quick brown fox jumps"
            (3, "entirely different token stream here"),
            (4, "the quick brown cat sits"),  # only 3-gram overlap -> clean
        ],
    )
    rep = {r.doc_id: r.contaminated_grams for r in contamination_report(train, bench, n=4).collect()}
    assert rep == {1: 1, 2: 1}
    kept = {r.doc_id for r in decontaminate(train, bench, n=4).collect()}
    assert kept == {3, 4}


def test_dup_window_fraction_counts_own_repeats(spark):
    from telemetry_streaming_spark.operators.contamination import dup_window_fraction

    seq = " ".join(f"w{i}" for i in range(8))
    df = _docs(
        spark,
        [
            (1, seq),  # window appears here and in doc 2 -> dup
            (2, seq + " tail1 tail2"),
            (3, " ".join(f"z{i}" for i in range(9))),  # 2 unique windows
            (4, seq + " " + seq),  # self-repeat: its copies count
        ],
    )
    out = {r.doc_id: r for r in dup_window_fraction(df, n=8).collect()}
    assert out[1].n_windows == 1 and out[1].dup_windows == 1
    assert out[3].dup_windows == 0 and out[3].n_windows == 2
    # doc 4: 17 tokens -> 10 windows; the two full copies of seq plus
    # the seam windows are shared or self-repeated; at minimum the two
    # exact copies of seq are dups
    assert out[4].dup_windows >= 2
    assert abs(out[1].dup_fraction - 1.0) < 1e-12


def test_short_docs_produce_no_windows(spark):
    from telemetry_streaming_spark.operators.contamination import dup_window_fraction

    df = _docs(spark, [(1, "a b c")])
    assert dup_window_fraction(df, n=8).collect() == []


def test_chunk_dedup_apply_rebuilds_clean_text(spark):
    from telemetry_streaming_spark.operators.contamination import chunk_dedup_apply

    s = " ".join(f"s{i}" for i in range(10))
    u = " ".join(f"u{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, s + " " + u, "web"), (2, s, "web"), (3, s + " " + s, "books")],
        "doc_id long, text string, source string",
    )
    out = {r.doc_id: r for r in chunk_dedup_apply(df, words_per_chunk=10).collect()}
    assert out[1].text == s + " " + u  # first occurrence keeps everything
    assert out[2].text == ""  # whole doc was a dup chunk
    assert out[3].text == ""  # both copies lose to doc 1's chunk 0
    assert out[3].source == "books"  # non-text columns survive
    # intra-doc self-dup with no external competitor: first copy stays
    v = " ".join(f"v{i}" for i in range(10))
    solo = spark.createDataFrame([(9, v + " " + v)], "doc_id long, text string")
    assert chunk_dedup_apply(solo, words_per_chunk=10).collect()[0].text == v


def test_decontaminate_stream_filter_matches_batch_join_tier(spark):
    """The stateless stream filter and the batch anti-join must agree
    on the driver testdata corpus (same grams, same verdicts)."""
    from telemetry_streaming_spark.operators.contamination import (
        decontaminate,
        decontaminate_stream,
    )
    from telemetry_streaming_spark.sources.registry import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents", parallelize=False)
    bench = docs.where(F.col("doc_id") % 17 == 0)
    train = docs.where(F.col("doc_id") % 17 != 0)
    a = {r.doc_id for r in decontaminate(train, bench, n=4).collect()}
    b = {r.doc_id for r in decontaminate_stream(train, bench, n=4).collect()}
    assert a == b
