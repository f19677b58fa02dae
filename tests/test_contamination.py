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


class TestDupSpanRemoval:
    def _corpus(self, spark):
        boiler = "all rights reserved contact us at example dot com today"  # 10 toks
        rows = [
            (1, f"alpha beta gamma {boiler} delta epsilon zeta"),
            (2, f"one two three four {boiler} five six seven eight"),
            (3, boiler),                      # fully duplicated -> empty
            (4, "totally unique sentence with nothing repeated anywhere at all ok"),
            (5, "short doc"),                 # < n tokens -> untouched
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_removal_matches_python_replica(self, spark):
        from telemetry_streaming_spark.operators.contamination import (
            remove_duplicated_spans,
        )

        docs = self._corpus(spark)
        n, mc = 8, 2
        toks = {r.doc_id: r.text.strip().split() for r in docs.collect()}
        from collections import Counter

        counts = Counter()
        for t in toks.values():
            for i in range(len(t) - n + 1):
                counts[" ".join(t[i : i + n])] += 1
        expect = {}
        for d, t in toks.items():
            covered = set()
            for i in range(len(t) - n + 1):
                if counts[" ".join(t[i : i + n])] >= mc:
                    covered.update(range(i, i + n))
            expect[d] = " ".join(tok for j, tok in enumerate(t) if j not in covered)
        got = {
            r.doc_id: r.text
            for r in remove_duplicated_spans(docs, n=n, min_count=mc).collect()
        }
        assert got == expect
        assert got[3] == ""                      # fully-covered doc survives empty
        assert got[4] == " ".join(toks[4]) and got[5] == " ".join(toks[5])

    def test_no_per_token_explode_in_plan(self, spark):
        """The engine merges windows into spans and re-slices gaps —
        the only Generate in the plan is the WINDOW-position explode,
        never a covered-token-position explode."""
        from telemetry_streaming_spark.operators.contamination import (
            remove_duplicated_spans,
        )

        docs = self._corpus(spark)
        plan = (
            remove_duplicated_spans(docs)
            ._jdf.queryExecution().optimizedPlan().toString()
        )
        assert plan.count("Generate explode") == 1, plan

    def test_stats_consistent_with_removal(self, spark):
        import pyspark.sql.functions as F

        from telemetry_streaming_spark.operators.contamination import (
            dup_span_stats,
            remove_duplicated_spans,
        )

        docs = self._corpus(spark).withColumn("source", F.lit("s"))
        stats = dup_span_stats(docs).collect()[0]
        cleaned = remove_duplicated_spans(docs.select("doc_id", "text"))
        kept_tokens = sum(
            len(r.text.split()) if r.text else 0 for r in cleaned.collect()
        )
        assert stats.total_tokens - stats.covered_tokens == kept_tokens
        assert stats.affected_docs == 3


def test_adjacent_duplicated_windows_merge_to_one_span(spark):
    """Windows whose covered ranges touch ([p, p+n-1] then [p+n, ...])
    must merge into one maximal span (review finding: strict > left
    adjacent coverage split into two spans)."""
    from telemetry_streaming_spark.operators.contamination import duplicated_spans

    n = 3
    # doc 1 & 2 share tokens 1-3 AND tokens 4-6, but the boundary
    # window (2 3 4 / 3 4 5) differs between them -> windows at pos 1
    # and pos 4 are duplicated, boundary windows are not; coverage
    # 1..6 is contiguous
    docs = spark.createDataFrame(
        [(1, "a b c d e f tail1 x1"), (2, "a b c q d e f tail2 x2")],
        "doc_id long, text string",
    )
    # in doc1: "a b c" (pos1) and "d e f" (pos4) both appear in doc2
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(docs, n=n, min_count=2).collect()
    }
    doc1 = sorted(s for s in spans if s[0] == 1)
    assert doc1 == [(1, 1, 6)], spans
