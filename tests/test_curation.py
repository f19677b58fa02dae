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
