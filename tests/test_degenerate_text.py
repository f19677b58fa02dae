"""Real corpora contain null, empty, and whitespace-only documents;
every text-path operator must pass them through without raising and
with sane semantics (dropped or scored null, never a crash — ANSI
mode turns silent arithmetic edge cases into runtime errors, so these
are load-bearing at 100TB)."""

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def weird_docs(spark):
    rows = [
        (1, None, "en", "src0", 0),
        (2, "", "en", "src0", 0),
        (3, "   ", "en", "src0", 3),
        (4, "one", "en", "src1", 3),
        (5, "a normal little document with several words in it", "en", "src1", 49),
        (5 + 1, "\t\n  \n", "en", "src2", 5),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")


def test_dedup_tiers_survive_degenerate_docs(weird_docs):
    from telemetry_streaming_spark.operators.dedup import (
        dedup_exact,
        minhash_lsh_pairs,
        ngram_containment_pairs,
        ngram_jaccard_pairs,
        simhash_pairs,
    )

    assert dedup_exact(weird_docs).count() >= 1
    assert ngram_jaccard_pairs(weird_docs).collect() == []
    assert ngram_containment_pairs(weird_docs).collect() == []
    assert minhash_lsh_pairs(weird_docs).collect() == []
    assert simhash_pairs(weird_docs).count() >= 0


def test_text_functions_survive_degenerate_docs(weird_docs):
    from telemetry_streaming_spark.functions import text as T

    c = F.col("text")
    out = weird_docs.select(
        "doc_id",
        T.token_count(c).alias("tc"),
        T.quality_score(c).alias("q"),
        T.quality_logit(c).alias("lg"),
        T.lang_id(c).alias("lang"),
        T.fingerprint(c).alias("fp"),
        T.bpe_token_count(c).alias("bpe"),
        T.redact_pii(c).alias("red"),
    ).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].fp is None  # null text -> null everywhere, no crash
    assert by_id[5].tc == 9 and by_id[5].lang == "en"


def test_curation_funnel_survives_degenerate_docs(spark, weird_docs):
    from telemetry_streaming_spark.ext.curation import CurationConfig, curate

    out = curate(
        weird_docs,
        CurationConfig(min_tokens=2, max_tokens=100, min_quality=0.0,
                       keep_langs=("en", "und"),
                       # tiny docs have all-unique 2-grams; don't let the
                       # boilerplate gate flag them in this fixture
                       max_top_frac=1.0),
    )
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert 5 in ids  # the real document survives
    assert {1, 2, 3}.isdisjoint(ids)  # null/empty/whitespace gated out


def test_export_survives_degenerate_docs(spark, weird_docs, tmp_path):
    from telemetry_streaming_spark.operators.export import export_shards, shard_manifest

    path = str(tmp_path / "weird_shards")
    export_shards(weird_docs, path, n_shards=2, salt="w")
    back = spark.read.parquet(path)
    assert back.count() == weird_docs.count()  # nulls shard fine (md5 of id)
    m = shard_manifest(weird_docs, "doc_id", 2, "w")
    assert sum(r.n_rows for r in m.collect()) == weird_docs.count()


def test_rare_token_and_repetition_survive(spark, weird_docs):
    from telemetry_streaming_spark.operators.repetition import ngram_repetition

    assert ngram_repetition(weird_docs).count() >= 0
    # rare_token_score guard: \S regex (plain trim strips only spaces,
    # so a tab-only doc would otherwise emit empty-string tokens)
    docs = weird_docs.where(F.col("text").rlike(r"\S"))
    tok = docs.select(
        "doc_id",
        F.explode(
            F.split(F.expr(r"trim(BOTH ' \t\r\n' FROM lower(text))"), r"\s+")
        ).alias("t"),
    )
    assert tok.where(F.col("t") == "").count() == 0


def test_span_removal_survives_degenerate_docs(weird_docs):
    """NULL / empty / whitespace-only docs pass through span removal
    without raising; NULL text stays NULL-or-empty, never a crash."""
    from telemetry_streaming_spark.operators.contamination import (
        dup_span_stats,
        remove_duplicated_spans,
    )

    out = remove_duplicated_spans(weird_docs.select("doc_id", "text")).collect()
    assert len(out) == 6
    by_id = {r.doc_id: r.text for r in out}
    assert by_id[5].startswith("a normal")
    stats = dup_span_stats(weird_docs.select("doc_id", "text", "source")).collect()
    assert sum(r.n_docs for r in stats) == 6


def test_r4_text_queries_survive_degenerate_docs(spark, weird_docs, tmp_path):
    """The r4 text-path registry queries run over a degenerate corpus
    without raising (ANSI edge hardening)."""
    import os

    from telemetry_streaming_spark.plans.queries import QUERIES

    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    weird_docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    for name in (
        "cross_source_leakage", "domain_cap_sample", "doc_length_buckets",
        "text_ngram_topk", "dedup_normalized", "source_length_quantiles",
        "dup_span_removal", "dup_span_stats",
    ):
        assert QUERIES[name].fn(spark, d).count() >= 0, name
