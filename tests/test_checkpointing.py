"""Lineage-cut contract: local vs reliable checkpoint modes produce
identical results, invalid modes fail fast, and the materializing
operators leave NOTHING in the cache manager (the r2 cache-ownership
footgun — callers needing clearCache — is gone)."""

import pytest
import pyspark.sql.functions as F

from telemetry_streaming_spark.operators.checkpointing import cut_lineage
from telemetry_streaming_spark.operators.components import connected_components
from telemetry_streaming_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs


def _docs(spark):
    rows = []
    base = "the quick brown fox jumps over the lazy dog again and again %d"
    for i in range(30):
        rows.append((i, base % (i % 7)))
    rows.append((100, base % 1))  # planted dup of doc 1's text
    return spark.createDataFrame(rows, "doc_id long, text string")


def _edges(spark):
    # two chains + one triangle -> components {1,2,3,4}, {10,11}, {20,21,22}
    return spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id1 long, id2 long",
    )


@pytest.fixture
def reliable_dir(spark, tmp_path):
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    yield
    # leave the dir set; next reliable test overwrites it


def test_cut_lineage_rejects_unknown_mode(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="checkpoint_mode"):
        cut_lineage(df, "durable")


def test_reliable_mode_requires_checkpoint_dir(spark):
    if spark.sparkContext.getCheckpointDir() is not None:
        pytest.skip("checkpoint dir already set on the shared context")
    with pytest.raises(ValueError, match="setCheckpointDir"):
        cut_lineage(spark.range(3), "reliable")


def test_connected_components_identical_across_modes(spark, reliable_dir):
    edges = _edges(spark)
    local = {(r.id, r.component) for r in connected_components(edges).collect()}
    reliable = {
        (r.id, r.component)
        for r in connected_components(edges, checkpoint_mode="reliable").collect()
    }
    assert local == reliable
    assert {c for _, c in local} == {1, 10, 20}


def test_minhash_lsh_pairs_identical_across_modes(spark, reliable_dir):
    docs = _docs(spark)
    local = {(r.id1, r.id2) for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    reliable = {
        (r.id1, r.id2)
        for r in minhash_lsh_pairs(docs, threshold=0.5, checkpoint_mode="reliable").collect()
    }
    assert local == reliable
    assert (1, 100) in local


def test_repeated_calls_leave_cache_manager_empty(spark):
    """ngram_jaccard_pairs / minhash_lsh_pairs / distinctive_terms used
    to persist() internal frames and rely on callers to clearCache();
    they now cut lineage with self-cleaning checkpoints, so a
    long-lived session accumulates zero cache-manager entries."""
    from telemetry_streaming_spark.operators.tfidf import distinctive_terms

    docs = _docs(spark).withColumn("source", (F.col("doc_id") % 3).cast("string"))
    spark.catalog.clearCache()  # start from a known-empty state
    for _ in range(2):
        ngram_jaccard_pairs(docs, threshold=0.3).collect()
        minhash_lsh_pairs(docs, threshold=0.3).collect()
        distinctive_terms(docs, top_k=3).collect()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_incremental_minhash_dedup_identical_across_modes(spark, reliable_dir):
    """The incremental index-probe path cuts lineage on the combined
    band table; reliable mode must not change which batch docs are
    flagged against the corpus index."""
    from telemetry_streaming_spark.operators.dedup import incremental_minhash_dedup

    corpus = _docs(spark)
    batch = spark.createDataFrame(
        [(200, "the quick brown fox jumps over the lazy dog again and again 1"),
         (201, "completely unrelated fresh text with novel vocabulary entirely")],
        "doc_id long, text string",
    )
    local = {
        (r.batch_id, r.corpus_id)
        for r in incremental_minhash_dedup(batch, corpus, threshold=0.5).collect()
    }
    reliable = {
        (r.batch_id, r.corpus_id)
        for r in incremental_minhash_dedup(
            batch, corpus, threshold=0.5, checkpoint_mode="reliable"
        ).collect()
    }
    assert local == reliable
    assert 200 in {b for b, _ in local} and 201 not in {b for b, _ in local}
