"""Behavioral tests for the extension operators: planted exact and
near duplicates must be found; LSH tiers must agree with their exact
verifiers."""

import pyspark.sql.functions as F
import pytest

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm fire and the birds sing in the tall green trees"
)
NEAR = BASE.replace("lazy dog", "lazy wolf")  # one-token edit
OTHER = (
    "completely different content about spark query engines and "
    "distributed aggregation pipelines running on large clusters today"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact dup of 1
        (3, NEAR),  # near dup of 1/2
        (4, OTHER),
        (5, "Short Doc! " + OTHER.upper()),  # case/punct variant of 4
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_dedup_exact_groups(docs):
    from telemetry_streaming_spark.operators.dedup import dedup_exact

    out = dedup_exact(docs).collect()
    groups = {r.keeper_id: r.n_copies for r in out}
    assert groups[1] == 2  # docs 1+2 collapse
    # normalization folds case/punct, but doc 5 has an extra prefix -> distinct
    assert sum(groups.values()) == 5


def test_ngram_jaccard_finds_near_dup(docs):
    from telemetry_streaming_spark.operators.dedup import ngram_jaccard_pairs

    pairs = {(r.id1, r.id2): r.jaccard for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.5 < pairs[(1, 3)] < 1.0


def test_containment_catches_quoted_doc(spark):
    """A small doc fully quoted inside a big one must score containment
    ~1.0 in the small->big direction even though Jaccard is low."""
    from telemetry_streaming_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    small = "alpha beta gamma delta epsilon zeta"
    big = small + (
        " plus a very long tail of unrelated filler words stretching on "
        "and on with more and more distinct vocabulary items appearing "
        "here so the union grows large while the intersection stays small"
    )
    docs = spark.createDataFrame([(1, small), (2, big)], ["doc_id", "text"])
    cont = {
        (r.src, r.dst): r.containment
        for r in ngram_containment_pairs(docs, threshold=0.5).collect()
    }
    assert cont[(1, 2)] == 1.0  # every shingle of the small doc is in the big one
    assert (2, 1) not in cont  # big->small direction is far below threshold
    jac = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert jac == []  # symmetric Jaccard misses the quotation entirely


def test_incremental_minhash_against_index(spark, docs):
    """A new batch doc near-duplicating an INDEXED doc is flagged;
    passing the persisted band index gives byte-identical results to
    recomputing it (the index-reuse contract a nightly deployment
    relies on); batch-vs-batch pairs are out of scope by design."""
    from telemetry_streaming_spark.operators.dedup import (
        banded_signatures,
        incremental_minhash_dedup,
    )

    corpus = docs.where(F.col("doc_id") <= 3)  # BASE, BASE-dup, NEAR, OTHER
    batch = spark.createDataFrame(
        [(10, BASE), (11, "totally novel content unlike anything indexed so far today")],
        ["doc_id", "text"],
    )
    got = incremental_minhash_dedup(batch, corpus, threshold=0.5).collect()
    flagged = {(r.batch_id, r.corpus_id) for r in got}
    assert (10, 1) in flagged and (10, 2) in flagged  # exact copies of BASE
    assert all(b != 11 for b, _ in flagged)  # the novel doc is admitted
    # precomputed index path == recompute path
    idx = banded_signatures(corpus)
    via_index = incremental_minhash_dedup(
        batch, corpus, threshold=0.5, corpus_bands=idx
    ).collect()
    assert sorted(map(str, via_index)) == sorted(map(str, got))


def test_banded_signatures_carry_cols_keep_sides_separate(spark):
    """r10: incremental_minhash_dedup now bands batch + corpus in ONE
    tagged scan, threading a side tag through the signature aggregate
    as an extra group key.  Pin the subtle case that fusion must not
    break: the SAME doc_id on both sides stays two separate signature
    rows (grouped by (id, side)), each equal to the per-side result."""
    from telemetry_streaming_spark.operators.dedup import banded_signatures

    a = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    b = spark.createDataFrame(
        [(1, "one two three four five six seven")], ["doc_id", "text"]
    )
    tagged = a.withColumn("__side", F.lit("a")).unionByName(
        b.withColumn("__side", F.lit("b"))
    )
    fused = banded_signatures(tagged, carry_cols=("__side",)).collect()
    sep = banded_signatures(a).withColumn("__side", F.lit("a")).unionByName(
        banded_signatures(b).withColumn("__side", F.lit("b"))
    ).select("doc_id", "__side", "band", "band_key").collect()
    key = lambda r: (r["doc_id"], r["__side"], r["band"], r["band_key"])
    assert sorted(map(key, fused)) == sorted(map(key, sep))
    # both sides present, same id — 4 bands each
    sides = {r["__side"] for r in fused}
    assert sides == {"a", "b"} and len(fused) == 8


def test_text_chunks_no_redundant_tail(spark):
    """Every chunk must contain at least one token no earlier chunk
    covers: ceil((n-overlap)/stride) starts, not ceil(n/stride) —
    the naive count ships a fully-contained trailing chunk whenever
    n mod stride is in 1..overlap."""
    from telemetry_streaming_spark.operators.contamination import text_chunks

    for n_toks in range(1, 12):
        doc = " ".join(f"t{i}" for i in range(n_toks))
        df = spark.createDataFrame([(1, doc)], ["doc_id", "text"])
        rows = sorted(
            text_chunks(df, chunk_tokens=4, overlap=1).collect(),
            key=lambda r: r.chunk_idx,
        )
        covered = set()
        for r in rows:
            toks = set(r.chunk.split())
            assert toks - covered, f"n={n_toks}: chunk {r.chunk_idx} redundant"
            covered |= toks
        assert covered == {f"t{i}" for i in range(n_toks)}  # full coverage


def test_minhash_lsh_finds_near_dup(docs):
    from telemetry_streaming_spark.operators.dedup import minhash_lsh_pairs

    pairs = {(r.id1, r.id2) for r in minhash_lsh_pairs(docs, threshold=0.3).collect()}
    # exact dup pair must always collide in every band
    assert (1, 2) in pairs
    # near-dup should collide in at least one of 4 bands (high prob on
    # a 0.85-jaccard pair with 2-row bands) and survive verification
    assert (1, 3) in pairs


def test_simhash_near_dup_distance(docs):
    from telemetry_streaming_spark.operators.dedup import simhash48

    sims = {r.doc_id: r.simhash for r in simhash48(docs).collect()}
    assert sims[1] == sims[2]
    ham_13 = bin(sims[1] ^ sims[3]).count("1")
    ham_14 = bin(sims[1] ^ sims[4]).count("1")
    assert ham_13 < ham_14, f"near-dup hamming {ham_13} should beat unrelated {ham_14}"


def test_simhash_pairs_bucket_recall(docs):
    from telemetry_streaming_spark.operators.dedup import simhash_pairs

    pairs = {(r.id1, r.id2): r.hamming for r in simhash_pairs(docs, max_hamming=6).collect()}
    assert pairs.get((1, 2)) == 0


def test_lsh_similarity_recall(spark):
    from telemetry_streaming_spark.operators.similarity import cosine_topk, cosine_topk_lsh
    from telemetry_streaming_spark.sources.registry import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, queries, k=5).collect()}
    approx = cosine_topk_lsh(emb, queries, k=5).collect()
    approx_pairs = {(r.query_id, r.neighbor_id) for r in approx}
    # single-probe SRP with 6 planes: every query must at least get
    # candidates, and bucketing must not hallucinate scores
    assert approx_pairs, "LSH returned nothing"
    for r in approx:
        assert -1.0001 <= r.cos <= 1.0001
    # recall sanity: some overlap with exact top-5
    assert len(exact & approx_pairs) > 0


def test_ivf_assignment_covers_corpus_and_is_deterministic(spark):
    from telemetry_streaming_spark.operators.similarity import ivf_assign, ivf_centroids
    from telemetry_streaming_spark.sources.registry import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    c1 = ivf_centroids(emb, nlist=8, iters=2)
    c2 = ivf_centroids(emb, nlist=8, iters=2)
    assert c1 == c2  # deterministic seeds + deterministic refinement
    assigned = ivf_assign(emb, c1)
    assert assigned.count() == emb.count()
    assert assigned.where("ivf_cluster IS NULL").count() == 0
    assert assigned.select("ivf_cluster").distinct().count() <= 8


def test_ivf_topk_recall_vs_exact(spark):
    import pyspark.sql.functions as F
    from telemetry_streaming_spark.operators.similarity import cosine_topk, cosine_topk_ivf
    from telemetry_streaming_spark.sources.registry import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, queries, k=5).collect()}
    approx = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_ivf(emb, queries, k=5, nlist=8, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"IVF recall {recall} too low"
    # probing every list must reproduce the exact result
    full = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_ivf(emb, queries, k=5, nlist=8, nprobe=8).collect()
    }
    assert full == exact


def test_lsh_work_scales_below_exact_tier(spark):
    """Scale-work property of the LSH tier (VERDICT r1 finding 1).

    On a dense corpus — many docs sharing below-df-cap shingles — the
    exact tier must examine every pair sharing ANY surviving shingle,
    while LSH only examines pairs agreeing on a full signature band.
    Assert the *work* (candidate pairs generated) separates by >20x,
    and that LSH still finds the planted near-dup pairs.  Counting
    work instead of wall-clock keeps the test deterministic.
    """
    from telemetry_streaming_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_lsh_pairs,
        shingle_index,
    )
    import pyspark.sql.functions as F

    # 600 docs built from 10 phrases each, drawn from a pool of 150
    # 3-word phrases: each phrase's internal shingle is shared by
    # ~40 docs (well under the df cap of 100), so the exact tier's
    # inverted index pairs up most of the corpus.
    def phrase(p):
        return f"w{p}a w{p}b w{p}c"

    import random

    rng = random.Random(42)
    rows = []
    for i in range(600):
        phrases = [phrase(p) for p in rng.sample(range(150), 10)]
        rows.append((i, " ".join(phrases)))
    # planted near-dups: clones of docs 0..9 with one phrase changed
    for k in range(10):
        base = rows[k][1].split()
        base[0] = "zz"  # perturb one token
        rows.append((10_000 + k, " ".join(base)))
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(8)

    idx = shingle_index(docs, max_df=100)
    exact_work = (
        idx.select(F.explode("ids").alias("id1"), "ids")
        .select("id1", F.explode("ids").alias("id2"))
        .where(F.col("id1") < F.col("id2"))
        .distinct()
        .count()
    )
    lsh_work = minhash_lsh_candidates(docs).count()
    assert lsh_work * 20 < exact_work, (exact_work, lsh_work)

    found = {(r.id1, r.id2) for r in minhash_lsh_pairs(docs, threshold=0.6).collect()}
    for k in range(10):
        assert (k, 10_000 + k) in found
    spark.catalog.clearCache()


def test_quantize_roundtrip_error_bounded(spark):
    """Dequantized values must sit within half a quantization step of
    the originals, and constant vectors map to code 0."""
    from telemetry_streaming_spark.operators.similarity import quantize_embeddings

    rows = [
        (1, [0.0, 0.5, 1.0, 0.25]),
        (2, [3.0, 3.0, 3.0, 3.0]),   # constant
        (3, [-2.0, 2.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    assert out[2].q == [0, 0, 0, 0] and out[2].q_scale == 0.0
    for vid, vec in [(1, rows[0][1]), (3, rows[2][1])]:
        r = out[vid]
        for code, x in zip(r.q, vec):
            assert 0 <= code <= 255
            assert abs((r.q_min + code * r.q_scale) - x) <= r.q_scale / 2 + 1e-12


def test_dedup_against_incremental(spark):
    """Batch rows collapse per-fingerprint (min-id keeper), anything
    already in the corpus is dropped, genuinely new text survives."""
    from telemetry_streaming_spark.operators.dedup import dedup_against

    corpus = spark.createDataFrame(
        [(1, "seen before"), (2, "also seen")], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [
            (10, "seen before"),    # already ingested -> dropped
            (11, "brand new"),
            (12, "brand new"),      # in-batch dup -> one keeper (11)
            (13, "another new"),
        ],
        ["doc_id", "text"],
    )
    out = {r.keeper_id for r in dedup_against(corpus, batch).collect()}
    assert out == {11, 13}


def test_approx_quantiles_rank_error_bounded(spark):
    """The sketch twin must land within the documented rank error of
    the exact percentiles: with accuracy=10000 and n~2k values per
    group the estimate is exact-to-adjacent-rank, so allow the value
    gap between neighboring ranks."""
    from telemetry_streaming_spark.plans.queries import QUERIES
    from tests.conftest import SF_CORRECTNESS

    exact = {
        r["event_type"]: r
        for r in QUERIES["value_quantiles"].fn(spark, SF_CORRECTNESS).collect()
    }
    approx = {
        r["event_type"]: r
        for r in QUERIES["approx_value_quantiles"].fn(spark, SF_CORRECTNESS).collect()
    }
    assert set(exact) == set(approx)
    from telemetry_streaming_spark.sources.registry import load_table

    events = load_table(spark, SF_CORRECTNESS, "events")
    for etype, e in exact.items():
        a = approx[etype]
        n = e["n"]
        assert a["n"] == n
        vals = sorted(
            r["value"]
            for r in events.where(F.col("event_type") == etype).select("value").collect()
        )
        for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            # rank window: exact rank +- max(1, n/accuracy)
            slack = max(1, n // 10000)
            rank = int(q * (n - 1))
            lo = vals[max(0, rank - slack - 1)]
            hi = vals[min(n - 1, rank + slack + 1)]
            assert lo <= a[col] <= hi, (etype, col, a[col], lo, hi)


def test_deletion_neighborhood_pairs_matches_naive(spark):
    """late r8: FastSS deletion-neighborhood join == naive all-pairs
    levenshtein <= 1 on a hand vocabulary covering substitution
    (hello/hallo), deletion/insertion (hell/hello, variable length),
    a same-length non-match (help/hell is distance 1 — included —
    vs world/help distance 5), and an isolated token."""
    import itertools

    from pyspark.sql import Row

    from telemetry_streaming_spark.operators.dedup import (
        deletion_neighborhood_pairs,
    )

    vocab = ["hello", "hallo", "hell", "help", "world", "word", "wort", "xyz"]

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    naive = sorted(
        (a, b) for a, b in itertools.combinations(sorted(vocab), 2) if lev(a, b) <= 1
    )
    toks = spark.createDataFrame([Row(token=t) for t in vocab])
    got = sorted(
        (r.tok_a, r.tok_b) for r in deletion_neighborhood_pairs(toks).collect()
    )
    assert got == naive


def test_deletion_neighborhood_pairs_drops_empty_and_null_tokens(spark):
    """r9 (r8 ADVICE): zero-length and NULL tokens must be filtered up
    front — sequence(1, 0) infers step -1 and would emit spurious
    [1, 0] variant rows for an empty string.  'a' and 'b' are both
    distance-1 from '' via their deletion variant, but the empty token
    is excluded by contract, so only the (a, b) substitution pair
    survives."""
    from pyspark.sql import Row
    from pyspark.sql.types import StringType, StructField, StructType

    from telemetry_streaming_spark.operators.dedup import (
        deletion_neighborhood_pairs,
    )

    schema = StructType([StructField("token", StringType(), True)])
    toks = spark.createDataFrame(
        [Row(token="a"), Row(token="b"), Row(token=""), Row(token=None)],
        schema,
    )
    got = sorted(
        (r.tok_a, r.tok_b) for r in deletion_neighborhood_pairs(toks).collect()
    )
    assert got == [("a", "b")]


def test_setsim_prefix_pairs_matches_naive(spark):
    """r9: the prefix-filtered exact set-similarity join returns
    EXACTLY the pairs a naive all-pairs Jaccard computation yields —
    including boundary cases (jaccard == t exactly, identical sets,
    disjoint sets, a subset pair below t)."""
    import itertools

    from pyspark.sql import Row

    from telemetry_streaming_spark.operators.dedup import setsim_prefix_pairs

    docs = {
        1: "a b c d",
        2: "a b c e",      # J(1,2) = 3/5 = 0.6
        3: "a b c d",      # J(1,3) = 1
        4: "x y z",        # disjoint from 1-3
        5: "x y z w v",    # J(4,5) = 3/5
        6: "a b",          # subset of 1, J(1,6) = 2/4 = 0.5
        7: "  a   b  c d ",  # whitespace noise, same set as 1
    }

    def jac(s, t):
        return len(s & t) / len(s | t)

    sets = {k: set(v.split()) for k, v in docs.items()}
    num, den = 3, 5
    expect = sorted(
        (i, j)
        for i, j in itertools.combinations(sorted(docs), 2)
        if den * len(sets[i] & sets[j]) >= num * len(sets[i] | sets[j])
    )
    df = spark.createDataFrame([Row(doc_id=k, text=v) for k, v in docs.items()])
    got = setsim_prefix_pairs(df, threshold_num=num, threshold_den=den)
    got_pairs = sorted((r.id1, r.id2) for r in got.collect())
    assert got_pairs == expect
    # spot-check the integer score: J(1,2) = 3/5 -> 600000
    by_pair = {(r.id1, r.id2): r for r in got.collect()}
    assert by_pair[(1, 2)].jaccard_e6 == 600_000
    assert by_pair[(1, 3)].jaccard_e6 == 1_000_000
    assert by_pair[(1, 3)].n_common == 4


def test_setsim_prefix_pairs_rejects_bad_threshold(spark):
    import pytest

    from telemetry_streaming_spark.operators.dedup import setsim_prefix_pairs

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        setsim_prefix_pairs(df, threshold_num=0, threshold_den=2)
    with pytest.raises(ValueError):
        setsim_prefix_pairs(df, threshold_num=3, threshold_den=2)


def test_sized_shingle_rows_match_pairs_and_sizes(spark):
    """r10 session 2: the LSH verify tier's gram frame became ONE
    collect_set aggregate with the per-doc set size carried in-row
    (``_sized_shingle_rows``) — this pins its contract against the
    reference shape it replaced: the (id, shingle_h) multiset must
    equal ``doc_shingle_pairs`` exactly, and every row's ``sz`` must
    equal its doc's distinct-shingle count."""
    from pyspark.sql import Row

    from telemetry_streaming_spark.operators.dedup import (
        _sized_shingle_rows,
        doc_shingle_pairs,
    )

    docs = spark.createDataFrame([
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=2, text="the quick brown fox jumps over the lazy cat"),
        Row(doc_id=3, text="one two three"),          # single shingle
        Row(doc_id=4, text="a a a a a"),              # repeated gram
    ])
    rows = _sized_shingle_rows(docs, "text", "doc_id", 3).collect()
    ref = doc_shingle_pairs(docs, "text", "doc_id", 3).collect()
    assert sorted((r.doc_id, r.shingle_h) for r in rows) == sorted(
        (r.doc_id, r.shingle_h) for r in ref
    )
    from collections import Counter
    want_sizes = Counter(r.doc_id for r in ref)
    for r in rows:
        assert r.sz == want_sizes[r.doc_id], (r.doc_id, r.sz)
