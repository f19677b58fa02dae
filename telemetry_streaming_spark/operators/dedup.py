"""Deduplication operators for 100TB-scale corpora.

Four tiers, increasing recall for near-duplicates:

1. **Exact** (`dedup_exact`): hash-groupBy on a canonical fingerprint.
   One shuffle on the md5 key; map-side combine collapses duplicates
   before the exchange.  At 100TB this is the cheapest possible dedup.

2. **N-gram Jaccard** (`ngram_jaccard_pairs`): exact set-similarity
   via a shingle inverted index + self-join.  Document-frequency cap
   on shingles bounds the quadratic bucket blowup (a shingle shared by
   >max_df docs carries no discriminating signal and is dropped —
   standard trick to keep the candidate join linear-ish).

3. **MinHash + LSH** (`minhash_lsh_pairs`): banded minhash signatures.
   The min-hash is the minimum of affine permutations of a truncated
   md5 gram hash (one md5 per gram regardless of permutation count) —
   deterministic and identical across engines (DuckDB-oracle-able,
   unlike murmur-based hashes).  Candidates come from band-bucket
   groupings; pairs are verified with true Jaccard computed on the
   candidates only.  Shuffle volume is O(docs x bands), never
   O(docs^2).

4. **SimHash** (`simhash48`, `simhash_pairs`): 48-bit simhash (12 md5
   nibbles; 48 so per-term arithmetic stays exact in IEEE double for
   the SQL oracle).  Near-dup candidates via band-equality buckets
   (4 x 12-bit chunks — Hamming distance <=3 guarantees at least one
   identical chunk by pigeonhole), verified with bit_count(xor).

All four are pure DataFrame ops — no UDFs, no collect().
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from telemetry_streaming_spark.functions.text import fingerprint, tokenize
from telemetry_streaming_spark.operators.checkpointing import cut_lineage

SIMHASH_NIBBLES = 12  # 48 bits
SIMHASH_BANDS = 4  # 12 bits per band -> hamming<=3 always collides somewhere

# LSH bucket-size guard (minhash bands, simhash chunks): a bucket
# bigger than this is degenerate — its members are near-identical mass
# duplicates that tier 1 (exact dedup) already collapses — and the
# O(bucket^2) map-side pair expansion would make one task a straggler.
# Mirrored verbatim in the DuckDB oracles (HAVING COUNT(*) <= cap) so
# the correctness check covers the capped semantics, not an
# approximation of them.
MAX_LSH_BUCKET = 500


def _drop_hot_keys(df: DataFrame, key_cols: list[str], max_count: int) -> DataFrame:
    """Drop rows whose key group exceeds ``max_count`` members —
    *before* any ``collect_list`` materializes the group (ADVICE r1).

    Shape: a cheap count aggregate (map-side partial combine, so the
    shuffle carries one row per distinct key per mapper), keep only
    the **hot** keys (few, by construction — stopword shingles or
    degenerate LSH buckets), broadcast them into a left-anti join.
    The guard costs one narrow aggregation and zero extra shuffles of
    ``df`` itself; no aggregation buffer anywhere holds more than one
    (key, count) pair, and the O(group^2) downstream pair expansion
    never sees a hot key.  (A count-window variant was measured 5-10x
    slower locally: WindowExec sorts the whole input and re-reads it,
    vs. this shape's partial-agg + broadcast probe.)
    """
    hot = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") > max_count)
        .select(*key_cols)
    )
    return df.join(F.broadcast(hot), key_cols, "left_anti")


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Tier 1: exact duplicate groups by normalized-text fingerprint.

    Returns (fingerprint, keeper_id, n_copies); keeper is the minimum
    id.  Downstream `filter(n_copies > 1)` lists actual dup groups.
    """
    return (
        df.select(fingerprint(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_copies"))
    )


def shingle_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3, max_df: int = 100
) -> DataFrame:
    """Grouped inverted index: one row per surviving shingle with the
    (bounded, <= max_df) postings list.

    Shingles are hashed to 64-bit longs (xxhash64) before the shuffle —
    the 3-word shingle strings never leave the map side, which cuts
    exchange volume ~5x at any scale.  A 64-bit hash collision across a
    realistic shingle vocabulary (say 10^10 distinct shingles at 100TB)
    has probability ~10^-9 per pair of distinct shingles sharing a hash
    AND a document — far below the LSH tiers' own approximation error.

    The document-frequency cap is applied *before* the postings
    ``collect_list`` (``_drop_hot_keys``): a shingle shared by more
    than ``max_df`` docs carries no discriminating signal and is
    dropped — the standard guard that keeps candidate generation
    linear-ish instead of quadratic — and because the filter runs
    before the list aggregation, a stopword shingle never materializes
    a million-id aggregation buffer.
    """
    capped = capped_doc_shingles(df, text_col, id_col, n, max_df)
    return capped.groupBy("shingle_h").agg(
        F.collect_list(id_col).alias("ids"), F.count("*").alias("df_count")
    )


def capped_doc_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3, max_df: int = 100
) -> DataFrame:
    """Distinct (doc, shingle-hash) pairs with hot shingles removed.

    The raw material both Jaccard tiers share: ``shingle_index`` folds
    it into per-shingle postings for pair *generation*;
    ``minhash_lsh_pairs`` folds it into per-doc sets for candidate
    *verification*.  Shingles are xxhash64'd before the shuffle so the
    3-word strings never leave the map side.
    """
    pairs = doc_shingle_pairs(df, text_col, id_col, n)
    return _drop_hot_keys(pairs, ["shingle_h"], max_df)


def _exploded_grams(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    with_pos: bool = False,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, gram) rows — plus the 1-based window position as ``pos``
    when ``with_pos`` — via explode-position-then-scalar-concat.
    ``carry_cols`` ride along unchanged (r10: lets a tagged union of
    two corpora share ONE gram scan — see incremental_minhash_dedup).

    Deliberately NOT transform()-based: Spark's higher-order array
    functions run interpreted (no whole-stage codegen), and the
    per-element lambda eval measured 2x slower than this shape —
    explode the gram positions, then build each gram with plain
    codegen'd scalar expressions over the carried token array.
    """
    toks = tokenize(F.col(text_col))
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    carry = [F.col(c) for c in carry_cols]
    e = df.select(
        F.col(id_col), *carry, toks.alias("__toks"), F.explode(idx).alias("__i")
    )
    gram = F.concat_ws(
        " ", *[F.element_at(F.col("__toks"), F.col("__i") + F.lit(j)) for j in range(n)]
    )
    if with_pos:
        return e.select(
            F.col(id_col), *carry, F.col("__i").alias("pos"), gram.alias("gram")
        )
    return e.select(F.col(id_col), *carry, gram.alias("gram"))


def doc_shingle_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Distinct (id, shingle_h) pairs — the oracle's
    unnest(list_distinct(shingles)) as a codegen'd explode + xxhash64 +
    distinct.  The distinct is a narrow (8B+8B)-row shuffle with
    map-side combine; far cheaper than per-doc array_distinct in an
    interpreted higher-order function.
    """
    grams = _exploded_grams(df, text_col, id_col, n)
    return grams.select(F.col(id_col), F.xxhash64("gram").alias("shingle_h")).distinct()


def _sized_shingle_rows(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """``(id, sz, shingle_h)`` — the distinct shingle-hash rows of
    :func:`doc_shingle_pairs` with the per-doc set size carried IN-ROW
    through the explode (r10, guide §2.3/§2.4): one ``groupBy(id)``
    ``collect_set`` aggregate (map-side partial, dedup inside the
    buffer) replaces the narrow distinct AND the separate per-doc size
    aggregate + its join back.  The verify tiers consume this frame on
    both sides of their intersection join, so the former shape ran the
    gram explode four times per query (id1 side, id2 side, and the
    sizes frame once per size join); this shape runs it twice and
    joins nothing.  The set buffer is bounded by per-doc distinct-gram
    arity (roughly document length).  NOTE (r11, ADVICE): that is a
    WEAKER bound than the signature aggregate's — minhash_signatures
    streams grams through O(num_perm) min buffers and never holds the
    set — so a single pathologically large document creates one large
    non-spillable group buffer here where the old distinct+count shape
    kept one row per (id, hash).  Acceptable on this path because only
    candidate-scoped documents (LSH band collisions, bucket-capped)
    ever reach it; a corpus with multi-GB single documents should cap
    doc length upstream before the verify tier."""
    grams = _exploded_grams(df, text_col, id_col, n)
    sets = (
        grams.select(F.col(id_col), F.xxhash64("gram").alias("h"))
        .groupBy(id_col)
        .agg(F.collect_set("h").alias("__s"))
    )
    return sets.select(
        F.col(id_col),
        F.size("__s").cast("long").alias("sz"),
        F.explode("__s").alias("shingle_h"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int = 100,
    persist: bool = True,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Tier 2: exact n-gram Jaccard similarity pairs >= threshold.

    jaccard = |A∩B| / (|A|+|B|-|A∩B|), with both intersection counts
    and set sizes computed from the df-capped index (both engines —
    this impl and the SQL oracle — apply the identical cap).

    Plan shape (one pass over the corpus):
      exploded gram hashes (distinct) -> df-cap guard ->
      groupBy(shingle) postings [persisted] ->
        (a) sizes:   explode postings -> groupBy(doc) count
        (b) pairs:   double-explode postings map-side (bounded by
                     max_df^2/2 per shingle) -> groupBy(id1,id2) count
      -> two size joins (AQE broadcasts them when small).

    Versus a shingle-shuffle self-join this generates candidate pairs
    map-side from each postings list, so the index is shuffled once,
    not three times, and nothing O(docs^2) ever hits an exchange.  The
    postings frame is materialized (``cut_lineage``) because both (a)
    and (b) consume it; at cluster scale this is the natural
    checkpoint of the pipeline.

    **No cache ownership contract**: the index is an eager local/
    reliable checkpoint, not a ``persist()`` — its blocks are dropped
    by the ContextCleaner when the returned frame goes out of scope,
    so long-lived sessions accumulate nothing and callers owe no
    ``clearCache``.  Pass ``persist=False`` to trade the
    materialization for recomputing the shingle scan twice, or
    ``checkpoint_mode="reliable"`` (with a session checkpoint dir set)
    to survive executor loss on multi-hour corpora.
    """
    sized = _postings_pair_counts(df, text_col, id_col, n, max_df, persist, checkpoint_mode)
    jac = F.col("n_common").cast("double") / (
        F.col("size1") + F.col("size2") - F.col("n_common")
    )
    return sized.select("id1", "id2", jac.alias("jaccard")).where(
        F.col("jaccard") >= threshold
    )


def _postings_pair_counts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    max_df: int,
    persist: bool,
    checkpoint_mode: str,
) -> DataFrame:
    """Shared single-pass postings plan of the set-similarity tiers:
    (id1, id2, n_common, size1, size2) for every candidate pair —
    Jaccard and containment differ only in the ratio they derive from
    these five columns, so the index build, hot-key guard, lineage
    cut, and pair generation live HERE once."""
    idx = shingle_index(df, text_col, id_col, n, max_df)
    if persist:
        idx = cut_lineage(idx, checkpoint_mode)
    sizes = idx.select(F.explode("ids").alias(id_col)).groupBy(id_col).agg(
        F.count("*").alias("set_size")
    )
    inter = (
        idx.select(F.explode("ids").alias("id1"), "ids")
        .select("id1", F.explode("ids").alias("id2"))
        .where(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("n_common"))
    )
    s1 = sizes.select(F.col(id_col).alias("id1"), F.col("set_size").alias("size1"))
    s2 = sizes.select(F.col(id_col).alias("id2"), F.col("set_size").alias("size2"))
    return inter.join(s1, "id1").join(s2, "id2")


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
    max_df: int = 100,
    persist: bool = True,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Tier 2b: DIRECTED n-gram containment pairs.

    containment(src -> dst) = |shingles(src) ∩ shingles(dst)| /
    |shingles(src)| — the asymmetric cousin of Jaccard.  A small doc
    fully quoted inside a large one scores containment ~1.0 while its
    Jaccard stays low, so this is the tier that catches boilerplate,
    quotations, and wrapped re-posts that symmetric dedup misses.

    Same single-pass postings plan as ``ngram_jaccard_pairs``
    (``_postings_pair_counts`` — shared, not copied, so a guard or
    checkpoint change there reaches both tiers); the only difference
    is the denominator and that each undirected candidate emits up to
    two directed rows — a map-side 2x on an already-bounded pair set,
    nothing new on an exchange.
    """
    both = _postings_pair_counts(df, text_col, id_col, n, max_df, persist, checkpoint_mode)
    directed = both.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id1").alias("src"),
                    F.col("id2").alias("dst"),
                    (F.col("n_common").cast("double") / F.col("size1")).alias("containment"),
                ),
                F.struct(
                    F.col("id2").alias("src"),
                    F.col("id1").alias("dst"),
                    (F.col("n_common").cast("double") / F.col("size2")).alias("containment"),
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst", "e.containment")
    return directed.where(F.col("containment") >= threshold)


# Universal-hash permutation constants for minhash: sig_p(doc) =
# min over shingles of (A[p] * h(shingle) + B[p]) mod MINHASH_MOD,
# with h = first 48 md5 bits reduced mod 2^30.  One md5 per shingle
# total (the r1 scheme took min-of-md5-strings per permutation — 8
# md5s per shingle — and benched 4x slower); all arithmetic stays
# under 2^41 so it is overflow-exact in both engines' signed 64-bit
# (Spark ANSI mode and DuckDB both reject silent wraparound).
# Mirrored verbatim in the DuckDB oracle (plans/queries.py).
MINHASH_A = (131, 257, 389, 521, 641, 769, 907, 1031)
MINHASH_B = (7, 101, 211, 307, 401, 503, 601, 701)
MINHASH_MOD = 1073741789  # largest prime < 2^30
MINHASH_HMOD = 1 << 30


def _shingle_hash30(s):
    """First 12 md5 nibbles as an integer, reduced mod 2^30 — the
    engine-portable shingle hash behind the minhash permutations."""
    return (F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("long")) % F.lit(MINHASH_HMOD)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 8,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Minhash signature columns sig_0..sig_{p-1} (long-valued): one
    md5 per gram, ``num_perm`` affine permutations folded as min
    aggregates in a single groupBy(id) — fully codegen'd scalar
    expressions + hash-agg with map-side combine (one row per doc per
    mapper crosses the shuffle).  A transform()/array_min variant runs
    interpreted and measured 2-4x slower.  Raw (non-distinct) grams:
    min-hash is duplicate-insensitive.  Docs with no grams (< n
    tokens) emit no signature row — identical to the SQL oracle's
    shingle CTE, which excludes them.
    """
    if num_perm > len(MINHASH_A):
        raise ValueError(f"num_perm <= {len(MINHASH_A)} supported")
    grams = _exploded_grams(df, text_col, id_col, 3, carry_cols=carry_cols)
    h = _shingle_hash30(F.col("gram"))
    return grams.groupBy(id_col, *carry_cols).agg(
        *[
            F.min((F.lit(MINHASH_A[p]) * h + F.lit(MINHASH_B[p])) % F.lit(MINHASH_MOD)).alias(
                f"sig_{p}"
            )
            for p in range(num_perm)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
    n: int = 3,
    max_bucket: int = MAX_LSH_BUCKET,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Tier 3: MinHash-LSH candidate pairs, verified with **true**
    n-gram Jaccard computed on the candidates only — never on the full
    corpus.

    bands x rows = num_perm; a pair collides if all rows of any band
    match.  Verification explodes each candidate pair over id1's
    shingle hashes and counts matches against id2's via one narrow
    equi-join: total verify cost O(candidates x doc-size).  The r1
    shape semi-joined candidates into a full-corpus
    ``ngram_jaccard_pairs``, making LSH strictly more expensive than
    the exact tier it approximates (VERDICT r1 finding 1); this shape
    never touches the quadratic machinery at all.

    Note the scoring difference vs ``ngram_jaccard_pairs``: the exact
    tier df-caps hot shingles to bound *pair generation* — a concern
    the LSH banding already solves — so candidate verification here
    uses the uncapped (true) Jaccard.  On corpora with no shingle
    above the cap the two scores are identical.

    Returns (id1, id2, jaccard >= threshold).
    """
    # Eagerly materialized: the candidate pairs feed the verify join
    # AND the id-only semi-join below — cut_lineage computes the
    # banding pipeline (md5 signature scan included) exactly once and
    # truncates the lineage, so neither broadcast consumer re-runs it
    # (a lazy persist still double-computed under concurrent broadcast
    # builds, measured 2x slower).  checkpoint_mode="reliable" routes
    # both this cut and the banded one inside candidates to the
    # durable checkpoint dir (see operators/checkpointing.py).
    cand = cut_lineage(
        minhash_lsh_candidates(df, text_col, id_col, num_perm, bands, max_bucket, checkpoint_mode),
        checkpoint_mode,
    )
    # Verification over *narrow* exploded pairs: (doc, shingle-hash)
    # longs only — no shingle array or text-derived expression ever
    # appears in a join, so Catalyst cannot infer a null-filter that
    # drags the whole shingle pipeline into the (locally
    # single-partition) parquet scan, and nothing wide crosses an
    # exchange.  (An array-valued doc_sets join variant did exactly
    # that: the inferred isnotnull(size(transform(...))) scan filter
    # re-ran the shingle transform single-threaded, 8-10s at sf0.1.)
    # Only docs that appear in some candidate pair need shingle sets:
    # semi-join the corpus on the (broadcast, id-only) candidate set
    # BEFORE the gram explode, so the verify scan is O(candidate docs)
    # — on a mostly-unique corpus that is a small fraction of |df|.
    # The semi-join probes ids only (no text expression), so Catalyst
    # cannot infer a transform-derived scan filter (see note above).
    cand_ids = (
        cand.select(F.col("id1").alias(id_col))
        .union(cand.select(F.col("id2").alias(id_col)))
        .distinct()
    )
    cand_docs = df.join(F.broadcast(cand_ids), id_col, "left_semi")
    # r10: per-doc set sizes ride IN-ROW through the explode
    # (_sized_shingle_rows) instead of a separate sizes aggregate
    # joined back twice — the gram frame is computed twice (one per
    # intersection side) instead of four times, and the two size
    # joins disappear; min() recovers the constant-per-doc sizes in
    # the same aggregate that counts the intersection.
    rows = _sized_shingle_rows(cand_docs, text_col, id_col, n)
    # Explode each candidate by id1's shingles (candidates broadcast —
    # id pairs only), then count matches against id2's shingles with
    # one narrow equi-join; cost O(candidates x doc-size).
    e1 = rows.select(
        F.col(id_col).alias("id1"), F.col("sz").alias("size1"), "shingle_h"
    ).join(F.broadcast(cand), "id1")
    inter = (
        e1.join(
            rows.select(
                F.col(id_col).alias("id2"), F.col("sz").alias("size2"), "shingle_h"
            ),
            ["id2", "shingle_h"],
        )
        .groupBy("id1", "id2")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.min("size1").alias("size1"),
            F.min("size2").alias("size2"),
        )
    )
    jac = F.col("n_common").cast("double") / (
        F.col("size1") + F.col("size2") - F.col("n_common")
    )
    return inter.select("id1", "id2", jac.alias("jaccard")).where(
        F.col("jaccard") >= threshold
    )


def incremental_minhash_dedup(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
    n: int = 3,
    max_bucket: int = MAX_LSH_BUCKET,
    checkpoint_mode: str = "local",
    corpus_bands: DataFrame | None = None,
) -> DataFrame:
    """Tier 3, incremental form: near-dups of a NEW batch against an
    already-INDEXED corpus — the nightly-crawl flow, where re-running
    all-pairs LSH over (corpus + batch) would redo work proportional
    to the whole corpus every night instead of to the batch.

    Returns (batch_id, corpus_id, jaccard >= threshold): one row per
    batch document near-duplicating an indexed document.  Batch-vs-
    batch duplication is deliberately out of scope (run the regular
    tier inside the batch); dedup against the index decides which new
    documents are ADMITTED.

    ``corpus_bands``: pass the persisted output of
    ``banded_signatures(corpus)`` — the index a real deployment stores
    and appends admitted documents' bands to; when omitted it is
    computed here (corpus text still required either way for the
    candidate-scoped Jaccard verification).  The hot-bucket guard
    counts members across BOTH sides: a degenerate bucket is
    degenerate no matter which side its members came from — mirrored
    in the SQL oracle.

    Plan shape: batch banding (O(batch)), equi-join against the index
    bands, candidate-scoped verify exactly like ``minhash_lsh_pairs``
    — corpus-side shingles are computed only for candidate docs
    (broadcast id semi-join before the gram explode), so total cost is
    O(batch + candidates x doc-size), never O(corpus).
    """
    if corpus_bands is None:
        # r10: when no prebuilt index is passed, band BOTH sides in
        # ONE tagged scan — a union of the raw frames with a side tag
        # carried through the signature aggregate (extra group key,
        # constant per doc) replaces two separate gram-explode + md5 +
        # 8-min aggregate pipelines with one; measured 2.81s -> 2.39s
        # interleaved at sf0.1.  The prebuilt-index path below keeps
        # the separate shape (the index arrives already banded).
        tagged = batch.select(F.col(id_col), F.col(text_col)).withColumn(
            "__side", F.lit("b")
        ).unionByName(
            corpus.select(F.col(id_col), F.col(text_col)).withColumn(
                "__side", F.lit("c")
            )
        )
        combined = banded_signatures(
            tagged, text_col, id_col, num_perm, bands, carry_cols=("__side",)
        )
    else:
        batch_bands = banded_signatures(batch, text_col, id_col, num_perm, bands)
        combined = batch_bands.withColumn("__side", F.lit("b")).unionByName(
            corpus_bands.withColumn("__side", F.lit("c"))
        )
    guarded = cut_lineage(
        _drop_hot_keys(combined, ["band", "band_key"], max_bucket), checkpoint_mode
    )
    b = guarded.where(F.col("__side") == "b").select(
        "band", "band_key", F.col(id_col).alias("batch_id")
    )
    c = guarded.where(F.col("__side") == "c").select(
        "band", "band_key", F.col(id_col).alias("corpus_id")
    )
    cand = cut_lineage(
        b.join(c, ["band", "band_key"]).select("batch_id", "corpus_id").distinct(),
        checkpoint_mode,
    )
    # candidate-scoped verify (same shape and rationale as
    # minhash_lsh_pairs: id-only broadcast semi-joins BEFORE any gram
    # explode, narrow (id, shingle_h) joins after)
    bd = batch.join(
        F.broadcast(cand.select(F.col("batch_id").alias(id_col)).distinct()),
        id_col,
        "left_semi",
    )
    cd = corpus.join(
        F.broadcast(cand.select(F.col("corpus_id").alias(id_col)).distinct()),
        id_col,
        "left_semi",
    )
    # r10: sizes ride in-row (_sized_shingle_rows) — each side's gram
    # frame is computed ONCE instead of twice (size aggregate +
    # intersection join), and the two size joins disappear.  (The r9
    # alternative — cut_lineage on the gram frames — was MEASURED
    # SLOWER, 3.0s -> 3.8s at sf0.1: eager materialization costs more
    # than the candidate-scoped recompute; this shape removes the
    # recompute without materializing anything.)
    rb = _sized_shingle_rows(bd, text_col, id_col, n)
    rc = _sized_shingle_rows(cd, text_col, id_col, n)
    e1 = rb.select(
        F.col(id_col).alias("batch_id"), F.col("sz").alias("size_b"), "shingle_h"
    ).join(F.broadcast(cand), "batch_id")
    inter = (
        e1.join(
            rc.select(
                F.col(id_col).alias("corpus_id"), F.col("sz").alias("size_c"), "shingle_h"
            ),
            ["corpus_id", "shingle_h"],
        )
        .groupBy("batch_id", "corpus_id")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.min("size_b").alias("size_b"),
            F.min("size_c").alias("size_c"),
        )
    )
    jac = F.col("n_common").cast("double") / (
        F.col("size_b") + F.col("size_c") - F.col("n_common")
    )
    return inter.select("batch_id", "corpus_id", jac.alias("jaccard")).where(
        F.col("jaccard") >= threshold
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 8,
    bands: int = 4,
    max_bucket: int = MAX_LSH_BUCKET,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Distinct LSH candidate pairs (id1 < id2): docs agreeing on all
    rows of at least one band.  This count is the LSH tier's *work* —
    the quantity that stays O(near-dups) while the exact tier's
    shared-shingle pair count grows with corpus density (see
    tests/test_extension_ops.py scale-work test).
    """
    # Materialized: the hot-bucket guard and the candidate grouping
    # both consume banded (``bands`` narrow rows/doc); without the cut
    # the md5 signature scan runs twice.  Eager checkpoint, not
    # persist(): blocks self-clean when the frame is unreferenced, so
    # no clearCache contract is imposed on callers.
    banded = cut_lineage(banded_signatures(df, text_col, id_col, num_perm, bands), checkpoint_mode)
    return (
        _drop_hot_keys(banded, ["band", "band_key"], max_bucket)
        .groupBy("band", "band_key")
        .agg(F.collect_list(id_col).alias("ids"))
        .select(F.explode("ids").alias("id1"), "ids")
        .select("id1", F.explode("ids").alias("id2"))
        .where(F.col("id1") < F.col("id2"))
        .distinct()
    )


def banded_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 8,
    bands: int = 4,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, band, band_key) rows: num_perm minhash sigs banded into
    ``bands`` groups of rows, each band keyed by the concatenation of
    its row signatures.  ``carry_cols`` ride through the signature
    aggregate (as extra group keys — constant per doc in the intended
    tagged-union use) and into the output.

    One row per (doc, band), produced by a single `explode` over an
    array-of-band-structs column — the signature pipeline (the
    expensive md5-per-shingle scan) runs exactly once, whereas a
    union-of-selects shape would recompute it per band.
    """
    rows = num_perm // bands
    sigs = minhash_signatures(df, text_col, id_col, num_perm, carry_cols)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "|", *[F.col(f"sig_{b * rows + r}").cast("string") for r in range(rows)]
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    return sigs.select(
        F.col(id_col), *[F.col(c) for c in carry_cols], F.explode(band_structs).alias("bs")
    ).select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.col("bs.band").alias("band"),
        F.col("bs.band_key").alias("band_key"),
    )


def streaming_dedup_exact(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("insert_id",),
    ts_col: str = "timestamp",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exact dedup on a stream with watermark-bounded state.

    The reference never dedups in-engine — it delegates to Amplitude's
    ``insert_id`` contract downstream (SURVEY §2.8, P20).  At-least-once
    Kafka delivery means replays within a bounded horizon; this keeps
    one state entry per key and expires it once the event-time
    watermark passes, so state is O(keys per watermark window), not
    O(keys ever seen).  Uses ``dropDuplicatesWithinWatermark`` (state
    TTL from the watermark) — the correct primitive for "same key may
    arrive twice within N minutes" dedup.
    """
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(key_cols))


def simhash48(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """48-bit SimHash per document.

    Token hash = first 12 hex nibbles of md5(token) as a 48-bit int
    (via conv(hex,16,10)); per-bit vote = +1/-1 over the document's
    distinct tokens; simhash bit b is 1 iff the vote is positive.
    Everything is a column expression; one explode + one groupBy.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
        ).alias("tok"),
    )
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, SIMHASH_NIBBLES), 16, 10).cast("long")
    toks = toks.select(F.col(id_col), h.alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{bit}")
        for bit in range(SIMHASH_NIBBLES * 4)
    ]
    voted = toks.groupBy(id_col).agg(*votes)
    sim = None
    for bit in range(SIMHASH_NIBBLES * 4):
        term = F.when(F.col(f"v{bit}") > 0, F.lit(2**bit).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return voted.select(F.col(id_col), sim.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = MAX_LSH_BUCKET,
) -> DataFrame:
    """Tier 4: near-dup pairs by SimHash Hamming distance.

    Candidates: band the 48 bits into 4 x 12-bit chunks; by pigeonhole
    any pair within Hamming<=3 shares at least one chunk, so the
    bucket self-join has full recall — up to the ``max_bucket`` guard,
    which drops degenerate chunks (mass near-identical duplicates that
    tier 1 collapses anyway) before the O(bucket^2) pair expansion.
    Verify with bit_count(xor).
    """
    bits_per_band = SIMHASH_NIBBLES * 4 // SIMHASH_BANDS
    sh = simhash48(df, text_col, id_col)
    # All four band chunks from one pass over the (explode+groupBy)
    # simhash stage — an array explode, not a union of selects that
    # would recompute the 48-vote aggregation per band.
    chunks = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.shiftright(F.col("simhash"), band * bits_per_band)
                .bitwiseAND(F.lit((1 << bits_per_band) - 1))
                .alias("chunk"),
            )
            for band in range(SIMHASH_BANDS)
        ]
    )
    banded = sh.select(F.col(id_col), F.col("simhash"), F.explode(chunks).alias("bc")).select(
        F.col(id_col), F.col("simhash"), F.col("bc.band").alias("band"), F.col("bc.chunk").alias("chunk")
    )
    # Grouped postings per bucket, pairs generated map-side (the
    # same one-shuffle shape as ngram_jaccard_pairs); bucket-size
    # guard runs before the list aggregation (see _cap_by_count).
    member = F.struct(F.col(id_col).alias("id"), F.col("simhash").alias("simhash"))
    grouped = (
        _drop_hot_keys(banded, ["band", "chunk"], max_bucket)
        .groupBy("band", "chunk")
        .agg(F.collect_list(member).alias("members"))
    )
    pairs = (
        grouped.select(F.explode("members").alias("a"), "members")
        .select("a", F.explode("members").alias("b"))
        .where(F.col("a.id") < F.col("b.id"))
    )
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        pairs.select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            hamming.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def dedup_against(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental (append-only) exact dedup: the daily-ingest pattern.

    Returns one row per *new* fingerprint in ``batch`` — not already
    present in ``corpus``, deduped within the batch (min-id keeper,
    same rule as ``dedup_exact``).  Shape: the batch collapses to one
    row per fingerprint first (map-side combine), then a left-anti
    join probes the corpus fingerprints.  At 100TB the corpus side is
    a pre-computed fingerprint table (store ``dedup_exact`` output,
    don't re-scan the raw corpus); the anti-join shuffles only
    (fp, id) pairs, and AQE picks broadcast when the daily batch's
    fingerprint set is small enough.
    """
    batch_fps = (
        batch.select(fingerprint(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keeper_id"))
    )
    corpus_fps = corpus.select(fingerprint(F.col(text_col)).alias("fp"))
    return batch_fps.join(corpus_fps, "fp", "left_anti")


def deletion_neighborhood_pairs(
    tokens: DataFrame,
    token_col: str = "token",
) -> DataFrame:
    """All distinct token pairs within edit distance 1 — the FastSS /
    SymSpell deletion-neighborhood join (Bocek et al. 2007): each
    token emits itself plus every 1-deletion variant; two tokens share
    a variant **iff** they are within one substitution, insertion or
    deletion of each other (substitution at position i → both delete
    position i; insertion/deletion → the shorter string IS a variant
    of the longer and of itself), so a plain equi-join on the variant
    string finds every candidate and a single ``levenshtein <= 1``
    check verifies it.  The corpus-wide typo/variant-spelling
    discovery pass behind vocabulary normalization — unlike a
    broadcast dictionary matcher (``fuzzy_token_match``) it needs no
    reference list and no all-pairs product.

    Scale shape: a token of length L emits L+1 variant rows; a variant
    of length L can only be reached by L+1 deletions of itself plus at
    most ``|alphabet|·(L+2)`` one-insertion parents, so bucket arity
    has a CONSTANT alphabet-bounded cap — the hot-bucket failure mode
    of content-hash LSH cannot occur by construction.  One shuffle on
    the variant key, candidate pairs distinct-ed before the verify (a
    pair can share several variants), output one row per unordered
    pair ``a < b``.

    Input: one row per distinct token (callers aggregate frequency
    upstream and join it back on the output keys if needed).  Empty
    and NULL tokens are dropped up front: ``sequence(1, 0)`` would
    otherwise infer step -1 and emit spurious ``[1, 0]`` variant rows
    for a zero-length token (r8 ADVICE) — and an empty string has no
    meaningful edit-distance neighborhood anyway.

    Two plan decisions that matter (A/B'd at sf0.1 on 15k ids,
    5.2 s -> 1.1 s idle median, SCALE.md):

    - the variant frame is REPARTITIONED on the variant key with an
      explicit partition count — this IS the self-join's shuffle (both
      sides read the same exchange, ReuseExchange dedupes it), and the
      explicit count stops AQE from coalescing what it sees as a
      small-bytes stage down to ONE task: the join + levenshtein work
      here is CPU-bound per candidate, not byte-bound, and a coalesced
      single task serializes ~1e6 edit-distance calls;
    - the levenshtein verify runs BEFORE the pair distinct (the
      equi-join emits a candidate once per shared variant, but
      verifying the ~1.5x duplicated stream in parallel is cheaper
      than shuffling 3.6x more rows into the distinct), and uses the
      THRESHOLDED form (early-exit DP returning -1 past the bound).
    """
    t = F.col(token_col)
    tokens = tokens.where(t.isNotNull() & (F.length(t) > 0))
    try:
        nparts = int(tokens.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        nparts = tokens.sparkSession.sparkContext.defaultParallelism
    variants = tokens.select(
        t.alias("__tok"),
        F.explode(
            F.concat(
                F.array(t),
                F.transform(
                    F.sequence(F.lit(1), F.length(t)),
                    lambda i: F.concat(
                        F.substring(t, F.lit(1), i - 1),
                        t.substr(i + 1, F.length(t)),
                    ),
                ),
            )
        ).alias("__var"),
    ).repartition(nparts, "__var")
    b = variants.select(
        F.col("__tok").alias("__tok_b"), F.col("__var")
    )
    verified = (
        variants.join(b, "__var")
        .where(F.col("__tok") < F.col("__tok_b"))
        .where(F.levenshtein(F.col("__tok"), F.col("__tok_b"), 1) >= 0)
    )
    return (
        verified.select(
            F.col("__tok").alias("tok_a"), F.col("__tok_b").alias("tok_b")
        )
        .distinct()
    )


def setsim_prefix_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_num: int = 1,
    threshold_den: int = 2,
) -> DataFrame:
    """EXACT token-set Jaccard join via prefix filtering (the AllPairs
    / PPJoin family — Bayardo, Ma & Srikant 2007, Xiao et al. 2008):
    every unordered doc pair whose word-set Jaccard is ``>=
    threshold_num/threshold_den``, with NO document-frequency cap and
    NO hashing approximation — the exactness complement of the capped
    postings tier (:func:`ngram_jaccard_pairs`) and the probabilistic
    MinHash tier (:func:`minhash_lsh_pairs`).

    The filter: order the corpus vocabulary by ascending document
    frequency (ties by token — a deterministic total order), sort each
    doc's tokens in that order, and keep only its first ``L = n -
    ceil(t*n) + 1`` tokens as its PREFIX.  Two docs with Jaccard >= t
    must share at least one prefix token (if all shared tokens sat
    outside both prefixes, the overlap would be < the minimum t
    requires), so a plain equi-join of the prefix streams finds every
    qualifying pair.  The length filter ``t*n1 <= n2 <= n1/t`` prunes
    further before the distinct.  Verification is candidate-scoped:
    intersection counts come from joining the candidate list against
    the two docs' full token sets, never from an all-pairs product.

    Why this scales where naive inverted-index joins don't: the
    HOTTEST tokens (stopwords — exactly the postings that explode a
    plain token self-join) sort LAST in the df order and so almost
    never enter a prefix; candidate volume is governed by RARE tokens
    whose postings are short by definition.  This is the inverse of
    the hot-bucket failure mode — the skew guard is built into the
    ordering itself rather than bolted on as a cap.  One exchange for
    the df aggregate, one for the per-doc sort, one prefix equi-join
    (rare-token-bounded), one candidate-scoped verify join.

    All-integer contract: the threshold is the rational
    ``threshold_num/threshold_den``, acceptance is ``den * inter >=
    num * (n1 + n2 - inter)`` in BIGINTs, and the emitted score is
    ``jaccard_e6 = 1_000_000 * inter div (n1 + n2 - inter)`` — the
    whole result hash-matches any engine.

    Output: ``(id1 < id2, n_common, n1, n2, jaccard_e6)``.
    """
    if not (0 < threshold_num <= threshold_den):
        raise ValueError("need 0 < threshold_num <= threshold_den")
    num, den = int(threshold_num), int(threshold_den)
    # whitespace-set trim (F.trim strips only spaces) + \S guard: the
    # registry's established cross-engine tokenization convention
    raw = (
        df.where(F.col(text_col).rlike(r"\S"))
        .select(
            F.col(id_col).alias("__id"),
            F.explode(
                F.split(
                    F.expr(rf"trim(BOTH ' \t\r\n' FROM lower({text_col}))"),
                    r"\s+",
                )
            ).alias("token"),
        )
        .where(F.col("token") != "")
    )
    # Arrays-first (r11, guide §2.3/§2.4 — the in-row-sizes shape):
    # ONE per-doc ``collect_set`` aggregate both dedups the token
    # stream (replacing the former ``distinct`` exchange) and yields
    # the per-doc size in-row (replacing the former ``sizes``
    # aggregate AND its join into ``ordered``).  The cut frame is the
    # per-doc sorted array table — exactly what the verify tier
    # consumes — and the (id, token, n) stream is re-derived by an
    # exchange-free explode per consumer.  Interleaved A/B at sf0.1:
    # 6.02 -> 5.38 s median (5/7); plan: 12 -> 9 Exchanges, the
    # sizes aggregate and size join gone.  The per-doc set buffer is
    # bounded by distinct-token arity (~document length) — this
    # operator already materializes the same arrays for verification,
    # so the bound is not new.
    # (r10 A/B, still binding: folding sizes into a count-over-__id
    # window frame sharing the rank exchange measured SLOWER — the
    # unordered count window buffers whole partitions.)
    arrays = cut_lineage(
        raw.groupBy("__id")
        .agg(F.sort_array(F.collect_set("token")).alias("__toks"))
        .select("__id", "__toks", F.size("__toks").cast("long").alias("n"))
    )
    ex = arrays.select("__id", "n", F.explode("__toks").alias("token"))
    dfreq = ex.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df"))
    w = Window.partitionBy("__id").orderBy("df", "token")
    ordered = ex.join(dfreq, "token").withColumn("p", F.row_number().over(w))
    # L = n - ceil(num*n/den) + 1, all-integer ceil (div, not `/` —
    # Spark's `/` is IEEE double division).  Cut: the prefix frame is
    # read by BOTH sides of the candidate self-join, and each branch
    # would otherwise re-run the df join + per-doc sort (measured
    # ~2x the phase cost at sf0.1).
    prefix = cut_lineage(
        ordered.where(
            F.col("p")
            <= F.col("n") - F.expr(f"({num} * n + {den - 1}) div {den}") + 1
        ).select("__id", "token", "n")
    )
    a = prefix.select(
        F.col("__id").alias("id1"), "token", F.col("n").alias("n1")
    )
    b = prefix.select(
        F.col("__id").alias("id2"), "token", F.col("n").alias("n2")
    )
    cand = (
        a.join(b, "token")
        .where(F.col("id1") < F.col("id2"))
        .where(
            (F.lit(den) * F.col("n1") >= F.lit(num) * F.col("n2"))
            & (F.lit(den) * F.col("n2") >= F.lit(num) * F.col("n1"))
        )
        .select("id1", "id2")
        .distinct()
    )
    # Candidate-scoped verify over per-doc token ARRAYS: joining the
    # candidate list back against the exploded token stream would
    # materialize |cand| x avg-doc-length rows (measured 137M at
    # sf0.1 — the verify dominated everything); two id joins carrying
    # one bounded token array each + a per-row array_intersect do the
    # identical exact intersection with nothing exploded.  The arrays
    # frame is the lineage-cut per-doc table itself (r11) — formerly
    # a fourth aggregate over the token stream.
    a1 = arrays.select(
        F.col("__id").alias("id1"),
        F.col("__toks").alias("__t1"),
        F.col("n").alias("n1"),
    )
    a2 = arrays.select(
        F.col("__id").alias("id2"),
        F.col("__toks").alias("__t2"),
        F.col("n").alias("n2"),
    )
    inter = (
        cand.join(a1, "id1")
        .join(a2, "id2")
        .select(
            "id1",
            "id2",
            F.size(F.array_intersect("__t1", "__t2"))
            .cast("long")
            .alias("n_common"),
            "n1",
            "n2",
        )
    )
    union_sz = F.col("n1") + F.col("n2") - F.col("n_common")
    return inter.where(
        F.lit(den) * F.col("n_common") >= F.lit(num) * union_sz
    ).select(
        "id1",
        "id2",
        "n_common",
        "n1",
        "n2",
        F.expr("1000000 * n_common div (n1 + n2 - n_common)")
        .cast("long")
        .alias("jaccard_e6"),
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson, Aiken 2003 — the MOSS
# local fingerprinting algorithm).  Complements the MinHash/setsim
# tiers: those estimate WHOLE-document similarity; winnowing selects
# position-anchored k-gram fingerprints, so partially-overlapping or
# reordered content (a copied paragraph inside an otherwise new
# document) still collides on the shared region's fingerprints.
# ---------------------------------------------------------------------------


def winnow_fingerprints(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Winnowed k-gram fingerprints: ``(id_col, fppos, fp)``.

    Text is normalized MOSS-style (lower, strip all non-alphanumeric)
    so whitespace/punctuation edits don't shift the k-gram stream.
    Every window of ``w`` consecutive k-gram hashes selects its
    minimum hash, rightmost position on ties; the distinct selected
    (position, hash) set is the document's fingerprint (expected
    density 2/(w+1)).

    **Portable tie-break without arg_min**: the per-position sort key
    is the STRING ``md5(kgram) || lpad(10^9 - pos, 10, '0')`` — md5
    hex is fixed 32 chars, so a plain ``MIN`` over the sliding frame
    picks the smallest hash and, among equal hashes, the largest
    position (``10^9 - pos`` descends in pos); both engines compare
    strings bytewise, so the oracle hash-matches with no engine-
    specific argmin semantics.  The window-end filter ``pos >= w``
    keeps only full windows.

    Plan/scale shape: position explode + substring stay inside ONE
    whole-stage-codegen span (an earlier ``transform(sequence, p ->
    substring(...))`` HOF variant ran the lambda interpreted, 17x
    slower — SCALE.md r10); the document string is referenced, not
    copied, within the stage, and the projection to ``(id, pos,
    md5)`` happens before the window exchange, so shuffled rows carry
    32 + 8 bytes each, never the document.  ONE partitionBy(doc) sort
    feeds the sliding MIN; the distinct is on (doc, 32-char hash,
    pos) grain, ~2/(w+1) of the k-gram count.  Documents with fewer
    than ``w + k - 1`` normalized chars produce no rows — fewer than
    ``w`` k-grams never fill a window (the ``len >= k`` gate below
    additionally guards Spark's descending ``sequence(1, 0)``;
    lengths in [k, w+k-2] die at the ``pos >= w`` filter).
    """
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k} w={w}")
    norm = docs.select(
        F.col(id_col).alias("__id"),
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "").alias("__s"),
    ).where(F.length("__s") >= k)
    h = norm.select(
        "__id",
        "__s",
        F.explode(F.sequence(F.lit(1), F.length("__s") - (k - 1))).alias("pos"),
    ).select(
        "__id",
        "pos",
        F.md5(F.expr(f"substring(__s, pos, {k})")).alias("fp"),
    )
    enc = h.select(
        "__id",
        "pos",
        F.concat(
            "fp",
            F.lpad((F.lit(1000000000) - F.col("pos")).cast("string"), 10, "0"),
        ).alias("__e"),
    )
    win = Window.partitionBy("__id").orderBy("pos").rowsBetween(-(w - 1), 0)
    sel = enc.withColumn("__se", F.min("__e").over(win)).where(F.col("pos") >= w)
    return (
        sel.select(
            "__id",
            (F.lit(1000000000) - F.substring("__se", 33, 10).cast("long")).alias(
                "fppos"
            ),
            F.substring("__se", 1, 32).alias("fp"),
        )
        .distinct()
        .select(F.col("__id").alias(id_col), "fppos", "fp")
    )


def winnow_profile(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Per-document winnowing audit: ``(id, n_kgrams, n_fp, fp_digest)``.

    ``fp_digest`` is md5 over the position-ordered concatenation of
    the selected hashes — the FULL fingerprint set rides the oracle
    hash, so any defect in selection, tie-break, or dedup breaks the
    check.  ``n_kgrams`` is the pure length expression
    ``len(norm) - k + 1`` (no second corpus explode).  Docs with >= k
    but < w+k-1 normalized chars (k-grams exist, no window ever
    fills) are still audited: n_fp = 0, fp_digest NULL (LEFT join —
    r10 review)."""
    fps = winnow_fingerprints(docs, text_col=text_col, id_col=id_col, k=k, w=w)
    agged = fps.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_fp"),
        F.md5(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("fppos", "fp"))),
                    lambda x: x["fp"],
                ),
            )
        ).alias("fp_digest"),
    )
    norm = docs.select(
        F.col(id_col),
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "").alias("__s"),
    ).where(F.length("__s") >= k)
    lens = norm.select(
        id_col, (F.length("__s") - (k - 1)).cast("long").alias("n_kgrams")
    )
    return lens.join(agged, id_col, "left").select(
        id_col,
        "n_kgrams",
        F.coalesce(F.col("n_fp"), F.lit(0)).cast("long").alias("n_fp"),
        "fp_digest",
    )


def winnow_match_pairs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    min_shared: int = 3,
    max_docs_per_fp: int = 20,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowed fingerprints:
    ``(id1, id2, n_shared)``.

    The pair generator is the house bucketed collect-and-expand (the
    LSH-band shape of ``minhash_lsh_candidates``, r10 — the previous
    fp self-join re-shuffled the postings frame twice and joined):
    per-fingerprint doc lists collected in ONE fp-key aggregate,
    pairs expanded map-side by a double explode, one (id1, id2) count
    aggregate.  Fingerprints present in more than ``max_docs_per_fp``
    documents are dropped BEFORE the list aggregate
    (``_drop_hot_keys`` — count only, broadcast anti-join), so no
    aggregation buffer ever holds more than ``max_docs_per_fp`` ids
    and any bucket's pair fan-out stays bounded by choose(cap, 2)
    regardless of corpus size — never all-pairs.  MOSS drops
    over-common fingerprints the same way (boilerplate, not
    evidence).
    """
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    fps = winnow_fingerprints(docs, text_col=text_col, id_col=id_col, k=k, w=w)
    # Materialized: the postings frame feeds the hot-fp count AND the
    # bucket aggregate — without the cut the whole explode + window +
    # distinct pipeline runs twice.  (doc, 32-char fp) grain,
    # ~2/(w+1) of the k-gram count.
    docfp = cut_lineage(fps.select(F.col(id_col).alias("__id"), "fp").distinct())
    guarded = _drop_hot_keys(docfp, ["fp"], max_docs_per_fp)
    buckets = (
        guarded.groupBy("fp")
        .agg(F.collect_list("__id").alias("ids"))
        .where(F.size("ids") >= 2)
    )
    return (
        buckets.select(F.explode("ids").alias("id1"), "ids")
        .select("id1", F.explode("ids").alias("id2"))
        .where(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
