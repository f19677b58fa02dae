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
   Signatures use the *lexicographic minimum of md5(perm:shingle)* as
   the min-hash — a valid random-permutation proxy that is
   deterministic and identical across engines (DuckDB-oracle-able,
   unlike murmur-based hashes).  Candidates come from band-bucket
   self-joins; pairs are verified with exact Jaccard.  Shuffle volume
   is O(docs x bands), never O(docs^2).

4. **SimHash** (`simhash48`, `simhash_pairs`): 48-bit simhash (12 md5
   nibbles; 48 so per-term arithmetic stays exact in IEEE double for
   the SQL oracle).  Near-dup candidates via band-equality buckets
   (4 x 12-bit chunks — Hamming distance <=3 guarantees at least one
   identical chunk by pigeonhole), verified with bit_count(xor).

All four are pure DataFrame ops — no UDFs, no collect().
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from telemetry_streaming_spark.functions.text import fingerprint, word_shingles

SIMHASH_NIBBLES = 12  # 48 bits
SIMHASH_BANDS = 4  # 12 bits per band -> hamming<=3 always collides somewhere


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

    The document-frequency cap is applied as a HAVING on the same
    aggregation (no separate hot-list join): a shingle shared by more
    than ``max_df`` docs carries no discriminating signal and is
    dropped — the standard guard that keeps candidate generation
    linear-ish instead of quadratic.
    """
    pairs = (
        df.select(F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("shingle"))
        .select(F.col(id_col), F.xxhash64("shingle").alias("shingle_h"))
        .distinct()
    )
    return (
        pairs.groupBy("shingle_h")
        .agg(F.collect_list(id_col).alias("ids"), F.count("*").alias("df_count"))
        .where(F.col("df_count") <= max_df)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int = 100,
) -> DataFrame:
    """Tier 2: exact n-gram Jaccard similarity pairs >= threshold.

    jaccard = |A∩B| / (|A|+|B|-|A∩B|), with both intersection counts
    and set sizes computed from the df-capped index (both engines —
    this impl and the SQL oracle — apply the identical cap).

    Plan shape (one pass over the corpus):
      explode+distinct -> groupBy(shingle) postings [persisted] ->
        (a) sizes:   explode postings -> groupBy(doc) count
        (b) pairs:   double-explode postings map-side (bounded by
                     max_df^2/2 per shingle) -> groupBy(id1,id2) count
      -> two size joins (AQE broadcasts them when small).

    Versus a shingle-shuffle self-join this generates candidate pairs
    map-side from each postings list, so the index is shuffled once,
    not three times, and nothing O(docs^2) ever hits an exchange.  The
    postings frame is persisted because both (a) and (b) consume it;
    at cluster scale this is the natural checkpoint of the pipeline.
    """
    idx = shingle_index(df, text_col, id_col, n, max_df).persist()
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
    jac = F.col("n_common").cast("double") / (
        F.col("size1") + F.col("size2") - F.col("n_common")
    )
    return (
        inter.join(s1, "id1")
        .join(s2, "id2")
        .select("id1", "id2", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 8,
) -> DataFrame:
    """Minhash signature columns sig_0..sig_{p-1}: lexicographic min of
    md5('<perm>:' || shingle).  Engine-portable; per-row map only."""
    sh = word_shingles(F.col(text_col))

    def min_sig(p: int):
        # NB: the transform lambda must stay single-argument — PySpark
        # passes (element, index) to two-parameter lambdas, which would
        # silently rebind a captured loop variable.
        prefix = f"{p}:"
        return F.array_min(F.transform(sh, lambda s: F.md5(F.concat(F.lit(prefix), s))))

    cols = [F.col(id_col)] + [min_sig(p).alias(f"sig_{p}") for p in range(num_perm)]
    return df.select(*cols)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
    max_df: int = 100,
) -> DataFrame:
    """Tier 3: MinHash-LSH candidate pairs, verified with exact Jaccard.

    bands x rows = num_perm; a pair collides if all rows of any band
    match.  Returns (id1, id2, jaccard >= threshold) — identical
    output contract to `ngram_jaccard_pairs`, so the exact tier is the
    drop-in verifier at any scale.
    """
    banded = banded_signatures(df, text_col, id_col, num_perm, bands)
    cand = (
        banded.groupBy("band", "band_key")
        .agg(F.collect_list(id_col).alias("ids"))
        .select(F.explode("ids").alias("id1"), "ids")
        .select("id1", F.explode("ids").alias("id2"))
        .where(F.col("id1") < F.col("id2"))
        .distinct()
    )
    exact = ngram_jaccard_pairs(df, text_col, id_col, 3, threshold, max_df)
    return cand.join(exact, ["id1", "id2"]).select("id1", "id2", "jaccard")


def banded_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 8,
    bands: int = 4,
) -> DataFrame:
    """(id, band, band_key) rows: num_perm minhash sigs banded into
    ``bands`` groups of rows, each band keyed by the concatenation of
    its row signatures.

    One row per (doc, band), produced by a single `explode` over an
    array-of-band-structs column — the signature pipeline (the
    expensive md5-per-shingle scan) runs exactly once, whereas a
    union-of-selects shape would recompute it per band.
    """
    rows = num_perm // bands
    sigs = minhash_signatures(df, text_col, id_col, num_perm)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "|", *[F.col(f"sig_{b * rows + r}") for r in range(rows)]
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    return sigs.select(F.col(id_col), F.explode(band_structs).alias("bs")).select(
        F.col(id_col), F.col("bs.band").alias("band"), F.col("bs.band_key").alias("band_key")
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
) -> DataFrame:
    """Tier 4: near-dup pairs by SimHash Hamming distance.

    Candidates: band the 48 bits into 4 x 12-bit chunks; by pigeonhole
    any pair within Hamming<=3 shares at least one chunk, so the
    bucket self-join has full recall.  Verify with bit_count(xor).
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
    # same one-shuffle shape as ngram_jaccard_pairs).
    member = F.struct(F.col(id_col).alias("id"), F.col("simhash").alias("simhash"))
    grouped = banded.groupBy("band", "chunk").agg(F.collect_list(member).alias("members"))
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
