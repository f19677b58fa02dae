"""Corpus hygiene for training-data pipelines: chunk-level dedup,
benchmark decontamination, and duplicated-substring measurement.

These are the three passes a real LLM data pipeline runs between raw
crawl and tokenizer (CCNet / RefinedWeb / Dolma style), distinct from
the document-level dedup family in ``operators/dedup.py``:

- ``chunk_dedup``      — CCNet-style: drop *repeated paragraphs/chunks*
                         globally, keeping each chunk's first occurrence
                         in (doc_id, chunk_idx) order.
- ``contamination_report`` — test-set decontamination: flag training
                         documents sharing any word n-gram with a
                         benchmark/eval set.
- ``dup_window_fraction`` — Lee et al. 2022 ("Deduplicating Training
                         Data Makes Language Models Better") proxy: the
                         per-document fraction of overlapping n-token
                         windows that occur more than once in the corpus.

Scale posture (100 TB): every exchange in this module carries 8-byte
``xxhash64`` gram/chunk keys plus ids and counts — document text never
crosses a shuffle.  Gram explosion is map-side (codegen'd
explode-position-then-concat, see ``dedup._exploded_grams``); the only
wide operations are hash-keyed aggregates and equi-joins, all
AQE-planned (benchmark sides small enough auto-broadcast).

The reference engine has no corpus-hygiene operators (its dedup story
is the Amplitude ``insert_id`` downstream contract, EventsToAmplitude
.scala:249); this module is part of the extension surface promised in
SURVEY.md §7.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import tokenize
from .dedup import _exploded_grams

DEFAULT_CHUNK_WORDS = 10
DEFAULT_NGRAM = 4


def chunk_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_chunk: int = DEFAULT_CHUNK_WORDS,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, chunk_idx, chunk_h[, keep_cols...]) rows: consecutive
    non-overlapping ``words_per_chunk``-token chunks, identified by
    xxhash64.

    The chunk *text* exists only transiently inside the projection that
    computes the hash — what leaves the stage (and what any downstream
    shuffle carries) is the 8-byte hash.  Works unchanged on a
    streaming frame (explode + hash are stateless); ``keep_cols``
    carries extra columns (e.g. the event-time column) through.
    """
    if words_per_chunk <= 0:
        raise ValueError("words_per_chunk must be positive")
    toks = tokenize(F.col(text_col))
    n_chunks = F.ceil(F.size(toks) / F.lit(words_per_chunk)).cast("int")
    idx = F.when(F.size(toks) > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    passthrough = [F.col(c) for c in keep_cols]
    e = df.select(
        F.col(id_col), toks.alias("__toks"), F.explode(idx).alias("chunk_idx"), *passthrough
    )
    chunk = F.concat_ws(
        " ",
        F.slice(
            F.col("__toks"),
            F.col("chunk_idx") * words_per_chunk + 1,
            words_per_chunk,
        ),
    )
    return e.select(
        F.col(id_col), F.col("chunk_idx"), F.xxhash64(chunk).alias("chunk_h"), *passthrough
    )


def text_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 4,
    overlap: int = 1,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Overlapping token-window chunks WITH text — the retrieval /
    embedding preparation pass (each chunk goes to an embedding model;
    the overlap keeps boundary context).  The text analog of
    ``ext/multimodal.py:audio_chunks``.

    Emits (id, chunk_idx, chunk, n_tokens): chunk k spans tokens
    [k*stride, k*stride + chunk_tokens), stride = chunk_tokens -
    overlap; the chunk count is ceil((n_tokens - overlap) / stride)
    (min 1), NOT ceil(n_tokens / stride) — the naive formula emits a
    trailing chunk of <= overlap tokens that is fully contained in its
    predecessor whenever n_tokens mod stride lands in 1..overlap,
    shipping duplicate text to the embedding stage.  Trailing chunks
    may still be short, but every chunk contains at least one token no
    earlier chunk covers.  Unlike the hygiene ops above this one's
    OUTPUT is chunk text by design — but the plan is a pure map
    (explode + slice, no shuffle), so nothing wide ever crosses an
    exchange; the downstream embedding stage is where partition
    byte-budgeting (``multimodal.repartition_by_bytes``) takes over.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(
        F.expr(rf"trim(BOTH ' \t\r\n' FROM {text_col})"), r"\s+"
    )
    n_chunks = F.greatest(
        F.lit(1), F.ceil((F.size(toks) - F.lit(overlap)) / F.lit(stride))
    ).cast("int")
    e = df.where(F.col(text_col).rlike(r"\S")).select(
        F.col(id_col),
        toks.alias("__toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        *[F.col(c) for c in keep_cols],
    )
    start = F.col("chunk_idx") * stride
    return e.select(
        F.col(id_col),
        "chunk_idx",
        F.concat_ws(" ", F.slice(F.col("__toks"), start + 1, chunk_tokens)).alias("chunk"),
        F.least(F.lit(chunk_tokens), F.size(F.col("__toks")) - start)
        .cast("long")
        .alias("n_tokens"),
        *[F.col(c) for c in keep_cols],
    )


def chunk_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_chunk: int = DEFAULT_CHUNK_WORDS,
) -> DataFrame:
    """Global chunk-level dedup report: per document, how many of its
    chunks survive when every repeated chunk keeps only its first
    occurrence in (doc_id, chunk_idx) order.

    Returns (id, n_chunks, kept_chunks, dropped_chunks).  One shuffle:
    the ``row_number`` window partitioned by chunk hash (NOT a global
    window — parallelism is the number of distinct chunks), then a
    map-side-combined count aggregate back on the document id.
    """
    chunks = chunk_table(df, text_col, id_col, words_per_chunk)
    w = Window.partitionBy("chunk_h").orderBy(F.col(id_col), F.col("chunk_idx"))
    flagged = chunks.withColumn("__keep", F.row_number().over(w) == 1)
    return flagged.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum(F.col("__keep").cast("long")).alias("kept_chunks"),
        F.sum((~F.col("__keep")).cast("long")).alias("dropped_chunks"),
    )


def chunk_dedup_apply(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_chunk: int = DEFAULT_CHUNK_WORDS,
) -> DataFrame:
    """Rewrite each document with its duplicated chunks removed (same
    keeper rule as :func:`chunk_dedup`): the cleaned text is the
    space-join of the surviving chunks in original order.

    The shuffle stages move only (id, chunk_idx, chunk_h) — the
    surviving index *list* (bounded by document length) comes back to
    the document row via one equi-join on the id, and the text is
    re-sliced from the document's own token array map-side.  A doc
    whose every chunk was dropped survives with empty text (callers
    filter on length downstream, as a curation pipeline would).
    """
    chunks = chunk_table(df, text_col, id_col, words_per_chunk)
    w = Window.partitionBy("chunk_h").orderBy(F.col(id_col), F.col("chunk_idx"))
    kept = (
        chunks.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("chunk_idx")).alias("__kept"))
    )
    toks = tokenize(F.col(text_col))
    rebuilt = F.concat_ws(
        " ",
        F.flatten(
            F.transform(
                F.coalesce(F.col("__kept"), F.array().cast("array<int>")),
                lambda i: F.slice(toks, i * words_per_chunk + 1, words_per_chunk),
            )
        ),
    )
    others = [c for c in df.columns if c not in (id_col, text_col)]
    return (
        df.join(kept, id_col, "left")
        .select(F.col(id_col), rebuilt.alias(text_col), *[F.col(c) for c in others])
    )


def contamination_report(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = DEFAULT_NGRAM,
) -> DataFrame:
    """Training documents sharing >=1 word ``n``-gram with the
    benchmark set: (id, contaminated_grams = #distinct shared grams).

    Gram sets are distinct per document (``doc_shingle_pairs``-style
    explode + xxhash64 + distinct); the benchmark side reduces to a
    distinct-hash set, which at real scale is millions of rows at most
    (benchmarks are small) — AQE broadcasts it, so the training-side
    gram stream is filtered map-side without a wide join.
    """
    tgrams = (
        _exploded_grams(train, text_col, id_col, n)
        .select(F.col(id_col), F.xxhash64("gram").alias("gram_h"))
        .distinct()
    )
    bgrams = (
        _exploded_grams(bench, text_col, id_col, n)
        .select(F.xxhash64("gram").alias("gram_h"))
        .distinct()
    )
    return (
        tgrams.join(bgrams, "gram_h")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("contaminated_grams"))
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = DEFAULT_NGRAM,
) -> DataFrame:
    """Drop contaminated documents from ``train`` (left-anti join on
    the contamination report's id set)."""
    bad = contamination_report(train, bench, text_col, id_col, n).select(id_col)
    return train.join(bad, id_col, "left_anti")


def dup_window_fraction(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Per-document duplicated-window fraction: of the document's
    overlapping ``n``-token windows, the share whose exact token
    sequence occurs more than once in the whole corpus (its own
    repeats included) — the scalable proxy for Lee et al.'s
    suffix-array substring dedup.

    One corpus scan and two hash-keyed exchanges: an analytic count
    partitioned by window hash (NOT a join back to a separate count
    aggregate, which would scan and re-shingle the corpus twice), then
    the per-document rollup — both exchanges carry 8-byte keys plus
    ids.  Returns (id, n_windows, dup_windows, dup_fraction).
    """
    wins = _exploded_grams(df, text_col, id_col, n).select(
        F.col(id_col), F.xxhash64("gram").alias("win_h")
    )
    occ = F.count("*").over(Window.partitionBy("win_h"))
    return (
        wins.withColumn("__occ", occ)
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_windows"),
            F.sum((F.col("__occ") > 1).cast("long")).alias("dup_windows"),
        )
        .withColumn(
            "dup_fraction",
            F.round(F.col("dup_windows") / F.col("n_windows"), 6),
        )
    )


def streaming_chunk_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "timestamp",
    watermark: str = "10 minutes",
    words_per_chunk: int = DEFAULT_CHUNK_WORDS,
) -> DataFrame:
    """Streaming first-seen chunk filter: the chunk-exploded stream
    with every chunk hash that already appeared inside the watermark
    horizon dropped.

    The batch keeper rule ("first (doc_id, chunk_idx) wins") becomes
    arrival order on a stream; ``dropDuplicatesWithinWatermark`` keys
    state on the 8-byte chunk hash with TTL from the watermark, so
    state is O(chunks per horizon), not O(chunks ever seen) — the same
    contract as ``streaming_dedup_exact`` one level down the
    granularity ladder.  Downstream can re-assemble per-doc survivor
    lists with a windowed ``collect_list`` or route whole-doc decisions
    off the kept/emitted ratio.
    """
    chunks = chunk_table(
        df, text_col, id_col, words_per_chunk, keep_cols=(ts_col,)
    )
    return chunks.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["chunk_h"]
    )


MAX_BENCH_GRAMS = 5_000_000


def decontaminate_stream(
    df: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = DEFAULT_NGRAM,
) -> DataFrame:
    """Streaming decontamination: drop stream documents sharing any
    word ``n``-gram with a STATIC benchmark set.

    The benchmark reduces to its distinct gram hashes once, driver-side
    (bounded by ``MAX_BENCH_GRAMS`` — benchmarks are eval sets, not
    corpora; the same bounded-broadcast contract as ``asof_enrich``'s
    key histories), and rides to executors as a SORTED numpy array
    inside an Arrow-batched predicate: gram hashes are computed
    JVM-side into an array column (higher-order transform over the
    token array), and membership is a ``searchsorted`` probe per gram.
    A literal-array + ``arrays_overlap`` formulation was measured and
    rejected: ``lit(list)`` builds an N-child CreateArray (74 s of
    analysis at 200k elements) and the overlap scan is O(|bench|) per
    row.  No state, no watermark, no shuffle — safe in any streaming
    output mode; the batch tier (:func:`decontaminate`) remains the
    exact join-based form for corpus-sized benchmark sets.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    hashes = [
        r[0]
        for r in (
            _exploded_grams(bench, text_col, id_col, n)
            .select(F.xxhash64("gram").alias("h"))
            .distinct()
            .limit(MAX_BENCH_GRAMS + 1)
            .collect()
        )
    ]
    if len(hashes) > MAX_BENCH_GRAMS:
        raise ValueError(
            f"benchmark gram set exceeds {MAX_BENCH_GRAMS}; use the batch "
            "decontaminate() join for corpus-sized benchmarks"
        )
    if not hashes:
        return df
    bench_sorted = np.sort(np.array(hashes, dtype=np.int64))

    @pandas_udf("boolean")
    def contaminated(gram_arrays):
        import pandas as pd

        out = []
        for arr in gram_arrays:
            if arr is None or len(arr) == 0:
                out.append(False)
                continue
            g = np.asarray(arr, dtype=np.int64)
            pos = np.searchsorted(bench_sorted, g)
            pos = np.clip(pos, 0, len(bench_sorted) - 1)
            out.append(bool((bench_sorted[pos] == g).any()))
        return pd.Series(out)

    toks = tokenize(F.col(text_col))
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    gram_hashes = F.transform(
        idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, n)))
    )
    return df.withColumn("__grams", gram_hashes).where(
        ~contaminated(F.col("__grams"))
    ).drop("__grams")


def _dup_window_positions(
    df: DataFrame, text_col: str, id_col: str, n: int, min_count: int
) -> DataFrame:
    """(id, pos) of every n-token window whose exact token sequence
    occurs >= min_count times corpus-wide (within-doc repeats count).
    Same single-scan analytic-count shape as dup_window_fraction; the
    exchange carries (id, pos, 8-byte window hash)."""
    wins = _exploded_grams(df, text_col, id_col, n, with_pos=True).select(
        F.col(id_col), F.col("pos"), F.xxhash64("gram").alias("win_h")
    )
    occ = F.count("*").over(Window.partitionBy("win_h"))
    return wins.withColumn("__occ", occ).where(F.col("__occ") >= min_count).select(
        id_col, "pos"
    )


def duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Per-document maximal duplicated token spans: merge every
    corpus-duplicated n-token window [pos, pos+n-1] into disjoint
    islands (the window-granular approximation of Lee et al.'s
    suffix-array substring dedup).

    Returns (id, span_start, span_end) with 1-based inclusive token
    positions.  The merge is the gaps-and-islands running-max pattern
    over (id, pos) — duplicated-window rows only, never a per-token
    position explode — so the heavy frames carry one row per
    duplicated WINDOW, not per covered token."""
    dup = _dup_window_positions(df, text_col, id_col, n, min_count)
    order = Window.partitionBy(id_col).orderBy("pos")
    prev_max_end = F.max(F.col("pos") + F.lit(n - 1)).over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    # strict "+ 1": windows whose covered ranges merely TOUCH
    # ([p, p+n-1] then [p+n, ...]) form one contiguous maximal span
    marked = dup.withColumn(
        "__new",
        F.when(F.col("pos") > F.coalesce(prev_max_end, F.lit(-2)) + F.lit(1), 1).otherwise(0),
    )
    islands = marked.withColumn(
        "__isl", F.sum("__new").over(order.rowsBetween(Window.unboundedPreceding, 0))
    )
    return islands.groupBy(id_col, "__isl").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(n - 1)).alias("span_end"),
    ).drop("__isl")


def remove_duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Rewrite each document with its duplicated spans cut out
    (chunk_dedup_apply's cousin at window granularity).  Cleaned text
    is the single-space join of surviving tokens in order — canonical
    whitespace, like every rebuild in this module.

    The spans come back to the document row as ONE sorted array per
    id (bounded by doc length; in practice by the few merged spans),
    and the text is re-sliced map-side from the doc's own token array
    by walking the gaps BETWEEN spans — O(len + spans) per doc, never
    O(len x covered) membership tests."""
    spans = duplicated_spans(df, text_col, id_col, n, min_count).groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("span_start").alias("s"), F.col("span_end").alias("e")))
        ).alias("__spans")
    )
    toks = tokenize(F.col(text_col))
    L = F.size(toks)
    span_arr = F.coalesce(
        F.col("__spans"), F.array().cast("array<struct<s:int,e:int>>")
    )
    heads = F.concat(
        F.array(F.struct(F.lit(0).cast("int").alias("s"), F.lit(0).cast("int").alias("e"))),
        span_arr,
    )
    tails = F.concat(
        span_arr,
        F.array(F.struct((L + 1).cast("int").alias("s"), L.cast("int").alias("e"))),
    )
    gaps = F.zip_with(
        heads,
        tails,
        lambda prev, nxt: F.slice(
            toks, prev["e"] + 1, F.greatest(nxt["s"] - prev["e"] - 1, F.lit(0))
        ),
    )
    rebuilt = F.concat_ws(" ", F.flatten(gaps))
    others = [c for c in df.columns if c not in (id_col, text_col)]
    return df.join(spans, id_col, "left").select(
        F.col(id_col), rebuilt.alias(text_col), *[F.col(c) for c in others]
    )


def streaming_duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "timestamp",
    watermark: str = "10 minutes",
    agg_window: str = "5 minutes",
    n: int = 8,
) -> DataFrame:
    """Streaming tier of :func:`duplicated_spans` — per arriving
    document, the maximal token spans covered by n-token windows whose
    exact sequence was ALREADY SEEN within the watermark horizon
    (earlier docs or earlier positions of the same doc).

    Semantics are first-seen, the streaming analogue of the batch
    min_count>=2 rule (same deliberate deviation as
    :func:`streaming_chunk_dedup` vs :func:`chunk_dedup`): the batch op
    flags EVERY occurrence of a duplicated window, the stream cannot
    flag an occurrence retroactively, so the first occurrence passes
    and every repeat within the horizon is flagged.  For a doc whose
    duplicated windows all originate in earlier-arriving docs, the
    emitted spans equal the batch spans for that doc (pinned in
    tests/test_streaming.py).

    Two chained stateful operators (Spark 3.5+ multi-stateful support):
    ``dropDuplicatesWithinWatermark`` keyed on the 8-byte window hash
    (state O(windows per horizon)), then a tumbling-window per-doc
    aggregation that collects the SURVIVING positions.  The duplicated
    positions are the complement against ``sequence(1, L-n+1)`` and the
    island merge runs as array expressions on the aggregated row — the
    wire carries (id, pos, ts, n_toks) per window and one position
    array per doc, never text.  Emits (window, id, span_start,
    span_end) in append mode on watermark expiry; 1-based inclusive
    token positions, matching the batch op.

    Each doc also explodes a ``pos = 0`` ANCHOR row whose dedup key is
    doc-scoped (``(xxhash64('anchor', id, ts), is_anchor = true)`` —
    the flag keeps anchors out of the gram-hash keyspace), so a FULLY
    duplicated doc (zero surviving windows) still forms a group and
    emits its whole-doc span, and short/empty docs still advance the
    watermark.  A single explode branch means ONE watermark node: a
    two-branch union was measured to stall the global (min-policy)
    watermark whenever a micro-batch contained only sub-``n``-token
    docs, holding every window un-emitted.
    """
    toks = tokenize(F.col(text_col))
    idx = F.concat(
        F.array(F.lit(0)),
        F.when(
            F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
        ).otherwise(F.array().cast("array<int>")),
    )
    e = df.select(
        F.col(id_col),
        F.col(ts_col),
        toks.alias("__toks"),
        F.size(toks).alias("__n_toks"),
        F.explode(idx).alias("pos"),
    )
    gram = F.concat_ws(" ", F.slice(F.col("__toks"), F.greatest(F.col("pos"), F.lit(1)), n))
    wins = e.select(
        F.col(id_col),
        F.col(ts_col),
        F.col("pos"),
        F.col("__n_toks"),
        (F.col("pos") == 0).alias("__anchor"),
        F.when(
            F.col("pos") == 0,
            F.xxhash64(F.lit("anchor"), F.col(id_col), F.col(ts_col)),
        )
        .otherwise(F.xxhash64(gram))
        .alias("win_h"),
    )
    kept = wins.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["win_h", "__anchor"]
    )
    per_doc = kept.groupBy(F.window(ts_col, agg_window), F.col(id_col)).agg(
        F.collect_list("pos").alias("__kept"),
        F.max("__n_toks").alias("__n_toks"),
    )
    all_pos = F.when(
        F.col("__n_toks") >= n,
        F.sequence(F.lit(1), F.col("__n_toks") - F.lit(n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    dup_pos = F.array_sort(F.array_except(all_pos, F.col("__kept")))
    # islands over same-length windows: ends are monotone in pos, so
    # "touches the last span" is the batch op's pos > prev_max_end + 1
    # rule with prev_max_end = the last accumulated end
    last = F.element_at  # alias for brevity below
    spans = F.aggregate(
        dup_pos,
        F.array().cast("array<struct<s:int,e:int>>"),
        lambda acc, p: F.when(
            (F.size(acc) > 0) & (p <= last(acc, -1)["e"] + F.lit(1)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        last(acc, -1)["s"].alias("s"),
                        (p + F.lit(n - 1)).cast("int").alias("e"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(
                acc,
                F.array(
                    F.struct(
                        p.cast("int").alias("s"),
                        (p + F.lit(n - 1)).cast("int").alias("e"),
                    )
                ),
            )
        ),
    )
    return per_doc.select(
        "window", F.col(id_col), F.explode(spans).alias("__sp")
    ).select(
        "window",
        id_col,
        F.col("__sp.s").alias("span_start"),
        F.col("__sp.e").alias("span_end"),
    )


def dup_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    n: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Per-group duplicated-span accounting: how many documents carry
    duplicated spans and what share of tokens they cover — the
    go/no-go report before running remove_duplicated_spans over a
    corpus.  Span frames are aggregate-sized (one row per merged span)
    before the group rollup."""
    per_doc = (
        duplicated_spans(df, text_col, id_col, n, min_count)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.col("span_end") - F.col("span_start") + 1).alias("covered_tokens"),
        )
    )
    toks = tokenize(F.col(text_col))
    base = df.select(F.col(id_col), F.col(group_col), F.size(toks).cast("long").alias("n_tokens"))
    joined = base.join(per_doc, id_col, "left")
    return joined.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum((F.col("n_spans") > 0).cast("long")), F.lit(0)).cast("long").alias(
            "affected_docs"
        ),
        # all-NULL-text groups sum to NULL; report 0 tokens, not None
        F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("long").alias("total_tokens"),
        F.coalesce(F.sum("covered_tokens"), F.lit(0)).cast("long").alias("covered_tokens"),
    )
