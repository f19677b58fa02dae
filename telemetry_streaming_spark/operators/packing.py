"""Sequence packing: map documents onto fixed-length training
sequences (GPT-style pretraining concatenates documents with an EOD
separator and cuts the token stream into seq_len windows; a document
can span sequence boundaries).

The core need is an exclusive running token total in a deterministic
document order — a distributed prefix sum.  A naive
``Window.orderBy(id)`` with no partitioning funnels the whole corpus
through ONE task (the exact anti-pattern the z-order writer was cured
of), so this module does the canonical two-level scan instead:

1. bucket documents by id range (order-preserving, width from one
   tiny min/max aggregate that rides the plan as a broadcast row);
2. per-bucket token sums (one map-side-combined aggregate, B rows);
3. exclusive bucket offsets via a window over those B rows — the only
   single-partition step, bounded by ``n_buckets`` (default 1024) by
   construction, never by data size;
4. within-bucket exclusive cumsum, partitioned by bucket — parallelism
   B, each task scanning one bucket's documents in id order.

Every exchanged row is (id, n_tokens, bucket) integers; all arithmetic
is integer-exact, so results hash-match a single-window SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import token_count

DEFAULT_BUCKETS = 1024


def sequence_packing(
    df: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Assign each document its span in the packed token stream.

    Returns (id, n_tokens, start_offset, first_seq, last_seq,
    n_seqs_spanned): ``start_offset`` is the exclusive prefix sum of
    token counts in ascending id order; a document occupies sequences
    ``start_offset // seq_len`` through ``(start_offset + n_tokens - 1)
    // seq_len``.  Downstream, a trainer groups by sequence id to
    materialize batches; spanning documents appear in every sequence
    they touch.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")

    base = df.select(F.col(id_col), token_count(F.col(text_col)).alias("n_tokens"))
    bounds = base.agg(
        F.min(id_col).alias("__min_id"), F.max(id_col).alias("__max_id")
    )
    width = F.greatest(
        F.ceil((F.col("__max_id") - F.col("__min_id") + 1) / F.lit(n_buckets)).cast("long"),
        F.lit(1).cast("long"),
    )
    bucketed = (
        base.join(F.broadcast(bounds))
        .withColumn("__bucket", F.floor((F.col(id_col) - F.col("__min_id")) / width))
        .drop("__min_id", "__max_id")
    )

    bucket_sums = bucketed.groupBy("__bucket").agg(F.sum("n_tokens").alias("__bsum"))
    # exclusive offsets over <= n_buckets rows: the bounded single-
    # partition step (B is a constant knob, independent of corpus size)
    w_buckets = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bucket_sums.select(
        "__bucket",
        F.coalesce(F.sum("__bsum").over(w_buckets), F.lit(0)).alias("__boffset"),
    )

    w_in = (
        Window.partitionBy("__bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0)) + F.col("__boffset")
    out = (
        bucketed.join(F.broadcast(offsets), "__bucket")
        .withColumn("start_offset", start.cast("long"))
        .drop("__bucket", "__boffset")
    )
    # integer `div`, not float `/`+cast: exact at any offset magnitude
    first_seq = F.expr(f"start_offset div {seq_len}")
    last_seq = F.expr(f"(start_offset + n_tokens - 1) div {seq_len}")
    return out.select(
        F.col(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "start_offset",
        first_seq.alias("first_seq"),
        last_seq.alias("last_seq"),
        (last_seq - first_seq + 1).alias("n_seqs_spanned"),
    )


def packing_stats(packed: DataFrame) -> DataFrame:
    """Per-sequence occupancy from a :func:`sequence_packing` result:
    (seq_id, n_docs, n_boundary_docs).  A doc counts for every
    sequence it touches; boundary docs span into the next sequence.
    One explode of the (small, per-doc) sequence range + one count
    aggregate.  (Everything derives from first_seq/last_seq, so the
    packing's seq_len is not needed here — an earlier dead parameter
    suggested otherwise.)"""
    seqs = packed.select(
        F.explode(F.sequence(F.col("first_seq"), F.col("last_seq"))).alias("seq_id"),
        F.col("last_seq"),
    )
    return seqs.groupBy("seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("last_seq") > F.col("seq_id")).cast("long")).alias("n_boundary_docs"),
    )
