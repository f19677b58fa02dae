"""Multimodal (image/audio/video) columns for a 100TB training-data
pipeline.

Design contract (BASELINE.json extension surface):

- Media payloads are **opaque ``binary`` columns** + a typed metadata
  struct.  Spark never interprets the bytes; all relational work
  (dedup, filtering, routing, sampling schedules) runs on metadata and
  content hashes, JVM-side.
- Decode / feature-extract / resize run as **Arrow-batched pandas
  functions over ``mapInPandas``** — one Python process per partition,
  one ``pandas.DataFrame`` per Arrow batch, never per-row Python.
- The actual codec calls (PIL/libjpeg/ffmpeg) are **STUBBED** in this
  container (the libs aren't installed): ``decode_image_batch`` raises
  ``NotImplementedError`` unless handed the deterministic fake codec,
  which "decodes" our self-describing payload header instead.  The
  Spark-side plumbing — schemas, batch iteration, partition budgeting,
  UDF signatures — is real and tested.

Scale posture:
- payload columns dominate bytes; ``repartition_by_bytes`` sizes
  partitions to an executor-memory budget *before* any mapInPandas
  stage so one Arrow batch never materializes GBs.
- content-hash dedup is a hash-groupBy on md5(payload) — exactly the
  exact-dedup tier, one shuffle of (hash, id), payloads never shuffle.
- frame sampling emits (media_id, frame_idx, t_s) rows via
  ``sequence``+``explode`` (JVM-side); only sampled frames would ever
  be decoded downstream.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Typed metadata carried next to every payload (SURVEY §1.2 discipline:
# fixed schema, nullable fields; unknown media kinds leave fields null).
MEDIA_METADATA_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),  # image | audio | video
        StructField("format", StringType()),  # e.g. jpeg / wav / mp4
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_s", FloatType()),
        StructField("byte_len", LongType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType()),
        StructField("meta", MEDIA_METADATA_SCHEMA),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("feature", ArrayType(FloatType())),
    ]
)

DECODED_IMAGE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_pixels", LongType()),
    ]
)


# ---------------------------------------------------------------------------
# Media-table construction (documents -> opaque payloads + metadata)
# ---------------------------------------------------------------------------
def media_table(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic media table over the documents corpus: payload =
    utf8 bytes of the text (an opaque stand-in for real image/audio
    bytes), metadata derived from (id, byte length) so every engine
    can reproduce it.  Real ingestion would read payloads from object
    storage and metadata from container headers."""
    media_type = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    byte_len = F.octet_length(F.col(text_col)).cast("long")
    meta = F.struct(
        media_type.alias("media_type"),
        F.when(media_type == "image", F.lit("jpeg"))
        .when(media_type == "audio", F.lit("wav"))
        .otherwise(F.lit("mp4"))
        .alias("format"),
        F.when(media_type == "image", (F.col(id_col) % 64 + 1).cast("int")).alias("width"),
        F.when(media_type == "image", (F.col(id_col) % 48 + 1).cast("int")).alias("height"),
        F.when(media_type == "image", F.lit(3)).cast("int").alias("channels"),
        F.when(media_type == "audio", F.lit(16000)).cast("int").alias("sample_rate"),
        F.when(media_type != "image", (F.col(id_col) % 30 + 1).cast("float")).alias(
            "duration_s"
        ),
        byte_len.alias("byte_len"),
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        meta.alias("meta"),
    )


def content_hash(payload: Column) -> Column:
    """md5 of the raw payload bytes — the binary-column exact-dedup
    key.  Engine-portable (md5 over bytes is md5 over bytes)."""
    return F.md5(payload)


def content_hash_dedup(media: DataFrame) -> DataFrame:
    """Exact dedup groups over opaque payloads: one shuffle of
    (hash, id) pairs; the payload bytes themselves never shuffle
    (hash computed map-side)."""
    return (
        media.select(content_hash(F.col("payload")).alias("content_md5"), F.col("media_id"))
        .groupBy("content_md5")
        .agg(F.min("media_id").alias("keeper_id"), F.count("*").alias("n_copies"))
    )


def repartition_by_bytes(media: DataFrame, target_partition_mb: int = 256) -> DataFrame:
    """Size partitions so payload bytes per partition ≈ target.  Run
    before any mapInPandas stage: an Arrow batch materializes a whole
    partition's payloads in one Python process."""
    row = media.select(
        F.sum(F.coalesce(F.col("meta.byte_len"), F.octet_length("payload"))).alias("b")
    ).first()
    total_mb = (row["b"] or 0) / (1024 * 1024)
    n = max(1, int(total_mb / target_partition_mb) + 1)
    return media.repartition(n, "media_id")


# ---------------------------------------------------------------------------
# Frame sampling (video): schedule is JVM-side; decoding is downstream
# ---------------------------------------------------------------------------
def sample_frames(media: DataFrame, fps: float = 1.0) -> DataFrame:
    """One row per sampled frame: frame_idx 0..floor(duration*fps)-1
    and its timestamp.  `sequence`+`explode`, no Python — only the
    sampled frames ever reach a decoder."""
    n_frames = F.floor(F.col("meta.duration_s") * F.lit(fps)).cast("int")
    # n_frames >= 1 gate: sequence(0, -1) would be a DESCENDING [0,-1]
    # and greatest(n_frames-1, 0) would emit a phantom frame 0 for
    # zero-frame media (duration*fps < 1); such rows must yield no
    # frames at all (ADVICE r1).
    frames = F.when(
        (F.col("meta.media_type") == "video") & (n_frames >= 1),
        F.sequence(F.lit(0), n_frames - 1),
    )
    return (
        media.select("media_id", F.explode(frames).alias("frame_idx"))
        .select(
            "media_id",
            "frame_idx",
            (F.col("frame_idx") / F.lit(fps)).cast("double").alias("t_s"),
        )
    )


# ---------------------------------------------------------------------------
# Pandas-batched decode / feature stages (STUBBED codecs)
# ---------------------------------------------------------------------------
def fake_image_codec(payload: bytes) -> dict[str, Any]:
    """Deterministic stand-in for PIL/libjpeg: 'decodes' dimensions
    from the byte content.  Clearly NOT a real decoder — it exists so
    the mapInPandas plumbing is executable and testable in this
    container."""
    n = len(payload)
    return {"width": (n % 64) + 1, "height": (n % 48) + 1}


def decode_image_batch(
    media: DataFrame, codec: Callable[[bytes], dict[str, Any]] | None = None
) -> DataFrame:
    """Arrow-batched image decode over mapInPandas.

    ``codec`` is the per-payload decode call.  Passing None selects the
    real-decoder path, which is **NOT IMPLEMENTED** in this container
    (no PIL/libjpeg); production deployments inject
    ``lambda b: PIL.Image.open(io.BytesIO(b))``-backed codecs.  Tests
    inject :func:`fake_image_codec`.
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if codec is None:
                raise NotImplementedError(
                    "real image decoding requires PIL/libjpeg, not available "
                    "in this container; inject a codec (see fake_image_codec)"
                )
            decoded = [codec(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "n_pixels": [d["width"] * d["height"] for d in decoded],
                }
            )

    imgs = media.where(F.col("meta.media_type") == "image").select("media_id", "payload")
    return imgs.mapInPandas(run, DECODED_IMAGE_SCHEMA)


DECODED_WAV_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("decode_ok", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("duration_ms", LongType()),
        StructField("energy", LongType()),  # sum of squared int16 samples
        StructField("zero_crossings", LongType()),
    ]
)


def decode_wav_batch(media: DataFrame) -> DataFrame:
    """REAL audio decode — not a stub: parses RIFF/WAVE PCM containers
    with the stdlib ``wave`` module (present in every CPython, no
    external codec), Arrow-batched over mapInPandas like the image
    tier.  One row per audio payload:

    - ``decode_ok`` 0 with null fields for non-WAV / non-16-bit-PCM
      payloads (corrupt media is a DATA condition at crawl scale, not
      an exception — a poisoned payload must not kill the partition);
    - ``n_frames`` / ``sample_rate`` / ``duration_ms`` (integer
      ``n * 1000 div sr``) from the container header;
    - ``energy`` = sum of squared first-channel int16 samples and
      ``zero_crossings`` — both exact BIGINTs (energy fits int64 up to
      ~8.6e9 samples ≈ 150 hours of 16 kHz audio per clip), so the
      features hash-replicate in any implementation.

    WAV bytes are little-endian; the samples array is byteswapped on
    big-endian hosts so the decoded values are identical everywhere.
    """

    def run(batches: Iterator) -> Iterator:
        import io
        import sys
        import wave
        from array import array

        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "media_id", "decode_ok", "sample_rate", "channels",
                "n_frames", "duration_ms", "energy", "zero_crossings",
            )}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                try:
                    with wave.open(io.BytesIO(bytes(payload))) as w:
                        sr = w.getframerate()
                        ch = w.getnchannels()
                        n = w.getnframes()
                        if w.getsampwidth() != 2 or sr <= 0 or ch <= 0:
                            raise ValueError("unsupported PCM layout")
                        raw = w.readframes(n)
                    samples = array("h")
                    samples.frombytes(raw)
                    if sys.byteorder == "big":
                        samples.byteswap()
                    mono = samples[::ch]
                    # zero crossings over CONSECUTIVE sample pairs
                    # (sign of 0 is non-negative); no phantom crossing
                    # is counted before the first sample
                    energy = 0
                    zc = 0
                    prev = None
                    for s in mono:
                        energy += s * s
                        if prev is not None and (
                            (s < 0 <= prev) or (prev < 0 <= s)
                        ):
                            zc += 1
                        prev = s
                    out["decode_ok"].append(1)
                    out["sample_rate"].append(sr)
                    out["channels"].append(ch)
                    out["n_frames"].append(len(mono))
                    out["duration_ms"].append(len(mono) * 1000 // sr)
                    out["energy"].append(energy)
                    out["zero_crossings"].append(zc)
                except Exception:
                    out["decode_ok"].append(0)
                    for k in ("sample_rate", "channels", "n_frames",
                              "duration_ms", "energy", "zero_crossings"):
                        out[k].append(None)
            yield pd.DataFrame(out)

    auds = media.where(F.col("meta.media_type") == "audio").select(
        "media_id", "payload"
    )
    return auds.mapInPandas(run, DECODED_WAV_SCHEMA)


WAV_ROUNDTRIP_SCHEMA = StructType(
    [
        StructField("series_key", LongType()),
        StructField("n_frames", LongType()),
        StructField("duration_ms", LongType()),
        StructField("energy", LongType()),
        StructField("zero_crossings", LongType()),
    ]
)


def wav_roundtrip_series(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    sample_rate: int = 16000,
) -> DataFrame:
    """Encode each key's ordered int16 series into a REAL RIFF/WAVE
    PCM container (stdlib ``wave``), decode it back, and emit the
    decoded stats — the end-to-end proof that the binary-column path
    (encode -> opaque bytes -> Arrow batch -> decode) is lossless.
    Because PCM16 is exact, the decoded ``energy`` / ``zero_crossings``
    equal what ANY engine computes directly from the integers — which
    is exactly what the registry oracle does in SQL, making this the
    rare multimodal operator with a full hash check, not a rows-only
    one.

    Per-key series assemble via array_sort over (order..., value)
    structs — one key exchange, no second window pass (the session-path
    pattern); each key's series must fit one task, the same contract
    as the DTW and path operators.  Values must already be in int16
    range — out-of-range values raise in the encoder rather than
    silently wrapping.
    """

    def run(batches: Iterator) -> Iterator:
        import io
        import sys
        import wave
        from array import array

        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "series_key", "n_frames", "duration_ms", "energy",
                "zero_crossings",
            )}
            for key, vals in zip(pdf["series_key"], pdf["series"]):
                samples = [int(v) for v in vals]
                if any(not -32768 <= s <= 32767 for s in samples):
                    raise ValueError(f"series {key}: sample out of int16 range")
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(sample_rate)
                    arr = array("h", samples)
                    if sys.byteorder == "big":
                        arr.byteswap()
                    w.writeframes(arr.tobytes())
                # decode the bytes we just wrote — the full roundtrip
                with wave.open(io.BytesIO(buf.getvalue())) as w:
                    sr = w.getframerate()
                    n = w.getnframes()
                    raw = w.readframes(n)
                back = array("h")
                back.frombytes(raw)
                if sys.byteorder == "big":
                    back.byteswap()
                energy = 0
                zc = 0
                prev = None
                for s in back:
                    energy += s * s
                    if prev is not None and ((s < 0 <= prev) or (prev < 0 <= s)):
                        zc += 1
                    prev = s
                out["series_key"].append(key)
                out["n_frames"].append(n)
                out["duration_ms"].append(n * 1000 // sr)
                out["energy"].append(energy)
                out["zero_crossings"].append(zc)
            yield pd.DataFrame(out)

    ordered = df.groupBy(F.col(key_col).cast("long").alias("series_key")).agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(*[F.col(c) for c in order_cols], F.col(value_col))
                )
            ),
            lambda s: s[value_col].cast("long"),
        ).alias("series")
    )
    return ordered.mapInPandas(run, WAV_ROUNDTRIP_SCHEMA)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Deterministic 'embedding' per payload via mapInPandas — the
    batch shape (Arrow transfer, vectorized per-partition work) is
    exactly what a CLIP/wav2vec stage would use; the feature fn is a
    hash-derived placeholder."""

    def run(batches: Iterator) -> Iterator:
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                digest = hashlib.md5(bytes(p)).digest()
                feats.append(
                    np.frombuffer(digest[: dim * 2], dtype=np.uint16).astype(np.float32)
                    / 65535.0
                )
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return media.select("media_id", "payload").mapInPandas(run, FEATURES_SCHEMA)


def audio_chunks(media: DataFrame, chunk_s: int = 4, overlap_s: int = 1) -> DataFrame:
    """Overlapping fixed-length chunk schedule for audio payloads —
    the windowing an ASR/embedding pass consumes (chunk k starts at
    ``k * (chunk_s - overlap_s)``; the tail chunk is clamped to the
    duration).  ``sequence``+``posexplode``, no Python: like
    :func:`sample_frames`, only scheduled chunks would ever reach a
    decoder, and zero-duration media yield no rows.

    Integer-seconds arithmetic throughout, so the schedule is
    engine-portable (DuckDB oracle: ``multimodal_audio_chunks``).
    """
    if chunk_s < 1 or not 0 <= overlap_s < chunk_s:
        raise ValueError(f"need chunk_s >= 1 and 0 <= overlap_s < chunk_s, got {chunk_s}/{overlap_s}")
    hop = chunk_s - overlap_s
    dur = F.col("meta.duration_s").cast("int")
    starts = F.when(
        (F.col("meta.media_type") == "audio") & (dur >= 1),
        F.sequence(F.lit(0), dur - 1, F.lit(hop)),
    )
    return media.select(
        "media_id", F.posexplode(starts).alias("chunk_idx", "start_s"), dur.alias("__d")
    ).select(
        "media_id",
        "chunk_idx",
        F.col("start_s").cast("long").alias("start_s"),
        F.least(F.col("start_s") + F.lit(chunk_s), F.col("__d")).cast("long").alias("end_s"),
    )
