"""Multimodal-column plumbing tests (ext/multimodal.py).

The codec layer is stubbed (no PIL/ffmpeg in this container); what
these tests pin down is the Spark-side contract: schemas, Arrow batch
shapes through mapInPandas, metadata-driven routing, payload-local
hashing, and the frame-sampling schedule.
"""

import pytest
import pyspark.sql.functions as F

from telemetry_streaming_spark.ext import multimodal as M
from telemetry_streaming_spark.sources.registry import load_table

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    return M.media_table(docs).cache()


def _shape(schema):
    """(name, dataType) pairs recursively, ignoring nullability."""
    return [(f.name, f.dataType.simpleString()) for f in schema.fields]


def test_media_schema(media):
    assert _shape(media.schema) == _shape(M.MEDIA_SCHEMA)


def test_metadata_routing(media):
    by_type = {
        r.media_type: r.n
        for r in media.groupBy(F.col("meta.media_type").alias("media_type"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(by_type) == {"image", "audio", "video"}
    # image rows carry dims, audio carries sample_rate, video duration
    img = media.where("meta.media_type = 'image'").select("meta.*").first()
    assert img.width is not None and img.sample_rate is None
    aud = media.where("meta.media_type = 'audio'").select("meta.*").first()
    assert aud.sample_rate == 16000 and aud.width is None
    vid = media.where("meta.media_type = 'video'").select("meta.*").first()
    assert vid.duration_s >= 1.0


def test_content_hash_dedup_counts(media):
    groups = M.content_hash_dedup(media)
    total = media.count()
    assert groups.agg(F.sum("n_copies")).first()[0] == total
    # keeper is the min id of each group
    joined = (
        media.select(M.content_hash(F.col("payload")).alias("content_md5"), "media_id")
        .groupBy("content_md5")
        .agg(F.min("media_id").alias("expect_keeper"))
        .join(groups, "content_md5")
    )
    assert joined.where("expect_keeper != keeper_id").count() == 0


def test_decode_without_codec_raises(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|real image decoding"):
        M.decode_image_batch(media).collect()


def test_decode_with_fake_codec(media):
    decoded = M.decode_image_batch(media, codec=M.fake_image_codec)
    rows = decoded.collect()
    n_images = media.where("meta.media_type = 'image'").count()
    assert len(rows) == n_images
    for r in rows[:20]:
        assert r.n_pixels == r.width * r.height


def test_extract_features_deterministic(media):
    a = {r.media_id: r.feature for r in M.extract_features(media).collect()}
    b = {r.media_id: r.feature for r in M.extract_features(media).collect()}
    assert a == b
    feat = next(iter(a.values()))
    assert len(feat) == M.FEATURE_DIM
    assert all(0.0 <= x <= 1.0 for x in feat)


def test_sample_frames_schedule(media):
    frames = M.sample_frames(media, fps=1.0)
    per_media = {r.media_id: r.n for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    vids = {r.media_id: r.duration_s for r in media.where("meta.media_type = 'video'").select("media_id", "meta.duration_s").collect()}
    assert set(per_media) == set(vids)
    for mid, dur in vids.items():
        assert per_media[mid] == int(dur)
    # non-video media contribute no frames
    assert frames.join(
        media.where("meta.media_type != 'video'").select("media_id"), "media_id"
    ).count() == 0


def test_repartition_by_bytes(media):
    small = M.repartition_by_bytes(media, target_partition_mb=1)
    assert small.count() == media.count()
    assert small.rdd.getNumPartitions() >= 1


def test_sample_frames_zero_frame_media_emits_no_rows(spark):
    """duration_s * fps < 1 => no frames at all (not a phantom frame 0),
    matching the oracle's generate_series(0, -1) = empty semantics."""
    schema = (
        "media_id long, payload binary, meta struct<media_type:string,format:string,"
        "width:int,height:int,channels:int,sample_rate:int,duration_s:float,byte_len:bigint>"
    )
    rows = [
        (1, bytearray(b"x"), ("video", "mp4", None, None, None, None, 0.4, 1)),
        (2, bytearray(b"y"), ("video", "mp4", None, None, None, None, 2.0, 1)),
    ]
    media = spark.createDataFrame(rows, schema)
    out = M.sample_frames(media, fps=1.0).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r.frame_idx)
    assert 1 not in by_id
    assert sorted(by_id[2]) == [0, 1]


def test_audio_chunks_overlap_schedule(spark):
    import pyspark.sql.functions as F
    import pytest

    from telemetry_streaming_spark.ext.multimodal import audio_chunks

    media = spark.createDataFrame(
        [(1, "audio", 10.0), (2, "audio", 0.0), (3, "video", 10.0), (4, "audio", 2.0)],
        "media_id long, mt string, dur double",
    ).select(
        "media_id",
        F.struct(F.col("mt").alias("media_type"), F.col("dur").alias("duration_s")).alias("meta"),
    )
    rows = sorted(
        (r.media_id, r.chunk_idx, r.start_s, r.end_s)
        for r in audio_chunks(media, chunk_s=4, overlap_s=1).collect()
    )
    # 10s at 3s hop -> starts 0,3,6,9; ends clamped to duration
    assert rows == [
        (1, 0, 0, 4), (1, 1, 3, 7), (1, 2, 6, 10), (1, 3, 9, 10),
        (4, 0, 0, 2),
    ]
    # consecutive chunks overlap by exactly overlap_s (except the clamped tail)
    with pytest.raises(ValueError):
        audio_chunks(media, chunk_s=2, overlap_s=2)


def _wav_bytes(samples, sample_rate=16000, channels=1):
    """Build a real RIFF/WAVE PCM16 container with stdlib wave."""
    import io
    import wave
    from array import array

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(array("h", samples).tobytes())
    return buf.getvalue()


def test_decode_wav_batch_real_pcm_decode(spark):
    """decode_wav_batch parses REAL WAV containers: a square wave's
    energy and zero crossings are exact closed forms, a stereo clip
    decodes its first channel, and a corrupt payload degrades to
    decode_ok=0 without killing the partition."""
    import pyspark.sql.functions as F

    from telemetry_streaming_spark.ext.multimodal import decode_wav_batch

    # 1. square wave: 100 samples alternating +1000/-1000 at 8 kHz
    sq = [1000 if i % 2 == 0 else -1000 for i in range(100)]
    # 2. stereo: L channel ramps 0..49, R channel constant -7
    stereo = []
    for i in range(50):
        stereo += [i, -7]
    # 3. silence
    silence = [0] * 80
    rows = [
        (1, _wav_bytes(sq, sample_rate=8000)),
        (2, _wav_bytes(stereo, channels=2)),
        (3, _wav_bytes(silence)),
        (4, b"not a wav at all"),
    ]
    meta = F.struct(
        F.lit("audio").alias("media_type"), F.lit("wav").alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("channels"),
        F.lit(16000).alias("sample_rate"),
        F.lit(None).cast("float").alias("duration_s"),
        F.lit(0).cast("long").alias("byte_len"),
    )
    media = spark.createDataFrame(rows, ["media_id", "payload"]).select(
        F.col("media_id").cast("long").alias("media_id"), "payload",
        meta.alias("meta"),
    )
    got = {r["media_id"]: r for r in decode_wav_batch(media).collect()}

    sq_row = got[1]
    assert sq_row["decode_ok"] == 1
    assert sq_row["sample_rate"] == 8000
    assert sq_row["n_frames"] == 100
    assert sq_row["duration_ms"] == 100 * 1000 // 8000
    assert sq_row["energy"] == 100 * 1000 * 1000
    assert sq_row["zero_crossings"] == 99  # every consecutive pair flips

    st = got[2]
    assert (st["channels"], st["n_frames"]) == (2, 50)
    # first channel is the ramp 0..49: energy = sum i^2, no crossings
    assert st["energy"] == sum(i * i for i in range(50))
    assert st["zero_crossings"] == 0

    si = got[3]
    assert (si["decode_ok"], si["energy"], si["zero_crossings"]) == (1, 0, 0)

    bad = got[4]
    assert bad["decode_ok"] == 0 and bad["energy"] is None


def test_wav_roundtrip_series_rejects_out_of_range(spark):
    import pytest as _pytest

    from telemetry_streaming_spark.ext.multimodal import wav_roundtrip_series

    df = spark.createDataFrame(
        [(1, 1, 40000), (1, 2, 0)], ["k", "o", "v"]
    )
    with _pytest.raises(Exception, match="int16"):
        wav_roundtrip_series(df, "k", ["o"], "v").collect()
