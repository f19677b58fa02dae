"""Heka wire-format source (Ping.scala:59-74's input): round-trip
encode/decode, framing resync, and end-to-end Heka file -> read_heka
-> an engine job."""

import json
import os

import pyspark.sql.functions as F

from telemetry_streaming_spark.sources import heka
from tests import fixtures


def _telemetry_message(ping_json: str, timestamp: int = 1) -> bytes:
    """A heka message shaped like the reference's telemetry records:
    meta fields + the submission JSON in a 'submission' field."""
    ping = json.loads(ping_json)
    meta = ping.pop("meta")
    ts = meta.pop("Timestamp")
    fields = dict(meta)
    fields["submission"] = json.dumps(ping)
    return heka.encode_message(fields, timestamp=ts, msg_uuid=b"\x01" * 16)


def test_protobuf_roundtrip_scalar_field_types():
    msg = heka.encode_message(
        {"s": "str", "i": 42, "neg": -7, "d": 1.5, "b": True, "raw": b"\x00\x01"},
        payload="PAYLOAD",
        timestamp=123456789,
        msg_uuid=b"\x02" * 16,
    )
    out = heka.parse_message(msg)
    assert out["timestamp"] == 123456789
    assert out["payload"] == "PAYLOAD"
    assert out["type"] == "telemetry"
    assert out["fields"]["s"] == "str"
    assert out["fields"]["i"] == 42
    assert out["fields"]["neg"] == -7
    assert out["fields"]["d"] == 1.5
    assert out["fields"]["b"] is True
    assert out["fields"]["raw"] == b"\x00\x01"


def test_frame_stream_roundtrip_and_resync():
    msgs = [
        heka.encode_message({"n": i}, timestamp=i, msg_uuid=bytes([i]) * 16)
        for i in range(1, 4)
    ]
    framed = heka.frame_stream(msgs)
    # inject garbage between frames 1 and 2 — decoder must resync
    one = heka.frame_message(msgs[0])
    corrupted = one + b"\xde\xad\xbe\xef" + heka.frame_stream(msgs[1:])
    got = list(heka.parse_frames(corrupted))
    assert [m["fields"]["n"] for m in got] == [1, 2, 3]
    # clean stream parses fully too
    assert [m["timestamp"] for m in heka.parse_frames(framed)] == [1, 2, 3]


def test_message_to_envelope_matches_engine_contract():
    env = {"build": {"architecture": "x86"}}
    msg = heka.encode_message(
        {
            "docType": "crash",
            "appName": "Firefox",
            "environment.build": json.dumps(env["build"]),
            "submission": json.dumps({"payload": {"crashDate": "2017-01-01"}}),
        },
        timestamp=99,
        msg_uuid=b"\x03" * 16,
    )
    out = heka.message_to_envelope(heka.parse_message(msg))
    assert out["meta"]["docType"] == "crash"
    assert out["meta"]["Timestamp"] == 99
    assert "submission" not in out["meta"]
    assert out["payload"]["crashDate"] == "2017-01-01"
    # dotted json field grafted onto the document root, off the meta
    assert out["environment"]["build"]["architecture"] == "x86"
    assert "environment.build" not in out["meta"]


def test_read_heka_end_to_end_into_crash_job(spark, tmp_path):
    """A framed Heka file drives the crash pipeline unchanged: the
    envelope the decoder emits is byte-compatible with the engine's
    JSON-line sources."""
    from telemetry_streaming_spark.jobs import crashes

    pings = [fixtures.crash_ping(), fixtures.crash_ping(fennec=True)]
    framed = heka.frame_stream([_telemetry_message(p) for p in pings])
    heka_dir = tmp_path / "heka"
    os.makedirs(heka_dir)
    (heka_dir / "part-0.heka").write_bytes(framed)

    raw = heka.read_heka(spark, str(heka_dir))
    lines = crashes.to_influx(raw, app_names=("Firefox", "Fennec")).collect()
    assert len(lines) == 2
    joined = "\n".join(r.value for r in lines)
    assert "appName=Firefox" in joined and "appName=Fennec" in joined
    assert "osName=Android" in joined  # Fennec fix-up still applies


def test_read_heka_envelope_equals_json_source(spark, tmp_path):
    """Same ping via Heka wire format and via the JSON-line source must
    produce identical parsed meta columns."""
    from telemetry_streaming_spark.functions.pings import parse_pings

    ping_json = fixtures.crash_ping()
    framed = heka.frame_message(_telemetry_message(ping_json))
    heka_dir = tmp_path / "heka2"
    os.makedirs(heka_dir)
    (heka_dir / "a.heka").write_bytes(framed)

    via_heka = parse_pings(heka.read_heka(spark, str(heka_dir))).select(
        F.col("ping")["meta"]["docType"].alias("dt"),
        F.col("ping")["meta"]["Timestamp"].alias("ts"),
        F.col("ping")["payload"]["crashDate"].alias("cd"),
    ).collect()
    via_json = parse_pings(fixtures.to_df(spark, [ping_json])).select(
        F.col("ping")["meta"]["docType"].alias("dt"),
        F.col("ping")["meta"]["Timestamp"].alias("ts"),
        F.col("ping")["payload"]["crashDate"].alias("cd"),
    ).collect()
    assert via_heka == via_json
