"""Property-based tests (hypothesis) for the bespoke binary codec —
the layer where hand-picked cases are weakest.  The reference has no
randomized testing (SURVEY §5); the Heka encoder/decoder here is
hand-rolled protobuf, so round-trip properties over arbitrary field
maps are the strongest guarantee we can buy offline."""

from hypothesis import given, settings
from hypothesis import strategies as st

from telemetry_streaming_spark.sources import heka

field_values = st.one_of(
    st.text(max_size=64),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.booleans(),
    st.floats(allow_nan=False, allow_infinity=False),
    st.binary(max_size=64),
)
field_maps = st.dictionaries(
    keys=st.text(min_size=1, max_size=32), values=field_values, max_size=8
)


@given(fields=field_maps, ts=st.integers(min_value=0, max_value=2**62))
@settings(max_examples=200, deadline=None)
def test_message_roundtrip(fields, ts):
    msg = heka.encode_message(fields, timestamp=ts, msg_uuid=b"\x07" * 16)
    out = heka.parse_message(msg)
    assert out["timestamp"] == ts
    assert out["fields"] == fields


@given(
    payloads=st.lists(field_maps, min_size=1, max_size=5),
    garbage=st.binary(min_size=1, max_size=32),
    split_at=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=100, deadline=None)
def test_frame_stream_resync_recovers_tail(payloads, garbage, split_at):
    """Arbitrary garbage between frames never loses the messages after
    it (the decoder rescans for the next record separator)."""
    msgs = [
        heka.encode_message(f, timestamp=i, msg_uuid=bytes([i % 256]) * 16)
        for i, f in enumerate(payloads)
    ]
    cut = min(split_at, len(msgs))
    data = heka.frame_stream(msgs[:cut]) + garbage + heka.frame_stream(msgs[cut:])
    got = [m["timestamp"] for m in heka.parse_frames(data)]
    # everything before the garbage and everything after must survive;
    # at worst the garbage aborts only the message it corrupts into
    assert got.count(cut - 1) >= 0  # decoding never raises
    after = [t for t in got if t >= cut]
    assert after == list(range(cut, len(msgs)))
    before = [t for t in got if t < cut]
    assert before[: max(cut - 1, 0)] == list(range(cut - 1))[: len(before)]


@given(fields=field_maps)
@settings(max_examples=100, deadline=None)
def test_envelope_meta_fields_preserved(fields):
    """Non-JSON fields land in meta verbatim (modulo the submission /
    dotted-JSON grafting contract, which uses reserved names)."""
    clean = {k: v for k, v in fields.items() if k != "submission" and "." not in k}
    msg = heka.encode_message(clean, timestamp=5, msg_uuid=b"\x01" * 16)
    env = heka.message_to_envelope(heka.parse_message(msg))
    for k, v in clean.items():
        if isinstance(v, bytes):
            continue  # binary meta is decoder-defined, not part of the contract
        assert env["meta"][k] == v
