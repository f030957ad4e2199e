"""AWS eventstream framing: spec-derived golden vectors, roundtrip
properties, incremental decoding, CRC tamper detection, and — when
botocore is present — interop proof that the REAL AWS SDK parser decodes
frames this encoder produced."""

from __future__ import annotations

import json
import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from python_kinesis_streaming_spark.sources.eventstream import (
    EventStreamDecoder,
    EventStreamError,
    decode_message,
    encode_event,
    encode_exception,
    encode_message,
)


def test_golden_empty_message_from_spec():
    """Hand-derived from the spec: no headers, empty payload.

    prelude = total_length=16, headers_length=0; both CRCs computed by
    the reference crc32 over the documented byte ranges."""
    prelude = struct.pack(">II", 16, 0)
    expect = (
        prelude
        + struct.pack(">I", zlib.crc32(prelude))
    )
    expect += struct.pack(">I", zlib.crc32(expect))
    got = encode_message({}, b"")
    assert got == expect
    assert len(got) == 16
    headers, payload, consumed = decode_message(got)
    assert headers == {} and payload == b"" and consumed == 16


def test_golden_string_header_layout():
    """Byte-level layout of one string header, assembled by hand:
    name_len(1) name value_type=7(1) value_len(2,BE) value."""
    msg = encode_message({":event-type": "Ping"}, b"{}")
    total, hlen = struct.unpack_from(">II", msg, 0)
    assert total == len(msg)
    hdr = msg[12 : 12 + hlen]
    assert hdr[0] == len(b":event-type")
    assert hdr[1 : 1 + 11] == b":event-type"
    assert hdr[12] == 7  # string type code
    assert struct.unpack_from(">H", hdr, 13)[0] == 4
    assert hdr[15:19] == b"Ping"
    assert msg[12 + hlen : total - 4] == b"{}"


@given(
    headers=st.dictionaries(
        st.text(min_size=1, max_size=20).filter(
            lambda s: 1 <= len(s.encode()) <= 255
        ),
        st.one_of(
            st.booleans(),
            st.text(max_size=50),
            st.binary(max_size=50),
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
        ),
        max_size=6,
    ),
    payload=st.binary(max_size=2000),
)
@settings(max_examples=150, deadline=None)
def test_roundtrip_property(headers, payload):
    headers2, payload2, consumed = decode_message(
        encode_message(headers, payload)
    )
    # bytes-valued headers come back as bytes, str as str, bool as bool
    assert payload2 == payload
    assert headers2 == {k: bytes(v) if isinstance(v, bytearray) else v
                        for k, v in headers.items()}


def test_incremental_decoder_across_chunk_boundaries():
    msgs = [
        encode_event("SubscribeToShardEvent", json.dumps({"i": i}).encode())
        for i in range(5)
    ]
    stream = b"".join(msgs)
    out = []
    dec = EventStreamDecoder()
    for i in range(0, len(stream), 7):  # deliberately frame-misaligned
        out.extend(dec.feed(stream[i : i + 7]))
    dec.close()
    assert [json.loads(p)["i"] for _, p in out] == [0, 1, 2, 3, 4]
    assert all(h[":message-type"] == "event" for h, _ in out)
    # mid-frame EOF is an error, not silence
    dec2 = EventStreamDecoder()
    list(dec2.feed(stream[:10]))
    with pytest.raises(EventStreamError, match="mid-frame"):
        dec2.close()


@pytest.mark.parametrize("flip_at", [4, 9, 20, -2])
def test_crc_tamper_detected(flip_at):
    msg = bytearray(encode_event("E", b'{"x": 1}'))
    msg[flip_at] ^= 0x01
    with pytest.raises(EventStreamError):
        decode_message(bytes(msg))


def test_exception_frame_shape():
    headers, payload, _ = decode_message(
        encode_exception("ResourceInUseException", b'{"message": "busy"}')
    )
    assert headers[":message-type"] == "exception"
    assert headers[":exception-type"] == "ResourceInUseException"
    assert json.loads(payload)["message"] == "busy"


def test_botocore_parses_our_frames():
    """Interop: the real AWS SDK's eventstream buffer decodes frames this
    encoder produced — same total/headers lengths, CRCs, header types."""
    eventstream = pytest.importorskip("botocore.eventstream")

    buf = eventstream.EventStreamBuffer()
    payloads = [json.dumps({"n": i}).encode() for i in range(3)]
    stream = b"".join(
        encode_event("SubscribeToShardEvent", p) for p in payloads
    ) + encode_exception("InternalFailureException", b'{"message": "boom"}')
    # feed misaligned chunks through botocore's incremental parser too
    msgs = []
    for i in range(0, len(stream), 13):
        buf.add_data(stream[i : i + 13])
        msgs.extend(buf)
    assert len(msgs) == 4
    for i, m in enumerate(msgs[:3]):
        assert m.headers[":message-type"] == "event"
        assert m.headers[":event-type"] == "SubscribeToShardEvent"
        assert json.loads(m.payload) == {"n": i}
    assert msgs[3].headers[":message-type"] == "exception"
    assert msgs[3].headers[":exception-type"] == "InternalFailureException"
