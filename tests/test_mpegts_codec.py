"""MPEG-TS: PSI CRC against the public check value, PAT/PMT parsing,
PES reassembly across packets, PTS 33-bit coding, continuity-gap
detection, stuffing alignment, and MJPEG end-to-end."""

from __future__ import annotations

import numpy as np
import pytest

from python_kinesis_streaming_spark.llm.jpeg_codec import (
    decode_jpeg,
    encode_jpeg,
)
from python_kinesis_streaming_spark.llm.mpegts_codec import (
    TS_PACKET,
    _psi_crc32,
    _pts_decode,
    _pts_encode,
    build_ts,
    decode_ts_frames,
    parse_ts,
)


def test_psi_crc32_public_check_value():
    # CRC-32/MPEG-2 check value for "123456789" (public catalogue)
    assert _psi_crc32(b"123456789") == 0x0376E6E7


def test_pts_roundtrip_33_bits():
    for v in (0, 1, 90_000, 2**32, 2**33 - 1):
        enc = _pts_encode(v)
        assert len(enc) == 5
        assert enc[0] >> 4 == 0b0010
        # marker bits present
        assert enc[0] & 1 and enc[2] & 1 and enc[4] & 1
        assert _pts_decode(enc) == v


def test_build_emits_aligned_packets_and_parses_back():
    payloads = [b"A" * 10, b"B" * 500, b"C" * 184]
    ts = build_ts(payloads, pts_ms=[0, 40, 80])
    assert len(ts) % TS_PACKET == 0
    assert all(ts[i] == 0x47 for i in range(0, len(ts), TS_PACKET))
    info = parse_ts(ts)
    assert info["streams"] == [{"pid": 0x100, "stream_type": 0x06}]
    got = [(f["pts_ms"], f["payload"]) for f in info["frames"]]
    assert got == [(0, b"A" * 10), (40, b"B" * 500), (80, b"C" * 184)]


def test_pes_reassembly_spans_many_packets():
    big = bytes(np.random.default_rng(0).integers(0, 256, 10_000, dtype=np.uint8))
    ts = build_ts([big], pts_ms=[1234])
    info = parse_ts(ts)
    (f,) = info["frames"]
    assert f["payload"] == big and f["pts_ms"] == 1234
    assert len(ts) // TS_PACKET > 50  # really did span packets


def test_keyframe_rai_flags():
    ts = build_ts([b"k", b"p", b"k2", b"p2"], keyframe_every=2)
    flags = [f["keyframe"] for f in parse_ts(ts)["frames"]]
    assert flags == [True, False, True, False]


def test_continuity_gap_detected():
    payloads = [b"x" * 2000]
    ts = bytearray(build_ts(payloads))
    # drop one mid-stream ES packet (not the first): splice it out
    n = len(ts) // TS_PACKET
    cut = (n // 2) * TS_PACKET
    corrupted = bytes(ts[:cut]) + bytes(ts[cut + TS_PACKET :])
    with pytest.raises(ValueError, match="continuity"):
        parse_ts(corrupted)


def test_rejects_garbage():
    with pytest.raises(ValueError):
        parse_ts(b"\x00" * 188)
    with pytest.raises(ValueError):
        parse_ts(b"short")


def test_mjpeg_end_to_end():
    rng = np.random.default_rng(3)
    frames = [
        rng.integers(0, 256, (16, 16, 3), dtype=np.uint8) for _ in range(3)
    ]
    payloads = [encode_jpeg(f, quality=85) for f in frames]
    ts = build_ts(payloads, stream_type=0x06)
    ref = [decode_jpeg(p) for p in payloads]
    for got, want in zip(decode_ts_frames(ts), ref):
        assert (got == want).all()
