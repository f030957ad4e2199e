"""Matroska/EBML demux: VINT arithmetic, hand-built golden bytes, all
three lacing schemes resolved to byte-exact slices (every MJPEG slice
must start with SOI and decode identically to the raw JPEG — an
invariant the demuxer cannot fake), keyframe semantics, and garbage
rejection."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from python_kinesis_streaming_spark.llm.jpeg_codec import (
    decode_jpeg,
    encode_jpeg,
)
from python_kinesis_streaming_spark.llm.mkv_codec import (
    _read_svint,
    _read_vint,
    _vint_size,
    build_mkv,
    decode_mkv_frames,
    parse_mkv,
)


def _frames(n=4, h=24, w=32, seed=5):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


def _mjpeg_payloads(frames, q=85):
    return [encode_jpeg(f, quality=q) for f in frames]


def test_vint_roundtrip_and_signed():
    for v in (0, 1, 126, 127, 128, 16382, 16383, 16384, 2**21 - 2, 2**28):
        enc = _vint_size(v)
        got, n = _read_vint(enc, 0, keep_marker=False)
        assert (got, n) == (v, len(enc))
    # signed vint: 1-byte bias is 63
    assert _read_svint(bytes([0x80 | 63]), 0) == (0, 1)
    assert _read_svint(bytes([0x80 | 0]), 0) == (-63, 1)
    assert _read_svint(bytes([0x80 | 126]), 0) == (63, 1)


def test_golden_hand_built_stream():
    """Assemble a 1-frame file byte-by-byte from the spec and check
    every resolved field — independent of the muxer."""
    payload = b"FRAMEDATA"
    sb = b"\x81" + struct.pack(">h", 0) + b"\x80" + payload
    cluster_body = b"\xe7\x81\x00" + b"\xa3" + bytes([0x80 | len(sb)]) + sb
    cluster = b"\x1f\x43\xb6\x75" + bytes([0x80 | len(cluster_body)]) + cluster_body
    video = b"\xb0\x81\x20" + b"\xba\x81\x18"  # 32x24
    te_body = (
        b"\xd7\x81\x01"          # TrackNumber 1
        + b"\x83\x81\x01"        # TrackType video
        + b"\x86" + bytes([0x80 | 7]) + b"V_MJPEG"
        + b"\xe0" + bytes([0x80 | len(video)]) + video
    )
    tracks_body = b"\xae" + bytes([0x80 | len(te_body)]) + te_body
    tracks = b"\x16\x54\xae\x6b" + bytes([0x80 | len(tracks_body)]) + tracks_body
    info_body = b"\x2a\xd7\xb1\x83\x0f\x42\x40"  # scale 1_000_000
    info = b"\x15\x49\xa9\x66" + bytes([0x80 | len(info_body)]) + info_body
    seg_body = info + tracks + cluster
    seg = b"\x18\x53\x80\x67" + bytes([0x80 | len(seg_body)]) + seg_body
    ebml_body = b"\x42\x82" + bytes([0x80 | 8]) + b"matroska"
    blob = (
        b"\x1a\x45\xdf\xa3" + bytes([0x80 | len(ebml_body)]) + ebml_body + seg
    )
    got = parse_mkv(blob)
    assert got["codec"] == "V_MJPEG"
    assert (got["width"], got["height"]) == (32, 24)
    assert got["n_frames"] == 1
    fr = got["frames"][0]
    assert blob[fr["offset"] : fr["offset"] + fr["size"]] == payload
    assert fr["keyframe"] is True and fr["pts_ms"] == 0


def test_simpleblock_per_frame_roundtrip():
    frames = _frames()
    mkv = build_mkv(
        _mjpeg_payloads(frames), width=32, height=24, keyframe_every=2
    )
    info = parse_mkv(mkv)
    assert info["n_frames"] == 4
    assert [f["keyframe"] for f in info["frames"]] == [
        True, False, True, False,
    ]
    assert [f["pts_ms"] for f in info["frames"]] == [0, 40, 80, 120]
    ref = [decode_jpeg(p) for p in _mjpeg_payloads(frames)]
    for got, want in zip(decode_mkv_frames(mkv), ref):
        assert (got == want).all()


@pytest.mark.parametrize("lacing", ["xiph", "ebml", "fixed"])
def test_lacing_schemes_resolve_exact_slices(lacing):
    frames = _frames(5, h=16, w=16)
    payloads = _mjpeg_payloads(frames)
    if lacing == "fixed":
        # pad to equal sizes (fixed lacing requires it)
        m = max(len(p) for p in payloads)
        payloads = [p + b"\x00" * (m - len(p)) for p in payloads]
    mkv = build_mkv(payloads, width=16, height=16, lacing=lacing)
    info = parse_mkv(mkv)
    assert info["n_frames"] == 5
    for fr, p in zip(info["frames"], payloads):
        blob = mkv[fr["offset"] : fr["offset"] + fr["size"]]
        assert blob == p
        assert blob[:2] == b"\xff\xd8"  # SOI — structural invariant
    ref = [decode_jpeg(p) for p in payloads]
    for got, want in zip(decode_mkv_frames(mkv), ref):
        assert (got == want).all()


def test_xiph_lacing_with_255_boundary_sizes():
    # sizes straddling the 255 run-length boundary exercise the coder
    payloads = [b"A" * 254, b"B" * 255, b"C" * 256, b"D" * 10]
    mkv = build_mkv(payloads, codec_id="V_UNCOMPRESSED", lacing="xiph")
    info = parse_mkv(mkv)
    got = [
        mkv[f["offset"] : f["offset"] + f["size"]] for f in info["frames"]
    ]
    assert got == payloads


def test_ebml_lacing_growing_and_shrinking_sizes():
    payloads = [b"x" * 300, b"y" * 100, b"z" * 250, b"w" * 7]
    mkv = build_mkv(payloads, codec_id="V_UNCOMPRESSED", lacing="ebml")
    info = parse_mkv(mkv)
    got = [
        mkv[f["offset"] : f["offset"] + f["size"]] for f in info["frames"]
    ]
    assert got == payloads


def test_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        parse_mkv(b"not matroska")
    mkv = build_mkv(_mjpeg_payloads(_frames(2)), width=32, height=24)
    with pytest.raises(ValueError):
        parse_mkv(mkv[: len(mkv) // 2])


def test_timestamp_scale_respected():
    # pts_ms = ticks * scale / 1e6: halving the scale to 500_000 turns
    # tick 40 into 20 ms
    frames = _mjpeg_payloads(_frames(2))
    mkv = bytearray(build_mkv(frames, width=32, height=24, fps=25))
    # patch TimestampScale value in place (3-byte uint after the
    # 3-byte id and 1-byte size: 0x0F4240 → 0x07A120)
    pos = bytes(mkv).find(b"\x2a\xd7\xb1")
    assert pos > 0
    mkv[pos + 4 : pos + 7] = (500_000).to_bytes(3, "big")
    info = parse_mkv(bytes(mkv))
    assert [f["pts_ms"] for f in info["frames"]] == [0, 20]


def test_probe_video_and_frames_seam_mkv(spark):
    from python_kinesis_streaming_spark.llm.video_codecs import (
        probe_video,
        video_frames_frame,
    )

    frames = _frames(4)
    payloads = _mjpeg_payloads(frames)
    mkv = build_mkv(payloads, width=32, height=24, keyframe_every=2)
    probe = probe_video("mkv", mkv)
    assert probe["codec"] == "V_MJPEG" and probe["n_frames"] == 4

    rows = [
        (1, "mkv", bytearray(mkv)),
        (2, "mkv", bytearray(b"junk")),
    ]
    df = spark.createDataFrame(rows, "vid long, fmt string, payload binary")
    out = video_frames_frame(df, "vid", "fmt", "payload", every_n=2).collect()
    ok = [r for r in out if not r["format"].startswith("error:")]
    assert [(r["id"], r["frame_index"]) for r in ok] == [(1, 0), (1, 2)]
    assert all(r["n_frames_total"] == 4 for r in ok)
    assert [r["keyframe"] for r in ok] == [True, True]
    err = [r for r in out if r["format"].startswith("error:")]
    assert [r["id"] for r in err] == [2]


def test_media_seam_dispatches_mkv(spark):
    from python_kinesis_streaming_spark.llm.media_codecs import (
        media_features_frame,
    )

    frames = _frames(3, h=16, w=20)
    mkv = build_mkv(_mjpeg_payloads(frames), width=20, height=16)
    df = spark.createDataFrame(
        [(1, "mkv", bytearray(mkv))], "doc_id long, fmt string, payload binary"
    )
    r = media_features_frame(df, "doc_id", "fmt", "payload").collect()[0]
    assert r["format"] == "mkv" and r["n_frames"] == 3
    assert (r["height"], r["width"]) == (16, 20)
