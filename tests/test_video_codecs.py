"""Video container (AVI / MP4) demux + mux + frame-sampling seam tests.

Ground truth strategy (no ffmpeg in the container):
- DIB AVI is uncompressed → mux/demux must roundtrip BIT-EXACT.
- MJPG AVI and MJPEG-MP4 frames must decode identically to running the
  (deterministic) from-spec JPEG codec directly on the same pixels —
  the container layer must be byte-transparent.
- Sample-table resolution is checked STRUCTURALLY: every resolved
  (offset, size) slice of the MP4 must start with an SOI marker and end
  with EOI — an independent invariant the demuxer cannot fake.
- Byte-level golden checks pin the writer to the public specs (RIFF
  fourcc layout, idx1 offset base; ISO BMFF big-endian box sizes).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from python_kinesis_streaming_spark.llm.jpeg_codec import (
    decode_jpeg,
    encode_jpeg,
)
from python_kinesis_streaming_spark.llm.video_codecs import (
    build_avi,
    build_mp4,
    decode_avi_frames,
    decode_mp4_frames,
    parse_avi,
    parse_mp4,
    probe_video,
    sample_frame_indices,
    video_frames_frame,
)


def _frames(n=5, h=24, w=32, seed=7):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


# ---------------------------------------------------------------------------
# AVI
# ---------------------------------------------------------------------------


def test_avi_dib_roundtrip_bit_exact():
    frames = _frames()
    avi = build_avi(frames, 30, 1, codec="DIB ")
    info = parse_avi(avi)
    assert (info["codec"], info["width"], info["height"]) == ("DIB", 32, 24)
    assert (info["fps_num"], info["fps_den"]) == (30, 1)
    assert info["n_frames"] == 5
    for got, want in zip(decode_avi_frames(avi), frames):
        assert (got == want).all()


def test_avi_mjpg_container_is_byte_transparent():
    frames = _frames(3)
    avi = build_avi(frames, 25, 1, codec="MJPG", quality=85)
    ref = [decode_jpeg(encode_jpeg(f, quality=85)) for f in frames]
    for got, want in zip(decode_avi_frames(avi), ref):
        assert (got == want).all()


def test_avi_golden_byte_layout():
    """Pin the writer to the RIFF spec: fourcc positions and the idx1
    offset base (measured from the 'movi' fourcc) are hand-checked."""
    frames = _frames(2, h=2, w=2, seed=1)
    avi = build_avi(frames, 10, 1, codec="DIB ")
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    (riff_size,) = struct.unpack_from("<I", avi, 4)
    assert 8 + riff_size == len(avi)
    movi_pos = avi.find(b"movi")
    assert movi_pos > 0
    # first frame chunk directly follows the 'movi' fourcc
    assert avi[movi_pos + 4 : movi_pos + 8] == b"00dc"
    # idx1 first entry: offset 4 from 'movi' fourcc, keyframe flag set
    idx_pos = avi.find(b"idx1")
    assert idx_pos > movi_pos
    c4 = avi[idx_pos + 8 : idx_pos + 12]
    flags, off, size = struct.unpack_from("<III", avi, idx_pos + 12)
    assert c4 == b"00dc" and off == 4 and flags == 0x10
    # DIB frame payload: 2x2 RGB rows padded to 4 bytes → stride 8, 16 B
    assert size == 16
    # parse resolves that entry to the same absolute slice
    fr0 = parse_avi(avi)["frames"][0]
    assert fr0["offset"] == movi_pos + off + 8 and fr0["size"] == size


def test_avi_idx1_keyframe_flags_are_honored():
    frames = _frames(3, h=4, w=4)
    avi = bytearray(build_avi(frames, 25, 1, codec="DIB "))
    idx_pos = bytes(avi).find(b"idx1")
    # clear the keyframe flag of the SECOND index entry (16 B per entry)
    flag_off = idx_pos + 8 + 16 + 4
    struct.pack_into("<I", avi, flag_off, 0)
    info = parse_avi(bytes(avi))
    assert [fr["keyframe"] for fr in info["frames"]] == [True, False, True]


def test_avi_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        parse_avi(b"nonsense")
    avi = build_avi(_frames(2), 25, 1, codec="DIB ")
    with pytest.raises(ValueError):
        parse_avi(avi[: len(avi) // 2])


def test_avi_fractional_fps_rational():
    avi = build_avi(_frames(2), 30000, 1001, codec="DIB ")  # NTSC 29.97
    info = parse_avi(avi)
    assert (info["fps_num"], info["fps_den"]) == (30000, 1001)
    probe = probe_video("avi", avi)
    assert probe["frames"][1]["pts_ms"] == round(1000 * 1001 / 30000)


# ---------------------------------------------------------------------------
# MP4
# ---------------------------------------------------------------------------


def test_mp4_sample_table_resolves_to_jpeg_slices():
    frames = _frames(5)
    mp4 = build_mp4(frames, 25, 1, samples_per_chunk=2)
    (track,) = parse_mp4(mp4)
    assert track["handler"] == "vide" and track["codec"] == "jpeg"
    assert track["n_samples"] == 5
    for s in track["samples"]:
        blob = mp4[s["offset"] : s["offset"] + s["size"]]
        assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    assert [s["dts"] for s in track["samples"]] == [0, 1, 2, 3, 4]


def test_mp4_decode_matches_direct_jpeg():
    frames = _frames(4)
    ref = [decode_jpeg(encode_jpeg(f, quality=85)) for f in frames]
    for spc in (1, 3):
        mp4 = build_mp4(frames, 25, 1, samples_per_chunk=spc)
        for got, want in zip(decode_mp4_frames(mp4), ref):
            assert (got == want).all()


def test_mp4_stss_keyframes():
    mp4 = build_mp4(_frames(6), 25, 1, keyframe_every=3)
    (track,) = parse_mp4(mp4)
    assert [s["keyframe"] for s in track["samples"]] == [
        True, False, False, True, False, False,
    ]
    probe = probe_video("mp4", mp4)
    assert sample_frame_indices(probe["frames"], keyframes_only=True) == [0, 3]


def test_mp4_co64_path():
    frames = _frames(3)
    a = build_mp4(frames, 25, 1, use_co64=False)
    b = build_mp4(frames, 25, 1, use_co64=True)
    sa = [(s["size"], s["dts"]) for s in parse_mp4(a)[0]["samples"]]
    sb = [(s["size"], s["dts"]) for s in parse_mp4(b)[0]["samples"]]
    assert sa == sb
    for got, want in zip(decode_mp4_frames(b), decode_mp4_frames(a)):
        assert (got == want).all()


def test_mp4_ctts_pts_offsets():
    offs = [2, 0, -1, 1]
    mp4 = build_mp4(_frames(4), 25, 1, ctts_offsets=offs)
    (track,) = parse_mp4(mp4)
    assert [s["pts"] - s["dts"] for s in track["samples"]] == offs


def test_mp4_pts_ms_uses_media_timescale():
    mp4 = build_mp4(_frames(3), 30000, 1001)  # timescale 30000, delta 1001
    probe = probe_video("mp4", mp4)
    assert [f["pts_ms"] for f in probe["frames"]] == [0, 33, 67]


def test_mp4_rejects_garbage():
    with pytest.raises(ValueError):
        parse_mp4(b"\x00\x00\x00\x08free")  # no moov
    mp4 = build_mp4(_frames(2), 25, 1)
    with pytest.raises(ValueError):
        parse_mp4(mp4[: len(mp4) - 40])  # moov truncated


def test_mp4_golden_box_layout():
    mp4 = build_mp4(_frames(1, h=2, w=2), 25, 1)
    assert mp4[4:8] == b"ftyp"
    (ftyp_size,) = struct.unpack_from(">I", mp4, 0)
    assert mp4[ftyp_size + 4 : ftyp_size + 8] == b"mdat"
    # first sample = first mdat payload byte = SOI
    (track,) = parse_mp4(mp4)
    assert track["samples"][0]["offset"] == ftyp_size + 8


# ---------------------------------------------------------------------------
# Frame-sampling math
# ---------------------------------------------------------------------------


def test_sample_frame_indices_every_n_and_cap():
    frames = [{"keyframe": i % 2 == 0} for i in range(10)]
    assert sample_frame_indices(frames, every_n=3) == [0, 3, 6, 9]
    assert sample_frame_indices(frames, every_n=1, max_frames=4) == [0, 1, 2, 3]
    assert sample_frame_indices(frames, keyframes_only=True, every_n=2) == [
        0, 4, 8,
    ]


# ---------------------------------------------------------------------------
# Spark seams
# ---------------------------------------------------------------------------


def test_video_frames_frame_per_frame_rows(spark):
    from python_kinesis_streaming_spark.llm.media_codecs import phash64

    frames = _frames(4)
    avi = build_avi(frames, 25, 1, codec="MJPG")
    mp4 = build_mp4(frames, 25, 1, keyframe_every=2)
    rows = [
        (1, "avi", bytearray(avi)),
        (2, "mp4", bytearray(mp4)),
        (3, "avi", bytearray(b"not a video")),
    ]
    df = spark.createDataFrame(rows, "vid long, fmt string, payload binary")
    result = video_frames_frame(df, "vid", "fmt", "payload", every_n=2, max_frames=8)
    out = (
        result.toPandas()
        .sort_values(["id", "frame_index"])
        .reset_index(drop=True)
    )

    ok = out[~out["format"].str.startswith("error:")]
    assert list(ok["id"]) == [1, 1, 2, 2]
    assert list(ok["frame_index"]) == [0, 2, 0, 2]
    assert set(ok["n_frames_total"]) == {4}
    # phash of each sampled frame equals direct decode + hash — compare via
    # Spark rows (exact int64): the error row's null would upcast the
    # pandas column to float64 and shave the low bits
    ref = decode_jpeg(encode_jpeg(frames[2], quality=85))
    want = phash64(ref)
    want = want - (1 << 64) if want >= 1 << 63 else want
    got = {r["phash"] for r in result.where("frame_index = 2").collect()}
    assert got == {want}
    # mp4 keyframe flags survive into the rows
    mp4_rows = ok[ok["id"] == 2]
    assert list(mp4_rows["keyframe"]) == [True, True]
    err = out[out["format"].str.startswith("error:")]
    assert list(err["id"]) == [3] and list(err["frame_index"]) == [-1]


def test_media_features_frame_video_formats(spark):
    frames = _frames(3, h=16, w=20)
    rows = [
        (1, "avi", bytearray(build_avi(frames, 25, 1, codec="DIB "))),
        (2, "mp4", bytearray(build_mp4(frames, 25, 1))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, fmt string, payload binary")
    from python_kinesis_streaming_spark.llm.media_codecs import (
        media_features_frame,
    )

    out = (
        media_features_frame(df, "doc_id", "fmt", "payload")
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert list(out["format"]) == ["avi", "mp4"]
    assert list(out["n_frames"]) == [3, 3]
    assert list(out["height"]) == [16, 16]
    assert list(out["width"]) == [20, 20]
    assert out["phash"].notna().all()
