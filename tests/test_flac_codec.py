"""FLAC codec: lossless roundtrips gated by the container's own MD5,
a hand-built spec-golden stream decoded against hand-derived samples,
decoder-only features (LPC, stereo decorrelation, rice partitions,
escapes, wasted bits) exercised via directly-authored bitstreams, and
independent table-driven CRC implementations cross-checking the
codec's bitwise ones."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from python_kinesis_streaming_spark.llm.flac_codec import (
    _BitWriter,
    _crc8,
    _crc16,
    _write_utf8_number,
    decode_flac,
    encode_flac,
)


# --- independent CRC references (table-driven, vs the codec's bitwise) ---

def _crc8_table():
    tbl = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        tbl.append(c)
    return tbl


def _crc16_table():
    tbl = []
    for i in range(256):
        c = i << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        tbl.append(c)
    return tbl


_T8, _T16 = _crc8_table(), _crc16_table()


def ref_crc8(data):
    c = 0
    for b in data:
        c = _T8[c ^ b]
    return c


def ref_crc16(data):
    c = 0
    for b in data:
        c = ((c << 8) & 0xFFFF) ^ _T16[((c >> 8) ^ b) & 0xFF]
    return c


def test_crc_implementations_agree():
    for blob in (b"", b"\x00", b"123456789", bytes(range(256))):
        assert _crc8(blob) == ref_crc8(blob)
        assert _crc16(blob) == ref_crc16(blob)
    # CRC-16/BUYPASS check value for "123456789" is 0xFEE8 (public)
    assert _crc16(b"123456789") == 0xFEE8


def _tone(n=5000, ch=2, amp=12000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    base = (amp * np.sin(2 * np.pi * 440 * t / 44100)).astype(np.int64)
    out = np.stack(
        [base + rng.integers(-50, 51, n) for _ in range(ch)], axis=1
    )
    return out.astype(np.int32)


def test_roundtrip_tone_stereo_md5_gate():
    pcm = _tone()
    blob = encode_flac(pcm, 44100, bps=16, block_size=1024)
    out = decode_flac(blob)
    assert out["sample_rate"] == 44100 and out["bps"] == 16
    assert out["md5_ok"] is True
    assert (out["samples"] == pcm).all()
    # tonal signal must actually compress
    assert len(blob) < pcm.size * 2 * 0.9


def test_roundtrip_random_noise_verbatim_path():
    rng = np.random.default_rng(3)
    pcm = rng.integers(-32768, 32767, (700, 1), dtype=np.int64).astype(
        np.int32
    )
    blob = encode_flac(pcm, 8000, bps=16, block_size=256)
    out = decode_flac(blob)
    assert (out["samples"] == pcm).all() and out["md5_ok"]


def test_roundtrip_silence_constant_subframe():
    pcm = np.zeros((4096, 2), dtype=np.int32)
    blob = encode_flac(pcm, 48000, bps=16)
    assert len(blob) < 200  # constant subframes: a few bytes per frame
    out = decode_flac(blob)
    assert (out["samples"] == 0).all()


@pytest.mark.parametrize("bps", [8, 16, 24])
def test_roundtrip_bit_depths(bps):
    rng = np.random.default_rng(bps)
    hi = (1 << (bps - 1)) - 1
    ramp = np.linspace(-hi, hi, 1000).astype(np.int64)
    pcm = (ramp + rng.integers(-3, 4, 1000)).clip(-hi, hi)[:, None].astype(
        np.int32
    )
    blob = encode_flac(pcm, 16000, bps=bps, block_size=512)
    out = decode_flac(blob)
    assert out["bps"] == bps and (out["samples"] == pcm).all()
    assert out["md5_ok"]


def test_corrupt_frame_fails_crc():
    pcm = _tone(2000, 1)
    blob = bytearray(encode_flac(pcm, 44100, block_size=1024))
    blob[-10] ^= 0x40  # flip a residual bit in the last frame
    with pytest.raises(ValueError, match="CRC|MD5|truncated|sync"):
        decode_flac(bytes(blob))


def test_tampered_md5_detected():
    pcm = _tone(500, 1)
    blob = bytearray(encode_flac(pcm, 44100, block_size=512))
    blob[26] ^= 0xFF  # inside the STREAMINFO MD5 field (offset 8+18)
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(blob))
    out = decode_flac(bytes(blob), verify_md5=False)
    assert out["md5_ok"] is False and (out["samples"] == pcm).all()


# --- hand-built spec-golden stream (decoder vs the written spec) ---


def _golden_stream():
    """Mono, bps 16, 4 samples [10, 12, 14, 16], one frame, FIXED
    order-1 subframe (residuals all +2 → rice(param 2): q=1,r=0 →
    zigzag(2)=4 → 0b01|00), blocksize code 6 (8-bit, 4-1=3).
    Assembled with raw bit arithmetic, not the codec's writer."""
    bits = ""

    def put(v, n):
        nonlocal bits
        bits += format(v & ((1 << n) - 1), f"0{n}b")

    put(0b11111111111110, 14)  # sync
    put(0, 1)                  # reserved
    put(0, 1)                  # fixed blocking
    put(6, 4)                  # blocksize: 8-bit at end of header
    put(9, 4)                  # sample rate 44100 (table)
    put(0, 4)                  # 1 channel
    put(4, 3)                  # bps 16
    put(0, 1)                  # reserved
    put(0, 8)                  # frame number 0 (utf8 1-byte)
    put(3, 8)                  # blocksize - 1
    header = bytes(
        int(bits[i : i + 8], 2) for i in range(0, len(bits), 8)
    )
    header += bytes([ref_crc8(header)])
    bits = ""
    put(0, 1)                  # subframe pad
    put(8 + 1, 6)              # FIXED order 1
    put(0, 1)                  # no wasted bits
    put(10, 16)                # warmup sample
    put(0, 2)                  # rice method 0 (4-bit)
    put(0, 4)                  # partition order 0
    put(2, 4)                  # rice param 2
    for _ in range(3):         # residual +2 → zigzag 4 → q=1, r=0
        put(0b01, 2)           # unary q=1
        put(0, 2)              # remainder
    while len(bits) % 8:
        put(0, 1)
    body = header + bytes(
        int(bits[i : i + 8], 2) for i in range(0, len(bits), 8)
    )
    body += struct.pack(">H", ref_crc16(body))

    pcm = np.array([[10], [12], [14], [16]], dtype=np.int32)
    md5 = hashlib.md5(pcm.reshape(-1).astype("<i2").tobytes()).digest()
    sb = ""

    def put_si(v, n):
        nonlocal sb
        sb += format(v & ((1 << n) - 1), f"0{n}b")

    put_si(4, 16)      # min block
    put_si(4, 16)      # max block
    put_si(len(body), 24)
    put_si(len(body), 24)
    put_si(44100, 20)
    put_si(0, 3)       # channels-1
    put_si(15, 5)      # bps-1
    put_si(4, 36)      # total samples
    streaminfo = bytes(
        int(sb[i : i + 8], 2) for i in range(0, len(sb), 8)
    ) + md5
    return (
        b"fLaC" + bytes([0x80]) + struct.pack(">I", 34)[1:] + streaminfo
        + body,
        pcm,
    )


def test_spec_golden_stream_decodes_exactly():
    blob, pcm = _golden_stream()
    out = decode_flac(blob)
    assert (out["samples"] == pcm).all()
    assert out["md5_ok"] and out["sample_rate"] == 44100


def test_encoder_frame_matches_golden_shape():
    """Our encoder on the same 4 samples must produce a stream the
    decoder accepts with identical PCM (not necessarily identical
    bytes — subframe choice may differ)."""
    _, pcm = _golden_stream()
    out = decode_flac(encode_flac(pcm, 44100, block_size=4))
    assert (out["samples"] == pcm).all()


# --- decoder-only features via directly-authored bitstreams ---


def _frame_bytes(
    subframe_bits_fn, blocksize, channels=1, ch_code=None, bps=16,
):
    bw = _BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 2)
    bw.write(6 if blocksize <= 256 else 7, 4)
    bw.write(9, 4)
    bw.write(ch_code if ch_code is not None else channels - 1, 4)
    bw.write(4, 3)
    bw.write(0, 1)
    _write_utf8_number(bw, 0)
    bw.write(blocksize - 1, 8 if blocksize <= 256 else 16)
    bw.align()
    hdr = bw.getvalue()
    hdr += bytes([ref_crc8(hdr)])
    bw2 = _BitWriter()
    for b in hdr:
        bw2.write(b, 8)
    subframe_bits_fn(bw2)
    bw2.align()
    body = bw2.getvalue()
    return body + struct.pack(">H", ref_crc16(body))


def _wrap_stream(frame, pcm, bps=16, channels=1):
    md5 = hashlib.md5(
        pcm.reshape(-1).astype("<i2").tobytes()
    ).digest()
    bw = _BitWriter()
    bw.write(len(pcm), 16)
    bw.write(len(pcm), 16)
    bw.write(len(frame), 24)
    bw.write(len(frame), 24)
    bw.write(44100, 20)
    bw.write(channels - 1, 3)
    bw.write(bps - 1, 5)
    bw.write(len(pcm), 36)
    si = bw.getvalue() + md5
    return b"fLaC" + bytes([0x80]) + struct.pack(">I", 34)[1:] + si + frame


def test_decode_lpc_subframe():
    # order-2 LPC: coeffs [3, -1], shift 1 → pred = (3*a1 - a2) >> 1
    warm = [100, 110]
    res = [5, -3, 7, 0, 2, -6]
    samples = list(warm)
    for r in res:
        samples.append(r + ((3 * samples[-1] - samples[-2]) >> 1))
    pcm = np.array(samples, dtype=np.int32)[:, None]

    def sub(bw):
        bw.write(0, 1)
        bw.write(32 + 1, 6)  # LPC order 2
        bw.write(0, 1)
        for w in warm:
            bw.write_signed(w, 16)
        bw.write(4, 4)       # precision-1 → 5 bits
        bw.write_signed(1, 5)  # shift
        bw.write_signed(3, 5)
        bw.write_signed(-1, 5)
        bw.write(0, 2)
        bw.write(0, 4)
        bw.write(4, 4)       # rice param 4
        for r in res:
            u = (r << 1) ^ (r >> 63) if r >= 0 else ((-r) << 1) - 1
            bw.write_unary(u >> 4)
            bw.write(u & 15, 4)

    frame = _frame_bytes(sub, len(pcm))
    out = decode_flac(_wrap_stream(frame, pcm))
    assert (out["samples"] == pcm).all() and out["md5_ok"]


@pytest.mark.parametrize("mode", ["left_side", "right_side", "mid_side"])
def test_decode_stereo_decorrelation(mode):
    left = np.array([100, 120, 90, 80, 150, 130], dtype=np.int64)
    right = np.array([95, 118, 91, 70, 149, 135], dtype=np.int64)
    pcm = np.stack([left, right], axis=1).astype(np.int32)
    side = left - right
    ch_code = {"left_side": 8, "right_side": 9, "mid_side": 10}[mode]

    def verb(bw, vals, bits):
        bw.write(0, 1)
        bw.write(1, 6)
        bw.write(0, 1)
        for v in vals:
            bw.write_signed(int(v), bits)

    def sub(bw):
        if mode == "left_side":
            verb(bw, left, 16)
            verb(bw, side, 17)
        elif mode == "right_side":
            verb(bw, side, 17)
            verb(bw, right, 16)
        else:
            mid = (left + right) >> 1
            verb(bw, mid, 16)
            verb(bw, side, 17)

    frame = _frame_bytes(sub, len(left), channels=2, ch_code=ch_code)
    out = decode_flac(_wrap_stream(frame, pcm, channels=2))
    assert (out["samples"] == pcm).all() and out["md5_ok"]


def test_decode_rice_partitions_and_escape():
    # blocksize 8, order 0, partition order 1 → two partitions of 4;
    # partition 1 rice param 1; partition 2 escaped raw 6-bit
    vals = [1, -2, 3, 0, 17, -25, 30, -31]
    pcm = np.array(vals, dtype=np.int32)[:, None]

    def sub(bw):
        bw.write(0, 1)
        bw.write(8, 6)   # FIXED order 0 (residual = samples)
        bw.write(0, 1)
        bw.write(0, 2)   # 4-bit rice
        bw.write(1, 4)   # partition order 1
        bw.write(1, 4)   # param 1
        for v in vals[:4]:
            u = (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1
            bw.write_unary(u >> 1)
            bw.write(u & 1, 1)
        bw.write(15, 4)  # escape
        bw.write(6, 5)   # raw 6-bit residuals
        for v in vals[4:]:
            bw.write_signed(v, 6)

    frame = _frame_bytes(sub, 8)
    out = decode_flac(_wrap_stream(frame, pcm))
    assert (out["samples"] == pcm).all() and out["md5_ok"]


def test_decode_wasted_bits():
    # samples all multiples of 4 → 2 wasted bits, constant subframe
    pcm = np.full((5, 1), 40, dtype=np.int32)

    def sub(bw):
        bw.write(0, 1)
        bw.write(0, 6)    # CONSTANT
        bw.write(1, 1)    # wasted flag
        bw.write(0b01, 2)  # unary 1 → wasted = 2
        bw.write_signed(10, 14)  # 40 >> 2 in bps-2 bits

    frame = _frame_bytes(sub, 5)
    out = decode_flac(_wrap_stream(frame, pcm))
    assert (out["samples"] == pcm).all() and out["md5_ok"]


def test_multi_frame_stream_and_frame_numbers():
    pcm = _tone(5000, 1, seed=9)
    blob = encode_flac(pcm, 44100, block_size=576)
    out = decode_flac(blob)
    assert (out["samples"] == pcm).all()


def test_utf8_number_roundtrip():
    from python_kinesis_streaming_spark.llm.flac_codec import (
        _BitReader,
        _read_utf8_number,
    )

    for n in (0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10FFFF,
              (1 << 31) - 1, (1 << 35)):
        bw = _BitWriter()
        _write_utf8_number(bw, n)
        bw.align()
        assert _read_utf8_number(_BitReader(bw.getvalue())) == n


def test_media_seam_dispatches_flac(spark):
    from python_kinesis_streaming_spark.llm.media_codecs import (
        media_features_frame,
    )

    pcm = _tone(3000, 2, seed=4)
    rows = [
        (1, "flac", bytearray(encode_flac(pcm, 44100, block_size=1024))),
        (2, "flac", bytearray(b"not flac at all")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, fmt string, payload binary")
    out = {
        r["id"]: r
        for r in media_features_frame(df, "doc_id", "fmt", "payload").collect()
    }
    ok = out[1]
    assert ok["format"] == "flac"
    assert ok["n_samples"] == 3000
    assert ok["sample_rate"] == 44100
    assert ok["channels"] == 2
    assert out[2]["format"].startswith("error:")


def test_lpc_encoding_roundtrips_and_beats_fixed():
    # strongly autocorrelated signal: AR(2) process — LPC's home turf
    rng = np.random.default_rng(11)
    n = 8000
    sig = np.zeros(n)
    e = rng.normal(0, 60, n)
    for i in range(2, n):
        sig[i] = 1.6 * sig[i - 1] - 0.72 * sig[i - 2] + e[i]
    pcm = sig.clip(-30000, 30000).astype(np.int32)[:, None]
    with_lpc = encode_flac(pcm, 44100, block_size=2048, lpc_order=8)
    without = encode_flac(pcm, 44100, block_size=2048, lpc_order=0)
    assert len(with_lpc) < len(without)  # LPC must pay for itself
    out = decode_flac(with_lpc)
    assert (out["samples"] == pcm).all() and out["md5_ok"]
    # the LPC stream really contains LPC subframes (type >= 32):
    # disabling LPC changes the bytes, so the win above came from LPC
    assert with_lpc != without


def test_lpc_disabled_on_short_blocks():
    pcm = np.arange(10, dtype=np.int32)[:, None] * 100
    out = decode_flac(encode_flac(pcm, 8000, block_size=8, lpc_order=8))
    assert (out["samples"] == pcm).all()
