"""Baseline JPEG codec tests (llm/jpeg_codec.py).

Independence strategy (no PIL/libjpeg in the container):
- The 2-D DCT used by both encoder and decoder is pinned against a
  LITERAL O(N^4) evaluation of the T.81 / textbook DCT-II definition,
  written out as explicit nested sums in the test.
- The canonical Huffman constructor is pinned against the code
  assignments derivable by hand from the Annex-K DC-luminance bits list
  (0→00, 1→010, …, 11→111111110) — worked from the spec's C.2
  algorithm on paper, not by running the constructor.
- JPEG is lossy, so roundtrips assert tolerance bands: a flat image is
  DC-only and must roundtrip exactly; smooth gradients stay within a
  small mean error at quality 95; 4:2:0 subsampling, restart intervals,
  odd (non-multiple-of-8/16) dimensions, and grayscale all roundtrip
  through their dedicated code paths.
- The decoder reads DQT/DHT from the stream (never shares tables
  out-of-band with the encoder) — re-encoding at a different quality
  changes the DQT bytes and must still decode.
- Progressive (SOF2) streams get an EXACT gate: the progressive and
  sequential encoders emit the same quantized coefficients, so decodes
  must be bit-identical; a real libjpeg-produced progressive photo is
  the interop target. Arithmetic/hierarchical frames are rejected, and
  the byte-stuffing path is asserted to actually occur on noisy content.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from python_kinesis_streaming_spark.llm.jpeg_codec import (
    DCT_M,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    canonical_codes,
    decode_jpeg,
    encode_jpeg,
)


def _gradient(h: int, w: int) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 3) % 200, (y * 5) % 200, ((x + y) * 2) % 200], axis=-1
    ).astype(np.uint8)


def _maxdiff(a: np.ndarray, b: np.ndarray) -> int:
    return int(np.abs(a.astype(np.int64) - b.astype(np.int64)).max())


def _meandiff(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.abs(a.astype(np.int64) - b.astype(np.int64)).mean())


class TestPrimitives:
    def test_dct_matches_literal_definition(self):
        # DCT-II (orthonormal), written as the raw double sum:
        # F[u,v] = a(u)a(v) * sum_x sum_y f[x,y]
        #          * cos((2x+1)uπ/16) * cos((2y+1)vπ/16)
        rng = np.random.default_rng(11)
        block = rng.uniform(-128, 127, (8, 8))
        expected = np.zeros((8, 8))
        for u in range(8):
            for v in range(8):
                au = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
                av = np.sqrt(1 / 8) if v == 0 else np.sqrt(2 / 8)
                s = 0.0
                for x in range(8):
                    for y in range(8):
                        s += (
                            block[x, y]
                            * np.cos((2 * x + 1) * u * np.pi / 16)
                            * np.cos((2 * y + 1) * v * np.pi / 16)
                        )
                expected[u, v] = au * av * s
        actual = DCT_M @ block @ DCT_M.T
        np.testing.assert_allclose(actual, expected, atol=1e-9)

    def test_idct_inverts_dct(self):
        rng = np.random.default_rng(12)
        block = rng.uniform(-128, 127, (8, 8))
        coef = DCT_M @ block @ DCT_M.T
        np.testing.assert_allclose(DCT_M.T @ coef @ DCT_M, block, atol=1e-9)

    def test_canonical_codes_match_spec_hand_derivation(self):
        # Annex-K DC luminance: bits = [0,1,5,1,1,...]. By C.2: the single
        # 2-bit code is 00; the five 3-bit codes are 010..110; then one
        # code per length 4..9 continues doubling+incrementing.
        codes = canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
        expected = {
            0: (0b00, 2),
            1: (0b010, 3),
            2: (0b011, 3),
            3: (0b100, 3),
            4: (0b101, 3),
            5: (0b110, 3),
            6: (0b1110, 4),
            7: (0b11110, 5),
            8: (0b111110, 6),
            9: (0b1111110, 7),
            10: (0b11111110, 8),
            11: (0b111111110, 9),
        }
        assert codes == expected


class TestRoundtrip:
    def test_flat_image_is_dc_only_and_exact(self):
        flat = np.full((16, 24, 3), 117, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(flat, quality=90))
        assert _maxdiff(out, flat) == 0

    @pytest.mark.parametrize("quality,mean_tol", [(95, 0.6), (75, 1.6)])
    def test_gradient_tolerance(self, quality, mean_tol):
        img = _gradient(33, 47)  # odd dims: exercises edge padding + crop
        out = decode_jpeg(encode_jpeg(img, quality=quality))
        assert out.shape == img.shape
        assert _meandiff(out, img) < mean_tol

    def test_420_subsampling_roundtrip(self):
        img = _gradient(33, 47)  # not a multiple of 16: partial MCUs
        blob = encode_jpeg(img, quality=95, subsample=True)
        # SOF0 must declare 2x2 luma sampling (byte layout checked raw).
        sof = blob.find(b"\xff\xc0")
        assert sof >= 0
        ncomp = blob[sof + 9]
        assert ncomp == 3
        assert blob[sof + 11] == 0x22  # Y h=2,v=2
        assert blob[sof + 14] == 0x11  # Cb h=1,v=1
        out = decode_jpeg(blob)
        assert out.shape == img.shape
        assert _meandiff(out, img) < 2.0

    def test_restart_interval_roundtrip(self):
        img = _gradient(40, 56)
        blob = encode_jpeg(img, quality=95, restart_interval=3)
        assert b"\xff\xdd" in blob  # DRI present
        assert any(bytes([0xFF, 0xD0 + i]) in blob for i in range(8))
        out = decode_jpeg(blob)
        assert _meandiff(out, img) < 0.6

    def test_grayscale_single_component(self):
        y, x = np.mgrid[0:21, 0:37]
        g = ((x * 7 + y * 2) % 200).astype(np.uint8)
        blob = encode_jpeg(g, quality=95)
        sof = blob.find(b"\xff\xc0")
        assert blob[sof + 9] == 1  # one component
        out = decode_jpeg(blob)
        assert out.shape == (21, 37, 1)
        assert _meandiff(out[:, :, 0], g) < 0.5

    def test_decoder_reads_tables_from_stream(self):
        # Different qualities emit different DQT bytes; decode must track.
        img = _gradient(24, 24)
        b30 = encode_jpeg(img, quality=30)
        b90 = encode_jpeg(img, quality=90)
        dqt30 = b30[b30.find(b"\xff\xdb") : b30.find(b"\xff\xdb") + 69]
        dqt90 = b90[b90.find(b"\xff\xdb") : b90.find(b"\xff\xdb") + 69]
        assert dqt30 != dqt90
        out30 = decode_jpeg(b30)
        out90 = decode_jpeg(b90)
        assert _meandiff(out90, img) < _meandiff(out30, img)

    def test_noise_survives_and_exercises_byte_stuffing(self):
        rng = np.random.default_rng(3)
        noise = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
        blob = encode_jpeg(noise, quality=50)
        # Entropy-coded noise at this size reliably produces stuffed 0xFF
        # bytes; if this ever flakes the seed is wrong, not the codec.
        scan_start = blob.find(b"\xff\xda")
        assert b"\xff\x00" in blob[scan_start:]
        out = decode_jpeg(blob)
        assert out.shape == noise.shape

    def test_quality_monotonicity(self):
        img = _gradient(32, 32)
        errs = [
            _meandiff(decode_jpeg(encode_jpeg(img, quality=q)), img)
            for q in (25, 50, 75, 95)
        ]
        assert errs == sorted(errs, reverse=True)


class TestProgressive:
    """SOF2 spectral-selection + successive-approximation streams.

    The exactness gate: progressive and sequential encodings carry the
    SAME quantized coefficients, so a correct decoder must reconstruct
    them bit-identically — no tolerance band."""

    def test_progressive_equals_sequential_exactly(self):
        img = _gradient(33, 47)
        seq = decode_jpeg(encode_jpeg(img, quality=85))
        blob = encode_jpeg(img, quality=85, progressive=True)
        assert blob.count(b"\xff\xda") > 6  # a real multi-scan script
        sof = blob.find(b"\xff\xc2")
        assert sof >= 0 and b"\xff\xc0" not in blob[: sof + 2]
        assert np.array_equal(decode_jpeg(blob), seq)

    def test_progressive_420_exact(self):
        img = _gradient(33, 47)
        seq = decode_jpeg(encode_jpeg(img, quality=85, subsample=True))
        prog = decode_jpeg(
            encode_jpeg(img, quality=85, subsample=True, progressive=True)
        )
        assert np.array_equal(prog, seq)

    def test_progressive_grayscale_exact(self):
        y, x = np.mgrid[0:21, 0:37]
        g = ((x * 7 + y * 2) % 200).astype(np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg(g, quality=85, progressive=True)),
            decode_jpeg(encode_jpeg(g, quality=85)),
        )

    def test_progressive_noise_exact(self):
        # dense coefficients: stresses ZRL, refinement correction bits
        rng = np.random.default_rng(3)
        noise = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg(noise, quality=50, progressive=True)),
            decode_jpeg(encode_jpeg(noise, quality=50)),
        )

    def test_progressive_flat_exercises_eobrun(self):
        # all-zero AC bands: every block is an end-of-band, so the
        # encoder's EOBRUN accumulation (EOB1/EOB2 symbols) is in play
        flat = np.full((48, 64, 3), 117, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(flat, quality=90, progressive=True))
        assert _maxdiff(out, flat) == 0

    def test_progressive_rejects_restart_intervals(self):
        with pytest.raises(ValueError, match="restart"):
            encode_jpeg(_gradient(16, 16), progressive=True, restart_interval=2)


class TestRobustness:
    def test_rejects_arithmetic_and_hierarchical(self):
        for sof in (0xC9, 0xC3, 0xCB):  # arithmetic seq, lossless, arith prog
            blob = bytearray(encode_jpeg(_gradient(16, 16), quality=90))
            pos = bytes(blob).find(b"\xff\xc0")
            blob[pos + 1] = sof
            with pytest.raises(ValueError, match="SOF0/1"):
                decode_jpeg(bytes(blob))

    def test_rejects_bad_soi(self):
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"\x00\x01garbage")

    def test_rejects_truncated_entropy_data(self):
        blob = encode_jpeg(_gradient(64, 64), quality=90)
        with pytest.raises(ValueError):
            decode_jpeg(blob[: len(blob) // 2])

    def test_skips_appn_and_com_segments(self):
        blob = bytearray(encode_jpeg(_gradient(16, 16), quality=90))
        # Inject APP1 + COM right after SOI; decoder must skip both.
        extra = (
            b"\xff\xe1" + struct.pack(">H", 8) + b"Exif\x00\x00"
            + b"\xff\xfe" + struct.pack(">H", 7) + b"hello"
        )
        patched = bytes(blob[:2]) + extra + bytes(blob[2:])
        out = decode_jpeg(patched)
        assert out.shape == (16, 16, 3)

    def test_encode_rejects_bad_input(self):
        with pytest.raises(ValueError, match="uint8"):
            encode_jpeg(np.zeros((8, 8, 3), dtype=np.float64))
        with pytest.raises(ValueError, match="uint8"):
            encode_jpeg(np.zeros((8, 8, 2), dtype=np.uint8))


class TestRealWorldInterop:
    """Tool-produced JPEGs that ship with CPython and the Rust docs.

    No PIL exists here to give pixel ground truth, so the assertions are
    structural: declared dimensions, dtype/range sanity, and non-trivial
    content variance (a mis-wired Huffman or IDCT produces either an
    exception, a flat field, or noise with wild statistics)."""

    def _decode_existing(self, path):
        import os

        if not os.path.exists(path):
            pytest.skip(f"{path} not present")
        return decode_jpeg(open(path, "rb").read())

    def test_cpython_email_test_jpeg(self):
        import os
        import test.test_email as te

        arr = self._decode_existing(
            os.path.join(os.path.dirname(te.__file__), "data", "python.jpg")
        )
        assert arr.shape == (16, 16, 3)
        # the logo: dark background, bright snake bodies
        assert arr.mean() > 40 and arr.std() > 40

    def test_rust_docs_photographic_jpeg(self):
        arr = self._decode_existing(
            "/root/.rustup/toolchains/stable-x86_64-unknown-linux-gnu/share/"
            "doc/rust/html/embedded-book/assets/verify.jpeg"
        )
        assert arr.shape == (477, 720, 3)
        assert 20 < arr.mean() < 235 and arr.std() > 20

    def test_real_world_progressive_jpeg(self):
        # f3.jpg is a libjpeg-produced PROGRESSIVE photo: the strongest
        # available interop target for the SOF2 path (multi-scan,
        # EOBRUN-heavy, tool-chosen Huffman tables).
        arr = self._decode_existing(
            "/root/.rustup/toolchains/stable-x86_64-unknown-linux-gnu/share/"
            "doc/rust/html/embedded-book/assets/f3.jpg"
        )
        assert arr.shape == (477, 720, 3)
        assert 20 < arr.mean() < 235 and arr.std() > 20


class TestExifOrientation:
    def _with_exif(self, blob: bytes, orientation: int) -> bytes:
        # APP1 EXIF segment with a 1-entry IFD0 carrying tag 274 (LE)
        tiff = (
            b"II*\x00" + struct.pack("<I", 8)
            + struct.pack("<H", 1)
            + struct.pack("<HHIHH", 274, 3, 1, orientation, 0)
            + struct.pack("<I", 0)
        )
        payload = b"Exif\x00\x00" + tiff
        app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
        return blob[:2] + app1 + blob[2:]

    def test_orientation_parse_and_default(self):
        from python_kinesis_streaming_spark.llm.jpeg_codec import (
            exif_orientation,
        )

        blob = encode_jpeg(_gradient(16, 24), quality=90)
        assert exif_orientation(blob) == 1  # our encoder writes no EXIF
        for o in (1, 3, 6, 8):
            assert exif_orientation(self._with_exif(blob, o)) == o

    def test_oriented_decode_matches_numpy_transform(self):
        from python_kinesis_streaming_spark.llm.jpeg_codec import (
            apply_orientation,
            decode_jpeg_oriented,
        )

        img = _gradient(16, 24)
        blob = encode_jpeg(img, quality=95)
        base = decode_jpeg(blob)
        # rotation orientations swap the output dimensions
        rot90 = decode_jpeg_oriented(self._with_exif(blob, 6))
        assert rot90.shape == (24, 16, 3)
        assert np.array_equal(rot90, np.transpose(base, (1, 0, 2))[:, ::-1])
        flipped = decode_jpeg_oriented(self._with_exif(blob, 3))
        assert np.array_equal(flipped, base[::-1, ::-1])

    def test_orientation_transforms_are_bijective(self):
        from python_kinesis_streaming_spark.llm.jpeg_codec import (
            apply_orientation,
        )

        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
        for o in range(1, 9):
            out = apply_orientation(img, o)
            assert sorted(out.ravel()) == sorted(img.ravel())
            if o in (5, 6, 7, 8):
                assert out.shape == (7, 5, 3)
