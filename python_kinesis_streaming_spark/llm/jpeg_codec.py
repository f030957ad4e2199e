"""JPEG codec (ITU T.81 / JFIF): baseline sequential AND progressive,
stdlib + numpy only.

Extends the real-decode story of ``media_codecs.py`` to the format that
dominates real image corpora. No PIL/libjpeg in this container, so both
sides are implemented from the public spec:

- ``decode_jpeg`` — marker walk (APPn/COM skip, DQT, SOF, DHT, DRI,
  SOS), canonical Huffman tables via a 16-bit-prefix LUT over bulk-
  unstuffed entropy chunks, DC prediction, RSTn handling, dequantize,
  inverse zigzag, batched 2-D IDCT, chroma upsampling for arbitrary
  (h,v) sampling factors (4:4:4, 4:2:0, 4:2:2), YCbCr→RGB (BT.601
  JFIF). Handles SOF0/1 sequential and SOF2 progressive frames —
  spectral selection, successive approximation (DC and AC refinement
  per T.81 G.1.2), and EOBRUN. Arithmetic-coded and hierarchical frames
  are rejected with a clear error, not mis-decoded.
- ``encode_jpeg`` — level shift, batched 2-D DCT, Annex-K quantization
  scaled by IJG quality, zigzag, DC-differential + run-length AC
  Huffman with the Annex-K typical tables, byte stuffing, optional
  4:2:0 subsampling (2x2 box-average chroma), optional restart
  intervals, grayscale streams, and ``progressive=True``: an SOF2
  scan script (interleaved DC first, per-component spectral bands,
  full AC+DC refinement passes with EOBRUN emission over a custom
  canonical table carrying EOB1/EOB2).

Test strategy (tests/test_jpeg_codec.py): JPEG is lossy, so roundtrips
assert tolerance bands (flat images roundtrip near-exactly — DC-only;
smooth gradients within a small mean error at quality 95); the DCT is
pinned against a literal O(N^4) evaluation of the T.81 definition; the
canonical Huffman constructor is pinned against the spec-derivable DC
luminance code assignments; 4:2:0 and restart-interval encodes exercise
the decoder's MCU-interleave and RSTn paths. Progressive gets an EXACT
gate: sequential and progressive encodings carry identical quantized
coefficients, so their decodes must be bit-identical — plus real
libjpeg-produced files (CPython test data, Rust docs assets) decode as
interop evidence. Interop with external files needs no shared state:
tables travel in DQT/DHT both directions.

Scale notes (100 TB): identical to media_codecs — decode is
partition-local behind the Arrow-batched ``mapInPandas`` seam
(``media_features_frame`` dispatches ``fmt == "jpeg"`` here), payload
columns are pruned unless decoded, and batch memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Constant tables (public: ITU T.81 Annex K).
# --------------------------------------------------------------------------

# Zigzag scan: generated, not transcribed, to avoid copy errors. ZIGZAG[k]
# is the (row*8+col) raster index of the k-th coefficient in scan order.
def _zigzag_order() -> np.ndarray:
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1], rc[1] if (rc[0] + rc[1]) % 2 else rc[0]),
    )
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


ZIGZAG = _zigzag_order()
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K quantization tables (quality 50 reference).
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

# Annex K "typical" Huffman tables: (bits[1..16] count list, value list).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Orthonormal DCT-II matrix: forward = C @ B @ C.T, inverse = C.T @ B @ C.
def _dct_matrix() -> np.ndarray:
    j = np.arange(8)
    c = np.cos((2 * j[None, :] + 1) * j[:, None] * np.pi / 16) / 2.0
    c[0, :] = 1.0 / np.sqrt(8.0)
    return c


DCT_M = _dct_matrix()


def canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """T.81 C.2 canonical code assignment: {symbol: (code, length)}.

    Codes of each length are assigned in value-list order, starting from
    (previous code + 1) << 1 when the length grows.
    """
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


# --------------------------------------------------------------------------
# Bit I/O with JPEG byte stuffing.
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            self._nbits -= 8
            byte = (self._acc >> self._nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self._acc &= (1 << self._nbits) - 1

    def pad_to_byte(self) -> None:
        if self._nbits:
            self.write((1 << (8 - self._nbits)) - 1, 8 - self._nbits)


def _split_entropy(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Entropy segment -> (unstuffed chunks split at RSTn, next marker pos).

    One pre-pass replaces per-bit marker/stuffing checks in the hot decode
    loop: 0xFF00 unstuffs to 0xFF, RSTn markers delimit chunks, 0xFF fill
    bytes are dropped, and any other marker ends the segment."""
    chunks: list[bytes] = []
    cur = bytearray()
    n = len(data)
    i = pos
    while i < n:
        b = data[i]
        if b != 0xFF:
            # bulk-copy the run up to the next 0xFF
            j = data.find(b"\xff", i)
            if j < 0:
                j = n
            cur += data[i:j]
            i = j
            continue
        nxt = data[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            chunks.append(bytes(cur))
            cur = bytearray()
            i += 2
        elif nxt == 0xFF:
            i += 1  # fill byte
        else:
            break  # real marker ends the segment
    chunks.append(bytes(cur))
    return chunks, i


class _FastBits:
    """MSB-first bit reader over an unstuffed chunk; bounded 1-padding at
    the end (the spec's fill-bit convention) so the final symbol can be
    peeked, with truncation still detected."""

    __slots__ = ("buf", "n", "pos", "acc", "nbits", "pad")

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.n = len(buf)
        self.pos = 0
        self.acc = 0
        self.nbits = 0
        self.pad = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            if self.pos < self.n:
                self.acc = (self.acc << 8) | self.buf[self.pos]
                self.pos += 1
            else:
                if self.pad >= 64:
                    raise ValueError("jpeg: entropy data truncated")
                self.acc = (self.acc << 8) | 0xFF
                self.pad += 8
            self.nbits += 8

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill(16)
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, k: int) -> None:
        self.nbits -= k
        self.acc &= (1 << self.nbits) - 1

    def read_bits(self, k: int) -> int:
        if k == 0:
            return 0
        if self.nbits < k:
            self._fill(k)
        self.nbits -= k
        v = (self.acc >> self.nbits) & ((1 << k) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_bit(self) -> int:
        return self.read_bits(1)


class _HuffDecoder:
    """Canonical-code Huffman decoder via a 16-bit-prefix lookup table."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.sym = np.zeros(1 << 16, dtype=np.int32)
        self.length = np.zeros(1 << 16, dtype=np.uint8)
        for sym, (code, ln) in canonical_codes(bits, vals).items():
            base = code << (16 - ln)
            span = 1 << (16 - ln)
            self.sym[base : base + span] = sym
            self.length[base : base + span] = ln

    def decode(self, reader: _FastBits) -> int:
        w = reader.peek16()
        ln = self.length[w]
        if ln == 0:
            raise ValueError("jpeg: invalid Huffman code")
        reader.skip(int(ln))
        return int(self.sym[w])


def _magnitude(v: int) -> tuple[int, int]:
    """Value -> (category size, appended bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    """Appended bits -> signed value (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# --------------------------------------------------------------------------
# Encoder.
# --------------------------------------------------------------------------


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    a = arr.astype(np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _pad_plane(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-replicate to a multiple of (bh, bw)."""
    h, w = plane.shape
    ph = (-h) % bh
    pw = (-w) % bw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _plane_coefs(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """MCU-padded plane -> (by, bx, 64) quantized ZIGZAG-order coefficients."""
    h, w = plane.shape
    blocks = (plane - 128.0).reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ij,xyjk,lk->xyil", DCT_M, blocks, DCT_M)
    quant = np.round(coef / qtab).astype(np.int32)
    return quant.reshape(h // 8, w // 8, 64)[..., ZIGZAG]


def _shift_to_zero(v: int, al: int) -> int:
    """Point transform for AC coefficients: magnitude shift, sign kept."""
    return v >> al if v >= 0 else -((-v) >> al)


def _emit_block_sequential(
    writer: _BitWriter, zz: np.ndarray, dc_pred: int, dc_codes: dict, ac_codes: dict
) -> int:
    diff = int(zz[0]) - dc_pred
    size, bits = _magnitude(diff)
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        writer.write(bits, size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        writer.write(bits, size)
        run = 0
    if run:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return int(zz[0])


# Progressive EOBRUN cap: EOB0..EOB2 symbols cover runs 1..7. The standard
# Annex-K AC tables lack EOB1/EOB2 AND have a completely full canonical
# code space (no room to append), so progressive scans use a custom table:
# 16 common symbols at length 6, everything else at length 9 — Kraft sum
# 16*2^10 + 148*2^7 = 35328 <= 65536, a valid (incomplete) canonical
# table. It travels in DHT like any other, so external decoders read it.
_EOBRUN_MAX = 7
_PROG_COMMON = [
    0x00, 0x10, 0x20, 0x01, 0x02, 0x03, 0x04, 0x11,
    0x12, 0x21, 0x31, 0xF0, 0x05, 0x41, 0x13, 0x51,
]


def _prog_ac_tables(bits: list[int], vals: list[int]) -> tuple[list[int], list[int]]:
    rest = sorted(v for v in vals if v not in _PROG_COMMON)
    out_bits = [0] * 16
    out_bits[5] = len(_PROG_COMMON)  # code length 6
    out_bits[8] = len(rest)  # code length 9
    return out_bits, _PROG_COMMON + rest


class _ScanEmitter:
    """Entropy emitter for one progressive scan (owns EOBRUN buffering)."""

    def __init__(self, ac_codes: dict) -> None:
        self.writer = _BitWriter()
        self.ac_codes = ac_codes
        self.eobrun = 0
        self.pending_bits: list[int] = []

    def flush_eobrun(self) -> None:
        if self.eobrun:
            nbits = self.eobrun.bit_length() - 1
            code, length = self.ac_codes[nbits << 4]
            self.writer.write(code, length)
            if nbits:
                self.writer.write(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
        for b in self.pending_bits:
            self.writer.write(b, 1)
        self.pending_bits = []

    def ac_first_block(self, zz: np.ndarray, ss: int, se: int, al: int) -> None:
        run = 0
        for k in range(ss, se + 1):
            t = _shift_to_zero(int(zz[k]), al)
            if t == 0:
                run += 1
                continue
            self.flush_eobrun()
            while run > 15:
                code, length = self.ac_codes[0xF0]
                self.writer.write(code, length)
                run -= 16
            size, bits = _magnitude(t)
            code, length = self.ac_codes[(run << 4) | size]
            self.writer.write(code, length)
            self.writer.write(bits, size)
            run = 0
        if run:
            self.eobrun += 1
            if self.eobrun == _EOBRUN_MAX:
                self.flush_eobrun()

    def ac_refine_block(self, zz: np.ndarray, ss: int, se: int, al: int) -> None:
        absv = {k: abs(int(zz[k])) >> al for k in range(ss, se + 1)}
        eob = 0  # last NEWLY-significant index; zeros beyond fold into EOBRUN
        for k in range(ss, se + 1):
            if absv[k] == 1:
                eob = k
        run = 0
        br: list[int] = []
        for k in range(ss, se + 1):
            t = absv[k]
            if t == 0:
                run += 1
                continue
            while run > 15 and k <= eob:
                self.flush_eobrun()
                code, length = self.ac_codes[0xF0]
                self.writer.write(code, length)
                run -= 16
                for b in br:
                    self.writer.write(b, 1)
                br = []
            if t > 1:  # significant in an earlier pass: buffer correction bit
                br.append(t & 1)
                continue
            self.flush_eobrun()
            code, length = self.ac_codes[(run << 4) | 1]
            self.writer.write(code, length)
            self.writer.write(1 if int(zz[k]) > 0 else 0, 1)
            for b in br:
                self.writer.write(b, 1)
            br = []
            run = 0
        if run or br:
            self.eobrun += 1
            self.pending_bits.extend(br)
            if self.eobrun == _EOBRUN_MAX:
                self.flush_eobrun()

    def finish(self) -> bytes:
        self.flush_eobrun()
        self.writer.pad_to_byte()
        return bytes(self.writer.out)


def _marker_segment(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _dht_payload(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([(tc << 4) | th] + bits + vals)


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """HxWx3 RGB or HxW / HxWx1 gray uint8 -> JFIF JPEG bytes.

    ``subsample=True`` emits 4:2:0 (2x2 box-averaged chroma, 16x16 MCUs);
    ``restart_interval=N`` emits DRI + RSTn every N MCUs;
    ``progressive=True`` emits an SOF2 spectral-selection + successive-
    approximation stream (interleaved DC-first at Al=1, per-component AC
    bands 1-5 / 6-63 at Al=1, their Ah=1->Al=0 refinements, and a DC
    refinement scan). Sequential and progressive encodings carry the SAME
    quantized coefficients, so decoders must reconstruct them identically
    — the property the tests pin.
    """
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] not in (1, 3):
        raise ValueError("jpeg: expected HxWx{1,3} uint8")
    if progressive and restart_interval:
        raise ValueError("jpeg: restart intervals unsupported with progressive")
    h, w, nchan = arr.shape
    gray = nchan == 1
    qy = _quality_scale(QUANT_LUMA, quality).astype(np.float64)
    qc = _quality_scale(QUANT_CHROMA, quality).astype(np.float64)

    if gray:
        planes = [arr[:, :, 0].astype(np.float64)]
        sampling = [(1, 1)]
        qsel = [0]
    else:
        ycc = _rgb_to_ycbcr(arr)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample:
            # 2x2 box average on an edge-padded plane.
            cbp = _pad_plane(cb, 2, 2)
            crp = _pad_plane(cr, 2, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
            sampling = [(2, 2), (1, 1), (1, 1)]
        else:
            sampling = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    # Edge-pad each plane to exact MCU coverage in its own resolution.
    padded = [
        np.pad(
            p,
            (
                (0, max(0, 8 * sv * mcus_y - p.shape[0])),
                (0, max(0, 8 * sh * mcus_x - p.shape[1])),
            ),
            mode="edge",
        )
        for p, (sh, sv) in zip(planes, sampling)
    ]

    qtabs = [qy if q == 0 else qc for q in qsel]
    coefs_list = [_plane_coefs(p, qtabs[ci]) for ci, p in enumerate(padded)]
    # Natural (unpadded-to-MCU) block grid per component: the domain of
    # non-interleaved progressive scans.
    nat = []
    for sh, sv in sampling:
        cw = (w * sh + hmax - 1) // hmax
        ch = (h * sv + vmax - 1) // vmax
        nat.append(((ch + 7) // 8, (cw + 7) // 8))

    if progressive:
        ac_bits_l, ac_vals_l = _prog_ac_tables(AC_LUMA_BITS, AC_LUMA_VALS)
        ac_bits_c, ac_vals_c = _prog_ac_tables(AC_CHROMA_BITS, AC_CHROMA_VALS)
    else:
        ac_bits_l, ac_vals_l = AC_LUMA_BITS, AC_LUMA_VALS
        ac_bits_c, ac_vals_c = AC_CHROMA_BITS, AC_CHROMA_VALS
    dc_codes = [canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)]
    ac_codes = [canonical_codes(ac_bits_l, ac_vals_l)]
    if not gray:
        dc_codes.append(canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS))
        ac_codes.append(canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS))
        ac_codes[1] = canonical_codes(ac_bits_c, ac_vals_c)

    ncomp = len(planes)
    tsel = [0 if q == 0 else 1 for q in qsel]

    def sos_segment(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comp_ids)])
        for ci in comp_ids:
            body += bytes([ci + 1, (tsel[ci] << 4) | tsel[ci]])
        return _marker_segment(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    scans: list[bytes] = []  # each = SOS segment + entropy bytes

    if not progressive:
        writer = _BitWriter()
        dc_pred = [0] * ncomp
        mcu_count = 0
        rst_idx = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    writer.pad_to_byte()
                    writer.out += bytes([0xFF, 0xD0 + (rst_idx % 8)])
                    rst_idx += 1
                    dc_pred = [0] * ncomp
                for ci, (sh, sv) in enumerate(sampling):
                    for by in range(sv):
                        for bx in range(sh):
                            zz = coefs_list[ci][my * sv + by, mx * sh + bx]
                            dc_pred[ci] = _emit_block_sequential(
                                writer, zz, dc_pred[ci],
                                dc_codes[tsel[ci]], ac_codes[tsel[ci]],
                            )
                mcu_count += 1
        writer.pad_to_byte()
        scans.append(sos_segment(list(range(ncomp)), 0, 63, 0, 0) + bytes(writer.out))
    else:
        def dc_scan(ah: int, al: int) -> bytes:
            writer = _BitWriter()
            pred = [0] * ncomp
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for ci, (sh, sv) in enumerate(sampling):
                        for by in range(sv):
                            for bx in range(sh):
                                dc = int(coefs_list[ci][my * sv + by, mx * sh + bx][0])
                                if ah == 0:
                                    v = dc >> al  # arithmetic: pairs with <<
                                    diff = v - pred[ci]
                                    pred[ci] = v
                                    size, bits = _magnitude(diff)
                                    code, length = dc_codes[tsel[ci]][size]
                                    writer.write(code, length)
                                    if size:
                                        writer.write(bits, size)
                                else:
                                    writer.write((dc >> al) & 1, 1)
            writer.pad_to_byte()
            return sos_segment(list(range(ncomp)), 0, 0, ah, al) + bytes(writer.out)

        def ac_scan(ci: int, ss: int, se: int, ah: int, al: int) -> bytes:
            em = _ScanEmitter(ac_codes[tsel[ci]])
            bh_nat, bw_nat = nat[ci]
            for by in range(bh_nat):
                for bx in range(bw_nat):
                    zz = coefs_list[ci][by, bx]
                    if ah == 0:
                        em.ac_first_block(zz, ss, se, al)
                    else:
                        em.ac_refine_block(zz, ss, se, al)
            return sos_segment([ci], ss, se, ah, al) + em.finish()

        scans.append(dc_scan(0, 1))
        bands = [(1, 5), (6, 63)]
        for ci in range(ncomp):
            for ss, se in bands:
                scans.append(ac_scan(ci, ss, se, 0, 1))
        for ci in range(ncomp):
            for ss, se in bands:
                scans.append(ac_scan(ci, ss, se, 1, 0))
        scans.append(dc_scan(1, 0))

    out = bytearray(b"\xff\xd8")  # SOI
    out += _marker_segment(
        0xE0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0)
    )
    out += _marker_segment(
        0xDB, bytes([0x00]) + bytes(int(v) for v in qy.flatten()[ZIGZAG])
    )
    if not gray:
        out += _marker_segment(
            0xDB, bytes([0x01]) + bytes(int(v) for v in qc.flatten()[ZIGZAG])
        )
    comps = b""
    for ci, (sh, sv) in enumerate(sampling):
        comps += bytes([ci + 1, (sh << 4) | sv, qsel[ci]])
    out += _marker_segment(
        0xC2 if progressive else 0xC0,
        struct.pack(">BHHB", 8, h, w, len(sampling)) + comps,
    )
    out += _marker_segment(0xC4, _dht_payload(0, 0, DC_LUMA_BITS, DC_LUMA_VALS))
    out += _marker_segment(0xC4, _dht_payload(1, 0, ac_bits_l, ac_vals_l))
    if not gray:
        out += _marker_segment(
            0xC4, _dht_payload(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        )
        out += _marker_segment(0xC4, _dht_payload(1, 1, ac_bits_c, ac_vals_c))
    if restart_interval:
        out += _marker_segment(0xDD, struct.pack(">H", restart_interval))
    for scan in scans:
        out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder.
# --------------------------------------------------------------------------

def _visit_block_first(
    reader: _BitReader,
    vec: np.ndarray,
    dc_tab: _HuffDecoder | None,
    ac_tab: _HuffDecoder | None,
    pred: int,
    ss: int,
    se: int,
    al: int,
    eobrun: int,
) -> tuple[int, int]:
    """First-pass (Ah=0) visit: sequential scans are the Ss=0,Se=63,Al=0
    special case. Returns (new DC predictor, new EOBRUN)."""
    if ss == 0:
        size = dc_tab.decode(reader)
        pred += _extend(reader.read_bits(size), size)
        vec[0] = pred << al
        k = 1
    else:
        k = ss
    if se >= k:
        if eobrun > 0:
            eobrun -= 1
        else:
            while k <= se:
                rs = ac_tab.decode(reader)
                run, size = rs >> 4, rs & 0x0F
                if size == 0:
                    if run == 15:  # ZRL
                        k += 16
                        continue
                    eobrun = (1 << run) - 1
                    if run:
                        eobrun += reader.read_bits(run)
                    break
                k += run
                if k > se:
                    raise ValueError("jpeg: AC index overflow")
                vec[k] = _extend(reader.read_bits(size), size) << al
                k += 1
    return pred, eobrun


def _visit_block_refine(
    reader: _BitReader,
    vec: np.ndarray,
    ac_tab: _HuffDecoder | None,
    ss: int,
    se: int,
    al: int,
    eobrun: int,
) -> int:
    """Successive-approximation refinement visit (Ah>0), T.81 G.1.2.3 /
    the libjpeg-documented algorithm. Returns the new EOBRUN."""
    p1 = 1 << al
    m1 = -p1
    if ss == 0:  # DC refinement: one bit per block
        if reader.read_bit():
            vec[0] |= p1
        return eobrun
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = ac_tab.decode(reader)
            run, size = rs >> 4, rs & 0x0F
            newval = 0
            if size:
                newval = p1 if reader.read_bit() else m1
            elif run != 15:
                eobrun = 1 << run
                if run:
                    eobrun += reader.read_bits(run)
                break
            # advance over `run` zero-history coefficients, emitting
            # correction bits for every nonzero-history one passed
            while k <= se:
                if vec[k] != 0:
                    if reader.read_bit() and (vec[k] & p1) == 0:
                        vec[k] += p1 if vec[k] >= 0 else m1
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if newval:
                if k > se:
                    raise ValueError("jpeg: AC refine index overflow")
                vec[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if vec[k] != 0:
                if reader.read_bit() and (vec[k] & p1) == 0:
                    vec[k] += p1 if vec[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan(
    data: bytes,
    pos: int,
    scan: list[dict],
    comps_by_id: dict,
    mcus_y: int,
    mcus_x: int,
    coefs: dict,
    dc_tabs: dict,
    ac_tabs: dict,
    ss: int,
    se: int,
    ah: int,
    al: int,
    restart_interval: int,
) -> int:
    """Decode one scan's entropy data; returns the next marker offset."""
    chunks, end_pos = _split_entropy(data, pos)
    chunk_idx = 0
    reader = _FastBits(chunks[0])
    interleaved = len(scan) > 1
    preds = {s["id"]: 0 for s in scan}
    eobrun = 0
    if interleaved:
        units = mcus_y * mcus_x
    else:
        comp = comps_by_id[scan[0]["id"]]
        units = comp["bh_nat"] * comp["bw_nat"]
    for u in range(units):
        if restart_interval and u and u % restart_interval == 0:
            chunk_idx += 1
            if chunk_idx >= len(chunks):
                raise ValueError("jpeg: missing restart marker")
            reader = _FastBits(chunks[chunk_idx])
            preds = {s["id"]: 0 for s in scan}
            eobrun = 0
        for s in scan:
            comp = comps_by_id[s["id"]]
            dc_tab = dc_tabs.get(s["dc"]) if ss == 0 else None
            ac_tab = ac_tabs.get(s["ac"]) if se > 0 else None
            if interleaved:
                my, mx = divmod(u, mcus_x)
                blocks = [
                    (my * comp["v"] + by, mx * comp["h"] + bx)
                    for by in range(comp["v"])
                    for bx in range(comp["h"])
                ]
            else:
                blocks = [divmod(u, comp["bw_nat"])]
            for by, bx in blocks:
                vec = coefs[s["id"]][by, bx]
                if ah == 0:
                    preds[s["id"]], eobrun = _visit_block_first(
                        reader, vec, dc_tab, ac_tab, preds[s["id"]], ss, se, al, eobrun
                    )
                else:
                    eobrun = _visit_block_refine(
                        reader, vec, ac_tab, ss, se, al, eobrun
                    )
    return end_pos  # _split_entropy already stopped at the next marker


def decode_jpeg(data: bytes) -> np.ndarray:
    """JFIF JPEG bytes -> HxWx3 RGB (or HxWx1 gray) uint8.

    Handles baseline sequential (SOF0/1) and progressive (SOF2) streams;
    arithmetic-coded and hierarchical frames are rejected explicitly."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    n = len(data)
    qtables: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffDecoder] = {}
    ac_tabs: dict[int, _HuffDecoder] = {}
    restart_interval = 0
    frame = None
    coefs: dict[int, np.ndarray] = {}
    geom: dict | None = None

    while pos + 1 < n:
        if data[pos] != 0xFF:
            raise ValueError("jpeg: marker sync lost")
        while pos + 1 < n and data[pos + 1] == 0xFF:  # fill bytes
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        payload = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (may hold several tables)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                p += 1
                if pq != 0:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                zz = np.frombuffer(payload[p : p + 64], dtype=np.uint8).astype(
                    np.float64
                )
                qtables[tq] = zz[UNZIGZAG].reshape(8, 8)
                p += 64
        elif marker == 0xC4:  # DHT (may hold several tables)
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                p += 1
                bits = list(payload[p : p + 16])
                p += 16
                cnt = sum(bits)
                vals = list(payload[p : p + cnt])
                p += cnt
                (dc_tabs if tc == 0 else ac_tabs)[th] = _HuffDecoder(bits, vals)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            precision, fh, fw, nc = struct.unpack(">BHHB", payload[:6])
            if precision != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = payload[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = (fw + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (fh + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                cw = (fw * c["h"] + hmax - 1) // hmax
                ch = (fh * c["v"] + vmax - 1) // vmax
                c["bw_nat"] = (cw + 7) // 8
                c["bh_nat"] = (ch + 7) // 8
                coefs[c["id"]] = np.zeros(
                    (mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32
                )
            frame = (fh, fw, comps)
            geom = {"hmax": hmax, "vmax": vmax, "mcus_x": mcus_x, "mcus_y": mcus_y}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "jpeg: only baseline sequential (SOF0/1) and progressive "
                "(SOF2) Huffman frames supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = payload[0]
            scan = []
            for i in range(ns):
                cs, tt = payload[1 + 2 * i : 3 + 2 * i]
                scan.append({"id": cs, "dc": tt >> 4, "ac": tt & 0x0F})
            ss, se, ahal = payload[1 + 2 * ns : 4 + 2 * ns]
            comps_by_id = {c["id"]: c for c in frame[2]}
            pos = _decode_scan(
                data,
                pos + seglen,
                scan,
                comps_by_id,
                geom["mcus_y"],
                geom["mcus_x"],
                coefs,
                dc_tabs,
                ac_tabs,
                ss,
                se,
                ahal >> 4,
                ahal & 0x0F,
                restart_interval,
            )
            continue
        # APPn / COM / others: skip
        pos += seglen

    if frame is None or not coefs:
        raise ValueError("jpeg: missing SOF/SOS")
    fh, fw, comps = frame
    hmax, vmax = geom["hmax"], geom["vmax"]

    # Batch reconstruction: dequantize, unzigzag, IDCT all blocks at once.
    full = []
    for c in comps:
        qzig = qtables[c["tq"]].flatten()[ZIGZAG]
        vecs = coefs[c["id"]].astype(np.float64) * qzig
        bh, bw = vecs.shape[0], vecs.shape[1]
        blocks = vecs[..., UNZIGZAG].reshape(bh, bw, 8, 8)
        spatial = np.einsum("ij,xyjk,kl->xyil", DCT_M.T, blocks, DCT_M) + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        rep_y = vmax // c["v"]
        rep_x = hmax // c["h"]
        if rep_y > 1 or rep_x > 1:
            plane = np.repeat(np.repeat(plane, rep_y, axis=0), rep_x, axis=1)
        full.append(plane[:fh, :fw])

    if len(full) == 1:
        gray = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    if len(full) == 3:
        return _ycbcr_to_rgb(full[0], full[1], full[2])
    raise ValueError(f"jpeg: unsupported component count {len(full)}")


def exif_orientation(data: bytes) -> int:
    """EXIF orientation (1-8) from a JPEG's APP1 segment, 1 if absent.

    APP1 wraps a little/big-endian TIFF stream ("Exif\\0\\0" + II/MM
    header + IFD0); orientation is tag 274. Only the IFD walk is needed
    — no thumbnail or sub-IFD decoding."""
    pos = 2
    n = len(data)
    while pos + 4 <= n and data[pos] == 0xFF:
        marker = data[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if marker == 0xDA:
            break  # entropy data: no more headers
        if marker == 0xE1 and data[pos + 4 : pos + 10] == b"Exif\x00\x00":
            tiff = data[pos + 10 : pos + 2 + seglen]
            if tiff[:2] not in (b"II", b"MM"):
                return 1
            bo = "<" if tiff[:2] == b"II" else ">"
            (ifd,) = struct.unpack(bo + "I", tiff[4:8])
            if ifd + 2 > len(tiff):
                return 1
            (cnt,) = struct.unpack(bo + "H", tiff[ifd : ifd + 2])
            for i in range(cnt):
                e = tiff[ifd + 2 + 12 * i : ifd + 14 + 12 * i]
                if len(e) < 12:
                    break
                tag, typ = struct.unpack(bo + "HH", e[:4])
                if tag == 274 and typ == 3:
                    return struct.unpack(bo + "H", e[8:10])[0]
            return 1
        pos += 2 + seglen
    return 1


def apply_orientation(arr: np.ndarray, orientation: int) -> np.ndarray:
    """Normalize pixels per the 8 EXIF orientation codes (TIFF tag 274)."""
    if orientation == 2:
        return arr[:, ::-1]
    if orientation == 3:
        return arr[::-1, ::-1]
    if orientation == 4:
        return arr[::-1, :]
    if orientation == 5:
        return np.transpose(arr, (1, 0, 2))
    if orientation == 6:
        return np.transpose(arr, (1, 0, 2))[:, ::-1]
    if orientation == 7:
        return np.transpose(arr, (1, 0, 2))[::-1, ::-1]
    if orientation == 8:
        return np.transpose(arr, (1, 0, 2))[::-1, :]
    return arr


def decode_jpeg_oriented(data: bytes) -> np.ndarray:
    """decode_jpeg + EXIF orientation normalization (what viewers show)."""
    return apply_orientation(decode_jpeg(data), exif_orientation(data))
