"""Baseline-sequential JPEG codec (ITU T.81 / JFIF), stdlib + numpy only.

Extends the real-decode story of ``media_codecs.py`` to the format that
dominates real image corpora. No PIL/libjpeg in this container, so both
sides are implemented from the public spec:

- ``decode_jpeg`` — full baseline decode: marker walk (APPn/COM skip,
  DQT, SOF0, DHT, DRI, SOS), canonical Huffman table construction,
  entropy decode with byte unstuffing and RSTn handling, DC prediction,
  dequantize, inverse zigzag, 2-D IDCT, chroma upsampling for arbitrary
  (h,v) sampling factors (4:4:4, 4:2:0, 4:2:2), YCbCr→RGB (BT.601 JFIF).
  Progressive (SOF2) and arithmetic-coded streams are rejected with a
  clear error, not mis-decoded.
- ``encode_jpeg`` — baseline encoder: level shift, 2-D DCT, Annex-K
  quantization tables scaled by IJG quality, zigzag, DC-differential +
  run-length AC Huffman coding with the Annex-K typical tables, byte
  stuffing, optional 4:2:0 subsampling (2x2 box-average chroma), optional
  restart intervals, grayscale single-component streams.

Test strategy (tests/test_jpeg_codec.py): JPEG is lossy, so roundtrips
assert tolerance bands (flat images roundtrip near-exactly — DC-only;
smooth gradients within a small mean error at quality 95); the DCT is
pinned against a literal O(N^4) evaluation of the T.81 definition; the
canonical Huffman constructor is pinned against the spec-derivable DC
luminance code assignments; 4:2:0 and restart-interval encodes exercise
the decoder's MCU-interleave and RSTn paths. Interop guarantee with
external files comes from writing the tables we use into DQT/DHT and
reading whatever tables an external file declares — nothing is assumed
shared out-of-band.

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


class _BitReader:
    """Reads entropy-coded bits, unstuffing 0xFF00 and stopping at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._nbits = 0
        self.marker: int | None = None  # set when a non-RST marker is hit

    def _fill(self) -> bool:
        if self.pos >= len(self.data):
            return False
        byte = self.data[self.pos]
        if byte == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = nxt
                return False  # real marker: stop feeding bits
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | byte
        self._nbits += 8
        return True

    def read_bit(self) -> int:
        if self._nbits == 0 and not self._fill():
            raise ValueError("jpeg: entropy data truncated")
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Consume an RSTn marker at a restart boundary and reset bit state."""
        self._acc = 0
        self._nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1  # tolerate pad bytes before the marker
        raise ValueError("jpeg: missing restart marker")


class _HuffDecoder:
    """Canonical-code Huffman decoder: maps (length, code) -> symbol."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.lut: dict[tuple[int, int], int] = {}
        for sym, (code, length) in canonical_codes(bits, vals).items():
            self.lut[(length, code)] = sym
        self.max_len = max((ln for ln, _ in self.lut), default=0)

    def decode(self, reader: _BitReader) -> int:
        code = 0
        for length in range(1, self.max_len + 1):
            code = (code << 1) | reader.read_bit()
            sym = self.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code")


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


def _encode_block(
    block: np.ndarray,
    qtab: np.ndarray,
    dc_pred: int,
    dc_codes: dict,
    ac_codes: dict,
    writer: _BitWriter,
) -> int:
    coef = DCT_M @ (block - 128.0) @ DCT_M.T
    quant = np.round(coef / qtab).astype(np.int64)
    zz = quant.flatten()[ZIGZAG]
    # DC differential
    diff = int(zz[0]) - dc_pred
    size, bits = _magnitude(diff)
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        writer.write(bits, size)
    # AC run-length
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


def _marker_segment(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _dht_payload(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([(tc << 4) | th] + bits + vals)


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """HxWx3 RGB or HxW / HxWx1 gray uint8 -> baseline JFIF JPEG bytes.

    ``subsample=True`` emits 4:2:0 (2x2 box-averaged chroma, 16x16 MCUs);
    ``restart_interval=N`` emits DRI + RSTn every N MCUs.
    """
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] not in (1, 3):
        raise ValueError("jpeg: expected HxWx{1,3} uint8")
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

    dc_codes = [canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)]
    ac_codes = [canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        dc_codes.append(canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS))
        ac_codes.append(canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS))

    writer = _BitWriter()
    dc_pred = [0] * len(planes)
    qtabs = [qy if q == 0 else qc for q in qsel]
    mcu_count = 0
    rst_idx = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.pad_to_byte()
                writer.out += bytes([0xFF, 0xD0 + (rst_idx % 8)])
                rst_idx += 1
                dc_pred = [0] * len(planes)
            for ci, ((sh, sv), plane) in enumerate(zip(sampling, padded)):
                tsel = 0 if qsel[ci] == 0 else 1
                for by in range(sv):
                    for bx in range(sh):
                        r0 = (my * sv + by) * 8
                        c0 = (mx * sh + bx) * 8
                        block = plane[r0 : r0 + 8, c0 : c0 + 8]
                        dc_pred[ci] = _encode_block(
                            block,
                            qtabs[ci],
                            dc_pred[ci],
                            dc_codes[tsel],
                            ac_codes[tsel],
                            writer,
                        )
            mcu_count += 1
    writer.pad_to_byte()

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
        0xC0, struct.pack(">BHHB", 8, h, w, len(sampling)) + comps
    )
    out += _marker_segment(0xC4, _dht_payload(0, 0, DC_LUMA_BITS, DC_LUMA_VALS))
    out += _marker_segment(0xC4, _dht_payload(1, 0, AC_LUMA_BITS, AC_LUMA_VALS))
    if not gray:
        out += _marker_segment(
            0xC4, _dht_payload(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        )
        out += _marker_segment(
            0xC4, _dht_payload(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
        )
    if restart_interval:
        out += _marker_segment(0xDD, struct.pack(">H", restart_interval))
    scomps = b""
    for ci in range(len(sampling)):
        tsel = 0 if qsel[ci] == 0 else 1
        scomps += bytes([ci + 1, (tsel << 4) | tsel])
    out += _marker_segment(
        0xDA, bytes([len(sampling)]) + scomps + bytes([0, 63, 0])
    )
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder.
# --------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF JPEG bytes -> HxWx3 RGB (or HxWx1 gray) uint8."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffDecoder] = {}
    ac_tabs: dict[int, _HuffDecoder] = {}
    restart_interval = 0
    frame = None  # (h, w, components) from SOF0
    scan = None

    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            raise ValueError("jpeg: marker sync lost")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
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
                n = sum(bits)
                vals = list(payload[p : p + n])
                p += n
                (dc_tabs if tc == 0 else ac_tabs)[th] = _HuffDecoder(bits, vals)
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision, fh, fw, nc = struct.unpack(">BHHB", payload[:6])
            if precision != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = payload[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: only baseline sequential (SOF0) supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS — entropy data follows the segment
            ns = payload[0]
            sel = []
            for i in range(ns):
                cs, tt = payload[1 + 2 * i : 3 + 2 * i]
                sel.append({"id": cs, "dc": tt >> 4, "ac": tt & 0x0F})
            scan = sel
            pos += seglen
            break
        # APPn / COM / others: skip
        pos += seglen

    if frame is None or scan is None:
        raise ValueError("jpeg: missing SOF/SOS")
    fh, fw, comps = frame
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (fw + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (fh + 8 * vmax - 1) // (8 * vmax)

    planes = {
        c["id"]: np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        for c in comps
    }
    reader = _BitReader(data, pos)
    dc_pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.sync_restart()
                dc_pred = {c["id"]: 0 for c in comps}
            for s in scan:
                comp = by_id[s["id"]]
                dc_tab = dc_tabs[s["dc"]]
                ac_tab = ac_tabs[s["ac"]]
                qtab = qtables[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        size = dc_tab.decode(reader)
                        diff = _extend(reader.read_bits(size), size)
                        dc_pred[s["id"]] += diff
                        zz[0] = dc_pred[s["id"]]
                        k = 1
                        while k < 64:
                            rs = ac_tab.decode(reader)
                            run, size = rs >> 4, rs & 0x0F
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("jpeg: AC index overflow")
                            zz[k] = _extend(reader.read_bits(size), size)
                            k += 1
                        coef = (zz * qtab.flatten()[ZIGZAG])[UNZIGZAG].reshape(8, 8)
                        block = DCT_M.T @ coef @ DCT_M + 128.0
                        r0 = (my * comp["v"] + by) * 8
                        c0 = (mx * comp["h"] + bx) * 8
                        planes[s["id"]][r0 : r0 + 8, c0 : c0 + 8] = block
            mcu_count += 1

    # Upsample every component to full resolution and crop.
    full = []
    for c in comps:
        p = planes[c["id"]]
        rep_y = vmax // c["v"]
        rep_x = hmax // c["h"]
        if rep_y > 1 or rep_x > 1:
            p = np.repeat(np.repeat(p, rep_y, axis=0), rep_x, axis=1)
        full.append(p[:fh, :fw])

    if len(full) == 1:
        gray = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    if len(full) == 3:
        return _ycbcr_to_rgb(full[0], full[1], full[2])
    raise ValueError(f"jpeg: unsupported component count {len(full)}")
