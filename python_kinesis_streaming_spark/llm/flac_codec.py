"""REAL FLAC codec from the public spec (RFC 9639 / xiph FLAC format),
stdlib + numpy only — completes the audio column of the codec library
(WAV/AIFF/AU are PCM containers; FLAC is actual lossless compression).

Decoder supports the full frame surface: CONSTANT / VERBATIM / FIXED
(orders 0-4) / LPC (orders 1-32) subframes, 4- and 5-bit Rice methods
with partition orders and escape-to-raw partitions, wasted bits, all
stereo decorrelation modes (left/side, right/side, mid/side), fixed
and variable blocking strategies, UTF-8-style frame numbers, and both
frame CRCs (CRC-8 header poly 0x07, CRC-16 frame poly 0x8005) —
verified, not skipped. STREAMINFO's embedded MD5 of the raw PCM is
checked after decode: the container itself carries the ground truth
that makes a from-spec decoder falsifiable without a reference
implementation in the environment.

Encoder is a correct, deliberately simple subset (what `flac -0`
would pick): fixed block size, independent channels, per-subframe
choice of CONSTANT / FIXED order 0-4 by minimum residual magnitude
(VERBATIM fallback), one Rice partition with an estimated parameter.
Every stream it emits is decodable by any conforming decoder and
bit-exact lossless (tests verify sample equality AND the MD5 gate).

Like the other from-spec codecs this is a per-blob kernel: Spark only
ever sees it behind the Arrow-batched media seam (media_features_frame
dispatches fmt == "flac"), so the plumbing stays partition-local.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_SAMPLE_RATE_CODES = {
    88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5, 22050: 6,
    24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11,
}
_SAMPLE_RATE_TABLE = {v: k for k, v in _SAMPLE_RATE_CODES.items()}
_SAMPLE_SIZE_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
_SAMPLE_SIZE_TABLE = {v: k for k, v in _SAMPLE_SIZE_CODES.items()}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int):
        if bits == 0:
            return
        value &= (1 << bits) - 1
        self.acc = (self.acc << bits) | value
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def write_signed(self, value: int, bits: int):
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self):
        if self.n:
            self.write(0, 8 - self.n)

    def getvalue(self) -> bytes:
        assert self.n == 0
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, bits: int) -> int:
        v = 0
        while bits > 0:
            if self.byte >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - self.bit
            take = min(bits, avail)
            cur = self.data[self.byte]
            v = (v << take) | (
                (cur >> (avail - take)) & ((1 << take) - 1)
            )
            self.bit += take
            bits -= take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        return v - (1 << bits) if v & (1 << (bits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.read(1):
                return q
            q += 1
            if q > 1 << 24:
                raise ValueError("runaway unary code")

    def align(self):
        if self.bit:
            self.bit = 0
            self.byte += 1


def _write_utf8_number(bw: _BitWriter, n: int):
    """FLAC's UTF-8-style coding for frame/sample numbers: t leading
    ones select a t-byte form with 7−t payload bits in the lead byte
    (0 for t=7) plus 6 per continuation byte."""
    if n < 0x80:
        bw.write(n, 8)
        return
    for t in range(2, 8):
        payload = (7 - t if t < 7 else 0) + 6 * (t - 1)
        if n < (1 << payload):
            lead = ((0xFF << (8 - t)) & 0xFF) | (n >> (6 * (t - 1)))
            bw.write(lead, 8)
            for i in range(t - 2, -1, -1):
                bw.write(0x80 | ((n >> (6 * i)) & 0x3F), 8)
            return
    raise ValueError("frame number too large for UTF-8 coding")


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n_cont = 0
    mask = 0x40
    while b0 & mask:
        n_cont += 1
        mask >>= 1
    if n_cont == 0 or n_cont > 6:
        raise ValueError("invalid UTF-8-coded number")
    v = b0 & (mask - 1)
    for _ in range(n_cont):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _zigzag_decode(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _zigzag_encode(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _decode_residual(br: _BitReader, blocksize: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    nparts = 1 << po
    if blocksize % nparts:
        raise ValueError("partition order does not divide block size")
    res: list[int] = []
    for p in range(nparts):
        n = (blocksize >> po) - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            if raw == 0:
                res.extend([0] * n)
            else:
                res.extend(br.read_signed(raw) for _ in range(n))
        else:
            for _ in range(n):
                q = br.read_unary()
                r = br.read(param) if param else 0
                res.append(_zigzag_decode((q << param) | r))
    return res


def _decode_subframe(br: _BitReader, blocksize: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("subframe padding bit set")
    ftype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
        bps -= wasted
    if ftype == 0:  # CONSTANT
        out = [br.read_signed(bps)] * blocksize
    elif ftype == 1:  # VERBATIM
        out = [br.read_signed(bps) for _ in range(blocksize)]
    elif 8 <= ftype <= 12:  # FIXED
        order = ftype - 8
        out = [br.read_signed(bps) for _ in range(order)]
        res = _decode_residual(br, blocksize, order)
        coeffs = FIXED_COEFFS[order]
        for r in res:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coeffs))
            out.append(r + pred)
    elif ftype >= 32:  # LPC
        order = (ftype & 31) + 1
        out = [br.read_signed(bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision code 15")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coeffs = [br.read_signed(precision) for _ in range(order)]
        res = _decode_residual(br, blocksize, order)
        for r in res:
            acc = sum(c * out[-1 - j] for j, c in enumerate(coeffs))
            out.append(r + (acc >> shift))
    else:
        raise ValueError(f"reserved subframe type {ftype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(data: bytes, verify_md5: bool = True) -> dict:
    """Decode a FLAC stream → {samples: int32 [n, channels],
    sample_rate, bps, md5_ok}. Raises ValueError on malformed input,
    CRC mismatch, or (when verify_md5) an MD5 that exists and fails.
    """
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (fLaC magic missing)")
    pos = 4
    si = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("metadata truncated")
        hdr = data[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + blen]
        pos += 4 + blen
        if btype == 0:
            if blen != 34:
                raise ValueError("bad STREAMINFO length")
            br = _BitReader(body)
            si = {
                "min_block": br.read(16),
                "max_block": br.read(16),
                "min_frame": br.read(24),
                "max_frame": br.read(24),
                "sample_rate": br.read(20),
                "channels": br.read(3) + 1,
                "bps": br.read(5) + 1,
                "total_samples": br.read(36),
                "md5": body[18:34],
            }
        if last:
            break
    if si is None:
        raise ValueError("no STREAMINFO block")

    channels_out: list[list[int]] = [[] for _ in range(si["channels"])]
    while pos < len(data):
        frame_start = pos
        br = _BitReader(data, pos)
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise ValueError(f"bad frame sync at byte {pos}")
        if br.read(1):
            raise ValueError("reserved frame bit set")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("reserved frame header bit set")
        _read_utf8_number(br)
        if bs_code == 0:
            raise ValueError("reserved block size code 0")
        elif bs_code == 1:
            blocksize = 192
        elif bs_code <= 5:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = 256 << (bs_code - 8)
        if sr_code == 0:
            pass  # streaminfo
        elif sr_code <= 11:
            pass  # table value; frame-local, streaminfo governs output
        elif sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        else:
            raise ValueError("invalid sample rate code 15")
        if ss_code == 0:
            bps = si["bps"]
        elif ss_code in _SAMPLE_SIZE_TABLE:
            bps = _SAMPLE_SIZE_TABLE[ss_code]
        else:
            raise ValueError(f"reserved sample size code {ss_code}")
        br.align()
        header_crc = br.read(8)
        if _crc8(data[frame_start : br.byte - 1]) != header_crc:
            raise ValueError("frame header CRC-8 mismatch")

        if ch_code <= 7:
            nch = ch_code + 1
            chans = [
                _decode_subframe(br, blocksize, bps) for _ in range(nch)
            ]
        elif ch_code in (8, 9, 10):
            nch = 2
            bump0 = 1 if ch_code == 9 else 0
            bump1 = 1 if ch_code in (8, 10) else 0
            c0 = _decode_subframe(br, blocksize, bps + bump0)
            c1 = _decode_subframe(br, blocksize, bps + bump1)
            if ch_code == 8:  # left/side → right = left - side
                chans = [c0, [a - s for a, s in zip(c0, c1)]]
            elif ch_code == 9:  # right/side → left = right + side
                chans = [[b + s for b, s in zip(c1, c0)], c1]
            else:  # mid/side
                left, right = [], []
                for m, s in zip(c0, c1):
                    mm = (m << 1) | (s & 1)
                    left.append((mm + s) >> 1)
                    right.append((mm - s) >> 1)
                chans = [left, right]
        else:
            raise ValueError(f"reserved channel assignment {ch_code}")
        if nch != si["channels"]:
            raise ValueError("frame channel count differs from STREAMINFO")
        br.align()
        crc_pos = br.byte
        frame_crc = br.read(16)
        if _crc16(data[frame_start:crc_pos]) != frame_crc:
            raise ValueError("frame CRC-16 mismatch")
        pos = br.byte
        for c, vals in zip(channels_out, chans):
            c.extend(vals)

    n = si["total_samples"] or len(channels_out[0])
    samples = np.array(
        [c[:n] for c in channels_out], dtype=np.int64
    ).T.astype(np.int32)
    md5_ok = True
    if si["md5"] != b"\x00" * 16:
        md5_ok = hashlib.md5(
            _pcm_bytes(samples, si["bps"])
        ).digest() == si["md5"]
        if verify_md5 and not md5_ok:
            raise ValueError("decoded PCM fails STREAMINFO MD5")
    return {
        "samples": samples,
        "sample_rate": si["sample_rate"],
        "bps": si["bps"],
        "md5_ok": md5_ok,
    }


def _pcm_bytes(samples: np.ndarray, bps: int) -> bytes:
    """Interleaved little-endian PCM exactly as FLAC's MD5 defines it."""
    flat = samples.astype(np.int64).reshape(-1)
    if bps == 8:
        return flat.astype(np.int8).tobytes()
    if bps == 16:
        return flat.astype("<i2").tobytes()
    if bps == 24:
        b32 = flat.astype("<i4").tobytes()
        arr = np.frombuffer(b32, dtype=np.uint8).reshape(-1, 4)
        return arr[:, :3].tobytes()
    raise ValueError(f"unsupported bps {bps} for MD5 PCM")


# ---------------------------------------------------------------------------
# Encoder (conforming subset)
# ---------------------------------------------------------------------------


def _levinson_durbin(autoc: np.ndarray, order: int) -> list[float]:
    """LPC coefficients from autocorrelation (prediction of sig[i]
    from sig[i-1..i-order]; standard Levinson-Durbin recursion)."""
    err = float(autoc[0])
    lpc = [0.0] * order
    for i in range(order):
        if err <= 0:
            break
        acc = float(autoc[i + 1])
        for j in range(i):
            acc -= lpc[j] * float(autoc[i - j])
        k = acc / err
        new = lpc.copy()
        new[i] = k
        for j in range(i):
            new[j] = lpc[j] - k * lpc[i - 1 - j]
        lpc = new
        err *= 1.0 - k * k
    return lpc


def _quantize_lpc(
    lpc: list[float], precision: int = 12
) -> tuple[list[int], int]:
    """(quantized coefficients, shift): coefficients scaled by 2^shift
    and rounded into `precision`-bit signed ints (shift 0..15, the
    non-negative half of FLAC's 5-bit signed field)."""
    cmax = max(abs(c) for c in lpc)
    if cmax <= 0:
        return [0] * len(lpc), 0
    import math as _m

    shift = precision - 1 - int(_m.floor(_m.log2(cmax))) - 1
    shift = max(0, min(15, shift))
    lim = 1 << (precision - 1)
    q = [
        max(-lim, min(lim - 1, int(round(c * (1 << shift)))))
        for c in lpc
    ]
    return q, shift


def _lpc_residuals(
    sig: np.ndarray, qcoefs: list[int], shift: int
) -> np.ndarray:
    order = len(qcoefs)
    # pred[i] = (Σ_j qcoefs[j]·sig[i-1-j]) >> shift, exact int64
    windows = np.lib.stride_tricks.sliding_window_view(sig, order)[:-1]
    acc = windows @ np.array(qcoefs[::-1], dtype=np.int64)
    return sig[order:] - (acc >> shift)


def _best_fixed_order(chan: np.ndarray) -> int:
    best, best_cost = 0, None
    sig = chan.astype(np.int64)
    for order in range(5):
        if len(sig) <= order:
            break
        d = sig.copy()
        for _ in range(order):
            d = np.diff(d)
        cost = int(np.abs(d[order:] if order == 0 else d).sum())
        if best_cost is None or cost < best_cost:
            best, best_cost = order, cost
    return best


def _rice_param(residuals: np.ndarray) -> int:
    if len(residuals) == 0:
        return 0
    mean = float(np.abs(residuals).mean())
    p = 0
    while (1 << p) < mean + 1 and p < 14:
        p += 1
    return p


def _encode_residual(bw: _BitWriter, res: np.ndarray):
    param = _rice_param(res)
    bw.write(0, 2)  # 4-bit rice method
    bw.write(0, 4)  # partition order 0
    bw.write(param, 4)
    for v in res:
        u = _zigzag_encode(int(v))
        bw.write_unary(u >> param)
        if param:
            bw.write(u & ((1 << param) - 1), param)


def _rice_cost(residuals: np.ndarray) -> tuple[int, int]:
    param = _rice_param(residuals)
    bits = sum(
        (_zigzag_encode(int(v)) >> param) + 1 + param for v in residuals
    )
    return bits, param


def _encode_subframe(
    bw: _BitWriter, chan: np.ndarray, bps: int, lpc_order: int = 8
):
    if np.all(chan == chan[0]):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write_signed(int(chan[0]), bps)
        return
    sig = chan.astype(np.int64)
    verbatim_bits = bps * len(chan)

    order = _best_fixed_order(chan)
    fixed_res = sig.copy()
    for _ in range(order):
        fixed_res = np.diff(fixed_res)
    # order-k diff has length n-k: exactly the post-warmup residuals
    fixed_bits = _rice_cost(fixed_res)[0] + order * bps

    lpc = None
    if 0 < lpc_order < len(chan) // 2:
        f = sig.astype(np.float64)
        autoc = np.array(
            [float(f[: len(f) - k] @ f[k:]) for k in range(lpc_order + 1)]
        )
        if autoc[0] > 0:
            qc, shift = _quantize_lpc(
                _levinson_durbin(autoc, lpc_order), precision=12
            )
            if any(qc):
                res = _lpc_residuals(sig, qc, shift)
                bits = (
                    _rice_cost(res)[0]
                    + lpc_order * bps
                    + 4 + 5 + lpc_order * 12
                )
                lpc = (bits, qc, shift, res)

    if lpc is not None and lpc[0] < fixed_bits and lpc[0] < verbatim_bits:
        bits, qc, shift, res = lpc
        bw.write(0, 1)
        bw.write(32 + lpc_order - 1, 6)  # LPC
        bw.write(0, 1)
        for v in chan[:lpc_order]:
            bw.write_signed(int(v), bps)
        bw.write(12 - 1, 4)
        bw.write_signed(shift, 5)
        for c in qc:
            bw.write_signed(c, 12)
        _encode_residual(bw, res)
        return
    if fixed_bits >= verbatim_bits:
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        bw.write(0, 1)
        for v in chan:
            bw.write_signed(int(v), bps)
        return
    bw.write(0, 1)
    bw.write(8 + order, 6)  # FIXED
    bw.write(0, 1)
    for v in chan[:order]:
        bw.write_signed(int(v), bps)
    _encode_residual(bw, fixed_res)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int,
    bps: int = 16,
    block_size: int = 4096,
    lpc_order: int = 8,
) -> bytes:
    """Encode (n, channels) integer samples as a conforming FLAC
    stream: fixed blocking, independent channels, per-subframe choice
    of CONSTANT / FIXED / LPC (Levinson-Durbin analysis, quantized
    12-bit coefficients) / VERBATIM by estimated bit cost,
    single-partition Rice residuals. ``lpc_order=0`` disables LPC."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    if not (1 <= channels <= 8):
        raise ValueError("1..8 channels")
    if bps not in (8, 16, 24):
        raise ValueError("encoder supports bps 8/16/24")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if samples.min() < lo or samples.max() > hi:
        raise ValueError("samples exceed bps range")

    frames = []
    for fi, start in enumerate(range(0, n, block_size)):
        block = samples[start : start + block_size]
        bs = len(block)
        bw = _BitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocking
        if bs == block_size and block_size in (
            192, 576, 1152, 2304, 4608, 256, 512, 1024, 2048, 4096,
            8192, 16384, 32768,
        ):
            if bs == 192:
                bw.write(1, 4)
            elif bs in (576, 1152, 2304, 4608):
                bw.write(2 + (576, 1152, 2304, 4608).index(bs), 4)
            else:
                bw.write(
                    8 + (256, 512, 1024, 2048, 4096, 8192, 16384,
                         32768).index(bs), 4
                )
        elif bs <= 256:
            bw.write(6, 4)
        else:
            bw.write(7, 4)
        sr_code = _SAMPLE_RATE_CODES.get(sample_rate, 0)
        bw.write(sr_code, 4)
        bw.write(channels - 1, 4)
        bw.write(_SAMPLE_SIZE_CODES[bps], 3)
        bw.write(0, 1)
        _write_utf8_number(bw, fi)
        if not (
            bs == block_size
            and block_size in (192, 576, 1152, 2304, 4608, 256, 512,
                               1024, 2048, 4096, 8192, 16384, 32768)
        ):
            if bs <= 256:
                bw.write(bs - 1, 8)
            else:
                bw.write(bs - 1, 16)
        bw.align()
        hdr = bw.getvalue()
        bw2 = _BitWriter()
        for b in hdr:
            bw2.write(b, 8)
        bw2.write(_crc8(hdr), 8)
        for ch in range(channels):
            _encode_subframe(bw2, block[:, ch], bps, lpc_order)
        bw2.align()
        body = bw2.getvalue()
        bw3 = _BitWriter()
        for b in body:
            bw3.write(b, 8)
        bw3.write(_crc16(body), 16)
        frames.append(bw3.getvalue())

    frame_sizes = [len(f) for f in frames]
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(min(frame_sizes) if frames else 0, 24)
    si.write(max(frame_sizes) if frames else 0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    streaminfo = si.getvalue() + hashlib.md5(
        _pcm_bytes(samples, bps)
    ).digest()
    assert len(streaminfo) == 34
    out = bytearray(b"fLaC")
    out.append(0x80)  # last block, type 0
    out += struct.pack(">I", 34)[1:]
    out += streaminfo
    for f in frames:
        out += f
    return bytes(out)
