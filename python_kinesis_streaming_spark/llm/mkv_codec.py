"""Matroska / WebM container demux+mux from the public specs (RFC 8794
EBML + the Matroska element registry), stdlib + numpy only — the third
video container next to AVI and MP4, chosen because its structure is
nothing like either: EBML variable-length ids/sizes instead of fixed
fourcc/box headers, and frames packed into clusters with three lacing
schemes instead of a sample table.

``parse_mkv`` resolves, per video frame: absolute (offset, size),
pts_ms (cluster timestamp + block relative timestamp, scaled by
TimestampScale), and keyframe flag (SimpleBlock flag bit, or absence
of ReferenceBlock in a BlockGroup). All three lacings — Xiph
(255-run sizes), EBML (signed-VINT deltas), fixed (equal split) — are
resolved to byte-exact frame slices, verified in tests by every
resolved MJPEG slice starting with an SOI marker and decoding
identically to the raw JPEG.

``build_mkv`` writes a minimal one-track Segment (V_MJPEG or
V_UNCOMPRESSED) with selectable lacing, used by tests and payload
synthesis. Frame sampling composes with ``video_codecs``: probe the
index, decode only chosen frames — the same decode-free-sampling
discipline as AVI/MP4.
"""

from __future__ import annotations

import struct

import numpy as np

# EBML / Matroska element ids (from the public registry), as raw bytes
EBML_HEADER = b"\x1a\x45\xdf\xa3"
SEGMENT = b"\x18\x53\x80\x67"
INFO = b"\x15\x49\xa9\x66"
TIMESTAMP_SCALE = b"\x2a\xd7\xb1"
TRACKS = b"\x16\x54\xae\x6b"
TRACK_ENTRY = b"\xae"
TRACK_NUMBER = b"\xd7"
TRACK_TYPE = b"\x83"
CODEC_ID = b"\x86"
VIDEO = b"\xe0"
PIXEL_WIDTH = b"\xb0"
PIXEL_HEIGHT = b"\xba"
CLUSTER = b"\x1f\x43\xb6\x75"
CLUSTER_TIMESTAMP = b"\xe7"
SIMPLE_BLOCK = b"\xa3"
BLOCK_GROUP = b"\xa0"
BLOCK = b"\xa1"
REFERENCE_BLOCK = b"\xfb"
DOC_TYPE = b"\x42\x82"


def _read_vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """EBML VINT at ``pos`` → (value, bytes consumed). ``keep_marker``
    retains the length-descriptor bit (element IDs); sizes strip it."""
    if pos >= len(data):
        raise ValueError("EBML truncated at vint")
    first = data[pos]
    if first == 0:
        raise ValueError("invalid EBML vint (zero lead byte)")
    length = 1
    mask = 0x80
    while not (first & mask):
        length += 1
        mask >>= 1
    if pos + length > len(data):
        raise ValueError("EBML vint overruns buffer")
    v = first if keep_marker else (first & (mask - 1))
    for i in range(1, length):
        v = (v << 8) | data[pos + i]
    return v, length


def _read_svint(data: bytes, pos: int) -> tuple[int, int]:
    """Signed VINT (EBML-lace deltas): value minus the range midpoint."""
    v, n = _read_vint(data, pos, keep_marker=False)
    return v - ((1 << (7 * n - 1)) - 1), n


def _walk(data: bytes, start: int, end: int):
    """Yield (id_bytes, payload_start, payload_end) for one EBML level."""
    pos = start
    while pos < end:
        id_val, id_len = _read_vint(data, pos, keep_marker=True)
        id_bytes = data[pos : pos + id_len]
        size, sz_len = _read_vint(data, pos + id_len, keep_marker=False)
        body = pos + id_len + sz_len
        # unknown-size (all value bits set): runs to the parent's end
        unknown = size == (1 << (7 * sz_len)) - 1
        pend = end if unknown else body + size
        if pend > end:
            raise ValueError(f"EBML element {id_bytes.hex()} overruns parent")
        yield id_bytes, body, pend
        pos = pend


def _uint(data: bytes, s: int, e: int) -> int:
    v = 0
    for b in data[s:e]:
        v = (v << 8) | b
    return v


def _parse_block(
    data: bytes, s: int, e: int, cluster_ts: int, scale: int,
    keyframe: bool,
) -> tuple[int, list[dict]]:
    """SimpleBlock/Block payload → (track, frames) with absolute
    offsets resolved through the lacing scheme."""
    track, n = _read_vint(data, s, keep_marker=False)
    pos = s + n
    (rel_ts,) = struct.unpack(">h", data[pos : pos + 2])
    flags = data[pos + 2]
    pos += 3
    lacing = (flags >> 1) & 0x3
    pts_ns = (cluster_ts + rel_ts) * scale
    if lacing == 0:
        sizes = [e - pos]
    else:
        n_frames = data[pos] + 1
        pos += 1
        if lacing == 0b01:  # Xiph: 255-run sizes, last implied
            sizes = []
            for _ in range(n_frames - 1):
                sz = 0
                while data[pos] == 255:
                    sz += 255
                    pos += 1
                sz += data[pos]
                pos += 1
                sizes.append(sz)
        elif lacing == 0b11:  # EBML: first VINT, then signed deltas
            first, n2 = _read_vint(data, pos, keep_marker=False)
            pos += n2
            sizes = [first]
            for _ in range(n_frames - 2):
                d, n3 = _read_svint(data, pos)
                pos += n3
                sizes.append(sizes[-1] + d)
        else:  # 0b10 fixed: equal split
            total = e - pos
            if total % n_frames:
                raise ValueError("fixed lacing not divisible")
            sizes = [total // n_frames] * (n_frames - 1)
        used = sum(sizes)
        sizes.append(e - pos - used)
    if sizes[-1] < 0:
        raise ValueError("lace sizes overrun block")
    frames = []
    off = pos
    for sz in sizes:
        frames.append(
            {
                "offset": off,
                "size": sz,
                "pts_ms": round(pts_ns / 1_000_000),
                "keyframe": keyframe,
            }
        )
        off += sz
    if off != e:
        raise ValueError("lace sizes do not cover block payload")
    return track, frames


def parse_mkv(data: bytes) -> dict:
    """Demux: {codec, width, height, n_frames, frames:[{offset, size,
    pts_ms, keyframe}]} for the first video track. ValueError on
    malformed input."""
    if data[:4] != EBML_HEADER:
        raise ValueError("not an EBML/Matroska stream")
    top = list(_walk(data, 0, len(data)))
    seg = next((t for t in top if t[0] == SEGMENT), None)
    if seg is None:
        raise ValueError("no Segment element")

    scale = 1_000_000  # Matroska default: ns per timestamp tick
    video_track = None
    codec = width = height = None
    frames: list[dict] = []

    for eid, s, e in _walk(data, seg[1], seg[2]):
        if eid == INFO:
            for i2, s2, e2 in _walk(data, s, e):
                if i2 == TIMESTAMP_SCALE:
                    scale = _uint(data, s2, e2)
        elif eid == TRACKS:
            for i2, s2, e2 in _walk(data, s, e):
                if i2 != TRACK_ENTRY:
                    continue
                num = ttype = None
                cid = None
                w = h = None
                for i3, s3, e3 in _walk(data, s2, e2):
                    if i3 == TRACK_NUMBER:
                        num = _uint(data, s3, e3)
                    elif i3 == TRACK_TYPE:
                        ttype = _uint(data, s3, e3)
                    elif i3 == CODEC_ID:
                        cid = data[s3:e3].decode("ascii", "replace")
                    elif i3 == VIDEO:
                        for i4, s4, e4 in _walk(data, s3, e3):
                            if i4 == PIXEL_WIDTH:
                                w = _uint(data, s4, e4)
                            elif i4 == PIXEL_HEIGHT:
                                h = _uint(data, s4, e4)
                if ttype == 1 and video_track is None:
                    video_track, codec, width, height = num, cid, w, h
        elif eid == CLUSTER:
            cluster_ts = 0
            for i2, s2, e2 in _walk(data, s, e):
                if i2 == CLUSTER_TIMESTAMP:
                    cluster_ts = _uint(data, s2, e2)
                elif i2 == SIMPLE_BLOCK:
                    kf = bool(data[s2 + _read_vint(data, s2, False)[1] + 2]
                              & 0x80)
                    trk, fr = _parse_block(
                        data, s2, e2, cluster_ts, scale, kf
                    )
                    if trk == video_track:
                        frames.extend(fr)
                elif i2 == BLOCK_GROUP:
                    blk = None
                    has_ref = False
                    for i3, s3, e3 in _walk(data, s2, e2):
                        if i3 == BLOCK:
                            blk = (s3, e3)
                        elif i3 == REFERENCE_BLOCK:
                            has_ref = True
                    if blk is not None:
                        trk, fr = _parse_block(
                            data, blk[0], blk[1], cluster_ts, scale,
                            not has_ref,
                        )
                        if trk == video_track:
                            frames.extend(fr)

    if video_track is None:
        raise ValueError("no video track in Segment")
    return {
        "codec": codec,
        "width": width,
        "height": height,
        "n_frames": len(frames),
        "frames": frames,
    }


# ---------------------------------------------------------------------------
# Muxer
# ---------------------------------------------------------------------------


def _vint_size(size: int) -> bytes:
    """Encode a size as the shortest EBML VINT."""
    for length in range(1, 9):
        if size < (1 << (7 * length)) - 1:
            v = size | (1 << (7 * length))
            return v.to_bytes(length, "big")
    raise ValueError("size too large for EBML vint")


def _el(eid: bytes, payload: bytes) -> bytes:
    return eid + _vint_size(len(payload)) + payload


def _el_uint(eid: bytes, v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return _el(eid, v.to_bytes(n, "big"))


def _xiph_sizes(sizes: list[int]) -> bytes:
    out = bytearray()
    for sz in sizes:
        out += b"\xff" * (sz // 255) + bytes([sz % 255])
    return bytes(out)


def _svint(v: int) -> bytes:
    for length in range(1, 9):
        bias = (1 << (7 * length - 1)) - 1
        enc = v + bias
        if 0 <= enc < (1 << (7 * length)) - 1 - (0):
            return (enc | (1 << (7 * length))).to_bytes(length, "big")
    raise ValueError("delta too large for signed vint")


def build_mkv(
    payloads: list[bytes],
    codec_id: str = "V_MJPEG",
    width: int = 0,
    height: int = 0,
    fps: int = 25,
    lacing: str | None = None,
    keyframe_every: int = 1,
) -> bytes:
    """Mux pre-encoded frame payloads into a one-track Matroska file.

    ``lacing``: None (one SimpleBlock per frame), "xiph", "ebml", or
    "fixed" (all frames in one laced block — fixed requires equal
    sizes). ``keyframe_every`` marks every Nth SimpleBlock as key.
    """
    ebml = _el(
        EBML_HEADER,
        _el_uint(b"\x42\x86", 1)      # EBMLVersion
        + _el_uint(b"\x42\xf7", 1)    # EBMLReadVersion
        + _el_uint(b"\x42\xf2", 4)    # EBMLMaxIDLength
        + _el_uint(b"\x42\xf3", 8)    # EBMLMaxSizeLength
        + _el(DOC_TYPE, b"matroska")
        + _el_uint(b"\x42\x87", 4)    # DocTypeVersion
        + _el_uint(b"\x42\x85", 2),   # DocTypeReadVersion
    )
    info = _el(INFO, _el_uint(TIMESTAMP_SCALE, 1_000_000))
    video = _el(
        VIDEO, _el_uint(PIXEL_WIDTH, width) + _el_uint(PIXEL_HEIGHT, height)
    )
    track = _el(
        TRACKS,
        _el(
            TRACK_ENTRY,
            _el_uint(TRACK_NUMBER, 1)
            + _el_uint(b"\x73\xc5", 1)  # TrackUID
            + _el_uint(TRACK_TYPE, 1)   # video
            + _el(CODEC_ID, codec_id.encode())
            + video,
        ),
    )

    ms_per_frame = 1000 // fps
    blocks = b""
    if lacing is None:
        for i, p in enumerate(payloads):
            flags = 0x80 if i % keyframe_every == 0 else 0x00
            body = (
                _vint_size(1)[:1]  # track 1 as 1-byte vint (0x81)
                + struct.pack(">h", i * ms_per_frame)
                + bytes([flags])
                + p
            )
            blocks += _el(SIMPLE_BLOCK, body)
    else:
        sizes = [len(p) for p in payloads]
        if lacing == "xiph":
            lace_flag, lace_hdr = 0b01, _xiph_sizes(sizes[:-1])
        elif lacing == "ebml":
            lace_flag = 0b11
            lace_hdr = _vint_size(sizes[0])
            for a, b in zip(sizes, sizes[1:-1]):
                lace_hdr += _svint(b - a)
        elif lacing == "fixed":
            if len(set(sizes)) != 1:
                raise ValueError("fixed lacing requires equal frame sizes")
            lace_flag, lace_hdr = 0b10, b""
        else:
            raise ValueError(f"unknown lacing {lacing!r}")
        body = (
            _vint_size(1)[:1]
            + struct.pack(">h", 0)
            + bytes([0x80 | (lace_flag << 1)])
            + bytes([len(payloads) - 1])
            + lace_hdr
            + b"".join(payloads)
        )
        blocks += _el(SIMPLE_BLOCK, body)

    cluster = _el(CLUSTER, _el_uint(CLUSTER_TIMESTAMP, 0) + blocks)
    segment = _el(SEGMENT, info + track + cluster)
    return ebml + segment


def decode_mkv_frames(
    data: bytes, indices: list[int] | None = None
) -> list[np.ndarray]:
    """Decode selected (or all) frames of the first video track
    (V_MJPEG via the from-spec JPEG codec)."""
    from python_kinesis_streaming_spark.llm.jpeg_codec import decode_jpeg

    info = parse_mkv(data)
    if info["codec"] != "V_MJPEG":
        raise ValueError(f"no pixel decoder for codec {info['codec']!r}")
    frames = info["frames"]
    if indices is None:
        indices = range(len(frames))
    return [
        decode_jpeg(
            data[frames[i]["offset"] : frames[i]["offset"]
                 + frames[i]["size"]]
        )
        for i in indices
    ]
