"""MPEG transport stream (ISO/IEC 13818-1) demux+mux, stdlib only —
the fourth container format, and the only PACKETIZED one: fixed
188-byte packets with 13-bit PIDs, program tables (PAT→PMT) instead of
a header, and elementary-stream frames reassembled from PES packets
that span many transport packets. This is the HLS/broadcast transport
shape; unlike AVI/MP4/MKV there are no contiguous frame byte ranges,
so the demuxer REASSEMBLES payloads rather than returning slices (the
honest cost of the format — documented, tested, and the reason TS does
not plug into the decode-free sampling fast path).

``parse_ts`` handles: sync/TEI validation, PAT (program → PMT PID),
PMT (stream types → elementary PIDs), adaptation fields (PCR skipped,
random_access_indicator → keyframe), continuity-counter checking
(ValueError on a gap — corruption must not silently drop frames), PES
reassembly on payload_unit_start boundaries, and 33-bit PTS decoding
(3-15-15 split with marker bits). ``build_ts`` writes a conforming
single-program stream with adaptation-field stuffing so every packet
is exactly 188 bytes.
"""

from __future__ import annotations

TS_PACKET = 188
SYNC = 0x47
PAT_PID = 0x0000


def _pts_decode(b: bytes) -> int:
    """5-byte 33-bit PTS field (prefix already validated by caller)."""
    return (
        ((b[0] >> 1) & 0x7) << 30
        | b[1] << 22
        | (b[2] >> 1) << 15
        | b[3] << 7
        | (b[4] >> 1)
    )


def _pts_encode(pts: int, prefix: int = 0b0010) -> bytes:
    return bytes(
        [
            (prefix << 4) | (((pts >> 30) & 0x7) << 1) | 1,
            (pts >> 22) & 0xFF,
            (((pts >> 15) & 0x7F) << 1) | 1,
            (pts >> 7) & 0xFF,
            ((pts & 0x7F) << 1) | 1,
        ]
    )


def parse_ts(data: bytes) -> dict:
    """→ {streams: [{pid, stream_type}], frames: [{pid, pts_ms,
    keyframe, payload}]} for all elementary streams of the first
    program. PES payloads are reassembled across packets; a continuity
    gap raises ValueError.
    """
    if len(data) % TS_PACKET or not data:
        raise ValueError("TS length is not a multiple of 188")
    pmt_pid = None
    streams: list[dict] = []
    es_pids: dict[int, int] = {}
    cc: dict[int, int] = {}
    pending: dict[int, dict] = {}  # pid → {buf, pts, keyframe}
    frames: list[dict] = []

    def flush(pid: int):
        st = pending.pop(pid, None)
        if st is None:
            return
        buf = st["buf"]
        if len(buf) < 9 or buf[:3] != b"\x00\x00\x01":
            raise ValueError("PES start code missing")
        hdr_len = buf[8]
        pts = None
        if buf[7] & 0x80:
            pts = _pts_decode(buf[9:14])
        payload = bytes(buf[9 + hdr_len :])
        frames.append(
            {
                "pid": pid,
                "pts_ms": None if pts is None else round(pts / 90),
                "keyframe": st["keyframe"],
                "payload": payload,
            }
        )

    for off in range(0, len(data), TS_PACKET):
        pkt = data[off : off + TS_PACKET]
        if pkt[0] != SYNC:
            raise ValueError(f"lost sync at offset {off}")
        if pkt[1] & 0x80:
            raise ValueError("transport_error_indicator set")
        pusi = bool(pkt[1] & 0x40)
        pid = ((pkt[1] & 0x1F) << 8) | pkt[2]
        afc = (pkt[3] >> 4) & 0x3
        cont = pkt[3] & 0x0F
        if pid == 0x1FFF:
            continue  # null packets
        pos = 4
        rai = False
        if afc in (2, 3):
            alen = pkt[4]
            if alen > 0:
                rai = bool(pkt[5] & 0x40)
            pos = 5 + alen
        if afc in (1, 3):
            payload = pkt[pos:]
        else:
            payload = b""
        if payload and afc in (1, 3):
            prev = cc.get(pid)
            if prev is not None and cont != (prev + 1) % 16:
                raise ValueError(f"continuity gap on pid {pid}")
            cc[pid] = cont

        if pid == PAT_PID and pusi and payload:
            ptr = payload[0]
            sec = payload[1 + ptr :]
            if sec[0] != 0x00:
                raise ValueError("PAT table_id mismatch")
            slen = ((sec[1] & 0x0F) << 8) | sec[2]
            # programs: 8 header bytes then 4-byte entries until CRC
            for p in range(8, 3 + slen - 4, 4):
                prog = (sec[p] << 8) | sec[p + 1]
                epid = ((sec[p + 2] & 0x1F) << 8) | sec[p + 3]
                if prog != 0 and pmt_pid is None:
                    pmt_pid = epid
        elif pid == pmt_pid and pusi and payload:
            ptr = payload[0]
            sec = payload[1 + ptr :]
            if sec[0] != 0x02:
                raise ValueError("PMT table_id mismatch")
            slen = ((sec[1] & 0x0F) << 8) | sec[2]
            pinfo = ((sec[10] & 0x0F) << 8) | sec[11]
            p = 12 + pinfo
            end = 3 + slen - 4
            while p + 5 <= end:
                stype = sec[p]
                epid = ((sec[p + 1] & 0x1F) << 8) | sec[p + 2]
                eslen = ((sec[p + 3] & 0x0F) << 8) | sec[p + 4]
                if epid not in es_pids:
                    es_pids[epid] = stype
                    streams.append({"pid": epid, "stream_type": stype})
                p += 5 + eslen
        elif pid in es_pids and payload:
            if pusi:
                flush(pid)
                pending[pid] = {
                    "buf": bytearray(payload),
                    "keyframe": rai,
                }
            elif pid in pending:
                pending[pid]["buf"].extend(payload)
    for pid in list(pending):
        flush(pid)
    if pmt_pid is None:
        raise ValueError("no PAT/PMT found")
    return {"streams": streams, "frames": frames}


def _psi_crc32(data: bytes) -> int:
    """MPEG-2 PSI CRC-32 (poly 0x04C11DB7, init all-ones, no reflect)."""
    crc = 0xFFFFFFFF
    for b in data:
        crc ^= b << 24
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x04C11DB7) & 0xFFFFFFFF
                if crc & 0x80000000
                else (crc << 1) & 0xFFFFFFFF
            )
    return crc


def _section(table_id: int, body: bytes) -> bytes:
    slen = len(body) + 4  # + CRC
    sec = bytes([table_id, 0xB0 | (slen >> 8), slen & 0xFF]) + body
    return sec + _psi_crc32(sec).to_bytes(4, "big")


def _packetize(pid: int, payload: bytes, cc_start: int, pusi: bool,
               rai: bool = False) -> list[bytes]:
    """Split one PES/PSI payload into 188-byte packets with stuffing."""
    out = []
    pos = 0
    cc = cc_start
    first = True
    while pos < len(payload) or first:
        chunk = payload[pos : pos + 184]
        pos += len(chunk)
        flags1 = (0x40 if (pusi and first) else 0) | (pid >> 8)
        need_af = len(chunk) < 184 or (rai and first)
        if need_af:
            stuff = 184 - len(chunk) - 2
            af_flags = 0x40 if (rai and first) else 0x00
            if stuff < 0:  # chunk fills packet but we need AF: shrink
                chunk = chunk[:182]
                pos -= 2
                stuff = 0
            af = bytes([1 + stuff, af_flags]) + b"\xff" * stuff
            pkt = bytes([SYNC, flags1, pid & 0xFF, 0x30 | cc]) + af + chunk
        else:
            pkt = bytes([SYNC, flags1, pid & 0xFF, 0x10 | cc]) + chunk
        assert len(pkt) == TS_PACKET
        out.append(pkt)
        cc = (cc + 1) % 16
        first = False
    return out


def build_ts(
    payloads: list[bytes],
    pts_ms: list[int] | None = None,
    stream_type: int = 0x06,
    es_pid: int = 0x100,
    pmt_pid: int = 0x20,
    keyframe_every: int = 1,
) -> bytes:
    """Mux elementary-stream frames (e.g. JPEGs) into a single-program
    transport stream: PAT, PMT, one PES per frame with PTS, RAI
    adaptation flags on keyframes, stuffing to 188-byte alignment."""
    if pts_ms is None:
        pts_ms = [i * 40 for i in range(len(payloads))]
    pat = _section(
        0x00,
        bytes([0x00, 0x01, 0xC1, 0x00, 0x00])  # tsid, version, sec nums
        + bytes([0x00, 0x01, 0xE0 | (pmt_pid >> 8), pmt_pid & 0xFF]),
    )
    pmt = _section(
        0x02,
        bytes([0x00, 0x01, 0xC1, 0x00, 0x00])
        + bytes([0xE0 | (es_pid >> 8), es_pid & 0xFF, 0xF0, 0x00])
        + bytes([stream_type, 0xE0 | (es_pid >> 8), es_pid & 0xFF,
                 0xF0, 0x00]),
    )
    packets = []
    packets += _packetize(PAT_PID, bytes([0]) + pat, 0, pusi=True)
    packets += _packetize(pmt_pid, bytes([0]) + pmt, 0, pusi=True)
    cc = 0
    for i, (p, t) in enumerate(zip(payloads, pts_ms)):
        pes_hdr = (
            b"\x00\x00\x01\xe0"
            + (0).to_bytes(2, "big")  # PES length 0: unbounded (video)
            + bytes([0x80, 0x80, 5])
            + _pts_encode(t * 90)
        )
        pkts = _packetize(
            es_pid,
            pes_hdr + p,
            cc,
            pusi=True,
            rai=(i % keyframe_every == 0),
        )
        cc = (cc + len(pkts)) % 16
        packets += pkts
    return b"".join(packets)


def decode_ts_frames(data: bytes, indices: list[int] | None = None):
    """Decode MJPEG elementary-stream frames of the first program."""
    import numpy as np  # noqa: F401

    from python_kinesis_streaming_spark.llm.jpeg_codec import decode_jpeg

    info = parse_ts(data)
    frames = info["frames"]
    if indices is None:
        indices = range(len(frames))
    return [decode_jpeg(frames[i]["payload"]) for i in indices]
