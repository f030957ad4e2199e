"""AWS eventstream message framing (``application/vnd.amazon.eventstream``).

The binary framing AWS uses for streaming APIs — Kinesis SubscribeToShard,
S3 SelectObjectContent, Transcribe streaming — written from the public
specification (documented in the Amazon S3 SelectObjectContent API
reference, "Response message framing", and implemented by every AWS SDK,
e.g. botocore/eventstream.py):

    message      := prelude prelude_crc headers payload message_crc
    prelude      := total_length:uint32 headers_length:uint32   (big-endian)
    prelude_crc  := crc32(prelude):uint32
    headers      := { name_len:uint8 name:utf8 value_type:uint8 value }*
    message_crc  := crc32(all preceding bytes of the message):uint32

Header value types (spec table): 0/1 bool true/false (no payload bytes),
2 byte, 3 int16, 4 int32, 5 int64, 6 byte-array (uint16 length prefix),
7 string (uint16 length prefix), 8 timestamp (int64 epoch-millis),
9 uuid (16 bytes).

An event message carries three string headers — ``:message-type``
("event"), ``:event-type`` (e.g. "SubscribeToShardEvent"),
``:content-type`` — and the JSON payload; an exception replaces
``:event-type`` with ``:exception-type`` and sets ``:message-type`` to
"exception".

Both directions are implemented here (the SDKs only ship a decoder);
``tests/test_eventstream.py`` pins golden frames derived by hand from the
spec and proves interop by having botocore's own parser (when present)
decode frames this encoder produced.
"""

from __future__ import annotations

import struct
import zlib

# Plain pack/unpack calls (no precompiled struct.Struct module globals):
# kernels ship this module by value via cloudpickle, and Struct objects
# are unpicklable.

# header value type codes (spec order)
T_BOOL_TRUE = 0
T_BOOL_FALSE = 1
T_BYTE = 2
T_INT16 = 3
T_INT32 = 4
T_INT64 = 5
T_BYTES = 6
T_STRING = 7
T_TIMESTAMP = 8
T_UUID = 9


class EventStreamError(ValueError):
    """Malformed frame: bad CRC, truncated section, unknown value type."""


def _encode_header_value(value) -> bytes:
    if isinstance(value, bool):
        return bytes([T_BOOL_TRUE if value else T_BOOL_FALSE])
    if isinstance(value, str):
        raw = value.encode("utf-8")
        if len(raw) > 0xFFFF:
            raise EventStreamError("string header too long")
        return bytes([T_STRING]) + struct.pack(">H", len(raw)) + raw
    if isinstance(value, (bytes, bytearray)):
        if len(value) > 0xFFFF:
            raise EventStreamError("byte-array header too long")
        return bytes([T_BYTES]) + struct.pack(">H", len(value)) + bytes(value)
    if isinstance(value, int):
        return bytes([T_INT64]) + struct.pack(">q", value)
    raise EventStreamError(f"unsupported header value type {type(value)!r}")


def encode_message(headers: dict, payload: bytes) -> bytes:
    """Frame one eventstream message (spec layout, both CRCs)."""
    hbuf = bytearray()
    for name, value in headers.items():
        raw = name.encode("utf-8")
        if not raw or len(raw) > 0xFF:
            raise EventStreamError(f"bad header name {name!r}")
        hbuf.append(len(raw))
        hbuf += raw
        hbuf += _encode_header_value(value)
    total = 12 + len(hbuf) + len(payload) + 4
    prelude = struct.pack(">II", total, len(hbuf))
    out = bytearray(prelude)
    out += struct.pack(">I", zlib.crc32(prelude))
    out += hbuf
    out += payload
    out += struct.pack(">I", zlib.crc32(bytes(out)))
    return bytes(out)


def _decode_headers(buf: memoryview) -> dict:
    headers = {}
    i = 0
    n = len(buf)
    while i < n:
        nlen = buf[i]
        i += 1
        name = bytes(buf[i : i + nlen]).decode("utf-8")
        i += nlen
        t = buf[i]
        i += 1
        if t == T_BOOL_TRUE:
            value = True
        elif t == T_BOOL_FALSE:
            value = False
        elif t == T_BYTE:
            value = struct.unpack_from(">b", buf, i)[0]
            i += 1
        elif t == T_INT16:
            value = struct.unpack_from(">h", buf, i)[0]
            i += 2
        elif t == T_INT32:
            value = struct.unpack_from(">i", buf, i)[0]
            i += 4
        elif t in (T_INT64, T_TIMESTAMP):
            value = struct.unpack_from(">q", buf, i)[0]
            i += 8
        elif t in (T_BYTES, T_STRING):
            vlen = struct.unpack_from(">H", buf, i)[0]
            i += 2
            raw = bytes(buf[i : i + vlen])
            i += vlen
            value = raw.decode("utf-8") if t == T_STRING else raw
        elif t == T_UUID:
            value = bytes(buf[i : i + 16])
            i += 16
        else:
            raise EventStreamError(f"unknown header value type {t}")
        if i > n:
            raise EventStreamError("truncated header section")
        headers[name] = value
    return headers


def decode_message(data: bytes) -> tuple[dict, bytes, int]:
    """Decode ONE message from the front of ``data``.

    Returns (headers, payload, total_length). Raises EventStreamError on
    CRC mismatch or truncation — callers reading from a live stream
    should use :class:`EventStreamDecoder`, which buffers partial frames
    instead of erroring on them.
    """
    if len(data) < 16:
        raise EventStreamError("frame shorter than minimum message size")
    total, hlen = struct.unpack_from(">II", data, 0)
    (prelude_crc,) = struct.unpack_from(">I", data, 8)
    if prelude_crc != zlib.crc32(data[:8]):
        raise EventStreamError("prelude CRC mismatch")
    if len(data) < total:
        raise EventStreamError("truncated message body")
    (msg_crc,) = struct.unpack_from(">I", data, total - 4)
    if msg_crc != zlib.crc32(data[: total - 4]):
        raise EventStreamError("message CRC mismatch")
    headers = _decode_headers(memoryview(data)[12 : 12 + hlen])
    payload = bytes(data[12 + hlen : total - 4])
    return headers, payload, total


class EventStreamDecoder:
    """Incremental decoder: feed arbitrary byte chunks, iterate complete
    (headers, payload) messages — the shape a chunked-HTTP reader needs."""

    def __init__(self):
        self._buf = bytearray()

    def feed(self, chunk: bytes):
        self._buf += chunk
        while len(self._buf) >= 16:
            total, _ = struct.unpack_from(">II", self._buf, 0)
            if total < 16:
                raise EventStreamError(f"invalid total_length {total}")
            if len(self._buf) < total:
                return
            headers, payload, consumed = decode_message(bytes(self._buf))
            del self._buf[:consumed]
            yield headers, payload

    def close(self) -> None:
        if self._buf:
            raise EventStreamError(
                f"stream ended mid-frame ({len(self._buf)} buffered bytes)"
            )


def encode_event(event_type: str, payload: bytes) -> bytes:
    """Frame an event message the way AWS streaming APIs do."""
    return encode_message(
        {
            ":message-type": "event",
            ":event-type": event_type,
            ":content-type": "application/x-amz-json-1.1",
        },
        payload,
    )


def encode_exception(exception_type: str, payload: bytes) -> bytes:
    """Frame an in-stream exception message (mid-stream errors travel as
    frames, not HTTP status codes — the connection is already 200)."""
    return encode_message(
        {
            ":message-type": "exception",
            ":exception-type": exception_type,
            ":content-type": "application/x-amz-json-1.1",
        },
        payload,
    )
