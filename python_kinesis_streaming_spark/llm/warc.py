"""WARC (ISO 28500) web-archive ingestion for Common-Crawl-style corpora.

Web crawl dumps — the largest public LLM pretraining source — ship as
WARC files: a concatenation of records, each a ``WARC/1.x`` header block
(CRLF-separated ``Name: value`` lines), a blank line, ``Content-Length``
bytes of payload, and a trailing blank-line pair. Response records wrap a
full HTTP response (status line + headers + body). Files are usually
per-record gzip members concatenated into one stream, which stdlib
``gzip`` decompresses transparently.

This module implements the format from the public spec, stdlib-only:

- ``parse_warc(data)`` — record iterator over plain or gzipped WARC
  bytes; tolerant of missing trailing separators at EOF.
- ``split_http_response(payload)`` — status code, headers,
  body split for ``response`` records (handles header/body boundary by
  the first CRLFCRLF; no chunked re-assembly — crawlers store bodies
  de-chunked, per the spec's recommendation).
- ``build_warc(records, gzip_per_record)`` — writer used by tests and
  fixture synthesis: emits spec-shaped records (and per-record gzip
  members, the Common Crawl layout) so the reader is exercised against
  independently-constructed bytes.
- ``read_warc(spark, glob)`` — ``binaryFile`` scan + Arrow-batched
  ``mapInPandas``: one row per record with WARC type/uri/date/id,
  payload, and for response records the parsed HTTP status +
  content-type + body. Partition-local, zero shuffle — the same seam as
  the media decoders.

Scale notes (100 TB): crawl dumps are many ~1 GB WARC files — binaryFile
gives one task per file, so parallelism equals file count with no
shuffle; downstream text ops (langid, quality, dedup) consume the body
column off this scan directly. Per-record gzip means a file cannot be
split mid-stream, matching the one-file-one-task model. Bare-session
safe: worker closures are nested functions (CLAUDE.md invariant 1).
"""

from __future__ import annotations

import gzip
import io
import uuid

from pyspark.sql import DataFrame, SparkSession

_GZIP_MAGIC = b"\x1f\x8b"


def _decompress_all(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream, or pass through."""
    if not data.startswith(_GZIP_MAGIC):
        return data
    out = bytearray()
    with gzip.GzipFile(fileobj=io.BytesIO(data)) as gz:
        while True:
            chunk = gz.read(1 << 20)
            if not chunk:
                break
            out += chunk
    return bytes(out)


def parse_warc(data: bytes):
    """Yield ``(headers: dict, payload: bytes)`` per WARC record.

    Header names are lower-cased; the WARC version line is kept under
    ``"warc-version"``. Raises ``ValueError`` on malformed framing.
    """
    data = _decompress_all(data)
    pos = 0
    n = len(data)
    while pos < n:
        # Skip inter-record blank lines.
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise ValueError("warc: unterminated header block")
        lines = data[pos:head_end].split(b"\r\n")
        if not lines[0].startswith(b"WARC/"):
            raise ValueError("warc: missing WARC version line")
        headers = {"warc-version": lines[0].decode("ascii", "replace")}
        for line in lines[1:]:
            name, sep, value = line.partition(b":")
            if not sep:
                raise ValueError("warc: malformed header line")
            headers[name.decode("ascii", "replace").strip().lower()] = (
                value.decode("utf-8", "replace").strip()
            )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("warc: missing/invalid Content-Length") from None
        body_start = head_end + 4
        payload = data[body_start : body_start + length]
        if len(payload) != length:
            raise ValueError("warc: truncated record payload")
        yield headers, payload
        pos = body_start + length


def split_http_response(payload: bytes) -> tuple[int, dict, bytes]:
    """HTTP response payload -> (status code, lower-cased headers, body)."""
    head_end = payload.find(b"\r\n\r\n")
    if head_end < 0:
        raise ValueError("http: missing header/body separator")
    lines = payload[:head_end].split(b"\r\n")
    parts = lines[0].split(None, 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        raise ValueError("http: malformed status line")
    status = int(parts[1])
    headers = {}
    for line in lines[1:]:
        name, sep, value = line.partition(b":")
        if sep:
            headers[name.decode("ascii", "replace").strip().lower()] = (
                value.decode("utf-8", "replace").strip()
            )
    return status, headers, payload[head_end + 4 :]


def build_warc(records, gzip_per_record: bool = True) -> bytes:
    """Records -> WARC bytes. ``records`` is an iterable of dicts with
    keys ``type``, ``uri``, ``date``, ``payload`` (bytes) and optional
    ``record_id``/``content_type``. Per-record gzip members reproduce the
    Common Crawl file layout."""
    out = bytearray()
    for rec in records:
        rid = rec.get("record_id") or f"<urn:uuid:{uuid.uuid4()}>"
        payload = rec["payload"]
        head = (
            b"WARC/1.0\r\n"
            + f"WARC-Type: {rec['type']}\r\n".encode()
            + f"WARC-Record-ID: {rid}\r\n".encode()
            + f"WARC-Date: {rec['date']}\r\n".encode()
            + (
                f"WARC-Target-URI: {rec['uri']}\r\n".encode()
                if rec.get("uri")
                else b""
            )
            + (
                f"Content-Type: {rec['content_type']}\r\n".encode()
                if rec.get("content_type")
                else b""
            )
            + f"Content-Length: {len(payload)}\r\n".encode()
            + b"\r\n"
        )
        record = head + payload + b"\r\n\r\n"
        out += gzip.compress(record) if gzip_per_record else record
    return bytes(out)


def read_warc(spark: SparkSession, warc_glob: str) -> DataFrame:
    """WARC files -> one row per record.

    Schema: ``path string, warc_type string, record_id string,
    target_uri string, warc_date string, content_type string,
    payload binary, http_status int, http_content_type string,
    http_body binary`` (http_* null for non-response records; malformed
    records are quarantined as ``warc_type = 'error:<reason>'`` rows, not
    task failures — the dq_row_quarantine discipline)."""
    files = spark.read.format("binaryFile").load(warc_glob)

    def unpack(batches):
        import gzip as _gzip  # noqa: F401 (parser nested below uses it)
        import io as _io
        import pandas as pd

        def decompress_all(data):
            if not data.startswith(b"\x1f\x8b"):
                return data
            out = bytearray()
            with _gzip.GzipFile(fileobj=_io.BytesIO(data)) as gz:
                while True:
                    chunk = gz.read(1 << 20)
                    if not chunk:
                        break
                    out += chunk
            return bytes(out)

        def records_of(data):
            data = decompress_all(data)
            pos = 0
            n = len(data)
            while pos < n:
                while pos < n and data[pos : pos + 2] == b"\r\n":
                    pos += 2
                if pos >= n:
                    break
                head_end = data.find(b"\r\n\r\n", pos)
                if head_end < 0:
                    raise ValueError("unterminated header block")
                lines = data[pos:head_end].split(b"\r\n")
                if not lines[0].startswith(b"WARC/"):
                    raise ValueError("missing WARC version line")
                headers = {}
                for line in lines[1:]:
                    name, sep, value = line.partition(b":")
                    if sep:
                        headers[
                            name.decode("ascii", "replace").strip().lower()
                        ] = value.decode("utf-8", "replace").strip()
                length = int(headers["content-length"])
                body_start = head_end + 4
                payload = data[body_start : body_start + length]
                if len(payload) != length:
                    raise ValueError("truncated record payload")
                yield headers, payload
                pos = body_start + length

        def split_http(payload):
            head_end = payload.find(b"\r\n\r\n")
            if head_end < 0:
                raise ValueError("missing header/body separator")
            lines = payload[:head_end].split(b"\r\n")
            status = int(lines[0].split(None, 2)[1])
            headers = {}
            for line in lines[1:]:
                name, sep, value = line.partition(b":")
                if sep:
                    headers[
                        name.decode("ascii", "replace").strip().lower()
                    ] = value.decode("utf-8", "replace").strip()
            return status, headers, payload[head_end + 4 :]

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    recs = list(records_of(bytes(content)))
                except (ValueError, OSError, EOFError, KeyError) as e:
                    rows.append(
                        {
                            "path": path,
                            "warc_type": f"error:{e}",
                            "record_id": None,
                            "target_uri": None,
                            "warc_date": None,
                            "content_type": None,
                            "payload": None,
                            "http_status": None,
                            "http_content_type": None,
                            "http_body": None,
                        }
                    )
                    continue
                for headers, payload in recs:
                    row = {
                        "path": path,
                        "warc_type": headers.get("warc-type"),
                        "record_id": headers.get("warc-record-id"),
                        "target_uri": headers.get("warc-target-uri"),
                        "warc_date": headers.get("warc-date"),
                        "content_type": headers.get("content-type"),
                        "payload": payload,
                        "http_status": None,
                        "http_content_type": None,
                        "http_body": None,
                    }
                    if headers.get("warc-type") == "response":
                        try:
                            status, hh, body = split_http(payload)
                            row["http_status"] = status
                            row["http_content_type"] = hh.get("content-type")
                            row["http_body"] = body
                        except (ValueError, IndexError) as e:
                            row["warc_type"] = f"error:http:{e}"
                    rows.append(row)
            yield pd.DataFrame(rows)

    return files.select("path", "content").mapInPandas(
        unpack,
        schema=(
            "path string, warc_type string, record_id string, "
            "target_uri string, warc_date string, content_type string, "
            "payload binary, http_status int, http_content_type string, "
            "http_body binary"
        ),
    )
