"""WARC reader tests (llm/warc.py).

Independence strategy: the parser is exercised against HAND-WRITTEN
byte-literal records (framing worked from the ISO 28500 spec text, not
produced by ``build_warc``), against ``build_warc``'s per-record-gzip
output (the Common Crawl layout), and against malformed framing. The
Spark seam test checks record rows and HTTP splitting end-to-end plus
the quarantine path.
"""

from __future__ import annotations

import gzip

import pytest

from python_kinesis_streaming_spark.llm.warc import (
    build_warc,
    parse_warc,
    read_warc,
    split_http_response,
)

# A spec-shaped record written out by hand, byte for byte.
HAND_RECORD = (
    b"WARC/1.0\r\n"
    b"WARC-Type: resource\r\n"
    b"WARC-Record-ID: <urn:uuid:abc>\r\n"
    b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
    b"Content-Length: 11\r\n"
    b"\r\n"
    b"hello world"
    b"\r\n\r\n"
)

HTTP_PAYLOAD = (
    b"HTTP/1.1 200 OK\r\n"
    b"Content-Type: text/html; charset=utf-8\r\n"
    b"Server: x\r\n"
    b"\r\n"
    b"<html><body>doc body</body></html>"
)


def test_parse_hand_written_record():
    recs = list(parse_warc(HAND_RECORD))
    assert len(recs) == 1
    headers, payload = recs[0]
    assert headers["warc-version"] == "WARC/1.0"
    assert headers["warc-type"] == "resource"
    assert payload == b"hello world"


def test_parse_concatenated_records_plain_and_gzip():
    two = HAND_RECORD + HAND_RECORD
    assert len(list(parse_warc(two))) == 2
    # Common Crawl layout: one gzip member per record, concatenated.
    gzipped = gzip.compress(HAND_RECORD) + gzip.compress(HAND_RECORD)
    assert len(list(parse_warc(gzipped))) == 2


def test_parse_rejects_malformed_framing():
    with pytest.raises(ValueError, match="version"):
        list(parse_warc(b"NOT-WARC/1.0\r\nContent-Length: 0\r\n\r\n"))
    with pytest.raises(ValueError, match="Content-Length"):
        list(parse_warc(b"WARC/1.0\r\nWARC-Type: resource\r\n\r\n"))
    truncated = HAND_RECORD[:-15]  # cuts into the payload
    with pytest.raises(ValueError, match="truncated"):
        list(parse_warc(truncated))


def test_split_http_response():
    status, headers, body = split_http_response(HTTP_PAYLOAD)
    assert status == 200
    assert headers["content-type"] == "text/html; charset=utf-8"
    assert body == b"<html><body>doc body</body></html>"
    with pytest.raises(ValueError):
        split_http_response(b"no separator here")


def test_build_then_parse_roundtrip():
    records = [
        {
            "type": "warcinfo",
            "uri": None,
            "date": "2024-01-01T00:00:00Z",
            "payload": b"software: test\r\n",
            "content_type": "application/warc-fields",
        },
        {
            "type": "response",
            "uri": "https://example.org/a",
            "date": "2024-01-01T00:00:01Z",
            "payload": HTTP_PAYLOAD,
            "content_type": "application/http; msgtype=response",
        },
    ]
    for gz in (False, True):
        parsed = list(parse_warc(build_warc(records, gzip_per_record=gz)))
        assert [h["warc-type"] for h, _ in parsed] == ["warcinfo", "response"]
        assert parsed[1][1] == HTTP_PAYLOAD
        assert parsed[1][0]["warc-target-uri"] == "https://example.org/a"


def test_read_warc_spark_seam(spark, tmp_path):
    records = [
        {
            "type": "response",
            "uri": f"https://example.org/page{i}",
            "date": f"2024-01-01T00:00:{i:02d}Z",
            "payload": (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + f"<html>body {i}</html>".encode()
            ),
            "content_type": "application/http; msgtype=response",
        }
        for i in range(6)
    ] + [
        {
            "type": "request",
            "uri": "https://example.org/page0",
            "date": "2024-01-01T00:00:00Z",
            "payload": b"GET /page0 HTTP/1.1\r\nHost: example.org\r\n\r\n",
            "content_type": "application/http; msgtype=request",
        }
    ]
    (tmp_path / "crawl-00000.warc.gz").write_bytes(
        build_warc(records[:4], gzip_per_record=True)
    )
    (tmp_path / "crawl-00001.warc.gz").write_bytes(
        build_warc(records[4:], gzip_per_record=True)
    )
    (tmp_path / "crawl-00002.warc.gz").write_bytes(b"\x1f\x8bgarbage")

    out = read_warc(spark, str(tmp_path / "crawl-*.warc.gz")).collect()
    by_uri = {}
    errors = []
    for r in out:
        if r["warc_type"] and r["warc_type"].startswith("error:"):
            errors.append(r)
        else:
            by_uri.setdefault(r["target_uri"], []).append(r)

    # 6 responses + 1 request parsed; the garbage file quarantined
    assert sum(len(v) for v in by_uri.values()) == 7
    assert len(errors) == 1 and errors[0]["path"].endswith("crawl-00002.warc.gz")
    resp0 = [
        r for r in by_uri["https://example.org/page0"] if r["warc_type"] == "response"
    ][0]
    assert resp0["http_status"] == 200
    assert resp0["http_content_type"] == "text/html"
    assert bytes(resp0["http_body"]) == b"<html>body 0</html>"
    req0 = [
        r for r in by_uri["https://example.org/page0"] if r["warc_type"] == "request"
    ][0]
    assert req0["http_status"] is None  # only responses get the HTTP split
