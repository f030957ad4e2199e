"""KPL record aggregation — the public Kinesis aggregated-record format.

Producers in the Kinesis ecosystem batch many small user records into one
Kinesis record to amortize the per-record PutRecords cost; consumers
(the KCL and every connector) transparently de-aggregate. The wire format
is public, documented in amazon-kinesis-producer's ``aggregation-format``
spec and implemented by awslabs/kinesis-aggregation:

    0xF3 0x89 0x9A 0xC2 | protobuf(AggregatedRecord) | md5(protobuf)

with the protobuf schema::

    message AggregatedRecord {
      repeated string partition_key_table     = 1;
      repeated string explicit_hash_key_table = 2;
      repeated Record records                 = 3;
    }
    message Record {
      required uint64 partition_key_index     = 1;
      optional uint64 explicit_hash_key_index = 2;
      required bytes  data                    = 3;
    }

Only protobuf wire types 0 (varint) and 2 (length-delimited) appear, so
this module hand-rolls the codec in ~60 lines of stdlib — the protobuf
package is not in the container, and depending on it for two wire types
would be the heavier choice anyway.

Scale note: de-aggregation is a per-record, stateless byte transform —
it belongs on the executors (``deaggregate_dataframe`` runs it inside
the same mapInPandas pass that polled the shard), never on the driver.
At 100 TB the aggregated form is what keeps shard count (and cost)
sane: 500 user records/blob ⇒ 500× fewer PutRecords calls and near-1MiB
payloads, the KPL's whole reason to exist.

The md5 trailer is the format's integrity checksum (not a security
boundary); a record whose magic/checksum/protobuf does not validate is,
per KCL behavior, passed through as a single ordinary user record.
"""

from __future__ import annotations

import hashlib

#: The 4-byte magic prefix every KPL-aggregated record starts with.
MAGIC = b"\xf3\x89\x9a\xc2"

#: KPL's default ceiling for one aggregated payload (the PutRecord data
#: limit is 1 MiB; the carrier partition key rides outside the blob).
MAX_AGGREGATED_BYTES = 1 << 20


# --------------------------------------------------------------------------
# protobuf wire codec (varint + length-delimited only)


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        b = buf[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7


def _field_varint(field: int, value: int) -> bytes:
    return _varint(field << 3) + _varint(value)


def _field_bytes(field: int, payload: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over one message's bytes."""
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        field, wire = tag >> 3, tag & 0x07
        if wire == 0:
            value, i = _read_varint(buf, i)
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            value = buf[i : i + ln]
            if len(value) != ln:
                raise ValueError("truncated length-delimited field")
            i += ln
        else:  # wire types 1/5 (fixed64/32) never appear in this schema
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, value


# --------------------------------------------------------------------------
# encode / decode


def encode_aggregated(user_records) -> bytes:
    """Pack ``(partition_key, data)`` or ``(partition_key, explicit_hash_key,
    data)`` tuples into one KPL aggregated record (magic + proto + md5).

    Key tables are deduplicated in first-use order, exactly as the KPL
    builds them; records keep their input order.
    """
    pk_table: dict[str, int] = {}
    ehk_table: dict[str, int] = {}
    body = bytearray()
    records = bytearray()
    for rec in user_records:
        if len(rec) == 2:
            pk, data = rec
            ehk = None
        else:
            pk, ehk, data = rec
        if pk not in pk_table:
            pk_table[pk] = len(pk_table)
        msg = bytearray(_field_varint(1, pk_table[pk]))
        if ehk is not None:
            if ehk not in ehk_table:
                ehk_table[ehk] = len(ehk_table)
            msg += _field_varint(2, ehk_table[ehk])
        msg += _field_bytes(3, bytes(data))
        records += _field_bytes(3, bytes(msg))
    for pk in pk_table:
        body += _field_bytes(1, pk.encode("utf-8"))
    for ehk in ehk_table:
        body += _field_bytes(2, ehk.encode("utf-8"))
    body += records
    proto = bytes(body)
    return MAGIC + proto + hashlib.md5(proto).digest()


def is_aggregated(blob: bytes) -> bool:
    """Cheap prefix test (the KCL's first gate before attempting a parse)."""
    return len(blob) >= len(MAGIC) + 16 and blob[: len(MAGIC)] == MAGIC


def decode_aggregated(blob: bytes) -> list[dict]:
    """Unpack one aggregated record into its user records.

    Returns ``[{"partition_key", "explicit_hash_key", "data"}, ...]``.
    Raises ``ValueError`` on bad magic, md5 mismatch, or malformed
    protobuf — callers that want KCL passthrough semantics catch it
    (``deaggregate_user_records`` does).
    """
    if blob[: len(MAGIC)] != MAGIC:
        raise ValueError("not a KPL aggregated record (bad magic)")
    proto, digest = blob[len(MAGIC) : -16], blob[-16:]
    if hashlib.md5(proto).digest() != digest:
        raise ValueError("aggregated record md5 mismatch")
    pk_table: list[str] = []
    ehk_table: list[str] = []
    raw_records: list[bytes] = []
    for field, wire, value in _iter_fields(proto):
        if field == 1 and wire == 2:
            pk_table.append(value.decode("utf-8"))
        elif field == 2 and wire == 2:
            ehk_table.append(value.decode("utf-8"))
        elif field == 3 and wire == 2:
            raw_records.append(value)
    out: list[dict] = []
    for raw in raw_records:
        pk_idx = ehk_idx = None
        data = b""
        for field, wire, value in _iter_fields(raw):
            if field == 1 and wire == 0:
                pk_idx = value
            elif field == 2 and wire == 0:
                ehk_idx = value
            elif field == 3 and wire == 2:
                data = bytes(value)
        if pk_idx is None or pk_idx >= len(pk_table):
            raise ValueError("record references missing partition key")
        out.append(
            {
                "partition_key": pk_table[pk_idx],
                "explicit_hash_key": (
                    ehk_table[ehk_idx]
                    if ehk_idx is not None and ehk_idx < len(ehk_table)
                    else None
                ),
                "data": data,
            }
        )
    return out


# --------------------------------------------------------------------------
# producer side


class KplAggregator:
    """Size-bounded producer-side aggregation buffer (the KPL's core loop).

    ``add`` returns a finished blob whenever admitting the next record
    would push the encoded aggregate past ``max_bytes`` (or ``max_count``
    records); ``flush`` drains the remainder. The carrier partition key
    for each emitted blob is the first buffered record's key, matching
    KPL behavior (the carrier key only routes the blob to a shard — the
    per-user-record keys live in the key table).

    Encoding is incremental: the key-table and record sections are built
    as the records arrive, so an add is O(record size) and a flush is a
    concatenation — never a re-encode of the whole buffer (which would
    make a b-byte blob cost O(b²/record) to fill).
    """

    def __init__(
        self,
        max_bytes: int = MAX_AGGREGATED_BYTES,
        max_count: int | None = None,
    ):
        self.max_bytes = max_bytes
        self.max_count = max_count
        self._reset()

    def _reset(self) -> None:
        self._pk_table: dict[str, int] = {}
        self._table_bytes = bytearray()
        self._record_bytes = bytearray()
        self._count = 0
        self._carrier: str | None = None

    #: magic prefix + md5 trailer around the protobuf body.
    _FRAME_OVERHEAD = len(MAGIC) + 16

    def add(self, partition_key: str, data: bytes) -> tuple[str, bytes] | None:
        """Buffer one user record; returns ``(carrier_pk, blob)`` if the
        buffer flushed to admit it, else ``None``."""

        def encode_parts(pk_idx: int, new_pk: bool):
            msg = _field_varint(1, pk_idx) + _field_bytes(3, bytes(data))
            rec = _field_bytes(3, msg)
            table = (
                _field_bytes(1, partition_key.encode("utf-8"))
                if new_pk
                else b""
            )
            return rec, table

        new_pk = partition_key not in self._pk_table
        rec, table = encode_parts(
            self._pk_table.get(partition_key, len(self._pk_table)), new_pk
        )
        projected = (
            self._FRAME_OVERHEAD
            + len(self._table_bytes)
            + len(table)
            + len(self._record_bytes)
            + len(rec)
        )
        flushed = None
        if self._count and (
            (self.max_count and self._count >= self.max_count)
            or projected > self.max_bytes
        ):
            flushed = self.flush()
            rec, table = encode_parts(0, True)  # fresh buffer: index 0
        if partition_key not in self._pk_table:
            self._pk_table[partition_key] = len(self._pk_table)
            self._table_bytes += table
        self._record_bytes += rec
        self._count += 1
        if self._carrier is None:
            self._carrier = partition_key
        return flushed

    def flush(self) -> tuple[str, bytes] | None:
        """Emit the buffered records as one blob (``None`` if empty)."""
        if not self._count:
            return None
        proto = bytes(self._table_bytes + self._record_bytes)
        carrier = self._carrier
        self._reset()
        return carrier, MAGIC + proto + hashlib.md5(proto).digest()

    def aggregate_all(self, user_records) -> list[tuple[str, bytes]]:
        """Convenience: stream ``(pk, data)`` pairs through the buffer and
        return every emitted ``(carrier_pk, blob)`` including the tail."""
        out = []
        for pk, data in user_records:
            emitted = self.add(pk, data)
            if emitted:
                out.append(emitted)
        tail = self.flush()
        if tail:
            out.append(tail)
        return out


def put_aggregated(
    client,
    stream: str,
    user_records,
    max_bytes: int = MAX_AGGREGATED_BYTES,
    max_count: int | None = None,
) -> int:
    """Producer path: aggregate ``(pk, data)`` pairs and PutRecords the
    blobs (one wire record per blob). Returns the number of blobs sent.

    ``client`` is a ``kinesis_consumer.KinesisClient`` (or anything with
    its ``call`` method — boto3's client works via the shim in tests).
    """
    import base64

    blobs = KplAggregator(max_bytes, max_count).aggregate_all(user_records)
    for i in range(0, len(blobs), 500):  # PutRecords wire limit
        client.call(
            "PutRecords",
            {
                "StreamName": stream,
                "Records": [
                    {
                        "PartitionKey": pk,
                        "Data": base64.b64encode(blob).decode(),
                    }
                    for pk, blob in blobs[i : i + 500]
                ],
            },
        )
    return len(blobs)


# --------------------------------------------------------------------------
# consumer side


def deaggregate_user_records(records: list[dict]) -> list[dict]:
    """Expand polled record dicts (``kinesis_consumer.poll_*`` shape) into
    user records with KCL subsequence semantics.

    Every output row keeps the carrier's ``shard_id`` / ``sequence_number``
    / ``approximate_arrival`` and gains ``subsequence_number`` (0..k-1
    within a blob; 0 for ordinary records). Records that fail magic,
    checksum, or parse are passed through unchanged — KCL behavior.
    """
    out: list[dict] = []
    for r in records:
        data = r["data"]
        subs = None
        if is_aggregated(data):
            try:
                subs = decode_aggregated(data)
            except ValueError:
                subs = None
        if subs is None:
            out.append({**r, "subsequence_number": 0})
            continue
        for i, u in enumerate(subs):
            out.append(
                {
                    **r,
                    "partition_key": u["partition_key"],
                    "data": u["data"],
                    "subsequence_number": i,
                }
            )
    return out


def deaggregate_dataframe(df):
    """Executor-side de-aggregation of any DataFrame carrying Kinesis
    records: expands ``data`` blobs into one row per user record, adds
    ``subsequence_number bigint``, rewrites ``partition_key`` (when the
    column exists) to the sub-record's own key, and preserves every other
    column from the carrier row.

    Works on both batch bridges (``poll_to_dataframe`` /
    ``distributed_poll``, timestamp arrival) and the streaming source
    (double arrival) because the schema passes through untouched apart
    from the appended column. The transform is stateless per-row, so it
    pipelines inside the same task that polled the shard — no extra
    shuffle, no driver involvement (100 TB shape).
    """
    from pyspark import cloudpickle

    import python_kinesis_streaming_spark.sources.kpl as _kpl

    cloudpickle.register_pickle_by_value(_kpl)

    cols = df.columns
    if "data" not in cols:
        raise ValueError("deaggregate_dataframe needs a `data` binary column")
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", subsequence_number bigint"
    has_pk = "partition_key" in cols

    def expand(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                data = rec["data"]
                subs = None
                if _kpl.is_aggregated(data):
                    try:
                        subs = _kpl.decode_aggregated(data)
                    except ValueError:
                        subs = None
                if subs is None:
                    rows.append({**rec, "subsequence_number": 0})
                    continue
                for i, u in enumerate(subs):
                    row = {**rec, "data": u["data"], "subsequence_number": i}
                    if has_pk:
                        row["partition_key"] = u["partition_key"]
                    rows.append(row)
            if rows:
                yield pd.DataFrame(rows)

    return df.mapInPandas(expand, schema=out_schema)
