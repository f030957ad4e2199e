"""KPL record aggregation: wire-format golden vectors, roundtrip laws
(hypothesis), producer buffer bounds, KCL passthrough semantics, and the
full producer→mock→consumer→Spark de-aggregation path."""

from __future__ import annotations

import base64
import hashlib
import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from python_kinesis_streaming_spark.sources.kinesis_consumer import (
    KinesisClient,
    distributed_poll,
    poll_stream,
    poll_to_dataframe,
)
from python_kinesis_streaming_spark.sources.kinesis_mock import (
    MockKinesisServer,
)
from python_kinesis_streaming_spark.sources.kpl import (
    MAGIC,
    KplAggregator,
    deaggregate_dataframe,
    deaggregate_user_records,
    decode_aggregated,
    encode_aggregated,
    is_aggregated,
    put_aggregated,
)

STREAM = "kpl-test"


# ---- wire format -----------------------------------------------------------


def test_golden_wire_vector():
    """Hand-derived encoding of [("pk", b"hello")] — pins the exact public
    byte layout (field tags, varints, md5 trailer), not just self-parity."""
    proto = bytes.fromhex("0a02706b" "1a09" "0800" "1a05" "68656c6c6f")
    expect = MAGIC + proto + hashlib.md5(proto).digest()
    assert encode_aggregated([("pk", b"hello")]) == expect
    assert decode_aggregated(expect) == [
        {"partition_key": "pk", "explicit_hash_key": None, "data": b"hello"}
    ]


def test_roundtrip_with_explicit_hash_keys_and_shared_pk_table():
    recs = [
        ("alpha", "170141183460469231731687303715884105727", b"a"),
        ("beta", None, b"bb"),
        ("alpha", None, b"ccc"),  # pk table must dedup to 2 entries
    ]
    blob = encode_aggregated(recs)
    # the pk table holds exactly 2 field-1 strings (alpha, beta)
    proto = blob[len(MAGIC) : -16]
    assert proto.count(b"\x0a\x05alpha") == 1
    assert proto.count(b"\x0a\x04beta") == 1
    out = decode_aggregated(blob)
    assert [(u["partition_key"], u["data"]) for u in out] == [
        ("alpha", b"a"),
        ("beta", b"bb"),
        ("alpha", b"ccc"),
    ]
    assert out[0]["explicit_hash_key"] == recs[0][1]
    assert out[1]["explicit_hash_key"] is None


def test_payload_may_contain_magic_and_binary():
    recs = [("k", MAGIC + b"\x00\xff" * 10), ("k2", b"")]
    assert [u["data"] for u in decode_aggregated(encode_aggregated(recs))] == [
        MAGIC + b"\x00\xff" * 10,
        b"",
    ]


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(min_size=1, max_size=40),
            st.binary(max_size=200),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_roundtrip_property(recs):
    out = decode_aggregated(encode_aggregated(recs))
    assert [(u["partition_key"], u["data"]) for u in out] == [
        (pk, data) for pk, data in recs
    ]


def test_checksum_tamper_raises_and_passthrough_applies():
    blob = bytearray(encode_aggregated([("p", b"x"), ("q", b"y")]))
    blob[-1] ^= 0xFF  # corrupt the md5 trailer
    with pytest.raises(ValueError, match="md5"):
        decode_aggregated(bytes(blob))
    # KCL semantics: a corrupt aggregate flows through as ONE ordinary record
    rec = {"shard_id": "s", "partition_key": "p", "data": bytes(blob)}
    out = deaggregate_user_records([rec])
    assert out == [{**rec, "subsequence_number": 0}]


def test_is_aggregated_gates():
    assert not is_aggregated(b"plain payload")
    assert not is_aggregated(MAGIC)  # too short to carry proto+md5
    assert is_aggregated(encode_aggregated([("p", b"d")]))


# ---- producer buffer -------------------------------------------------------


def test_aggregator_respects_size_bound_and_order():
    agg = KplAggregator(max_bytes=600)
    blobs = agg.aggregate_all(
        (f"user-{i % 5}", json.dumps({"i": i}).encode()) for i in range(100)
    )
    assert len(blobs) > 1  # the bound actually forced splits
    assert all(len(blob) <= 600 for _, blob in blobs)
    seen = [
        json.loads(u["data"])["i"]
        for _, blob in blobs
        for u in decode_aggregated(blob)
    ]
    assert seen == list(range(100))  # order preserved across flushes
    # carrier pk = first buffered record's pk
    first_carrier, first_blob = blobs[0]
    assert first_carrier == decode_aggregated(first_blob)[0]["partition_key"]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(min_size=1, max_size=12), st.binary(max_size=60)
        ),
        min_size=1,
        max_size=30,
    )
)
def test_incremental_aggregator_is_byte_identical_to_batch_encode(recs):
    """The incremental buffer must emit exactly what a one-shot
    encode_aggregated of the same records would — same table dedup, same
    field order, same bytes (so the md5 matches too)."""
    agg = KplAggregator(max_bytes=1 << 30)  # never split
    blobs = agg.aggregate_all(recs)
    assert len(blobs) == 1
    assert blobs[0][1] == encode_aggregated(recs)
    assert blobs[0][0] == recs[0][0]


def test_aggregator_max_count():
    agg = KplAggregator(max_count=7)
    blobs = agg.aggregate_all((f"k{i}", b"d") for i in range(20))
    sizes = [len(decode_aggregated(b)) for _, b in blobs]
    assert sizes == [7, 7, 6]


# ---- end-to-end through the mock service ----------------------------------


@pytest.fixture()
def mock_stream():
    with MockKinesisServer() as srv:
        client = KinesisClient(srv.endpoint_url)
        client.call("CreateStream", {"StreamName": STREAM, "ShardCount": 3})
        yield srv, client


def _user_records(n, offset=0):
    return [
        (f"user-{(offset + i) % 6}", json.dumps({"event_id": offset + i}).encode())
        for i in range(n)
    ]


def test_put_aggregated_then_deaggregate_matches(mock_stream):
    srv, client = mock_stream
    n_blobs = put_aggregated(client, STREAM, _user_records(300), max_count=40)
    assert n_blobs == 8  # 300/40 rounded up
    wire = poll_stream(client, STREAM)
    assert len(wire) == 8  # the stream carries blobs, not user records
    users = deaggregate_user_records(wire)
    assert sorted(json.loads(u["data"])["event_id"] for u in users) == list(
        range(300)
    )
    # KCL subsequence semantics: 0..k-1 within each carrier sequence number
    by_carrier: dict[tuple, list[int]] = {}
    for u in users:
        by_carrier.setdefault(
            (u["shard_id"], u["sequence_number"]), []
        ).append(u["subsequence_number"])
    assert all(subs == list(range(len(subs))) for subs in by_carrier.values())
    # sub-records expose their OWN partition keys from the key table
    assert {u["partition_key"] for u in users} == {f"user-{i}" for i in range(6)}


def test_mixed_aggregated_and_plain_stream(mock_stream):
    srv, client = mock_stream
    put_aggregated(client, STREAM, _user_records(50), max_count=25)
    client.call(
        "PutRecord",
        {
            "StreamName": STREAM,
            "PartitionKey": "plain",
            "Data": base64.b64encode(
                json.dumps({"event_id": 50}).encode()
            ).decode(),
        },
    )
    users = deaggregate_user_records(poll_stream(client, STREAM))
    ids = sorted(json.loads(u["data"])["event_id"] for u in users)
    assert ids == list(range(51))
    plain = [u for u in users if u["partition_key"] == "plain"]
    assert len(plain) == 1 and plain[0]["subsequence_number"] == 0


def test_checkpoint_resume_is_blob_granular(mock_stream, tmp_path):
    """At-least-once granularity is the carrier record: a resumed consumer
    never re-reads a checkpointed blob and never misses a new one."""
    srv, client = mock_stream
    cp = str(tmp_path / "cp")
    put_aggregated(client, STREAM, _user_records(100), max_count=10)
    first = deaggregate_user_records(
        poll_stream(client, STREAM, checkpoint_dir=cp)
    )
    assert len(first) == 100
    put_aggregated(client, STREAM, _user_records(30, offset=100), max_count=10)
    second = deaggregate_user_records(
        poll_stream(KinesisClient(srv.endpoint_url), STREAM, checkpoint_dir=cp)
    )
    assert sorted(json.loads(u["data"])["event_id"] for u in second) == list(
        range(100, 130)
    )


# ---- Spark bridges ---------------------------------------------------------


def test_deaggregate_dataframe_over_distributed_poll(mock_stream, spark):
    from pyspark.sql import functions as F

    srv, client = mock_stream
    put_aggregated(client, STREAM, _user_records(240), max_count=16)
    carriers = distributed_poll(spark, srv.endpoint_url, STREAM)
    users = deaggregate_dataframe(carriers)
    assert users.count() == 240
    assert dict(users.dtypes)["subsequence_number"] == "bigint"
    ids = sorted(
        r["event_id"]
        for r in users.select(
            F.from_json(F.col("data").cast("string"), "event_id long").alias("p")
        )
        .select("p.event_id")
        .collect()
    )
    assert ids == list(range(240))
    # carrier identity survives: (shard, seq, subseq) is a unique key
    assert (
        users.select("shard_id", "sequence_number", "subsequence_number")
        .distinct()
        .count()
        == 240
    )
    # sub-record pks were swapped in from the key table
    assert users.where(~F.col("partition_key").startswith("user-")).count() == 0


def test_deaggregate_dataframe_passthrough_rows(mock_stream, spark):
    from pyspark.sql import functions as F

    srv, client = mock_stream
    client.call(
        "PutRecord",
        {
            "StreamName": STREAM,
            "PartitionKey": "plain",
            "Data": base64.b64encode(b"raw-bytes").decode(),
        },
    )
    put_aggregated(client, STREAM, _user_records(9), max_count=9)
    users = deaggregate_dataframe(
        poll_to_dataframe(spark, srv.endpoint_url, STREAM)
    )
    rows = users.collect()
    assert len(rows) == 10
    plain = [r for r in rows if r["partition_key"] == "plain"]
    assert len(plain) == 1
    assert bytes(plain[0]["data"]) == b"raw-bytes"
    assert plain[0]["subsequence_number"] == 0
    assert users.where(F.col("subsequence_number") >= 9).count() == 0


def test_deaggregate_composes_with_streaming_source(
    mock_stream, spark, tmp_path
):
    """readStream over the Kinesis protocol -> executor-side de-aggregation
    -> memory sink: the KPL layer is schema-transparent to streaming."""
    from python_kinesis_streaming_spark.sources.kinesis_stream_source import (
        read_kinesis_stream,
    )

    srv, client = mock_stream
    put_aggregated(client, STREAM, _user_records(60), max_count=12)
    stream = deaggregate_dataframe(
        read_kinesis_stream(spark, srv.endpoint_url, STREAM)
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("kpl_mem")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.table("kpl_mem").collect()
    finally:
        q.stop()
    assert sorted(json.loads(bytes(r["data"]))["event_id"] for r in got) == list(
        range(60)
    )
