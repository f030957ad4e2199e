"""Producer sink: DataFrame → PutRecords with chunking, partial-failure
retry, KPL aggregation, and the foreachBatch streaming path — verified by
reading everything back through the consumer stack."""

from __future__ import annotations

import json

import pytest

from python_kinesis_streaming_spark.sources.kinesis_consumer import (
    KinesisApiError,
    KinesisClient,
    poll_stream,
    poll_to_dataframe,
)
from python_kinesis_streaming_spark.sources.kinesis_mock import (
    MockKinesisServer,
)
from python_kinesis_streaming_spark.sources.kinesis_sink import (
    foreach_batch_writer,
    write_batch_to_kinesis,
)
from python_kinesis_streaming_spark.sources.kpl import (
    deaggregate_user_records,
)

STREAM = "sink-test"


@pytest.fixture()
def mock_stream():
    with MockKinesisServer() as srv:
        client = KinesisClient(srv.endpoint_url)
        client.call("CreateStream", {"StreamName": STREAM, "ShardCount": 3})
        yield srv, client


def _source_df(spark, n, partitions=4):
    from pyspark.sql import functions as F

    return (
        spark.range(n)
        .repartition(partitions)
        .select(
            F.concat(F.lit("user-"), (F.col("id") % 9).cast("string")).alias(
                "partition_key"
            ),
            F.to_json(F.struct(F.col("id").alias("event_id"))).cast(
                "binary"
            ).alias("data"),
        )
    )


def _read_back_ids(client):
    return sorted(
        json.loads(r["data"])["event_id"] for r in poll_stream(client, STREAM)
    )


def test_batch_write_roundtrip_and_chunking(mock_stream, spark):
    srv, client = mock_stream
    stats = write_batch_to_kinesis(
        _source_df(spark, 1200, partitions=2), srv.endpoint_url, STREAM
    )
    assert stats["records_sent"] == stats["wire_records"] == 1200
    assert stats["partitions"] == 2
    # 1200 records over 2 partitions at <=500/call => at least 4 calls
    assert stats["api_calls"] >= 4
    assert stats["retried_entries"] == 0
    assert _read_back_ids(client) == list(range(1200))


def test_partial_failure_retry_delivers_every_record(spark):
    with MockKinesisServer(put_fail_every=7) as srv:
        client = KinesisClient(srv.endpoint_url)
        client.call("CreateStream", {"StreamName": STREAM, "ShardCount": 3})
        stats = write_batch_to_kinesis(
            _source_df(spark, 400), srv.endpoint_url, STREAM
        )
        assert stats["retried_entries"] > 0  # the fault actually fired
        # every record landed exactly once despite per-entry rejections
        assert _read_back_ids(client) == list(range(400))


def test_aggregate_write_collapses_wire_records(mock_stream, spark):
    srv, client = mock_stream
    stats = write_batch_to_kinesis(
        _source_df(spark, 500, partitions=2),
        srv.endpoint_url,
        STREAM,
        aggregate=True,
        aggregate_max_bytes=2048,
    )
    assert stats["records_sent"] == 500
    assert stats["wire_records"] < 100  # KPL packing actually engaged
    wire = poll_stream(client, STREAM)
    assert len(wire) == stats["wire_records"]
    users = deaggregate_user_records(wire)
    assert sorted(json.loads(u["data"])["event_id"] for u in users) == list(
        range(500)
    )
    # user-record partition keys survive aggregation via the key table
    assert {u["partition_key"] for u in users} == {
        f"user-{i}" for i in range(9)
    }


def test_mock_enforces_put_records_entry_limit(mock_stream):
    srv, client = mock_stream
    with pytest.raises(KinesisApiError) as ei:
        client.call(
            "PutRecords",
            {
                "StreamName": STREAM,
                "Records": [
                    {"PartitionKey": "k", "Data": "aGk="} for _ in range(501)
                ],
            },
        )
    assert ei.value.type == "ValidationException"


def test_oversized_record_is_rejected_client_side(mock_stream, spark):
    from pyspark.sql import functions as F

    srv, client = mock_stream
    big = spark.range(1).select(
        F.lit("k").alias("partition_key"),
        F.lit(b"x" * (1024 * 1024 + 1)).alias("data"),
    )
    with pytest.raises(Exception, match="1 MiB"):
        write_batch_to_kinesis(big, srv.endpoint_url, STREAM)


def test_foreach_batch_streaming_sink(mock_stream, spark, tmp_path):
    """File stream → foreachBatch Kinesis sink → consumer: the full
    write-side streaming path, availableNow-terminated."""
    srv, client = mock_stream
    src = str(tmp_path / "src")
    _source_df(spark, 80, partitions=2).write.parquet(src)
    stream_df = (
        spark.readStream.schema("partition_key string, data binary")
        .parquet(src)
    )
    q = (
        stream_df.writeStream.foreachBatch(
            foreach_batch_writer(srv.endpoint_url, STREAM)
        )
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _read_back_ids(client) == list(range(80))


def test_sink_to_source_loop_with_aggregation(mock_stream, spark):
    """Write aggregated via the sink, read back via the consumer bridge and
    executor-side de-aggregation — the two halves of the stack agree."""
    from pyspark.sql import functions as F

    from python_kinesis_streaming_spark.sources.kpl import (
        deaggregate_dataframe,
    )

    srv, client = mock_stream
    write_batch_to_kinesis(
        _source_df(spark, 300),
        srv.endpoint_url,
        STREAM,
        aggregate=True,
        aggregate_max_bytes=4096,
    )
    users = deaggregate_dataframe(
        poll_to_dataframe(spark, srv.endpoint_url, STREAM)
    )
    ids = sorted(
        r["event_id"]
        for r in users.select(
            F.from_json(
                F.col("data").cast("string"), "event_id long"
            ).alias("p")
        )
        .select("p.event_id")
        .collect()
    )
    assert ids == list(range(300))


def test_full_stack_gif_payloads_aggregated_through_kinesis(
    mock_stream, spark
):
    """All the round-6 surfaces composed: real GIF payloads, KPL-packed by
    the producer sink, consumed by the distributed poll, de-aggregated
    executor-side, decoded by the real codec — features come out exact."""
    import numpy as np

    from python_kinesis_streaming_spark.llm.media_codecs import (
        encode_gif,
        media_features_frame,
    )
    from python_kinesis_streaming_spark.sources.kinesis_consumer import (
        distributed_poll,
    )
    from python_kinesis_streaming_spark.sources.kpl import (
        deaggregate_dataframe,
    )

    srv, client = mock_stream
    rng = np.random.default_rng(5)
    palette = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    payloads = {
        i: encode_gif(
            [
                palette[rng.integers(0, 2, size=(4 + i, 6))]
                for _ in range(1 + i % 3)
            ]
        )
        for i in range(24)
    }
    df = spark.createDataFrame(
        [(str(i), bytearray(b)) for i, b in payloads.items()],
        "partition_key string, data binary",
    )
    write_batch_to_kinesis(
        df, srv.endpoint_url, STREAM, aggregate=True, aggregate_max_bytes=4096
    )
    users = deaggregate_dataframe(
        distributed_poll(spark, srv.endpoint_url, STREAM)
    )
    from pyspark.sql import functions as F

    typed = users.select(
        F.col("partition_key").cast("long").alias("doc_id"),
        F.lit("gif").alias("fmt"),
        F.col("data").alias("payload"),
    )
    feats = {
        r["id"]: r
        for r in media_features_frame(
            typed, "doc_id", "fmt", "payload"
        ).collect()
    }
    assert len(feats) == 24
    for i in range(24):
        assert (feats[i]["height"], feats[i]["width"]) == (4 + i, 6)
        assert feats[i]["n_frames"] == 1 + i % 3
