"""Kinesis streaming source facade (SURVEY §1.1 mapping).

The engine's streaming operators are source-agnostic: they take a streaming
DataFrame with an event-time column. In production that stream comes from a
Kinesis connector; in this container (no network, no connector jar) it comes
from the chunked replay source. This module is the seam:

- ``read_kinesis``        — real connector wiring (public AWS-Labs /
                            spark-sql-kinesis option surface), raising a
                            clear error when the connector isn't on the
                            classpath.
- ``kinesis_record_schema`` — the public Kinesis record shape.
- ``decode_json_records``   — Data-blob → typed columns (the reference
                            genre's ``json.loads(record['Data'])`` step) as
                            declarative ``from_json``.
- ``read_events_stream``    — connector if configured, else local replay;
                            what tests and ops use.

Structured Streaming over the protocol (no jar needed): ``sources/
kinesis_stream_source.py`` registers a Spark 4 Python DataSource whose
per-shard sequence-number offsets live in the streaming checkpoint WAL —
``spark.readStream.format("pkss_kinesis")`` with exactly-once restart
semantics, tested incl. stop/put/restart into a parquet sink.

The protocol itself is implemented and integration-tested in-sandbox:
``sources/kinesis_consumer.py`` is the pure-stdlib poll–decode–checkpoint
loop (the reference genre) with driver-side and one-task-per-shard Spark
bridges, exercised end-to-end against ``sources/kinesis_mock.py`` — a
loopback service speaking the public AWS JSON 1.1 wire protocol (verified
interoperable with the real AWS SDK: boto3 pointed at the mock
round-trips; tests/test_kinesis_protocol.py). Only SigV4+TLS against
actual AWS endpoints remains unexercised here.

Scale notes (100 TB / high-throughput streams):
- One input partition per shard; resharding is handled by connector shard
  discovery — downstream operators only see more/fewer partitions.
- Sequence-number checkpointing rides Structured Streaming's offset WAL
  (``checkpointLocation``) — the KCL lease-table analogue, exactly-once
  into transactional sinks.
- Decode stays JVM-side (``from_json``): no Python in the ingest path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: The public Kinesis record shape (PartitionKey, SequenceNumber,
#: ApproximateArrivalTimestamp, Data) as exposed by Spark Kinesis connectors.
def kinesis_record_schema() -> StructType:
    return StructType(
        [
            StructField("partitionKey", StringType()),
            StructField("sequenceNumber", StringType()),
            StructField("approximateArrivalTimestamp", TimestampType()),
            StructField("data", BinaryType()),
        ]
    )


def read_kinesis(
    spark: SparkSession,
    stream_name: str,
    region: str,
    starting_position: str = "TRIM_HORIZON",
    endpoint_url: str | None = None,
) -> DataFrame:
    """Streaming DataFrame over a Kinesis stream via the connector.

    Uses the ``aws-kinesis`` DSv2 format (spark-streaming-sql-kinesis
    connector); options follow its public documentation. Raises a
    RuntimeError with remediation if the connector jar isn't deployed —
    this container has no network, so only the replay path is testable
    here (read_events_stream).
    """
    reader = (
        spark.readStream.format("aws-kinesis")
        .option("kinesis.streamName", stream_name)
        .option("kinesis.region", region)
        .option("kinesis.consumerType", "GetRecords")
        .option("kinesis.startingposition", starting_position)
    )
    if endpoint_url:
        reader = reader.option("kinesis.endpointUrl", endpoint_url)
    try:
        return reader.load()
    except Exception as e:  # connector jar absent
        raise RuntimeError(
            "Kinesis connector not available on the classpath; deploy the "
            "spark-streaming-sql-kinesis connector jar (--packages) or use "
            "read_events_stream() for the local replay source."
        ) from e


def decode_json_records(records: DataFrame, payload_schema: str) -> DataFrame:
    """Kinesis Data-blob decode: binary ``data`` → typed columns.

    The declarative twin of the reference genre's per-record
    ``json.loads``: casts the payload to string and applies ``from_json``
    with an explicit schema — JVM-side, codegen, no sampling pass.
    """
    return records.select(
        "partitionKey",
        "sequenceNumber",
        "approximateArrivalTimestamp",
        F.from_json(F.col("data").cast("string"), payload_schema).alias("payload"),
    ).select("partitionKey", "sequenceNumber", "approximateArrivalTimestamp", "payload.*")


def read_events_stream(
    spark: SparkSession,
    sf_dir: str,
    stream_name: str | None = None,
    region: str | None = None,
) -> DataFrame:
    """The seam ops/tests use: Kinesis when configured, replay otherwise."""
    if stream_name and region:
        return read_kinesis(spark, stream_name, region)
    from python_kinesis_streaming_spark.streaming.replay import replay_stream

    return replay_stream(spark, sf_dir)
