"""§2.1 Scans / sources / sinks (SURVEY.md).

Scale notes (100 TB):
- All scans are `spark.read.parquet` → DataSource V1/V2 vectorized Parquet
  reader. Filters/projections composed downstream reach the scan
  (PushedFilters / ReadSchema in `.explain("formatted")`) — nothing here
  materializes or widens the scan.
- The partitioned sink writes one directory per partition value; at cluster
  scale the same code with `maxRecordsPerFile` + AQE coalescing controls
  file sizes; `partitionBy` on a low-cardinality column is the correct
  layout for partition-pruned downstream reads.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from python_kinesis_streaming_spark.registry import op
from python_kinesis_streaming_spark.sources.tables import load_table

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".scratch")


@op(
    "scan_parquet",
    oracle="SELECT * FROM orders",
    scale="Plain columnar scan; partition-pruned + pushdown-ready at any SF.",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-fidelity table scan: every column, every row, every type
    (int64, string, double, timestamp[ms]) round-trips the reader."""
    return load_table(spark, sf_dir, "orders")


@op(
    "scan_events_ns_ts",
    oracle="SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM events",
    scale="ns→µs normalization is a codegen'd projection; no shuffle.",
)
def scan_events_ns_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the TIMESTAMP(NANOS) parquet column correctly (SURVEY §7.4 h1):
    legacy nanosAsLong read + integer-truncation to µs, matching the
    oracle's ns→µs TIMESTAMP cast bit-for-bit."""
    return load_table(spark, sf_dir, "events").select("event_id", "ts")


@op(
    "source_json_decode",
    oracle=(
        "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k"
        " FROM events"
    ),
    scale="from_json is codegen'd JVM-side; schema declared, no sampling pass.",
)
def source_json_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kinesis Data-blob decode analogue: JSON payload string → typed column
    via `from_json` with an explicit schema (schema-on-read, §1.1)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.from_json(F.col("props"), "k INT").getField("k").alias("k"),
    )


@op(
    "sink_parquet",
    oracle=(
        "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,"
        " value, props FROM events"
    ),
    scale=(
        "partitionBy(event_type) → one dir per value, enables partition "
        "pruning downstream; at 100 TB add maxRecordsPerFile to bound file "
        "sizes and sortWithinPartitions for row-group locality."
    ),
)
def sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write events partitioned by event_type, read back, prove lossless
    round-trip (timestamps at µs, doubles bit-exact, partition column
    restored)."""
    ev = load_table(spark, sf_dir, "events")
    out = os.path.join(SCRATCH, f"sink_parquet_{uuid.uuid4().hex[:8]}")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    back = spark.read.parquet(out)
    return back.select("event_id", "ts", "user_id", "event_type", "value", "props")
