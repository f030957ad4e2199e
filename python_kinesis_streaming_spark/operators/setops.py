"""§2.7 Set operations (SURVEY.md).

Operands are (user_id, activity-day) pairs — at user-only granularity every
user appears on both sides in the fixtures and INTERSECT/EXCEPT degenerate
to all/empty.

Scale notes (100 TB): UNION is a zero-shuffle concat (+ hash-agg dedup for
DISTINCT); INTERSECT/EXCEPT compile to aggregate-based plans shuffling on
the full row — at scale, prefer rewriting wide-row set ops as keyed
semi/anti joins (only the key shuffles). Done here: the inputs are already
projected to the key columns before the set op.

Result type note: activity day is emitted as TIMESTAMP (midnight), not DATE —
engine-to-pandas conversion of DATE differs between Spark (datetime.date)
and DuckDB (datetime64), which breaks value hashing. Repo-wide policy: no
DATE-typed result columns; truncate to timestamps on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from python_kinesis_streaming_spark.registry import op
from python_kinesis_streaming_spark.sources.tables import load_table


def _user_days(spark: SparkSession, sf_dir: str, event_type: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.where(F.col("event_type") == event_type)
        .select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
    )


_DAYS = (
    "SELECT DISTINCT user_id,"
    " CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day"
    " FROM events WHERE event_type = '{et}'"
)


@op(
    "set_union",
    oracle=f"{_DAYS.format(et='click')} UNION {_DAYS.format(et='purchase')}",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-days with a click ∪ user-days with a purchase (UNION = dedup)."""
    return (
        _user_days(spark, sf_dir, "click")
        .unionByName(_user_days(spark, sf_dir, "purchase"))
        .distinct()
    )


@op(
    "set_intersect",
    oracle=f"{_DAYS.format(et='click')} INTERSECT {_DAYS.format(et='purchase')}",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-days with both a click and a purchase."""
    return _user_days(spark, sf_dir, "click").intersect(
        _user_days(spark, sf_dir, "purchase")
    )


@op(
    "set_except",
    oracle=f"{_DAYS.format(et='view')} EXCEPT {_DAYS.format(et='purchase')}",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-days with a view but no purchase (EXCEPT DISTINCT)."""
    return _user_days(spark, sf_dir, "view").subtract(
        _user_days(spark, sf_dir, "purchase")
    )
