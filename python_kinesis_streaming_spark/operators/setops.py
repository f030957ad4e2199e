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


@op(
    "edge_empty_inputs",
    oracle="""
        SELECT 'inner_vs_empty' AS check_name,
               (SELECT count(*) FROM orders o
                JOIN (SELECT c_custkey FROM customer WHERE c_custkey < 0) c
                  ON o.o_custkey = c.c_custkey) AS n_rows
        UNION ALL
        SELECT 'left_vs_empty',
               (SELECT count(*) FROM orders o
                LEFT JOIN (SELECT c_custkey, c_acctbal FROM customer
                           WHERE c_custkey < 0) c
                  ON o.o_custkey = c.c_custkey
                WHERE c.c_acctbal IS NULL)
        UNION ALL
        SELECT 'agg_over_empty',
               (SELECT count(*) FROM (
                    SELECT o_orderpriority, sum(o_totalprice)
                    FROM orders WHERE o_orderkey < 0
                    GROUP BY o_orderpriority))
        UNION ALL
        SELECT 'global_agg_over_empty_is_one_row',
               (SELECT count(*) FROM (
                    SELECT count(*) AS c, sum(o_totalprice) AS s
                    FROM orders WHERE o_orderkey < 0))
        UNION ALL
        SELECT 'union_with_empty_preserves',
               (SELECT count(*) FROM (
                    SELECT o_orderkey FROM orders
                    UNION ALL
                    SELECT o_orderkey FROM orders WHERE o_orderkey < 0))
    """,
    scale=(
        "Empty-relation semantics, pinned: inner join vs empty = 0 rows, "
        "left join fills nulls, GROUPED agg over empty = 0 rows but "
        "GLOBAL agg = exactly 1 row (count 0 / sum NULL), union with "
        "empty preserves the other side. These invariants are what "
        "partition-pruned branches and dead filters reduce to at 100 TB — "
        "a plan that collapses a subtree to empty must keep them, and AQE "
        "does exactly that collapse at runtime."
    ),
)
def edge_empty_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five empty-input semantic checks as (check_name, n_rows) rows."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    empty_c = cust.where(F.col("c_custkey") < 0)
    inner = orders.join(
        empty_c.select("c_custkey"), orders["o_custkey"] == empty_c["c_custkey"]
    ).count()
    left = (
        orders.join(
            empty_c.select("c_custkey", "c_acctbal"),
            orders["o_custkey"] == empty_c["c_custkey"],
            "left",
        )
        .where(F.col("c_acctbal").isNull())
        .count()
    )
    grouped = (
        orders.where(F.col("o_orderkey") < 0)
        .groupBy("o_orderpriority")
        .agg(F.sum("o_totalprice"))
        .count()
    )
    global_agg = (
        orders.where(F.col("o_orderkey") < 0)
        .agg(F.count(F.lit(1)).alias("c"), F.sum("o_totalprice").alias("s"))
        .count()
    )
    unioned = (
        orders.select("o_orderkey")
        .unionByName(orders.where(F.col("o_orderkey") < 0).select("o_orderkey"))
        .count()
    )
    rows = [
        ("inner_vs_empty", inner),
        ("left_vs_empty", left),
        ("agg_over_empty", grouped),
        ("global_agg_over_empty_is_one_row", global_agg),
        ("union_with_empty_preserves", unioned),
    ]
    return spark.createDataFrame(rows, "check_name string, n_rows long")


@op(
    "set_ops_all_variants",
    oracle="""
        SELECT 'intersect_all' AS op, count(*) AS n FROM (
            SELECT user_id, event_type FROM events WHERE value > 50.0
            INTERSECT ALL
            SELECT user_id, event_type FROM events WHERE value < 200.0
        )
        UNION ALL
        SELECT 'except_all', count(*) FROM (
            SELECT user_id, event_type FROM events WHERE value > 50.0
            EXCEPT ALL
            SELECT user_id, event_type FROM events WHERE value < 200.0
        )
        UNION ALL
        SELECT 'intersect_distinct', count(*) FROM (
            SELECT user_id, event_type FROM events WHERE value > 50.0
            INTERSECT
            SELECT user_id, event_type FROM events WHERE value < 200.0
        )
        UNION ALL
        SELECT 'except_distinct', count(*) FROM (
            SELECT user_id, event_type FROM events WHERE value > 50.0
            EXCEPT
            SELECT user_id, event_type FROM events WHERE value < 200.0
        )
    """,
    scale=(
        "Bag vs set semantics side by side: INTERSECT/EXCEPT ALL compile "
        "to per-key multiplicity arithmetic (min / truncated difference of "
        "counts) over ONE hash shuffle — same cost shape as the DISTINCT "
        "variants, different answer. The multiplicity-aware forms are what "
        "reconciliation jobs (did every record land exactly as many times "
        "as it left?) need at 100 TB; DISTINCT silently forgives dup "
        "inflation."
    ),
)
def set_ops_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row counts of INTERSECT/EXCEPT in both ALL (bag) and DISTINCT (set)
    semantics over two overlapping event projections."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.where(F.col("value") > 50.0).select("user_id", "event_type")
    b = ev.where(F.col("value") < 200.0).select("user_id", "event_type")
    rows = [
        ("intersect_all", a.intersectAll(b).count()),
        ("except_all", a.exceptAll(b).count()),
        ("intersect_distinct", a.intersect(b).count()),
        ("except_distinct", a.subtract(b).count()),
    ]
    return spark.createDataFrame(rows, "op string, n long")
