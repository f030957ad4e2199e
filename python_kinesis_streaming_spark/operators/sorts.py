"""§2.6 Sorts / limits / top-k (SURVEY.md).

Scale notes (100 TB):
- Global sort = range-partitioned sample + per-partition sort (no single
  reducer). Top-k (`orderBy().limit(k)`) compiles to TakeOrderedAndProject:
  per-partition k-heaps merged at the driver — O(k) driver memory, the only
  correct global-top-k at scale.
- limit+offset requires a total order to be meaningful; keys here are
  unique so pagination is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from python_kinesis_streaming_spark.functions.rounding import rnd, sql_rnd
from python_kinesis_streaming_spark.registry import op
from python_kinesis_streaming_spark.sources.tables import load_table


@op(
    "sort_multi",
    oracle="""
        SELECT o_orderkey, o_orderdate, o_totalprice
        FROM orders
        ORDER BY o_orderdate ASC, o_totalprice DESC, o_orderkey
    """,
    scale="Range-partitioned multi-key sort; no single-reducer bottleneck.",
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with mixed asc/desc directions."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.orderBy(
        F.asc("o_orderdate"), F.desc("o_totalprice"), F.asc("o_orderkey")
    ).select("o_orderkey", "o_orderdate", "o_totalprice")


@op(
    "topk_global",
    oracle=f"""
        SELECT o_orderkey, o_orderdate,
               {sql_rnd("sum(l_extendedprice * (1 - l_discount))")} AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate  > TIMESTAMP '1998-01-01'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    scale=(
        "TPC-H Q3 shape → TakeOrderedAndProject after the agg: per-partition "
        "top-10 heaps, driver merges 10×partitions rows. Deterministic "
        "tie-break (o_orderkey) on the ROUNDED sort key so both engines "
        "select the same set."
    ),
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 revenue orders (TPC-H Q3 shape: join + agg + global top-k)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        customer.where(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("o_orderkey", "o_orderdate")
        .agg(rnd(F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@op(
    "limit_offset",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_orderkey
        LIMIT 100 OFFSET 200
    """,
    scale="Pagination over a unique total order; offset skips driver-side.",
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pagination: rows 201-300 in o_orderkey order."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy("o_orderkey")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .offset(200)
        .limit(100)
    )
