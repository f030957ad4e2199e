"""§2.2 Projection / filter / expressions (SURVEY.md).

Scale notes (100 TB): all four ops are stateless narrow transforms —
whole-stage-codegen'd, zero shuffle. The predicates in `filter_pred` /
`filter_in_like` are Catalyst-pushable (comparison/IN/LIKE/starts-with reach
the Parquet scan as PushedFilters and skip row groups via min/max stats);
verified via tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from python_kinesis_streaming_spark.functions.rounding import rnd, sql_rnd
from python_kinesis_streaming_spark.registry import op
from python_kinesis_streaming_spark.sources.tables import load_table


@op(
    "project_compute",
    oracle=f"""
        SELECT l_orderkey, l_linenumber,
               {sql_rnd("l_extendedprice * (1 - l_discount)")} AS revenue,
               {sql_rnd("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS charge
        FROM lineitem
    """,
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived per-row columns (TPC-H revenue/charge shape). Same IEEE
    expression tree on both sides → bit-identical results."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        rnd(disc_price).alias("revenue"),
        rnd(disc_price * (F.lit(1) + F.col("l_tax"))).alias("charge"),
    )


@op(
    "filter_pred",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_extendedprice
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    scale="All conjuncts push to the Parquet scan → row-group skipping.",
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shape compound predicate; fully pushed down."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_extendedprice")


@op(
    "filter_in_like",
    oracle="""
        SELECT p_partkey, p_name, p_brand, p_type
        FROM part
        WHERE p_type IN ('ECONOMY', 'PROMO')
           OR (p_name LIKE '%widget%' AND p_brand IS NOT DISTINCT FROM 'Brand#12')
    """,
    scale="IN/LIKE('%x%')/null-safe-eq; IN and equality push down; contains-LIKE evaluates in codegen.",
)
def filter_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list, contains-LIKE, and null-safe equality predicates."""
    part = load_table(spark, sf_dir, "part")
    return part.where(
        F.col("p_type").isin("ECONOMY", "PROMO")
        | (F.col("p_name").like("%widget%") & F.col("p_brand").eqNullSafe(F.lit("Brand#12")))
    ).select("p_partkey", "p_name", "p_brand", "p_type")


@op(
    "case_when",
    oracle="""
        SELECT event_id,
               CASE WHEN value < 10 THEN 'low'
                    WHEN value < 100 THEN 'mid'
                    ELSE 'high' END AS tier
        FROM events
    """,
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketize `value` into tiers with a searched CASE."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("value") < 10, "low")
        .when(F.col("value") < 100, "mid")
        .otherwise("high")
        .alias("tier"),
    )
