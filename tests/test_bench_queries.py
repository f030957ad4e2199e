"""Pins for bench.py's inline headline queries (the ones not drawn from the
registry, whose correctness is otherwise only argued).

The strength-reduced token count (r6) replaces ``size(split(text, ' '))``
with ``length(text) - length(replace(text, ' ', '')) + 1``. The identity
holds exactly because ``split`` on a literal separator keeps empty strings:
token count = separator count + 1, including leading/trailing/double
spaces. This test pins the rewritten form against BOTH the original Spark
expression and the DuckDB baseline twin (``string_split``), so the bench
keeps timing a query whose result is bit-identical to what BASELINE.md
measured.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from python_kinesis_streaming_spark.sources.tables import load_table


def test_token_count_strength_reduction_is_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    split_form = (
        docs.groupBy("lang")
        .agg(F.sum(F.size(F.split("text", " "))).alias("n_tokens"))
        .toPandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    arith_form = (
        docs.groupBy("lang")
        .agg(
            F.sum(
                F.length("text")
                - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
                + 1
            ).alias("n_tokens")
        )
        .toPandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    assert split_form.equals(arith_form), (split_form, arith_form)

    con = duckdb.connect()
    duck = (
        con.execute(
            f"""
            SELECT lang,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                       AS n_tokens
            FROM read_parquet('{sf_dir}/documents.parquet')
            GROUP BY lang ORDER BY lang
            """
        )
        .fetchdf()
        .reset_index(drop=True)
    )
    assert list(duck["lang"]) == list(arith_form["lang"])
    assert list(duck["n_tokens"]) == list(arith_form["n_tokens"])
