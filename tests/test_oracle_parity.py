"""Local replica of the driver's t2 gate: every registered op with an oracle
must hash-match DuckDB at sf0.01 (SURVEY.md §5.2). Parameterized over the
registry so newly added ops are covered automatically."""

from __future__ import annotations

import pytest

from python_kinesis_streaming_spark.registry import all_oracles, all_queries

from tests.twin import assert_twin_match

_QUERIES = all_queries()
_ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(name, spark, duck, sf_dir):
    spark_df = _QUERIES[name](spark, sf_dir).toPandas()
    duck_df = duck.execute(_ORACLES[name]).df()
    assert_twin_match(spark_df, duck_df, name)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_runs(name, spark, sf_dir):
    """Ops without an oracle still must run and return a stable schema."""
    df = _QUERIES[name](spark, sf_dir)
    assert df.columns, name
    assert df.count() >= 0
