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


_ROWS_ONLY = sorted(set(_QUERIES) - set(_ORACLES))


def test_every_op_is_sql_oracled():
    """Since round 4 every registered op carries a SQL oracle — the driver's
    strong (hash) gate applies to all of them. A new rows-only op would both
    fail here (deliberate friction: write the oracle) and re-enable the
    parameterized fallback below."""
    assert _ROWS_ONLY == [], f"rows-only ops appeared: {_ROWS_ONLY}"


@pytest.mark.skipif(
    not _ROWS_ONLY,
    reason="no rows-only ops: all registered ops are SQL-oracled "
    "(asserted by test_every_op_is_sql_oracled)",
)
@pytest.mark.parametrize("name", _ROWS_ONLY or ["<empty>"])
def test_rows_only_runs(name, spark, sf_dir):
    """Ops without an oracle still must run and return a stable schema."""
    df = _QUERIES[name](spark, sf_dir)
    assert df.columns, name
    assert df.count() >= 0
