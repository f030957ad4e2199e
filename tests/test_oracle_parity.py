"""Local replica of the driver's t2 gate: every registered op with an oracle
must hash-match DuckDB at sf0.01 (SURVEY.md §5.2). Parameterized over the
registry so newly added ops are covered automatically.

r15 verify-budget fix (VERDICT r14 item 2): the pure in-memory ops run
through a small driver-side thread pool (guide §2.6 — Spark's scheduler
happily overlaps independent jobs; actions were only sequential because the
test ran them sequentially), which roughly halves this file's wall time.
Ops that touch ``.scratch`` state or external loopback servers
(tests/corpus_sets.py::scratch_or_stateful) keep the sequential
parametrized form — two scratch writers must never run concurrently (the
r6 single-writer lesson)."""

from __future__ import annotations

import pytest

from python_kinesis_streaming_spark.registry import all_oracles, all_queries

from tests.corpus_sets import scratch_or_stateful
from tests.twin import assert_twin_match

_QUERIES = all_queries()
_ORACLES = all_oracles()

_SEQUENTIAL = sorted(set(_ORACLES) & scratch_or_stateful())
_THREADED = sorted(set(_ORACLES) - set(_SEQUENTIAL))


@pytest.mark.parametrize("name", _SEQUENTIAL)
def test_oracle_parity(name, spark, duck, sf_dir):
    spark_df = _QUERIES[name](spark, sf_dir).toPandas()
    duck_df = duck.execute(_ORACLES[name]).df()
    assert_twin_match(spark_df, duck_df, name)


def test_oracle_parity_pure_ops_threaded(spark, duck, sf_dir):
    """All pure (no-scratch) oracled ops, verified concurrently: each
    worker runs the op, fetches the oracle on its own DuckDB cursor, and
    twin-compares; every failing op is reported in one list. Coverage is
    identical to the old fully-parametrized sweep (pinned below)."""
    from concurrent.futures import ThreadPoolExecutor

    def one(name: str):
        try:
            spark_df = _QUERIES[name](spark, sf_dir).toPandas()
            cur = duck.cursor()
            try:
                duck_df = cur.execute(_ORACLES[name]).df()
            finally:
                cur.close()
            assert_twin_match(spark_df, duck_df, name)
            return None
        except Exception as exc:  # noqa: BLE001 — collected and asserted
            return (name, repr(exc)[:400])

    with ThreadPoolExecutor(max_workers=6) as pool:
        failures = [r for r in pool.map(one, _THREADED) if r]
    assert not failures, f"{len(failures)} ops failed parity: {failures}"


def test_threaded_plus_sequential_is_the_whole_registry():
    """The split must not drop coverage: threaded + sequential == every
    SQL-oracled op, with no overlap."""
    assert sorted(_THREADED + _SEQUENTIAL) == sorted(_ORACLES)
    assert not set(_THREADED) & set(_SEQUENTIAL)


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
