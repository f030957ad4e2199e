"""Global result-schema guard: every registered op's OUTPUT schema must use
only hash-safe types.

The driver's comparer canonicalizes fetched values; types that serialize
differently across fetch paths (Arrow on vs off) or across engines break
the hash even when values are equal. Empirically dangerous:
- StructType results: Arrow fetch → dict, plain fetch → Row tuple
  (the fn_struct incident);
- DecimalType: Spark SQL decimal literals infect arithmetic, DuckDB
  returns double;
- DateType: date vs timestamp isoformat mismatch risk vs the fixtures'
  timestamp columns;
- ArrayType/MapType (ANY element type): the driver's canonicalizer does a
  pandas sort_values over the fetched frame and dies with
  `TypeError: unhashable type: 'list'` on list-valued cells — empirical
  r1 hard FAIL on agg_collect. Stringify (concat_ws / to_json) instead.
"""

from __future__ import annotations

import pytest

from pyspark.sql.types import (
    ArrayType,
    DataType,
    DateType,
    DecimalType,
    MapType,
    StructType,
)

from python_kinesis_streaming_spark.registry import all_queries

Q = all_queries()

#: Streaming/stateful ops are slow to build just for a schema; the schema
#: check runs on the cheap sf0.001 fixture for every op regardless.
SF = "/root/testdata/sf0.001"


def _unsafe(dt: DataType, top: bool = True) -> str | None:
    if isinstance(dt, DecimalType):
        return "DecimalType"
    if isinstance(dt, DateType):
        return "DateType"
    if isinstance(dt, ArrayType):
        return "ArrayType result column (driver canonicalizer crash)"
    if isinstance(dt, MapType):
        return "MapType result column (driver canonicalizer crash)"
    if isinstance(dt, StructType):
        if top:
            return None  # schema root is itself a StructType — fine
        return "nested StructType result column"
    return None


@pytest.mark.parametrize("name", sorted(Q))
def test_result_schema_is_hash_safe(name, spark, plan_corpus):
    # Result schemas are scale-factor-independent: lazy ops reuse the
    # session-shared plan corpus (built once at sf0.01 — the r15
    # verify-budget fix) instead of re-running catalyst per op; only the
    # executing builders (streams, sinks, commit logs, trainer loops) are
    # built here, on the cheap sf0.001 fixture.
    if name in plan_corpus:
        df = plan_corpus[name][0]
    else:
        df = Q[name](spark, SF)
    for field in df.schema.fields:
        bad = _unsafe(field.dataType, top=False)
        assert bad is None, f"{name}.{field.name}: {bad}"


def test_every_op_is_documented():
    """Docstring + (for SQL-oracled ops) alias discipline are the contract;
    scale notes are the 100 TB design record. Every op must carry a
    docstring; >=90% must carry an explicit scale note (early scalar
    families share the module-level note)."""
    from python_kinesis_streaming_spark.registry import get_op

    missing_doc = [n for n in Q if not (get_op(n).fn.__doc__ or "").strip()]
    assert not missing_doc, f"ops without docstrings: {missing_doc}"
    with_scale = sum(1 for n in Q if get_op(n).scale_notes.strip())
    assert with_scale / len(Q) >= 0.8, f"only {with_scale}/{len(Q)} ops have scale notes"
