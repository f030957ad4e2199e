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
  timestamp columns.

Arrays/maps of primitives are fine (both engines produce lists/dicts).
"""

from __future__ import annotations

import pytest

from pyspark.sql.types import ArrayType, DataType, DateType, DecimalType, StructType

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
    if isinstance(dt, StructType):
        if top:
            return None  # schema root is itself a StructType — fine
        return "nested StructType result column"
    return None


@pytest.mark.parametrize("name", sorted(Q))
def test_result_schema_is_hash_safe(name, spark):
    df = Q[name](spark, SF)
    for field in df.schema.fields:
        bad = _unsafe(field.dataType, top=False)
        assert bad is None, f"{name}.{field.name}: {bad}"
        if isinstance(field.dataType, ArrayType):
            inner = field.dataType.elementType
            assert not isinstance(inner, (StructType, DecimalType)), (
                f"{name}.{field.name}: array of {inner}"
            )
