"""Operator registry — the single source of truth for the declared contract.

Each operator from SURVEY.md §2 registers here via the ``@op`` decorator with
its (spark, sf_dir) -> DataFrame callable and, when ANSI-SQL-expressible, the
equivalent DuckDB oracle SQL. ``__spark_entry__.py`` (the driver contract)
re-exports ``all_queries()`` / ``all_oracles()``.

Hash-match discipline (SURVEY.md §5.2, §7.4):
- every computed column aliased identically in Spark code and oracle SQL;
- float aggregates rounded to a fixed scale on BOTH sides;
- orderings made deterministic (tie-break keys, array_sort).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class OpSpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    scale_notes: str = field(default="")


_REGISTRY: dict[str, OpSpec] = {}

# Modules that populate the registry on import (order = SURVEY.md §7.1).
_OP_MODULES = [
    "python_kinesis_streaming_spark.operators.scans",
    "python_kinesis_streaming_spark.operators.projection",
    "python_kinesis_streaming_spark.operators.joins",
    "python_kinesis_streaming_spark.operators.aggregates",
    "python_kinesis_streaming_spark.operators.windows",
    "python_kinesis_streaming_spark.operators.sorts",
    "python_kinesis_streaming_spark.operators.setops",
    "python_kinesis_streaming_spark.operators.analytics",
    "python_kinesis_streaming_spark.functions.families",
    "python_kinesis_streaming_spark.streaming.ops",
    "python_kinesis_streaming_spark.operators.udfs",
    "python_kinesis_streaming_spark.llm.ops",
]

_loaded = False


def op(name: str, oracle: str | None = None, scale: str = ""):
    """Register a (spark, sf_dir) -> DataFrame operator under ``name``.

    ``oracle`` is DuckDB-runnable ANSI SQL over the pre-registered fixture
    views, producing identical (column-name, value) output; None for ops
    that are not cleanly SQL-expressible (driver falls back to rows-only).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate op registration: {name}")
        _REGISTRY[name] = OpSpec(name=name, fn=fn, oracle=oracle, scale_notes=scale)
        return fn

    return deco


def _ensure_loaded() -> None:
    global _loaded
    if not _loaded:
        _loaded = True  # set first: partial import failure shouldn't loop
        for mod in _OP_MODULES:
            importlib.import_module(mod)


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {
        name: spec.oracle for name, spec in _REGISTRY.items() if spec.oracle is not None
    }


def get_op(name: str) -> OpSpec:
    _ensure_loaded()
    return _REGISTRY[name]
