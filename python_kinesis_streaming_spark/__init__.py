"""python_kinesis_streaming_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first implementation of the query / data-processing
capability surface declared in SURVEY.md §2 (the reference repo
`aprakash1976/python-kinesis-streaming` was unavailable — see SURVEY.md §0 —
so §2's declared contract is authoritative).

Design principles (see SURVEY.md §4):
- DataFrame / SQL API only; Catalyst + AQE do the physical planning.
- No RDD-level code; Pandas/Arrow UDFs only where the public API can't
  express the semantics (SURVEY.md §2.10).
- Every operator registered in `registry` with a DuckDB oracle twin where
  ANSI-SQL-expressible, for the driver's hash-match correctness gate.
- Every operator documents its 100 TB scale strategy in its docstring
  (partitioning keys, broadcast decisions, skew handling).
"""

from python_kinesis_streaming_spark.registry import all_oracles, all_queries, get_op

__all__ = ["all_queries", "all_oracles", "get_op", "api"]
__version__ = "0.1.0"

from python_kinesis_streaming_spark import api  # noqa: E402  (public surface)
