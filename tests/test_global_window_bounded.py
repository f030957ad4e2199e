"""Bounded-input invariant for global windows (VERDICT r5, next-round item 4).

SCALE.md's discipline: a ``Window.orderBy`` with no ``partitionBy`` forces
all rows through a single task, so it is only ever allowed on inputs whose
cardinality is bounded — the output of an Aggregate / Limit, a dim-table
scan, or a generated grid — never directly on a fact table. This test
turns that rule into a regression gate over EVERY registered batch op,
using the product-surface walker in ``plans/audit.py`` (also behind the
CLI's ``audit <op>``).

(This is the audit that caught corpus_epoch_plan's global cumsum in r6; it
now uses the two-level range-bucket prefix sum and passes.)
"""

from __future__ import annotations

from python_kinesis_streaming_spark.plans.audit import global_window_violations
from python_kinesis_streaming_spark.registry import all_queries

#: ops whose builder executes a streaming query / writes side outputs —
#: they are audited by their own suites, and the global-window rule is a
#: batch-plan property.
SKIP_PREFIXES = ("stream_", "source_stream", "sink_", "join_stream", "source_python")


def test_global_windows_only_consume_bounded_inputs(spark, sf_dir):
    queries = all_queries()
    offenders: dict[str, object] = {}
    for name, fn in queries.items():
        if name.startswith(SKIP_PREFIXES):
            continue
        violations = global_window_violations(fn(spark, sf_dir))
        if violations:
            offenders[name] = violations
    assert not offenders, (
        "global Window over unbounded fact input (add an Aggregate/Limit "
        f"or use the two-level prefix-sum pattern): {offenders}"
    )


def test_violation_detector_catches_a_real_offender(spark, sf_dir):
    """Positive control: a global rank straight over the events fact table
    must be flagged (guards against the walker silently matching nothing)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from python_kinesis_streaming_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    bad = ev.withColumn(
        "rk", F.row_number().over(Window.orderBy("ts", "event_id"))
    )
    assert global_window_violations(bad) == [["events"]]

    ok = (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .withColumn("rk", F.row_number().over(Window.orderBy(F.desc("n"))))
    )
    assert global_window_violations(ok) == []
