"""Shared op classifications for the registry-wide sweep tests.

Two orthogonal sets:

- ``executing_on_build()``: ops whose BUILDER runs real work (streaming
  drains, sinks, snapshot commits, trainer loops, loopback servers, disk
  prep) — excluded from the shared lazy plan corpus (tests/conftest.py
  ``plan_corpus``); their plans are gated by their own suites.
- ``scratch_or_stateful()``: ops that touch ``.scratch`` state or manage
  external processes — these must NEVER run concurrently with each other
  (the r6 single-writer lesson), so the threaded oracle-parity sweep runs
  them sequentially.
"""

from __future__ import annotations

#: prefixes of ops whose builder executes work when the DataFrame is built
EXECUTES_PREFIXES = ("stream_", "source_stream", "join_stream", "sink_")

#: batch ops whose builder executes bounded work (disk prep, count
#: checks, label propagation) but whose RETURNED plan the global-window
#: sweep has always audited — kept inside the plan corpus (built once),
#: while test_plans' nested-loop net keeps skipping them as it always did.
EXECUTES_BUT_AUDITED = {
    "scan_partition_pruned", "scan_schema_evolution", "join_bucketed",
    "join_dpp_partition_pruned",
    "dedup_clusters",
    "edge_empty_inputs",  # runs its five count() checks on build
    "set_ops_all_variants",  # runs its four count() checks on build
}

#: non-prefixed ops whose builder executes heavyweight work (snapshot
#: commit logs) — excluded from the corpus entirely, gated by their suites
EXECUTES_EXTRA = {
    "lakehouse_incremental_dedup",  # writes snapshot versions on build
    "lakehouse_time_travel_diff",  # writes two snapshot versions on build
    "lakehouse_manifest_prune_audit",  # 8 range-append commits on build
    "lakehouse_snapshot_restore_audit",  # v0/v1/restore commits on build
}


def executing_on_build() -> set[str]:
    """Every op name the plan corpus must NOT build (incl. the executing
    promotions, classified in tests/test_promotion_plans.py)."""
    from python_kinesis_streaming_spark.registry import all_queries
    from tests.test_promotion_plans import EXECUTING_OPS

    names = set(all_queries())
    out = {n for n in names if n.startswith(EXECUTES_PREFIXES)}
    out |= EXECUTES_EXTRA & names
    out |= EXECUTING_OPS & names
    return out


def scratch_or_stateful() -> set[str]:
    """Ops that must not run concurrently with each other: anything that
    materializes ``.scratch`` layouts (replay chunks, checkpoints, sinks,
    bucketed/warehouse tables, snapshot logs) or drives external loopback
    servers. Conservatively includes every promotion op — several run
    trainer loops / kinesis mocks / shard writes, and their combined
    sequential cost is small."""
    from python_kinesis_streaming_spark.promotions import PROMOTION_OPS
    from python_kinesis_streaming_spark.registry import all_queries

    names = set(all_queries())
    prefixes = (
        "stream_", "source_stream", "join_stream", "sink_", "scan_",
        "lakehouse_", "txn_", "kinesis_",
    )
    out = {n for n in names if n.startswith(prefixes)}
    out |= {"join_bucketed", "join_dpp_partition_pruned"} & names
    out |= set(PROMOTION_OPS) & names
    return out
