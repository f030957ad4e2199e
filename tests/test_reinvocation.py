"""Same-session re-invocation: every stateful-on-disk op must produce the
IDENTICAL result when called twice with the same session (the driver may
re-run queries; stale checkpoints/outputs were a real bug class — the
stream_foreach_batch incident)."""

from __future__ import annotations

import pytest

from python_kinesis_streaming_spark.registry import all_queries

Q = all_queries()

#: The ops that touch .scratch state (checkpoints, sinks, warehouse tables,
#: replay caches) — exactly the ones where a second call can diverge.
STATEFUL_ON_DISK = [
    "stream_checkpoint_resume",
    "stream_foreach_batch",
    "sink_parquet",
    "sink_json_roundtrip",
    "sink_csv_roundtrip",
    "join_bucketed",
    "scan_partition_pruned",
    "scan_schema_evolution",
    "stream_dedup",
    "stream_stateful_sessionizer",
    "stream_fsm_pattern_alert",
    "sink_orc_roundtrip",
    "scan_text_format",
    "scan_csv_malformed",
    "sink_sketch_roundtrip",
    "stream_minhash_dedup",  # doc-replay chunks + per-run uuid checkpoint
    "lakehouse_incremental_dedup",  # clears + rebuilds its table dir per call
]


@pytest.mark.parametrize("name", STATEFUL_ON_DISK)
def test_second_invocation_identical(name, spark, sf_dir):
    first = sorted(map(repr, Q[name](spark, sf_dir).collect()))
    second = sorted(map(repr, Q[name](spark, sf_dir).collect()))
    assert first == second, f"{name}: second invocation diverged"
