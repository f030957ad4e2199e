"""Physical-plan pins for the promotion ops (PROMOTION.md) — the same
mechanical scale gates the registry gets from
tests/test_global_window_bounded.py, applied before the r9/r10
registration flip: bounded global windows, a per-op shuffle budget, and
zero row-at-a-time Python (every promotion kernel is an Arrow seam).
"""

from __future__ import annotations

import pytest

from python_kinesis_streaming_spark.plans.audit import (
    global_window_violations,
)
from python_kinesis_streaming_spark.plans.explain import (
    plan_of,
    shuffle_count,
)
from python_kinesis_streaming_spark.promotions import PROMOTION_OPS

#: Ops whose BUILDER executes work (snapshot writes, trainer loops, a
#: loopback server, shard/file materialization) — their plan is the
#: final small aggregate, and their scale properties are pinned by their
#: library module's own plan tests. The lazy ops below are the ones
#: whose returned plan IS the op.
EXECUTING_OPS = {
    "shards_tar_roundtrip",
    "zip_shards_roundtrip",
    "warc_response_parity",
    "avro_ocf_roundtrip",
    "lakehouse_delete_modes_parity",
    "lakehouse_merge_upsert_audit",
    "lakehouse_zorder_prune_audit",
    "lakehouse_vacuum_audit",
    "snapshot_cdc_diff",
    "kinesis_loopback_agg",
    "classifier_train_audit",
    "tokenizer_train_audit",
    "avro_schema_evolution_agg",
    "kcl_lease_coordination_agg",
    "tokenizer_eval_report_audit",
    "kinesis_stream_source_agg",
    "kinesis_efo_fanout_agg",
    "lakehouse_compact_audit",
    "lakehouse_schema_evolution_agg",
    "txn_exactly_once_agg",
}

#: Max shuffle Exchanges a lazy promotion op may plan. Census at r8:
#: the codec/transport parity ops plan 0 (pure mapInPandas over one
#: scan), the text/web ops 0-4, span_dedup_parity 6 (its r7 pin),
#: pack_concat_audit 8 (three invariant aggregates + a join).
SHUFFLE_CEILING = {
    "span_dedup_parity": 6,
    # three invariant aggregates each re-derive pack_concat's (pinned
    # ≤2-shuffle) layout plus the conservation join — measured 11
    "pack_concat_audit": 12,
    # distinct vids + cue/frame builds + the bucketized range join's
    # equi-join, dedup and uncovered anti-join — measured 7
    "subtitles_align_parity": 8,
    # same invariant-aggregate shape as pack_concat_audit plus the
    # per-bucket BFD-tightness aggregate
    "pack_best_fit_audit": 14,
}
DEFAULT_CEILING = 4

LAZY_OPS = sorted(set(PROMOTION_OPS) - EXECUTING_OPS)


def test_every_promotion_op_is_classified():
    unknown = EXECUTING_OPS - set(PROMOTION_OPS)
    assert not unknown, f"stale names in EXECUTING_OPS: {unknown}"


@pytest.mark.parametrize("name", LAZY_OPS)
def test_promotion_plan_gates(name, spark, sf_dir):
    df = PROMOTION_OPS[name].fn(spark, sf_dir)
    violations = global_window_violations(df)
    assert not violations, (
        f"{name}: global Window over unbounded input: {violations}"
    )
    plan = plan_of(df, "formatted")
    shuffles = shuffle_count(plan)
    ceiling = SHUFFLE_CEILING.get(name, DEFAULT_CEILING)
    assert shuffles <= ceiling, (
        f"{name}: plans {shuffles} shuffles (budget {ceiling}) — "
        "accidental repartition / lost broadcast?"
    )
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python on the hot path — promotion "
        "kernels must be Arrow seams"
    )
