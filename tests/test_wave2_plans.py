"""Physical-plan pins for the r9 wave-2 ops — beyond the global gates
(shuffle ceiling, no row-Python, bounded windows/NLJ), pin the shapes
that make these ops scale: the M4 downsample must stay ONE mergeable
aggregate, the cheap audits must not grow extra exchanges, and the ANN
audits must keep their candidate joins hash-based (the nested loops are
only the bounded exact-baseline/spine legs).

Census at r9 (sf0.01, formatted plans): ts_downsample_m4 1 shuffle,
emb_shard_drift 3, text_pii_scrub_stats 3, generator audit 7,
nprobe sweep 8, split leakage 7, kl divergence 12, cascade 13,
idf-weighted jaccard 14 — all JVM-only.
"""

from __future__ import annotations

import pytest

from python_kinesis_streaming_spark.plans.explain import plan_of, shuffle_count
from python_kinesis_streaming_spark.registry import all_queries
from python_kinesis_streaming_spark.sources import tables

Q = all_queries()


@pytest.fixture()
def no_table_cache(monkeypatch, spark):
    """Same as tests/test_plans.py: expose the real parquet scans (the
    CacheManager would substitute InMemoryRelation otherwise)."""
    monkeypatch.setenv("SPARK_GRAFT_NO_TABLE_CACHE", "1")
    spark.catalog.clearCache()
    tables._CACHE.clear()
    yield
    tables._CACHE.clear()

#: per-op shuffle pins with one slot of headroom over the r9 census —
#: tighter than the global ceiling (15) so an accidental repartition in
#: a cheap audit is caught even when it stays under the global gate.
SHUFFLE_PINS = {
    "ts_downsample_m4": 1,  # EXACTLY one: first/last/min/max merge map-side
    "emb_shard_drift": 4,
    "text_pii_scrub_stats": 4,
    "sim_ivf_nprobe_sweep": 9,
    "dedup_candidate_generator_audit": 8,
    "corpus_split_leakage_audit": 8,
    "text_source_kl_divergence": 13,
    "sim_cascade_recall_audit": 14,
    "dedup_idf_weighted_jaccard": 15,
}


@pytest.mark.parametrize("name", sorted(SHUFFLE_PINS))
def test_wave2_shuffle_pins(name, spark, sf_dir, no_table_cache):
    p = plan_of(Q[name](spark, sf_dir))
    n = shuffle_count(p)
    assert n <= SHUFFLE_PINS[name], (name, n)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, (
        f"{name}: wave-2 ops are JVM-only by design"
    )


def test_m4_is_one_mergeable_aggregate(spark, sf_dir, no_table_cache):
    """The whole point of M4: one partial+final aggregate pair, nothing
    else — the shuffle carries |buckets| rows at any event count."""
    p = plan_of(Q["ts_downsample_m4"](spark, sf_dir), "simple")
    assert shuffle_count(p) == 1, p
    assert p.count("HashAggregate") >= 2, "partial aggregation lost"


def test_ann_candidate_joins_are_hash_joins(spark, sf_dir, no_table_cache):
    """The IVF probe join (bucket key) and the cascade's dim/candidate
    joins must stay hash-based; the only nested loops allowed are the
    bounded exact-baseline legs (corpus × 1-in-50 broadcast sample)."""
    for name in ("sim_ivf_nprobe_sweep", "sim_cascade_recall_audit"):
        p = plan_of(Q[name](spark, sf_dir))
        assert "CartesianProduct" not in p, name
        assert p.count("BroadcastHashJoin") >= 2, (
            f"{name}: candidate joins degraded from hash joins"
        )
        assert p.count("BroadcastNestedLoopJoin") <= 2, (
            f"{name}: more nested loops than the two documented "
            "exact-baseline legs"
        )
