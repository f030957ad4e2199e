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
from python_kinesis_streaming_spark.sources import tables

#: ops whose builder executes a streaming query / writes side outputs —
#: they are audited by their own suites, and the global-window rule is a
#: batch-plan property.
SKIP_PREFIXES = ("stream_", "source_stream", "sink_", "join_stream", "source_python")

#: non-prefixed ops whose builder executes work (snapshot writes) —
#: their returned plan is a handful of one-row aggregates.
SKIP_NAMES = {
    "lakehouse_incremental_dedup",
    "lakehouse_time_travel_diff",
    "lakehouse_manifest_prune_audit",
    "lakehouse_snapshot_restore_audit",
}

#: The 51 r9-flip promotion ops get the SAME three gates from
#: tests/test_promotion_plans.py, which additionally classifies
#: lazy vs executing builders (trainer loops, loopback servers, shard
#: materialization) — re-running the executing ones here would execute
#: them a second time just to look at the final aggregate's plan.
def _promotion_names() -> set[str]:
    from python_kinesis_streaming_spark.promotions import PROMOTION_OPS

    return set(PROMOTION_OPS)


#: Max shuffle Exchanges any single batch op may plan. The r6 census:
#: 62 ops at 0, 129 at 1, 87 at 2, and a thin tail of deliberately
#: iterative algorithms. A new op (or a regression in an existing one)
#: exceeding its family's ceiling is far more likely an accidental
#: repartition / lost broadcast than a new legitimate iteration.
SHUFFLE_CEILING = 15
ITERATIVE_ALLOWLIST = {
    "graph_pagerank_lite": 25,  # 3 unrolled rank rounds
    "dedup_clusters": 22,  # connected-components label propagation
    "dedup_lsh_tuning": 20,  # candidate volume across band layouts
    # 4-stage funnel: the MinHash-LSH and Jaccard-confirm legs each
    # re-derive the canonical (normalized-dedup) corpus — measured 16
    "corpus_dedup_funnel": 17,
    # 3 prefilter legs over the shared coords lineage; since the r15
    # spill-proof reshape each leg ranks its own pair stream (smaller
    # per-task sorts — the ×10/1 GB fix), so the static plan carries one
    # window exchange + the cores-proportional fan-out repartition per
    # leg plus the cached cna build re-expanded per consumer (runtime
    # dedups via InMemoryRelation/ReusedExchange). Every Exchange is
    # d*k-, N- or sample-bounded, never pairs — measured 20 (the 2-leg
    # wave-3 sibling measures 14)
    "sim_prefilter_quality_report": 20,
    # NN-descent iteration shape: the seed graph feeds both hop ends,
    # the candidate union AND the stage-1 audit — 4 consumers of one
    # lineage, re-expanded in the static plan; all edge tables are
    # N*k rows, exact legs sample-bounded — measured 17
    "emb_nndescent_round": 18,
}


#: The ONLY ops allowed to plan row-at-a-time Python (BatchEvalPython /
#: BatchEvalPythonUDTF): the deliberate slow-path rungs of the §2.10 UDF
#: ladder, kept as measured contrast to the Arrow paths. Everything else
#: Python-touching must be Arrow/Pandas-vectorized (r6 census: exactly
#: these three; ArrowEvalPython ×3, FlatMapGroupsInPandas ×2,
#: MapInPandas ×4 elsewhere).
ROW_PYTHON_ALLOWED = {"udf_scalar_py", "udtf_python_lateral", "udtf_dynamic_schema"}


def test_global_windows_only_consume_bounded_inputs(plan_corpus):
    """One sweep over every batch op's plan, asserting three scale gates:
    no unbounded global window (tree walk), the per-op shuffle budget, and
    no row-at-a-time Python outside the documented UDF-ladder rungs
    (formatted-plan text).

    Deterministic sweep (CLAUDE.md invariant 4): the plans come from the
    session-shared ``plan_corpus`` fixture, which clears the CacheManager
    AND the table memo, then builds every lazy op once in registration
    order — the only cache state the plans can see is the corpus's own
    fixed build order, so every count is reproducible regardless of which
    tests ran earlier (observed r14: the same op read 12 or 26 Exchanges
    depending on test order). Sharing the corpus with test_plans' global
    sweep and the schema gate pays the ~250 s catalyst cost once per
    session instead of three times (VERDICT r14 item 2)."""
    from python_kinesis_streaming_spark.plans.explain import shuffle_count

    promotions = _promotion_names()
    offenders: dict[str, object] = {}
    over_budget: dict[str, int] = {}
    row_python: list[str] = []
    for name, (df, plan) in plan_corpus.items():
        if (
            name.startswith(SKIP_PREFIXES)
            or name in promotions
            or name in SKIP_NAMES
        ):
            continue
        violations = global_window_violations(df)
        if violations:
            offenders[name] = violations
        shuffles = shuffle_count(plan)
        if shuffles > ITERATIVE_ALLOWLIST.get(name, SHUFFLE_CEILING):
            over_budget[name] = shuffles
        if "BatchEvalPython" in plan and name not in ROW_PYTHON_ALLOWED:
            row_python.append(name)
    assert not offenders, (
        "global Window over unbounded fact input (add an Aggregate/Limit "
        f"or use the two-level prefix-sum pattern): {offenders}"
    )
    assert not over_budget, (
        "op plans more shuffles than its budget (accidental repartition / "
        f"lost broadcast?): {over_budget}"
    )
    assert not row_python, (
        "row-at-a-time Python on a hot path (use a pandas/Arrow UDF or "
        f"built-ins): {row_python}"
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
