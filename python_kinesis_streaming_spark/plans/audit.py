"""Logical-plan audits over the optimized plan tree (py4j traversal).

``plans/explain.py`` parses plan *text*; this module walks the actual
Catalyst tree for properties text can't express reliably — today, the
bounded-global-window rule: a ``Window`` with an empty partitionSpec sorts
every row in ONE task, so it may only consume inputs whose cardinality is
bounded (the output of an Aggregate / Limit / Deduplicate, a dim-table
scan, a generated grid) — never a raw fact table. At 100 TB an unbounded
global window is the difference between a 64-row driver-side spine and a
single task sorting the corpus.

``tests/test_global_window_bounded.py`` enforces the rule over every
registered batch op; the CLI's ``audit <op>`` exposes the same check (plus
the text predicates) to a human before an op ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: leaf column -> fixture fact table (unbounded at scale).
FACT_SIGNATURES: dict[str, str] = {
    "l_orderkey": "lineitem",
    "o_orderkey": "orders",
    "event_id": "events",
    "doc_id": "documents",
    "vec_id": "embeddings",
}

#: logical operators whose output cardinality is bounded (or grouped):
#: anything below one of these is fine under a global window.
BOUNDING_NODES = {
    "Aggregate",
    "GlobalLimit",
    "LocalLimit",
    "Deduplicate",
    "Range",
    "OneRowRelation",
    "LocalRelation",
}


def _cls(jnode) -> str:
    return jnode.getClass().getSimpleName()


def _children(jnode):
    ch = jnode.children()
    return [ch.apply(i) for i in range(ch.size())]


def _leaf_fact(jnode) -> str | None:
    out = jnode.output()
    names = {out.apply(i).name() for i in range(out.size())}
    for col, table in FACT_SIGNATURES.items():
        if col in names:
            return table
    return None


def _unbounded_fact_leaves(jnode) -> list[str]:
    """Fact-table leaves reachable from ``jnode`` without passing any
    cardinality-bounding operator on the way down."""
    if _cls(jnode) in BOUNDING_NODES:
        return []
    kids = _children(jnode)
    if not kids:
        fact = _leaf_fact(jnode)
        return [fact] if fact else []
    leaves: list[str] = []
    for k in kids:
        leaves.extend(_unbounded_fact_leaves(k))
    return leaves


def global_window_violations(df: DataFrame) -> list[list[str]]:
    """For each empty-partitionSpec Window in ``df``'s optimized logical
    plan, the fact tables it can reach un-bounded (empty list = clean)."""
    violations: list[list[str]] = []

    def walk(jnode):
        if _cls(jnode) == "Window" and jnode.partitionSpec().isEmpty():
            facts = _unbounded_fact_leaves(_children(jnode)[0])
            if facts:
                violations.append(sorted(set(facts)))
        for k in _children(jnode):
            walk(k)

    walk(df._jdf.queryExecution().optimizedPlan())
    return violations


def plan_audit(df: DataFrame) -> dict:
    """One-call audit summary: the text predicates plus the tree checks.

    Keys: shuffles, broadcast_joins, codegen stages, partial aggregation,
    top-k pushdown, pushed filters, read schemas, and unbounded
    global-window violations.
    """
    from python_kinesis_streaming_spark.plans.explain import (
        broadcast_join_count,
        codegen_stage_count,
        has_partial_aggregation,
        is_take_ordered,
        plan_of,
        pushed_filters,
        read_schemas,
        shuffle_count,
    )

    plan = plan_of(df, "formatted")
    return {
        "shuffles": shuffle_count(plan),
        "broadcast_joins": broadcast_join_count(plan),
        "codegen_stages": codegen_stage_count(plan),
        "partial_aggregation": has_partial_aggregation(plan),
        "take_ordered": is_take_ordered(plan),
        "pushed_filters": pushed_filters(plan),
        "read_schemas": read_schemas(plan),
        "global_window_unbounded": global_window_violations(df),
    }
