"""Bounded-input invariant for global windows (VERDICT r5, next-round item 4).

SCALE.md's discipline: a ``Window.orderBy`` with no ``partitionBy`` forces
all rows through a single task, so it is only ever allowed on inputs whose
cardinality is bounded — the output of an Aggregate / Limit, a dim-table
scan, or a generated grid — never directly on a fact table. This test
turns that rule into a regression gate: for EVERY registered batch op, walk
the optimized logical plan and assert no empty-partition Window can reach a
fact-table leaf (lineitem / orders / events / documents / embeddings)
without passing a cardinality-bounding node on the way.

(This is the audit that caught corpus_epoch_plan's global cumsum in r6; it
now uses the two-level range-bucket prefix sum and passes.)
"""

from __future__ import annotations

from python_kinesis_streaming_spark.registry import all_queries

#: leaf column -> fixture fact table (unbounded at scale).
FACT_SIGNATURES = {
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

#: ops whose builder executes a streaming query / writes side outputs —
#: they are audited by their own suites, and the global-window rule is a
#: batch-plan property.
SKIP_PREFIXES = ("stream_", "source_stream", "sink_", "join_stream", "source_python")


def _cls(n) -> str:
    return n.getClass().getSimpleName()


def _children(n):
    ch = n.children()
    return [ch.apply(i) for i in range(ch.size())]


def _leaf_fact(n) -> str | None:
    out = n.output()
    names = {out.apply(i).name() for i in range(out.size())}
    for col, table in FACT_SIGNATURES.items():
        if col in names:
            return table
    return None


def _unbounded_fact_leaves(n) -> list[str]:
    if _cls(n) in BOUNDING_NODES:
        return []
    kids = _children(n)
    if not kids:
        fact = _leaf_fact(n)
        return [fact] if fact else []
    leaves: list[str] = []
    for k in kids:
        leaves.extend(_unbounded_fact_leaves(k))
    return leaves


def global_window_violations(df) -> list[list[str]]:
    """Fact tables reachable, un-bounded, beneath each global Window."""
    violations: list[list[str]] = []

    def walk(n):
        if _cls(n) == "Window" and n.partitionSpec().isEmpty():
            facts = _unbounded_fact_leaves(_children(n)[0])
            if facts:
                violations.append(sorted(set(facts)))
        for k in _children(n):
            walk(k)

    walk(df._jdf.queryExecution().optimizedPlan())
    return violations


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
