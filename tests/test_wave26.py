"""Semantic invariants for the r14 wave-26 ops (llm/wave26.py).

Value-level twin parity is covered by tests/test_oracle_parity.py's
registry sweep; these pin what a hash match can't express — exact
credit conservation, double-fire domains, triplet-margin consistency,
greedy-plan feasibility, and ANOVA decomposition identities.
"""

from __future__ import annotations

from python_kinesis_streaming_spark.registry import all_queries

Q = all_queries()


def test_attribution_conservation(spark, sf_dir):
    rows = Q["events_attribution_position"](spark, sf_dir).collect()
    assert {r["event_type"] for r in rows} == {"click", "view"}
    total = sum(r["credit_micro"] for r in rows)
    n_users = rows[0]["n_users"]
    # EXACT conservation: one unit of credit per user, in micros
    assert total == n_users * 1000000
    for r in rows:
        assert r["conservation_ok"]
        assert 0.0 < r["credit_share"] < 1.0
        assert r["n_touches"] > 0
    assert abs(sum(r["credit_share"] for r in rows) - 1.0) < 3e-4


def test_double_fire_domains(spark, sf_dir):
    rows = Q["dq_event_double_fire_audit"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r["n_double_fires"] < r["n_events"]
        assert 0.0 <= r["double_fire_rate"] < 1.0
        assert r["min_gap_ms"] >= 0.0
        # a double-fire exists iff the min gap is under the threshold
        assert (r["n_double_fires"] > 0) == (r["min_gap_ms"] < 1000.0)


def test_triplet_margin_consistency(spark, sf_dir):
    rows = Q["emb_triplet_margin_audit"](spark, sf_dir).collect()
    assert 1 <= len(rows) <= 16
    for r in rows:
        assert 0 <= r["n_pos"] <= r["n_anchors"]
        assert 0.0 <= r["pos_margin_share"] <= 1.0
        assert -2.0 <= r["mean_margin"] <= 2.0
        # share re-derives from counts
        assert (
            abs(r["pos_margin_share"] - r["n_pos"] / r["n_anchors"])
            < 2e-4
        )


def test_budget_plan_greedy(spark, sf_dir):
    rows = sorted(
        Q["corpus_token_budget_plan"](spark, sf_dir).collect(),
        key=lambda r: r["rk"],
    )
    assert len(rows) == 20
    qs = [r["quality_micro"] for r in rows]
    assert qs == sorted(qs, reverse=True)  # greedy order
    budget = rows[0]["budget"]
    total = rows[0]["total"]
    assert budget == total // 2
    cum = 0
    for r in rows:
        cum += r["toks_s"]
        assert r["cum_toks"] == cum
        assert r["selected"] == (r["cum_toks"] <= budget)
    # selection is a prefix of the greedy order
    sel = [r["selected"] for r in rows]
    assert sel == sorted(sel, reverse=True)
    assert any(sel) and not all(sel)


def test_weekday_anova_identities(spark, sf_dir):
    r = Q["ts_weekday_anova"](spark, sf_dir).collect()
    assert len(r) == 1
    r = r[0]
    assert r["n_groups"] == 7
    assert r["n_days"] >= 20  # the fixture spans ~a month
    assert r["ss_between"] >= 0.0
    assert r["ss_within"] >= 0.0
    assert r["f_stat"] >= 0.0
    assert r["f_crit_95"] == 2.599
    assert r["weekday_effect_95"] == (r["f_stat"] > r["f_crit_95"])
