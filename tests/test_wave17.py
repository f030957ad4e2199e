"""Semantic invariants for the r12 wave-17 ops (llm/wave17.py).

Value-level twin parity is covered by tests/test_oracle_parity.py's
registry sweep; these pin what a hash match can't express — MATTR
domains and window accounting, chart false-alarm behavior on an
in-control series, AA score structure, posterior symmetry direction,
and truncation-curve monotonicity.
"""

from __future__ import annotations

from python_kinesis_streaming_spark.registry import all_queries

Q = all_queries()


def test_mattr_domains(spark, sf_dir, duck):
    rows = Q["text_mattr_lexical_diversity"](spark, sf_dir).collect()
    assert rows
    n_sources = duck.execute(
        "SELECT count(DISTINCT source) FROM documents"
    ).fetchone()[0]
    assert len(rows) <= n_sources
    for r in rows:
        assert r["n_windows"] >= 1
        # a 50-token window has between 1 and 50 types
        assert 0.02 <= r["min_ttr"] <= r["mattr"] <= r["max_ttr"] <= 1.0


def test_ewma_chart_in_control(spark, sf_dir, duck):
    rows = Q["ts_ewma_control_chart"](spark, sf_dir).collect()
    n_types = duck.execute(
        "SELECT count(DISTINCT event_type) FROM events"
    ).fetchone()[0]
    assert len(rows) == n_types
    for r in rows:
        assert r["n_days"] > 0
        assert 0 <= r["n_out_of_control"] <= r["n_days"]
        assert r["max_zscore"] >= 0
        # the fixture series is stationary noise: a 3-sigma EWMA
        # chart must not fire on most days
        assert r["n_out_of_control"] <= r["n_days"] // 4
        # if nothing fired, the max z-score must itself be < L
        if r["n_out_of_control"] == 0:
            assert r["max_zscore"] <= 3.0


def test_adamic_adar_structure(spark, sf_dir):
    rows = Q["graph_adamic_adar_linkpred"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    scores = [r["aa_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r["a"] < r["b"]
        assert r["n_common"] >= 1
        # each common neighbor contributes at most 1/ln(2)
        assert r["aa_score"] <= r["n_common"] / 0.6931 + 1e-3
        assert r["aa_score"] > 0


def test_bayes_ab_posterior_direction(spark, sf_dir):
    rows = Q["events_bayes_ab_posterior"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["c_a"] <= r["n_a"] and r["c_b"] <= r["n_b"]
    assert 0.0 <= r["rate_a"] <= 1.0 and 0.0 <= r["rate_b"] <= 1.0
    assert 0.0 <= r["p_b_beats_a"] <= 1.0
    # the posterior must point the same way as the observed rates
    if r["rate_b"] > r["rate_a"]:
        assert r["p_b_beats_a"] > 0.5
    elif r["rate_b"] < r["rate_a"]:
        assert r["p_b_beats_a"] < 0.5


def test_truncation_curve_monotone(spark, sf_dir, duck):
    rows = Q["corpus_truncation_loss_curve"](spark, sf_dir).collect()
    n_sources = duck.execute(
        "SELECT count(DISTINCT source) FROM documents"
    ).fetchone()[0]
    assert len(rows) == n_sources * 3
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
        assert 0 <= r["lost_tokens"] <= r["total_tokens"]
        assert 0 <= r["n_truncated"] <= r["n_docs"]
        assert 0.0 <= r["loss_frac"] <= 1.0
    for src, rs in by_src.items():
        rs = sorted(rs, key=lambda r: r["max_len"])
        assert [r["max_len"] for r in rs] == [32, 48, 64]
        # longer windows lose strictly less (or equal)
        for x, y in zip(rs, rs[1:]):
            assert y["lost_tokens"] <= x["lost_tokens"], src
            assert y["n_truncated"] <= x["n_truncated"], src
