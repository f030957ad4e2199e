"""Semantic invariants for the r14 wave-25 ops (llm/wave25.py).

Value-level twin parity is covered by tests/test_oracle_parity.py's
registry sweep; these pin what a hash match can't express — WoE/IV
share identities, the Ljung-Box verdict self-consistency, bit-balance
domains, QTE monotonicity in phi, and boilerplate coverage bounds.
"""

from __future__ import annotations

from python_kinesis_streaming_spark.registry import all_queries

Q = all_queries()


def test_woe_iv_identities(spark, sf_dir):
    rows = Q["feat_woe_iv_encoding"](spark, sf_dir).collect()
    assert 1 <= len(rows) <= 6
    # shares partition the goods and the bads
    assert abs(sum(r["good_share"] for r in rows) - 1.0) < 6e-4 + 1e-6
    assert abs(sum(r["bad_share"] for r in rows) - 1.0) < 6e-4 + 1e-6
    iv = rows[0]["iv_total"]
    assert iv >= 0.0  # IV is a sum of (g-b)*ln(g/b) terms, each >= 0
    for r in rows:
        assert r["iv_total"] == iv
        assert r["goods"] >= 0 and r["bads"] >= 0
        # WoE sign must agree with the share difference
        if r["goods"] > 0 and r["bads"] > 0:
            d = r["good_share"] - r["bad_share"]
            if abs(d) > 2e-4:
                assert (r["woe"] > 0) == (d > 0)


def test_ljung_box_consistency(spark, sf_dir):
    rows = Q["ts_ljung_box_whiteness"](spark, sf_dir).collect()
    assert {r["lag"] for r in rows} == set(range(1, 8))
    q = rows[0]["q_stat"]
    for r in rows:
        assert -1.0 <= r["acf_diff"] <= 1.0
        assert r["q_stat"] == q
        assert r["chi2_crit_95"] == 14.0671
        assert r["is_white_95"] == (r["q_stat"] <= r["chi2_crit_95"])
    # Q is a sum of squares scaled by positive factors
    assert q >= 0.0


def test_sign_bit_balance_domains(spark, sf_dir):
    rows = Q["emb_sign_bit_balance_audit"](spark, sf_dir).collect()
    assert len(rows) == 64
    mx = rows[0]["max_imbalance"]
    for r in rows:
        assert 0.0 <= r["ones_share"] <= 1.0
        assert 0.0 <= r["imbalance"] <= 0.5
        assert r["imbalance"] <= mx + 1e-4
        assert 0.0 <= r["adj_agree_share"] <= 1.0
        assert r["max_imbalance"] == mx
        # imbalance re-derives from ones_share
        assert abs(r["imbalance"] - abs(r["ones_share"] - 0.5)) < 2e-4
    last = next(r for r in rows if r["bit"] == 63)
    assert last["adj_agree_share"] == 0.5  # no neighbor -> ideal


def test_qte_monotone_in_phi(spark, sf_dir):
    rows = sorted(
        Q["events_quantile_treatment_effect"](spark, sf_dir).collect(),
        key=lambda r: r["phi"],
    )
    assert [round(r["phi"], 2) for r in rows] == [
        0.25,
        0.5,
        0.75,
        0.9,
        0.99,
    ]
    # quantiles are non-decreasing in phi within each arm
    for a, b in zip(rows, rows[1:]):
        assert a["q_control_cents"] <= b["q_control_cents"]
        assert a["q_treat_cents"] <= b["q_treat_cents"]
    for r in rows:
        assert r["qte_cents"] == r["q_treat_cents"] - r["q_control_cents"]
        assert r["q_control_cents"] > 0


def test_boilerplate_coverage_bounds(spark, sf_dir):
    rows = Q["corpus_boilerplate_df_ngrams"](spark, sf_dir).collect()
    assert len(rows) == 10
    cov = rows[0]["docs_covered"]
    dfs = [r["doc_freq"] for r in sorted(rows, key=lambda r: r["rk"])]
    assert dfs == sorted(dfs, reverse=True)  # rank order by DF
    for r in rows:
        assert len(r["gram"].split(" ")) == 5
        assert 1 <= r["n_sources"] <= 20
        assert r["docs_covered"] == cov
        # union coverage at least the top gram, at most the sum
        assert r["doc_freq"] <= cov
    assert cov <= sum(dfs)
