"""Semantic invariants for the r12 wave-16 ops (llm/wave16.py).

Value-level twin parity is covered by tests/test_oracle_parity.py's
registry sweep; these pin what a hash match can't express — the MDE
scaling identity, hubness moment accounting, PPS estimator domains,
the bootstrap interval bracketing the true mean, and kappa's
chance-correction identity.
"""

from __future__ import annotations

from python_kinesis_streaming_spark.registry import all_queries

Q = all_queries()


def test_power_analysis_identities(spark, sf_dir):
    rows = Q["events_power_analysis_mde"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n"] > 0 and r["sigma"] > 0 and r["mean_value"] > 0
    # MDE identity: mde_abs = Z * sqrt(2 sigma^2 / (n//2))
    z = 2.8015852181129683
    expect = z * (2.0 * r["sigma"] ** 2 / (r["n"] // 2)) ** 0.5
    assert abs(r["mde_abs"] - expect) < max(0.01 * expect, 0.01)
    assert abs(r["mde_rel"] - r["mde_abs"] / r["mean_value"]) < 1e-3
    # 1% is harder to detect than the current MDE -> needs more n
    assert r["n_per_arm_for_1pct"] > r["n"] // 2


def test_hubness_moment_accounting(spark, sf_dir, duck):
    rows = Q["sim_hubness_audit"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    n_vecs = duck.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    assert r["n"] == n_vecs
    # every node emits <= 10 edges, so mean k-occurrence <= 10
    assert 0 < r["mean_k"] <= 10.0 + 1e-6
    assert r["max_k"] >= r["mean_k"]
    assert 0.0 <= r["antihub_rate"] < 1.0
    # hubs exist in 64-d: the k-occurrence distribution is
    # right-skewed (max well above the mean forces positive skew)
    if r["max_k"] > 3 * r["mean_k"]:
        assert r["skewness"] > 0


def test_pps_estimator_domains(spark, sf_dir, duck):
    rows = sorted(
        Q["sample_pps_priority_audit"](spark, sf_dir).collect(),
        key=lambda r: r["k"],
    )
    assert [r["k"] for r in rows] == [50, 100]
    exact = duck.execute(
        "SELECT sum(len(string_split(text, ' '))) FROM documents"
    ).fetchone()[0]
    for r in rows:
        assert r["exact_total"] == exact
        assert r["n_sampled"] == r["k"]
        assert r["pps_estimate"] > 0
        assert r["rel_err"] >= 0
    # more sample -> tighter estimate on this corpus
    assert rows[1]["rel_err"] <= rows[0]["rel_err"] + 1e-9


def test_bootstrap_interval_brackets_mean(spark, sf_dir):
    rows = Q["events_bootstrap_ci_hash"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_replicates"] == 32
    assert r["ci_lo"] <= r["ci_hi"]
    # Poisson replicate means concentrate around the full mean; the
    # ~94% interval must bracket it on a 10k-row fixture
    assert r["ci_lo"] <= r["full_mean"] <= r["ci_hi"]
    # and be meaningfully tighter than +-10%
    assert (r["ci_hi"] - r["ci_lo"]) < 0.2 * r["full_mean"]


def test_kappa_chance_correction(spark, sf_dir, duck):
    rows = Q["dq_annotator_agreement_kappa"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    n_docs = duck.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert r["n11"] + r["n10"] + r["n01"] + r["n00"] == n_docs == r["n"]
    assert 0.0 <= r["p_observed"] <= 1.0
    assert 0.0 <= r["p_expected"] <= 1.0
    expect = (r["p_observed"] - r["p_expected"]) / (1.0 - r["p_expected"])
    assert abs(r["kappa"] - expect) < 1e-3
    assert -1.0 <= r["kappa"] <= 1.0
