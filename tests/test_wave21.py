"""Semantic invariants for the r13 wave-21 ops (llm/wave21.py).

Value-level twin parity is covered by tests/test_oracle_parity.py's
registry sweep; these pin what a hash match can't express — the OBF
boundary shape and the peeking demonstration, contingency
conservation, entropy inequalities, Pearson domains, and the DAU/WAU
sandwich.
"""

from __future__ import annotations

from python_kinesis_streaming_spark.registry import all_queries

Q = all_queries()


def test_sequential_boundary_shape(spark, sf_dir):
    rows = sorted(
        Q["events_sequential_boundary_check"](spark, sf_dir).collect(),
        key=lambda r: r["t"],
    )
    T = len(rows)
    assert rows[0]["t"] == 1 and rows[-1]["t"] == T
    prev_bound = float("inf")
    for r in rows:
        # OBF boundary decreases monotonically to ~1.96 at t = T
        assert r["obf_boundary"] <= prev_bound + 1e-9
        prev_bound = r["obf_boundary"]
        assert r["obf_boundary"] >= 1.96 - 0.01
        # a crossed OBF implies naive significance (bound >= 1.96)
        if r["crossed_obf"] == 1:
            assert r["naive_significant"] == 1
        # cumulative counts are monotone
    assert abs(rows[-1]["obf_boundary"] - 1.96) < 0.01
    for a, b in zip(rows, rows[1:]):
        assert b["na"] >= a["na"] and b["nb"] >= a["nb"]
        assert b["ca"] >= a["ca"] and b["cb"] >= a["cb"]
    # the fixture demonstrates the peeking problem: some early naive
    # "significant" day that OBF correctly refuses
    assert any(
        r["naive_significant"] == 1 and r["crossed_obf"] == 0
        for r in rows
    )


def test_kmeans_init_sensitivity_conservation(spark, sf_dir, duck):
    rows = Q["emb_kmeans_init_sensitivity"](spark, sf_dir).collect()
    assert len(rows) == 8
    n_vecs = duck.execute(
        "SELECT count(*) FROM embeddings"
    ).fetchone()[0]
    assert sum(r["n_a"] for r in rows) == n_vecs
    gp = rows[0]["global_purity"]
    for r in rows:
        assert 1 <= r["best_overlap"] <= r["n_a"]
        # purity of an 8-way split can't be below 1/8
        assert r["purity"] >= 1.0 / 8 - 1e-9
        assert r["global_purity"] == gp
        assert r["mean_cost_a"] > 0 and r["mean_cost_b"] > 0
    # global purity is the weighted mean of per-cell best overlaps
    calc = sum(r["best_overlap"] for r in rows) / n_vecs
    assert abs(gp - calc) < 1e-3


def test_entropy_inequalities(spark, sf_dir):
    rows = Q["text_ngram_entropy_rate"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        # conditioning never increases entropy
        assert 0.0 < r["h_cond"] <= r["h_unigram"] + 0.01
        # 31-word vocab bounds the unigram entropy by ln(31) ~ 3.43
        assert r["h_unigram"] <= 3.44
        assert 0.0 <= r["redundancy"] < 1.0
        assert r["n_types"] <= r["n_bg"]


def test_dim_redundancy_domains(spark, sf_dir):
    rows = Q["emb_dim_redundancy_audit"](spark, sf_dir).collect()
    assert len(rows) == 63
    assert {r["j"] for r in rows} == set(range(63))
    mean_abs = rows[0]["mean_abs_r"]
    for r in rows:
        assert -1.0 <= r["pearson_r"] <= 1.0
        assert abs(r["abs_r"] - abs(r["pearson_r"])) < 2e-4
        assert r["mean_abs_r"] == mean_abs
    # the synthetic dims are independent: no strong adjacent coupling
    assert mean_abs < 0.2
    calc = sum(abs(r["pearson_r"]) for r in rows) / 63
    assert abs(mean_abs - calc) < 1e-3


def test_dau_wau_sandwich(spark, sf_dir, duck):
    rows = sorted(
        Q["events_dau_wau_stickiness"](spark, sf_dir).collect(),
        key=lambda r: r["day_num"],
    )
    n_days = duck.execute(
        """SELECT count(DISTINCT epoch_us(CAST(ts AS TIMESTAMP))
                        // 86400000000) FROM events"""
    ).fetchone()[0]
    assert len(rows) == n_days
    total_users = duck.execute(
        "SELECT count(DISTINCT user_id) FROM events"
    ).fetchone()[0]
    for r in rows:
        # DAU <= WAU <= registered users
        assert 0 < r["dau"] <= r["wau"] <= total_users
        assert 0.0 < r["stickiness"] <= 1.0
        assert abs(r["stickiness"] - r["dau"] / r["wau"]) < 1e-3
    # ramp-up marking: exactly the first 6 days lack a full window
    assert sum(1 - r["full_window"] for r in rows) == min(6, n_days)
    # spot-check one WAU against DuckDB
    mid = rows[len(rows) // 2]
    wau = duck.execute(
        """SELECT count(DISTINCT user_id) FROM events
           WHERE epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                 BETWEEN ? - 6 AND ?""",
        [mid["day_num"], mid["day_num"]],
    ).fetchone()[0]
    assert mid["wau"] == wau
