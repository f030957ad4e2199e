"""Semantic invariants for the r11 wave-6 ops (llm/wave6.py).

Value-level twin parity is covered by tests/test_oracle_parity.py's
registry sweep; these tests pin the properties a hash match can't
express — the Kalman gain contraction, signature-term ordering, the
DP release's arithmetic identities, split conservation, and the
expectation suite's pass/violation consistency.
"""

from __future__ import annotations

from python_kinesis_streaming_spark.registry import all_queries

Q = all_queries()


def test_kalman_level_stays_in_observation_envelope(spark, sf_dir, duck):
    rows = Q["ts_kalman_filter_level"](spark, sf_dir).collect()
    env = {
        r[0]: (r[1], r[2])
        for r in duck.execute(
            """SELECT event_type, min(z), max(z) FROM (
                   SELECT event_type,
                          time_bucket(INTERVAL '1 hour',
                                      CAST(ts AS TIMESTAMP)) AS hour,
                          floor(avg(value) * 10000.0 + 0.505) / 10000.0
                              AS z
                   FROM events GROUP BY 1, 2
               ) GROUP BY event_type"""
        ).fetchall()
    }
    assert {r["event_type"] for r in rows} == set(env)
    for r in rows:
        lo, hi = env[r["event_type"]]
        # the filtered level is a convex combination of observations
        assert lo - 1e-6 <= r["level"] <= hi + 1e-6, (r, lo, hi)
        assert r["n_hours"] > 1
        # after >=1 update the posterior variance contracts below the
        # prior (p' = (p+q)/(p+q+r) < 1 for r=1)
        assert 0.0 < r["err_var"] < 1.0


def test_signature_terms_are_ranked_per_source(spark, sf_dir, duck):
    rows = Q["text_source_signature_terms"](spark, sf_dir).collect()
    n_src = duck.execute(
        "SELECT count(DISTINCT source) FROM documents"
    ).fetchone()[0]
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    assert len(by_src) == n_src
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == [1, 2, 3, 4, 5]
        scores = [r["tfidf"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert len({r["token"] for r in rs}) == 5


def test_dp_release_arithmetic_identities(spark, sf_dir, duck):
    rows = Q["dq_dp_count_release"](spark, sf_dir).collect()
    true = dict(
        duck.execute(
            "SELECT source, count(*) FROM documents GROUP BY source"
        ).fetchall()
    )
    assert len(rows) == 2 * len(true)
    noises = set()
    for r in rows:
        assert r["true_count"] == true[r["source"]]
        assert abs(r["released"] - (r["true_count"] + r["noise"])) < 2e-4
        assert abs(r["abs_err"] - abs(r["noise"])) < 2e-4
        noises.add(r["noise"])
    # the hash-uniform draws must actually vary (not a constant shift)
    assert len(noises) > len(true) // 2


def test_stratified_split_conserves_and_balances(spark, sf_dir, duck):
    rows = {
        r["split"]: r
        for r in Q["corpus_split_stratified_audit"](spark, sf_dir).collect()
    }
    assert sorted(rows) == ["0_train", "1_val", "2_test"]
    n_docs = duck.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert sum(r["n_docs"] for r in rows.values()) == n_docs
    assert rows["0_train"]["n_docs"] > rows["1_val"]["n_docs"]
    assert rows["0_train"]["n_docs"] > rows["2_test"]["n_docs"]
    for r in rows.values():
        assert 0.0 <= r["max_share_dev"] < 0.5
        assert r["n_sources"] >= 1


def test_expectation_suite_consistency(spark, sf_dir):
    rows = {
        r["check_name"]: r
        for r in Q["dq_expectation_suite_report"](spark, sf_dir).collect()
    }
    assert sorted(rows) == [
        "1_qty_in_1_50",
        "2_price_positive",
        "3_discount_in_0_01",
        "4_tax_in_0_008",
        "5_pk_orders_unique",
        "6_fk_orders",
    ]
    for r in rows.values():
        assert r["n_violations"] >= 0
        assert r["pass"] == (r["n_violations"] == 0)
    # fixture integrity facts (dq_pk_uniqueness / referential ops pin
    # the same): the PK and FK checks must pass
    assert rows["5_pk_orders_unique"]["pass"]
    assert rows["6_fk_orders"]["pass"]
