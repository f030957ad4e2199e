"""Semantic invariants for the r13 wave-19 ops (llm/wave19.py).

Value-level twin parity is covered by tests/test_oracle_parity.py's
registry sweep; these pin what a hash match can't express — OOV
monotonicity in V, memorization-risk domains, the Kish ESS ordering
theorem, Lloyd's non-increase, and the CUSUM prefix identity.
"""

from __future__ import annotations

from python_kinesis_streaming_spark.registry import all_queries

Q = all_queries()


def test_vocab_coverage_monotone_in_v(spark, sf_dir, duck):
    rows = Q["text_vocab_coverage_curve"](spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], {})[r["v"]] = r
    assert len(by_src) == 20
    vocab = duck.execute(
        """SELECT count(DISTINCT w) FROM (
               SELECT unnest(string_split(text, ' ')) w
               FROM documents)"""
    ).fetchone()[0]
    for src, vs in by_src.items():
        assert set(vs) == {4, 8, 16}
        # a bigger vocab can only cover MORE tokens
        assert vs[4]["n_oov"] >= vs[8]["n_oov"] >= vs[16]["n_oov"]
        for v, r in vs.items():
            assert 0 <= r["n_oov"] <= r["n_tokens"]
            # V >= vocab size would mean zero OOV; the grid stays below
            assert v < vocab
            assert 0.0 <= r["oov_share"] <= 1.0


def test_memorization_risk_domains(spark, sf_dir, duck):
    rows = Q["corpus_memorization_risk"](spark, sf_dir).collect()
    assert len(rows) == 20
    total = duck.execute(
        """SELECT count(*) FROM (
               SELECT t[i] FROM (SELECT string_split(text, ' ') AS t
                                 FROM documents),
                    unnest(range(1, len(t) - 2)) AS u(i))"""
    ).fetchone()[0]
    assert sum(r["n_grams"] for r in rows) == total
    for r in rows:
        assert 0 < r["n_distinct"] <= r["n_grams"]
        assert 0 <= r["n_repeated"] <= r["n_grams"]
        assert abs(r["repeat_share"] - r["n_repeated"] / r["n_grams"]) < 1e-3
        assert r["max_gram_df"] >= 1
    # the fixture's tiny vocab guarantees cross-doc 4-gram repeats
    assert sum(r["n_repeated"] for r in rows) > 0


def test_sampling_ess_ordering(spark, sf_dir):
    rows = Q["corpus_sampling_ess_audit"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        # Kish: ESS <= n always; heavier weighting degrades ESS further
        assert 0 < r["ess_length"] <= r["n_docs"] + 1e-9
        assert 0 < r["ess_length_sq"] <= r["ess_length"] + 0.01
        assert 0.0 < r["ess_length_ratio"] <= 1.0 + 1e-9


def test_pq_train_lloyd_nonincrease(spark, sf_dir):
    rows = Q["emb_pq_train_audit"](spark, sf_dir).collect()
    assert len(rows) == 8
    assert {r["s"] for r in rows} == set(range(8))
    for r in rows:
        assert r["n_vecs"] > 0
        assert r["cost_before_micro"] >= 0
        assert r["lloyd_nonincrease"] == 1
        assert r["cost_after_micro"] <= r["cost_before_micro"]
        assert (
            abs(
                r["mean_dist_before"]
                - r["cost_before_micro"] / (1e6 * r["n_vecs"])
            )
            < 1e-3
        )
    # one iteration on real data strictly improves SOMEWHERE
    assert any(
        r["cost_after_micro"] < r["cost_before_micro"] for r in rows
    )


def test_cusum_prefix_identity(spark, sf_dir, duck):
    rows = sorted(
        Q["ts_cusum_page_alarm"](spark, sf_dir).collect(),
        key=lambda r: r["day_num"],
    )
    n_days = duck.execute(
        """SELECT count(DISTINCT epoch_us(CAST(ts AS TIMESTAMP))
                        // 86400000000) FROM events"""
    ).fetchone()[0]
    assert len(rows) == n_days
    # replay the recursion C+_t = max(0, C+_{t-1} + (N x_t - S)) in
    # exact integers and compare against the op's windowed identity
    cents = [r["cents"] for r in rows]
    nd, s = len(cents), sum(cents)
    cpos = cneg = 0
    for r, x in zip(rows, cents):
        cpos = max(0, cpos + (nd * x - s))
        cneg = max(0, cneg + (s - nd * x))
        assert abs(r["cusum_pos_dollars"] - cpos / (nd * 100.0)) < 0.011
        assert abs(r["cusum_neg_dollars"] - cneg / (nd * 100.0)) < 0.011
        assert r["alarm_up"] == (1 if cpos * 20 > nd * s else 0)
        assert r["alarm_down"] == (1 if cneg * 20 > nd * s else 0)
    # the stationary fixture must not alarm
    assert all(r["alarm_up"] == 0 and r["alarm_down"] == 0 for r in rows)
