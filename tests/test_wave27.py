"""Semantic invariants for the r14 wave-27 ops (llm/wave27.py).

Value-level twin parity is covered by tests/test_oracle_parity.py's
registry sweep; these pin what a hash match can't express — the Bloom
no-false-negative theorem, collision monotonicity in m, DB-index
positivity, the exact-sign bookkeeping of the Simpson check, and the
DEFF/ICC identity.
"""

from __future__ import annotations

from python_kinesis_streaming_spark.registry import all_queries

Q = all_queries()


def test_bloom_theorems(spark, sf_dir):
    r = Q["agg_bloom_membership_audit"](spark, sf_dir).collect()
    assert len(r) == 1
    r = r[0]
    assert r["no_false_negatives"]  # THE Bloom guarantee
    assert 0 < r["n_members"] < r["n_universe"]
    assert r["n_nonmembers"] == r["n_universe"] - r["n_members"]
    assert 0 <= r["n_false_pos"] <= r["n_nonmembers"]
    # at most k bits per member can be set
    assert r["bits_set"] <= 4 * r["n_members"]
    assert 0.0 < r["fill_share"] < 1.0
    assert 0.0 <= r["measured_fpr"] <= 1.0


def test_hash_collision_monotone_in_m(spark, sf_dir):
    rows = {
        r["m"]: r
        for r in Q["feat_hash_collision_audit"](spark, sf_dir).collect()
    }
    assert set(rows) == {1024, 4096, 16384}
    n = rows[1024]["n_words"]
    for r in rows.values():
        assert r["n_words"] == n
        assert r["buckets_used"] <= min(n, r["m"])
        assert 0 <= r["colliding_words"] <= n
        assert r["max_load"] >= 1
        assert abs(r["load_factor"] - n / r["m"]) < 2e-4
    # a wider table can only reduce collisions (same hash, more room):
    # monotone in expectation and (md5 fan-out) on this fixture
    assert (
        rows[1024]["colliding_words"]
        >= rows[4096]["colliding_words"]
        >= rows[16384]["colliding_words"]
    )


def test_db_index_positive(spark, sf_dir):
    rows = Q["emb_cluster_separation_db_index"](spark, sf_dir).collect()
    assert 2 <= len(rows) <= 16
    db = rows[0]["db_index"]
    mean_dbi = sum(r["db_i"] for r in rows) / len(rows)
    assert abs(db - mean_dbi) < 1e-2  # index is the mean of DB_i
    for r in rows:
        assert r["n_vecs"] > 0
        assert r["mean_dist"] > 0.0
        assert r["db_i"] > 0.0
        assert r["db_index"] == db


def test_simpson_sign_bookkeeping(spark, sf_dir):
    rows = Q["events_simpson_paradox_check"](spark, sf_dir).collect()
    assert len(rows) == 5
    overall = rows[0]["overall_sign"]
    n_agree = sum(1 for r in rows if r["seg_sign"] == overall)
    for r in rows:
        assert r["seg_sign"] in (-1, 0, 1)
        assert r["overall_sign"] == overall
        assert r["n_agree"] == n_agree
        assert r["n_segments"] == 5
        # sign must agree with the frozen means' comparison direction
        if abs(r["mean_b"] - r["mean_a"]) > 0.05:
            assert r["seg_sign"] == (
                1 if r["mean_b"] > r["mean_a"] else -1
            )
        # reversal iff every segment opposes the aggregate
        assert r["simpson_reversal"] == all(
            rr["seg_sign"] == -overall for rr in rows
        )


def test_design_effect_identity(spark, sf_dir):
    r = Q["sample_cluster_design_effect"](spark, sf_dir).collect()
    assert len(r) == 1
    r = r[0]
    assert r["n_events"] > r["n_users"] > 1
    assert r["ms_between"] > 0.0 and r["ms_within"] > 0.0
    assert -1.0 <= r["icc"] <= 1.0
    assert r["mean_cluster_size"] > 1.0
    assert r["m0_anova"] > 1.0
    # DEFF re-derives from its own parts (within the freezes)
    deff = 1.0 + (r["mean_cluster_size"] - 1.0) * r["icc"]
    assert abs(r["deff"] - deff) < 5e-3
    assert r["deff"] > 0.0
