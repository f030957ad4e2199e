"""Semantic invariants for the r14 wave-29 ops (llm/wave29.py).

Value-level twin parity is covered by tests/test_oracle_parity.py's
registry sweep; these pin what a hash match can't express — the
inversion-depth impossibility bound, prefix-energy monotonicity and
anchors, square-census identities, exact I-chart alarm consistency,
and shard-balance conservation.
"""

from __future__ import annotations

from python_kinesis_streaming_spark.registry import all_queries

Q = all_queries()


def test_inversion_depth_bounded_by_jitter(spark, sf_dir):
    rows = Q["events_arrival_inversion_audit"](spark, sf_dir).collect()
    assert 1 <= len(rows) <= 5
    for r in rows:
        assert 0 <= r["n_inversions"] <= r["n_candidate_pairs"]
        assert 0.0 <= r["inversion_share"] <= 1.0
        # an inversion needs ts gap < jitter gap < 300 s — provable
        assert 0.0 <= r["max_depth_s"] < 300.0


def test_prefix_energy_anchors(spark, sf_dir):
    rows = {
        r["prefix_dims"]: r
        for r in Q["emb_prefix_energy_share"](spark, sf_dir).collect()
    }
    assert set(rows) == {16, 32, 48, 64}
    tot = rows[64]["total_micro"]
    # the 64-dim prefix is everything: share = 1.0 by construction
    assert rows[64]["prefix_micro"] == tot
    assert abs(rows[64]["energy_share"] - 1.0) < 1e-3
    # prefix sums are monotone in the cut
    assert (
        rows[16]["prefix_micro"]
        <= rows[32]["prefix_micro"]
        <= rows[48]["prefix_micro"]
        <= rows[64]["prefix_micro"]
    )
    for r in rows.values():
        assert r["total_micro"] == tot
        assert 0.0 <= r["energy_share"] <= 1.0 + 1e-6
        assert abs(
            r["excess_share"]
            - (r["energy_share"] - r["uniform_expect"])
        ) < 2e-4


def test_square_census_identities(spark, sf_dir):
    r = Q["graph_bipartite_square_density"](spark, sf_dir).collect()
    assert len(r) == 1
    r = r[0]
    assert r["n_edges"] > 0
    assert r["n_copairs"] > 0
    # wedges count >= one per co-pair; squares need m >= 2
    assert r["n_wedges"] >= r["n_copairs"]
    assert r["n_copairs_2plus"] <= r["n_copairs"]
    assert (r["n_squares"] > 0) == (r["n_copairs_2plus"] > 0)
    assert r["max_shared"] >= 1
    assert r["mean_shared_orders"] >= 1.0
    assert 0.0 <= r["repeat_pair_share"] <= 1.0


def test_ichart_alarm_consistency(spark, sf_dir):
    rows = Q["ts_individuals_control_chart"](spark, sf_dir).collect()
    assert len(rows) >= 20
    n_alarms = rows[0]["n_alarms"]
    assert n_alarms == sum(1 for r in rows if r["is_alarm"])
    center = rows[0]["center_cents"]
    for r in rows:
        assert r["lcl_cents"] < center < r["ucl_cents"]
        assert r["n_alarms"] == n_alarms
        assert r["moving_range"] >= 0
        # the exact-integer flag must agree with the frozen limits
        # (away from the boundary; the freeze is 1e-2 cents)
        if (
            r["cents"] > r["ucl_cents"] + 1
            or r["cents"] < r["lcl_cents"] - 1
        ):
            assert r["is_alarm"]
        if r["lcl_cents"] + 1 < r["cents"] < r["ucl_cents"] - 1:
            assert not r["is_alarm"]


def test_shard_balance_conservation(spark, sf_dir):
    rows = Q["corpus_shard_balance_plan"](spark, sf_dir).collect()
    assert len(rows) == 16
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 16e-4 + 1e-6
    ratio = rows[0]["imbalance_ratio"]
    for r in rows:
        assert r["docs"] > 0 and r["toks"] > 0
        assert r["uniform_share"] == 0.0625
        assert r["imbalance_ratio"] == ratio >= 1.0
        assert r["all_shards_nonempty"]
