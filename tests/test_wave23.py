"""Semantic invariants for the r14 wave-23 ops (llm/wave23.py).

Value-level twin parity is covered by tests/test_oracle_parity.py's
registry sweep; these pin what a hash match can't express — the
quantile merge bound must actually hold (and the estimate bracket the
target), vocab overlap identities, the lateness-vs-jitter impossibility
boundary, real time-travel immutability, and the Cauchy-Schwarz
direction of Neyman allocation.
"""

from __future__ import annotations

from python_kinesis_streaming_spark.registry import all_queries

Q = all_queries()


def test_mergeable_quantile_bound_holds(spark, sf_dir):
    rows = Q["agg_mergeable_quantile_audit"](spark, sf_dir).collect()
    assert {round(r["phi"], 2) for r in rows} == {0.1, 0.5, 0.9, 0.99}
    n = rows[0]["n"]
    for r in rows:
        assert r["n"] == n
        # the estimate's true rank reaches the target but overshoots by
        # at most the additive merge bound (the theorem, as a boolean
        # AND re-derived here)
        assert r["within_bound"]
        assert 0 <= r["rank_err"] <= r["bound"]
        assert r["est_rank"] >= r["target_rank"]
        # the merged estimate can only sit at or above the exact
        # quantile value (its rank overshoots, never undershoots)
        assert r["est_cents"] >= r["exact_cents"]
        # bound is ~(S+1)*n_s/k, far below n
        assert 0 < r["bound"] < n // 4


def test_vocab_overlap_identities(spark, sf_dir):
    rows = Q["text_vocab_overlap_matrix"](spark, sf_dir).collect()
    n_src = len({r["src_a"] for r in rows} | {r["src_b"] for r in rows})
    assert len(rows) == n_src * (n_src - 1) // 2
    for r in rows:
        assert r["src_a"] < r["src_b"]
        assert 0 <= r["inter_sz"] <= min(r["sz_a"], r["sz_b"])
        assert 0.0 <= r["jaccard_topv"] <= 1.0
        # OOV under the OTHER source's vocab can never be negative and
        # is capped by the full token mass
        assert 0.0 <= r["oov_b_under_a"] <= 1.0
        assert 0.0 <= r["oov_a_under_b"] <= 1.0
        # a top-V vocab covers at least SOMETHING of a same-language
        # sibling source (the fixture shares function words)
        assert r["oov_b_under_a"] < 1.0


def test_watermark_lateness_boundaries(spark, sf_dir):
    rows = {
        r["delay_s"]: r
        for r in Q["events_watermark_lateness_audit"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == {0, 10, 30, 60, 120, 300}
    n = rows[0]["n_events"]
    # late share is monotonically non-increasing in the delay
    shares = [rows[d]["late_share"] for d in (0, 10, 30, 60, 120, 300)]
    assert shares == sorted(shares, reverse=True)
    # lateness < jitter_max is PROVABLE (ts_f + j_f < ts_e + j_e and
    # j < 300s force ts_f - ts_e < 300s) — the 300 s row must be 0
    assert rows[300]["n_late"] == 0
    assert rows[300]["max_late_s"] < 300.0
    for r in rows.values():
        assert r["n_events"] == n
        assert r["n_on_time"] == rows[0]["n_events"] - rows[0]["n_late"]
        assert abs(r["late_share"] - r["n_late"] / n) < 1e-3


def test_time_travel_versions_and_diff(spark, sf_dir):
    rows = {
        r["status"]: r
        for r in Q["lakehouse_time_travel_diff"](spark, sf_dir).collect()
    }
    assert rows["added"]["n"] > 0  # the late-order upsert
    assert rows["changed"]["n"] > 0  # even-key reprice
    assert "removed" not in rows  # nothing deleted between versions
    assert rows["unchanged"]["n"] > 0
    for r in rows.values():
        assert r["n_versions"] == 2
    # the v0 read is immune to the v1 commit: re-running the op (which
    # clears and rebuilds scratch) must reproduce the same histogram —
    # scratch idempotency AND immutability in one
    again = {
        r["status"]: r["n"]
        for r in Q["lakehouse_time_travel_diff"](spark, sf_dir).collect()
    }
    assert again == {k: v["n"] for k, v in rows.items()}


def test_neyman_allocation_theorem(spark, sf_dir):
    rows = Q["sample_neyman_allocation_audit"](spark, sf_dir).collect()
    assert len(rows) == 5  # one per event_type
    tot_prop = sum(r["alloc_prop"] for r in rows)
    tot_ney = sum(r["alloc_neyman"] for r in rows)
    # allocations exhaust the literal budget (up to the 1e-2 freeze)
    assert abs(tot_prop - 10000.0) < 1.0
    assert abs(tot_ney - 10000.0) < 1.0
    for r in rows:
        assert r["neyman_no_worse"]  # Cauchy-Schwarz, every row
        assert r["alloc_prop"] > 0 and r["alloc_neyman"] > 0
        assert r["sd_cents"] >= 0.0
    v_prop = rows[0]["var_prop"]
    v_ney = rows[0]["var_neyman"]
    assert v_ney <= v_prop
    assert all(
        r["var_prop"] == v_prop and r["var_neyman"] == v_ney for r in rows
    )
