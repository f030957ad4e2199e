"""Semantic invariants for the r14 wave-28 ops (llm/wave28.py).

Value-level twin parity is covered by tests/test_oracle_parity.py's
registry sweep; these pin what a hash match can't express — the
sampling-bias direction, real restore equality + the v1-differs
guard, the w=1 variance anchor, hazard bookkeeping, and the
log-normal band domain.
"""

from __future__ import annotations

from python_kinesis_streaming_spark.registry import all_queries

Q = all_queries()


def test_sample_bias_direction(spark, sf_dir):
    rows = {
        r["rate_pct"]: r
        for r in Q["dedup_sample_bias_audit"](spark, sf_dir).collect()
    }
    assert set(rows) == {10, 25, 50}
    full = rows[10]["dup_rate_full"]
    for r in rows.values():
        assert r["dup_rate_full"] == full
        assert 0 < r["n_sampled"] < r["n_docs"]
        assert 0.0 <= r["dup_rate_sampled"] <= 1.0
        # the trap: a sample can only UNDERESTIMATE the dup rate
        # (dropping a group member can demote a dup, never create one)
        assert r["dup_rate_sampled"] <= full + 1e-6
        if r["n_dup_sampled"] > 0:
            assert 0.0 < r["observed_ratio"] <= 1.0 + 1e-6


def test_restore_is_exact_and_meaningful(spark, sf_dir):
    r = Q["lakehouse_snapshot_restore_audit"](spark, sf_dir).collect()
    assert len(r) == 1
    r = r[0]
    assert r["n_versions"] == 3
    assert r["restore_exact"]  # head == v0, row-for-row
    assert r["v1_differs"]  # the rollback actually undid something
    assert r["head_rows"] == r["v0_rows"] > 0
    assert r["head_sum_cents"] == r["v0_sum_cents"]


def test_rollup_variance_anchor(spark, sf_dir):
    rows = {
        r["width_days"]: r
        for r in Q["ts_rollup_variance_retention"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == {1, 2, 7}
    # w=1 buckets ARE the daily series: full variance retained
    assert abs(rows[1]["variance_retained"] - 1.0) < 1e-3
    for w, r in rows.items():
        assert 0.0 <= r["variance_retained"] <= 1.0 + 1e-6
        assert r["n_buckets"] >= 1
        assert r["peak_bucket_cents"] > 0
    # coarser buckets can only lose variance
    assert (
        rows[1]["variance_retained"]
        >= rows[2]["variance_retained"]
        >= rows[7]["variance_retained"]
    )
    assert rows[1]["n_buckets"] > rows[2]["n_buckets"] > rows[7]["n_buckets"]


def test_hazard_bookkeeping(spark, sf_dir):
    rows = Q["events_weekly_churn_hazard"](spark, sf_dir).collect()
    assert len(rows) >= 2  # the fixture spans >= 3 weeks
    for r in rows:
        assert 0 <= r["n_retained"] <= r["n_active"]
        assert 0.0 <= r["retention"] <= 1.0
        assert 0.0 <= r["hazard"] <= 1.0
        assert abs(r["retention"] + r["hazard"] - 1.0) < 2e-4


def test_lognormal_fit_domains(spark, sf_dir):
    rows = Q["text_length_lognormal_fit"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["n_docs"] > 0
        assert r["mean_ln_len"] > 0.0
        assert r["sd_ln_len"] >= 0.0
        assert 0.0 <= r["within_1sd_share"] <= 1.0
        assert r["normal_expect"] == 0.6827
        assert (
            abs(
                r["lognormal_dev"]
                - abs(r["within_1sd_share"] - 0.6827)
            )
            < 2e-4
        )
