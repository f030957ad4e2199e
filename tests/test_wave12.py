"""Semantic invariants for the r12 wave-12 ops (llm/wave12.py).

Value-level twin parity is covered by tests/test_oracle_parity.py's
registry sweep; these pin what a hash match can't express — the
Misra-Gries guarantees actually holding on the live sketch, z-order
beating natural order, MAD accounting, per-cell sample caps, and the
isotropy identities.
"""

from __future__ import annotations

from python_kinesis_streaming_spark.registry import all_queries

Q = all_queries()


def test_heavy_hitter_guarantees_hold(spark, sf_dir, duck):
    rows = Q["text_heavy_hitters_mg"](spark, sf_dir).collect()
    assert len(rows) == 10
    n_tokens = duck.execute(
        """SELECT count(*) FROM (
               SELECT unnest(string_split(text, ' ')) FROM documents)"""
    ).fetchone()[0]
    cfs = [r["exact_cf"] for r in rows]
    assert cfs == sorted(cfs, reverse=True)
    for r in rows:
        assert r["n_tokens"] == n_tokens
        assert r["bound"] == n_tokens // 65  # k = 64
        # the sketch theorems, CHECKED against the live merged sketch
        assert r["found_ok"] == 1
        assert r["est_within_bound"] == 1
        assert r["detect_guaranteed"] == (
            1 if r["exact_cf"] > r["bound"] else 0
        )


def test_zorder_beats_natural_order(spark, sf_dir):
    rows = {r["layout"]: r for r in Q["lakehouse_zorder_layout_audit"](
        spark, sf_dir
    ).collect()}
    assert set(rows) == {"zorder", "natural"}
    for r in rows.values():
        assert 1 <= r["n_buckets"] <= 256
        assert 0 <= r["total_scanned"] <= r["n_buckets"] * 16
        assert 0.0 <= r["avg_skip_frac"] <= 1.0
    # the entire point: interleaved bits bound BOTH dims' spans
    assert (
        rows["zorder"]["avg_skip_frac"]
        > rows["natural"]["avg_skip_frac"] + 0.5
    )


def test_mad_anomaly_accounting(spark, sf_dir, duck):
    rows = Q["ts_anomaly_mad"](spark, sf_dir).collect()
    n_types, n_events = duck.execute(
        "SELECT count(DISTINCT event_type), count(*) FROM events"
    ).fetchone()
    assert len(rows) == n_types
    assert sum(r["n"] for r in rows) == n_events
    for r in rows:
        assert r["median_value"] > 0
        assert r["mad_value"] > 0
        assert 0 <= r["n_anomalies"] < r["n"]
        # MAD flags are robust: under any distribution the flagged
        # fraction of a 3*1.4826*MAD rule stays a small minority
        assert r["anomaly_rate"] < 0.25
        assert r["max_dev_value"] >= 0


def test_cluster_sample_caps_and_fractions(spark, sf_dir, duck):
    rows = Q["corpus_cluster_balanced_sample"](spark, sf_dir).collect()
    n_vecs = duck.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    assert sum(r["n_members"] for r in rows) == n_vecs
    for r in rows:
        assert 0 <= r["cid"] < 8
        assert r["n_sampled"] == min(r["n_members"], 16)
        assert 1 <= r["n_labels_sampled"] <= min(r["n_sampled"], 10)
        assert abs(r["sample_frac"] - r["n_sampled"] / r["n_members"]) < 1e-3


def test_isotropy_identities(spark, sf_dir):
    rows = Q["emb_isotropy_audit"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_vecs"] > 0
    assert r["mean_norm_sq"] > 0
    assert 0.0 <= r["anisotropy"] <= 1.0
    # anisotropy = centroid_norm_sq / mean_norm_sq (both rounded)
    assert (
        abs(r["anisotropy"] - r["centroid_norm_sq"] / r["mean_norm_sq"])
        < 1e-4
    )
    assert -1.0 <= r["mean_adjacent_cos"] <= 1.0
    # top-16 of 64 dims hold at least their pigeonhole share
    assert 0.25 <= r["top16_var_share"] <= 1.0
