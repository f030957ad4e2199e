"""Semantic invariants for the r13 wave-20 ops (llm/wave20.py).

Value-level twin parity is covered by tests/test_oracle_parity.py's
registry sweep; these pin what a hash match can't express — whitening
must actually whiten, drift is the |ECE delta|, padding arithmetic
identities, binarized recall domains, and winsorization direction.
"""

from __future__ import annotations

from python_kinesis_streaming_spark.registry import all_queries

Q = all_queries()


def test_whitening_whitens(spark, sf_dir):
    r = Q["emb_whitening_audit"](spark, sf_dir).collect()
    assert len(r) == 1
    r = r[0]
    # diagonal standardization must collapse the centroid and flatten
    # the variance spectrum on this (independent-dim) fixture
    assert r["anisotropy_after"] <= r["anisotropy_before"]
    assert r["anisotropy_after"] < 0.001
    assert abs(r["top16_var_share_after"] - 0.25) < 0.01
    assert r["top16_var_share_before"] >= r["top16_var_share_after"]
    # standardized coordinates have unit variance -> E||z||^2 ~ 64
    assert abs(r["mean_norm_sq_after"] - 64.0) < 1.0


def test_calibration_drift_structure(spark, sf_dir):
    rows = Q["dq_calibration_drift"](spark, sf_dir).collect()
    halves = {r["half"] for r in rows}
    assert halves == {0, 1}
    eces = {}
    for r in rows:
        assert 0.0 <= r["mean_conf"] <= 1.0
        assert 0.0 <= r["frac_pos"] <= 1.0
        assert r["n"] > 0
        eces[r["half"]] = r["ece_half"]
        drift = r["ece_drift"]
    assert abs(abs(eces[1] - eces[0]) - drift) < 1e-3
    # both halves of the stationary fixture calibrate equally badly
    assert drift < 0.05


def test_padding_waste_identities(spark, sf_dir):
    rows = Q["corpus_padding_waste_curve"](spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], {})[r["l"]] = r
    assert len(by_src) == 20
    for src, ls in by_src.items():
        assert set(ls) == {32, 64, 128}
        for l, r in ls.items():
            # conservation: padded = chunks*L = tokens + waste
            assert r["n_chunks"] * l == r["n_tokens"] + r["pad_tokens"]
            assert 0.0 <= r["waste_share"] < 1.0
            assert 0.0 < r["tail_chunk_share"] <= 1.0
        # a larger L can only increase per-doc padding waste share
        # when docs are shorter than L (the fixture's regime)
        assert ls[128]["pad_tokens"] >= ls[64]["pad_tokens"]
        assert ls[64]["pad_tokens"] >= ls[32]["pad_tokens"]


def test_binarize_recall_domains(spark, sf_dir, duck):
    rows = Q["emb_sign_binarize_recall"](spark, sf_dir).collect()
    n_q = duck.execute(
        "SELECT count(*) FROM embeddings WHERE vec_id % 50 = 0"
    ).fetchone()[0]
    assert len(rows) == n_q
    for r in rows:
        assert r["qid"] % 50 == 0
        assert 0 <= r["hits"] <= 10
        assert abs(r["recall_at_10"] - r["hits"] / 10.0) < 1e-3
    # 64 sign bits retain SOME cosine signal on real vectors
    assert sum(r["hits"] for r in rows) > 0


def test_winsorize_sensitivity_direction(spark, sf_dir):
    rows = sorted(
        Q["events_winsorize_sensitivity"](spark, sf_dir).collect(),
        key=lambda r: r["cap"],
    )
    assert [r["cap"] for r in rows] == [10000, 15000, 25000]
    for r in rows:
        assert r["n_a"] > 0 and r["n_b"] > 0
        assert (
            abs(
                r["lift_sensitivity"]
                - abs(r["lift_raw"] - r["lift_winsorized"])
            )
            < 1e-4
        )
        # raw lift is cap-independent
        assert r["lift_raw"] == rows[0]["lift_raw"]
    # a tighter cap can only move the lift further from raw (weakly,
    # on this fixture's one-sided tail)
    assert rows[0]["lift_sensitivity"] >= rows[-1]["lift_sensitivity"]
