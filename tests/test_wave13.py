"""Semantic invariants for the r12 wave-13 ops (llm/wave13.py).

Value-level twin parity is covered by tests/test_oracle_parity.py's
registry sweep; these pin what a hash match can't express — spectrum
accounting, gate-sweep monotonicity, contrast geometry, the b-bit
estimator's behavior on known near-dup vs random pairs, and PRF
ranking sanity.
"""

from __future__ import annotations

from python_kinesis_streaming_spark.registry import all_queries

Q = all_queries()


def test_periodogram_spectrum(spark, sf_dir, duck):
    rows = Q["ts_periodogram_dominant"](spark, sf_dir).collect()
    n_types = duck.execute(
        "SELECT count(DISTINCT event_type) FROM events"
    ).fetchone()[0]
    assert len(rows) == n_types * 8  # k = 1..8 per type
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
        assert 1 <= r["k"] <= 8
        assert r["power"] >= 0.0
        assert r["period_days"] > 0
    for t, rs in by_type.items():
        assert len(rs) == 8
        doms = [r for r in rs if r["is_dominant"] == 1]
        assert len(doms) == 1, t
        assert doms[0]["power"] == max(r["power"] for r in rs)


def test_quality_gate_sweep_monotone(spark, sf_dir, duck):
    rows = sorted(
        Q["dq_quality_gate_sweep"](spark, sf_dir).collect(),
        key=lambda r: r["thr_micro"],
    )
    assert [r["thr_micro"] for r in rows] == [
        300000, 500000, 700000, 900000
    ]
    n_docs, n_tokens = duck.execute(
        """SELECT count(*), sum(len(string_split(text, ' ')))
           FROM documents"""
    ).fetchone()
    for a, b in zip(rows, rows[1:]):
        # tighter gates keep nested subsets
        assert a["n_kept"] >= b["n_kept"]
        assert a["tokens_kept"] >= b["tokens_kept"]
    for r in rows:
        assert 0 <= r["n_kept"] <= n_docs
        assert 0 <= r["tokens_kept"] <= n_tokens
        assert 0.0 <= r["frac_docs_kept"] <= 1.0
        assert 0.0 <= r["en_share_kept"] <= 1.0


def test_distance_contrast_geometry(spark, sf_dir, duck):
    rows = Q["sim_distance_contrast_audit"](spark, sf_dir).collect()
    n_vecs = duck.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    assert len(rows) >= 2
    for r in rows:
        assert r["qid"] % 50 == 0
        assert r["n_others"] == n_vecs - 1
        assert 0.0 <= r["d2_min"] <= r["d2_mean"] <= r["d2_max"]
        # unit-ish vectors: squared L2 bounded by (|a|+|b|)^2 ~ 4
        assert r["d2_max"] <= 4.5
        assert r["rel_contrast"] >= 0.0


def test_bbit_estimator_separates_classes(spark, sf_dir):
    rows = Q["dedup_bbit_minhash_estimate"](spark, sf_dir).collect()
    near = [r for r in rows if r["pair_class"] == "near_dup"]
    rand = [r for r in rows if r["pair_class"] == "random"]
    assert near and rand
    for r in rows:
        assert 0 <= r["match_bits"] <= 16
        assert -1.0 <= r["j_bbit"] <= 1.0
        assert 0.0 <= r["j_exact"] <= 1.0
        assert r["abs_err"] >= 0.0
    # the estimator must separate the two populations on average
    mean_near = sum(r["j_bbit"] for r in near) / len(near)
    mean_rand = sum(r["j_bbit"] for r in rand) / len(rand)
    assert mean_near > 0.7
    assert mean_rand < 0.5
    # exact Jaccard ground truth behaves as injected (a short doc
    # loses a larger shingle fraction to the appended token — sf0.01
    # floor is 0.889)
    assert all(r["j_exact"] > 0.8 for r in near)
    assert all(r["j_exact"] < 0.3 for r in rand)


def test_rocchio_expansion_ranking(spark, sf_dir):
    rows = sorted(
        Q["text_rocchio_prf_expansion"](spark, sf_dir).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["rank"] for r in rows] == list(range(1, 11))
    scores = [r["score_micro"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # expansion keeps the query anchored: some base docs must survive
    assert sum(r["in_base_top10"] for r in rows) >= 3
    for r in rows:
        assert r["in_base_top10"] in (0, 1)
        assert r["score_micro"] > 0
