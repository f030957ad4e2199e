"""Semantic invariants for the r12 wave-7 ops (llm/wave7.py).

Value-level twin parity is covered by tests/test_oracle_parity.py's
registry sweep; these tests pin the properties a hash match can't
express — SemDeDup conservation and threshold monotonicity, substring
span accounting, DSIR weight/selection consistency, and the ECE
identity over the reliability bins.
"""

from __future__ import annotations

from python_kinesis_streaming_spark.registry import all_queries

Q = all_queries()


def test_semdedup_prune_conserves_members(spark, sf_dir, duck):
    rows = Q["dedup_semdedup_prune"](spark, sf_dir).collect()
    n_emb = duck.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    assert sum(r["n_members"] for r in rows) == n_emb
    assert len(rows) == 8 and {r["cid"] for r in rows} == set(range(8))
    for r in rows:
        assert 0 <= r["n_pruned"] < r["n_members"]
        expect = (r["n_members"] - r["n_pruned"]) / r["n_members"]
        assert abs(r["keep_ratio"] - expect) < 2e-4
        assert 0.0 <= r["max_intra_sim"] < 1.0
        # tau=0.30: anything pruned implies a pair at/above the threshold
        if r["n_pruned"] > 0:
            assert r["max_intra_sim"] >= 0.30


def test_semdedup_eps_sweep_monotone(spark, sf_dir):
    rows = sorted(
        Q["dedup_semdedup_eps_sweep"](spark, sf_dir).collect(),
        key=lambda r: r["eps"],
    )
    assert [r["eps"] for r in rows] == [0.25, 0.30, 0.35]
    for r in rows:
        assert r["n_kept"] + r["n_pruned"] == r["n_total"]
        assert abs(r["prune_ratio"] - r["n_pruned"] / r["n_total"]) < 2e-4
    pruned = [r["n_pruned"] for r in rows]
    assert pruned == sorted(pruned, reverse=True), pruned


def test_semdedup_sweep_agrees_with_prune_at_tau(spark, sf_dir):
    per_cell = Q["dedup_semdedup_prune"](spark, sf_dir).collect()
    sweep = {
        r["eps"]: r
        for r in Q["dedup_semdedup_eps_sweep"](spark, sf_dir).collect()
    }
    assert sweep[0.30]["n_pruned"] == sum(r["n_pruned"] for r in per_cell)


def test_substring_spans_accounting(spark, sf_dir, duck):
    rows = Q["dedup_substring_spans"](spark, sf_dir).collect()
    truth = dict(
        duck.execute(
            "SELECT source, count(*) FROM documents GROUP BY source"
        ).fetchall()
    )
    assert {r["source"] for r in rows} == set(truth)
    for r in rows:
        assert r["n_docs"] == truth[r["source"]]
        assert 0 <= r["n_docs_with_dup"] <= r["n_docs"]
        assert r["n_spans"] >= r["n_docs_with_dup"]
        # each span covers >= 4 words (one 4-gram), so coverage bounds:
        assert r["dup_words"] >= 4 * r["n_spans"] or r["n_spans"] == 0
        assert r["dup_words"] <= r["total_words"]
        assert abs(r["dup_ratio"] - r["dup_words"] / r["total_words"]) < 2e-4


def test_dsir_weights_consistency(spark, sf_dir, duck):
    rows = Q["corpus_dsir_weights"](spark, sf_dir).collect()
    n_docs = duck.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert any(r["n_selected"] > 0 for r in rows)
    for r in rows:
        assert 0 <= r["n_selected"] <= r["n_docs"]
        assert r["max_w"] >= r["mean_w"] - 2e-4
        # a positive max weight is required wherever anything is selected
        if r["n_selected"] > 0:
            assert r["max_w"] > 0


def test_calibration_report_identities(spark, sf_dir, duck):
    rows = Q["dq_calibration_report"](spark, sf_dir).collect()
    n_docs = duck.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert sum(r["n"] for r in rows) == n_docs
    eces = {r["ece"] for r in rows}
    assert len(eces) == 1
    ece = eces.pop()
    assert 0.0 <= ece <= 1.0
    # ECE == n-weighted mean gap (recomputed from the emitted bins)
    approx = sum(r["n"] * r["gap"] for r in rows) / n_docs
    assert abs(ece - approx) < 5e-4
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert 0.0 <= r["mean_conf"] <= 1.0
        assert 0.0 <= r["frac_pos"] <= 1.0
        assert abs(r["gap"] - abs(r["frac_pos"] - r["mean_conf"])) < 5e-4
