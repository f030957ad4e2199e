"""Semantic invariants for the r11 wave-5 ops (llm/wave5.py).

Value-level twin parity is covered by tests/test_oracle_parity.py's
registry sweep; these tests pin the properties that make the audits
meaningful — ledger conservation, the deterministic sample's exact
size, the greedy MMR score monotonicity, datasheet mass conservation,
IVF assignment totality — which a hash match alone can't express.
"""

from __future__ import annotations

from python_kinesis_streaming_spark.registry import all_queries

Q = all_queries()


def test_k_anonymity_ledger_conserves(spark, sf_dir, duck):
    rows = Q["dq_k_anonymity"](spark, sf_dir).collect()
    n_docs = duck.execute("SELECT count(*) FROM documents").fetchone()[0]
    n_langs = duck.execute(
        "SELECT count(DISTINCT lang) FROM documents"
    ).fetchone()[0]
    assert len(rows) == n_langs
    assert sum(r["n_rows"] for r in rows) == n_docs
    for r in rows:
        assert 0 <= r["n_small_groups"] <= r["n_groups"]
        assert 0 <= r["rows_at_risk"] <= r["n_rows"]
        assert 0.0 <= r["pct_at_risk"] <= 1.0


def test_reservoir_sample_is_exactly_k(spark, sf_dir):
    rows = Q["sample_reservoir_hash"](spark, sf_dir).collect()
    assert sum(r["n_sampled"] for r in rows) == 100
    total_expected = sum(r["expected"] for r in rows)
    assert abs(total_expected - 100.0) < 0.1
    for r in rows:
        assert 0 <= r["n_sampled"] <= r["n_src"]


def test_mmr_greedy_scores_are_non_increasing(spark, sf_dir):
    rows = Q["sim_mmr_diversify"](spark, sf_dir).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["qid"], {})[r["step"]] = r
    for qid, steps in by_q.items():
        assert sorted(steps) == [1, 2, 3, 4, 5], (qid, sorted(steps))
        picks = [steps[t]["vec_id"] for t in (1, 2, 3, 4, 5)]
        assert len(set(picks)) == 5, "greedy must never re-pick"
        assert qid not in picks
        # from step 2 onward the max marginal score is non-increasing:
        # each candidate's max-sim-to-picked only grows as the picked
        # set grows and the pool only shrinks. Step 1 -> 2 carries NO
        # such bound — cosines can be negative, so -0.3*ms can ADD
        # margin when the first pick is dissimilar to the runner-up.
        scores = [steps[t]["mmr_score"] for t in (2, 3, 4, 5)]
        assert all(a >= b for a, b in zip(scores, scores[1:])), scores
        # step 1 is the pure-relevance argmax: its relevance term is
        # the maximum, so no later PICK can have higher 0.7*rel
        rel1 = steps[1]["mmr_score"]  # == 0.7 * rel_max
        for t in (2, 3, 4, 5):
            assert steps[t]["mmr_score"] <= rel1 + 0.3, (
                "marginal score exceeds 0.7*rel_max + 0.3 bound"
            )


def test_datasheet_mass_conserves(spark, sf_dir, duck):
    rows = Q["corpus_datasheet_report"](spark, sf_dir).collect()
    n_src, n_docs = duck.execute(
        "SELECT count(DISTINCT source), count(*) FROM documents"
    ).fetchone()
    assert len(rows) == n_src
    assert sum(r["n_docs"] for r in rows) == n_docs
    langs = {
        r[0]
        for r in duck.execute(
            "SELECT DISTINCT lang FROM documents"
        ).fetchall()
    }
    for r in rows:
        assert 1 <= r["n_langs"] <= len(langs)
        assert r["top_lang"] in langs
        assert r["mean_chars_per_token"] > 0
        assert r["p50_doc_tokens"] > 0


def test_ivf_assignment_is_total(spark, sf_dir, duck):
    rows = Q["emb_ivf_balance_audit"](spark, sf_dir).collect()
    n_vecs = duck.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    assert len(rows) == 8
    assert sum(r["n_vecs"] for r in rows) == n_vecs
    assert abs(sum(r["frac"] for r in rows) - 1.0) < 0.01
    imb = {r["imbalance_factor"] for r in rows}
    assert len(imb) == 1 and imb.pop() >= 1.0
