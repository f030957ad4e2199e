"""Semantic invariants for the r11 wave-4 ops (llm/wave4.py).

Value-level twin parity is covered by tests/test_oracle_parity.py's
registry sweep; these tests pin the properties that make the reports
meaningful — provable recall monotonicity across the NN-descent round,
the exact-baseline anchor in the Matryoshka sweep, non-overlapping
curriculum envelopes, cap-ledger conservation — which a hash match
alone can't express.
"""

from __future__ import annotations

from python_kinesis_streaming_spark.registry import all_queries

Q = all_queries()


def test_prefilter_report_shape_and_adaptive_gain(spark, sf_dir):
    rows = {
        r["prefilter"]: r
        for r in Q["sim_prefilter_quality_report"](spark, sf_dir).collect()
    }
    assert sorted(rows) == ["randproj16", "sketch16", "variance16"]
    n_queries = {r["n_queries"] for r in rows.values()}
    assert len(n_queries) == 1 and n_queries.pop() > 0
    for r in rows.values():
        assert 0.0 <= r["min_recall_at_5"] <= r["mean_recall_at_5"] <= 1.0
    # the data-adaptive sketch must not lose to its own JL control
    # (same Omega, one extra covariance pass — wave-3's pinned fact)
    assert (
        rows["sketch16"]["mean_recall_at_5"]
        >= rows["randproj16"]["mean_recall_at_5"]
    )


def test_matryoshka_full_width_is_exact(spark, sf_dir):
    rows = {
        r["prefix_dims"]: r
        for r in Q["emb_matryoshka_prefix_recall"](spark, sf_dir).collect()
    }
    assert sorted(rows) == [8, 16, 32, 64]
    n_queries = {r["n_queries"] for r in rows.values()}
    assert len(n_queries) == 1 and n_queries.pop() > 0
    # the 64-dim leg IS the exact baseline — recall exactly 1.0
    assert rows[64]["mean_recall_at_5"] == 1.0
    for r in rows.values():
        assert 0.0 <= r["mean_recall_at_5"] <= 1.0


def test_nndescent_round_never_loses_recall(spark, sf_dir):
    rows = {
        r["stage"]: r
        for r in Q["emb_nndescent_round"](spark, sf_dir).collect()
    }
    assert sorted(rows) == ["1_simhash_block", "2_after_round"]
    assert (
        rows["1_simhash_block"]["n_queries"]
        == rows["2_after_round"]["n_queries"]
        > 0
    )
    # candidates ⊇ seed edges and an exact rerank never evicts a true
    # top-3 member ⇒ recall is non-decreasing across the round
    assert (
        rows["2_after_round"]["mean_recall_at_3"]
        >= rows["1_simhash_block"]["mean_recall_at_3"]
    )
    for r in rows.values():
        assert 0.0 <= r["mean_recall_at_3"] <= 1.0


def test_curriculum_envelopes_do_not_overlap(spark, sf_dir, duck):
    rows = {
        r["stage"]: r
        for r in Q["corpus_curriculum_order"](spark, sf_dir).collect()
    }
    assert sorted(rows) == [1, 2, 3, 4]
    n_docs = duck.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert sum(r["n_docs"] for r in rows.values()) == n_docs
    for s in (1, 2, 3, 4):
        r = rows[s]
        assert r["min_difficulty"] <= r["mean_difficulty"] <= r["max_difficulty"]
        assert r["n_docs"] > 0 and r["n_tokens"] > 0
    # value-bucketed quartiles: stage envelopes are non-overlapping
    for lo, hi in [(1, 2), (2, 3), (3, 4)]:
        assert rows[lo]["max_difficulty"] <= rows[hi]["min_difficulty"]


def test_repetition_cap_ledger_conserves(spark, sf_dir, duck):
    rows = Q["corpus_repetition_cap"](spark, sf_dir).collect()
    srcs = duck.execute(
        "SELECT count(DISTINCT source) FROM documents"
    ).fetchone()[0]
    assert len(rows) == srcs
    n_base, n_m4, n_m9 = duck.execute(
        """SELECT count(*),
                  count(*) FILTER (doc_id % 4 = 0),
                  count(*) FILTER (doc_id % 9 = 0)
           FROM documents"""
    ).fetchone()
    total_rows = sum(r["n_rows"] for r in rows)
    assert total_rows == n_base + 2 * n_m4 + n_m9
    assert sum(r["n_unique"] for r in rows) == n_base, (
        "fixture has no exact dups: one hash group per base doc"
    )
    for r in rows:
        assert r["n_dropped"] >= 0
        assert r["n_rows"] - r["n_dropped"] <= 2 * r["n_unique"], (
            "cap=2 bounds kept copies"
        )
        assert r["dup_ratio"] >= 1.0
        assert r["kept_tokens"] > 0
