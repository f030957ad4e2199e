"""Semantic invariants for the r14 wave-24 ops (llm/wave24.py).

Value-level twin parity is covered by tests/test_oracle_parity.py's
registry sweep; these pin what a hash match can't express — gap-sweep
monotonicity and conservation, Heaps-beta domain, the assortativity
guard, REAL pruning correctness/monotonicity, and LOO arithmetic
identities.
"""

from __future__ import annotations

from python_kinesis_streaming_spark.registry import all_queries

Q = all_queries()


def test_session_gap_sweep_monotonic(spark, sf_dir):
    rows = {
        r["gap_s"]: r
        for r in Q["events_session_gap_sweep"](spark, sf_dir).collect()
    }
    assert set(rows) == {300, 900, 1800, 3600, 7200}
    gaps = sorted(rows)
    # a larger gap can only merge sessions: counts non-increasing,
    # collapsed idle mass non-increasing, mean size non-decreasing
    for a, b in zip(gaps, gaps[1:]):
        assert rows[a]["n_sessions"] >= rows[b]["n_sessions"]
        assert rows[a]["idle_hours"] >= rows[b]["idle_hours"]
        assert (
            rows[a]["avg_events_per_session"]
            <= rows[b]["avg_events_per_session"]
        )
    for r in rows.values():
        # every user has at least one session; sessions <= events
        assert r["n_users"] <= r["n_sessions"] <= r["n_events"]
        assert abs(
            r["session_start_share"] - r["n_sessions"] / r["n_events"]
        ) < 1e-3


def test_heaps_fit_domain(spark, sf_dir):
    r = Q["text_heaps_law_fit"](spark, sf_dir).collect()
    assert len(r) == 1
    r = r[0]
    # half-corpus is a strict subset: fewer tokens, no more vocab
    assert 0 < r["tokens_half"] < r["tokens_full"]
    assert 0 < r["vocab_half"] <= r["vocab_full"]
    assert r["vocab_full"] <= r["tokens_full"]
    # Heaps beta for any monotone vocabulary growth lies in [0, 1]
    assert 0.0 <= r["beta_heaps"] <= 1.0
    assert 0.0 <= r["hapax_share_half"] <= 1.0
    assert 0.0 <= r["hapax_share_full"] <= 1.0


def test_assortativity_domain(spark, sf_dir):
    r = Q["graph_degree_assortativity"](spark, sf_dir).collect()
    assert len(r) == 1
    r = r[0]
    assert r["n_edges"] > 0
    assert -1.0 <= r["assortativity_r"] <= 1.0
    assert 1.0 <= r["mean_deg_order"] <= r["max_deg_order"]
    assert 1.0 <= r["mean_deg_supp"] <= r["max_deg_supp"]
    # lineitem orders touch few suppliers; suppliers serve many orders
    assert r["max_deg_order"] < r["max_deg_supp"]


def test_manifest_prune_real_correctness(spark, sf_dir):
    rows = {
        r["probe_id"]: r
        for r in Q["lakehouse_manifest_prune_audit"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == {0, 1, 2, 3}
    for r in rows.values():
        # THE invariant: pruning may over-keep, never drop a match
        assert r["prune_correct"]
        assert r["rows_matched"] <= r["rows_in_kept_files"]
        assert 1 <= r["files_kept"] <= r["files_total"]
        assert 0.0 <= r["file_skip_share"] < 1.0
    # the full-span probe keeps everything
    full = rows[3]
    assert full["files_kept"] == full["files_total"]
    assert full["file_skip_share"] == 0.0
    # a one-eighth probe must actually skip files
    assert rows[0]["files_kept"] < rows[0]["files_total"]


def test_ablation_matrix_identities(spark, sf_dir):
    rows = Q["corpus_source_ablation_matrix"](spark, sf_dir).collect()
    assert len(rows) == 20  # one per source
    tot_share = sum(r["token_share_removed"] for r in rows)
    # shares partition the corpus (up to the 1e-4 freeze per row)
    assert abs(tot_share - 1.0) < 20 * 1e-4 + 1e-6
    for r in rows:
        assert r["docs_s"] > 0 and r["toks_s"] > 0
        assert 0.0 < r["token_share_removed"] < 1.0
        assert r["loo_mean_tokens"] > 0
        assert 0.0 <= r["loo_en_share"] <= 1.0
        # removing one of 20 sources can't move the mean violently
        assert abs(r["delta_mean_tokens"]) < r["loo_mean_tokens"]
