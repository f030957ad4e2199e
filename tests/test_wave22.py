"""Semantic invariants for the r13 wave-22 ops (llm/wave22.py).

Value-level twin parity is covered by tests/test_oracle_parity.py's
registry sweep; these pin what a hash match can't express — funnel
monotonicity + token conservation, the cohort triangle's structure,
MAD-flag arithmetic, the histogram's pair-cost identity, and JS
symmetry/bounds.
"""

from __future__ import annotations

from python_kinesis_streaming_spark.registry import all_queries

Q = all_queries()


def test_token_funnel_monotone(spark, sf_dir):
    rows = {
        r["stage"]: r
        for r in Q["corpus_dedup_token_funnel"](spark, sf_dir).collect()
    }
    assert set(rows) == {"0_raw", "1_exact", "2_normalized", "3_near"}
    order = ["0_raw", "1_exact", "2_normalized", "3_near"]
    # tokens only ever leave the funnel, and every stage removes some
    # (each injected dup class is caught by exactly one stage)
    for a, b in zip(order, order[1:]):
        assert rows[b]["survivor_tokens"] < rows[a]["survivor_tokens"]
        assert (
            rows[b]["removed_tokens"]
            == rows[a]["survivor_tokens"] - rows[b]["survivor_tokens"]
        )
    assert rows["0_raw"]["removed_tokens"] == 0
    assert rows["0_raw"]["survivor_share"] == 1.0
    assert 0.0 < rows["3_near"]["survivor_share"] < 1.0


def test_cohort_matrix_structure(spark, sf_dir, duck):
    rows = Q["events_retention_cohort_matrix"](spark, sf_dir).collect()
    n_signup = duck.execute(
        """SELECT count(DISTINCT user_id) FROM events
           WHERE event_type = 'signup'"""
    ).fetchone()[0]
    sizes = {}
    for r in rows:
        sizes[r["cohort_week"]] = r["n_cohort"]
        assert 0 < r["n_active"] <= r["n_cohort"]
        assert 0.0 < r["retention"] <= 1.0
        assert r["age_week"] >= 0
        # age 0 contains the signup event itself -> full retention
        if r["age_week"] == 0:
            assert r["retention"] == 1.0
    assert sum(sizes.values()) == n_signup
    # every cohort has its age-0 row
    assert all(
        any(
            r["cohort_week"] == cw and r["age_week"] == 0 for r in rows
        )
        for cw in sizes
    )


def test_peak_outlier_flag_arithmetic(spark, sf_dir, duck):
    r = Q["emb_peak_outlier_audit"](spark, sf_dir).collect()
    assert len(r) == 1
    r = r[0]
    n_vecs = duck.execute(
        "SELECT count(*) FROM embeddings"
    ).fetchone()[0]
    assert r["n_vecs"] == n_vecs
    assert 0.0 < r["median_peak"] < 1.0
    assert r["mad_peak"] > 0.0  # peaks vary (norms would be degenerate)
    assert 0 <= r["n_outliers"] < n_vecs
    assert abs(r["outlier_rate"] - r["n_outliers"] / n_vecs) < 1e-3
    assert r["max_dev"] >= 0.0
    # outliers exist iff the max deviation crosses the 3*1.4826 gate
    crosses = 20000 * (2 * r["max_dev"] * 1e6) > 44478 * (
        4 * r["mad_peak"] * 1e6
    )
    assert (r["n_outliers"] > 0) == bool(crosses)


def test_bucket_histogram_identities(spark, sf_dir, duck):
    rows = Q["dedup_bucket_size_histogram"](spark, sf_dir).collect()
    n_docs = duck.execute("SELECT count(*) FROM documents").fetchone()[0]
    total_rows = sum(r["n_rows"] for r in rows)
    # every doc lands in exactly LSH_BANDS buckets
    from python_kinesis_streaming_spark.llm.dedup import LSH_BANDS

    assert total_rows == n_docs * LSH_BANDS
    tp = rows[0]["total_pairs"]
    assert sum(r["n_pairs"] for r in rows) == tp
    for r in rows:
        assert r["total_pairs"] == tp
        lo, hi = 2 ** r["log2_class"], 2 ** (r["log2_class"] + 1)
        # max_bucket is global: it lives in the HIGHEST populated class
        top = max(rr["log2_class"] for rr in rows)
        assert r["max_bucket"] >= 2**top
        if top < 7:
            assert r["max_bucket"] < 2 ** (top + 1)
        assert 0.0 <= r["pair_share"] <= 1.0
        # s*(s-1)/2 bound: pairs in a class <= n_buckets * C(hi-1, 2)
        assert r["n_pairs"] <= r["n_buckets"] * (hi - 1) * (hi - 2) // 2


def test_js_divergence_bounds(spark, sf_dir):
    import math

    rows = Q["text_js_divergence_sources"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["src_a"] < r["src_b"]
        # JS (natural log) is bounded by ln 2
        assert 0.0 <= r["js_divergence"] <= math.log(2) + 1e-6
    # sources share the same generator -> the closest pairs are tiny
    assert min(r["js_divergence"] for r in rows) < 0.01
