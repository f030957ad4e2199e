"""Semantic invariants for the r13 wave-18 ops (llm/wave18.py).

Value-level twin parity is covered by tests/test_oracle_parity.py's
registry sweep; these pin what a hash match can't express — fertility
monotonicity in L, surprisal positivity + share bounds, contamination
threshold consistency, staleness-audit conservation, and SRM
flag/p-value coherence.
"""

from __future__ import annotations

from python_kinesis_streaming_spark.registry import all_queries

Q = all_queries()


def test_fertility_monotone_in_subword_length(spark, sf_dir):
    rows = Q["text_tokenizer_fertility"](spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], {})[r["l"]] = r
    assert len(by_src) == 20
    for src, ls in by_src.items():
        assert set(ls) == {2, 4, 8}
        # every word yields >= 1 subtoken -> fertility >= 1; shorter L
        # fragments more -> token count (and fertility) decreases in L
        assert ls[2]["n_tokens"] >= ls[4]["n_tokens"] >= ls[8]["n_tokens"]
        for l, r in ls.items():
            assert r["fertility"] >= 1.0
            # a char-L token covers at most L chars
            assert r["chars_per_token"] <= l + 1e-9
            assert r["n_words"] > 0


def test_kn_doc_perplexity_bounds(spark, sf_dir, duck):
    rows = Q["text_kn_doc_perplexity"](spark, sf_dir).collect()
    assert len(rows) == 20
    total_bg = duck.execute(
        """SELECT count(*) FROM (
               SELECT t[i] FROM (SELECT string_split(text, ' ') AS t
                                 FROM documents),
                    unnest(range(1, len(t))) AS u(i))"""
    ).fetchone()[0]
    assert sum(r["n_bigrams"] for r in rows) == total_bg
    for r in rows:
        # -ln(p) with p <= 1 -> surprisal > 0; p floored at 1e-6 ->
        # surprisal <= ln(1e6) ~ 13.82
        assert 0.0 < r["mean_surprisal"] < 13.9
        assert 0.0 <= r["share_high_surprisal"] <= 1.0
    # the high-surprisal flag must split the corpus non-trivially
    assert any(r["share_high_surprisal"] > 0 for r in rows)
    assert any(r["share_high_surprisal"] < 1 for r in rows)


def test_contamination_threshold_consistency(spark, sf_dir, duck):
    rows = Q["corpus_contamination_embedding"](spark, sf_dir).collect()
    n_eval_total = duck.execute(
        """SELECT count(*) FROM documents d
           JOIN embeddings e ON e.vec_id = d.doc_id
           WHERE d.doc_id % 25 = 0"""
    ).fetchone()[0]
    assert sum(r["n_eval"] for r in rows) == n_eval_total
    for r in rows:
        assert 0 <= r["n_contaminated"] <= r["n_eval"]
        if r["n_contaminated"] > 0:
            # a hit requires an eval-train pair at or above tau
            assert r["max_train_sim"] >= 0.30
        assert (
            abs(
                r["contamination_rate"]
                - r["n_contaminated"] / r["n_eval"]
            )
            < 1e-3
        )
    # the fixture has in-cell eval-train pairs above tau (calibrated)
    assert sum(r["n_contaminated"] for r in rows) > 0


def test_ivf_staleness_conservation(spark, sf_dir, duck):
    rows = Q["emb_ivf_staleness_audit"](spark, sf_dir).collect()
    assert len(rows) == 8
    n_base, n_app = duck.execute(
        """SELECT sum(CASE WHEN vec_id % 5 <> 0 THEN 1 ELSE 0 END),
                  sum(CASE WHEN vec_id % 5 = 0 THEN 1 ELSE 0 END)
           FROM embeddings"""
    ).fetchone()
    assert sum(r["n_base"] for r in rows) == n_base
    assert sum(r["n_appended"] for r in rows) == n_app
    for r in rows:
        assert r["n_base"] >= 1  # the init centroid itself is a member
        assert 0 <= r["n_reassigned"] <= r["n_appended"]
        assert 0.0 <= r["reassign_rate"] <= 1.0
        assert r["centroid_shift_sq"] >= 0.0
        if r["n_appended"] > 0:
            assert r["mean_dist_stale"] >= 0.0
            assert r["mean_dist_fresh"] >= 0.0
    # one Lloyd step moves at least one centroid on real data
    assert any(r["centroid_shift_sq"] > 0 for r in rows)


def test_srm_check_coherence(spark, sf_dir, duck):
    rows = Q["events_srm_check"](spark, sf_dir).collect()
    n_days = duck.execute(
        """SELECT count(DISTINCT epoch_us(CAST(ts AS TIMESTAMP))
                        // 86400000000) FROM events"""
    ).fetchone()[0]
    assert len(rows) == n_days
    day0 = min(r["day_num"] for r in rows)
    na0, nb0 = duck.execute(
        """SELECT count(DISTINCT CASE WHEN user_id % 2 = 0
                        THEN user_id END),
                  count(DISTINCT CASE WHEN user_id % 2 = 1
                        THEN user_id END)
           FROM events
           WHERE epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 = ?""",
        [day0],
    ).fetchone()
    r0 = next(r for r in rows if r["day_num"] == day0)
    assert (r0["n_a"], r0["n_b"]) == (na0, nb0)
    for r in rows:
        assert r["chi2"] >= 0.0
        assert abs(r["z"] * r["z"] - r["chi2"]) < 0.01
        assert 0.0 <= r["p_srm"] <= 1.0
        assert r["srm_flag"] == (1 if r["p_srm"] < 0.01 else 0)
        # chi2 = 0 <=> perfectly balanced arms -> p = 1
        if r["n_a"] == r["n_b"]:
            assert r["p_srm"] == 1.0
    # the fixture split is healthy: no day should flag
    assert sum(r["srm_flag"] for r in rows) == 0
