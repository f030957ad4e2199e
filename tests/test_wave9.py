"""Semantic invariants for the r12 wave-9 ops (llm/wave9.py).

Value-level twin parity is covered by tests/test_oracle_parity.py's
registry sweep; these pin what a hash match can't express — the
incremental-merge == full-rescan equivalence, series-search geometry,
band conservation, lexicon accounting, and the agreement-rate domain.
"""

from __future__ import annotations

from python_kinesis_streaming_spark.registry import all_queries

Q = all_queries()


def test_incremental_topk_equals_full_rescan(spark, sf_dir, duck):
    rows = sorted(
        Q["sim_topk_incremental_delta"](spark, sf_dir).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["rank"] for r in rows] == list(range(1, 11))
    sims = [r["sim"] for r in rows]
    assert sims == sorted(sims, reverse=True)
    # full rescan in DuckDB must produce the identical ranked list —
    # the property that makes delta-only scoring exact
    full = duck.execute(
        """SELECT e.vec_id
           FROM embeddings e, (SELECT embedding::DOUBLE[] qv
                               FROM embeddings WHERE vec_id = 0) q
           WHERE e.vec_id <> 0
           ORDER BY floor(list_cosine_similarity(
                        e.embedding::DOUBLE[], q.qv)
                        * 10000.0 + 0.505) / 10000.0 DESC, e.vec_id
           LIMIT 10"""
    ).fetchall()
    assert [r["vec_id"] for r in rows] == [v[0] for v in full]
    cut = duck.execute(
        "SELECT CAST(max(vec_id) * 0.8 AS BIGINT) FROM embeddings"
    ).fetchone()[0]
    for r in rows:
        assert r["from_delta"] == (1 if r["vec_id"] >= cut else 0)


def test_znorm_search_geometry(spark, sf_dir, duck):
    rows = Q["ts_znorm_series_search"](spark, sf_dir).collect()
    assert len(rows) == 3
    n_days = duck.execute(
        """SELECT count(DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP)))
           FROM events"""
    ).fetchone()[0]
    dists = [r["znorm_dist"] for r in rows]
    assert dists == sorted(dists)
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert r["n_days"] == n_days
        # z-normalized RMS distance between unit-variance series is
        # bounded by sqrt(2 * (1 - min corr)) <= 2
        assert 0.0 <= r["znorm_dist"] <= 2.0 + 1e-6


def test_length_dup_bias_conservation(spark, sf_dir, duck):
    rows = {
        r["band"]: r
        for r in Q["corpus_length_dup_bias"](spark, sf_dir).collect()
    }
    assert set(rows) <= {"0_short", "1_medium", "2_long", "3_xlong"}
    n_docs = duck.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert sum(r["n_docs"] for r in rows.values()) == n_docs
    # positions across bands == all 4-gram positions; dup positions
    # across bands == the spans op's per-source dup test universe
    n_pos = duck.execute(
        """SELECT sum(greatest(len(string_split(text, ' ')) - 3, 0))
           FROM documents"""
    ).fetchone()[0]
    assert sum(r["n_positions"] for r in rows.values()) == n_pos
    for r in rows.values():
        assert 0 <= r["n_dup_positions"] <= r["n_positions"]
        assert 0 <= r["n_docs_with_dup"] <= r["n_docs"]
        if r["n_positions"]:
            want = r["n_dup_positions"] / r["n_positions"]
            assert abs(r["dup_rate"] - want) < 2e-4


def test_sentiment_lexicon_accounting(spark, sf_dir, duck):
    rows = Q["text_sentiment_lexicon"](spark, sf_dir).collect()
    truth = dict(
        duck.execute(
            "SELECT source, count(*) FROM documents GROUP BY source"
        ).fetchall()
    )
    assert {r["source"] for r in rows} == set(truth)
    pos_total = duck.execute(
        """SELECT count(*) FROM (
               SELECT unnest(string_split(text, ' ')) AS t
               FROM documents) WHERE t IN ('fast', 'big')"""
    ).fetchone()[0]
    assert sum(r["pos_hits"] for r in rows) == pos_total
    for r in rows:
        assert r["n_docs"] == truth[r["source"]]
        assert -1.0 <= r["mean_polarity"] <= 1.0
        assert 0.0 <= r["pos_doc_share"] <= 1.0


def test_label_agreement_domain(spark, sf_dir):
    rows = Q["emb_neardup_label_agreement"](spark, sf_dir).collect()
    prune = {
        r["cid"]: r
        for r in Q["dedup_semdedup_prune"](spark, sf_dir).collect()
    }
    for r in rows:
        assert r["cid"] in prune
        assert 0 < r["n_pairs"]
        assert 0 <= r["n_agree"] <= r["n_pairs"]
        assert abs(r["agree_rate"] - r["n_agree"] / r["n_pairs"]) < 2e-4
        # any cell with near-pairs must also show pruned members in the
        # prune report (same tau, same pair table)
        assert prune[r["cid"]]["n_pruned"] > 0
