"""Semantic invariants for the r12 wave-11 ops (llm/wave11.py).

Value-level twin parity is covered by tests/test_oracle_parity.py's
registry sweep; these pin what a hash match can't express — burstiness
accounting identities, confident-matrix conservation, the rank-metric
domains and their coupling, the Holt-Winters forecast identity, and
concentration-measure bounds.
"""

from __future__ import annotations

from python_kinesis_streaming_spark.registry import all_queries

Q = all_queries()


def test_word_burstiness_accounting(spark, sf_dir, duck):
    rows = Q["corpus_word_burstiness"](spark, sf_dir).collect()
    assert len(rows) == 30
    n_docs = duck.execute("SELECT count(*) FROM documents").fetchone()[0]
    cfs = sorted((r["cf"] for r in rows), reverse=True)
    assert cfs == sorted([r["cf"] for r in rows], reverse=True)
    for r in rows:
        # a word occurs at least once per containing doc
        assert r["cf"] >= r["df"] >= r["df_repeat"] >= 0
        assert r["burstiness"] >= 1.0 - 1e-9
        assert 0.0 <= r["p_repeat"] <= 1.0
        assert 0.0 < r["doc_share"] <= 1.0
        assert abs(r["doc_share"] - r["df"] / n_docs) < 1e-3
    # spot-check one word against an exact DuckDB count
    w = rows[0]["word"]
    cf, df = duck.execute(
        """SELECT CAST(sum(c) AS BIGINT), count(*) FROM (
               SELECT doc_id, count(*) AS c
               FROM (SELECT doc_id,
                            unnest(string_split(text, ' ')) AS word
                     FROM documents)
               WHERE word = ? GROUP BY doc_id)""",
        [w],
    ).fetchone()
    assert (rows[0]["cf"], rows[0]["df"]) == (cf, df)


def test_label_noise_matrix_conserves(spark, sf_dir, duck):
    rows = Q["dq_label_noise_confident"](spark, sf_dir).collect()
    # full 2x2 spine, absent cells as zero
    assert sorted((r["y"], r["y_hat"]) for r in rows) == [
        (0, 0),
        (0, 1),
        (1, 0),
        (1, 1),
    ]
    n_docs = duck.execute("SELECT count(*) FROM documents").fetchone()[0]
    total = sum(r["n"] for r in rows)
    assert 0 < total <= n_docs
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-3
    off = sum(r["n"] for r in rows if r["y"] != r["y_hat"])
    for r in rows:
        assert r["off_diag"] == (1 if r["y"] != r["y_hat"] else 0)
        assert 0.0 <= r["est_label_error"] <= 1.0
        assert abs(r["est_label_error"] - off / total) < 1e-3


def test_rank_metrics_domains_and_coupling(spark, sf_dir):
    rows = Q["sim_rank_quality_ndcg"](spark, sf_dir).collect()
    assert len(rows) >= 2
    for r in rows:
        assert r["qid"] % 50 == 0
        assert 0 <= r["hits"] <= 10
        assert abs(r["recall_at_10"] - r["hits"] / 10.0) < 1e-3
        assert 0.0 <= r["mrr"] <= 1.0
        assert 0.0 <= r["ndcg_at_10"] <= 1.0 + 1e-6
        # graded gains: any overlap yields positive DCG, none yields 0
        if r["hits"] == 0:
            assert r["ndcg_at_10"] == 0.0 and r["mrr"] == 0.0
        else:
            assert r["ndcg_at_10"] > 0.0
        # mrr positive implies the exact top-1 was retrieved
        if r["mrr"] > 0.0:
            assert r["hits"] >= 1


def test_holt_winters_forecast_identity(spark, sf_dir, duck):
    rows = Q["ts_holt_winters_seasonal"](spark, sf_dir).collect()
    n_types = duck.execute(
        "SELECT count(DISTINCT event_type) FROM events"
    ).fetchone()[0]
    n_days = duck.execute(
        """SELECT count(DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP)))
           FROM events"""
    ).fetchone()[0]
    assert len(rows) == n_types
    for r in rows:
        assert 8 <= r["n_days"] <= n_days
        # h=1 forecast = level + trend + next-slot seasonal (each output
        # column rounds independently at 1e-6)
        assert (
            abs(r["forecast_h1"] - (r["level"] + r["trend"] + r["s_next"]))
            < 5e-6
        )
        # level is in value units: positive daily totals -> positive level
        assert r["level"] > 0.0


def test_token_concentration_bounds(spark, sf_dir, duck):
    rows = Q["corpus_token_concentration"](spark, sf_dir).collect()
    n_docs = duck.execute("SELECT count(*) FROM documents").fetchone()[0]
    n_sources = duck.execute(
        "SELECT count(DISTINCT source) FROM documents"
    ).fetchone()[0]
    assert len(rows) == n_sources
    assert sum(r["n_docs"] for r in rows) == n_docs
    hhis = {r["source_hhi"] for r in rows}
    assert len(hhis) == 1  # global value repeated per row
    hhi = hhis.pop()
    # HHI of k shares lies in [1/k, 1]
    assert 1.0 / n_sources - 1e-6 <= hhi <= 1.0
    for r in rows:
        assert 0.0 <= r["gini"] < 1.0
        # the top decile holds at least its population share
        k = (r["n_docs"] + 9) // 10
        assert r["top_decile_share"] >= k / r["n_docs"] - 1e-6
        assert r["top_decile_share"] <= 1.0
