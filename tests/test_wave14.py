"""Semantic invariants for the r12 wave-14 ops (llm/wave14.py).

Value-level twin parity is covered by tests/test_oracle_parity.py's
registry sweep; these pin what a hash match can't express — KN
probability structure, the CM one-sided theorem on the live sketch,
LOO leakage-removal direction, Croston domain sanity, and beam-search
recall bounds.
"""

from __future__ import annotations

from python_kinesis_streaming_spark.registry import all_queries

Q = all_queries()


def test_kneser_ney_structure(spark, sf_dir, duck):
    rows = Q["text_kneser_ney_bigram"](spark, sf_dir).collect()
    assert len(rows) == 20
    cs = [r["c"] for r in rows]
    assert sorted(cs, reverse=True) == cs or len(set(cs)) < len(cs)
    for r in rows:
        assert 0 < r["c"] <= r["cw1"]
        assert 0.0 < r["p_kn"] < 1.0
        assert 0.0 < r["p_mle"] <= 1.0
        # discounting moves mass: KN differs from MLE by the backoff
        # term minus D/c(w1); both stay within D/cw1 + lambda of MLE
        assert abs(r["p_kn"] - r["p_mle"]) < 0.1
    # spot-check one bigram count against DuckDB
    w1, w2, c = rows[0]["w1"], rows[0]["w2"], rows[0]["c"]
    exact = duck.execute(
        """SELECT count(*) FROM (
               SELECT t[i] AS w1, t[i+1] AS w2
               FROM (SELECT string_split(text, ' ') AS t
                     FROM documents),
                    unnest(range(1, len(t))) AS u(i))
           WHERE w1 = ? AND w2 = ?""",
        [w1, w2],
    ).fetchone()[0]
    assert c == exact


def test_count_min_one_sided_theorem(spark, sf_dir, duck):
    rows = Q["text_count_min_sketch_audit"](spark, sf_dir).collect()
    assert len(rows) == 10
    n_tokens = duck.execute(
        """SELECT count(*) FROM (
               SELECT unnest(string_split(text, ' ')) FROM documents)"""
    ).fetchone()[0]
    for r in rows:
        assert r["n_tokens"] == n_tokens
        # the CM theorem: estimates NEVER undercount
        assert r["never_undercounts"] == 1
        assert r["overcount"] >= 0
        assert r["cm_est"] == r["exact_cf"] + r["overcount"]
        # deterministic hard cap: a cell holds at most all n tokens
        assert r["cm_est"] <= n_tokens


def test_loo_encoding_removes_own_label(spark, sf_dir):
    rows = Q["feat_target_encode_loo"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["o_orderkey"] % 97 == 0
        assert r["y"] in (0, 1)
        assert 0.0 <= r["loo_enc"] <= 1.0
        assert 0.0 <= r["naive_enc"] <= 1.0
        # removing a positive label must push the encoding DOWN
        # relative to removing a negative one (same category)
    by_cat: dict[str, list] = {}
    for r in rows:
        by_cat.setdefault(r["cat"], []).append(r)
    for cat, rs in by_cat.items():
        pos = [r["loo_enc"] for r in rs if r["y"] == 1]
        neg = [r["loo_enc"] for r in rs if r["y"] == 0]
        if pos and neg:
            assert max(pos) < min(neg), cat


def test_croston_domains(spark, sf_dir, duck):
    rows = Q["ts_croston_intermittent"](spark, sf_dir).collect()
    eligible = duck.execute(
        """SELECT count(*) FROM (
               SELECT user_id, count(*) AS nd FROM (
                   SELECT user_id,
                          date_trunc('day', CAST(ts AS TIMESTAMP)) AS d
                   FROM events WHERE event_type = 'purchase'
                   GROUP BY 1, 2)
               GROUP BY user_id) WHERE nd >= 3"""
    ).fetchone()[0]
    assert len(rows) == eligible
    assert len(rows) > 0
    for r in rows:
        assert r["n_demands"] >= 3
        assert r["demand_size"] > 0
        assert r["demand_interval"] > 0
        # intervals are in days over a 30-day window
        assert r["demand_interval"] < 30
        # forecast identity (both factors rounded independently)
        assert (
            abs(
                r["forecast_per_day"]
                - r["demand_size"] / r["demand_interval"]
            )
            < max(0.01 * r["forecast_per_day"], 0.01)
        )


def test_beam_recall_bounds(spark, sf_dir):
    rows = Q["sim_graph_beam_recall"](spark, sf_dir).collect()
    assert len(rows) >= 2
    for r in rows:
        assert r["qid"] % 50 == 0
        assert 0 <= r["hits"] <= 5
        assert abs(r["recall_at_5"] - r["hits"] / 5.0) < 1e-3
    # the graph search must find SOMETHING somewhere — a zero total
    # means the walk is broken, not that the space is hard
    assert sum(r["hits"] for r in rows) > 0


def test_kneser_ney_short_doc_guard(spark, tmp_path):
    """0/1-token docs must not crash the bigram builder (r12 ADVICE):
    sequence(1, 0) runs DESCENDING in Spark and element_at(t, 0) raises —
    the .where(size(t) >= 2) guard drops those rows, matching the oracle's
    naturally-empty range(1, len(t))."""
    import pandas as pd

    d = str(tmp_path / "sf_short")
    (tmp_path / "sf_short").mkdir()
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["solo", "", "two tokens", "three little words"],
            "lang": ["en"] * 4,
            "source": ["web"] * 4,
            "n_chars": [4, 0, 10, 18],
        }
    ).to_parquet(d + "/documents.parquet", index=False)
    rows = Q["text_kneser_ney_bigram"](spark, d).collect()
    bigrams = {(r["w1"], r["w2"]) for r in rows}
    assert ("two", "tokens") in bigrams
    assert ("three", "little") in bigrams
    assert all(r["w1"] not in ("solo", "") for r in rows)
