"""Semantic invariants for the r12 wave-10 ops (llm/wave10.py).

Value-level twin parity is covered by tests/test_oracle_parity.py's
registry sweep; these pin the retrieval semantics a hash match can't
express — scorer identities, fusion arithmetic, the semi-hard band,
and coverage conservation.
"""

from __future__ import annotations

import math

from python_kinesis_streaming_spark.registry import all_queries

Q = all_queries()


def test_bm25_ranking_properties(spark, sf_dir, duck):
    rows = sorted(
        Q["text_bm25_topk"](spark, sf_dir).collect(), key=lambda r: r["rank"]
    )
    assert [r["rank"] for r in rows] == list(range(1, 11))
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r["score"] > 0
        assert 1 <= r["n_hit_terms"] <= 3
    # every returned doc really contains at least one query term
    ids = tuple(r["doc_id"] for r in rows)
    n = duck.execute(
        f"""SELECT count(*) FROM documents
            WHERE doc_id IN {ids}
              AND (text LIKE '%join%' OR text LIKE '%hash%'
                   OR text LIKE '%scan%')"""
    ).fetchone()[0]
    assert n == 10


def test_ql_and_bm25_agree_on_the_head(spark, sf_dir):
    bm = [r["doc_id"] for r in Q["text_bm25_topk"](spark, sf_dir).collect()]
    ql = [
        r["doc_id"]
        for r in Q["text_ql_dirichlet_topk"](spark, sf_dir).collect()
    ]
    # different scorers, same query, same corpus: the heads overlap
    # substantially (both reward tf of the same three terms)
    assert len(set(bm) & set(ql)) >= 4, (bm, ql)
    # QL log-probabilities are strictly negative
    for r in Q["text_ql_dirichlet_topk"](spark, sf_dir).collect():
        assert r["score"] < 0


def test_rrf_contribution_identity(spark, sf_dir):
    rows = sorted(
        Q["sim_rrf_fusion"](spark, sf_dir).collect(), key=lambda r: r["rank"]
    )
    assert [r["rank"] for r in rows] == list(range(1, 11))
    for r in rows:
        want = 0.0
        if r["r_lex"] > 0:
            want += math.floor(1e6 / (60 + r["r_lex"]) + 0.505) / 1e6
        if r["r_vec"] > 0:
            want += math.floor(1e6 / (60 + r["r_vec"]) + 0.505) / 1e6
        assert abs(r["rrf"] - want) < 3e-6, r
        assert r["r_lex"] > 0 or r["r_vec"] > 0
        assert 0 <= r["r_lex"] <= 50 and 0 <= r["r_vec"] <= 50
    rrfs = [r["rrf"] for r in rows]
    assert rrfs == sorted(rrfs, reverse=True)


def test_negative_mining_band_and_labels(spark, sf_dir, duck):
    rows = Q["sim_negative_mining_audit"](spark, sf_dir).collect()
    labels = dict(
        duck.execute("SELECT vec_id, label FROM embeddings").fetchall()
    )
    per_q: dict = {}
    for r in rows:
        per_q.setdefault(r["qid"], []).append(r)
        assert 0.20 <= r["sim"] < 0.35
        assert r["label_q"] != r["label_n"]
        assert r["label_q"] == labels[r["qid"]]
        assert r["label_n"] == labels[r["vec_id"]]
    for qid, rs in per_q.items():
        assert qid % 50 == 0
        assert len(rs) <= 5
        sims = [r["sim"] for r in sorted(rs, key=lambda x: -x["sim"])]
        assert sims == sorted(sims, reverse=True)


def test_doc_vector_coverage_conservation(spark, sf_dir, duck):
    rows = Q["dq_doc_vector_coverage"](spark, sf_dir).collect()
    src = [r for r in rows if r["source"] != "_orphan_vectors"]
    orphan = [r for r in rows if r["source"] == "_orphan_vectors"]
    assert len(orphan) == 1
    n_docs = duck.execute("SELECT count(*) FROM documents").fetchone()[0]
    n_vecs = duck.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    assert sum(r["n_docs"] for r in src) == n_docs
    matched = sum(r["n_with_vec"] for r in src)
    # every vector is either matched to a doc or an orphan
    assert matched + orphan[0]["n_orphan_vectors"] == n_vecs
    for r in src:
        assert 0.0 <= r["coverage"] <= 1.0
        assert abs(r["coverage"] - r["n_with_vec"] / r["n_docs"]) < 2e-4
