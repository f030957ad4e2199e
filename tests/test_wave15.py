"""Semantic invariants for the r12 wave-15 ops (llm/wave15.py).

Value-level twin parity is covered by tests/test_oracle_parity.py's
registry sweep; these pin what a hash match can't express — the CUPED
variance identity, HT unbiasedness direction and error contraction
domain, ADC recall accounting, span-plan exactness, and the strength
statistic's domain.
"""

from __future__ import annotations

from python_kinesis_streaming_spark.registry import all_queries

Q = all_queries()


def test_cuped_variance_identity(spark, sf_dir):
    rows = Q["events_cuped_adjustment"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n"] > 0
    assert r["var_post"] > 0
    # CUPED can only ever reduce variance, by exactly rho^2
    assert 0 < r["var_adjusted"] <= r["var_post"] + 1e-6
    assert 0.0 <= r["variance_reduction"] <= 1.0
    assert (
        abs(
            r["var_adjusted"]
            - r["var_post"] * (1.0 - r["variance_reduction"])
        )
        < max(0.01 * r["var_post"], 0.1)
    )


def test_ht_estimator_audit(spark, sf_dir, duck):
    rows = sorted(
        Q["sample_ht_estimator_audit"](spark, sf_dir).collect(),
        key=lambda r: r["k"],
    )
    assert [r["k"] for r in rows] == [50, 100, 200]
    exact = duck.execute(
        "SELECT sum(len(string_split(text, ' '))) FROM documents"
    ).fetchone()[0]
    n_docs = duck.execute("SELECT count(*) FROM documents").fetchone()[0]
    for r in rows:
        assert r["exact_total"] == exact
        assert r["n_docs"] == n_docs
        assert r["n_sampled"] == min(r["k"], n_docs)
        assert r["ht_estimate"] > 0
        # a hash sample of >=10% of this corpus stays within 15%
        assert r["rel_err"] < 0.15


def test_pq_adc_recall_accounting(spark, sf_dir):
    rows = Q["sim_pq_adc_recall"](spark, sf_dir).collect()
    assert len(rows) == 10
    ranks = sorted(r["exact_rank"] for r in rows)
    assert ranks == list(range(1, 11))
    hits = sum(r["in_adc_top10"] for r in rows)
    recalls = {r["recall_at_10"] for r in rows}
    assert len(recalls) == 1
    assert abs(recalls.pop() - hits / 10.0) < 1e-3
    # 8-byte codes lose precision but must beat random chance
    # (random 10-of-N overlap is ~10/N ~ 0.02 at sf0.01)
    assert hits >= 1


def test_span_mask_plan_exactness(spark, sf_dir):
    rows = Q["corpus_span_mask_plan"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["doc_id"] % 17 == 0
        assert r["n_blocks"] == r["n_tok"] // 20
        assert r["n_spans"] == r["n_blocks"]
        assert r["n_masked"] == 3 * r["n_spans"]
        # one 3-span per 20-token block: ratio <= 15%, -> 15% as
        # the tail block shrinks relative to the doc
        assert r["mask_ratio"] <= 0.15 + 1e-6
        assert 0 <= r["first_start"]
        # a span must fit inside its block
        assert r["first_start"] % 20 <= 17


def test_decomposition_strength_domains(spark, sf_dir, duck):
    rows = Q["ts_decomposition_strength"](spark, sf_dir).collect()
    n_types = duck.execute(
        "SELECT count(DISTINCT event_type) FROM events"
    ).fetchone()[0]
    assert len(rows) == n_types
    for r in rows:
        # MA(7) needs full windows: n_days - 6 interior points
        assert r["n"] > 0
        assert 0.0 <= r["seasonal_strength"] <= 1.0
        assert r["var_detrended"] > 0
        assert r["var_residual"] >= 0
        # removing the seasonal means can only reduce variance
        assert r["var_residual"] <= r["var_detrended"] + 1e-6
