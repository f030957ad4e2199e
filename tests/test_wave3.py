"""Semantic invariants for the r10 wave-3 ops (llm/wave3.py).

Value-level twin parity is covered by tests/test_oracle_parity.py's
registry sweep; these pin the properties that make the audits
meaningful — the sketch prefilter actually beating (or at least
matching) the axis-aligned variance cut, injected contamination
actually flagged, mixture weights normalizing, the quantization
bound actually holding — which a hash match alone can't express.
"""

from __future__ import annotations

from python_kinesis_streaming_spark.registry import all_queries

Q = all_queries()


def test_sketch_cascade_adaptivity_ladder(spark, sf_dir, duck):
    rows = Q["sim_cascade_sketch_recall_audit"](spark, sf_dir).collect()
    n_q = duck.execute(
        "SELECT count(*) FROM embeddings WHERE vec_id % 50 = 0"
    ).fetchone()[0]
    assert {r["prefilter"] for r in rows} == {"randproj16", "sketch16"}
    assert len(rows) == 2 * n_q
    for r in rows:
        assert 0 <= r["hits"] <= 5
        assert abs(r["recall_at_5"] - round(r["hits"] / 5.0, 4)) < 1e-9
    mean = {
        leg: sum(r["recall_at_5"] for r in rows if r["prefilter"] == leg)
        / n_q
        for leg in ("randproj16", "sketch16")
    }
    # adaptivity is non-negative: the covariance-sketch basis must not
    # lose to the data-oblivious JL control (verified offline at both
    # sf0.01 and sf0.1: 0.56 vs 0.54, 0.265 vs 0.25)
    assert mean["sketch16"] >= mean["randproj16"] - 1e-9, mean
    # and on this near-flat spectrum the axis-aligned variance cut
    # (sibling op) must stay at-or-above the JL control too
    var_rows = Q["sim_cascade_recall_audit"](spark, sf_dir).collect()
    mean_var = sum(r["recall_at_5"] for r in var_rows) / len(var_rows)
    assert mean_var >= mean["randproj16"] - 1e-9, (mean_var, mean)


def test_contamination_flags_every_injected_twin(spark, sf_dir):
    rows = Q["corpus_contamination_ngram"](spark, sf_dir).collect()
    assert rows, "eval sample must be non-empty"
    by_id = {r["eval_doc_id"]: r for r in rows}
    for doc_id, r in by_id.items():
        assert doc_id % 97 == 0
        if doc_id % 2 == 0:
            # every even eval doc has a 'leak '-prefixed twin in train
            # sharing all its interior 8-grams (docs are >= 10 tokens)
            assert r["injected_twin_flagged"], doc_id
            assert r["n_contaminated"] >= 1
        else:
            assert not r["injected_twin_flagged"], doc_id


def test_mixture_temperature_invariants(spark, sf_dir):
    rows = Q["corpus_mixture_temperature"](spark, sf_dir).collect()
    alphas = {r["alpha"] for r in rows}
    assert alphas == {0.3, 0.7, 1.0}
    srcs = {r["source"] for r in rows}
    for a in alphas:
        sub = [r for r in rows if r["alpha"] == a]
        assert len(sub) == len(srcs)
        total_w = sum(r["weight"] for r in sub)
        assert abs(total_w - 1.0) < 1e-4, (a, total_w)
    # natural sampling: every source runs exactly one epoch
    for r in rows:
        if r["alpha"] == 1.0:
            assert abs(r["effective_epochs"] - 1.0) < 1e-9, r
    # flattening: at the lowest temperature the smallest source is
    # upsampled past one epoch, the largest below one
    low = [r for r in rows if r["alpha"] == 0.3]
    smallest = min(low, key=lambda r: r["n_tokens"])
    largest = max(low, key=lambda r: r["n_tokens"])
    assert smallest["effective_epochs"] > 1.0
    assert largest["effective_epochs"] < 1.0


def test_int8_quant_bound_holds_everywhere(spark, sf_dir, duck):
    rows = Q["emb_int8_quant_audit"](spark, sf_dir).collect()
    n_vec = duck.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    assert len(rows) == 64
    for r in rows:
        assert r["n"] == n_vec
        assert r["scale"] > 0
        assert r["bound_ok"], r
        assert r["mean_abs_err"] <= r["max_abs_err"] + 1e-9
        # reconstruction error can't exceed half a quantization step
        assert r["max_abs_err"] <= r["scale"] / 2.0 + 1e-6
