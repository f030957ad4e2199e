"""Tokenizer comparison: metric arithmetic pinned by hand on a tiny
encoding, and the BPE-vs-unigram report end to end."""

from __future__ import annotations

import pytest

from python_kinesis_streaming_spark.llm.tokenizer_eval import (
    compare_tokenizers,
    tokenizer_report,
)


def test_report_metrics_hand_checked(spark):
    encoded = spark.createDataFrame(
        [
            ("ab cd", ["ab", "cd"]),          # 5 chars, 2 words, 2 toks
            ("a b", ["a", "b"]),              # 3 chars, 2 words, 2 single
        ],
        "text string, pieces array<string>",
    )
    r = tokenizer_report(encoded, "text", "pieces", vocab_size=8,
                         name="toy").collect()[0]
    assert r["tokenizer"] == "toy" and r["n_docs"] == 2
    assert r["total_tokens"] == 4
    assert r["chars_per_token"] == pytest.approx(8 / 4)
    assert r["fertility"] == pytest.approx(4 / 4)
    # distinct pieces used: ab, cd, a, b → 4 of 8
    assert r["vocab_utilization"] == pytest.approx(0.5)
    assert r["single_char_rate"] == pytest.approx(2 / 4)


def test_compare_tokenizers_end_to_end(spark):
    docs = spark.createDataFrame(
        [
            (1, "lowering the lower lowest newer newest"),
            (2, "newest newer renewed wider widest lowering"),
            (3, "the lowest and the widest and the newest"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["tokenizer"]: r
        for r in compare_tokenizers(
            docs, "text", vocab_size=60, max_piece_len=4
        ).collect()
    }
    assert set(out) == {"bpe", "unigram"}
    for name, r in out.items():
        assert r["n_docs"] == 3, name
        assert r["total_tokens"] > 0
        # both must compress below 1 token/char
        assert r["chars_per_token"] > 1.0, name
        assert 0 < r["vocab_utilization"] <= 1.0, name
        assert 0 <= r["single_char_rate"] < 1.0, name
    # identical evidence: token totals are same order of magnitude
    a, b = out["bpe"]["total_tokens"], out["unigram"]["total_tokens"]
    assert max(a, b) / min(a, b) < 3
