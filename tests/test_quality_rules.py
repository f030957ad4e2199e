"""Gopher quality rule tests (llm/quality_rules.py): one crafted
document per rule violation, each failing EXACTLY its targeted rule
(plus a clean document passing all)."""

from __future__ import annotations

import pytest

from python_kinesis_streaming_spark.llm.quality_rules import gopher_rules

GOOD = (
    "The quick brown fox jumps over the lazy dog and then runs to have "
    "a look at the river that flows with calm water near the old mill. "
    "Every morning the miller would be there to watch the sun rise over "
    "the quiet valley and think of all the work that the day would bring."
)

RULE_COLS = [
    "r_word_count",
    "r_word_len",
    "r_symbols",
    "r_bullets",
    "r_ellipsis",
    "r_alpha",
    "r_stop_words",
]


def _run(spark, text, **kw):
    df = spark.createDataFrame([(text,)], "text string")
    return gopher_rules(df, "text", **kw).collect()[0]


def test_clean_document_passes_everything(spark):
    row = _run(spark, GOOD)
    for c in RULE_COLS:
        assert row[c], c
    assert row["gopher_keep"]
    assert row["g_word_count"] == len(GOOD.split())


@pytest.mark.parametrize(
    "text,broken",
    [
        ("too short to have the needed words with that", "r_word_count"),
        # 60 long pseudo-words: mean length breaks the [3,10] band but the
        # function words keep rule 7 satisfied
        (
            " ".join(["pneumonoultramicroscopicsilicovolcanoconiosis"] * 52
                     + ["the", "of", "and", "to", "be", "have", "with", "that"]),
            "r_word_len",
        ),
        (
            GOOD + " " + " ".join(["#"] * 12),
            "r_symbols",
        ),
        (
            "\n".join(f"- {GOOD[:40]} the of and" for _ in range(20)),
            "r_bullets",
        ),
        (
            "\n".join(f"{GOOD[:40]} the of and..." for _ in range(20)),
            "r_ellipsis",
        ),
        (
            GOOD + " " + " ".join(["12345"] * 60),
            "r_alpha",
        ),
        (
            " ".join(["alpha beta gamma delta epsilon"] * 12),
            "r_stop_words",
        ),
    ],
)
def test_each_rule_fires_alone(spark, text, broken):
    row = _run(spark, text)
    assert not row[broken], f"{broken} should have failed"
    assert not row["gopher_keep"]
    for c in RULE_COLS:
        if c != broken:
            assert row[c], f"{c} unexpectedly failed too"


def test_thresholds_are_configurable(spark):
    short = "the fox and the dog have to be with that mill today"
    assert not _run(spark, short)["gopher_keep"]
    assert _run(spark, short, min_words=5)["gopher_keep"]


def test_plan_stays_jvm_side(spark):
    # the rule columns must not introduce BatchEvalPython / Arrow eval
    df = spark.createDataFrame([(GOOD,)], "text string")
    plan = gopher_rules(df, "text")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
