"""Twin gates for the promotion ops (PROMOTION.md).

Promotion ops are the r6/r7 library surface pre-packaged in the driver
contract shape, kept OUT of the frozen 391-op registry until the
grading backlog drains. This file applies the exact driver comparison
(column-sorted canonical multiset, tests/twin.py) to every implemented
promotion op at sf0.01 — so the r9/r10 registration flip ships with
the same evidence as any registered op.
"""

from __future__ import annotations

import pytest

from python_kinesis_streaming_spark.promotions import PROMOTION_OPS
from python_kinesis_streaming_spark.registry import all_queries

from tests.twin import assert_twin_match

_SLOW = {"classifier_train_audit", "tokenizer_train_audit"}


@pytest.mark.parametrize("name", sorted(PROMOTION_OPS))
def test_promotion_twin(name, spark, duck, sf_dir):
    spec = PROMOTION_OPS[name]
    spark_df = spec.fn(spark, sf_dir).toPandas()
    duck_df = duck.execute(spec.oracle).df()
    assert_twin_match(spark_df, duck_df, name)


def test_promotions_all_have_oracles_and_scale_notes():
    for spec in PROMOTION_OPS.values():
        assert spec.oracle, f"{spec.name}: missing oracle"
        assert spec.scale_notes, f"{spec.name}: missing scale notes"


def test_promotions_do_not_leak_into_frozen_registry():
    """Importing the promotions module must NOT grow queries() — the
    registration freeze holds until register_all() is called at the
    r9/r10 flip."""
    overlap = set(PROMOTION_OPS) & set(all_queries())
    assert not overlap, f"promotion ops leaked into the registry: {overlap}"


def test_promotion_names_match_promotion_md():
    import os

    md = open(
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "PROMOTION.md")
    ).read()
    missing = [n for n in PROMOTION_OPS if n not in md]
    assert not missing, f"ops not documented in PROMOTION.md: {missing}"


def test_register_all_flip_rehearsal():
    """The r9/r10 flip is one _OP_MODULES line pointing at the
    promotions_flip import hook (registry._ensure_loaded only IMPORTS —
    a module must register at import time, and promotions.py's
    decorators deliberately don't). Rehearse the exact flip path in a
    subprocess (the live registry must stay frozen at 391 for every
    other test): all 51 promotion names must land in queries() with
    their oracles and scale notes intact, alongside the 391."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = """
import sys
import importlib
sys.path.insert(0, %r)
from python_kinesis_streaming_spark import registry
from python_kinesis_streaming_spark.promotions import PROMOTION_OPS
before = len(registry.all_queries())
assert before == 391, before
importlib.import_module("python_kinesis_streaming_spark.promotions_flip")
qs = registry.all_queries()
oracles = registry.all_oracles()
assert len(qs) == before + len(PROMOTION_OPS), (len(qs), before)
missing = [n for n in PROMOTION_OPS if n not in qs]
assert not missing, missing
no_oracle = [n for n in PROMOTION_OPS if not oracles.get(n)]
assert no_oracle == [], no_oracle
no_scale = [
    n for n in PROMOTION_OPS if not registry.get_op(n).scale_notes
]
assert no_scale == [], no_scale
print("FLIP-OK", len(qs))
""" % (repo,)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr
    assert "FLIP-OK 442" in out.stdout, out.stdout


def test_bounded_shuffle_restores_conf(spark):
    """_bounded_shuffle must restore spark.sql.shuffle.partitions on
    exit — including on exception — or every later plan in the session
    (ours OR the driver's) silently runs at 16 partitions."""
    from python_kinesis_streaming_spark.promotions import _bounded_shuffle

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    with _bounded_shuffle(spark, 7):
        assert spark.conf.get(key) == "7"
    assert spark.conf.get(key) == before
    try:
        with _bounded_shuffle(spark, 9):
            assert spark.conf.get(key) == "9"
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get(key) == before
