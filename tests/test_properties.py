"""Property-based tests (hypothesis): the API algorithms vs brute-force
references on tiny generated inputs — catches edge cases the fixed fixtures
can't (empty groups, all-equal timestamps, single-row sides, ties).

Examples are kept small and bounded so the suite stays fast; each example
builds DataFrames from in-memory rows (no parquet involved).
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from python_kinesis_streaming_spark import api

BASE = datetime.datetime(2024, 1, 1)

# (key, seconds-offset) event strategies: few keys → collisions guaranteed.
_evt = st.tuples(st.integers(0, 2), st.integers(0, 5000))
_evts = st.lists(_evt, min_size=1, max_size=25)

_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _ts(off: int) -> datetime.datetime:
    return BASE + datetime.timedelta(seconds=off)


@given(left=_evts, right=_evts)
@_SETTINGS
def test_asof_join_matches_bruteforce(spark, left, right):
    """api.asof_join == per-row max(right_time ≤ left_time) reference."""
    ldf = spark.createDataFrame(
        [(k, _ts(o), i) for i, (k, o) in enumerate(left)], "k long, lt timestamp, lid long"
    )
    rdf = spark.createDataFrame(
        [(k, _ts(o)) for k, o in right], "k long, rt timestamp"
    )
    got = {
        (r.lid, r.asof_rt)
        for r in api.asof_join(ldf, rdf, on="k", left_time="lt", right_time="rt").collect()
    }
    expected = set()
    for i, (k, o) in enumerate(left):
        cands = [ro for rk, ro in right if rk == k and ro <= o]
        expected.add((i, _ts(max(cands)) if cands else None))
    assert got == expected


@given(evts=_evts, gap=st.integers(1, 600))
@_SETTINGS
def test_sessionize_matches_bruteforce(spark, evts, gap):
    """api.sessionize session count + sizes == sorted-scan reference."""
    df = spark.createDataFrame(
        [(k, _ts(o)) for k, o in evts], "k long, ts timestamp"
    )
    got = sorted(
        (r.k, r.session_start, r.n_events)
        for r in api.sessionize(df, key="k", ts="ts", gap_seconds=gap).collect()
    )
    expected = []
    for k in {k for k, _ in evts}:
        offs = sorted(o for kk, o in evts if kk == k)
        start, n, prev = offs[0], 0, None
        for o in offs:
            if prev is not None and o - prev > gap:
                expected.append((k, _ts(start), n))
                start, n = o, 0
            n += 1
            prev = o
        expected.append((k, _ts(start), n))
    assert got == sorted(expected)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 3)), min_size=1, max_size=20
    )
)
@_SETTINGS
def test_dedup_exact_property(spark, rows):
    """dedup keeps exactly one row per distinct content; idempotent."""
    df = spark.createDataFrame([(a, b) for a, b in rows], "a long, b long")
    out = api.dedup_exact(df, ["a", "b"])
    assert out.count() == len(set(rows))
    assert api.dedup_exact(out, ["a", "b"]).count() == len(set(rows))
    assert {(r.a, r.b) for r in out.collect()} == set(rows)


@given(
    vecs=st.lists(
        st.lists(st.floats(-1, 1, allow_nan=False, width=32), min_size=4, max_size=4),
        min_size=2,
        max_size=12,
    )
)
@_SETTINGS
def test_knn_matches_numpy(spark, vecs):
    """api.knn_cosine ranking == numpy cosine ranking (modulo exact ties)."""
    import numpy as np

    a = np.array(vecs, dtype=np.float64)
    norms = np.linalg.norm(a, axis=1)
    if norms[0] == 0 or (norms[1:] == 0).any():
        return  # cosine undefined for zero vectors — out of contract
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs[1:], start=1)],
        "vid long, v array<float>",
    )
    got = api.knn_cosine(df, "v", vecs[0], k=len(vecs)).collect()
    sims = {r.vid: r.sim for r in got}
    ref = (a[1:] @ a[0]) / (norms[1:] * norms[0])
    for i, expected in enumerate(ref, start=1):
        # float32 storage on the Spark side vs float64 numpy: tolerance.
        assert abs(sims[i] - expected) < 1e-5
