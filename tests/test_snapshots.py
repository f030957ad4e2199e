"""Snapshot/transaction-log tests (sources/snapshots.py).

The commit protocol is exercised at the filesystem level (hand-placed
log files, racing creates), not only through the high-level API, so the
atomicity claim rests on os.O_EXCL semantics the tests demonstrate."""

from __future__ import annotations

import json
import os

import pytest

from python_kinesis_streaming_spark.sources.snapshots import (
    SnapshotConflict,
    commit,
    compact,
    current_version,
    history,
    live_files,
    read_snapshot,
    write_snapshot,
)


def test_versions_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "corpus")
    v0 = write_snapshot(spark.range(0, 10), t, message="first")
    v1 = write_snapshot(spark.range(100, 105), t, message="second")
    assert (v0, v1) == (0, 1)
    assert current_version(t) == 1

    latest = read_snapshot(spark, t)
    assert sorted(r["id"] for r in latest.collect()) == list(range(100, 105))
    # time travel: version 0 still reads the original ten rows
    old = read_snapshot(spark, t, version=0)
    assert sorted(r["id"] for r in old.collect()) == list(range(10))

    hist = history(t)
    assert [h["message"] for h in hist] == ["first", "second"]
    assert hist[1]["removes"] > 0  # overwrite logically removed v0 files


def test_append_mode_unions(spark, tmp_path):
    t = str(tmp_path / "corpus")
    write_snapshot(spark.range(0, 5), t)
    write_snapshot(spark.range(5, 8), t, mode="append")
    got = sorted(r["id"] for r in read_snapshot(spark, t).collect())
    assert got == list(range(8))
    # the appended version's live set contains both commits' files
    assert len(live_files(t)) == len(live_files(t, 0)) + (
        len(live_files(t)) - len(live_files(t, 0))
    )


def test_commit_race_detected_by_o_excl(tmp_path):
    t = str(tmp_path / "corpus")
    commit(t, [{"action": "add", "path": "data/a.parquet", "size": 1}])
    # a second writer who read version 0 loses the race if version 1
    # appears first — place it by hand to simulate the interleaving
    os.makedirs(os.path.join(t, "_log"), exist_ok=True)
    with open(os.path.join(t, "_log", "00000001.json"), "w") as f:
        f.write(json.dumps({"action": "meta", "message": "racer"}) + "\n")
    with pytest.raises(SnapshotConflict):
        commit(
            t,
            [{"action": "add", "path": "data/b.parquet", "size": 1}],
            expected_version=0,
        )


def test_commit_is_invisible_until_complete(tmp_path, monkeypatch):
    """Regression (ADVICE r6): the log file must appear under its final
    name only with COMPLETE contents. Pre-fix, commit O_EXCL-created the
    final name and then wrote the payload, so a writer crash (or a racing
    reader) between the two left an empty 00000001.json that poisoned
    current_version/_replay. Now a mid-write crash leaves no visible
    commit at all."""
    t = str(tmp_path / "corpus")
    commit(t, [{"action": "add", "path": "data/a.parquet", "size": 1}])

    real_write = os.write

    def crashing_write(fd, data):
        raise OSError("disk died mid-write")

    monkeypatch.setattr(os, "write", crashing_write)
    with pytest.raises(OSError, match="mid-write"):
        commit(t, [{"action": "add", "path": "data/b.parquet", "size": 1}])
    monkeypatch.setattr(os, "write", real_write)

    # no partial/empty version surfaced; no tmp litter; table still usable
    log = os.path.join(t, "_log")
    assert sorted(os.listdir(log)) == ["00000000.json"]
    assert current_version(t) == 0
    assert commit(t, [{"action": "add", "path": "data/b.parquet", "size": 1}]) == 1


def test_stale_expected_version_rejected(tmp_path):
    t = str(tmp_path / "corpus")
    commit(t, [{"action": "add", "path": "data/a.parquet", "size": 1}])
    commit(t, [{"action": "add", "path": "data/b.parquet", "size": 1}])
    with pytest.raises(SnapshotConflict, match="expected 0"):
        commit(t, [{"action": "remove", "path": "data/a.parquet"}], expected_version=0)


def test_concurrent_threads_never_lose_a_commit(tmp_path):
    """N threads race commits; every one either lands a distinct version
    or raises SnapshotConflict — no lost updates, no duplicate versions."""
    import threading

    t = str(tmp_path / "corpus")
    results: list[int] = []
    conflicts = 0
    lock = threading.Lock()

    def writer(i):
        nonlocal conflicts
        for _ in range(10):
            try:
                v = commit(
                    t, [{"action": "add", "path": f"data/{i}.parquet", "size": 1}]
                )
                with lock:
                    results.append(v)
                return
            except SnapshotConflict:
                with lock:
                    conflicts += 1

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert sorted(results) == list(range(len(results)))  # distinct versions
    assert len(results) == 8  # everyone eventually landed (with retries)


def test_invalid_actions_and_versions(spark, tmp_path):
    t = str(tmp_path / "corpus")
    with pytest.raises(ValueError, match="no table"):
        read_snapshot(spark, t)
    write_snapshot(spark.range(3), t)
    with pytest.raises(ValueError, match="does not exist"):
        read_snapshot(spark, t, version=5)
    with pytest.raises(ValueError, match="unknown action"):
        commit(t, [{"action": "mutate", "path": "x"}])


def test_compact_preserves_rows_and_history(spark, tmp_path):
    t = str(tmp_path / "corpus")
    write_snapshot(spark.range(0, 50).repartition(6), t)
    assert len(live_files(t)) == 6
    v = compact(spark, t, target_files=1)
    assert len(live_files(t, v)) == 1
    assert sorted(r["id"] for r in read_snapshot(spark, t).collect()) == list(
        range(50)
    )
    # pre-compaction version still readable (immutable data files)
    assert len(read_snapshot(spark, t, version=v - 1).collect()) == 50


def test_manifest_stats_prune_files(spark, tmp_path):
    """Range-partitioned files carry disjoint min/max in the commit log;
    manifest-level pruning must skip non-intersecting files while a
    pruned read still returns exactly the filtered rows."""
    from pyspark.sql import functions as F

    from python_kinesis_streaming_spark.sources.snapshots import prune_files

    t = str(tmp_path / "corpus")
    df = spark.range(1000).withColumn("id", F.col("id").cast("long"))
    write_snapshot(df.repartitionByRange(5, "id"), t)

    all_files = live_files(t)
    assert len(all_files) == 5
    assert all(f.get("stats", {}).get("id") for f in all_files)

    # a 50-wide window intersects at most 2 of the 5 range files
    pruned = prune_files(t, "id", lo=100, hi=150)
    assert 0 < len(pruned) < len(all_files)

    got = (
        read_snapshot(spark, t, prune=("id", 100, 150))
        .where("id between 100 and 150")
        .collect()
    )
    assert sorted(r["id"] for r in got) == list(range(100, 151))

    # files without stats are conservatively kept
    from python_kinesis_streaming_spark.sources.snapshots import commit

    commit(t, [{"action": "add", "path": all_files[0]["path"] + ".nostats",
                "size": 0}])
    assert any(
        f["path"].endswith(".nostats") for f in prune_files(t, "id", lo=10**9)
    )


def test_stats_survive_compaction(spark, tmp_path):
    t = str(tmp_path / "corpus")
    write_snapshot(spark.range(100).repartition(4), t)
    compact(spark, t, target_files=1)
    (f,) = live_files(t)
    assert f["stats"]["id"]["min"] == 0
    assert f["stats"]["id"]["max"] == 99


def test_log_replay_matches_reference_model(tmp_path):
    """Property: for ANY commit sequence, live_files at every version
    equals a plain-dict replay of the same actions (hypothesis)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    paths = [f"data/f{i}.parquet" for i in range(6)]
    action_st = st.lists(
        st.tuples(st.sampled_from(["add", "remove"]), st.sampled_from(paths)),
        min_size=1,
        max_size=4,
    )

    @settings(max_examples=25, deadline=None)
    @given(commits=st.lists(action_st, min_size=1, max_size=8))
    def run(commits):
        import shutil
        import tempfile

        t = tempfile.mkdtemp(dir=str(tmp_path))
        try:
            reference: dict[str, bool] = {}
            ref_versions = []
            for actions in commits:
                acts = [
                    {"action": a, "path": p, "size": 1} if a == "add"
                    else {"action": a, "path": p}
                    for a, p in actions
                ]
                commit(t, acts)
                for a, p in actions:
                    if a == "add":
                        reference[p] = True
                    else:
                        reference.pop(p, None)
                ref_versions.append(sorted(reference))
            for v, expect in enumerate(ref_versions):
                got = [f["path"] for f in live_files(t, v)]
                assert got == expect
        finally:
            shutil.rmtree(t)

    run()
