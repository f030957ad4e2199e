"""Transactional ingestion: idempotent appends + optimistic rebase."""

import os

import pytest

from python_kinesis_streaming_spark.sources.lakehouse import (
    delete_where,
    read_table,
)
from python_kinesis_streaming_spark.sources.lakehouse import (
    checkpoint as lh_checkpoint,
)
from python_kinesis_streaming_spark.sources.snapshots import (
    SnapshotConflict,
    commit,
    current_version,
    live_files,
    write_snapshot,
)
from python_kinesis_streaming_spark.sources.txn import (
    ConcurrentModification,
    append_batch,
    commit_with_rebase,
    last_committed_batch,
    streaming_sink,
)

def _ids(spark, t):
    return sorted(r["id"] for r in read_table(spark, t).collect())


# ---------------------------------------------------------------------------
# idempotent appends
# ---------------------------------------------------------------------------


def test_append_batch_commits_and_reads_back(spark, tmp_path):
    t = str(tmp_path / "t")
    v0 = append_batch(spark.range(0, 5), t, "app", 0)
    v1 = append_batch(spark.range(5, 10), t, "app", 1)
    assert (v0, v1) == (0, 1)
    assert _ids(spark, t) == list(range(10))
    assert last_committed_batch(t, "app") == 1
    assert last_committed_batch(t, "other") == -1


def test_append_batch_replay_is_noop(spark, tmp_path):
    t = str(tmp_path / "t")
    append_batch(spark.range(0, 5), t, "app", 0)
    append_batch(spark.range(5, 10), t, "app", 1)
    files_before = len(live_files(t))
    # the failure-recovery path: Structured Streaming re-runs the last
    # batch with the same id
    assert append_batch(spark.range(5, 10), t, "app", 1) is None
    assert append_batch(spark.range(0, 5), t, "app", 0) is None
    assert _ids(spark, t) == list(range(10))
    assert len(live_files(t)) == files_before
    assert current_version(t) == 1


def test_append_batch_apps_are_independent(spark, tmp_path):
    t = str(tmp_path / "t")
    append_batch(spark.range(0, 3), t, "a", 0)
    append_batch(spark.range(3, 6), t, "b", 0)
    assert append_batch(spark.range(9, 12), t, "b", 0) is None
    assert _ids(spark, t) == list(range(6))


def test_append_batch_survives_checkpoint(spark, tmp_path):
    t = str(tmp_path / "t")
    append_batch(spark.range(0, 5), t, "app", 0)
    lh_checkpoint(t)
    # burn the pre-checkpoint log: txn watermark must come from the
    # checkpoint state, not the (gone) log prefix
    os.remove(os.path.join(t, "_log", "00000000.json"))
    assert last_committed_batch(t, "app") == 0
    assert append_batch(spark.range(0, 5), t, "app", 0) is None
    append_batch(spark.range(5, 8), t, "app", 1)
    assert _ids(spark, t) == list(range(8))


def test_streaming_sink_callable(spark, tmp_path):
    t = str(tmp_path / "t")
    sink = streaming_sink(t, "ev")
    sink(spark.range(0, 4), 0)
    sink(spark.range(4, 8), 1)
    sink(spark.range(4, 8), 1)  # replayed batch after a simulated crash
    assert _ids(spark, t) == list(range(8))


def test_streaming_sink_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    spark.range(0, 20).write.parquet(src)
    stream = spark.readStream.schema("id bigint").parquet(src)
    q = (
        stream.writeStream.foreachBatch(streaming_sink(t, "e2e"))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _ids(spark, t) == list(range(20))
    # restart from the same checkpoint: no new data, no new version
    v = current_version(t)
    q = (
        stream.writeStream.foreachBatch(streaming_sink(t, "e2e"))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert current_version(t) == v
    assert _ids(spark, t) == list(range(20))


# ---------------------------------------------------------------------------
# optimistic rebase
# ---------------------------------------------------------------------------


def _stage(spark, t, lo, hi):
    """Stage data files without committing; return the add actions."""
    from python_kinesis_streaming_spark.sources.lakehouse import (
        _write_data_files,
    )

    return _write_data_files(spark.range(lo, hi), t)


def test_rebase_appends_over_concurrent_commit(spark, tmp_path):
    t = str(tmp_path / "t")
    write_snapshot(spark.range(0, 10), t)
    base = current_version(t)
    adds = _stage(spark, t, 10, 20)
    # someone else lands first
    write_snapshot(spark.range(20, 30), t, mode="append")
    # plain commit at the stale base conflicts ...
    with pytest.raises(SnapshotConflict):
        commit(t, list(adds), expected_version=base)
    # ... the rebase hops over it (blind append, no shared files)
    v = commit_with_rebase(t, list(adds), base)
    assert v == current_version(t)
    assert _ids(spark, t) == list(range(30))


def test_rebase_conflicts_on_shared_file(spark, tmp_path):
    t = str(tmp_path / "t")
    write_snapshot(spark.range(0, 10).repartition(1), t)
    base = current_version(t)
    victim = live_files(t)[0]["path"]
    # our commit wants to remove (rewrite) the file ...
    adds = _stage(spark, t, 0, 10)
    ours = [{"action": "remove", "path": victim}] + adds
    # ... but a concurrent DELETE already rewrote it
    delete_where(spark, t, "id = 3", mode="rewrite")
    with pytest.raises(ConcurrentModification):
        commit_with_rebase(t, ours, base)


def test_rebase_serializable_refuses_new_files(spark, tmp_path):
    t = str(tmp_path / "t")
    write_snapshot(spark.range(0, 10), t)
    base = current_version(t)
    adds = _stage(spark, t, 10, 20)
    write_snapshot(spark.range(20, 30), t, mode="append")
    with pytest.raises(ConcurrentModification):
        commit_with_rebase(t, list(adds), base, isolation="serializable")


def test_rebase_retries_multiple_times(spark, tmp_path):
    t = str(tmp_path / "t")
    write_snapshot(spark.range(0, 10), t)
    base = current_version(t)
    adds = _stage(spark, t, 10, 20)
    for i in range(3):
        write_snapshot(
            spark.range(100 + i, 101 + i), t, mode="append"
        )
    v = commit_with_rebase(t, list(adds), base)
    assert v == current_version(t)
    assert set(_ids(spark, t)) >= set(range(20))
