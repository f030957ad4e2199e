"""Lakehouse mutation layer (sources/lakehouse.py).

DV-mode deletes must be value-identical to copy-on-write deletes; merges
must rewrite only the files that contain a matching key; Z-ordering must
measurably improve multi-column manifest pruning. Atomicity inherits
snapshots.py's commit contract (tested there at the filesystem level)."""

from __future__ import annotations

import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from python_kinesis_streaming_spark.sources.lakehouse import (
    checkpoint,
    cluster_zorder,
    compact_small_files,
    decode_dv,
    delete_where,
    encode_dv,
    merge_upsert,
    prune_files_multi,
    purge_deletes,
    read_table,
    vacuum,
)
from python_kinesis_streaming_spark.sources.snapshots import (
    current_version,
    live_files,
    read_snapshot,
    write_snapshot,
)


# ---------------------------------------------------------------------------
# DV sidecar codec
# ---------------------------------------------------------------------------


@given(st.lists(st.integers(min_value=0, max_value=2**40)))
@settings(deadline=None, max_examples=200)
def test_dv_codec_roundtrip(positions):
    assert decode_dv(encode_dv(positions)) == sorted(set(positions))


def test_dv_codec_rejects_garbage():
    with pytest.raises(ValueError):
        decode_dv(b"XXXX\x00")
    with pytest.raises(ValueError):
        decode_dv(encode_dv([1, 5, 9]) + b"\x00")  # trailing bytes
    with pytest.raises(ValueError):
        encode_dv([-1])


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _make_table(spark, path, n=100, files=4):
    # spark.range with an explicit partition count gives DETERMINISTIC
    # contiguous id ranges per file (n=100, files=4 -> [0,24],[25,49],...),
    # unlike sample-based repartitionByRange boundaries
    df = spark.range(0, n, 1, files).selectExpr(
        "id", "id % 7 as grp", "cast(id * 10 as double) as val"
    )
    write_snapshot(df, path, message="seed")
    return path


def _ids(spark, path, version=None):
    return sorted(
        r["id"] for r in read_table(spark, path, version).select("id").collect()
    )


# ---------------------------------------------------------------------------
# DELETE
# ---------------------------------------------------------------------------


def test_delete_dv_mode_hides_rows_and_keeps_time_travel(spark, tmp_path):
    t = _make_table(spark, str(tmp_path / "t"))
    v0 = current_version(t)
    files_before = {f["path"] for f in live_files(t)}
    out = delete_where(spark, t, "id >= 10 and id < 20")
    assert out["deleted_rows"] == 10
    assert _ids(spark, t) == [i for i in range(100) if not 10 <= i < 20]
    # merge-on-read: no data file was rewritten
    assert {f["path"] for f in live_files(t)} == files_before
    # the pre-delete version still reads all 100 rows (and has no DVs,
    # so the plain snapshot reader also works there)
    assert _ids(spark, t, v0) == list(range(100))
    assert len(read_snapshot(spark, t, v0).collect()) == 100
    # ... but the current version must refuse the DV-blind reader
    with pytest.raises(ValueError, match="deletion vectors"):
        read_snapshot(spark, t)


def test_delete_dv_unions_and_is_idempotent(spark, tmp_path):
    t = _make_table(spark, str(tmp_path / "t"))
    delete_where(spark, t, "id < 5")
    out2 = delete_where(spark, t, "id < 8")  # overlaps the first delete
    assert out2["deleted_rows"] == 3  # only 5,6,7 are newly dead
    assert _ids(spark, t) == list(range(8, 100))
    out3 = delete_where(spark, t, "id < 8")
    assert out3["deleted_rows"] == 0
    assert current_version(t) == 2  # a no-op delete commits nothing


def test_delete_whole_file_becomes_remove(spark, tmp_path):
    t = _make_table(spark, str(tmp_path / "t"), n=100, files=4)
    n_before = len(live_files(t))
    out = delete_where(spark, t, "id < 25")  # exactly the first range file
    assert out["files_removed"] >= 1
    assert len(live_files(t)) < n_before
    assert _ids(spark, t) == list(range(25, 100))


def test_delete_rewrite_parity_with_dv(spark, tmp_path):
    a = _make_table(spark, str(tmp_path / "a"))
    b = _make_table(spark, str(tmp_path / "b"))
    pred = "grp = 3 and val > 100"
    oa = delete_where(spark, a, pred, mode="dv")
    ob = delete_where(spark, b, pred, mode="rewrite")
    assert oa["deleted_rows"] == ob["deleted_rows"] > 0
    assert _ids(spark, a) == _ids(spark, b)
    # rewrite leaves a DV-free table; the plain reader works
    assert len(read_snapshot(spark, b).collect()) == len(_ids(spark, b))


def test_delete_null_predicate_rows_survive(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30)], "id int, v int"
    )
    write_snapshot(df, t)
    for mode, path in (("dv", t),):
        out = delete_where(spark, path, "v > 15", mode=mode)
        assert out["deleted_rows"] == 1
    got = sorted(r["id"] for r in read_table(spark, t).collect())
    assert got == [1, 2]  # NULL predicate row survives, like SQL DELETE


def test_delete_prune_hint_limits_scan(spark, tmp_path):
    t = _make_table(spark, str(tmp_path / "t"))
    out = delete_where(spark, t, "id = 99", prune=("id", 99, 99))
    assert out["deleted_rows"] == 1
    assert _ids(spark, t) == list(range(99))


def test_purge_deletes_rewrites_only_dirty_files(spark, tmp_path):
    t = _make_table(spark, str(tmp_path / "t"))
    delete_where(spark, t, "id = 30")
    clean_before = {f["path"] for f in live_files(t)}
    dirty = 1
    purge_deletes(spark, t)
    ids = sorted(r["id"] for r in read_snapshot(spark, t).collect())
    assert ids == [i for i in range(100) if i != 30]
    # untouched files keep their identity (only the dirty one was swapped)
    after = {f["path"] for f in live_files(t)}
    assert len(clean_before & after) == len(clean_before) - dirty


# ---------------------------------------------------------------------------
# MERGE
# ---------------------------------------------------------------------------


def test_merge_updates_inserts_and_prunes_files(spark, tmp_path):
    t = _make_table(spark, str(tmp_path / "t"), n=100, files=4)
    before = {f["path"] for f in live_files(t)}
    source = spark.createDataFrame(
        [(3, 3, 999.0), (7, 0, 777.0), (200, 4, 123.0)],
        "id bigint, grp bigint, val double",
    )
    out = merge_upsert(spark, t, source, ["id"])
    # keys 3 and 7 live in the first range file only -> 1 of 4 rewritten
    assert out["files_rewritten"] == 1
    assert out["files_total"] == 4
    after = {f["path"] for f in live_files(t)}
    assert len(before & after) == 3  # three files untouched
    got = {r["id"]: r["val"] for r in read_table(spark, t).collect()}
    assert len(got) == 101
    assert (got[3], got[7], got[200]) == (999.0, 777.0, 123.0)
    assert got[50] == 500.0  # untouched row intact


def test_merge_pure_insert_appends_without_rewrite(spark, tmp_path):
    t = _make_table(spark, str(tmp_path / "t"))
    source = spark.createDataFrame(
        [(1000, 1, 1.0)], "id bigint, grp bigint, val double"
    )
    out = merge_upsert(spark, t, source, ["id"])
    assert out["files_rewritten"] == 0
    assert 1000 in set(_ids(spark, t))


def test_merge_respects_deletion_vectors(spark, tmp_path):
    t = _make_table(spark, str(tmp_path / "t"))
    delete_where(spark, t, "id = 5")
    # merge a key living in the SAME file as the deleted row
    source = spark.createDataFrame(
        [(6, 6, 66.0)], "id bigint, grp bigint, val double"
    )
    merge_upsert(spark, t, source, ["id"])
    ids = _ids(spark, t)
    assert 5 not in ids  # the deleted row must not resurrect
    got = {r["id"]: r["val"] for r in read_table(spark, t).collect()}
    assert got[6] == 66.0


def test_merge_rejects_duplicate_source_keys(spark, tmp_path):
    t = _make_table(spark, str(tmp_path / "t"))
    source = spark.createDataFrame(
        [(1, 1, 1.0), (1, 2, 2.0)], "id bigint, grp bigint, val double"
    )
    with pytest.raises(ValueError, match="unique"):
        merge_upsert(spark, t, source, ["id"])


def test_merge_into_empty_dir_creates_table(spark, tmp_path):
    t = str(tmp_path / "t")
    source = spark.createDataFrame([(1, 2)], "id int, v int")
    out = merge_upsert(spark, t, source, ["id"])
    assert out.get("inserted_table")
    assert [r["id"] for r in read_table(spark, t).collect()] == [1]


# ---------------------------------------------------------------------------
# Z-order clustering
# ---------------------------------------------------------------------------


def test_zorder_improves_multicolumn_pruning(spark, tmp_path):
    t = str(tmp_path / "grid")
    # x and y independent; linear layout sorts by x only
    df = spark.range(0, 4096).selectExpr(
        "id", "id % 64 as x", "cast(id / 64 as bigint) as y"
    )
    write_snapshot(
        df.repartitionByRange(16, "x").sortWithinPartitions("x"), t
    )
    files = len(live_files(t))
    # linear-on-x layout: a y-slice prunes (almost) nothing
    linear_kept = len(prune_files_multi(t, {"y": (0, 15)}))
    assert linear_kept >= files - 1

    before = sorted(
        (r["x"], r["y"]) for r in read_table(spark, t).collect()
    )
    out = cluster_zorder(spark, t, ["x", "y"], target_files=16)
    after = sorted(
        (r["x"], r["y"]) for r in read_table(spark, t).collect()
    )
    assert before == after  # clustering is a pure layout change
    z_kept = len(prune_files_multi(t, {"y": (0, 15)}))
    assert z_kept <= files // 2, (linear_kept, z_kept)
    # and the x dimension still prunes too (not a plain sort on y)
    zx_kept = len(prune_files_multi(t, {"x": (0, 15)}))
    assert zx_kept <= files // 2


def test_zorder_materializes_dvs(spark, tmp_path):
    t = _make_table(spark, str(tmp_path / "t"))
    delete_where(spark, t, "id < 10")
    cluster_zorder(spark, t, ["id"], target_files=2)
    # rewrite folded the DVs in: snapshot reader valid again
    ids = sorted(r["id"] for r in read_snapshot(spark, t).collect())
    assert ids == list(range(10, 100))


# ---------------------------------------------------------------------------
# checkpoints and vacuum
# ---------------------------------------------------------------------------


def test_checkpoint_replaces_log_prefix(spark, tmp_path):
    t = str(tmp_path / "t")
    write_snapshot(spark.range(0, 10), t)
    for i in range(4):
        write_snapshot(spark.range(10 * (i + 1), 10 * (i + 2)), t, mode="append")
    delete_where(spark, t, "id = 7")
    v = checkpoint(t)
    assert v == current_version(t)
    expected = _ids(spark, t)
    # burn the pre-checkpoint log: replay must not need it anymore
    for old in range(v):
        os.remove(os.path.join(t, "_log", f"{old:08d}.json"))
    assert _ids(spark, t) == expected
    # commits after the checkpoint replay incrementally on top of it
    delete_where(spark, t, "id = 8")
    assert 8 not in set(_ids(spark, t))


def test_vacuum_reaps_unreferenced_files(spark, tmp_path):
    t = str(tmp_path / "t")
    write_snapshot(spark.range(0, 10), t)
    write_snapshot(spark.range(10, 20), t)  # overwrite: v0 files dead
    dead = {f["path"] for f in live_files(t, 0)}
    deleted = vacuum(t, retain_versions=1)
    assert dead <= set(deleted)
    # latest version unaffected; the vacuumed version is gone physically
    assert sorted(r["id"] for r in read_table(spark, t).collect()) == list(
        range(10, 20)
    )
    with pytest.raises(Exception):
        read_snapshot(spark, t, version=0).collect()


def test_vacuum_reaps_superseded_dv_files(spark, tmp_path):
    t = _make_table(spark, str(tmp_path / "t"))
    delete_where(spark, t, "id = 1")
    delete_where(spark, t, "id = 2")  # supersedes the first DV file
    dv_dir = os.path.join(t, "dv")
    assert len(os.listdir(dv_dir)) == 2
    vacuum(t, retain_versions=1)
    assert len(os.listdir(dv_dir)) == 1
    assert set(_ids(spark, t)) == set(range(100)) - {1, 2}


def test_delete_large_fraction_dv_is_file_bounded(spark, tmp_path):
    # VERDICT r7 item 5: DV construction is executor-side, so a delete
    # matching a large fraction of the table (here 50% of 50k rows over
    # 8 files) must work with driver traffic bounded by FILE COUNT —
    # the result dict is the only thing collected, and each touched
    # file gets exactly one DV sidecar in the commit.
    t = str(tmp_path / "big")
    df = spark.range(0, 50_000, 1, 8).selectExpr(
        "id", "cast(id % 2 as int) as parity"
    )
    write_snapshot(df, t, message="seed")
    out = delete_where(spark, t, "parity = 1", mode="dv")
    assert out["deleted_rows"] == 25_000
    assert out["files_touched"] == 8
    assert out["files_removed"] == 0
    # every live file carries exactly one DV action in the new version
    from python_kinesis_streaming_spark.sources.snapshots import (
        _replay_state,
    )

    st = _replay_state(t, current_version(t))
    assert len(st.dvs) == 8
    assert all(a["cardinality"] == 3125 for a in st.dvs.values())
    got = sorted(
        r["id"] for r in read_table(spark, t).select("id").collect()
    )
    assert got == list(range(0, 50_000, 2))


def test_delete_large_fraction_dv_rewrite_parity(spark, tmp_path):
    a = _make_table(spark, str(tmp_path / "pa"), n=2000, files=5)
    b = _make_table(spark, str(tmp_path / "pb"), n=2000, files=5)
    pred = "grp in (1, 3, 5)"  # ~43% of rows
    oa = delete_where(spark, a, pred, mode="dv")
    ob = delete_where(spark, b, pred, mode="rewrite")
    assert oa["deleted_rows"] == ob["deleted_rows"] > 800
    assert _ids(spark, a) == _ids(spark, b)


# ---------------------------------------------------------------------------
# Compaction (small-file OPTIMIZE)
# ---------------------------------------------------------------------------


def _seed_docs(spark, tmp_path, n_files=8):
    from python_kinesis_streaming_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "lang", "n_chars"
    )
    tdir = str(tmp_path / "compact_tbl")
    write_snapshot(docs.repartition(n_files, "doc_id"), tdir, message="seed")
    return docs, tdir


def test_compact_folds_dvs_and_preserves_survivors(spark, tmp_path):
    """8 small DV'd files -> 1 clean file; survivor rows identical;
    pre-compaction version still time-travels to the originals."""
    docs, tdir = _seed_docs(spark, tmp_path)
    delete_where(spark, tdir, "n_chars % 5 = 0", mode="dv")
    before = read_table(spark, tdir)
    exp_rows = before.count()
    exp_sum = before.agg({"n_chars": "sum"}).collect()[0][0]
    n_before = len(live_files(tdir))

    res = compact_small_files(spark, tdir, target_bytes=1 << 20)
    assert res["files_compacted"] == n_before
    assert res["files_created"] < n_before

    after = read_table(spark, tdir)
    assert after.count() == exp_rows
    assert after.agg({"n_chars": "sum"}).collect()[0][0] == exp_sum
    from python_kinesis_streaming_spark.sources.snapshots import (
        _replay_state,
    )

    st = _replay_state(tdir, None)
    assert not st.dvs  # folded in: compacted files come out clean
    assert len(st.live) == res["files_created"]
    old = _replay_state(tdir, res["version"] - 1)
    assert len(old.live) == n_before  # immutable history


def test_compact_respects_target_bytes(spark, tmp_path):
    """A target just above the largest file forces multiple groups; no
    output group's INPUT bytes exceed the target."""
    from python_kinesis_streaming_spark.sources.snapshots import (
        _replay_state,
    )

    docs, tdir = _seed_docs(spark, tmp_path)
    sizes = [a["size"] for a in _replay_state(tdir, None).live.values()]
    target = max(sizes) * 2 + 1024  # fits ~2 inputs per group
    res = compact_small_files(spark, tdir, target_bytes=target)
    assert res["files_compacted"] >= 2
    assert res["files_created"] >= 2  # forced into multiple groups
    assert (
        read_table(spark, tdir).count()
        == docs.count()
    )


def test_compact_is_a_noop_when_nothing_qualifies(spark, tmp_path):
    docs, tdir = _seed_docs(spark, tmp_path, n_files=1)
    v = current_version(tdir)
    res = compact_small_files(spark, tdir, target_bytes=1 << 20)
    assert res == {
        "version": v,
        "files_compacted": 0,
        "files_created": 0,
    }
    # second compaction after a real one is also a no-op
    docs2, tdir2 = _seed_docs(spark, tmp_path / "b", n_files=6)
    compact_small_files(spark, tdir2, target_bytes=1 << 20)
    v2 = current_version(tdir2)
    res2 = compact_small_files(spark, tdir2, target_bytes=1 << 20)
    assert res2["version"] == v2 and res2["files_compacted"] == 0


@settings(max_examples=200, deadline=None)
@given(
    sizes=st.dictionaries(
        st.text(st.characters(min_codepoint=97, max_codepoint=122),
                min_size=1, max_size=8),
        st.integers(min_value=1, max_value=1 << 22),
        min_size=0,
        max_size=40,
    ),
    target=st.integers(min_value=1 << 16, max_value=1 << 23),
)
def test_ffd_pack_properties(sizes, target):
    """FFD invariants for any size distribution: partition (every path
    exactly once), capacity (group input sums ≤ target unless a single
    oversized item), and the BFD/FFD tightness bound (no two groups can
    both be ≤ half the target — the later one's seed would have fit the
    earlier one)."""
    from python_kinesis_streaming_spark.sources.lakehouse import _ffd_pack

    groups = _ffd_pack(sizes, target)
    flat = [p for g in groups for p in g]
    assert sorted(flat) == sorted(sizes)  # partition, no dup/loss
    fills = [sum(sizes[p] for p in g) for g in groups]
    for g, fill in zip(groups, fills):
        assert fill <= target or len(g) == 1  # oversized items isolate
    half_empty = [f for f in fills if 2 * f <= target]
    assert len(half_empty) <= 1
    # determinism
    assert _ffd_pack(dict(reversed(list(sizes.items()))), target) == groups
