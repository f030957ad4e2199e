"""Versioned parquet snapshots with an atomic commit log.

Training-data reproducibility needs an answer to "exactly which files
made up the corpus this run trained on?" — mutable directories of
parquet cannot answer it. This module implements the public
transaction-log idea (a numbered JSON commit log whose replay defines
each version's live file set — the concept behind the open lakehouse
formats, reimplemented minimally and independently here):

```
table_dir/
  _log/00000000.json   one JSON-lines file per commit: add / remove /
  _log/00000001.json   meta actions
  data/...parquet      immutable data files, never rewritten in place
```

- ``commit`` appends the next numbered log file with ``os.O_EXCL`` —
  the filesystem's atomic create-if-absent is the whole concurrency
  protocol. A racing writer loses the create and gets
  ``SnapshotConflict`` (optimistic concurrency); ``expected_version``
  turns stale-read-then-write into a detected conflict instead of a
  lost update.
- ``read_snapshot(spark, dir, version=K)`` replays the log to K and
  reads exactly that file set — time travel is free because data files
  are immutable and removes are logical.
- ``write_snapshot`` materializes a DataFrame as new data files plus
  one commit (mode="overwrite" logically removes the previous live set;
  mode="append" only adds).
- ``compact`` rewrites the live set into fewer files in ONE commit
  (remove+add together), so readers at any version never see a torn
  table.

Scale notes (100 TB): the log holds file-level metadata only (KBs per
commit); data I/O is all Spark-side parquet. Listing a snapshot is a
driver-side log replay — no directory scans, which is precisely what
makes object-store tables with millions of files workable. Immutable
files + logical removes also mean old versions remain readable until an
explicit vacuum (not implemented — retention policy is a deployment
decision).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

LOG_DIR = "_log"


class SnapshotConflict(Exception):
    """Another writer committed the version this writer raced for."""


def _log_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, LOG_DIR, f"{version:08d}.json")


def current_version(table_dir: str) -> int:
    """Latest committed version, or -1 for an empty/nonexistent table."""
    log = os.path.join(table_dir, LOG_DIR)
    if not os.path.isdir(log):
        return -1
    versions = [
        int(name[:8])
        for name in os.listdir(log)
        if name.endswith(".json") and name[:8].isdigit()
    ]
    return max(versions, default=-1)


def commit(
    table_dir: str,
    actions: list[dict],
    message: str = "",
    expected_version: int | None = None,
) -> int:
    """Atomically append one commit; returns its version number.

    ``expected_version`` is the version this writer based its work on —
    if someone else committed since, raise instead of silently stacking
    a lost update on top."""
    os.makedirs(os.path.join(table_dir, LOG_DIR), exist_ok=True)
    cur = current_version(table_dir)
    if expected_version is not None and cur != expected_version:
        raise SnapshotConflict(
            f"table at version {cur}, writer expected {expected_version}"
        )
    version = cur + 1
    lines = [json.dumps({"action": "meta", "message": message})]
    for a in actions:
        if a.get("action") not in ("add", "remove", "dv", "txn", "schema"):
            raise ValueError(f"snapshot: unknown action {a.get('action')!r}")
        lines.append(json.dumps(a, sort_keys=True))
    payload = ("\n".join(lines) + "\n").encode()
    path = _log_path(table_dir, version)
    # Write the payload to a private temp file first, then os.link() it to
    # the final name: link() is create-if-absent-or-fail (the same loser-
    # detects-conflict contract as O_CREAT|O_EXCL) but the commit becomes
    # visible to concurrent readers only with its COMPLETE contents — an
    # O_EXCL create followed by write() exposes an empty/partial log file
    # that a racing current_version()/_replay() would crash on or silently
    # replay short.
    tmp = f"{path}.tmp.{os.getpid()}.{id(lines)}"
    fd = os.open(tmp, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    try:
        try:
            os.write(fd, payload)
        finally:
            os.close(fd)
        try:
            os.link(tmp, path)
        except FileExistsError:
            raise SnapshotConflict(
                f"version {version} was committed concurrently"
            )
    finally:
        os.unlink(tmp)
    return version


def _checkpoint_path(table_dir: str, version: int) -> str:
    return os.path.join(
        table_dir, LOG_DIR, f"{version:08d}.checkpoint.json"
    )


def _latest_checkpoint(table_dir: str, at_or_below: int) -> int:
    """Highest checkpointed version <= ``at_or_below``, or -1."""
    log = os.path.join(table_dir, LOG_DIR)
    best = -1
    for name in os.listdir(log):
        if name.endswith(".checkpoint.json") and name[:8].isdigit():
            v = int(name[:8])
            if v <= at_or_below:
                best = max(best, v)
    return best


class TableState:
    """Replayed log state at one version.

    - ``live``: path -> add action (the version's file set)
    - ``dvs``: path -> dv action (deletion vectors in force)
    - ``txns``: app -> highest committed txn batch id
    - ``schema``: the latest ``schema`` action's payload (or None) —
      Spark StructType JSON plus per-column defaults
    """

    __slots__ = ("live", "dvs", "txns", "schema", "version")

    def __init__(self, live, dvs, txns, schema, version):
        self.live = live
        self.dvs = dvs
        self.txns = txns
        self.schema = schema
        self.version = version


def _replay_state(table_dir: str, version: int | None) -> TableState:
    """Replay the log to ``version``.

    Starts from the newest checkpoint at-or-below ``version`` when one
    exists (written by ``lakehouse.checkpoint`` every N commits), so replay
    cost is O(commits since checkpoint), not O(table lifetime) — the log of
    a table written to every 5 minutes for a year is ~100k commits.
    """
    cur = current_version(table_dir)
    if cur < 0:
        raise ValueError(f"snapshot: no table at {table_dir}")
    if version is None:
        version = cur
    if version > cur or version < 0:
        raise ValueError(f"snapshot: version {version} does not exist (latest {cur})")
    live: dict[str, dict] = {}
    dvs: dict[str, dict] = {}
    txns: dict[str, int] = {}
    schema = None
    start = 0
    ckpt = _latest_checkpoint(table_dir, version)
    if ckpt >= 0:
        with open(_checkpoint_path(table_dir, ckpt)) as f:
            state = json.load(f)
        live = {a["path"]: a for a in state["live"]}
        dvs = {a["path"]: a for a in state.get("dvs", [])}
        txns = dict(state.get("txns", {}))
        schema = state.get("schema")
        start = ckpt + 1
    for v in range(start, version + 1):
        with open(_log_path(table_dir, v)) as f:
            for line in f:
                a = json.loads(line)
                if a["action"] == "add":
                    # tag the commit version: schema evolution needs "was
                    # this file written before column X existed?" and the
                    # tag rides into checkpoints with the rest of the action
                    a = dict(a)
                    a["_v"] = v
                    live[a["path"]] = a
                elif a["action"] == "remove":
                    live.pop(a["path"], None)
                    dvs.pop(a["path"], None)
                elif a["action"] == "dv":
                    # a new vector for a file SUPERSEDES the old one (each
                    # delete writes the union of old + new positions)
                    dvs[a["path"]] = a
                elif a["action"] == "txn":
                    app = a["app"]
                    txns[app] = max(txns.get(app, -1), int(a["batch"]))
                elif a["action"] == "schema":
                    # latest schema action wins (full replacement)
                    schema = {k: v for k, v in a.items() if k != "action"}
    return TableState(live, dvs, txns, schema, version)


def _replay_full(
    table_dir: str, version: int | None
) -> tuple[dict[str, dict], dict[str, dict], int]:
    st = _replay_state(table_dir, version)
    return st.live, st.dvs, st.version


def _replay(table_dir: str, version: int | None) -> tuple[dict[str, dict], int]:
    live, _dvs, version = _replay_full(table_dir, version)
    return live, version


def live_files(table_dir: str, version: int | None = None) -> list[dict]:
    """The file-set defining a version (sorted by path, deterministic)."""
    live, _ = _replay(table_dir, version)
    return [live[p] for p in sorted(live)]


def history(table_dir: str) -> list[dict]:
    """Per-commit metadata: version, message, counts of adds/removes."""
    out = []
    for v in range(current_version(table_dir) + 1):
        adds = removes = dvs = 0
        message = ""
        with open(_log_path(table_dir, v)) as f:
            for line in f:
                a = json.loads(line)
                if a["action"] == "add":
                    adds += 1
                elif a["action"] == "remove":
                    removes += 1
                elif a["action"] == "dv":
                    dvs += 1
                elif a["action"] == "meta":
                    message = a.get("message", "")
        out.append(
            {
                "version": v,
                "message": message,
                "adds": adds,
                "removes": removes,
                "dvs": dvs,
            }
        )
    return out


def _file_column_stats(path: str) -> dict:
    """Per-column min/max/null_count from the parquet footer (metadata
    read only, no data pages). Nested columns and types that don't
    JSON-serialize cleanly are skipped — pruning treats missing stats as
    'keep the file' so this is always safe."""
    import datetime

    import pyarrow.parquet as pq

    def jsonable(v):
        if isinstance(v, (bool, int, float, str)):
            return v
        if isinstance(v, (datetime.datetime, datetime.date)):
            return v.isoformat()
        return None

    md = pq.ParquetFile(path).metadata
    stats: dict[str, dict] = {}
    for rg in range(md.num_row_groups):
        group = md.row_group(rg)
        for j in range(group.num_columns):
            col = group.column(j)
            name = col.path_in_schema
            if "." in name:
                continue
            s = col.statistics
            if s is None or not s.has_min_max:
                continue
            mn, mx = jsonable(s.min), jsonable(s.max)
            if mn is None or mx is None:
                continue
            nulls = s.null_count if s.has_null_count else None
            cur = stats.get(name)
            if cur is None:
                stats[name] = {"min": mn, "max": mx, "nulls": nulls}
            else:
                cur["min"] = min(cur["min"], mn)
                cur["max"] = max(cur["max"], mx)
                if nulls is not None and cur["nulls"] is not None:
                    cur["nulls"] += nulls
    return stats


def prune_files(
    table_dir: str,
    column: str,
    lo=None,
    hi=None,
    version: int | None = None,
) -> list[dict]:
    """Live files whose [min,max] for ``column`` intersects [lo, hi].

    Manifest-level skipping: at scale this is what avoids even LISTING
    irrelevant files — footer pruning only helps after the scan already
    opened the file. Files without stats for the column are kept
    (conservative, never wrong)."""
    out = []
    for f in live_files(table_dir, version):
        s = (f.get("stats") or {}).get(column)
        if s is not None:
            if lo is not None and s["max"] < lo:
                continue
            if hi is not None and s["min"] > hi:
                continue
        out.append(f)
    return out


def read_snapshot(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    prune: tuple | None = None,
) -> DataFrame:
    """DataFrame over exactly one version's file set (time travel).

    ``prune=(column, lo, hi)`` applies manifest-level file skipping
    before the scan — correctness still requires the caller's own
    filter, exactly like partition pruning."""
    st = _replay_state(table_dir, version)
    if st.dvs:
        raise ValueError(
            "snapshot: version has deletion vectors — read it with "
            "lakehouse.read_table (DV-aware) instead of read_snapshot"
        )
    if st.schema and st.schema.get("defaults"):
        raise ValueError(
            "snapshot: schema has columns with initial defaults — read it "
            "with lakehouse.read_table (schema-aware) instead"
        )
    if prune is not None:
        column, lo, hi = prune
        files = prune_files(table_dir, column, lo, hi, version)
        paths = [os.path.join(table_dir, f["path"]) for f in files]
    else:
        paths = [os.path.join(table_dir, p) for p in sorted(st.live)]
    if not paths:
        raise ValueError("snapshot: version has no live files")
    reader = spark.read
    if st.schema:
        from pyspark.sql.types import StructType

        reader = reader.schema(StructType.fromJson(st.schema["spark"]))
    return reader.parquet(*paths)


def write_snapshot(
    df: DataFrame,
    table_dir: str,
    message: str = "",
    mode: str = "overwrite",
    max_retries: int = 3,
) -> int:
    """Materialize ``df`` as immutable data files + one commit.

    ``mode="overwrite"`` logically removes the previous live set in the
    same commit; ``mode="append"`` only adds. Data lands under a
    uuid-named subdirectory, so a conflicting commit retries WITHOUT
    rewriting data — only the log race is retried."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"snapshot: unknown mode {mode!r}")
    os.makedirs(table_dir, exist_ok=True)
    rel_dir = os.path.join("data", uuid.uuid4().hex)
    out_dir = os.path.join(table_dir, rel_dir)
    df.write.mode("errorifexists").parquet(out_dir)
    adds = []
    for name in sorted(os.listdir(out_dir)):
        if not name.endswith(".parquet"):
            continue
        full = os.path.join(out_dir, name)
        adds.append(
            {
                "action": "add",
                "path": os.path.join(rel_dir, name),
                "size": os.path.getsize(full),
                "stats": _file_column_stats(full),
            }
        )
    if not adds:
        raise ValueError("snapshot: write produced no parquet files")
    for attempt in range(max_retries + 1):
        base = current_version(table_dir)
        actions = list(adds)
        if mode == "overwrite" and base >= 0:
            for f in live_files(table_dir, base):
                actions.append({"action": "remove", "path": f["path"]})
        try:
            return commit(
                table_dir, actions, message=message, expected_version=base
            )
        except SnapshotConflict:
            if attempt == max_retries:
                raise
    raise AssertionError("unreachable")


def compact(
    spark: SparkSession,
    table_dir: str,
    target_files: int = 1,
    message: str = "compact",
) -> int:
    """Rewrite the live set into ``target_files`` files in one commit.

    Readers at the old version still see the old files (immutable); the
    new version atomically swaps the whole set."""
    base = current_version(table_dir)
    df = read_snapshot(spark, table_dir, base)
    rel_dir = os.path.join("data", uuid.uuid4().hex)
    out_dir = os.path.join(table_dir, rel_dir)
    df.coalesce(target_files).write.mode("errorifexists").parquet(out_dir)
    actions = [
        {
            "action": "add",
            "path": os.path.join(rel_dir, name),
            "size": os.path.getsize(os.path.join(out_dir, name)),
            "stats": _file_column_stats(os.path.join(out_dir, name)),
        }
        for name in sorted(os.listdir(out_dir))
        if name.endswith(".parquet")
    ]
    for f in live_files(table_dir, base):
        actions.append({"action": "remove", "path": f["path"]})
    return commit(table_dir, actions, message=message, expected_version=base)
