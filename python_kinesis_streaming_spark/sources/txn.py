"""Transactional ingestion for snapshot tables.

Two pieces a continuously-fed 100 TB corpus table needs on top of
``snapshots.py``/``lakehouse.py``:

- **Idempotent (exactly-once) appends** — ``append_batch`` stamps each
  commit with a ``txn`` action ``{app, batch}``. A retried micro-batch
  (Structured Streaming re-runs ``foreachBatch`` with the SAME batch id
  after a failure) sees its batch id already committed and becomes a
  no-op, so the table never double-ingests. ``streaming_sink`` packages
  this as a ``foreachBatch`` callable: restart the query from its
  checkpoint and the one possibly-replayed batch deduplicates against
  the log — end-to-end exactly-once with no sink-side state beyond the
  commit log itself.
- **Optimistic-concurrency rebase** — ``commit_with_rebase`` turns
  "someone committed before me" from an abort into a retry on the new
  head when the two commits are *semantically* disjoint. Blind appends
  always rebase; a commit that removes or rewrites files (DELETE,
  MERGE, compaction) conflicts only if an intervening commit touched
  one of the SAME files. ``isolation="serializable"`` additionally
  refuses to hop over intervening adds (a predicate-driven DELETE
  cannot know whether new rows would have matched). This is the public
  optimistic-concurrency protocol of the open lakehouse formats,
  re-derived minimally: the O_EXCL log create is the only lock, losers
  re-validate instead of failing.

Scale notes: validation reads only the intervening LOG files (KBs per
commit) — never data. A thousand concurrent blind appenders serialize
on log-create retries alone; writers that rewrite files conflict
precisely when they must (lost update) and never when they need not
(disjoint file sets).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from .snapshots import (
    SnapshotConflict,
    _log_path,
    _replay_state,
    commit,
    current_version,
)


class ConcurrentModification(SnapshotConflict):
    """An intervening commit touched files this writer depends on."""


def last_committed_batch(table_dir: str, app: str) -> int:
    """Highest ``txn`` batch id committed for ``app``, or -1."""
    if current_version(table_dir) < 0:
        return -1
    return _replay_state(table_dir, None).txns.get(app, -1)


def _intervening_actions(table_dir: str, after: int, upto: int):
    for v in range(after + 1, upto + 1):
        import json

        with open(_log_path(table_dir, v)) as f:
            for line in f:
                yield json.loads(line)


def commit_with_rebase(
    table_dir: str,
    actions: list[dict],
    base: int,
    message: str = "",
    isolation: str = "write",
    max_retries: int = 20,
) -> int:
    """Commit on top of ``base``, rebasing over disjoint concurrent commits.

    ``isolation="write"`` (default): conflict only when an intervening
    commit removed/re-wrote a file this commit also removes or attaches
    a deletion vector to (the lost-update case). ``"serializable"``:
    additionally conflict when an intervening commit ADDED files — the
    right choice for predicate-driven deletes, whose row set could have
    included the new rows.
    """
    if isolation not in ("write", "serializable"):
        raise ValueError(f"txn: unknown isolation {isolation!r}")
    our_targets = {
        a["path"] for a in actions if a["action"] in ("remove", "dv")
    }
    while True:
        try:
            return commit(
                table_dir, actions, message=message, expected_version=base
            )
        except ConcurrentModification:
            raise
        except SnapshotConflict:
            if max_retries <= 0:
                raise
            max_retries -= 1
            head = current_version(table_dir)
            for a in _intervening_actions(table_dir, base, head):
                act = a.get("action")
                if act in ("remove", "dv") and a["path"] in our_targets:
                    raise ConcurrentModification(
                        f"file {a['path']} was modified by a concurrent "
                        f"commit (version <= {head})"
                    )
                if act == "add" and isolation == "serializable":
                    raise ConcurrentModification(
                        f"concurrent commit added {a['path']}; serializable "
                        "writers must re-run against the new head"
                    )
            base = head


def append_batch(
    df: DataFrame,
    table_dir: str,
    app: str,
    batch_id: int,
    message: str | None = None,
) -> int | None:
    """Append ``df`` exactly once under ``(app, batch_id)``.

    Returns the committed version, or None when this batch id was
    already committed (the retry case — nothing is written). The data
    files are staged BEFORE the idempotence check is re-validated inside
    the commit loop, so a concurrent twin of the same app committing the
    same batch first causes this writer to discard its staged files and
    return None — never a double-append.
    """
    from .lakehouse import _write_data_files
    from .table_schema import conform

    if batch_id < 0:
        raise ValueError("txn: batch_id must be >= 0")
    if batch_id <= last_committed_batch(table_dir, app):
        return None
    os.makedirs(table_dir, exist_ok=True)
    if current_version(table_dir) >= 0:
        df = conform(df, table_dir)
    adds = _write_data_files(df, table_dir)
    txn = {"action": "txn", "app": app, "batch": int(batch_id)}
    base = current_version(table_dir)
    while True:
        try:
            return commit(
                table_dir,
                adds + [txn],
                message=message or f"append {app}#{batch_id}",
                expected_version=base,
            )
        except SnapshotConflict:
            head = current_version(table_dir)
            if batch_id <= last_committed_batch(table_dir, app):
                # a twin won the race with OUR batch: drop staged files
                for a in adds:
                    try:
                        os.remove(os.path.join(table_dir, a["path"]))
                    except OSError:
                        pass
                return None
            base = head


def streaming_sink(table_dir: str, app: str):
    """``foreachBatch`` callable writing exactly-once into a snapshot table.

    >>> q = (events.writeStream.foreachBatch(streaming_sink(dir, "ev"))
    ...        .option("checkpointLocation", ckpt).start())

    Structured Streaming replays at most the last unacknowledged batch
    after a restart; ``append_batch``'s txn marker makes that replay a
    no-op, so the table sees each micro-batch exactly once.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        append_batch(batch_df, table_dir, app, int(batch_id))

    return _sink
