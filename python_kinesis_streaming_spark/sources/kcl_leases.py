"""KCL-style lease coordination for multi-worker shard consumption.

A fleet of consumer workers must agree on who polls which shard. The KCL
solves this with a lease table (DynamoDB): one lease row per shard holding
``(owner, counter, checkpoint)``; workers renew their leases by bumping
the counter, claim leases whose counter has not moved for a TTL (the
owner is presumed dead), and steal leases from over-loaded owners until
ownership is balanced. The counter doubles as a **fencing token**: any
write (renew or checkpoint) conditioned on the counter the writer last
saw fails if another worker has since taken the lease, so a paused
("zombie") worker can never clobber its successor's checkpoint.

This module implements that exact protocol over a directory of JSON
files — per-shard ``O_EXCL`` lock files stand in for DynamoDB's
conditional writes (same atomicity contract, single-host scope; swapping
the storage layer for a real conditional-write store is a transport
change, not a protocol change).

Scale shape: lease traffic is O(shards) tiny metadata writes per TTL —
independent of data volume. 1000 shards over N workers balance to
ceil(1000/N) each; a worker crash redistributes only that worker's
leases after one TTL. Record I/O stays in ``kinesis_consumer.poll_shard``
per owned shard.
"""

from __future__ import annotations

import json
import os
import time


class LeaseLostError(RuntimeError):
    """A renew/checkpoint was fenced: another worker holds the lease."""


class LeaseTable:
    """One JSON lease per shard; per-lease critical sections via O_EXCL
    lock files (the conditional-write stand-in)."""

    def __init__(self, dir_: str):
        self.dir = dir_
        os.makedirs(dir_, exist_ok=True)

    def _path(self, shard_id: str) -> str:
        return os.path.join(self.dir, f"{shard_id}.lease.json")

    def _lock(self, shard_id: str):
        lock_path = self._path(shard_id) + ".lock"

        class _Guard:
            def __enter__(g):
                for _ in range(2000):  # ~2s worst case
                    try:
                        g.fd = os.open(
                            lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY
                        )
                        return g
                    except FileExistsError:
                        time.sleep(0.001)
                raise TimeoutError(f"lease lock stuck: {lock_path}")

            def __exit__(g, *exc):
                os.close(g.fd)
                os.unlink(lock_path)

        return _Guard()

    def read(self, shard_id: str) -> dict | None:
        try:
            with open(self._path(shard_id)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def read_all(self) -> dict[str, dict]:
        out = {}
        for name in os.listdir(self.dir):
            if name.endswith(".lease.json"):
                shard_id = name[: -len(".lease.json")]
                lease = self.read(shard_id)
                if lease is not None:
                    out[shard_id] = lease
        return out

    def _write(self, shard_id: str, lease: dict) -> None:
        tmp = self._path(shard_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(lease, f)
        os.replace(tmp, self._path(shard_id))

    def conditional_put(
        self, shard_id: str, expected_counter: int | None, lease: dict
    ) -> bool:
        """Write the lease iff the stored counter still equals
        ``expected_counter`` (``None`` = must not exist / never owned).
        Returns False on condition failure — the caller lost the race."""
        with self._lock(shard_id):
            current = self.read(shard_id)
            cur_counter = None if current is None else current["counter"]
            if cur_counter != expected_counter:
                return False
            self._write(shard_id, lease)
            return True


class LeaseCoordinator:
    """One worker's view of the lease protocol (KCL ShardSyncer +
    LeaseTaker + LeaseRenewer in one object, sized for tests).

    ``lease_ttl_s``: a lease whose counter has not advanced within the
    TTL is up for grabs. ``now_fn`` is injectable so tests control time.
    """

    def __init__(
        self,
        table: LeaseTable,
        worker_id: str,
        lease_ttl_s: float = 10.0,
        now_fn=time.time,
    ):
        self.table = table
        self.worker = worker_id
        self.ttl = lease_ttl_s
        self.now = now_fn
        #: shard_id -> counter we last wrote (our fencing tokens)
        self.owned: dict[str, int] = {}

    # -- claiming ----------------------------------------------------------

    def _is_expired(self, lease: dict) -> bool:
        return self.now() - lease["renewed_at"] >= self.ttl

    def take_leases(self, shard_ids: list[str]) -> list[str]:
        """One KCL taker pass: claim unowned/expired leases, then steal
        from the most-loaded live owner until we hold our fair share.
        Returns the shards owned after the pass."""
        leases = self.table.read_all()

        # 1. claim shards with no lease or an expired one
        for shard_id in shard_ids:
            lease = leases.get(shard_id)
            if lease is None or self._is_expired(lease):
                expected = None if lease is None else lease["counter"]
                counter = 1 if lease is None else lease["counter"] + 1
                if self.table.conditional_put(
                    shard_id,
                    expected,
                    self._lease(shard_id, counter, lease),
                ):
                    self.owned[shard_id] = counter

        # 2. steal toward balance: fair share = ceil(shards / live workers)
        leases = self.table.read_all()
        live: dict[str, list[str]] = {}
        for shard_id, lease in leases.items():
            if not self._is_expired(lease):
                live.setdefault(lease["owner"], []).append(shard_id)
        live.setdefault(self.worker, [])
        n_workers = len(live)
        fair = -(-len(shard_ids) // n_workers)  # ceil
        while len(live[self.worker]) < fair:
            donor, donor_shards = max(
                live.items(), key=lambda kv: len(kv[1])
            )
            if donor == self.worker or len(donor_shards) <= fair:
                break  # nothing worth stealing
            victim = sorted(donor_shards)[0]
            lease = leases[victim]
            counter = lease["counter"] + 1
            if self.table.conditional_put(
                victim, lease["counter"], self._lease(victim, counter, lease)
            ):
                self.owned[victim] = counter
                donor_shards.remove(victim)
                live[self.worker].append(victim)
            else:
                break  # lost the race this pass; next pass retries

        # drop anything we think we own but no longer do
        self._sync_owned()
        return sorted(self.owned)

    def _lease(
        self, shard_id: str, counter: int, prev: dict | None
    ) -> dict:
        return {
            "shard_id": shard_id,
            "owner": self.worker,
            "counter": counter,
            "renewed_at": self.now(),
            "checkpoint": None if prev is None else prev.get("checkpoint"),
        }

    def _sync_owned(self) -> None:
        for shard_id in list(self.owned):
            lease = self.table.read(shard_id)
            if (
                lease is None
                or lease["owner"] != self.worker
                or lease["counter"] != self.owned[shard_id]
            ):
                del self.owned[shard_id]

    # -- renewing / fencing ------------------------------------------------

    def renew(self) -> list[str]:
        """Bump every owned lease's counter; leases stolen since the last
        write are silently dropped (we discover the fence). Returns the
        shards still owned."""
        for shard_id in list(self.owned):
            counter = self.owned[shard_id]
            new = counter + 1
            lease = self.table.read(shard_id) or {}
            ok = self.table.conditional_put(
                shard_id,
                counter,
                {
                    "shard_id": shard_id,
                    "owner": self.worker,
                    "counter": new,
                    "renewed_at": self.now(),
                    "checkpoint": lease.get("checkpoint"),
                },
            )
            if ok:
                self.owned[shard_id] = new
            else:
                del self.owned[shard_id]  # fenced: someone took it
        return sorted(self.owned)

    def checkpoint(self, shard_id: str, sequence_number: str) -> None:
        """Record progress on an owned shard. Raises ``LeaseLostError``
        if the lease moved — the zombie-writer guard."""
        counter = self.owned.get(shard_id)
        if counter is None:
            raise LeaseLostError(f"{self.worker} does not hold {shard_id}")
        new = counter + 1
        ok = self.table.conditional_put(
            shard_id,
            counter,
            {
                "shard_id": shard_id,
                "owner": self.worker,
                "counter": new,
                "renewed_at": self.now(),
                "checkpoint": sequence_number,
            },
        )
        if not ok:
            del self.owned[shard_id]
            raise LeaseLostError(f"{self.worker} lost {shard_id}")
        self.owned[shard_id] = new

    def get_checkpoint(self, shard_id: str) -> str | None:
        lease = self.table.read(shard_id)
        return None if lease is None else lease.get("checkpoint")


def coordinated_poll(
    client,
    stream: str,
    coordinator: LeaseCoordinator,
    limit: int = 1000,
) -> list[dict]:
    """One poll cycle under lease coordination: take/renew leases, drain
    ONLY the owned shards, checkpoint through the lease table (fenced).

    Run one coordinator per worker process against a shared table dir;
    the union of every worker's output covers the stream exactly once
    while all workers stay live, and a dead worker's shards resume from
    its last fenced checkpoint after one TTL.
    """
    from python_kinesis_streaming_spark.sources.kinesis_consumer import (
        poll_shard,
    )

    owned = coordinator.take_leases(client.list_shard_ids(stream))
    out: list[dict] = []
    for shard_id in owned:

        class _LeaseCheckpointer:
            def load(self, sid):
                return coordinator.get_checkpoint(sid)

            def save(self, sid, seq):
                coordinator.checkpoint(sid, seq)

        try:
            # Drain directly into ``out`` (the sink): if the lease is
            # stolen mid-drain, checkpoints for earlier batches have
            # already committed, so the successor resumes AFTER them —
            # discarding this worker's drained records with the exception
            # would mean no worker ever emits them (at-least-once broken).
            # With the sink they stay delivered here; the one batch whose
            # checkpoint lost the fence race is re-delivered by the
            # successor (a duplicate, which at-least-once permits).
            poll_shard(
                client,
                stream,
                shard_id,
                checkpointer=_LeaseCheckpointer(),
                limit=limit,
                sink=out,
            )
        except LeaseLostError:
            continue  # stolen mid-drain: successor resumes from the fence
    return out
