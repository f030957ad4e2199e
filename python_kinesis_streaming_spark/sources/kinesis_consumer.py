"""Kinesis consumer protocol loop (pure stdlib) + Spark ingestion bridges.

This is the reference genre made executable in-sandbox: a Kinesis consumer
is a poll–decode–checkpoint loop over the public HTTP API (SURVEY §3.1) —
enumerate shards, get a shard iterator, GetRecords with backoff on
empty/throttle, decode the base64 Data blob, persist the last sequence
number per shard, resume AFTER_SEQUENCE_NUMBER on restart (at-least-once).
``sources/kinesis.py`` wires the DSv2 connector surface for clusters that
carry the connector jar; this module implements the protocol itself so the
whole loop is integration-tested here against the loopback mock service
(``sources/kinesis_mock.py``) — the only untested residue vs real AWS is
SigV4 signing and TLS.

Spark bridges, in ascending scale order:

- ``poll_to_dataframe``  — driver-side drain → DataFrame (micro-batch
  ingest; each call is one at-least-once batch). Fine for low-volume
  streams; the driver is the single consumer.
- ``distributed_poll``   — the DSv2-connector architecture demonstrated:
  one Spark TASK per shard (mapInPandas over a shard-id frame), each task
  polling its own shard over HTTP and owning its own checkpoint file. At
  100 TB this is the shape that scales: shard count = input parallelism,
  executors do the network I/O, no driver fan-in of raw records, and
  resharding just changes the shard frame. The loopback mock serves
  localhost here; on a cluster the same code hits the regional endpoint.

Checkpoints are one JSON file per shard (atomic rename), the KCL
lease-table analogue; per-shard ownership means no write contention.
"""

from __future__ import annotations

import base64
import json
import os
import time
import urllib.error
import urllib.request

_JSON11 = "application/x-amz-json-1.1"


class KinesisApiError(RuntimeError):
    def __init__(self, type_: str, message: str):
        super().__init__(f"{type_}: {message}")
        self.type = type_


class KinesisClient:
    """Minimal AWS JSON 1.1 client for the Kinesis API (stdlib urllib).

    Speaks the real wire protocol (POST /, X-Amz-Target, JSON body/reply,
    400 + __type errors). Auth headers are not signed — the loopback mock
    ignores them; pointing this at real AWS additionally needs SigV4,
    which is deliberately out of scope in-sandbox.
    """

    def __init__(self, endpoint_url: str, timeout: float = 10.0):
        self.endpoint_url = endpoint_url.rstrip("/")
        self.timeout = timeout

    def call(self, action: str, body: dict) -> dict:
        req = urllib.request.Request(
            self.endpoint_url + "/",
            data=json.dumps(body).encode(),
            headers={
                "Content-Type": _JSON11,
                "X-Amz-Target": f"Kinesis_20131202.{action}",
            },
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return json.loads(resp.read() or b"{}")
        except urllib.error.HTTPError as e:
            payload = json.loads(e.read() or b"{}")
            raise KinesisApiError(
                payload.get("__type", "UnknownError"),
                payload.get("message", str(e)),
            ) from None

    # convenience wrappers -------------------------------------------------

    def list_shard_ids(self, stream: str) -> list[str]:
        out = self.call("ListShards", {"StreamName": stream})
        return [s["ShardId"] for s in out["Shards"]]

    def get_shard_iterator(
        self,
        stream: str,
        shard_id: str,
        iterator_type: str = "TRIM_HORIZON",
        sequence_number: str | None = None,
    ) -> str:
        body = {
            "StreamName": stream,
            "ShardId": shard_id,
            "ShardIteratorType": iterator_type,
        }
        if sequence_number is not None:
            body["StartingSequenceNumber"] = sequence_number
        return self.call("GetShardIterator", body)["ShardIterator"]

    def get_records(self, shard_iterator: str, limit: int = 1000) -> dict:
        return self.call(
            "GetRecords", {"ShardIterator": shard_iterator, "Limit": limit}
        )


class ShardCheckpointer:
    """Per-shard last-processed sequence number, one JSON file per shard
    (atomic rename) — the KCL lease-table analogue without a database."""

    def __init__(self, checkpoint_dir: str):
        self.dir = checkpoint_dir
        os.makedirs(checkpoint_dir, exist_ok=True)

    def _path(self, shard_id: str) -> str:
        return os.path.join(self.dir, f"{shard_id}.json")

    def load(self, shard_id: str) -> str | None:
        try:
            with open(self._path(shard_id)) as f:
                return json.load(f)["sequence_number"]
        except FileNotFoundError:
            return None

    def save(self, shard_id: str, sequence_number: str) -> None:
        tmp = self._path(shard_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"sequence_number": sequence_number}, f)
        os.replace(tmp, self._path(shard_id))


def poll_shard(
    client: KinesisClient,
    stream: str,
    shard_id: str,
    checkpointer: ShardCheckpointer | None = None,
    starting_position: str = "TRIM_HORIZON",
    limit: int = 1000,
    max_empty_polls: int = 1,
    backoff_base_s: float = 0.02,
    max_attempts: int = 8,
    sink: list | None = None,
) -> list[dict]:
    """Drain one shard's currently-available records (at-least-once).

    Resumes AFTER_SEQUENCE_NUMBER from the checkpoint when one exists,
    else from ``starting_position``. Retries throttle errors with
    exponential backoff (the reference genre's
    ProvisionedThroughputExceededException loop). The checkpoint is saved
    AFTER records are returned to the caller's batch list — a crash
    between delivery and checkpoint re-delivers, never skips.

    ``sink``: caller-owned list the drained records are appended to
    batch-by-batch (and also the return value). Pass it when the
    checkpointer can raise mid-drain (fenced lease steal): records from
    batches whose checkpoint already committed stay delivered in the
    caller's list instead of vanishing with the exception — dropping
    them would break at-least-once, because the successor resumes after
    the fence checkpoint and never re-reads them.
    """
    seq = checkpointer.load(shard_id) if checkpointer else None
    if seq is not None:
        it = client.get_shard_iterator(
            stream, shard_id, "AFTER_SEQUENCE_NUMBER", seq
        )
    else:
        it = client.get_shard_iterator(stream, shard_id, starting_position)

    out: list[dict] = [] if sink is None else sink
    empty = 0
    attempt = 0
    while empty < max_empty_polls:
        try:
            resp = client.get_records(it, limit=limit)
        except KinesisApiError as e:
            if (
                e.type.endswith("ProvisionedThroughputExceededException")
                and attempt < max_attempts
            ):
                time.sleep(backoff_base_s * (2**attempt))
                attempt += 1
                continue
            raise
        attempt = 0
        recs = resp["Records"]
        if recs:
            for r in recs:
                out.append(
                    {
                        "shard_id": shard_id,
                        "partition_key": r["PartitionKey"],
                        "sequence_number": r["SequenceNumber"],
                        "approximate_arrival": float(
                            r["ApproximateArrivalTimestamp"]
                        ),
                        "data": base64.b64decode(r["Data"]),
                    }
                )
            if checkpointer:
                checkpointer.save(shard_id, recs[-1]["SequenceNumber"])
        else:
            empty += 1
        if resp.get("NextShardIterator") is None:
            break  # closed shard fully drained (post-reshard parent)
        if resp.get("MillisBehindLatest", 0) == 0 and not recs:
            break
        it = resp["NextShardIterator"]
    return out


def poll_stream(
    client: KinesisClient,
    stream: str,
    checkpoint_dir: str | None = None,
    starting_position: str = "TRIM_HORIZON",
    limit: int = 1000,
) -> list[dict]:
    """Drain every shard once (driver-side). Returns decoded record dicts."""
    cp = ShardCheckpointer(checkpoint_dir) if checkpoint_dir else None
    out: list[dict] = []
    for shard_id in client.list_shard_ids(stream):
        out.extend(
            poll_shard(
                client,
                stream,
                shard_id,
                checkpointer=cp,
                starting_position=starting_position,
                limit=limit,
            )
        )
    return out


#: Spark schema for polled records (consumer-loop twin of
#: kinesis.kinesis_record_schema, which models the DSv2 connector output).
POLLED_SCHEMA = (
    "shard_id string, partition_key string, sequence_number string, "
    "approximate_arrival timestamp, data binary"
)


def poll_to_dataframe(
    spark,
    endpoint_url: str,
    stream: str,
    checkpoint_dir: str | None = None,
    starting_position: str = "TRIM_HORIZON",
):
    """One at-least-once micro-batch: drain the stream → DataFrame.

    Driver-side consumer — the single-process ingest rung. Use
    ``distributed_poll`` when shard count (and so throughput) matters.
    """
    import datetime

    from pyspark.sql import functions as F  # noqa: F401 (callers chain)

    recs = poll_stream(
        KinesisClient(endpoint_url),
        stream,
        checkpoint_dir=checkpoint_dir,
        starting_position=starting_position,
    )
    rows = [
        (
            r["shard_id"],
            r["partition_key"],
            r["sequence_number"],
            datetime.datetime.fromtimestamp(
                r["approximate_arrival"], tz=datetime.timezone.utc
            ).replace(tzinfo=None),
            r["data"],
        )
        for r in recs
    ]
    return spark.createDataFrame(rows, POLLED_SCHEMA)


def distributed_poll(
    spark,
    endpoint_url: str,
    stream: str,
    checkpoint_dir: str | None = None,
    starting_position: str = "TRIM_HORIZON",
):
    """One task per shard, executors poll over HTTP — the connector shape.

    The shard list becomes a repartitioned DataFrame (one shard per
    partition); each mapInPandas task runs the poll loop against its
    single shard. The task body is fully self-contained (stdlib only,
    cloudpickle by value — bare-session safe, CLAUDE.md invariant 1: no
    package import on the worker).

    Checkpointing is two-phase: tasks only READ ``checkpoint_dir`` to
    pick their resume point; nothing is written during the drain. After
    the caller has materialized (and durably persisted) the result, it
    advances the checkpoints with ``commit_poll_checkpoints``. Writing
    from inside the task would advance the checkpoint before the task's
    output is committed, so a task retry — or a second evaluation of
    this lazy DataFrame — would resume past records the failed attempt
    never delivered and silently drop them.
    """
    client = KinesisClient(endpoint_url)
    shard_ids = client.list_shard_ids(stream)
    shards_df = spark.createDataFrame(
        [(s,) for s in shard_ids], "shard_id string"
    ).repartition(len(shard_ids), "shard_id")

    endpoint = endpoint_url.rstrip("/")
    stream_name = stream
    cp_dir = checkpoint_dir
    start_pos = starting_position

    def poll_partition(batches):
        import base64 as _b64
        import datetime as _dt
        import json as _json
        import os as _os
        import time as _time
        import urllib.request as _rq

        import pandas as pd

        def call(action, body):
            req = _rq.Request(
                endpoint + "/",
                data=_json.dumps(body).encode(),
                headers={
                    "Content-Type": "application/x-amz-json-1.1",
                    "X-Amz-Target": f"Kinesis_20131202.{action}",
                },
                method="POST",
            )
            import urllib.error as _err

            try:
                with _rq.urlopen(req, timeout=10.0) as resp:
                    return _json.loads(resp.read() or b"{}"), None
            except _err.HTTPError as e:
                payload = _json.loads(e.read() or b"{}")
                return None, payload.get("__type", "UnknownError")

        def cp_path(shard_id):
            return _os.path.join(cp_dir, f"{shard_id}.json")

        def cp_load(shard_id):
            try:
                with open(cp_path(shard_id)) as f:
                    return _json.load(f)["sequence_number"]
            except FileNotFoundError:
                return None

        def drain(shard_id):
            seq = cp_load(shard_id) if cp_dir else None
            body = {
                "StreamName": stream_name,
                "ShardId": shard_id,
                "ShardIteratorType": (
                    "AFTER_SEQUENCE_NUMBER" if seq is not None else start_pos
                ),
            }
            if seq is not None:
                body["StartingSequenceNumber"] = seq
            resp, err = call("GetShardIterator", body)
            if err:
                raise RuntimeError(err)
            it = resp["ShardIterator"]
            out, attempt = [], 0
            while True:
                resp, err = call(
                    "GetRecords", {"ShardIterator": it, "Limit": 1000}
                )
                if err:
                    if (
                        err.endswith("ProvisionedThroughputExceededException")
                        and attempt < 8
                    ):
                        _time.sleep(0.02 * (2**attempt))
                        attempt += 1
                        continue
                    raise RuntimeError(err)
                attempt = 0
                recs = resp["Records"]
                out.extend(recs)
                if resp.get("NextShardIterator") is None:
                    return out  # closed shard fully drained
                if not recs and resp.get("MillisBehindLatest", 0) == 0:
                    return out
                it = resp["NextShardIterator"]

        for pdf in batches:
            for shard_id in pdf["shard_id"]:
                recs = drain(shard_id)
                if not recs:
                    continue
                yield pd.DataFrame(
                    {
                        "shard_id": [shard_id] * len(recs),
                        "partition_key": [r["PartitionKey"] for r in recs],
                        "sequence_number": [
                            r["SequenceNumber"] for r in recs
                        ],
                        "approximate_arrival": [
                            _dt.datetime.fromtimestamp(
                                float(r["ApproximateArrivalTimestamp"]),
                                tz=_dt.timezone.utc,
                            ).replace(tzinfo=None)
                            for r in recs
                        ],
                        "data": [
                            _b64.b64decode(r["Data"]) for r in recs
                        ],
                    }
                )

    return shards_df.mapInPandas(poll_partition, schema=POLLED_SCHEMA)


def commit_poll_checkpoints(rows, checkpoint_dir: str) -> dict[str, str]:
    """Advance per-shard checkpoints from a MATERIALIZED ``distributed_poll``
    result (driver-side, after the caller has persisted the records —
    checkpoint-after-delivery, the same ordering ``poll_shard`` documents).

    ``rows``: an iterable of row-likes carrying ``shard_id`` and
    ``sequence_number`` (``DataFrame.collect()`` output, dicts, or an
    iterable of pandas rows). Returns the {shard_id: sequence_number}
    map that was written.
    """
    latest: dict[str, str] = {}
    for r in rows:
        sid, seq = r["shard_id"], r["sequence_number"]
        if sid not in latest or int(seq) > int(latest[sid]):
            latest[sid] = seq
    cp = ShardCheckpointer(checkpoint_dir)
    for sid, seq in latest.items():
        cp.save(sid, seq)
    return latest
