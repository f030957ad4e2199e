"""In-process Kinesis-API-compatible mock service (stdlib only, loopback).

Implements the public AWS Kinesis wire protocol — AWS JSON 1.1 over HTTP:
``POST /`` with ``X-Amz-Target: Kinesis_20131202.<Action>`` and a JSON
body; JSON responses; HTTP 400 + ``{"__type": "<Exception>"}`` for errors
— for the subset of actions a consumer loop needs:

    CreateStream, ListShards, DescribeStreamSummary,
    PutRecord, PutRecords, GetShardIterator, GetRecords,
    SplitShard, MergeShards,
    RegisterStreamConsumer, DescribeStreamConsumer, ListStreamConsumers,
    DeregisterStreamConsumer, SubscribeToShard (enhanced fan-out)

Semantics mirror the public service behavior the reference genre depends
on (docs.aws.amazon.com/kinesis/latest/APIReference):

- partition-key → shard routing by MD5 over the 128-bit hash-key space,
  split evenly across shards (the documented algorithm);
- per-shard strictly increasing sequence numbers (opaque decimal strings);
- shard iterators as opaque tokens encoding (shard, next position);
- TRIM_HORIZON / LATEST / AT_SEQUENCE_NUMBER / AFTER_SEQUENCE_NUMBER;
- GetRecords honors Limit and returns NextShardIterator + a
  MillisBehindLatest of 0 when caught up;
- optional fault injection: every Nth GetRecords raises
  ProvisionedThroughputExceededException (HTTP 400), the error the
  reference genre's backoff loop exists for; and every Nth PutRecords
  ENTRY fails per-record (ErrorCode in the entry, FailedRecordCount > 0,
  HTTP 200 — the real partial-failure shape producers must retry);
- PutRecords enforces the documented 500-entries-per-call limit
  (ValidationException);
- enhanced fan-out: RegisterStreamConsumer returns CREATING and the
  consumer turns ACTIVE on a later DescribeStreamConsumer (the real
  asynchronous activation the register-then-poll loop exists for);
  SubscribeToShard validates the consumer ARN, allows at most ONE active
  subscription per (consumer, shard) (ResourceInUseException otherwise,
  as documented), and PUSHES SubscribeToShardEvent frames — each with
  Records, ContinuationSequenceNumber and MillisBehindLatest; a fully
  drained CLOSED shard ends with a null ContinuationSequenceNumber (the
  real shard-end signal). The push body is GENUINE
  application/vnd.amazon.eventstream framing (sources/eventstream.py —
  prelude + CRCs + typed headers), the same bytes the real service
  sends, so botocore's subscribe_to_shard parses it unmodified
  (tests/test_kinesis_protocol.py proves that interop); the only
  difference from AWS is the carrying protocol (HTTP/1.1 chunked here,
  HTTP/2 there), which the SDK treats identically since it parses the
  response body stream. The mock compresses the 5-minute subscription
  window: the event stream ends once the subscriber is caught up
  (callers re-subscribe from the continuation, exactly as they must at
  the real 5-minute boundary);
- resharding: SplitShard closes the parent (ListShards shows its
  EndingSequenceNumber + the children's ParentShardId; writes route to
  the open children) and GetRecords on a fully-drained closed shard
  returns a null NextShardIterator — the consumer-visible lifecycle of a
  real reshard.

SigV4 auth is accepted-and-ignored (the mock is a loopback test double;
the wire shapes are otherwise the real ones). No AWS SDK involved on
either side — requests are plain stdlib HTTP.

Used by tests/test_kinesis_protocol.py to integration-test
``sources/kinesis_consumer.py`` end-to-end without network.
"""

from __future__ import annotations

import base64
import hashlib
import json
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_HASH_SPACE = 2**128


@dataclass
class _Record:
    sequence_number: int
    partition_key: str
    data_b64: str
    arrival_ts: float


@dataclass
class _Consumer:
    name: str
    arn: str
    stream: str
    status: str = "CREATING"
    creation_ts: float = 0.0


@dataclass
class _Shard:
    shard_id: str
    start_hash: int
    end_hash: int
    records: list[_Record] = field(default_factory=list)
    next_seq: int = 0
    closed: bool = False  # true after SplitShard; no more writes
    parent_id: str | None = None


class _StreamState:
    def __init__(self, name: str, shard_count: int):
        self.name = name
        self.shards: list[_Shard] = []
        self._next_shard_ordinal = 0
        step = _HASH_SPACE // shard_count
        for i in range(shard_count):
            lo = i * step
            hi = (i + 1) * step - 1 if i < shard_count - 1 else _HASH_SPACE - 1
            self.shards.append(
                _Shard(
                    shard_id=self._new_shard_id(),
                    start_hash=lo,
                    end_hash=hi,
                )
            )

    def _new_shard_id(self) -> str:
        sid = f"shardId-{self._next_shard_ordinal:012d}"
        self._next_shard_ordinal += 1
        return sid

    def shard_for_key(self, partition_key: str) -> _Shard:
        h = int.from_bytes(
            hashlib.md5(partition_key.encode("utf-8")).digest(), "big"
        )
        for s in self.shards:
            if not s.closed and s.start_hash <= h <= s.end_hash:
                return s
        raise _ApiError(
            "InternalFailure", "no open shard covers the hash space"
        )

    def split(self, shard_id: str, new_start_hash: int) -> tuple[str, str]:
        """SplitShard semantics: parent closes (keeps its records for
        readers to finish draining), two children take the halves."""
        parent = next(
            (s for s in self.shards if s.shard_id == shard_id), None
        )
        if parent is None:
            raise _ApiError("ResourceNotFoundException", f"Shard {shard_id}")
        if parent.closed:
            raise _ApiError(
                "InvalidArgumentException", f"{shard_id} already closed"
            )
        if not (parent.start_hash < new_start_hash <= parent.end_hash):
            raise _ApiError(
                "InvalidArgumentException",
                "NewStartingHashKey outside the parent range",
            )
        parent.closed = True
        left = _Shard(
            shard_id=self._new_shard_id(),
            start_hash=parent.start_hash,
            end_hash=new_start_hash - 1,
            parent_id=parent.shard_id,
        )
        right = _Shard(
            shard_id=self._new_shard_id(),
            start_hash=new_start_hash,
            end_hash=parent.end_hash,
            parent_id=parent.shard_id,
        )
        self.shards.extend([left, right])
        return left.shard_id, right.shard_id

    def merge(self, shard_id: str, adjacent_id: str) -> str:
        """MergeShards semantics: two OPEN, hash-adjacent shards close;
        one child spans their union (real API lifecycle)."""
        a = next((s for s in self.shards if s.shard_id == shard_id), None)
        b = next((s for s in self.shards if s.shard_id == adjacent_id), None)
        if a is None or b is None:
            raise _ApiError("ResourceNotFoundException", "shard not found")
        if a.closed or b.closed:
            raise _ApiError("InvalidArgumentException", "shard already closed")
        lo, hi = (a, b) if a.start_hash < b.start_hash else (b, a)
        if lo.end_hash + 1 != hi.start_hash:
            raise _ApiError(
                "InvalidArgumentException", "shards are not hash-adjacent"
            )
        a.closed = True
        b.closed = True
        child = _Shard(
            shard_id=self._new_shard_id(),
            start_hash=lo.start_hash,
            end_hash=hi.end_hash,
            parent_id=a.shard_id,  # real API: ParentShardId + Adjacent...
        )
        self.shards.append(child)
        return child.shard_id

    def put(self, partition_key: str, data_b64: str) -> tuple[str, str]:
        s = self.shard_for_key(partition_key)
        seq = s.next_seq
        s.next_seq += 1
        s.records.append(_Record(seq, partition_key, data_b64, time.time()))
        return s.shard_id, str(seq)


class MockKinesisService:
    """The service state + action dispatch (transport-agnostic)."""

    def __init__(self, throttle_every: int = 0, put_fail_every: int = 0):
        self._streams: dict[str, _StreamState] = {}
        self._lock = threading.Lock()
        self._throttle_every = throttle_every
        self._get_records_calls = 0
        self._put_fail_every = put_fail_every
        self._put_record_attempts = 0
        self._consumers: dict[str, _Consumer] = {}  # ARN -> consumer
        self._active_subs: set[tuple[str, str]] = set()  # (ARN, shard)

    @staticmethod
    def _stream_arn(name: str) -> str:
        return f"arn:aws:kinesis:mock:000000000000:stream/{name}"

    @staticmethod
    def _stream_from_arn(arn: str) -> str:
        # arn:aws:kinesis:REGION:ACCT:stream/NAME[/consumer/...]
        tail = arn.split(":stream/", 1)[-1]
        return tail.split("/", 1)[0]

    # -- actions -----------------------------------------------------------

    def create_stream(self, body: dict) -> dict:
        with self._lock:
            name = body["StreamName"]
            if name in self._streams:
                raise _ApiError("ResourceInUseException", f"{name} exists")
            self._streams[name] = _StreamState(name, int(body["ShardCount"]))
        return {}

    def list_shards(self, body: dict) -> dict:
        st = self._stream(body["StreamName"])
        out = []
        for s in st.shards:
            desc = {
                "ShardId": s.shard_id,
                "HashKeyRange": {
                    "StartingHashKey": str(s.start_hash),
                    "EndingHashKey": str(s.end_hash),
                },
                "SequenceNumberRange": {"StartingSequenceNumber": "0"},
            }
            if s.parent_id is not None:
                desc["ParentShardId"] = s.parent_id
            if s.closed:
                # closed shards expose an ending sequence number (real API)
                desc["SequenceNumberRange"]["EndingSequenceNumber"] = str(
                    s.next_seq - 1 if s.next_seq else 0
                )
            out.append(desc)
        return {"Shards": out}

    def split_shard(self, body: dict) -> dict:
        st = self._stream(body["StreamName"])
        with self._lock:
            st.split(
                body["ShardToSplit"], int(body["NewStartingHashKey"])
            )
        return {}

    def merge_shards(self, body: dict) -> dict:
        st = self._stream(body["StreamName"])
        with self._lock:
            st.merge(
                body["ShardToMerge"], body["AdjacentShardToMerge"]
            )
        return {}

    def describe_stream_summary(self, body: dict) -> dict:
        st = self._stream(body["StreamName"])
        return {
            "StreamDescriptionSummary": {
                "StreamName": st.name,
                "StreamStatus": "ACTIVE",
                "OpenShardCount": sum(1 for s in st.shards if not s.closed),
            }
        }

    def put_record(self, body: dict) -> dict:
        st = self._stream(body["StreamName"])
        with self._lock:
            shard_id, seq = st.put(body["PartitionKey"], body["Data"])
        return {"ShardId": shard_id, "SequenceNumber": seq}

    def put_records(self, body: dict) -> dict:
        st = self._stream(body["StreamName"])
        if len(body["Records"]) > 500:  # documented per-call entry limit
            raise _ApiError(
                "ValidationException",
                f"{len(body['Records'])} records exceeds the limit of 500",
            )
        out = []
        failed = 0
        with self._lock:
            for rec in body["Records"]:
                self._put_record_attempts += 1
                if (
                    self._put_fail_every
                    and self._put_record_attempts % self._put_fail_every == 0
                ):
                    # per-record failure: entry carries ErrorCode, nothing
                    # is stored, the CALL still returns HTTP 200
                    out.append(
                        {
                            "ErrorCode": (
                                "ProvisionedThroughputExceededException"
                            ),
                            "ErrorMessage": "Rate exceeded for shard",
                        }
                    )
                    failed += 1
                    continue
                shard_id, seq = st.put(rec["PartitionKey"], rec["Data"])
                out.append({"ShardId": shard_id, "SequenceNumber": seq})
        return {"FailedRecordCount": failed, "Records": out}

    def get_shard_iterator(self, body: dict) -> dict:
        st = self._stream(body["StreamName"])
        shard = self._shard(st, body["ShardId"])
        itype = body["ShardIteratorType"]
        if itype == "TRIM_HORIZON":
            pos = 0
        elif itype == "LATEST":
            pos = shard.next_seq
        elif itype == "AT_SEQUENCE_NUMBER":
            pos = int(body["StartingSequenceNumber"])
        elif itype == "AFTER_SEQUENCE_NUMBER":
            pos = int(body["StartingSequenceNumber"]) + 1
        else:
            raise _ApiError(
                "InvalidArgumentException", f"iterator type {itype}"
            )
        return {"ShardIterator": self._encode_iter(st.name, shard.shard_id, pos)}

    def get_records(self, body: dict) -> dict:
        self._get_records_calls += 1
        if (
            self._throttle_every
            and self._get_records_calls % self._throttle_every == 0
        ):
            raise _ApiError(
                "ProvisionedThroughputExceededException",
                "Rate exceeded for shard",
            )
        stream, shard_id, pos = self._decode_iter(body["ShardIterator"])
        st = self._stream(stream)
        shard = self._shard(st, shard_id)
        limit = int(body.get("Limit", 10000))
        with self._lock:
            batch = [r for r in shard.records if r.sequence_number >= pos][:limit]
            caught_up = not batch or (
                batch[-1].sequence_number == shard.next_seq - 1
            )
            drained_closed = shard.closed and (
                (batch[-1].sequence_number if batch else pos - 1)
                >= shard.next_seq - 1
            )
        next_pos = batch[-1].sequence_number + 1 if batch else pos
        return {
            "Records": [
                {
                    "SequenceNumber": str(r.sequence_number),
                    "PartitionKey": r.partition_key,
                    "Data": r.data_b64,
                    "ApproximateArrivalTimestamp": r.arrival_ts,
                }
                for r in batch
            ],
            # a fully-drained CLOSED shard ends iteration (real API: null)
            "NextShardIterator": (
                None
                if drained_closed
                else self._encode_iter(stream, shard_id, next_pos)
            ),
            "MillisBehindLatest": 0 if caught_up else 1,
        }

    # -- enhanced fan-out --------------------------------------------------

    def register_stream_consumer(self, body: dict) -> dict:
        stream = self._stream_from_arn(body["StreamARN"])
        self._stream(stream)  # validates existence
        name = body["ConsumerName"]
        with self._lock:
            for c in self._consumers.values():
                if c.stream == stream and c.name == name:
                    raise _ApiError(
                        "ResourceInUseException",
                        f"Consumer {name} already exists on {stream}",
                    )
            ts = time.time()
            arn = f"{self._stream_arn(stream)}/consumer/{name}:{int(ts)}"
            self._consumers[arn] = _Consumer(name, arn, stream, "CREATING", ts)
        # real API: registration is asynchronous — returns CREATING, the
        # caller polls DescribeStreamConsumer until ACTIVE
        return {"Consumer": self._consumer_desc(self._consumers[arn])}

    @staticmethod
    def _consumer_desc(c: _Consumer) -> dict:
        return {
            "ConsumerName": c.name,
            "ConsumerARN": c.arn,
            "ConsumerStatus": c.status,
            "ConsumerCreationTimestamp": c.creation_ts,
        }

    def _find_consumer(self, body: dict) -> _Consumer:
        arn = body.get("ConsumerARN")
        if arn is None and "StreamARN" in body and "ConsumerName" in body:
            stream = self._stream_from_arn(body["StreamARN"])
            for c in self._consumers.values():
                if c.stream == stream and c.name == body["ConsumerName"]:
                    return c
            raise _ApiError(
                "ResourceNotFoundException",
                f"Consumer {body['ConsumerName']} not found",
            )
        c = self._consumers.get(arn)
        if c is None:
            raise _ApiError(
                "ResourceNotFoundException", f"Consumer {arn} not found"
            )
        return c

    def describe_stream_consumer(self, body: dict) -> dict:
        with self._lock:
            c = self._find_consumer(body)
            desc = self._consumer_desc(c)
            if c.status == "CREATING":
                # activation completes between this poll and the next —
                # the first describe still sees CREATING (async contract)
                c.status = "ACTIVE"
        return {"ConsumerDescription": desc}

    def list_stream_consumers(self, body: dict) -> dict:
        stream = self._stream_from_arn(body["StreamARN"])
        self._stream(stream)
        with self._lock:
            return {
                "Consumers": [
                    self._consumer_desc(c)
                    for c in self._consumers.values()
                    if c.stream == stream
                ]
            }

    def deregister_stream_consumer(self, body: dict) -> dict:
        with self._lock:
            c = self._find_consumer(body)
            del self._consumers[c.arn]
        return {}

    def subscribe_to_shard_events(self, body: dict, batch_limit: int = 100):
        """Validate a SubscribeToShard call and return an event GENERATOR
        (the transport layer frames each yielded dict). Validation errors
        raise _ApiError before any event is produced, so the HTTP layer
        can still answer 400 + JSON for them."""
        with self._lock:
            c = self._find_consumer(body)
            if c.status != "ACTIVE":
                raise _ApiError(
                    "ResourceInUseException", f"Consumer {c.name} not ACTIVE"
                )
        st = self._stream(c.stream)
        shard = self._shard(st, body["ShardId"])
        sp = body["StartingPosition"]
        stype = sp["Type"]
        if stype == "TRIM_HORIZON":
            pos = 0
        elif stype == "LATEST":
            pos = shard.next_seq
        elif stype == "AT_SEQUENCE_NUMBER":
            pos = int(sp["SequenceNumber"])
        elif stype == "AFTER_SEQUENCE_NUMBER":
            pos = int(sp["SequenceNumber"]) + 1
        else:
            raise _ApiError(
                "InvalidArgumentException", f"StartingPosition {stype}"
            )
        key = (c.arn, shard.shard_id)
        with self._lock:
            if key in self._active_subs:
                # documented: one active subscription per consumer+shard
                raise _ApiError(
                    "ResourceInUseException",
                    f"Active subscription exists for {key}",
                )
            self._active_subs.add(key)

        def events():
            p = pos
            try:
                while True:
                    with self._lock:
                        batch = [
                            r
                            for r in shard.records
                            if r.sequence_number >= p
                        ][:batch_limit]
                        tip = shard.next_seq
                        closed = shard.closed
                    last = batch[-1].sequence_number if batch else p - 1
                    caught_up = last >= tip - 1
                    drained_closed = closed and caught_up
                    yield {
                        "SubscribeToShardEvent": {
                            "Records": [
                                {
                                    "SequenceNumber": str(r.sequence_number),
                                    "PartitionKey": r.partition_key,
                                    "Data": r.data_b64,
                                    "ApproximateArrivalTimestamp": (
                                        r.arrival_ts
                                    ),
                                }
                                for r in batch
                            ],
                            # next position to resume AT_SEQUENCE_NUMBER;
                            # null = closed shard fully drained (real
                            # shard-end signal)
                            "ContinuationSequenceNumber": (
                                None if drained_closed else str(last + 1)
                            ),
                            "MillisBehindLatest": 0 if caught_up else 1,
                        }
                    }
                    if caught_up:
                        return  # compressed 5-minute window: end of stream
                    p = last + 1
            finally:
                with self._lock:
                    self._active_subs.discard(key)

        return events()

    # -- helpers -----------------------------------------------------------

    def _stream(self, name: str) -> _StreamState:
        try:
            return self._streams[name]
        except KeyError:
            raise _ApiError(
                "ResourceNotFoundException", f"Stream {name} not found"
            ) from None

    @staticmethod
    def _shard(st: _StreamState, shard_id: str) -> _Shard:
        for s in st.shards:
            if s.shard_id == shard_id:
                return s
        raise _ApiError("ResourceNotFoundException", f"Shard {shard_id}")

    @staticmethod
    def _encode_iter(stream: str, shard_id: str, pos: int) -> str:
        tok = json.dumps([stream, shard_id, pos]).encode()
        return base64.b64encode(tok).decode()

    @staticmethod
    def _decode_iter(token: str) -> tuple[str, str, int]:
        try:
            stream, shard_id, pos = json.loads(base64.b64decode(token))
            return stream, shard_id, int(pos)
        except Exception:
            raise _ApiError(
                "ExpiredIteratorException", "Malformed shard iterator"
            ) from None

    ACTIONS = {
        "CreateStream": create_stream,
        "ListShards": list_shards,
        "DescribeStreamSummary": describe_stream_summary,
        "PutRecord": put_record,
        "PutRecords": put_records,
        "GetShardIterator": get_shard_iterator,
        "GetRecords": get_records,
        "SplitShard": split_shard,
        "MergeShards": merge_shards,
        "RegisterStreamConsumer": register_stream_consumer,
        "DescribeStreamConsumer": describe_stream_consumer,
        "ListStreamConsumers": list_stream_consumers,
        "DeregisterStreamConsumer": deregister_stream_consumer,
    }

    def dispatch(self, target: str, body: dict) -> dict:
        action = target.split(".", 1)[-1]
        fn = self.ACTIONS.get(action)
        if fn is None:
            raise _ApiError(
                "UnknownOperationException", f"Unsupported action {action}"
            )
        return fn(self, body)


class _ApiError(Exception):
    def __init__(self, type_: str, message: str):
        super().__init__(message)
        self.type = type_
        self.message = message


class _Handler(BaseHTTPRequestHandler):
    service: MockKinesisService  # injected by server factory
    # HTTP/1.1 so chunked transfer (the SubscribeToShard push channel)
    # is legal; every non-streaming response still sets Content-Length.
    protocol_version = "HTTP/1.1"

    def do_POST(self):  # noqa: N802 (stdlib casing)
        length = int(self.headers.get("Content-Length", 0))
        body = json.loads(self.rfile.read(length) or b"{}")
        target = self.headers.get("X-Amz-Target", "")
        if target.split(".", 1)[-1] == "SubscribeToShard":
            return self._do_subscribe(body)
        try:
            payload = self.service.dispatch(target, body)
            code = 200
        except _ApiError as e:
            payload = {"__type": e.type, "message": e.message}
            code = 400
        raw = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/x-amz-json-1.1")
        self.send_header("Content-Length", str(len(raw)))
        self.end_headers()
        self.wfile.write(raw)

    def _do_subscribe(self, body: dict) -> None:
        """Push SubscribeToShardEvent frames in real eventstream framing
        over chunked transfer (HTTP/1.1 carrier for the HTTP/2 wire
        bytes; SDK parsers read the body stream either way)."""
        from python_kinesis_streaming_spark.sources.eventstream import (
            encode_event,
            encode_message,
        )

        try:
            events = self.service.subscribe_to_shard_events(body)
        except _ApiError as e:
            raw = json.dumps({"__type": e.type, "message": e.message}).encode()
            self.send_response(400)
            self.send_header("Content-Type", "application/x-amz-json-1.1")
            self.send_header("Content-Length", str(len(raw)))
            self.end_headers()
            self.wfile.write(raw)
            return
        self.send_response(200)
        self.send_header("Content-Type", "application/vnd.amazon.eventstream")
        self.send_header("Transfer-Encoding", "chunked")
        self.end_headers()

        def chunk(data: bytes) -> None:
            self.wfile.write(f"{len(data):X}\r\n".encode() + data + b"\r\n")
            self.wfile.flush()

        try:
            # the real service opens every subscription with an
            # initial-response event (SDK parsers require it before any
            # SubscribeToShardEvent arrives)
            chunk(
                encode_message(
                    {
                        ":message-type": "event",
                        ":event-type": "initial-response",
                        ":content-type": "application/x-amz-json-1.1",
                    },
                    b"{}",
                )
            )
            for event in events:
                frame = encode_event(
                    "SubscribeToShardEvent",
                    json.dumps(event["SubscribeToShardEvent"]).encode(),
                )
                chunk(frame)
            self.wfile.write(b"0\r\n\r\n")
        except (BrokenPipeError, ConnectionResetError):
            # subscriber went away mid-push: the events generator's
            # finally has already released the subscription slot; a
            # dropped connection is a normal consumer lifecycle event,
            # not a server error
            self.close_connection = True

    def log_message(self, fmt, *args):  # silence request logging in tests
        pass


class MockKinesisServer:
    """Threaded loopback HTTP server wrapping MockKinesisService.

    Usage::

        with MockKinesisServer(throttle_every=0) as srv:
            client = KinesisClient(srv.endpoint_url)
            ...
    """

    def __init__(self, throttle_every: int = 0, put_fail_every: int = 0):
        self.service = MockKinesisService(
            throttle_every=throttle_every, put_fail_every=put_fail_every
        )
        handler = type("BoundHandler", (_Handler,), {"service": self.service})
        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    @property
    def endpoint_url(self) -> str:
        host, port = self._httpd.server_address
        return f"http://{host}:{port}"

    def __enter__(self) -> "MockKinesisServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
