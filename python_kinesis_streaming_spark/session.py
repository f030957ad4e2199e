"""SparkSession construction + the dynamic confs every query needs.

Two contexts exist:
1. Our own harness (tests, bench) builds the session via ``build_session``.
2. The driver's verify harness builds ITS OWN session and calls our
   ``queries()`` callables with it. Those callables therefore must not rely
   on builder-time configs — ``ensure_runtime_confs`` sets the (verified
   dynamic) SQL confs on whatever session we're handed. Verified this
   session: ``spark.sql.legacy.parquet.nanosAsLong`` is honored when set via
   ``spark.conf.set`` before the first read of the ns-timestamp parquet
   (SURVEY.md §7.4 hazard 1).

Scale note (100 TB): these confs are scale-neutral. On a real cluster the
same code runs with cluster-sized ``spark.sql.shuffle.partitions`` (or AQE
auto-coalesce from a high initial number), RocksDB state store for
streaming, and executor-sized ``maxPartitionBytes``; nothing here assumes
local mode.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: Confs that are dynamic (settable per-session at runtime) and required for
#: correctness of the declared operators, regardless of who built the session.
RUNTIME_CONFS: dict[str, str] = {
    # events.parquet carries TIMESTAMP(NANOS) which Spark 4.x rejects by
    # default; read as long then normalize (sources/tables.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic timestamp semantics vs the (naive-timestamp) DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # Sinks written by ANY session (incl. the driver's bare one) must read
    # back as µs TIMESTAMP, not INT96/NTZ — sink ops re-read their output.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    # Let AQE re-plan (coalesce) the stages that build and consume cached
    # relations. At the Spark default (false) an InMemoryRelation whose child
    # contains an Exchange is compiled WITHOUT AQE partition coalescing, so a
    # bare 200-shuffle-partition session freezes a 200-partition layout into
    # every cached diamond and every downstream stage scanning that cache runs
    # 200 tasks regardless of data size (measured r14:
    # graph_degree_assortativity 10.56 s → 1.15 s warm at sf0.01 with this
    # on). Output partitioning is the only thing that changes — results are
    # identical; nothing in this engine consumes a cached relation's physical
    # partitioning. Scale note: on a real cluster this is the same win — AQE
    # sizes cached-stage partitions from data, not from the static conf.
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
}


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in this context; builder must have set it
    return spark


#: Spark's production state-store backend for stateful streaming: keeps
#: state on executor-local disk (RocksDB) instead of the executor heap, the
#: standard choice once aggregate state exceeds memory (100 TB streams).
#: Dynamic per-query? No — it's a session conf, so it must be set at build
#: time; ``rocksdb_state_store=True`` opts a session in.
ROCKSDB_STATE_STORE_CONFS: dict[str, str] = {
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
    # Bound RocksDB block-cache memory per executor rather than the unbounded
    # default; changelog checkpointing ships deltas, not full SST uploads.
    "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage": "true",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": (
        "true"
    ),
}


def build_session(
    app_name: str = "python-kinesis-streaming-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
    rocksdb_state_store: bool = False,
) -> SparkSession:
    """Build a session with the engine's defaults.

    AQE is left on (its runtime re-planning — partition coalescing, skew-join
    splitting, SMJ→broadcast conversion — is a core part of the 100 TB
    design, SURVEY.md §4). ``rocksdb_state_store=True`` switches stateful
    streaming to the RocksDB provider (``ROCKSDB_STATE_STORE_CONFS``) — the
    at-scale configuration cited in streaming/ops.py scale notes.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    confs: dict[str, str] = {
        **RUNTIME_CONFS,
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Parquet writes readable by any engine (oracle reads them too).
        "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
        "spark.ui.enabled": "false",
    }
    if shuffle_partitions is not None:
        confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if rocksdb_state_store:
        confs.update(ROCKSDB_STATE_STORE_CONFS)
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return ensure_runtime_confs(spark)
