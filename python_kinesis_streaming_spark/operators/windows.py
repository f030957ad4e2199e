"""§2.5 Window functions (SURVEY.md).

Scale notes (100 TB):
- Every window here partitions by a key (customer/user/supplier-bucket) —
  one shuffle on the partition key, then a local sort; no global sort, no
  single-reducer hot spot. Skewed partition keys are split by AQE.
- Deterministic tie-breakers on every ORDER BY (SURVEY §7.4 h3) — rank
  functions over non-unique keys are otherwise nondeterministic across
  engines AND across Spark runs.
- Range frames are expressed on integer epoch-µs, not intervals, so frame
  membership is bit-exactly comparable with the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from python_kinesis_streaming_spark.functions.rounding import rnd, sql_rnd
from python_kinesis_streaming_spark.registry import op
from python_kinesis_streaming_spark.sources.tables import load_table


@op(
    "win_rank_topn",
    oracle="""
        SELECT * FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
            FROM orders
        ) WHERE rn <= 3
    """,
    scale="Top-N per key: rank + filter → Spark pushes a per-partition limit (WindowGroupLimit) before the shuffle.",
)
def win_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by totalprice (row_number + filter)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@op(
    "win_rank_dense",
    oracle="""
        SELECT s_suppkey, s_acctbal,
               CAST(rank()       OVER (ORDER BY s_acctbal DESC, s_suppkey) AS INTEGER) AS rnk,
               CAST(dense_rank() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS INTEGER) AS drnk,
               CAST(ntile(4)     OVER (ORDER BY s_acctbal DESC, s_suppkey) AS INTEGER) AS quartile
        FROM supplier
    """,
    scale=(
        "Unpartitioned window = single-reducer sort; fine for dim-sized "
        "input (suppliers), never for facts — partition or pre-aggregate."
    ),
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile(4) over suppliers by account balance."""
    supplier = load_table(spark, sf_dir, "supplier")
    w = Window.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return supplier.select(
        "s_suppkey",
        "s_acctbal",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@op(
    "win_lag_lead",
    oracle="""
        SELECT user_id, event_id,
               epoch_us(CAST(ts AS TIMESTAMP))
                 - lag(epoch_us(CAST(ts AS TIMESTAMP)))
                   OVER (PARTITION BY user_id
                         ORDER BY CAST(ts AS TIMESTAMP), event_id) AS gap_us,
               lead(event_type)
                   OVER (PARTITION BY user_id
                         ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_type
        FROM events
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap (µs) and next event type."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    return ev.select(
        "user_id",
        "event_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@op(
    "win_running_sum",
    oracle=f"""
        SELECT o_custkey, o_orderkey,
               {sql_rnd('''sum(o_totalprice) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)''')} AS cum_spend
        FROM orders
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative customer spend in order-date order."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        rnd(F.sum("o_totalprice").over(w)).alias("cum_spend"),
    )


@op(
    "win_range_frame",
    oracle=f"""
        SELECT user_id, event_id,
               {sql_rnd('''avg(value) OVER (PARTITION BY user_id
                    ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)''', 4)} AS avg_1h
        FROM events
    """,
    scale="Range frame on epoch-µs; per-user ordering, bounded trailing state.",
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1h moving average of value per user (RANGE frame)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        rnd(F.avg("value").over(w), 4).alias("avg_1h"),
    )


@op(
    "win_first_last",
    oracle="""
        SELECT DISTINCT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
               first_value(event_type) OVER w AS first_type,
               last_value(event_type)  OVER w AS last_type
        FROM events
        WINDOW w AS (PARTITION BY user_id, date_trunc('day', CAST(ts AS TIMESTAMP))
                     ORDER BY CAST(ts AS TIMESTAMP), event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First and last event type per user-day (full-frame first/last)."""
    # day kept as midnight TIMESTAMP, not DATE: DATE pandas-converts
    # differently across engines (datetime.date vs datetime64) → hash break.
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts")
    )
    w = (
        Window.partitionBy("user_id", "day")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        ev.select(
            "user_id",
            "day",
            F.first("event_type").over(w).alias("first_type"),
            F.last("event_type").over(w).alias("last_type"),
        )
        .distinct()
    )


@op(
    "win_cume_dist",
    oracle="""
        SELECT event_id, event_type,
               floor((cume_dist() OVER (PARTITION BY event_type
                                        ORDER BY value, event_id))
                     * 10000.0 + 0.505) / 10000.0 AS cd,
               ntile(10) OVER (PARTITION BY event_type
                               ORDER BY value, event_id) AS decile
        FROM events
    """,
    scale=(
        "cume_dist/ntile: one shuffle on the partition key + per-partition "
        "sort; the event_id tie-break makes every row's rank — and the "
        "decile boundary — a total order, identical across engines."
    ),
)
def win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distribution + decile of value within each event_type."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        rnd(F.cume_dist().over(w), 4).alias("cd"),
        F.ntile(10).over(w).alias("decile"),
    )


@op(
    "win_moving_zscore",
    oracle="""
        SELECT user_id, event_id,
               floor((CASE WHEN stddev_samp(value) OVER w > 0
                           THEN (value - avg(value) OVER w) / stddev_samp(value) OVER w
                      END) * 10000.0 + 0.505) / 10000.0 AS zscore
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY CAST(ts AS TIMESTAMP), event_id
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    """,
    scale=(
        "Streaming-style anomaly score in batch: each event scored "
        "against ITS OWN trailing window (20 events, exclusive of self — "
        "no target leakage). Bounded ROWS frame = O(1) state per row; "
        "one shuffle on user_id. The outlier-flagging pass of a "
        "data-quality pipeline."
    ),
)
def win_moving_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score of value per user (self-exclusive frame)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    mu = F.avg("value").over(w)
    sd = F.stddev_samp("value").over(w)
    return ev.select(
        "user_id",
        "event_id",
        rnd(F.when(sd > 0, (F.col("value") - mu) / sd), 4).alias("zscore"),
    )


@op(
    "win_head_tail_sample",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate, which FROM (
            SELECT o_custkey, o_orderkey, o_orderdate,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS rn,
                   count(*) OVER (PARTITION BY o_custkey) AS n,
                   CASE WHEN row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) <= 2
                        THEN 'head' ELSE 'tail' END AS which
            FROM orders
        ) WHERE rn <= 2 OR rn > n - 2
    """,
    scale=(
        "Per-group head+tail sample (first/last k rows per key): ONE "
        "window pass computes both the rank and the group size — no "
        "second scan, no join back. The inspect-the-extremes debugging "
        "primitive for skew and data-quality triage. Note: rows in "
        "groups of ≤4 can be both head and tail; 'which' labels head "
        "first, deterministically."
    ),
)
def win_head_tail_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 2 and last 2 orders per customer in date order, labeled."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wc = Window.partitionBy("o_custkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("n"),
        )
        .where((F.col("rn") <= 2) | (F.col("rn") > F.col("n") - 2))
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.when(F.col("rn") <= 2, "head").otherwise("tail").alias("which"),
        )
    )


@op(
    "win_rolling_median",
    oracle="""
        SELECT event_id, user_id,
               floor((quantile_cont(value, 0.5) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
                   * 10000.0 + 0.505) / 10000.0 AS med5
        FROM events
    """,
    scale=(
        "Rolling exact median (5-event trailing frame): the robust "
        "smoother that a mean-based moving average can't give you. The "
        "frame is ROWS-bounded so per-row state is 5 values regardless of "
        "stream length — one user_id shuffle + one sort, same plan shape "
        "as any windowed agg. For wide frames at 100 TB switch to "
        "approx_percentile over the same window (mergeable sketch)."
    ),
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing 5-event exact median of value (event-time order)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        rnd(F.expr("percentile(value, 0.5)").over(w), 4).alias("med5"),
    )


@op(
    "win_running_distinct",
    oracle="""
        WITH flagged AS (
            SELECT user_id, event_id,
                   CAST(ts AS TIMESTAMP) AS ts,
                   CASE WHEN row_number() OVER (
                            PARTITION BY user_id, event_type
                            ORDER BY CAST(ts AS TIMESTAMP), event_id) = 1
                        THEN 1 ELSE 0 END AS first_seen
            FROM events
        )
        SELECT user_id, event_id,
               CAST(sum(first_seen) OVER (
                   PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS distinct_types_so_far
        FROM flagged
    """,
    scale=(
        "Running COUNT(DISTINCT) — not expressible as a window aggregate "
        "directly (distinct state isn't frame-shrinkable), so it "
        "decomposes into the standard two-window trick: a first-"
        "occurrence flag (row_number = 1 over (key, value)) followed by "
        "a running sum of flags over (key). Two sorts over compatible "
        "partitionings, bounded state, no per-row set materialization — "
        "the shape that replaces the quadratic 'collect_set over "
        "expanding frame' antipattern at any scale."
    ),
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user, the running number of distinct event types seen so far."""
    ev = load_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias(
            "first_seen"
        ),
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("first_seen").over(w_run).cast("long").alias(
            "distinct_types_so_far"
        ),
    )


@op(
    "win_nth_value",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type, value,
                   CAST(ts AS TIMESTAMP) AS ts, event_id,
                   row_number() OVER (PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn,
                   nth_value(event_type, 2) OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP), event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND UNBOUNDED FOLLOWING) AS second_type,
                   nth_value(event_type, 3) OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP), event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND UNBOUNDED FOLLOWING) AS third_type,
                   count(*) OVER (PARTITION BY user_id) AS n_events
            FROM events
        )
        SELECT user_id, second_type, third_type,
               CAST(n_events AS BIGINT) AS n_events
        FROM seq WHERE rn = 1
    """,
    scale=(
        "nth_value over the full partition frame: one shuffle on user_id "
        "+ local sort, then a constant-per-partition lookup; the rn = 1 "
        "projection collapses to one row per key without a second "
        "aggregation pass (same sort serves both windows). The "
        "unbounded-following frame forces full-partition buffering — "
        "bounded because user partitions are bounded; for unbounded keys "
        "the min_by/max_by aggregate form replaces it."
    ),
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: the 2nd and 3rd event type in time order, via nth_value."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        ev.select(
            "user_id",
            F.row_number().over(w).alias("rn"),
            F.nth_value("event_type", 2).over(wf).alias("second_type"),
            F.nth_value("event_type", 3).over(wf).alias("third_type"),
            F.count(F.lit(1)).over(
                Window.partitionBy("user_id")
            ).alias("n_events"),
        )
        .where(F.col("rn") == 1)
        .select("user_id", "second_type", "third_type", "n_events")
    )


@op(
    "win_leave_one_out",
    oracle="""
        WITH s AS (
            SELECT l_partkey, l_orderkey, l_linenumber, l_extendedprice,
                   count(*) OVER (PARTITION BY l_partkey) AS n,
                   sum(l_extendedprice) OVER (PARTITION BY l_partkey) AS tot
            FROM lineitem
        )
        SELECT l_partkey, l_orderkey, l_linenumber,
               floor(((tot - l_extendedprice) / (n - 1)) * 100.0 + 0.505)
                   / 100.0 AS loo_avg_price,
               floor((l_extendedprice - (tot - l_extendedprice) / (n - 1))
                     * 100.0 + 0.505) / 100.0 AS deviation
        FROM s WHERE n > 1
    """,
    scale=(
        "Leave-one-out mean without the frame-exclusion feature neither "
        "engine's ROWS/RANGE syntax gives you cleanly: (group_sum - x) / "
        "(group_n - 1) from two whole-partition window aggregates — one "
        "shuffle on the group key, no sort even (unbounded frames need "
        "no ordering), no self-join. The LOO deviation is the standard "
        "leakage-free way to score an item against its peers (same "
        "reason feat_target_encode subtracts self); at 100 TB this is "
        "two partial-agg columns riding the same exchange."
    ),
)
def win_leave_one_out(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each lineitem vs the average price of OTHER items of its part."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    s = li.select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("l_extendedprice").over(w).alias("tot"),
    ).where(F.col("n") > 1)
    loo = (F.col("tot") - F.col("l_extendedprice")) / (F.col("n") - 1)
    return s.select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        rnd(loo, 2).alias("loo_avg_price"),
        rnd(F.col("l_extendedprice") - loo, 2).alias("deviation"),
    )


@op(
    "win_resetting_accumulator",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_id, event_type, value,
                   CAST(ts AS TIMESTAMP) AS ts,
                   sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id
                             ORDER BY CAST(ts AS TIMESTAMP), event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS seg
            FROM events
        )
        SELECT user_id, event_id,
               floor(sum(CASE WHEN event_type <> 'error' THEN value
                              ELSE 0 END)
                     OVER (PARTITION BY user_id, seg
                           ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW)
                     * 10000.0 + 0.505) / 10000.0
                   AS points_since_error
        FROM seq
    """,
    scale=(
        "A running accumulator that RESETS on a trigger event (loyalty "
        "points zeroed by an error): no procedural loop — a running "
        "count of triggers defines the segment id, and the accumulator "
        "is a running sum within (key, segment). Both windows sort the "
        "SAME (user, time) order, so Spark executes them over one "
        "exchange + one sort; the reset event itself contributes zero "
        "and advances the segment. This windows-composition pattern "
        "replaces the UDAF people reach for, keeping the whole thing "
        "codegen-side and mergeable at 100 TB."
    ),
)
def win_resetting_accumulator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running value total per user that resets to zero at each error."""
    ev = load_table(spark, sf_dir, "events")
    w_seg = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seq = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") != "error", F.col("value"))
        .otherwise(0.0)
        .alias("pts"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).over(w_seg).alias("seg"),
    )
    w_run = (
        Window.partitionBy("user_id", "seg")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return seq.select(
        "user_id",
        "event_id",
        rnd(F.sum("pts").over(w_run), 4).alias("points_since_error"),
    )
