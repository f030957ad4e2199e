"""§2.4 Aggregations (SURVEY.md).

Scale notes (100 TB):
- Every groupBy here compiles to partial (map-side) + final aggregation —
  the shuffle carries pre-aggregated state, not raw rows. Group-key
  cardinalities (returnflag×linestatus=6, event_type=5, user_id=O(users))
  keep reducer state small; AQE coalesces the post-shuffle partitions.
- `count(DISTINCT ...)` uses Spark's Expand + two-phase exact plan; at
  extreme cardinality switch to `approx_count_distinct` (HLL, mergeable,
  one pass) — both are declared ops.
- Float discipline: money aggregates rounded to fixed scale on both engines
  (SURVEY §7.4 h2) because partial-agg tree shape differs from DuckDB's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from python_kinesis_streaming_spark.functions.rounding import rnd, sql_rnd
from python_kinesis_streaming_spark.registry import op
from python_kinesis_streaming_spark.sources.tables import load_table

Q1_CUTOFF = "1998-09-02"


@op(
    "agg_hash_global",
    oracle="""
        SELECT floor((sum(l_quantity)) * 100.0 + 0.505) / 100.0       AS sum_qty,
               floor((avg(l_extendedprice)) * 10000.0 + 0.505) / 10000.0  AS avg_price,
               min(l_shipdate)                 AS min_ship,
               max(l_shipdate)                 AS max_ship,
               count(*)                        AS n_rows
        FROM lineitem
    """,
)
def agg_hash_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (no-key) aggregate: sum/avg/min/max/count in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
        rnd(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@op(
    "agg_groupby_q1",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               floor((sum(l_quantity)) * 100.0 + 0.505) / 100.0 AS sum_qty,
               floor((sum(l_extendedprice)) * 100.0 + 0.505) / 100.0 AS sum_base_price,
               floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.505) / 100.0 AS sum_disc_price,
               floor((sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 100.0 + 0.505) / 100.0 AS sum_charge,
               floor((avg(l_quantity)) * 10000.0 + 0.505) / 10000.0 AS avg_qty,
               floor((avg(l_extendedprice)) * 10000.0 + 0.505) / 10000.0 AS avg_price,
               floor((avg(l_discount)) * 10000.0 + 0.505) / 10000.0 AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
        GROUP BY l_returnflag, l_linestatus
    """,
    scale=(
        "6 groups → partial agg reduces ~everything map-side; shuffle is "
        "6 rows × partitions. The canonical 100TB-friendly aggregation."
    ),
)
def agg_groupby_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary — the flagship query (SURVEY §5.1)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
            rnd(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            rnd(F.sum(disc_price), 2).alias("sum_disc_price"),
            rnd(F.sum(disc_price * (F.lit(1) + F.col("l_tax"))), 2).alias("sum_charge"),
            rnd(F.avg("l_quantity"), 4).alias("avg_qty"),
            rnd(F.avg("l_extendedprice"), 4).alias("avg_price"),
            rnd(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@op(
    "agg_count_distinct",
    oracle="""
        SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
    """,
    scale=(
        "Exact distinct via Expand + 2-phase agg; at 100 TB prefer "
        "agg_approx_distinct (HLL sketch, mergeable, no expand blowup)."
    ),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count(DISTINCT user_id) per event_type."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_users"))


@op(
    "agg_approx_distinct",
    oracle="""
        SELECT event_type, count(DISTINCT user_id) AS n_users_exact,
               TRUE AS within_rsd
        FROM events GROUP BY event_type
    """,
    scale="HLL++ sketch: one pass, tiny mergeable state — the 100 TB path for distincts.",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct(user_id) per event_type (rsd=0.05), emitted as
    a driver-checkable accuracy contract: the exact count plus a boolean
    asserting the HLL estimate landed within 3×rsd — the oracle expects
    constant TRUE, so a broken sketch hash-fails."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.05).alias("n_approx"),
            F.countDistinct("user_id").alias("n_users_exact"),
        )
        .select(
            "event_type",
            "n_users_exact",
            (
                F.abs(F.col("n_approx") - F.col("n_users_exact"))
                <= 0.15 * F.col("n_users_exact")
            ).alias("within_rsd"),
        )
    )


@op(
    "agg_grouping_sets",
    oracle="""
        SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
               floor((sum(o_totalprice)) * 100.0 + 0.505) / 100.0 AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY ROLLUP(n_name, CAST(year(o_orderdate) AS INTEGER))
    """,
    scale="Rollup = Expand(3 projections) + one agg; dims broadcast-joined.",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by (nation, year), (nation), and grand total via ROLLUP."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .withColumn("o_year", F.year("o_orderdate"))
    )
    return joined.rollup("n_name", "o_year").agg(
        rnd(F.sum("o_totalprice"), 2).alias("revenue")
    )


@op(
    "agg_collect",
    oracle="""
        SELECT user_id, string_agg(event_type, '|' ORDER BY event_type) AS evts
        FROM events GROUP BY user_id
    """,
    scale=(
        "collect_list is unbounded per-key state — fine for bounded "
        "per-user lists; at 100 TB cap with slice() or pre-aggregate. "
        "Result serialized to a delimited string: top-level array columns "
        "crash the driver's pandas-based canonicalizer (r1 hard FAIL)."
    ),
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user list of event_types, sorted for determinism (§7.4 h3),
    emitted as a '|'-joined string (hash-safe scalar result)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.concat_ws("|", F.array_sort(F.collect_list("event_type"))).alias("evts")
    )


@op(
    "agg_percentile",
    oracle="""
        SELECT event_type,
               floor((quantile_cont(value, 0.5)) * 10000.0 + 0.505) / 10000.0  AS p50,
               floor((quantile_cont(value, 0.95)) * 10000.0 + 0.505) / 10000.0 AS p95
        FROM events GROUP BY event_type
    """,
    scale=(
        "Exact percentile collects per-group sorted values — OK for small "
        "groups; at 100 TB use percentile_approx (streaming QDigest sketch)."
    ),
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p95 of value per event_type (exact, not approx: §5.2)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        rnd(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        rnd(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
    )


@op(
    "agg_distinct_rows",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def agg_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT on a composite key (hash-agg dedup)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").distinct()


@op(
    "agg_rollup",
    oracle=f"""
        SELECT grouping(r_name) * 2 + grouping(n_name) AS gid,
               r_name, n_name,
               {sql_rnd("sum(o_totalprice)")} AS revenue, count(*) AS n
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
    """,
    scale=(
        "ROLLUP(region, nation) = 3 grouping sets along the hierarchy — "
        "Expand ×3 + ONE partial-agg pass (vs CUBE's 2^n sets). The "
        "hierarchy rollup of a hypertable: hourly→daily→monthly follows "
        "the identical plan shape. gid disambiguates real NULL keys from "
        "subtotal rows."
    ),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue subtotals along the region→nation hierarchy via ROLLUP."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    j = (
        orders.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(
            # grouping_id() must live inside the Aggregate (Spark rejects it
            # in a post-agg projection).
            F.grouping_id().alias("gid"),
            rnd(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("gid", "r_name", "n_name", "revenue", "n")
    )


@op(
    "agg_mode",
    oracle="""
        SELECT user_id, event_type AS mode_type, n FROM (
            SELECT user_id, event_type, count(*) AS n,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY count(*) DESC, event_type) AS rn
            FROM events GROUP BY user_id, event_type
        ) WHERE rn = 1
    """,
    scale=(
        "Grouped mode: partial-agg (user,type) counts FIRST, then the "
        "window ranks only |users|x|types| aggregated rows — the sort "
        "never sees raw events. Ties break lexicographically (total "
        "order, engine-independent)."
    ),
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent event_type per user (count desc, name asc on ties)."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_type"), "n")
    )


@op(
    "agg_weighted_avg",
    oracle="""
        SELECT l_returnflag,
               floor((sum(l_extendedprice * l_quantity) / sum(l_quantity))
                     * 10000.0 + 0.505) / 10000.0 AS wavg_price,
               floor((sum(l_quantity)) * 100.0 + 0.505) / 100.0 AS total_qty
        FROM lineitem GROUP BY l_returnflag
    """,
    scale=(
        "Weighted average = two partial sums merged at the end — "
        "associative state like any sum; never a collect-and-divide. The "
        "same decomposition generalizes to any ratio-of-sums metric."
    ),
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price per return flag (ratio of sums)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        rnd(
            F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
            / F.sum("l_quantity"),
            4,
        ).alias("wavg_price"),
        rnd(F.sum("l_quantity"), 2).alias("total_qty"),
    )


@op(
    "agg_entropy",
    oracle="""
        WITH c AS (
            SELECT user_id, event_type, count(*) AS n
            FROM events GROUP BY user_id, event_type
        ),
        t AS (SELECT user_id, sum(n) AS tot FROM c GROUP BY user_id)
        SELECT c.user_id,
               floor((-sum((n / CAST(tot AS DOUBLE))
                           * ln(n / CAST(tot AS DOUBLE))))
                     * 10000.0 + 0.505) / 10000.0 AS entropy,
               CAST(count(*) AS INTEGER) AS n_types
        FROM c JOIN t ON c.user_id = t.user_id
        GROUP BY c.user_id
    """,
    scale=(
        "Behavioral entropy (distribution profiling): two partial-agg "
        "passes over (user,type) counts — the heavy reduction happens "
        "before any division; shuffle state is |users|×|types| counters. "
        "Same shape profiles label balance in a training corpus."
    ),
)
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats) of each user's event-type distribution."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("user_id").agg(F.sum("n").alias("tot"))
    p = F.col("n") / F.col("tot").cast("double")
    return (
        c.join(t, "user_id")
        .groupBy("user_id")
        .agg(
            rnd(-F.sum(p * F.log(p)), 4).alias("entropy"),
            F.count(F.lit(1)).cast("int").alias("n_types"),
        )
    )


@op(
    "agg_sketch_merge",
    oracle="""
        WITH per_type AS (
            SELECT event_type, count(DISTINCT user_id) AS n FROM events
            GROUP BY event_type
        )
        SELECT count(DISTINCT user_id) AS n_exact, TRUE AS within_rsd
        FROM events
    """,
    scale=(
        "THE mergeable-sketch architecture, demonstrated end-to-end: "
        "per-partition/per-group HLL sketches (DataSketches "
        "hll_sketch_agg) union-merged into a global estimate "
        "(hll_union_agg) WITHOUT touching raw rows again — how a 100 TB "
        "distinct count composes from per-day/per-shard sketches stored "
        "alongside the data. Driver-checked as an accuracy contract "
        "(estimate within 3×rsd of exact ⇒ constant-TRUE column)."
    ),
)
def agg_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global distinct users via per-event-type HLL sketches merged with
    hll_union_agg; emits the exact count + a within-tolerance boolean."""
    ev = load_table(spark, sf_dir, "events")
    sketches = ev.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk")
    )
    merged = sketches.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("n_est")
    )
    exact = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    return exact.crossJoin(merged).select(
        "n_exact",
        (
            F.abs(F.col("n_est") - F.col("n_exact"))
            <= 0.15 * F.col("n_exact")
        ).alias("within_rsd"),
    )


@op(
    "agg_string_agg",
    oracle="""
        SELECT c_nationkey,
               count(*) AS n_customers,
               array_to_string(list_sort(list_distinct(list(c_mktsegment))), ',')
                   AS segments
        FROM customer GROUP BY c_nationkey
    """,
    scale=(
        "LISTAGG/string_agg with deterministic ordering: collect_set is a "
        "partial-agg (set union merges map-side), array_sort fixes the "
        "engine- and partitioning-dependent arrival order, and the result "
        "ships as ONE string per group (hash-safe, no array column). "
        "Bounded state: the set is distinct values, not rows — at 100 TB "
        "cap/overflow with slice() or move to a proper topic model when "
        "|distinct| per group is unbounded."
    ),
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation customer count + sorted distinct market segments as one
    comma-joined string (the LISTAGG surface)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.concat_ws(",", F.array_sort(F.collect_set("c_mktsegment"))).alias(
            "segments"
        ),
    )


@op(
    "agg_count_min_sketch",
    oracle="""
        WITH seeds AS (SELECT u.s AS s FROM unnest([101, 102, 103, 104]) AS u(s)),
        hashed AS (
            SELECT user_id, s,
                   CAST(('0x' || substring(md5(CAST(s AS VARCHAR) || ':'
                        || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
                       % 256 AS cell
            FROM events, seeds
        ),
        sketch AS (
            SELECT s, cell, count(*) AS n FROM hashed GROUP BY s, cell
        ),
        probe AS (SELECT DISTINCT user_id, s, cell FROM hashed),
        est AS (
            SELECT p.user_id, min(sk.n) AS cms_estimate
            FROM probe p JOIN sketch sk USING (s, cell)
            GROUP BY p.user_id
        ),
        exact AS (
            SELECT user_id, count(*) AS exact_n FROM events GROUP BY user_id
        )
        SELECT e.user_id, exact_n, cms_estimate
        FROM exact e JOIN est USING (user_id)
        ORDER BY exact_n DESC, user_id LIMIT 10
    """,
    scale=(
        "Count-Min Sketch, fully declarative: depth 4 × width 256 cells of "
        "partial-agg counts (the sketch is ~1 k longs of MERGEABLE state "
        "however many rows stream through), probe = min over the item's 4 "
        "cells — estimate >= exact always, within eps·N w.h.p. The "
        "md5-derived hash is bit-identical in both engines, so even the "
        "sketch CONTENTS are oracle-checkable, not just the contract. At "
        "100 TB this is the heavy-hitters pre-filter that finds skew keys "
        "before a join chooses its salting strategy."
    ),
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch (4×256, md5 hashes) over event user_ids: top-10
    users by exact count with their CMS estimates (estimate >= exact)."""
    from python_kinesis_streaming_spark.llm.dedup import md5_hash64

    ev = load_table(spark, sf_dir, "events")
    seeds = [101, 102, 103, 104]
    hashed = ev.select(
        "user_id",
        F.posexplode(
            F.array(
                *[
                    (md5_hash64(F.col("user_id").cast("string"), seed=s) % 256)
                    for s in seeds
                ]
            )
        ).alias("s_idx", "cell"),
    )
    sketch = hashed.groupBy("s_idx", "cell").agg(F.count(F.lit(1)).alias("n"))
    probe = hashed.distinct()
    est = (
        probe.join(sketch, ["s_idx", "cell"])
        .groupBy("user_id")
        .agg(F.min("n").alias("cms_estimate"))
    )
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    return (
        exact.join(est, "user_id")
        .orderBy(F.desc("exact_n"), F.asc("user_id"))
        .limit(10)
    )


@op(
    "agg_regression",
    oracle=f"""
        WITH t AS (
            SELECT event_type, value,
                   (epoch_us(CAST(ts AS TIMESTAMP)) - 1704067200000000)
                       / 86400000000.0 AS day_x
            FROM events
        )
        SELECT event_type,
               count(*) AS n,
               {sql_rnd("regr_slope(value, day_x)", 6)} AS slope,
               {sql_rnd("regr_intercept(value, day_x)", 6)} AS intercept,
               {sql_rnd("regr_r2(value, day_x)", 6)} AS r2
        FROM t GROUP BY event_type
    """,
    scale=(
        "OLS trend per group with the SQL regr_* family: each statistic "
        "reduces to the same five partial sums (n, Σx, Σy, Σxy, Σx²) — "
        "mergeable map-side state like any sum, so a 100 TB trend fit "
        "costs one scan + a |groups|-row exchange. The drift detector for "
        "metrics pipelines (slope per segment, r² as signal quality)."
    ),
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS fit of value vs time-in-days: slope, intercept,
    and r² (regr_slope/regr_intercept/regr_r2 builtins)."""
    ev = load_table(spark, sf_dir, "events")
    day_x = (F.unix_micros("ts") - F.lit(1_704_067_200_000_000)) / F.lit(
        86400000000.0
    )
    t = ev.select("event_type", "value", day_x.alias("day_x"))
    return t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        rnd(F.regr_slope("value", "day_x"), 6).alias("slope"),
        rnd(F.regr_intercept("value", "day_x"), 6).alias("intercept"),
        rnd(F.regr_r2("value", "day_x"), 6).alias("r2"),
    )


@op(
    "agg_decimal_exact",
    oracle="""
        SELECT l_returnflag,
               count(*) AS n,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
                   AS sum_price_exact,
               CAST(min(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
                   AS min_price_exact,
               CAST(max(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
                   AS max_price_exact
        FROM lineitem GROUP BY l_returnflag
    """,
    scale=(
        "Money-grade arithmetic: DECIMAL(18,2) sums are EXACT — no "
        "accumulation-order drift, no rounding discipline needed — and "
        "emitted as canonical strings so the parity check proves "
        "bit-identical cents across engines. Spark decimal aggregation "
        "partial-combines like any sum (128-bit accumulator); the "
        "at-scale rule: money enters the pipeline as decimal/cents ONCE "
        "at ingest, never as accumulated doubles."
    ),
)
def agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL(18,2) price totals and extrema per returnflag,
    emitted as canonical decimal strings."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = F.col("l_extendedprice").cast("decimal(18,2)")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("string").alias("sum_price_exact"),
        F.min(dec).cast("string").alias("min_price_exact"),
        F.max(dec).cast("string").alias("max_price_exact"),
    )


@op(
    "agg_bitmap_distinct",
    oracle="""
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_bitmap,
               CAST((SELECT count(DISTINCT user_id) FROM events) AS BIGINT)
                   AS n_users_all
        FROM events GROUP BY event_type
    """,
    scale=(
        "EXACT distinct counting with mergeable state: bitmap_construct_agg "
        "packs each key's bit position into a fixed-width bitmap, partials "
        "OR-combine map-side (like sums — unlike count(DISTINCT) whose "
        "state is the key set itself), and bitmap_or_agg re-merges "
        "per-group bitmaps into the global count WITHOUT re-touching rows. "
        "The exact tier of the distinct-count ladder (HLL sketch-merge is "
        "the approximate tier, agg_sketch_merge) for dense int key spaces."
    ),
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type exact distinct users via bucketed bitmap aggregates, plus
    the global distinct re-derived by OR-merging the per-type bitmaps.

    bitmap_bit_position is 1-based (input 0 would vanish), so keys shift
    by +1; bitmap_bucket_number partitions the key space into fixed-width
    bitmaps so arbitrarily large ids never collide."""
    ev = load_table(spark, sf_dir, "events")
    key = F.col("user_id") + F.lit(1)
    per_bucket = ev.groupBy("event_type", F.bitmap_bucket_number(key).alias("bkt")).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position(key)).alias("bm")
    )
    per_type = per_bucket.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).alias("n_users_bitmap")
    )
    global_n = (
        per_bucket.groupBy("bkt")
        .agg(F.bitmap_or_agg("bm").alias("obm"))
        .agg(F.sum(F.bitmap_count("obm")).alias("n_all"))
    )
    return per_type.crossJoin(F.broadcast(global_n)).select(
        "event_type", "n_users_bitmap", F.col("n_all").alias("n_users_all")
    )


@op(
    "agg_incremental_rollup",
    oracle=f"""
        WITH daily AS (
            SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
                   event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   sum(value) AS sv
            FROM events GROUP BY 1, 2
        )
        SELECT date_trunc('month', d) AS m, event_type,
               CAST(sum(n) AS BIGINT) AS n_events,
               {sql_rnd("sum(sv)")} AS sum_value,
               CAST(count(*) AS BIGINT) AS n_days
        FROM daily GROUP BY 1, 2
    """,
    scale=(
        "Incremental (hypertable-style) rollup: the monthly aggregate is "
        "computed FROM the daily rollup, never from raw events — count and "
        "sum are algebraic, so partials merge losslessly. This is the "
        "materialized-rollup maintenance pattern at 100 TB: each new day "
        "aggregates once (|day| partition only), months re-aggregate "
        "|days|x|types| rows in milliseconds, and backfills touch only "
        "affected days. The same two-level shape is what AQE-era map-side "
        "partial aggregation does inside a single query."
    ),
)
def agg_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly aggregates derived from a daily rollup (algebraic re-agg)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("d"), "event_type"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("value").alias("sv"),
    )
    return daily.groupBy(
        F.date_trunc("month", "d").alias("m"), "event_type"
    ).agg(
        F.sum("n").cast("long").alias("n_events"),
        rnd(F.sum("sv")).alias("sum_value"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )


@op(
    "agg_quantile_sketch_audit",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               floor((quantile_cont(value, 0.5)) * 10000.0 + 0.505)
                   / 10000.0 AS p50_exact,
               floor((quantile_cont(value, 0.95)) * 10000.0 + 0.505)
                   / 10000.0 AS p95_exact,
               true AS p50_within_bound,
               true AS p95_within_bound
        FROM events GROUP BY event_type
    """,
    scale=(
        "Sketch-accuracy audit: percentile_approx (the mergeable "
        "GK/KLL-style sketch that replaces exact percentiles at 100 TB) "
        "checked against the exact quantile with the sketch's own rank "
        "guarantee — at accuracy=1000 the approx p-quantile must land within a 1%-rank window of the exact quantile (a conservative cover for merged-sketch error). The op "
        "emits the exact values plus constant-true bound flags: the "
        "sketch itself is partition-order-dependent so its raw output "
        "is NOT hash-stable, but the guarantee IS — which is exactly "
        "what the driver can verify (same pattern as "
        "agg_approx_distinct's rsd contract)."
    ),
)
def agg_quantile_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx vs exact percentile, emitted as exact values plus
    within-rank-bound flags (the sketch's contract)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        rnd(F.expr("percentile(value, 0.5)"), 4).alias("p50_exact"),
        rnd(F.expr("percentile(value, 0.95)"), 4).alias("p95_exact"),
        (
            (F.expr("percentile_approx(value, 0.5, 1000)")
             >= F.expr("percentile(value, 0.49)"))
            & (F.expr("percentile_approx(value, 0.5, 1000)")
               <= F.expr("percentile(value, 0.51)"))
        ).alias("p50_within_bound"),
        (
            (F.expr("percentile_approx(value, 0.95, 1000)")
             >= F.expr("percentile(value, 0.94)"))
            & (F.expr("percentile_approx(value, 0.95, 1000)")
               <= F.expr("percentile(value, 0.96)"))
        ).alias("p95_within_bound"),
    )


@op(
    "agg_geometric_mean",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               floor(exp(avg(ln(value))) * 10000.0 + 0.505) / 10000.0
                   AS geo_mean,
               floor(avg(value) * 10000.0 + 0.505) / 10000.0 AS arith_mean
        FROM events WHERE value > 0 GROUP BY event_type
    """,
    scale=(
        "Geometric mean via the log-sum identity exp(avg(ln x)) — the "
        "only distributable formulation: a raw product overflows double "
        "after ~300 values, while Σ ln(x) is a plain mergeable sum. The "
        "right average for multiplicative quantities (growth rates, "
        "latency ratios); rounded at 4 dp to absorb 1-ulp ln/exp "
        "divergence between JVM and libm. Shown beside the arithmetic "
        "mean — the gap is the skew indicator."
    ),
)
def agg_geometric_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type geometric vs arithmetic mean of event values."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value") > 0)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        rnd(F.exp(F.avg(F.log("value"))), 4).alias("geo_mean"),
        rnd(F.avg("value"), 4).alias("arith_mean"),
    )


@op(
    "agg_bitmap_native",
    oracle="""
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
               CAST(count(DISTINCT user_id) AS BIGINT) AS bitmap_distinct
        FROM events GROUP BY event_type
    """,
    scale=(
        "Spark 4 native bitmap aggregates (bitmap_bit_position -> "
        "bitmap_construct_agg -> bitmap_count): EXACT distinct counting "
        "with a mergeable fixed-width bitmap state (4 KB per 32k-id "
        "bucket) instead of a hash set — the middle ground between "
        "approx_count_distinct (small but approximate) and "
        "count(distinct) (exact but expand-based). At 100 TB compose "
        "with bitmap_or_agg over per-bucket partials "
        "(agg_bitmap_distinct builds the same thing by hand); ids must "
        "pre-bucket by bitmap_bucket_number when they exceed one "
        "bucket's range. The oracle pins bitmap_count == exact."
    ),
)
def agg_bitmap_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native bitmap exact-distinct per event type, checked against
    count(distinct)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct"),
        # +1: bitmap_bit_position is 1-based — id 0 would map to position
        # -1 and silently drop from the bitmap (verified: 149 vs 150).
        F.expr(
            "bitmap_count(bitmap_construct_agg("
            "bitmap_bit_position(user_id + 1)))"
        )
        .cast("long")
        .alias("bitmap_distinct"),
    )


@op(
    "agg_percentile_disc",
    oracle="""
        SELECT event_type,
               quantile_disc(value, 0.5) AS p50_disc,
               quantile_disc(value, 0.95) AS p95_disc,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type
    """,
    scale=(
        "DISCRETE percentiles — an actual observed value, not an "
        "interpolation (what you need when the value is an id, a "
        "latency bucket, or anything where 'halfway between two rows' "
        "is meaningless). Spark lacks percentile_disc; the exact "
        "equivalent is the element at rank ceil(p*n) from one window "
        "pass per group. Emitted values are raw doubles UNTOUCHED by "
        "arithmetic, so parity needs no rounding — both engines pick "
        "the identical source row."
    ),
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete (observed-value) p50/p95 per event type via rank selection."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    return ranked.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rk") == F.ceil(F.col("n") * 0.5), F.col("value"))
        ).alias("p50_disc"),
        F.max(
            F.when(F.col("rk") == F.ceil(F.col("n") * 0.95), F.col("value"))
        ).alias("p95_disc"),
        F.max("n").cast("long").alias("n"),
    )


@op(
    "agg_weighted_percentile_sql",
    oracle="""
        WITH w AS (
            SELECT l_returnflag, l_extendedprice AS x,
                   CAST(l_quantity AS BIGINT) AS wt
            FROM lineitem
        ),
        ranked AS (
            SELECT l_returnflag, x, wt,
                   sum(wt) OVER (PARTITION BY l_returnflag
                       ORDER BY x, wt
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum,
                   sum(wt) OVER (PARTITION BY l_returnflag) AS total
            FROM w
        )
        SELECT l_returnflag,
               min(CASE WHEN cum * 2 >= total THEN x END) AS weighted_p50,
               CAST(max(total) AS BIGINT) AS total_weight
        FROM ranked GROUP BY l_returnflag
    """,
    scale=(
        "Weighted median in PURE SQL (vs the pandas-UDAF twin "
        "udaf_weighted_median): cumulative-weight window over the "
        "sorted group, first value whose cum*2 >= total — the "
        "cross-multiplied integer test avoids any float threshold. One "
        "sort per group partition, no Python worker round-trip — this "
        "is the production path; the UDAF exists to pin the §2.10 "
        "surface. Emits the source value untouched, so parity needs no "
        "rounding."
    ),
)
def agg_weighted_percentile_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag, windows-only."""
    li = load_table(spark, sf_dir, "lineitem")
    w = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("x"),
        F.col("l_quantity").cast("long").alias("wt"),
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("x", "wt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("l_returnflag")
    ranked = w.select(
        "l_returnflag",
        "x",
        F.sum("wt").over(w_cum).alias("cum"),
        F.sum("wt").over(w_tot).alias("total"),
    )
    return ranked.groupBy("l_returnflag").agg(
        F.min(
            F.when(F.col("cum") * 2 >= F.col("total"), F.col("x"))
        ).alias("weighted_p50"),
        F.max("total").cast("long").alias("total_weight"),
    )


@op(
    "agg_hll_datasketches",
    oracle="""
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
               TRUE AS within_5pct
        FROM events GROUP BY event_type
    """,
    scale=(
        "Apache DataSketches HLL via Spark 4's hll_sketch_agg: unlike "
        "approx_count_distinct's internal HLL++, the sketch here is a "
        "FIRST-CLASS binary column — storable, re-mergeable later with "
        "hll_union_agg across days/partitions without touching raw data, "
        "which is the 100 TB nightly-rollup contract (store per-day "
        "sketches, union on demand for any date range). The estimate is "
        "engine-specific, so the oracle checks the exact count plus a "
        "5% relative-error envelope (lgConfigK=12 → ~1.6% RSE) rather "
        "than hashing the estimate itself — same audit pattern as "
        "agg_approx_distinct."
    ),
)
def agg_hll_datasketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataSketches-HLL distinct users per type, audited against exact."""
    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("user_id"), F.lit(12))
        ).alias("est"),
        F.count_distinct("user_id").alias("exact_distinct"),
    )
    return sk.select(
        "event_type",
        "exact_distinct",
        (
            F.abs(F.col("est") - F.col("exact_distinct"))
            <= 0.05 * F.col("exact_distinct")
        ).alias("within_5pct"),
    )


_ECDF_GRID = [1.0, 5.0, 10.0, 50.0, 100.0, 250.0]


@op(
    "agg_ecdf_grid",
    oracle="""
        SELECT event_type, g.x AS x,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN value <= g.x THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_le,
               floor((CAST(sum(CASE WHEN value <= g.x THEN 1 ELSE 0 END)
                           AS DOUBLE) / count(*)) * 10000.0 + 0.505)
                   / 10000.0 AS ecdf
        FROM events, (VALUES (1.0), (5.0), (10.0), (50.0), (100.0),
                             (250.0)) g(x)
        GROUP BY event_type, g.x
    """,
    scale=(
        "Empirical CDF evaluated on a fixed grid: the literal grid "
        "cross-joins onto the stream (6x row fan-out BEFORE the partial "
        "agg — at wider grids flip to one conditional-sum column per "
        "point, zero fan-out, same result), then everything collapses "
        "map-side to |types| x |grid| rows. Fixed-grid ECDFs are the "
        "mergeable alternative to quantile sketches when the question "
        "is 'what fraction clears threshold X' — thresholds are known, "
        "so exact answers cost one pass and the output is join-ready "
        "for SLA dashboards."
    ),
)
def agg_ecdf_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P(value <= x) per event type on a fixed threshold grid."""
    ev = load_table(spark, sf_dir, "events")
    grid = spark.createDataFrame(
        [(x,) for x in _ECDF_GRID], "x double"
    )
    return (
        ev.select("event_type", "value")
        .crossJoin(F.broadcast(grid))
        .groupBy("event_type", "x")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("value") <= F.col("x"), 1).otherwise(0)
            ).alias("n_le"),
        )
        .select(
            "event_type",
            "x",
            "n",
            "n_le",
            rnd(F.col("n_le").cast("double") / F.col("n"), 4).alias(
                "ecdf"
            ),
        )
    )


@op(
    "agg_share_of_parent",
    oracle="""
        WITH rev AS (
            SELECT r.r_name AS region, n.n_name AS nation,
                   CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.505)
                                 AS BIGINT)) AS BIGINT) AS cents
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name, n.n_name
        )
        SELECT region, nation, cents,
               floor((CAST(cents AS DOUBLE)
                      / sum(cents) OVER (PARTITION BY region))
                     * 10000.0 + 0.505) / 10000.0 AS share_of_region,
               floor((CAST(cents AS DOUBLE) / sum(cents) OVER ())
                     * 10000.0 + 0.505) / 10000.0 AS share_of_total
        FROM rev
    """,
    scale=(
        "Ratio-to-parent at two hierarchy levels (nation share of "
        "region, share of grand total): the fact reduces to the "
        "|nations|-row leaf grid FIRST, then both denominators are "
        "window sums over that tiny grid — the hierarchy math never "
        "touches the fact, and the unpartitioned grand-total window is "
        "safe because its input is 25 rows. The one-groupBy-then-"
        "window-ratios shape is the BI drill-path contract; compare "
        "agg_rollup which materializes the levels as rows instead of "
        "ratios."
    ),
)
def agg_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation revenue with share-of-region and share-of-total ratios."""
    od = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    rev = (
        od.select("o_custkey", "o_totalprice")
        .join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            od.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nat), F.col("c_nationkey") == nat.n_nationkey
        )
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.505)).cast(
                    "long"
                )
            ).alias("cents")
        )
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return rev.select(
        "region",
        "nation",
        "cents",
        rnd(
            F.col("cents").cast("double") / F.sum("cents").over(w_region),
            4,
        ).alias("share_of_region"),
        rnd(
            F.col("cents").cast("double") / F.sum("cents").over(w_all), 4
        ).alias("share_of_total"),
    )


@op(
    "agg_distinct_methods_matrix",
    oracle="""
        WITH e AS (
            SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact
            FROM events
        )
        SELECT m.method, e.exact, TRUE AS within_5pct
        FROM e, (VALUES ('exact'), ('bitmap_exact'), ('hllpp_approx'),
                        ('datasketches_hll')) m(method)
    """,
    scale=(
        "The distinct-counting decision table as ONE op — every method "
        "the engine offers, run on the same column, audited against the "
        "same truth: exact count(DISTINCT) (full shuffle of keys), "
        "bitmap_construct_agg (exact AND mergeable — the right answer "
        "for dense integer keys), approx_count_distinct's HLL++ "
        "(internal sketch, one pass), and DataSketches HLL (storable/"
        "re-unionable sketch column). The within-5% verdicts make the "
        "accuracy-vs-state tradeoff inspectable; at 100 TB this matrix "
        "is exactly the benchmark you run once per key family before "
        "choosing the nightly-rollup representation."
    ),
)
def agg_distinct_methods_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every distinct-count method vs exact truth, one audited row each."""
    ev = load_table(spark, sf_dir, "events")
    key = F.col("user_id")
    exact_df = ev.agg(F.count_distinct(key).alias("v"))
    # Bitmap: position-bucketed exact distinct (mergeable partial state).
    bitmap_df = (
        ev.groupBy((key / 32768).cast("long").alias("bk"))
        .agg(F.bitmap_construct_agg(F.bitmap_bit_position(key)).alias("bm"))
        .agg(F.sum(F.bitmap_count("bm")).alias("v"))
    )
    hllpp_df = ev.agg(F.approx_count_distinct(key, 0.01).alias("v"))
    ds_df = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(key, F.lit(12))).alias("v")
    )
    legs = [
        ("exact", exact_df),
        ("bitmap_exact", bitmap_df),
        ("hllpp_approx", hllpp_df),
        ("datasketches_hll", ds_df),
    ]
    out = None
    for name, df in legs:
        leg = df.crossJoin(F.broadcast(exact_df.select(F.col("v").alias("exact")))).select(
            F.lit(name).alias("method"),
            "exact",
            (F.abs(F.col("v") - F.col("exact")) <= 0.05 * F.col("exact")).alias(
                "within_5pct"
            ),
        )
        out = leg if out is None else out.unionByName(leg)
    return out
