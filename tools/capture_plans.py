"""Capture .explain("formatted") for the 10 headline bench queries.

Usage: python tools/capture_plans.py <outdir-suffix e.g. r14> <before|after>

Writes plans/<suffix>/<query>_<tag>.txt for each headline query, using the
same session shape as bench.py (AQE off, 16 shuffle partitions) so the plan
matches what the bench actually executes. Table cache is disabled and the
catalog cache cleared first (CLAUDE.md invariant 4: the CacheManager
substitutes cached relations into fresh plans otherwise).
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["SPARK_GRAFT_NO_TABLE_CACHE"] = "1"

from pyspark.sql import functions as F  # noqa: E402

from python_kinesis_streaming_spark.registry import all_queries  # noqa: E402
from python_kinesis_streaming_spark.session import build_session  # noqa: E402
from python_kinesis_streaming_spark.sources.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def headline_queries(spark):
    reg = all_queries()
    ev = load_table(spark, SF_DIR, "events")
    docs = load_table(spark, SF_DIR, "documents")

    tumbling = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("w_start"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
    )
    sessionize = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )
    json_props = (
        ev.select(F.from_json("props", "k INT").getField("k").alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("k"))
        .limit(10)
    )
    token_count = docs.groupBy("lang").agg(
        F.sum(
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            + 1
        ).alias("n_tokens")
    )
    return {
        "q1_pricing_summary": reg["agg_groupby_q1"](spark, SF_DIR),
        "q3_topk_join": reg["topk_global"](spark, SF_DIR),
        "q5_five_way_join": reg["join_multiway"](spark, SF_DIR),
        "window_rank": reg["win_rank_topn"](spark, SF_DIR),
        "distinct_users_per_type": reg["agg_count_distinct"](spark, SF_DIR),
        "tumbling_window_1h": tumbling,
        "sessionize_30min": sessionize,
        "json_extract_props": json_props,
        "text_token_count": token_count,
        "knn_cosine_top10": reg["sim_knn_cosine"](spark, SF_DIR),
    }


def main() -> None:
    suffix, tag = sys.argv[1], sys.argv[2]
    outdir = os.path.join(REPO, "plans", suffix)
    os.makedirs(outdir, exist_ok=True)
    spark = build_session(
        app_name="pkss-capture-plans",
        master="local[8]",
        shuffle_partitions=16,
        extra_confs={"spark.sql.adaptive.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.catalog.clearCache()
    for name, df in headline_queries(spark).items():
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            ))
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
