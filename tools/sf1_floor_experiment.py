"""Floor-vs-scale experiment (PERF.md round-6 table, committed per VERDICT r6
item 6 so any future judge can re-run it).

Claim under test: the bench queries graded `weak` at sf0.1 (>2x DuckDB) are
bounded by the local-mode per-job floor (~20-30 ms), not by plan debt — so
their ratio must COLLAPSE toward (and through) 1x as data grows and real
work starts to dominate the fixed overhead.

Method: union-replicate events/documents/embeddings by FACTOR from a source
scale dir into `.scratch/sf1_synth/` with id columns shifted per replica
(so distinct-key work scales with the data instead of collapsing onto
duplicate keys), then run the floor-suspect queries AND their DuckDB twins
(4 threads, best-of-3 after warmup, fully fetched — the BASELINE.md
measurement method) on the same synthetic parquet.

Usage:
    python tools/sf1_floor_experiment.py                  # x10 from sf0.1
    SPARK_GRAFT_FLOOR_SRC=/root/testdata/sf0.01 \
    SPARK_GRAFT_FLOOR_FACTOR=3 python tools/sf1_floor_experiment.py

Prints one JSON line {query: {spark_s, duckdb_s, ratio}}. The synthetic
data lands in gitignored scratch; delete `.scratch/sf1_synth` to force a
rebuild after changing FACTOR or SRC.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

# id-shift steps: larger than any real id range in the fixtures, so every
# replica's keys are disjoint from every other's
ID_SHIFTS = {
    "events": {"event_id": 10**10, "user_id": 10**7},
    "documents": {"doc_id": 10**9},
    "embeddings": {"vec_id": 10**7},
}


def replicate(spark, src: str, dest: str, factor: int) -> None:
    """Write factor-x id-shifted unions of the three LLM-side tables."""
    from python_kinesis_streaming_spark.sources.tables import load_table

    os.makedirs(dest, exist_ok=True)
    for name, shifts in ID_SHIFTS.items():
        df = load_table(spark, src, name)
        parts = []
        for i in range(factor):
            d = df
            for col, step in shifts.items():
                d = d.withColumn(col, F.col(col) + F.lit(i * step))
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        path = os.path.join(dest, f"{name}.parquet")
        out.coalesce(8).write.mode("overwrite").parquet(path)


def build_queries(spark, synth_dir: str) -> dict:
    """The floor-suspect bench queries, bound to the synthetic data."""
    from python_kinesis_streaming_spark.registry import all_queries
    from python_kinesis_streaming_spark.sources.tables import load_table

    reg = all_queries()
    docs = load_table(spark, synth_dir, "documents")
    return {
        "distinct_users_per_type": reg["agg_count_distinct"](spark, synth_dir),
        "text_token_count": docs.groupBy("lang").agg(
            F.sum(F.size(F.split("text", " "))).alias("n_tokens")
        ),
        "knn_cosine_top10": reg["sim_knn_cosine"](spark, synth_dir),
    }


DUCK_SQL = {
    "distinct_users_per_type": (
        "SELECT event_type, count(DISTINCT user_id) AS n_users "
        "FROM events GROUP BY event_type"
    ),
    "text_token_count": (
        "SELECT lang, sum(len(string_split(text,' '))) AS n_tokens "
        "FROM documents GROUP BY lang"
    ),
    "knn_cosine_top10": """
      WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0)
      SELECT vec_id,
             floor((list_cosine_similarity(embedding::DOUBLE[], qe)) * 10000.0 + 0.505) / 10000.0 AS sim
      FROM embeddings, q WHERE vec_id <> 0
      ORDER BY sim DESC, vec_id LIMIT 10""",
}


def _best3(fn, warm: int = 3) -> float:
    for _ in range(warm):
        fn()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def run_experiment(
    spark, src: str, synth_dir: str, factor: int, rebuild: bool = False
) -> dict:
    if rebuild and os.path.isdir(synth_dir):
        shutil.rmtree(synth_dir)
    if not os.path.isdir(synth_dir):
        replicate(spark, src, synth_dir, factor)

    import duckdb

    con = duckdb.connect()
    con.execute("SET threads TO 4")
    for t in ID_SHIFTS:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{synth_dir}/{t}.parquet/*.parquet')"
        )
    out = {}
    for name, df in build_queries(spark, synth_dir).items():
        s = _best3(lambda: df.toPandas())
        d = _best3(lambda: con.execute(DUCK_SQL[name]).fetchall())
        out[name] = {
            "spark_s": round(s, 4),
            "duckdb_s": round(d, 4),
            "ratio": round(s / d, 2),
        }
    return out


def main() -> None:
    from python_kinesis_streaming_spark.session import build_session

    src = os.environ.get("SPARK_GRAFT_FLOOR_SRC", "/root/testdata/sf0.1")
    factor = int(os.environ.get("SPARK_GRAFT_FLOOR_FACTOR", "10"))
    synth = os.path.join(REPO, ".scratch", "sf1_synth")
    spark = build_session(
        app_name="sf1-floor",
        master="local[32]",
        shuffle_partitions=16,
        extra_confs={"spark.sql.adaptive.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = run_experiment(spark, src, synth, factor)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
