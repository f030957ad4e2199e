"""Bare-session driver sim for the PROMOTION ops (PROMOTION.md).

Same discipline as tools/drive_driver.py — chdir to a neutral temp dir,
build a bare SparkSession (none of our builder configs), run each
promotion op against its DuckDB oracle with the driver's canonical
comparison — but over ``promotions.PROMOTION_OPS`` instead of the
frozen registry. Run before the r9/r10 registration flip.

    python tools/drive_promotions.py              # all promotion ops
    python tools/drive_promotions.py op1 op2      # just the named ops
    python tools/drive_promotions.py --double-run # each op TWICE in the
                                                  # same session (scratch
                                                  # idempotency gate)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SF = os.environ.get("SPARK_GRAFT_SIM_SF", "/root/testdata/sf0.01")
MASTER = os.environ.get("SPARK_GRAFT_SIM_MASTER", "local[8]")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    os.chdir(tempfile.mkdtemp(prefix="promo_sim_"))

    import duckdb
    from pyspark.sql import SparkSession

    from python_kinesis_streaming_spark.promotions import PROMOTION_OPS
    from twin import assert_twin_match

    spark = (
        SparkSession.builder.master(MASTER)
        .appName("promotions-sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )

    args = sys.argv[1:]
    runs = 2 if "--double-run" in args else 1
    names = [a for a in args if not a.startswith("--")] or list(
        PROMOTION_OPS
    )
    unknown = [n for n in names if n not in PROMOTION_OPS]
    if unknown:
        print(f"unknown promotion op(s): {unknown}")
        print(f"known names: {sorted(PROMOTION_OPS)}")
        return 2
    fails: list[str] = []
    for i, name in enumerate(names, 1):
        spec = PROMOTION_OPS[name]
        if not spec.oracle:
            # a promotion without an oracle can't be hash-graded — flag
            # it loudly instead of passing None to duckdb mid-sweep
            fails.append(f"{name} (no oracle)")
            print(f"[{i}/{len(names)}] {name}: FAIL no oracle on spec")
            continue
        for run in range(1, runs + 1):
            tag = f"{name}#r{run}" if runs > 1 else name
            t0 = time.time()
            try:
                sdf = spec.fn(spark, SF).toPandas()
                ddf = con.execute(spec.oracle).df()
                assert_twin_match(sdf, ddf, tag)
                print(
                    f"[{i}/{len(names)}] {tag}: ok "
                    f"({time.time() - t0:.1f}s)"
                )
            except Exception as e:  # noqa: BLE001 — report, keep sweeping
                fails.append(tag)
                print(f"[{i}/{len(names)}] {tag}: FAIL {e}")
    total = len(names) * runs
    print(f"\n{total - len(fails)}/{total} pass; fails: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
