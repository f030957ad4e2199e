"""Per-op Spark-side wall-time sweep over the whole registry.

Times each registry op's full execution (build DataFrame + toPandas) in one
shared session at $SPARK_GRAFT_SIM_SF (default sf0.01), two runs per op
(cold then warm; the DataFrame is rebuilt for the warm run — the r13
measurement lesson: re-running an action on the SAME object reuses shuffle
stages). Prints a JSON dict {op: {cold_s, warm_s}} sorted by warm_s desc,
and writes it to the path in $TIME_OPS_OUT (default .scratch/time_ops.json).

This is the optimization-round survey tool: ranking ops by measured wall
time tells us where optimization effort goes (guide §1.1 — empirical).
NOT a gate; single-session, machine-noise applies.

    python tools/time_ops.py                # whole registry
    python tools/time_ops.py op1 op2 ...    # named ops only
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from python_kinesis_streaming_spark.registry import all_queries  # noqa: E402
from python_kinesis_streaming_spark.session import build_session  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SIM_SF", "/root/testdata/sf0.01")
OUT = os.environ.get(
    "TIME_OPS_OUT", os.path.join(REPO, ".scratch", "time_ops.json")
)


def main() -> None:
    spark = build_session(app_name="pkss-time-ops", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    reg = all_queries()
    names = sys.argv[1:] if len(sys.argv) > 1 else list(reg)
    results: dict[str, dict] = {}
    for i, name in enumerate(names):
        times = []
        err = None
        for _ in range(2):
            t0 = time.perf_counter()
            try:
                reg[name](spark, SF).toPandas()
            except Exception as exc:  # record, keep sweeping
                err = repr(exc)[:200]
                break
            times.append(round(time.perf_counter() - t0, 3))
        row = {"cold_s": times[0] if times else None,
               "warm_s": times[1] if len(times) > 1 else None}
        if err:
            row["err"] = err
        results[name] = row
        print(f"[{i+1}/{len(names)}] {name}: {row}", flush=True)
    spark.stop()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    ranked = sorted(
        (r.get("warm_s") or r.get("cold_s") or 0.0, n)
        for n, r in results.items()
    )[::-1]
    print("\nTop 30 by warm wall time:")
    for s, n in ranked[:30]:
        print(f"  {s:8.3f}s  {n}")


if __name__ == "__main__":
    main()
