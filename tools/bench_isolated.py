"""Isolated per-query re-measurement: fresh session, warmup + 7
gc-separated runs, median/min per query, plus the calibration probe.

This is the follow-up the regression gate prescribes for any WATCH/flag
line (tools/bench_regress.py): in-batch timings carry one-sided
scheduler/GC interference from the 60+ queries that ran before, so a
borderline in-batch delta is settled by measuring the query ALONE in a
fresh JVM — the method that classified every flag in rounds 8-10 (e.g.
op-tpch-q21 1.68 s in-batch -> 1.26 s isolated, below the prior round).

The probe timings printed alongside let the reader drift-adjust the
medians against any other round's probe without re-deriving container
speed from engine queries.

Usage:
    python tools/bench_isolated.py op-a op-b ...   # at $SPARK_GRAFT_SF_DIR
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__  # noqa: E402,F401 — registers every query module
import bench  # noqa: E402 — force() + calibration_probe()
from etl_pipeline_api_spark.queries import QUERIES  # noqa: E402
from etl_pipeline_api_spark.session import get_spark  # noqa: E402

RUNS = 7


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    if not names:
        print("usage: python tools/bench_isolated.py <op-name> [...]")
        return 2
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {', '.join(unknown)}")
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-isolated")
    spark.range(1000).selectExpr("sum(id)").collect()
    bench.calibration_probe(spark)  # JIT pass (see bench.py)
    probe = bench.calibration_probe(spark)
    out: dict[str, dict[str, float]] = {}
    for name in names:
        fn = QUERIES[name]
        gc.collect()
        spark._jvm.System.gc()
        # TWO warmups (r12): the streaming drains showed a multi-run JIT
        # decay curve — a fresh session's first stateful drain reads
        # ~8.9 s, the second ~4.0 s, then stable 2.2-2.7 s (the micro-
        # batch engine, state store, and Arrow stateful-runner classes
        # all compile on the first drains). One warmup sampled the curve
        # mid-decay and produced r11's 2.2-8.6 s "variance"; two warmups
        # collapse the 7-run spread to <=1.3x. Batch queries reach
        # steady state on warmup 1 and are unaffected by warmup 2.
        bench.force(fn(spark, sf_dir))
        bench.force(fn(spark, sf_dir))
        runs = []
        for _ in range(RUNS):
            gc.collect()
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            bench.force(fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        runs.sort()
        out[name] = {
            "median": round(runs[len(runs) // 2], 3),
            "min": round(runs[0], 3),
            "max": round(runs[-1], 3),
        }
        print(f"isolated {name}: median {out[name]['median']}s "
              f"min {out[name]['min']}s max {out[name]['max']}s",
              file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "runs": RUNS,
                      "probe": probe, "queries": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
