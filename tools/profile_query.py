"""Per-query driver/executor time split for optimization triage (r12 opt).

For each named query, after the bench_isolated warmup protocol (2 warmups,
gc-separated runs), times SEPARATELY:

- t_build: the ``fn(spark, sf_dir)`` call itself — pure driver work
  (DataFrame graph construction + any INTERNAL actions the query runs:
  iterative collects, counts, streaming drains). For queries that are one
  lazy plan this is milliseconds; for iterative/multi-action queries it is
  most of the wall-clock and the noop force at the end only pays the
  final plan.
- t_force: the noop sink write of the returned frame (analysis +
  optimization + execution of the FINAL plan only).

The split tells you which lever applies (guide §1.2): a t_build-dominated
query needs fewer/cheaper internal actions (overlap independent jobs,
lazy instead of eager checkpoints, fewer rounds); a t_force-dominated one
needs a better final plan (shuffles/joins/UDF boundary).

Usage: python tools/profile_query.py op-a op-b ...   # at $SPARK_GRAFT_SF_DIR
"""

from __future__ import annotations

import gc
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__  # noqa: E402,F401 — registers every query module
import bench  # noqa: E402
from etl_pipeline_api_spark.queries import QUERIES  # noqa: E402
from etl_pipeline_api_spark.session import get_spark  # noqa: E402

RUNS = 5


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    unknown = [n for n in names if n not in QUERIES]
    if not names or unknown:
        print(f"usage: profile_query.py <op-name> [...]; unknown={unknown}")
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-query")
    spark.range(1000).selectExpr("sum(id)").collect()
    bench.calibration_probe(spark)
    probe = bench.calibration_probe(spark)
    print(f"probe total {probe['total']}s  {probe}")
    from etl_pipeline_api_spark.plans import corpus as _corpus

    for name in names:
        fn = QUERIES[name]
        gc.collect()
        spark._jvm.System.gc()
        bench.force(fn(spark, sf_dir))
        bench.force(fn(spark, sf_dir))
        memo0 = dict(_corpus.MEMO_STATS)
        rows = []
        for _ in range(RUNS):
            gc.collect()
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            bench.force(df)
            t2 = time.perf_counter()
            rows.append((t1 - t0, t2 - t1, t2 - t0))
        rows.sort(key=lambda r: r[2])
        b, f, t = rows[len(rows) // 2]
        # curate-prefix memo participation (VERDICT r12 task 9): hits in
        # the TIMED runs mean those medians exclude prefix cost — any
        # perf claim built on them must say so
        dh = _corpus.MEMO_STATS["hits"] - memo0["hits"]
        dm = _corpus.MEMO_STATS["misses"] - memo0["misses"]
        memo_note = f" [curate-prefix memo: {dh} hits / {dm} misses in timed runs]" if dh or dm else ""
        print(
            f"{name}: total {t:.3f}s = build {b:.3f}s + force {f:.3f}s "
            f"(min total {rows[0][2]:.3f}, max {rows[-1][2]:.3f}){memo_note}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
