"""Benchmark harness (driver contract: one JSON line on stdout).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints

    {"metric": "headline_queries_total", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Each query is forced end-to-end with a noop sink (full computation on
executors, no driver collect — the number measures the engine, not py4j
row transfer).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# __spark_entry__ imports EVERY query-registering module (it is the
# driver contract, so it can never be allowed to drift) — reusing it
# here means bench.py cannot miss a newly added module the way a
# hand-maintained import list did (r6: queries_rel17 missing KeyError'd
# the whole bench).
import __spark_entry__  # noqa: E402,F401
from etl_pipeline_api_spark.queries import BENCH_QUERIES, QUERIES  # noqa: E402
from etl_pipeline_api_spark.session import get_spark  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = None
    spark = get_spark("bench")

    # JVM/codegen warmup on a trivial plan so q1 doesn't pay session startup
    spark.range(1000).selectExpr("sum(id)").collect()

    # One warmup run + THREE measured runs per query, reporting the MEDIAN
    # (plus min, for the floor): with ~40 sub-second queries a ±0.3 s
    # scheduler wobble on a single measured run is indistinguishable from a
    # real regression — the median makes round-over-round comparisons mean
    # something. Steady-state regime as before (codegen compiled, Python
    # workers up, file index cached).
    # Failure-isolated: one broken query reports {"err": ...} for itself and
    # the run continues — a single analysis error must never zero out the
    # whole round's perf evidence (the r3 lesson).
    timings: dict[str, float] = {}
    timings_min: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in BENCH_QUERIES:
        try:
            # inside the try: an unregistered name (a missing module
            # import) must report as that query's error, not kill the
            # whole bench before a single timing is emitted
            fn = QUERIES[name]
            # Per-query GC before the warmup (the bench_scaling lesson,
            # ported per VERDICT r9 task 1): a shared session accumulates
            # earlier queries' localCheckpoint blocks and py4j garbage,
            # and later SMALL queries pay the eviction/GC mid-measurement
            # — the wobble class behind three consecutive rounds of false
            # bench-regress flags (q21 r8, dedup-fuzzy/line-dedup/q8 r9).
            gc.collect()
            spark._jvm.System.gc()
            force(fn(spark, sf_dir))  # warmup
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                force(fn(spark, sf_dir))
                runs.append(time.perf_counter() - t0)
            runs.sort()
            timings[name] = round(runs[1], 3)
            timings_min[name] = round(runs[0], 3)
        except Exception as e:  # noqa: BLE001 — report, don't die
            errors[name] = f"{type(e).__name__}: {e}"[:300]
            print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        # scalar floor only — a second 51-entry per-query dict made the
        # line long enough that the driver's r5 tail capture truncated it
        "value_min": round(sum(timings_min.values()), 3),
        "sf": sf,
    }
    if errors:
        # the total sums only the queries that ran — flag it so a failing
        # round can't masquerade as a faster one
        out["errors"] = errors
        out["partial"] = True
    line = json.dumps(out)
    print(line)
    # Builder-side snapshot (VERDICT r9 task 1b): `--out BENCH_HEAD_rN.json`
    # writes the same record to a file the builder commits at final HEAD,
    # so tools/bench_regress.py can gate driver-r(N-1) -> builder-rN BEFORE
    # the round ends instead of turning red on the driver's post-round
    # batch. Opt-in only — the driver's own invocation must never dirty
    # the working tree.
    if "--out" in sys.argv:
        # the FILE record additionally carries per-query minimums —
        # scheduler/GC noise is one-sided (it only ever ADDS time), so
        # min-of-runs is the low-noise estimator tools/bench_regress.py
        # prefers for the NEW side of a comparison. Only in the file:
        # the stdout line must stay short enough for the driver's tail
        # capture (the r5 truncation).
        out["queries_min"] = timings_min
        with open(sys.argv[sys.argv.index("--out") + 1], "w") as f:
            f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
