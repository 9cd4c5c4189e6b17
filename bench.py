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

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_pipeline_api_spark.queries import BENCH_QUERIES, QUERIES  # noqa: E402
import etl_pipeline_api_spark.queries_ext  # noqa: E402,F401  (registers extension queries)
import etl_pipeline_api_spark.queries_rel  # noqa: E402,F401  (registers relational-breadth queries)
import etl_pipeline_api_spark.queries_rel2  # noqa: E402,F401  (registers second breadth batch)
import etl_pipeline_api_spark.queries_corpus  # noqa: E402,F401  (registers corpus-curation batch 2)
import etl_pipeline_api_spark.queries_corpus2  # noqa: E402,F401  (registers corpus-layout batch 3)
import etl_pipeline_api_spark.queries_rel3  # noqa: E402,F401  (registers relational batch 3)
import etl_pipeline_api_spark.queries_rel4  # noqa: E402,F401  (registers relational batch 4)
import etl_pipeline_api_spark.queries_layout  # noqa: E402,F401  (registers physical-layout queries)
import etl_pipeline_api_spark.queries_rel5  # noqa: E402,F401  (registers relational batch 5)
import etl_pipeline_api_spark.queries_corpus3  # noqa: E402,F401  (registers corpus-quality batch 4)
import etl_pipeline_api_spark.queries_corpus4  # noqa: E402,F401  (registers corpus batch 5)
import etl_pipeline_api_spark.queries_rel6  # noqa: E402,F401  (registers relational batch 6)
import etl_pipeline_api_spark.queries_rel7  # noqa: E402,F401  (registers relational batch 7)
import etl_pipeline_api_spark.queries_rel8  # noqa: E402,F401  (registers relational batch 8)
import etl_pipeline_api_spark.queries_rel9  # noqa: E402,F401  (registers relational batch 9)
import etl_pipeline_api_spark.queries_rel10  # noqa: E402,F401  (registers relational batch 10)
import etl_pipeline_api_spark.queries_rel11  # noqa: E402,F401  (registers relational batch 11)
import etl_pipeline_api_spark.queries_rel12  # noqa: E402,F401  (registers relational batch 12)
import etl_pipeline_api_spark.queries_rel13  # noqa: E402,F401  (registers relational batch 13)
import etl_pipeline_api_spark.queries_rel14  # noqa: E402,F401  (registers relational batch 14)
import etl_pipeline_api_spark.queries_rel15  # noqa: E402,F401  (registers relational batch 15)
import etl_pipeline_api_spark.queries_rel16  # noqa: E402,F401  (registers relational batch 16)
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
        fn = QUERIES[name]
        try:
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
    print(json.dumps(out))


if __name__ == "__main__":
    main()
