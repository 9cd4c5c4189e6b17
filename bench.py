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

import pandas as pd  # module-level: the probe udf's type hints resolve here

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


def calibration_probe(spark, fast: bool = False) -> dict[str, float]:
    """Engine-independent container-speed probe (VERDICT r10 task 2).

    The regression gate compares bench records from DIFFERENT containers
    (±15-25% honest spread), so it normalizes by a drift factor — but a
    drift estimated from the median of the very queries being gated can
    launder a genuinely uniform code regression (a session-conf bug that
    slows everything 20% looks exactly like a slow container). This probe
    is the absolute anchor: four fixed-size workloads that touch the four
    machine surfaces the queries depend on, none of which execute any
    engine code — so their round-over-round ratio measures the CONTAINER,
    and only the container.

      - cpu:     whole-stage-codegen arithmetic over range(64M) — JVM
                 codegen + core clock
      - shuffle: groupBy-agg over range(4M) % 4096 keys — exchange write/
                 read + hash agg
      - scan:    parquet scan+agg of a 2M-row file the probe itself wrote
                 (content deterministic from range(); write untimed) —
                 columnar reader + page decode + local disk
      - python:  Arrow-batched pandas_udf over 1M rows — Python worker
                 fork/reuse + Arrow serialization (the surface container
                 drift hits hardest; r10 showed Python paths drifting
                 2x when JVM paths drifted 1.3x)

    Each component is min-of-5 after one warmup: interference noise is
    one-sided, so the min estimates the container's floor (measured
    steady-state spread of the min across repeated probes: ~5%, vs ~20%
    for single runs). Total budget ~3 s. Recorded in every bench line;
    tools/bench_regress.py derives its drift factor from probe ratios
    when both records carry one.

    ``fast=True`` is the MID-BATCH sample variant (VERDICT r11 task 1):
    no per-component warmup (everything is compiled and the workers are
    up by then) and min-of-2 instead of min-of-5 — ~1 s total. Its
    round-over-round ratio against the batch-START anchor measures the
    PRESSURE this container developed mid-batch, which the start-only
    probe was blind to (r11: two batches with identical start probes
    differed 24% in total)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    probe_dir = os.path.join("/tmp", "bench_probe_parquet")
    if not os.path.exists(os.path.join(probe_dir, "_SUCCESS")):
        (
            spark.range(2_000_000)
            .select(
                F.col("id"),
                (F.col("id") % 997).alias("k"),
                (F.col("id") * 0.5).alias("v"),
            )
            .coalesce(4)
            .write.mode("overwrite")
            .parquet(probe_dir)
        )

    @pandas_udf("double")
    def _probe_py(s: pd.Series) -> pd.Series:
        return s * 1.5 + 1.0

    workloads = {
        "cpu": lambda: spark.range(64_000_000)
        .selectExpr("sum(id * 3 + (id % 7)) AS s")
        .collect(),
        "shuffle": lambda: spark.range(4_000_000)
        .select((F.col("id") % 4096).alias("k"), F.col("id").alias("v"))
        .groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .selectExpr("sum(s)", "sum(n)")
        .collect(),
        "scan": lambda: spark.read.parquet(probe_dir)
        .selectExpr("sum(v)", "sum(k)", "count(*)")
        .collect(),
        "python": lambda: spark.range(1_000_000)
        .select(_probe_py(F.col("id").cast("double")).alias("p"))
        .selectExpr("sum(p)")
        .collect(),
    }
    probe: dict[str, float] = {}
    n_runs = 2 if fast else 5
    for name, fn in workloads.items():
        if not fast:
            fn()  # warmup (codegen compile / worker spin-up / page cache)
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn()
            runs.append(time.perf_counter() - t0)
        probe[name] = round(min(runs), 4)
    probe["total"] = round(sum(v for k, v in probe.items() if k != "total"), 4)
    return probe


def retry_suspects(
    timings: dict[str, float],
    timings_min: dict[str, float],
    prev: dict[str, float],
    drift: float,
    rel_floor: float,
    abs_floor: float,
    cap: int = 8,
) -> list[str]:
    """Queries whose fresh median AND min both exceed the regression-gate
    threshold against the previous committed record — the deferred-retry
    trigger (VERDICT r11 task 1). Pure so the gate semantics are unit-
    testable without a session; insertion (execution) order preserved,
    bounded at ``cap`` so a genuinely broad regression still finishes
    (its flags stand un-retried)."""
    out = []
    for n, v in timings.items():
        if n not in prev:
            continue
        v_eff = min(v, timings_min.get(n, v))
        exp = prev[n] * drift
        if v_eff > exp * (1 + rel_floor) and v_eff - exp > abs_floor:
            out.append(n)
    return out[:cap]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = None
    spark = get_spark("bench")

    # JVM/codegen warmup on a trivial plan so q1 doesn't pay session startup
    spark.range(1000).selectExpr("sum(id)").collect()

    # container-speed anchor, measured BEFORE the query batch so a
    # mid-batch engine problem can't contaminate it. Two passes, keep the
    # second: the first pass's cpu component is ~2x inflated by JIT
    # tiering even after its own per-component warmup (measured), and the
    # steady-state pass is the one whose round-over-round ratio means
    # "this container vs last round's container".
    calibration_probe(spark)
    probe = calibration_probe(spark)

    # One warmup run + THREE measured runs per query, reporting the MEDIAN
    # (plus min, for the floor): with ~40 sub-second queries a ±0.3 s
    # scheduler wobble on a single measured run is indistinguishable from a
    # real regression — the median makes round-over-round comparisons mean
    # something. Steady-state regime as before (codegen compiled, Python
    # workers up, file index cached).
    # Failure-isolated: one broken query reports {"err": ...} for itself and
    # the run continues — a single analysis error must never zero out the
    # whole round's perf evidence (the r3 lesson).
    # Mid-batch pressure samples (VERDICT r11 task 1): a fast probe
    # every PROBE_EVERY queries plus one at batch end. Each entry
    # carries "after" = how many queries had been MEASURED when the
    # sample ran, so tools/bench_regress.py can bracket every query
    # between two samples (positions index the record's "queries" dict,
    # which preserves execution order) and adjust it by SEGMENT-local
    # drift instead of the batch-start anchor alone.
    PROBE_EVERY = 15
    probes: list[dict[str, float]] = [dict(probe, after=0)]

    timings: dict[str, float] = {}
    timings_min: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in BENCH_QUERIES:
        if timings and len(timings) % PROBE_EVERY == 0 and probes[-1]["after"] != len(timings):
            probes.append(
                dict(calibration_probe(spark, fast=True), after=len(timings))
            )
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
    if probes[-1]["after"] != len(timings):
        probes.append(
            dict(calibration_probe(spark, fast=True), after=len(timings))
        )

    # Deferred self-adjudication pass (VERDICT r11 task 1, the spiky
    # half): the r11 execution-order ratios show the five flagged
    # queries spiked 1.6-3.4x while their NEIGHBORS drifted only
    # 1.1-1.3x — one-sided interference narrower than any probe
    # segment, which no amount of probe interleaving can see. What
    # cleared four of the five was the judge's isolated re-runs; this
    # makes the bench itself perform them. Against the latest COMMITTED
    # bench record, any query whose fresh median AND min both exceed
    # the gate threshold (same REL/ABS floors, probe-anchored drift) is
    # re-measured minutes later — gc-separated warmup + 3 runs — and
    # the retry median/min land in the record for bench_regress to
    # prefer. A real code regression re-measures just as slow; a
    # pressure spike has moved on. Bounded at 8 retries so a genuinely
    # broad regression still finishes (its flags stand un-retried).
    retries: dict[str, float] = {}
    retries_min: dict[str, float] = {}
    try:
        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools")
        )
        import bench_regress as _br

        pair = _br.latest_two()
        # the committed records are measured at the driver SF — a run at
        # any other SF has nothing comparable to retry against
        same_sf = pair is not None and _br._record(pair[1]).get("sf") == sf
        prev = _br.load_queries(pair[1]) if same_sf else {}
        prev_probe = _br.load_probe(pair[1]) if same_sf else None
        drift = (
            _br.probe_drift_factor(prev_probe, probe) if prev_probe else 1.0
        )
        suspects = retry_suspects(
            timings, timings_min, prev, drift, _br.REL_FLOOR, _br.ABS_FLOOR_S
        )
        for name in suspects:
            fn = QUERIES[name]
            gc.collect()
            spark._jvm.System.gc()
            force(fn(spark, sf_dir))  # warmup
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                force(fn(spark, sf_dir))
                runs.append(time.perf_counter() - t0)
            runs.sort()
            retries[name] = round(runs[1], 3)
            retries_min[name] = round(runs[0], 3)
            print(
                f"bench: retry {name}: batch {timings[name]}s -> "
                f"isolated median {retries[name]}s min {retries_min[name]}s",
                file=sys.stderr,
            )
    except Exception as e:  # noqa: BLE001 — the retry pass is advisory
        print(f"bench: retry pass skipped: {e}", file=sys.stderr)

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        # scalar floor only — a second 51-entry per-query dict made the
        # line long enough that the driver's r5 tail capture truncated it
        "value_min": round(sum(timings_min.values()), 3),
        "sf": sf,
        # engine-independent container-speed anchor (VERDICT r10 task 2):
        # five floats — short enough for the driver's tail capture
        "probe": probe,
        # mid-batch pressure samples (VERDICT r11 task 1): ~5 entries of
        # six floats each — bench_regress brackets each query between
        # two samples and applies segment-local drift
        "probes": probes,
    }
    if retries:
        # deferred isolated re-measurements of threshold-exceeding
        # queries (usually empty; bounded at 8 entries)
        out["retries"] = retries
        out["retries_min"] = retries_min
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
