"""Scaling-curve bench: the same headline queries at sf0.1 AND sf1 (10×).

A single-point bench can hide a superlinear operator (it looks identical
at one scale factor); this runs the heavy/representative set at both
scale points and reports the sf1/sf0.1 runtime ratio per query. With a
10× data factor on 32 local cores:

- ratio ≲ 12×: linear-or-better (small constants amortize; AQE coalesce
  shifts work between task counts — anything near 10 is healthy);
- 12× < ratio ≤ 15×: WATCH — re-read the plan at sf1;
- ratio > 15×: SUPERLINEAR — a plan fix or a documented output-size
  cause is required (the gate treats it as a defect).

Deliberately excluded: op-dedup-embedding* / op-sim-search-lsh at the
repo's 0.4 cosine test threshold — at d=64, packing 10× more unit
vectors makes the ≥0.4 PAIR OUTPUT itself grow superlinearly (geometry,
not plan; see tools/gen_scale.py). Their scale story is the recall-gated
LSH/IVF paths whose candidate sets are banded by construction.

Known output-driven superlinears (documented, not plan defects — each
has a measured linear scale path):

- op-dedup-fuzzy: the EXACT shared-shingle pair baseline. Candidates are
  Θ(Σ_shingle df²); the synthetic corpus has a bounded ~30-word vocab,
  so df grows with the corpus and candidates grow quadratically. On real
  corpora vocabulary grows too, but the op is still the exactness
  baseline, not the scale path — that is op-dedup-minhash (banded LSH,
  measured ~10× at 10× data), plus the max_df stop-shingle guard the
  operator exposes for hot keys.

Usage:
    python tools/gen_scale.py          # once: builds ./testdata_sf1
    python tools/bench_scaling.py      # all queries -> BENCH_SCALING.md
    python tools/bench_scaling.py op-a op-b   # subset (results accumulate
        in .scratch/scaling_results.jsonl; the md is rebuilt from the
        latest result per query, so long runs can be split across calls)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", os.path.join(REPO, "testdata_sf1"))
DATA_FACTOR = 10.0
WATCH, SUPER = 12.0, 15.0

QUERIES_TO_SCALE = [
    # heaviest from the round-5 board
    "op-corpus-curate-full", "op-bootstrap-ci", "op-graph-bfs",
    "op-pagerank", "op-corpus-curate", "op-dedup-minhash",
    "op-tpch-q21", "op-span-dup-stats", "op-interval-overlap",
    # join/agg representatives + verdict watch-list
    "op-tpch-q7", "op-tpch-q9", "op-dedup-fuzzy", "op-sessionize",
    "op-groupby-sum", "op-line-dedup", "op-decontaminate",
    # new partsupp shape (constant fan-out build must stay linear)
    "op-tpch-q2",
    # exact top-k ANN baseline (broadcast queries, linear corpus pass)
    "op-sim-search",
    # round-6 determinism fixes: the localCheckpoint pin adds a full
    # materialization to the range-exchange ops, and simhash gained the
    # max_bucket guard — verify each stays linear at 10x
    "op-row-index", "op-peak-concurrency", "op-dedup-simhash",
]

# query -> documented output-driven cause; reported but not counted as a
# plan defect (see module docstring)
EXPECTED_SUPERLINEAR = {
    "op-dedup-fuzzy": "exact shared-shingle baseline: candidates are "
                      "Θ(Σ df²), quadratic under the corpus's bounded "
                      "vocab; scale path = op-dedup-minhash (banded LSH, "
                      "~10× measured) + the operator's max_df guard.",
}


def force(df) -> None:
    """Execute the full plan on executors WITHOUT materializing to the
    driver (same noop sink as bench.py): for near-full-table outputs
    (op-row-index is ~500k wide rows at sf1) a .collect() would measure
    py4j row transfer, not the plan, and risks driver OOM at sf1."""
    df.write.format("noop").mode("overwrite").save()


def median3(fn) -> float:
    force(fn())  # warmup (scans cached, codegen jitted)
    ts = []
    for _ in range(3):
        t0 = time.time()
        force(fn())
        ts.append(time.time() - t0)
    return sorted(ts)[1]


RESULTS = os.path.join(REPO, ".scratch", "scaling_results.jsonl")


def read_prev_ratios(path: str) -> dict[str, float]:
    """Parse the prior committed BENCH_SCALING.md table so each refresh
    records the round-over-round ratio delta — a superlinear regression
    shows up the round it lands, not at the next manual read."""
    import re as _re

    prev: dict[str, float] = {}
    if not os.path.exists(path):
        return prev
    for line in open(path):
        m = _re.match(
            r"\|\s*(op-[a-z0-9-]+)\s*\|[^|]*\|[^|]*\|\s*([0-9.]+)x", line
        )
        if m:
            prev[m.group(1)] = float(m.group(2))
    return prev


def write_md() -> dict[str, dict]:
    acc: dict[str, dict] = {}
    if os.path.exists(RESULTS):
        for line in open(RESULTS):
            rec = json.loads(line)
            acc[rec["name"]] = rec  # latest wins
    rows = [acc[n] for n in QUERIES_TO_SCALE if n in acc]
    out = os.path.join(REPO, "BENCH_SCALING.md")
    prev = read_prev_ratios(out)
    with open(out, "w") as f:
        f.write(
            "# Scaling curve: sf0.1 -> sf1 (10x data) on local[32]\n\n"
            "Generated by tools/bench_scaling.py over ./testdata_sf1 "
            "(tools/gen_scale.py replication; see its docstring for why\n"
            "distributions, join fan-outs and dup densities scale ~linearly). "
            "Median-of-3 after warmup, one shared session, noop-sink forced "
            "(no driver collect).\n\n"
            f"Thresholds: watch > {WATCH}x, SUPERLINEAR > {SUPER}x "
            f"(data factor {DATA_FACTOR:.0f}x). Queries with a documented "
            "output-driven cause are marked `by-output`. The Δ column is "
            "the ratio change vs the previous committed table.\n\n"
            "| query | sf0.1 (s) | sf1 (s) | ratio | Δ prev | verdict |\n"
            "|---|---|---|---|---|---|\n"
        )
        for r in rows:
            d = (
                f"{r['ratio'] - prev[r['name']]:+.1f}"
                if r["name"] in prev else "new"
            )
            f.write(
                f"| {r['name']} | {r['t_small']:.2f} | {r['t_big']:.2f} "
                f"| {r['ratio']:.1f}x | {d} | {r['verdict']} |\n"
            )
        defects = [r for r in rows if r["verdict"] == "SUPERLINEAR"]
        byout = [r for r in rows if r["verdict"] == "superlinear-by-output"]
        noted = [r for r in rows
                 if r["name"] in EXPECTED_SUPERLINEAR and r["ratio"] > WATCH]
        if noted:
            f.write("\nDocumented output-driven growth:\n\n")
            for r in noted:
                f.write(f"- **{r['name']}** ({r['ratio']:.1f}x): "
                        f"{EXPECTED_SUPERLINEAR[r['name']]}\n")
        if rows:
            worst = max(rows, key=lambda x: x["ratio"])
            f.write(
                f"\nWorst ratio: **{worst['name']} at {worst['ratio']:.1f}x**. "
                f"{len(defects)} superlinear plan defect(s), {len(byout)} "
                "documented output-driven, "
                f"{sum(1 for r in rows if r['verdict'] == 'watch')} watch, "
                f"{sum(1 for r in rows if r['verdict'] == 'linear-or-better')} "
                f"linear-or-better of {len(rows)} "
                f"({len(QUERIES_TO_SCALE)} planned).\n"
            )
    return acc


def main() -> int:
    if not os.path.isdir(SF1):
        print(f"missing {SF1}; run tools/gen_scale.py first")
        return 1
    import __spark_entry__ as entry
    from etl_pipeline_api_spark.session import get_spark

    names = sys.argv[1:] or QUERIES_TO_SCALE
    spark = get_spark("bench_scaling")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    for name in names:
        fn = qs[name]
        t_small = median3(lambda: fn(spark, SF01))
        t_big = median3(lambda: fn(spark, SF1))
        ratio = t_big / t_small if t_small > 0 else float("inf")
        verdict = (
            ("superlinear-by-output" if name in EXPECTED_SUPERLINEAR
             else "SUPERLINEAR") if ratio > SUPER
            else "watch" if ratio > WATCH
            else "linear-or-better"
        )
        rec = {"name": name, "t_small": round(t_small, 3),
               "t_big": round(t_big, 3), "ratio": round(ratio, 2),
               "verdict": verdict}
        with open(RESULTS, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"{name}: {t_small:.2f}s -> {t_big:.2f}s  x{ratio:.1f}  {verdict}")

    acc = write_md()
    print(f"wrote BENCH_SCALING.md ({len(acc)}/{len(QUERIES_TO_SCALE)} measured)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
