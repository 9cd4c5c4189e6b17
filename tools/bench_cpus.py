"""Probe-gated core-count scaling pair (VERDICT r12 task 6).

The r12 round's driver scaling block compared a 32-core batch measured
under ~2.5x neighbor pressure (probe 1.521) against an 8-core batch on a
quiet container (probe 0.619): 56 of 67 low/high-core ratios read <= 1.0
— that is the PRESSURE DELTA, not parallelism. The fix is measurement
hygiene: run both core counts back-to-back in one window and accept the
pair only when their engine-independent calibration probes agree.

This tool runs ``bench.py`` twice in subprocesses — SPARK_GRAFT_CPUS=32
then =8, same methodology and query list as the driver's own bench —
and gates the PAIR on REFERENCE probes measured at a FIXED core count
(local[4]) immediately before each bench run: the in-bench probes are
core-count-sensitive (the fixed-size workloads run ~30% faster on 8
cores than 32 — fewer, larger tasks, less scheduler overhead — measured
0.58-0.60 at c8 vs 0.79-0.92 at c32 on a quiet host), so only
equal-configuration probes compare containers. When the two reference
probes diverge more than GATE (1.2x), the pair is re-run (bounded
attempts), and the final report says whether the pair passed. Output:

- plans/<tag>/BENCH_cpus32.json / BENCH_cpus8.json — the raw records
  (full bench lines, probes and mid-batch samples included);
- BENCH_CPUS.md — per-query t(low)/t(high) ratios with the probe
  context. Ratios ~1 now genuinely mean "serial at this size"; at sf0.1
  with sub-second queries most of the separation is scheduler overhead,
  which the report notes.

Usage:
    python tools/bench_cpus.py            # 32 vs 8, <=2 attempts
    BENCH_CPUS_HIGH=32 BENCH_CPUS_LOW=8 BENCH_CPUS_ATTEMPTS=2 \
        python tools/bench_cpus.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE = 1.2


_REF_PROBE_SRC = """
import json, sys
sys.path.insert(0, {repo!r})
import bench
from etl_pipeline_api_spark.session import get_spark
spark = get_spark("cpus-ref-probe", cpus=4)
spark.range(1000).selectExpr("sum(id)").collect()
bench.calibration_probe(spark)
print("REF_PROBE " + json.dumps(bench.calibration_probe(spark)))
"""


def ref_probe() -> dict:
    """Ambient-pressure reference: the calibration probe at a FIXED
    local[4] — comparable across the pair regardless of each bench run's
    own core count."""
    out = subprocess.run(
        [sys.executable, "-c", _REF_PROBE_SRC.format(repo=REPO)],
        capture_output=True, text=True, cwd=REPO,
    )
    line = [
        ln for ln in out.stdout.splitlines() if ln.startswith("REF_PROBE ")
    ][-1]
    return json.loads(line[len("REF_PROBE "):])


def run_bench(cpus: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    rec = json.loads(line)
    rec["cpus"] = cpus
    return rec


def main() -> int:
    high = int(os.environ.get("BENCH_CPUS_HIGH", "32"))
    low = int(os.environ.get("BENCH_CPUS_LOW", "8"))
    attempts = int(os.environ.get("BENCH_CPUS_ATTEMPTS", "2"))
    tag = os.environ.get("PLANS_TAG", "r13")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    best: tuple[float, dict, dict] | None = None
    gated = False
    for attempt in range(1, attempts + 1):
        ref_hi = ref_probe()
        rec_hi = run_bench(high)
        ref_lo = ref_probe()
        rec_lo = run_bench(low)
        rec_hi["ref_probe"] = ref_hi
        rec_lo["ref_probe"] = ref_lo
        p_hi, p_lo = ref_hi["total"], ref_lo["total"]
        ratio = max(p_hi, p_lo) / max(min(p_hi, p_lo), 1e-9)
        print(
            f"attempt {attempt}: ref probe before c{high}={p_hi} before "
            f"c{low}={p_lo} ratio {ratio:.3f} (gate {GATE}; in-bench "
            f"probes {rec_hi['probe']['total']} / {rec_lo['probe']['total']}"
            f" are core-count-shaped, informative only)",
            file=sys.stderr,
        )
        if best is None or ratio < best[0]:
            best = (ratio, rec_hi, rec_lo)
        if ratio <= GATE:
            gated = True
            break
    assert best is not None
    ratio, rec_hi, rec_lo = best
    with open(os.path.join(out_dir, f"BENCH_cpus{high}.json"), "w") as f:
        json.dump(rec_hi, f)
    with open(os.path.join(out_dir, f"BENCH_cpus{low}.json"), "w") as f:
        json.dump(rec_lo, f)
    lines = [
        "# Core-count scaling, probe-gated pair",
        "",
        f"`bench.py` at `local[{high}]` then `local[{low}]`, back-to-back "
        f"in one window; pair accepted only when the fixed-core (local[4]) "
        f"REFERENCE probes taken immediately before each run agree within "
        f"{GATE}x (VERDICT r12 task 6 — the r12 pair's probes differed "
        f"2.5x and its ratios measured neighbor pressure; in-bench probes "
        f"are core-count-shaped and not pair-comparable).",
        "",
        f"- ref probe before c{high}: {rec_hi['ref_probe']}",
        f"- ref probe before c{low}: {rec_lo['ref_probe']}",
        f"- in-bench probes (informative): c{high} {rec_hi['probe']}, "
        f"c{low} {rec_lo['probe']}",
        f"- probe ratio: {ratio:.3f} — **gate {'PASSED' if gated else 'FAILED (best attempt shown)'}**",
        f"- totals: c{high} {rec_hi['value']}s vs c{low} {rec_lo['value']}s",
        "",
        "At sf0.1 most queries are sub-second: low/high separation below "
        "~1.3x is scheduler/session overhead, not serialism. Read the "
        "heavy (>1.5 s) rows for the parallelism signal.",
        "",
        f"| query | c{high} s | c{low} s | low/high |",
        "|---|---|---|---|",
    ]
    qh, ql = rec_hi["queries"], rec_lo["queries"]
    for name in qh:
        if name in ql:
            r = ql[name] / max(qh[name], 1e-9)
            lines.append(f"| {name} | {qh[name]} | {ql[name]} | {r:.2f} |")
    md = os.path.join(out_dir, "BENCH_CPUS.md")
    with open(md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {md} (gate {'passed' if gated else 'FAILED'})")
    return 0 if gated else 1


if __name__ == "__main__":
    raise SystemExit(main())
