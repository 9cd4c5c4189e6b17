"""Probe-gated core-count scaling pair (VERDICT r12 task 6).

The r12 round's driver scaling block compared a 32-core batch measured
under ~2.5x neighbor pressure (probe 1.521) against an 8-core batch on a
quiet container (probe 0.619): 56 of 67 low/high-core ratios read <= 1.0
— that is the PRESSURE DELTA, not parallelism. The fix is measurement
hygiene: run both core counts back-to-back in one window and accept the
pair only when their engine-independent calibration probes agree.

This tool runs ``bench.py`` twice in subprocesses — SPARK_GRAFT_CPUS=32
then =8, same methodology and query list as the driver's own bench —
and gates the PAIR on the start probes: when the probe totals diverge
more than GATE (1.2x), the pair is re-run (bounded attempts), and the
final report says which pairs passed the gate. Output:

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
        rec_hi = run_bench(high)
        rec_lo = run_bench(low)
        p_hi = rec_hi["probe"]["total"]
        p_lo = rec_lo["probe"]["total"]
        ratio = max(p_hi, p_lo) / max(min(p_hi, p_lo), 1e-9)
        print(
            f"attempt {attempt}: probe c{high}={p_hi} c{low}={p_lo} "
            f"ratio {ratio:.3f} (gate {GATE})", file=sys.stderr,
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
        f"in one window; pair accepted only when the start probes agree "
        f"within {GATE}x (VERDICT r12 task 6 — the r12 pair's probes "
        f"differed 2.5x and its ratios measured neighbor pressure).",
        "",
        f"- probe c{high}: {rec_hi['probe']}",
        f"- probe c{low}: {rec_lo['probe']}",
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
