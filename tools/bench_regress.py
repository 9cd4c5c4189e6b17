"""Bench regression gate: diff the two latest BENCH_r*.json snapshots.

The plans gate makes "plans I'd accept at 100x" self-enforcing; this does
the same for "no query got slower without a reason". It compares per-query
medians between the two most recent driver-recorded bench rounds and
reports:

- REGRESSION: > max(35%, 0.3 s) slower than the previous round — exits
  non-zero (the r4->r5 board showed zero regressions >10%, so 35% is far
  outside scheduler wobble on a warm median-of-3);
- new/removed queries (informational — coverage changes are deliberate).

The driver wraps bench output as {"n", "rc", "cpus", "sf", "tail",
"parsed"}; "parsed" is the JSON line when it parsed, else null with the
raw line in "tail" (the r5 truncation case) — per-query pairs are then
recovered with a regex, which tolerates a cut-off tail.

Usage:
    python tools/bench_regress.py                 # two latest BENCH_r*.json
    python tools/bench_regress.py A.json B.json   # explicit old new
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ABS_FLOOR_S = 0.3
REL_FLOOR = 0.35

# Known, deliberate slowdowns: query -> reason. Printed as WAIVED, not
# counted as failures. Keep entries only while the comparison window
# still spans the round that introduced the change, then delete.
WAIVERS: dict[str, str] = {
    # (r8's op-corpus-curate-full waiver rotated out in r10; r10's
    # op-tpch-q1 waiver — decimal money sums, a deliberate 0.29->0.76 s
    # correctness trade — and op-psi-drift waiver — r9/r10 container
    # small-query drift, isolated median 1.14 s bracketing in-batch —
    # both rotated out in r11 per the contract: the comparison window is
    # now r10 -> r11, BOTH sides of which already carry the r10 change,
    # so the waivers would only mask NEW regressions in those queries.)
}

# Classified non-regressions (VERDICT r8 task 5): op-tpch-q21 read
# 1.34->1.68 s (+25%) in the r8 batch with NO code change. Isolated
# re-run (r9, fresh session, warmup + 7 gc-separated runs at sf0.1):
# median 1.26 s, min 1.21 s — BELOW the r7 number, with one 1.81 s
# outlier in 7 runs. Cause: mid-batch scheduler/GC wobble on a ~1.5 s
# query, the same artifact class as bfs-91s-mid-batch in r8's scaling
# harness. Not waived — no code changed and the isolated median shows
# no regression to waive.
#
# r10 closure of the r9 flags (VERDICT r9 task 1): the three BENCH_r09
# regressions — op-dedup-fuzzy 1.70->3.07 s, op-line-dedup 0.91->1.36 s,
# op-tpch-q8 0.83->1.22 s, all on UNTOUCHED code — were the same class,
# and the measured cause is now pinned: inter-query accumulation of
# earlier queries' localCheckpoint blocks + py4j garbage in the shared
# bench session (the identical mechanism bench_scaling.py measured as
# bfs 91 s mid-batch vs 30 s isolated). Evidence: with per-query
# gc.collect() + System.gc() now in bench.py's loop (commit r10), the
# SAME 62-query batch at the same SF reads dedup-fuzzy 1.712 s,
# line-dedup 0.94 s, q8 0.807 s — i.e. AT or BELOW the r8 numbers —
# and isolated 7-run medians agree (1.885/1.014/0.817 s; q8 min 0.799).
# The judge's +15-27% "residual" (1.96/1.16/0.96 s) was measured in a
# session without the per-query System.gc and sits inside the isolated
# spread above (dedup-fuzzy ranged 1.73-2.49 s across 7 gc-separated
# runs). No waiver needed: nothing regressed; the gate's inputs were
# contaminated by session state, which the bench.py fix removes for
# both builder and driver runs.


def load_queries(path: str) -> dict[str, float]:
    """Per-query medians from a driver BENCH record or a raw bench line."""
    d = json.load(open(path))
    if isinstance(d, dict) and "queries" in d:  # raw bench.py output
        return {k: float(v) for k, v in d["queries"].items()}
    parsed = d.get("parsed")
    if parsed and "queries" in parsed:
        return {k: float(v) for k, v in parsed["queries"].items()}
    # truncated tail: recover what survives; the LAST pair may be cut
    # mid-number, which the regex naturally drops. Scope recovery to the
    # "queries" dict only — a tail that also carries "queries_min" would
    # otherwise have medians silently overwritten by the later per-query
    # minimums (last regex pair wins in the dict comprehension).
    tail = d.get("tail", "")
    m = re.search(r'"queries"\s*:\s*\{', tail)
    if m:
        tail = tail[m.end():]
        end = tail.find("}")
        if end != -1:
            tail = tail[:end]
    pairs = re.findall(r'"(op-[a-z0-9-]+)": ([0-9]+\.[0-9]+)', tail)
    return {k: float(v) for k, v in pairs}


def latest_two() -> tuple[str, str] | None:
    """Two most recent bench snapshots in measurement order.

    Two record kinds interleave (VERDICT r9 task 1b): the driver's
    post-round BENCH_rN.json and the builder's committed final-HEAD
    BENCH_HEAD_rN.json. The builder's round-N bench is measured at the
    END of round N — after the driver's round-(N-1) record, before the
    driver's round-N record — so order by 2*N for driver records and
    2*N - 1 for builder records (…, r9 -> 18, HEAD_r10 -> 19, r10 -> 20).
    This lets the gate run green at final HEAD instead of only after the
    driver's batch lands."""
    files = []
    for p in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            files.append((2 * int(m.group(1)), p))
    for p in glob.glob(os.path.join(REPO, "BENCH_HEAD_r*.json")):
        m = re.search(r"BENCH_HEAD_r(\d+)\.json$", p)
        if m:
            files.append((2 * int(m.group(1)) - 1, p))
    files.sort()
    if len(files) < 2:
        return None
    return files[-2][1], files[-1][1]


def _record(path: str) -> dict:
    """The parsed bench record (driver wrapper unwrapped), or {}."""
    d = json.load(open(path))
    if isinstance(d, dict) and "queries" in d:
        return d
    parsed = d.get("parsed") if isinstance(d, dict) else None
    return parsed if isinstance(parsed, dict) else {}


def load_probe(path: str) -> dict[str, float] | None:
    """Calibration-probe component timings from a bench record (r11+),
    or None for older records that predate the probe."""
    p = _record(path).get("probe")
    return {k: float(v) for k, v in p.items()} if p else None


def load_probes_list(path: str) -> list[dict[str, float]] | None:
    """Mid-batch probe samples (r12+ ``probes`` list: batch-start anchor
    plus a fast sample every ~15 queries, each with ``after`` = measured
    query count when it ran), or None for older records."""
    p = _record(path).get("probes")
    if not p:
        return None
    return [{k: float(v) for k, v in s.items()} for s in p]


def segment_pressure(
    probes: list[dict[str, float]] | None, pos: int
) -> float:
    """Mid-batch pressure at query position ``pos`` (its index in the
    record's execution-ordered ``queries`` dict), relative to the SAME
    batch's start anchor (VERDICT r11 task 1).

    The query is bracketed by the last sample at-or-before it and the
    first sample after it; the pressure is the MAX of the two bracketing
    samples' component-median ratios vs probes[0] — interference is
    one-sided (it only adds time) and the samples execute no engine
    code, so the max cannot launder a code regression, only machine
    pressure. Clamped like the global probe factor: [1.0, 2.0]."""
    if not probes or len(probes) < 2:
        return 1.0
    anchor = probes[0]
    before = max(
        (s for s in probes if s.get("after", 0) <= pos),
        key=lambda s: s.get("after", 0),
        default=anchor,
    )
    after = min(
        (s for s in probes if s.get("after", 0) > pos),
        key=lambda s: s.get("after", 0),
        default=probes[-1],
    )
    return max(
        probe_drift_factor(anchor, before), probe_drift_factor(anchor, after)
    )


def probe_drift_factor(
    old_probe: dict[str, float], new_probe: dict[str, float]
) -> float:
    """Container drift anchored OUTSIDE the gated query set (VERDICT r10
    task 2): the median new/old ratio across the probe's fixed-size
    components (cpu / shuffle / scan / python — none execute engine
    code). Because the probe cannot contain a code regression, a large
    ratio here is genuinely the machine, so the cap is looser than the
    self-referential estimator's: clamped to [1.0, 2.0]. Below 1.0 a
    faster container must never hide a real regression; above 2.0 the
    container is too different to normalize silently — the gate should
    fail and force an isolated look (tools/bench_isolated.py) rather
    than scale expectations by 3x. Median over components (not mean):
    r10 showed the python surface drifting 2x while JVM surfaces drifted
    1.3x, and most gated queries are JVM-dominated."""
    shared = sorted(
        k for k in old_probe if k in new_probe and k != "total" and old_probe[k] > 0
    )
    ratios = sorted(new_probe[k] / old_probe[k] for k in shared)
    if not ratios:
        return 1.0
    m = ratios[(len(ratios) - 1) // 2]
    return min(max(m, 1.0), 2.0)


def drift_factor(old: dict[str, float], new: dict[str, float]) -> float:
    """FALLBACK container-drift estimator for record pairs where either
    side predates the calibration probe: median new/old ratio over the
    shared queries themselves — the CONTAINER drift.

    The gate's purpose is to catch regressions the CODE caused, but the
    two records it compares almost never come from the same machine: the
    driver provisions a fresh container per round, and identical code
    measured 63.9 s (r9) vs 73.2 s (r7) vs 74.1 s (r10) on the same
    62-query batch — a ±15% whole-batch spread on untouched JVM-only
    queries (r10: tpch-q11 +61%, q16 +34%, text-fingerprint +68%, none
    of whose code or data changed; outputs hash-identical). A per-query
    threshold that ignores this compares apples on one host to oranges
    on another and flags noise — the 4th consecutive round of false
    positives. The median ratio is a robust whole-batch estimator (a
    real regression moves one query, not the median of 62); dividing it
    out makes the per-query threshold mean 'regressed RELATIVE to how
    this container runs everything else'. Clamped to >= 1.0 so a FASTER
    container never hides a real regression, and capped at 1.25 (the top
    of the observed honest cross-container spread) so a genuinely broad
    slowdown (every query 2x — e.g. a session-conf bug, which IS code)
    still fails the gate rather than being normalized away: 2x against a
    1.25-capped drift is +60% adjusted, well past the 35% threshold.
    Lower median (not upper) so a two-query record can't seed its own
    regression into the drift estimate."""
    shared = sorted(set(old) & set(new))
    ratios = sorted(new[k] / old[k] for k in shared if old[k] > 0)
    if not ratios:
        return 1.0
    m = ratios[(len(ratios) - 1) // 2]
    return min(max(m, 1.0), 1.25)


def compare(
    old: dict[str, float],
    new: dict[str, float],
    new_min: dict[str, float] | None = None,
    drift: float | None = None,
    new_probes: list[dict[str, float]] | None = None,
    old_probes: list[dict[str, float]] | None = None,
    retries: dict[str, float] | None = None,
    retries_min: dict[str, float] | None = None,
) -> tuple[list[str], list[str], list[str], float]:
    """(regressions, waived, watch, drift) — human-readable lines.

    ``drift`` is the probe-anchored factor when both records carry a
    calibration probe (preferred — engine-independent); None falls back
    to the self-referential query-median estimator.

    WATCH lines (r10 ADVICE): min-of-runs gating stacks with drift
    normalization, so a genuine 40-60% single-query regression can pass
    silently. Any query whose drift-adjusted MEDIAN delta exceeds the
    threshold while its MIN passes — or whose min sits in the
    35%-to-pass band — is printed (non-fatal) so borderline real
    regressions stay visible; the follow-up is an isolated 7-run median
    (tools/bench_isolated.py) logged in the round evidence.

    When the new record carries per-query minimums (builder --out files,
    r10+), the threshold tests the MIN: per-query medians on a shared
    local[32] box swing ±20-30% batch-to-batch (three consecutive
    final-HEAD batches flagged three DISJOINT sets of borderline
    queries), because scheduler/GC interference is one-sided — it only
    adds time. The min of the measured runs strips that noise; a real
    code regression raises the min just as it raises the median. The
    OLD side stays the median (driver records carry nothing else), so
    the comparison is conservative against false positives without
    going blind: the historical true regressions were 2x+, far past
    the min-vs-median gap (~10%).

    r12 additions (VERDICT r11 task 1, the round whose gate needed a
    judge to adjudicate 5 flags):

    - SEGMENT-local drift: when a record carries mid-batch probe
      samples (``probes``), each query's expectation is additionally
      scaled by the pressure its own batch SEGMENT measured
      (``segment_pressure``) — and symmetrically DIVIDED by the old
      record's segment pressure, so an old median inflated by old-batch
      pressure can't mask a real regression. Combined per-query factor
      clamped to [1.0, 3.0].
    - Deferred retries: when the new record carries ``retries`` (the
      bench's own isolated re-measurement of threshold-exceeding
      queries, minutes after the spike), the retry median/min join the
      min() pool for v_eff — a pressure spike re-measures healthy and
      clears itself; a real regression re-measures slow and stands.
      Retry-rescued queries print as WATCH, never silently green."""
    regressions, waived, watch = [], [], []
    m = drift_factor(old, new) if drift is None else drift
    pos_new = {k: i for i, k in enumerate(new)}
    pos_old = {k: i for i, k in enumerate(old)}
    for k, v in sorted(new.items()):
        if k not in old:
            continue
        cands = [v]
        if new_min and k in new_min:
            cands.append(new_min[k])
        retried = retries is not None and k in retries
        if retried:
            cands.append(retries[k])
            if retries_min and k in retries_min:
                cands.append(retries_min[k])
        v_eff = min(cands)
        p_new = segment_pressure(new_probes, pos_new[k])
        p_old = segment_pressure(old_probes, pos_old[k])
        m_k = min(max(m * p_new / p_old, 1.0), 3.0)
        o = old[k] * m_k  # container- and segment-normalized expectation
        fails = v_eff > o * (1 + REL_FLOOR) and v_eff - o > ABS_FLOOR_S
        line = (
            f"{k}: {old[k]:.2f}s -> {v:.2f}s"
            + (f" (min {v_eff:.2f}s)" if v_eff != v else "")
            + f" (+{(v_eff / old[k] - 1) * 100:.0f}%; "
            f"+{(v_eff / o - 1) * 100:.0f}% drift-adjusted)"
            + (
                f" [seg-pressure x{p_new / p_old:.2f}]"
                if abs(p_new / p_old - 1.0) > 0.05
                else ""
            )
            + (f" [retry {retries[k]:.2f}s]" if retried else "")
        )
        if fails:
            if k in WAIVERS:
                waived.append(f"{line} — waived: {WAIVERS[k]}")
            else:
                regressions.append(line)
        elif (
            # the median alone would have failed (the min rescued it), or
            # the min itself is inside the 35%-band but under the floors
            (v > o * (1 + REL_FLOOR) and v - o > ABS_FLOOR_S)
            or (v_eff > o * (1 + REL_FLOOR) and v_eff - o > ABS_FLOOR_S / 2)
        ):
            watch.append(line)
    return regressions, waived, watch, m


def main() -> int:
    if len(sys.argv) == 3:
        old_p, new_p = sys.argv[1], sys.argv[2]
    else:
        pair = latest_two()
        if pair is None:
            print("bench-regress: fewer than two BENCH_r*.json records; nothing to diff")
            return 0
        old_p, new_p = pair
    old, new = load_queries(old_p), load_queries(new_p)
    try:
        rec = _record(new_p)
        new_min = rec.get("queries_min")
        retries = rec.get("retries")
        retries_min = rec.get("retries_min")
    except Exception:
        new_min = retries = retries_min = None
    shared = sorted(set(old) & set(new))
    if not shared:
        print(
            f"bench-regress: no shared queries between "
            f"{os.path.basename(old_p)} and {os.path.basename(new_p)}"
        )
        return 0
    op, np_ = load_probe(old_p), load_probe(new_p)
    anchored = op is not None and np_ is not None
    drift_in = probe_drift_factor(op, np_) if anchored else None
    try:
        old_probes, new_probes = (
            load_probes_list(old_p),
            load_probes_list(new_p),
        )
    except Exception:
        old_probes = new_probes = None
    regs, waived, watch, drift = compare(
        old,
        new,
        new_min,
        drift_in,
        new_probes,
        old_probes,
        retries,
        retries_min,
    )
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    tot_old = sum(old[k] for k in shared)
    tot_new = sum(new[k] for k in shared)
    print(
        f"bench-regress: {os.path.basename(old_p)} -> {os.path.basename(new_p)}: "
        f"{len(shared)} shared, total {tot_old:.1f}s -> {tot_new:.1f}s, "
        f"container drift x{drift:.2f} ("
        + (
            "PROBE-anchored — engine-independent calibration components"
            if anchored
            else "query-median fallback; one side predates the probe"
        )
        + "; thresholds apply on top of it)"
    )
    if added:
        print(f"  new queries ({len(added)}): {', '.join(added[:8])}"
              + (" ..." if len(added) > 8 else ""))
    if removed:
        print(f"  removed queries ({len(removed)}): {', '.join(removed)}")
    for w in waived:
        print(f"  WAIVED {w}")
    for w in watch:
        print(
            f"  WATCH {w} — borderline (non-fatal); follow up with "
            f"tools/bench_isolated.py"
        )
    if regs:
        print(f"bench-regress FAILED ({len(regs)} regressions > "
              f"max({REL_FLOOR:.0%}, {ABS_FLOOR_S}s)):")
        for r in regs:
            print(f"  - {r}")
        return 1
    print("ok: no per-query regression beyond threshold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
