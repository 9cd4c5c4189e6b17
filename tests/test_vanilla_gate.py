"""Regression guard for the round-1 failure class: queries must work on a
VANILLA SparkSession (the driver's correctness harness sets none of
session.py's confs) and survive the driver's pandas canonicalizer.

Runs tools/check_correctness.py in a SUBPROCESS (a fresh, unconfigured JVM —
in-process the tests' session confs would leak) over one representative per
bug class found in round 1:

- nanos timestamps  (op-count-distinct reads events.parquet)   -> PARQUET_TYPE_ILLEGAL class
- DuckDB HUGEINT    (op-dq-suite SUM(CASE) counts)             -> dtype hash-mismatch class
- array columns     (op-multimodal-decode features)            -> unsortable-cell class
- streaming source  (op-stream-window-agg reads events stream)
- date vs timestamp (op-date-funcs DATE canonicalization)
- NTZ epoch-µs gap math (op-sessionize start/end bounds + durations)

The FULL sweep (all ~170 queries, ~6 min) is the pre-commit step documented
in .claude/skills/verify/SKILL.md; this test keeps the bug classes from
regressing at pytest cost (~1 min).
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

SUBSET = [
    "op-count-distinct",
    "op-dq-suite",
    "op-multimodal-decode",
    "op-stream-window-agg",
    "op-date-funcs",
    # round-5 class: NTZ epoch-µs window math + exposed timestamp bounds
    "op-sessionize",
    # round-5 second wave: decimal-widened deterministic resampling,
    # generated-literal oracle (projection matrix), and the versioned
    # table's atomic-commit filesystem layer
    "op-bootstrap-ci",
    "op-random-project",
    "op-table-versioned",
]


def test_vanilla_session_gate_subset():
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "check_correctness.py"), *SUBSET],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"vanilla-session gate proxy failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-2000:]}"
    )
    assert f"{len(SUBSET)}/{len(SUBSET)} passed" in proc.stdout
