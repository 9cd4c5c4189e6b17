"""Dump ``.explain("formatted")`` for named queries into plans/r13/.

Usage:
    python tools/dump_plans.py before op-a op-b ...
    python tools/dump_plans.py after  op-a op-b ...

Writes plans/r13/<query>_<tag>.txt at $SPARK_GRAFT_SF_DIR (default sf0.1).
The formatted explain covers the FINAL returned frame (the noop-forced
plan the bench times); queries with internal actions additionally note
that in their OPTIMIZATION_r13.md entry.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__  # noqa: E402,F401
from etl_pipeline_api_spark.queries import QUERIES  # noqa: E402
from etl_pipeline_api_spark.session import get_spark  # noqa: E402


def main() -> int:
    if len(sys.argv) < 3:
        print("usage: dump_plans.py <tag> <op-name> [...]")
        return 2
    tag = sys.argv[1]
    names = sys.argv[2:]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", os.environ.get("PLANS_TAG", "r13"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    import contextlib
    import io

    for name in names:
        df = QUERIES[name](spark, sf_dir)
        # public API with stdout capture (ADVICE r12: the earlier
        # _jvm.PythonSQLUtils.explainString path is private and brittle
        # across Spark versions)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        plan = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
