"""Local proxy for the driver's correctness gate — VANILLA session edition.

Round-1 lesson: two whole classes of driver failures (PARQUET_TYPE_ILLEGAL on
nanos timestamps; DuckDB HUGEINT -> pandas float64 hash mismatches) were
invisible locally because this proxy used the session.py-configured
SparkSession and DuckDB ``fetchall()`` (Python ints). The driver does neither:
it builds a bare SparkSession and compares PANDAS frames, sorting every column
(which also crashes on array cells). This proxy now mirrors that exactly:

- vanilla ``SparkSession.builder.master("local[4]").getOrCreate()`` — NO
  session.py confs; queries must be self-sufficient.
- Spark results via ``toPandas()``, oracle results via duckdb ``.df()`` —
  dtype differences (int64 vs float64) are mismatches, as at the gate.
- canonicalization = sort columns by name, ``df.sort_values(all columns)``
  (raises on unhashable/array cells, as at the gate), then a dtype-aware
  cell normalization (floats format as .6f, ints as ints).

Usage: python tools/check_correctness.py [name ...]
       CHECK_SF_DIR=/root/testdata/sf0.1 python tools/check_correctness.py
(the env override runs the same Spark-vs-DuckDB parity at another scale
factor — the per-round FULLSWEEP records both sf0.01 and sf0.1, closing
the "right at sf0.01, subtly wrong under sf0.1 AQE behavior" window)
"""

from __future__ import annotations

import math
import os
import sys
import time

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v) -> str:
    import datetime

    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "NULL"
        # float formatting keeps the int/float dtype distinction visible:
        # int64 0 -> "0", float64 0.0 -> "0.000000" (the HUGEINT trap)
        return f"{float(v):.6f}"
    if isinstance(v, (bool, np.bool_)):
        return str(int(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        ts = pd.Timestamp(v)
        # DuckDB reads DATE as datetime64 midnight while Spark yields date
        # objects; the round-1 gate treated those as equal — collapse here too
        if ts.normalize() == ts and ts.tz is None:
            return ts.date().isoformat()
        return ts.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def canon(pdf):
    """The driver's canonicalization shape: sort columns by name, then sort
    rows over ALL columns (pandas lexsort — crashes on list/array cells
    exactly like the gate), then normalized cell strings."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns))
    return [
        "\x1f".join(norm_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]


def main(names: list[str]) -> int:
    import duckdb
    from pyspark.sql import SparkSession

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    # Vanilla on purpose — see module docstring. Do NOT add session.py confs.
    # CHECK_DRIVER_MEM / CHECK_CORES exist ONLY for above-gate-scale runs
    # (sf1 spot checks: 6M-row lineitem does not fit the default 1g heap —
    # the JVM dies and every later query reports ConnectionRefused); left
    # unset, the session is exactly the driver's.
    builder = SparkSession.builder.master(
        f"local[{os.environ.get('CHECK_CORES', '4')}]"
    ).appName("vanilla-gate-proxy")
    if os.environ.get("CHECK_DRIVER_MEM"):
        builder = builder.config(
            "spark.driver.memory", os.environ["CHECK_DRIVER_MEM"]
        )
    spark = builder.getOrCreate()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, oracles = entry.queries(), entry.oracle_sql()
    names = names or sorted(qs)
    failed = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            spdf = sdf.toPandas()
            slines = canon(spdf)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark/canon error: {type(e).__name__}: {e}")
            failed.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok*   {name}: rows-only (no oracle), {len(slines)} rows [{dt:.1f}s]")
            continue
        try:
            dpdf = con.sql(oracles[name]).df()
            dlines = canon(dpdf)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb/canon error: {type(e).__name__}: {e}")
            failed.append(name)
            continue
        problems = []
        if len(slines) != len(dlines):
            problems.append(f"rowcount spark={len(slines)} duckdb={len(dlines)}")
        if sorted(spdf.columns) != sorted(dpdf.columns):
            problems.append(
                f"cols spark={sorted(spdf.columns)} duckdb={sorted(dpdf.columns)}"
            )
        elif slines != dlines:
            problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{dt:.1f}s]")
            if "value-hash mismatch" in problems:
                sset, dset = set(slines), set(dlines)
                print(f"      spark-only: {sorted(sset - dset)[:3]}")
                print(f"      duck-only : {sorted(dset - sset)[:3]}")
            failed.append(name)
        else:
            print(f"ok    {name}: {len(slines)} rows match [{dt:.1f}s]")
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    if failed:
        print("failed:", " ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
