"""Adversarial-events fuzz sweep (r9, VERDICT r8 task 7): the behavioral
family (sessionization, funnels, attribution, retention, windows, time
series — 70+ oracle queries touch ONLY the events table) was the largest
un-fuzzed surface. This module seeds a PATHOLOGICAL events fixture — the
events-table analogues of the r8 documents fuzz traps:

- duplicate timestamps, including equal-µs pairs STRADDLING a session
  boundary (the sessionize tiebreak is (us, event_id) on both sides);
- gaps exactly AT the 30-min session threshold (oracle uses strictly
  `>`, so gap == 1800000000 µs is the SAME session) and 1 µs past it;
- single-event users (zero-duration sessions, degenerate inter-event
  stats, 1-row windows);
- conversion-before-touch orderings (purchase precedes every view/click)
  and same-µs funnel steps (strict `>` step ordering must reject them);
- µs window edges: events exactly at 5-min/1-h boundaries and 1 µs on
  either side, plus a day rollover at 23:59:59.999999 → 00:00:00;
- event_ids DESCENDING against ts ascending (any op that orders by id
  as a proxy for time diverges);
- value pathologies: 0.0, negative, 1e15, exact ties (argmax/percentile
  /ntile tiebreaks);
- exact duplicate rows except event_id (stream-dedup bait) and empty
  '{}' props (JSON extraction NULL path).

The fixture is written as a FLAT parquet file with timestamp[us] — the
driver's events layout — so the file-stream queries stay in scope, and
every events-only oracle query runs through the SAME Spark-vs-DuckDB
comparison the driver gate uses (tools/check_correctness.canon).
Divergences are either fixed in the engine or pinned here as documented
semantic deltas (the 0774b7d template).
"""

from __future__ import annotations

import datetime as dt
import re
import sys
from pathlib import Path

import pytest

from conftest import sweep_params

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from check_correctness import TABLES, canon  # noqa: E402

SRC = "/root/testdata/sf0.001"

# Queries excluded from the events fuzz sweep, each with the reason on
# record. An entry here is a DOCUMENTED semantic delta or contract
# boundary, not a silent hole.
FUZZ_SKIP: dict[str, str] = {}

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
US = dt.timedelta(microseconds=1)
MIN = dt.timedelta(minutes=1)
GAP = dt.timedelta(minutes=30)  # the sessionize threshold


def _event_rows():
    """(event_id, ts, user_id, event_type, value, props) rows. event_ids
    are assigned per-row below (user 10's run DESCENDING against ts)."""
    r: list[tuple[dt.datetime, int, str, float]] = []

    # user 1: single event — zero-duration session, no inter-event gaps
    r += [(T0 + 10 * MIN, 1, "view", 5.0)]

    # user 2: equal-µs pair, purchase FIRST by event_id — zero-duration
    # 2-event session; funnel strict > must not chain same-µs steps
    r += [(T0 + 60 * MIN, 2, "purchase", 100.0),
          (T0 + 60 * MIN, 2, "view", 1.0)]

    # user 3: gap EXACTLY 30 min twice (same session, oracle `>`), one
    # gap of 30 min + 1 µs (new session)
    r += [(T0, 3, "view", 1.0),
          (T0 + GAP, 3, "click", 2.0),
          (T0 + 2 * GAP + US, 3, "view", 3.0),
          (T0 + 3 * GAP + US, 3, "purchase", 4.0)]

    # user 4: equal-µs pairs straddling a session boundary
    r += [(T0, 4, "view", 1.0),
          (T0, 4, "click", 2.0),
          (T0 + GAP + US, 4, "view", 3.0),
          (T0 + GAP + US, 4, "purchase", 4.0)]

    # user 5: conversion before every touch (attribution orphan), then a
    # second purchase after the touches
    r += [(T0, 5, "purchase", 50.0),
          (T0 + 1 * MIN, 5, "click", 0.0),
          (T0 + 2 * MIN, 5, "view", 0.0),
          (T0 + 3 * MIN, 5, "purchase", 75.0)]

    # user 6: same-µs funnel steps — view=click at T0 (click must NOT
    # count), click at +1µs (counts), purchase at +1µs (same µs as the
    # counting click — must NOT count), purchase at +2µs (counts)
    r += [(T0, 6, "view", 1.0),
          (T0, 6, "click", 1.0),
          (T0 + US, 6, "click", 1.0),
          (T0 + US, 6, "purchase", 1.0),
          (T0 + 2 * US, 6, "purchase", 9.0)]

    # user 7: µs window edges (5-min and 1-h tumbling boundaries)
    r += [(T0 + 5 * MIN - US, 7, "view", 1.0),
          (T0 + 5 * MIN, 7, "view", 2.0),
          (T0 + 5 * MIN + US, 7, "click", 3.0),
          (T0 + 60 * MIN - US, 7, "view", 4.0),
          (T0 + 60 * MIN, 7, "purchase", 5.0),
          (T0 + 60 * MIN + US, 7, "error", 6.0)]

    # user 8: value pathologies — zero, negative, huge, exact ties.
    # 1e12, NOT 1e15: ulp(1e15) = 0.125, so mixed-magnitude sums differ
    # between engines at the 2nd decimal purely by summation order (the
    # initial sweep measured .125-vs-.25 diffs on 13 queries) — the same
    # finite-precision knife edge the r8 embedding fixture documents;
    # ulp(1e12) ~ 1.2e-4 keeps every 2-decimal rounding exact
    r += [(T0 + i * MIN, 8, t, v) for i, (t, v) in enumerate([
        ("purchase", 0.0), ("error", -1e6), ("purchase", 1e12),
        ("signup", 3.14), ("purchase", 3.14), ("purchase", 3.14)])]

    # user 9: day rollover at µs precision (retention/day buckets)
    r += [(dt.datetime(2024, 1, 1, 23, 59, 59, 999999), 9, "purchase", 10.0),
          (dt.datetime(2024, 1, 2, 0, 0, 0), 9, "view", 1.0),
          (dt.datetime(2024, 1, 3, 0, 0, 0), 9, "purchase", 20.0)]

    # user 10: event_ids run DESCENDING against ts (assigned below)
    u10 = [(T0 + i * MIN, 10, ["view", "click", "purchase"][i % 3],
            float(i)) for i in range(6)]

    # exact duplicate rows except event_id (stream-dedup bait)
    dup = [(T0 + 7 * MIN, 11, "view", 2.5), (T0 + 7 * MIN, 11, "view", 2.5)]

    rows = []
    eid = 0
    for ts, uid, typ, val in r:
        rows.append((eid, ts, uid, typ, val, '{"k": %d}' % (eid % 5)))
        eid += 1
    # user 10: ids descend as ts ascends
    ids10 = list(range(eid, eid + len(u10)))[::-1]
    for (ts, uid, typ, val), i in zip(u10, ids10):
        rows.append((i, ts, uid, typ, val, "{}"))
    eid += len(u10)
    for ts, uid, typ, val in dup:
        rows.append((eid, ts, uid, typ, val, '{"k": 0}'))
        eid += 1
    return rows


@pytest.fixture(scope="module")
def fuzz_dir(spark, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("fuzz_events_sf")
    for t in TABLES:
        if t == "events":
            continue
        (
            spark.read.parquet(f"{SRC}/{t}.parquet")
            .limit(0)
            .coalesce(1)
            .write.parquet(str(d / f"{t}.parquet"))
        )
    rows = _event_rows()
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string()),
    })
    # FLAT file, timestamp[us] — the driver's events layout (TESTDATA.md),
    # so readStream file sources and DuckDB read the identical bytes
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


def _table_mentions(sql: str) -> set[str]:
    return {t for t in TABLES if re.search(rf"\b{t}\b", sql)}


def _fuzz_names():
    """All oracle-bearing queries whose SQL touches ONLY the events
    table. Computed dynamically so new behavioral queries join the
    sweep for free."""
    import __spark_entry__ as m

    names = []
    for name, sql in sorted(m.oracle_sql().items()):
        if _table_mentions(sql) == {"events"} and name not in FUZZ_SKIP:
            names.append(name)
    return names


@pytest.mark.parametrize("name", sweep_params(_fuzz_names()))
def test_fuzz_events_query_matches_oracle(spark, fuzz_dir, name):
    import duckdb

    import __spark_entry__ as m

    spdf = m.queries()[name](spark, fuzz_dir).toPandas()
    con = duckdb.connect()
    try:
        for t in TABLES:
            p = Path(fuzz_dir) / f"{t}.parquet"
            src = str(p) if p.is_file() else f"{p}/*.parquet"
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
            )
        dpdf = con.sql(m.oracle_sql()[name]).df()
    finally:
        con.close()
    assert sorted(spdf.columns) == sorted(dpdf.columns), (
        f"{name}: column mismatch spark={sorted(spdf.columns)} "
        f"duckdb={sorted(dpdf.columns)}"
    )
    slines, dlines = canon(spdf), canon(dpdf)
    assert slines == dlines, (
        f"{name}: {len(slines)} spark rows vs {len(dlines)} oracle rows; "
        f"spark-only={sorted(set(slines) - set(dlines))[:3]} "
        f"duck-only={sorted(set(dlines) - set(slines))[:3]}"
    )


def test_fuzz_events_inventory_pinned():
    """Auto-enrollment guard (VERDICT r9 task 8): _fuzz_names() is
    computed dynamically, so a regex or registry breakage that silently
    returned [] would make the parametrized sweep collect ZERO tests and
    pass vacuously. Pin the floor at the r9 count (72) — the sweep can
    only grow — and require every FUZZ_SKIP entry (none today) to name a
    registered query with a written rationale."""
    import __spark_entry__ as m

    names = _fuzz_names()
    assert len(names) >= 72, f"events fuzz sweep shrank to {len(names)}"
    registered = set(m.oracle_sql())
    for k, why in FUZZ_SKIP.items():
        assert k in registered, f"FUZZ_SKIP names unknown query {k}"
        assert len(why) > 40, f"FUZZ_SKIP[{k}] lacks a real rationale"
