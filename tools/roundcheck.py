"""Round-start drift check: compare /root/testdata parquet physical schemas
against the recorded expectations in tools/testdata_schemas.json.

The round driver owns the testdata and can regenerate it between rounds
with CHANGED physical types — that exact event (events.ts int64-nanos →
timestamp[us] between rounds 2 and 3) silently broke three operators and
the whole bench. Run this FIRST each round:

    python tools/roundcheck.py            # compare, exit 1 on drift
    python tools/roundcheck.py --record   # re-record current schemas

On drift: every consumer of the drifted column must branch on the actual
dtype (see queries._t / streaming.events.normalize_event_ts and
tests/test_ts_canary.py), then re-record.
"""

from __future__ import annotations

import json
import os
import sys

import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
RECORD = os.path.join(HERE, "testdata_schemas.json")
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def snapshot() -> dict[str, dict[str, str]]:
    out: dict[str, dict[str, str]] = {}
    for sf in SF_DIRS:
        if not os.path.isdir(sf):
            continue
        for t in TABLES:
            p = os.path.join(sf, f"{t}.parquet")
            if not os.path.exists(p):
                continue
            s = pq.read_schema(p)
            out.setdefault(t, {})
            key = os.path.basename(sf)
            out[t][key] = ", ".join(f"{f.name}:{f.type}" for f in s)
    return out


def main() -> int:
    cur = snapshot()
    if "--record" in sys.argv:
        with open(RECORD, "w") as f:
            json.dump(cur, f, indent=1, sort_keys=True)
        print(f"recorded {sum(len(v) for v in cur.values())} schemas -> {RECORD}")
        return 0
    if not os.path.exists(RECORD):
        print(f"no record at {RECORD}; run with --record first")
        return 1
    want = json.load(open(RECORD))
    drift = []
    for t, sfs in cur.items():
        for sf, schema in sfs.items():
            old = want.get(t, {}).get(sf)
            if old is None:
                drift.append(f"NEW   {t}@{sf}: {schema}")
            elif old != schema:
                drift.append(f"DRIFT {t}@{sf}:\n  was {old}\n  now {schema}")
    for t, sfs in want.items():
        for sf in sfs:
            if sf not in cur.get(t, {}):
                drift.append(f"GONE  {t}@{sf}")
    if drift:
        print("\n".join(drift))
        print(f"\n{len(drift)} drift(s) — audit every consumer, then --record")
        return 1
    print(f"ok: {sum(len(v) for v in cur.values())} schemas match the record")
    return 0


if __name__ == "__main__":
    sys.exit(main())
