"""Deterministic sf1 testdata: 10× scaled replication of the driver's sf0.1.

The container has no network (DuckDB's tpch extension can't download), so
sf1 is built by key-shifted replication of /root/testdata/sf0.1 — the right
tool for its one purpose: measuring the SCALING CURVE (sf1/sf0.1 runtime
ratios) of the engine's headline queries, where what matters is that row
counts, join fan-outs, group cardinalities, and dup/similarity densities
grow ~linearly, exactly like a real 10× corpus:

- TPC-H tables: copy k (0..9) shifts every key by k·(max_key+1); dates,
  prices, and dimension tables (region/nation) are shared. Join
  selectivities and per-key group sizes are preserved; key-derived name
  strings are regenerated from the new key so distinct-counts scale.
- documents: doc_id shifts; for k>0 a copy marker token is spliced into the
  text every 7 words. Shingle-level similarity between copies drops below
  every dedup threshold in the repo, so near-dup pair counts scale
  linearly (10 independent corpora) instead of quadratically (10 mirrors),
  which is the honest shape for a 10× corpus.
- embeddings: vec_id shifts; copy k applies a seeded dimension permutation
  + sign flips — an orthogonal map, so every WITHIN-copy cosine (cluster
  structure, pair sets, kNN graphs) is preserved exactly, while cross-copy
  cosines fall to the random-unit-vector floor (|cos| ~ 1/√d). NB at d=64
  that floor still yields some pairs above the repo's 0.4 test threshold —
  an intrinsic property of packing 10× more vectors into 64 dims, so
  pair-output ops are expected to grow superlinearly in OUTPUT (not plan)
  terms at this threshold.
- events: event_id/user_id shift, timestamps/props shared.

Output: ./testdata_sf1/*.parquet (gitignored — regenerate with
`python tools/gen_scale.py`). Deterministic: same bytes every run.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("GEN_SRC", "/root/testdata/sf0.1")
DST = os.environ.get(
    "GEN_DST",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata_sf1"),
)
K = int(os.environ.get("GEN_COPIES", "10"))
# marker namespace: when re-replicating an ALREADY-replicated corpus
# (sf1 -> sf10) the default "copytoken" markers are already present in the
# source text — reusing them would give different sf10 copies shared
# marker shingles; a fresh prefix keeps cross-copy similarity at the floor
MARKER = os.environ.get("GEN_MARKER_PREFIX", "copytoken")


def gen_tpch(con: duckdb.DuckDBPyConnection) -> None:
    maxes = {}
    for t, key in [
        ("customer", "c_custkey"), ("supplier", "s_suppkey"),
        ("part", "p_partkey"), ("orders", "o_orderkey"),
    ]:
        maxes[t] = con.execute(
            f"SELECT max({key}) + 1 FROM '{SRC}/{t}.parquet'"
        ).fetchone()[0]

    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet' (FORMAT parquet)"
        )

    copies = ", ".join(str(k) for k in range(K))
    plans = {
        "customer": f"""
            SELECT c_custkey + k.k * {maxes['customer']} AS c_custkey,
                   'Customer#' || lpad(CAST(c_custkey + k.k * {maxes['customer']} AS VARCHAR), 9, '0') AS c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM '{SRC}/customer.parquet', (SELECT unnest([{copies}]) AS k) k""",
        "supplier": f"""
            SELECT s_suppkey + k.k * {maxes['supplier']} AS s_suppkey,
                   'Supplier#' || lpad(CAST(s_suppkey + k.k * {maxes['supplier']} AS VARCHAR), 9, '0') AS s_name,
                   s_nationkey, s_acctbal
            FROM '{SRC}/supplier.parquet', (SELECT unnest([{copies}]) AS k) k""",
        "part": f"""
            SELECT p_partkey + k.k * {maxes['part']} AS p_partkey,
                   p_name, p_brand, p_type, p_size, p_retailprice
            FROM '{SRC}/part.parquet', (SELECT unnest([{copies}]) AS k) k""",
        "orders": f"""
            SELECT o_orderkey + k.k * {maxes['orders']} AS o_orderkey,
                   o_custkey + k.k * {maxes['customer']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM '{SRC}/orders.parquet', (SELECT unnest([{copies}]) AS k) k""",
        "lineitem": f"""
            SELECT l_orderkey + k.k * {maxes['orders']} AS l_orderkey,
                   l_partkey + k.k * {maxes['part']} AS l_partkey,
                   l_suppkey + k.k * {maxes['supplier']} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM '{SRC}/lineitem.parquet', (SELECT unnest([{copies}]) AS k) k""",
    }
    for t, sql in plans.items():
        con.execute(f"COPY ({sql}) TO '{DST}/{t}.parquet' (FORMAT parquet)")
        print(f"  {t}: done")


def gen_events(con: duckdb.DuckDBPyConnection) -> None:
    max_e = con.execute(f"SELECT max(event_id) + 1 FROM '{SRC}/events.parquet'").fetchone()[0]
    max_u = con.execute(f"SELECT max(user_id) + 1 FROM '{SRC}/events.parquet'").fetchone()[0]
    copies = ", ".join(str(k) for k in range(K))
    con.execute(f"""
        COPY (
          SELECT event_id + k.k * {max_e} AS event_id, ts,
                 user_id + k.k * {max_u} AS user_id, event_type, value, props
          FROM '{SRC}/events.parquet', (SELECT unnest([{copies}]) AS k) k
        ) TO '{DST}/events.parquet' (FORMAT parquet)""")
    print("  events: done")


def _splice(text: str, marker: str) -> str:
    words = text.split(" ")
    out = []
    for i, w in enumerate(words):
        if i and i % 7 == 0:
            out.append(marker)
        out.append(w)
    return " ".join(out)


def gen_documents() -> None:
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    max_id = int(pa.compute.max(t["doc_id"]).as_py()) + 1
    parts = [t]
    texts0 = t["text"].to_pylist()
    for k in range(1, K):
        marker = f"{MARKER}{k}"
        texts = [None if x is None else _splice(x, marker) for x in texts0]
        arr_text = pa.array(texts, type=pa.string())
        parts.append(pa.table({
            "doc_id": pa.compute.add(t["doc_id"], k * max_id),
            "text": arr_text,
            "lang": t["lang"],
            "source": t["source"],
            "n_chars": pa.compute.cast(
                pa.compute.utf8_length(arr_text), pa.int64()
            ),
        }, schema=t.schema))
    pq.write_table(pa.concat_tables(parts), os.path.join(DST, "documents.parquet"))
    print("  documents: done")


def gen_embeddings() -> None:
    t = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    max_id = int(pa.compute.max(t["vec_id"]).as_py()) + 1
    emb = np.asarray(t["embedding"].to_pylist(), dtype=np.float32)
    n, d = emb.shape
    parts = [t]
    for k in range(1, K):
        rng = np.random.RandomState(k)
        perm = rng.permutation(d)
        signs = rng.choice([-1.0, 1.0], size=d).astype(np.float32)
        mapped = emb[:, perm] * signs
        parts.append(pa.table({
            "vec_id": pa.compute.add(t["vec_id"], k * max_id),
            "embedding": pa.array(list(mapped), type=t.schema.field("embedding").type),
            "label": t["label"],
        }, schema=t.schema))
    pq.write_table(pa.concat_tables(parts), os.path.join(DST, "embeddings.parquet"))
    print("  embeddings: done")


def main() -> int:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    print(f"generating {K}x replication {SRC} -> {DST}")
    gen_tpch(con)
    gen_events(con)
    gen_documents()
    gen_embeddings()
    for f in sorted(os.listdir(DST)):
        sz = os.path.getsize(os.path.join(DST, f))
        print(f"  {f}: {sz/1e6:.1f} MB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
