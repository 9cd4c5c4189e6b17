"""Adversarial-relational fuzz sweep (r10, VERDICT r9 task 4): the
TPC-H/relational family (~86 oracle queries over region/nation/customer/
supplier/part/orders/lineitem) rode well-formed generator data only.
This module seeds a PATHOLOGICAL relational fixture — the relational
analogues of the r8 documents / r9 events fuzz traps:

- NULL join keys on BOTH sides (c_nationkey, o_custkey, l_orderkey,
  l_partkey, l_suppkey): equi-joins must drop them identically in both
  engines, and outer/anti shapes must keep them identically;
- ORPHAN foreign keys (nation→missing region, orders→missing customer,
  lineitem→missing order/part/supplier);
- DUPLICATE primary keys (region 2 twice, customer 3 twice, an exactly
  duplicated lineitem row) — joins must fan out deterministically;
- zero / negative / 1e12 prices, quantities and balances (1e12 NOT 1e15:
  ulp(1e15)=0.125 makes mixed-magnitude sums engine-order-visible at 2
  decimals — the r9 events-fuzz lesson, scaling-bench-hygiene memory);
- date boundaries: rows exactly AT common filter edges (1994-01-01,
  1995-03-15, 1998-12-01), 1 µs before midnight of the next year, the
  1996-02-29 leap day, and the TPC-H epoch 1992-01-01;
- customers with no orders (q13/q22 left-join zero class), parts with
  no lineitem, NULL text fields (names, segments, statuses, types);
- exact value TIES across group keys (argmax/topk tiebreaks).

Every relational-only oracle query runs through the SAME Spark-vs-DuckDB
comparison the driver gate uses (tools/check_correctness.canon).
Divergences are fixed in the engine or pinned in FUZZ_SKIP as documented
semantic deltas (the 0774b7d template). A second EMPTY-DIMENSION sweep
re-runs the part/supplier-touching queries with those two tables at zero
rows (schema-correct): scalar subqueries go NULL, joins go empty — both
engines must agree on the degenerate shapes too.
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
REL = {"region", "nation", "customer", "supplier", "part", "orders",
       "lineitem"}

# Queries excluded from the relational fuzz sweep, each with the reason
# on record. An entry here is a DOCUMENTED semantic delta or contract
# boundary, not a silent hole.
FUZZ_SKIP: dict[str, str] = {
    "op-time-travel-diff": (
        "table_diff's contract (operators/dq.py) requires UNIQUE key_cols "
        "per snapshot — the keyed-diff precondition shared with SQL MERGE "
        "and Delta/Iceberg snapshot diffs. This fixture's duplicate "
        "o_orderkey=108 fans the full-outer join out to the per-key cross "
        "product (2 cross-pairs classify as 'changed'), while the oracle "
        "counts by key parity assuming uniqueness. Deterministic and "
        "documented, not a defect; key uniqueness is validated upstream "
        "with DQSuite when the source can't promise it."
    ),
}

# Queries excluded from the ALL-EMPTY sweep only (they run in the main
# pathological sweep): one documented Spark-vs-ANSI semantic delta.
ALL_EMPTY_SKIP: dict[str, str] = {
    k: (
        "Spark implements grouping sets via the Expand operator — rows "
        "are replicated per grouping set BEFORE aggregation, so ZERO "
        "input rows expand to zero rows and even the global () grouping "
        "set emits nothing. ANSI (and DuckDB/Postgres) treat the () set "
        "as a scalar aggregate: one row on empty input. A plain "
        "groupBy().agg() DOES emit the row in Spark — only the "
        "Expand-based cube/rollup/grouping-sets path differs. Pinned by "
        "test_spark_grouping_sets_empty_input_semantics below so a Spark "
        "version change flips loudly."
    )
    for k in ("op-cube", "op-rollup", "op-grouping-sets")
}

D = dt.datetime


def _region_rows():
    return [
        (0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
        (4, "MIDDLE EAST"),
        (2, "ASIA"),      # exact duplicate primary key row
        (5, None),        # NULL name
    ]


def _nation_rows():
    return [
        (0, "ALGERIA", 0), (1, "ARGENTINA", 1), (2, "BRAZIL", 1),
        (3, "CANADA", 1), (4, "EGYPT", 4), (5, "ETHIOPIA", 0),
        (6, "FRANCE", 3), (7, "GERMANY", 3), (8, "INDIA", 2),
        (9, "INDONESIA", 2), (10, "JAPAN", 2), (11, "UNITED STATES", 1),
        (97, "ORPHANIA", 99),    # orphan region key
        (98, "NULLANDIA", None),  # NULL region key
    ]


def _customer_rows():
    # (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
    return [
        (1, "Customer#1", 6, 711.56, "BUILDING"),
        (2, "Customer#2", 7, 121.65, "AUTOMOBILE"),
        (3, "Customer#3", 8, 7498.12, "BUILDING"),
        (3, "Customer#3-dup", 8, 7498.12, "BUILDING"),  # duplicate PK
        (4, "Customer#4", 9, -272.60, "MACHINERY"),     # negative balance
        (5, "Customer#5", 10, 0.0, "HOUSEHOLD"),        # zero balance
        (6, "Customer#6", None, 5755.94, "BUILDING"),   # NULL nation key
        (7, "Customer#7", 6, None, "AUTOMOBILE"),       # NULL balance
        (8, "Customer#8", 11, 6819.74, None),           # NULL segment
        (9, "Customer#9-noorders", 2, 8324.07, "BUILDING"),  # no orders
        (10, None, 1, 2753.54, "FURNITURE"),            # NULL name
        (11, "Customer#11", 99, 100.0, "BUILDING"),     # orphan nation 99
    ]


def _orders_rows():
    # (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
    #  o_orderpriority)
    return [
        (100, 1, "O", 173665.47, D(1996, 1, 2), "5-LOW"),
        (101, 2, "O", 46929.18, D(1996, 12, 1), "1-URGENT"),
        (102, 3, "F", 193846.25, D(1992, 1, 1), "5-LOW"),   # TPC-H epoch
        (103, 3, "F", 32151.78, D(1994, 1, 1), "2-HIGH"),   # filter edge
        # 1 µs before the next year: a `< '1995-01-01'` timestamp filter
        # keeps it, a date-cast comparison also keeps it — engines must
        # agree either way
        (104, 4, "F", 144659.20, D(1994, 12, 31, 23, 59, 59, 999999),
         "3-MEDIUM"),
        (105, 5, "P", 0.0, D(1996, 2, 29), "4-NOT SPECIFIED"),  # leap day
        (106, 6, "O", -999.99, D(1995, 3, 15), "1-URGENT"),  # q3 edge
        (107, 7, "F", 1e12, D(1993, 7, 1), "2-HIGH"),        # huge price
        (108, 8, "O", 25009.00, D(1998, 12, 1), "5-LOW"),    # q4/q1 edge
        (108, 1, "F", 25009.00, D(1998, 12, 1), "5-LOW"),    # duplicate PK
        (109, 999, "O", 555.55, D(1997, 6, 15), "1-URGENT"),  # orphan cust
        (110, None, "O", 777.77, D(1997, 6, 15), "1-URGENT"),  # NULL cust
        (111, 10, None, 111.11, None, None),  # NULL status/date/priority
        (112, 11, "F", 46929.18, D(1995, 1, 1), "1-URGENT"),  # tie price
    ]


def _lineitem_rows():
    # (l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
    #  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
    #  l_shipdate)
    rows = [
        (100, 1, 1, 1, 17.0, 21168.23, 0.04, 0.02, "N", "O", D(1996, 3, 13)),
        (100, 2, 2, 2, 36.0, 45983.16, 0.09, 0.06, "N", "O", D(1996, 4, 12)),
        (101, 3, 1, 1, 8.0, 13309.60, 0.10, 0.02, "N", "O", D(1997, 1, 28)),
        # q6 boundary: discount exactly .05 / .07 / .06, qty exactly 24
        (102, 1, 2, 1, 24.0, 2116.82, 0.05, 0.06, "R", "F", D(1994, 1, 1)),
        (102, 2, 3, 2, 23.0, 1000.00, 0.07, 0.00, "R", "F", D(1994, 6, 15)),
        (102, 3, 1, 3, 25.0, 1000.00, 0.06, 0.00, "A", "F", D(1994, 12, 31, 23, 59, 59, 999999)),
        (103, 4, 2, 1, 0.0, 0.0, 0.0, 0.0, "A", "F", D(1994, 2, 2)),  # zeros
        (103, 5, 3, 2, -5.0, -100.0, 0.02, 0.01, "R", "F", D(1994, 3, 3)),  # negatives
        (104, 1, 1, 1, 30.0, 1e12, 0.00, 0.00, "A", "F", D(1995, 1, 15)),  # huge
        (105, 2, 2, 1, 12.0, 4100.00, 0.05, 0.04, "N", "F", D(1996, 2, 29)),  # leap
        (106, 3, 3, 1, 12.0, 4100.00, 0.05, 0.04, "N", "O", D(1995, 3, 15)),  # tie
        (107, 4, 1, 1, 50.0, 73426.50, 0.08, 0.03, "A", "F", D(1993, 8, 25)),
        (108, 5, 2, 1, 3.0, 3000.30, 0.01, 0.05, "N", "O", D(1998, 12, 5)),
        (112, 6, 3, 1, 12.0, 4100.00, 0.05, 0.04, "R", "F", D(1995, 1, 20)),
        (999, 1, 1, 1, 9.0, 900.00, 0.02, 0.02, "N", "O", D(1997, 2, 2)),  # orphan order
        (None, 2, 2, 1, 9.0, 901.00, 0.02, 0.02, "N", "O", D(1997, 2, 3)),  # NULL order key
        (101, None, 1, 2, 4.0, 400.00, 0.03, 0.01, "N", "O", D(1997, 2, 4)),  # NULL part
        (101, 3, None, 3, 4.0, 401.00, 0.03, 0.01, "N", "O", D(1997, 2, 5)),  # NULL supp
        (100, 7, 9, 3, 7.0, 700.00, 0.02, 0.02, "N", "O", D(1996, 5, 5)),  # orphan part/supp
        (111, 1, 1, None, 2.0, 200.00, 0.01, 0.01, None, None, None),  # NULL line/flags/date
    ]
    # exactly duplicated full row (dedup/fan-out bait)
    rows.append(rows[0])
    return rows


def _part_rows():
    # (p_partkey, p_name, p_brand, p_type, p_size, p_retailprice)
    return [
        (1, "goldenrod lavender spring", "Brand#13", "PROMO BURNISHED COPPER", 7, 901.00),
        (2, "blush thistle blue", "Brand#13", "LARGE BRUSHED BRASS", 1, 902.00),
        (3, "spring green yellow", "Brand#42", "STANDARD POLISHED BRASS", 21, 903.00),
        (4, "cornflower chocolate smoke", "Brand#34", "SMALL PLATED COPPER", 14, 904.00),
        (5, "forest brown coral", "Brand#32", "PROMO ANODIZED TIN", 15, 905.00),
        (6, "bisque cornsilk lace", "Brand#24", "MEDIUM BURNISHED TIN", 49, 0.0),  # zero price
        (7, "moccasin green thistle", None, None, None, None),  # NULL type/size/price
        (8, "orphan part no lineitem", "Brand#55", "ECONOMY BRUSHED BRASS", 3, -10.0),
        (8, "orphan dup", "Brand#55", "ECONOMY BRUSHED BRASS", 3, -10.0),  # dup PK
    ]


def _supplier_rows():
    # (s_suppkey, s_name, s_nationkey, s_acctbal)
    return [
        (1, "Supplier#1", 6, 5755.94),
        (2, "Supplier#2", 7, 4032.68),
        (3, "Supplier#3", 8, 4192.40),
        (4, "Supplier#4", None, -283.84),   # NULL nation, negative bal
        (5, "Supplier#5", 99, 0.0),         # orphan nation, zero bal
        (6, None, 10, None),                # NULL name/balance
    ]


def _write(d, name, cols, rows, types):
    import pyarrow as pa
    import pyarrow.parquet as pq

    arrays = {
        c: pa.array([r[i] for r in rows], t)
        for i, (c, t) in enumerate(zip(cols, types))
    }
    pq.write_table(pa.table(arrays), str(d / f"{name}.parquet"))


def _build_dir(spark, d, empty_dims=()):
    import pyarrow as pa

    ts = pa.timestamp("us")
    spec = {
        "region": (["r_regionkey", "r_name"],
                   [pa.int32(), pa.string()], _region_rows()),
        "nation": (["n_nationkey", "n_name", "n_regionkey"],
                   [pa.int32(), pa.string(), pa.int32()], _nation_rows()),
        "customer": (
            ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
             "c_mktsegment"],
            [pa.int64(), pa.string(), pa.int32(), pa.float64(),
             pa.string()], _customer_rows()),
        "supplier": (["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
                     [pa.int64(), pa.string(), pa.int32(), pa.float64()],
                     _supplier_rows()),
        "part": (["p_partkey", "p_name", "p_brand", "p_type", "p_size",
                  "p_retailprice"],
                 [pa.int64(), pa.string(), pa.string(), pa.string(),
                  pa.int32(), pa.float64()], _part_rows()),
        "orders": (
            ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
             "o_orderdate", "o_orderpriority"],
            [pa.int64(), pa.int64(), pa.string(), pa.float64(), ts,
             pa.string()], _orders_rows()),
        "lineitem": (
            ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
             "l_quantity", "l_extendedprice", "l_discount", "l_tax",
             "l_returnflag", "l_linestatus", "l_shipdate"],
            [pa.int64(), pa.int64(), pa.int64(), pa.int32(), pa.float64(),
             pa.float64(), pa.float64(), pa.float64(), pa.string(),
             pa.string(), ts], _lineitem_rows()),
    }
    for t in TABLES:
        if t in spec:
            cols, types, rows = spec[t]
            _write(d, t, cols, [] if t in empty_dims else rows, types)
        else:
            # non-relational tables ship empty but schema-correct
            (
                spark.read.parquet(f"{SRC}/{t}.parquet")
                .limit(0)
                .coalesce(1)
                .write.parquet(str(d / f"{t}.parquet"))
            )
    return str(d)


@pytest.fixture(scope="module")
def fuzz_dir(spark, tmp_path_factory):
    return _build_dir(spark, tmp_path_factory.mktemp("fuzz_rel_sf"))


@pytest.fixture(scope="module")
def fuzz_dir_empty_dims(spark, tmp_path_factory):
    return _build_dir(
        spark, tmp_path_factory.mktemp("fuzz_rel_nodims_sf"),
        empty_dims=("part", "supplier"),
    )


@pytest.fixture(scope="module")
def fuzz_dir_all_empty(spark, tmp_path_factory):
    """Every relational table at ZERO rows, schema-correct. Stronger
    than tests/test_empty_inputs.py (which only asserts queries plan and
    execute): here the empty-input RESULT must hash-match the oracle's —
    a first()-default, a coalesce'd aggregate, or a division guard that
    disagrees between engines on empty input fails here."""
    return _build_dir(
        spark, tmp_path_factory.mktemp("fuzz_rel_allempty_sf"),
        empty_dims=tuple(REL),
    )


def _table_mentions(sql: str) -> set[str]:
    return {t for t in TABLES if re.search(rf"\b{t}\b", sql)}


def _rel_names():
    """All oracle-bearing queries whose SQL touches ONLY relational
    tables. Computed dynamically so new relational queries join the
    sweep for free."""
    import __spark_entry__ as m

    names = []
    for name, sql in sorted(m.oracle_sql().items()):
        mentioned = _table_mentions(sql)
        if mentioned and mentioned <= REL and name not in FUZZ_SKIP:
            names.append(name)
    return names


def _dim_names():
    import __spark_entry__ as m

    return [
        n for n in _rel_names()
        if _table_mentions(m.oracle_sql()[n]) & {"part", "supplier"}
    ]


def _compare(spark, d, name):
    import duckdb

    import __spark_entry__ as m

    spdf = m.queries()[name](spark, d).toPandas()
    con = duckdb.connect()
    try:
        for t in TABLES:
            p = Path(d) / f"{t}.parquet"
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


@pytest.mark.parametrize("name", sweep_params(_rel_names()))
def test_fuzz_rel_query_matches_oracle(spark, fuzz_dir, name):
    _compare(spark, fuzz_dir, name)


@pytest.mark.parametrize("name", sweep_params(_dim_names()))
def test_fuzz_rel_empty_dims_matches_oracle(spark, fuzz_dir_empty_dims, name):
    _compare(spark, fuzz_dir_empty_dims, name)


@pytest.mark.parametrize(
    "name", sweep_params([n for n in _rel_names() if n not in ALL_EMPTY_SKIP])
)
def test_fuzz_rel_all_empty_matches_oracle(spark, fuzz_dir_all_empty, name):
    _compare(spark, fuzz_dir_all_empty, name)


def test_spark_grouping_sets_empty_input_semantics(spark):
    """Pin the Spark behavior the ALL_EMPTY_SKIP entries document: Expand
    -based cube/rollup emit ZERO rows on empty input while the plain
    global aggregate emits one — if a Spark upgrade adopts the ANSI ()
    -set row, this flips and the skips must be deleted."""
    from pyspark.sql import functions as F

    df = spark.range(0).select(
        F.col("id").alias("a"), F.col("id").alias("b")
    )
    assert df.cube("a", "b").agg(F.count("*")).count() == 0
    assert df.rollup("a", "b").agg(F.count("*")).count() == 0
    assert df.groupBy().agg(F.count("*")).count() == 1


def test_table_diff_duplicate_key_fanout_is_the_documented_one(
    spark, fuzz_dir
):
    """The FUZZ_SKIP entry for op-time-travel-diff pins a CONTRACT
    (unique keys), not an accident — this regression-pins the documented
    behavior under violation: duplicate o_orderkey=108 (2 rows in both
    snapshots) fans the outer join to 4 combos — 2 matching pairs
    `unchanged`, 2 cross-pairs `changed` — on top of the 6 odd-key adds
    and 6 other even-key unchangeds."""
    import __spark_entry__ as m

    row = (
        m.queries()["op-time-travel-diff"](spark, fuzz_dir)
        .collect()[0]
        .asDict()
    )
    assert row == {"added": 6, "removed": 0, "changed": 2, "unchanged": 8}


def test_fuzz_rel_inventory_pinned():
    """Same auto-enrollment guard as the events sweep: the dynamic name
    list must never silently shrink (r10 floor: 85 enrolled + 1
    documented FUZZ_SKIP = 86 relational-only oracle queries), and every
    skip must name a registered query with a written rationale."""
    import __spark_entry__ as m

    names = _rel_names()
    assert len(names) >= 85, f"relational fuzz sweep shrank to {len(names)}"
    registered = set(m.oracle_sql())
    for skip in (FUZZ_SKIP, ALL_EMPTY_SKIP):
        for k, why in skip.items():
            assert k in registered, f"skip names unknown query {k}"
            assert len(why) > 40, f"skip[{k}] lacks a real rationale"
    assert len(_dim_names()) >= 15, "empty-dims subset shrank"
