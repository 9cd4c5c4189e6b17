"""Relational breadth, batch 17: TPC-H Q2/Q11/Q16/Q20 — the partsupp four.

The driver testdata has no ``partsupp`` table, so these four shapes were
the last TPC-H gaps (SURVEY §2.9).  Rather than shipping a parquet the
oracle can't see, ``partsupp`` is DERIVED deterministically from ``part``
and ``supplier`` with pure integer arithmetic that both engines compute
bit-identically:

    ps_suppkey    = (p_partkey * 4 + i) % s_cnt          for i in 0..3
    ps_availqty   = (ps_partkey * 47 + ps_suppkey * 31) % 9999 + 1
    ps_supplycost = ((ps_partkey*13 + ps_suppkey*17) % 99900 + 100) / 100.0

(i spans four CONSECUTIVE residues, so the four suppliers per part are
distinct whenever s_cnt >= 4 — true at every driver SF; keys are 0-based
to match the testdata.)  The Spark side builds the same frame from a
4-row ``spark.range`` cross-joined against ``part`` with the supplier
count broadcast as a 1-row aggregate — no driver-side state, and at
100 TB the partsupp build is a narrow map over ``part``.

The four shapes these add (none covered by batches 1-16):

- Q2: correlated MIN subquery — min-cost supplier per part within a
  region, expressed as a window min over the joined frame (one shuffle),
  not a re-scan subquery.
- Q11: group aggregate vs a global-scalar threshold (HAVING share of
  total) — exact-integer cents comparison, no float threshold.
- Q16: anti-join (NOT IN suppliers) + count(DISTINCT) rollup.
- Q20: semi-join chain gated by a correlated aggregate comparison
  (availqty > half the year's shipped quantity per part+supplier).

Money/quantity sums use the exact-integer-cents discipline from
queries_rel4.py.  Reference parity: the reference engine (main.py:239-258)
has only single-table aggregation; these prove the subquery/semi-join
machinery on the same star schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _t, query

# DuckDB twin of _partsupp(): keep the two in lockstep (integer ops only).
_PS_CTE = """
    scnt AS (SELECT count(*) AS s_cnt FROM supplier),
    ps0 AS (
      SELECT p_partkey AS ps_partkey,
             (p_partkey * 4 + quad.i) % s_cnt AS ps_suppkey
      FROM part, (SELECT unnest([0, 1, 2, 3]) AS i) AS quad, scnt
    ),
    partsupp AS (
      SELECT ps_partkey, ps_suppkey,
             CAST((ps_partkey * 47 + ps_suppkey * 31) % 9999 + 1 AS INT)
               AS ps_availqty,
             ((ps_partkey * 13 + ps_suppkey * 17) % 99900 + 100) / 100.0
               AS ps_supplycost
      FROM ps0
    )
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived partsupp: 4 rows per part, keys/attrs by integer arithmetic
    (see module docstring; DuckDB twin is _PS_CTE). Narrow map over part —
    the supplier count rides along as a broadcast 1-row aggregate, so the
    build is shuffle-free and scales with |part|."""
    part = _t(spark, sf_dir, "part").select("p_partkey")
    scnt = _t(spark, sf_dir, "supplier").agg(F.count("*").alias("s_cnt"))
    quad = spark.range(4).select(F.col("id").alias("i"))
    return (
        part.crossJoin(F.broadcast(quad))
        .crossJoin(F.broadcast(scnt))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            F.expr("(p_partkey * 4 + i) % s_cnt").alias("ps_suppkey"),
        )
        .withColumn(
            "ps_availqty",
            F.expr("CAST((ps_partkey * 47 + ps_suppkey * 31) % 9999 + 1 AS INT)"),
        )
        .withColumn(
            "ps_supplycost",
            F.expr("((ps_partkey * 13 + ps_suppkey * 17) % 99900 + 100) / 100.0"),
        )
    )


# ---------------------------------------------------------------------
# TPC-H Q2: minimum-cost supplier per part within a region
# ---------------------------------------------------------------------

@query(
    "op-tpch-q2",
    oracle=f"""
    WITH {_PS_CTE},
    eligible AS (
      SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost,
             min(ps_supplycost) OVER (PARTITION BY p_partkey) AS min_cost
      FROM partsupp
      JOIN part     ON p_partkey = ps_partkey
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE' AND p_type = 'SMALL'
        AND p_size BETWEEN 10 AND 30
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost
    FROM eligible
    WHERE ps_supplycost = min_cost
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the spec's correlated `= (SELECT min ...)` becomes a
    window min over the already-joined, region-filtered frame — one shuffle
    on p_partkey instead of a second scan of partsupp.  part/supplier/
    nation/region all broadcast (dims); the window equality keeps ties,
    exactly like the spec's subquery. Reference: main.py:239-258 has only
    single-table aggregation; this is the correlated-subquery upgrade."""
    ps = _partsupp(spark, sf_dir)
    part = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_type") == "SMALL") & F.col("p_size").between(10, 30))
        .select("p_partkey", "p_name")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").select("r_regionkey")
    joined = (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "ps_supplycost")
    )


# ---------------------------------------------------------------------
# TPC-H Q11: important stock — parts whose value exceeds a share of total
# ---------------------------------------------------------------------

@query(
    "op-tpch-q11",
    oracle=f"""
    WITH {_PS_CTE},
    ps_reg AS (
      SELECT ps_partkey,
             CAST(round(ps_supplycost * ps_availqty * 100) AS BIGINT) AS val_cents
      FROM partsupp
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_regionkey = 2
    ),
    per_part AS (
      SELECT ps_partkey, sum(val_cents) AS cents FROM ps_reg GROUP BY 1
    ),
    tot AS (SELECT sum(cents) AS tot_cents FROM per_part)
    SELECT ps_partkey, CAST(cents AS DOUBLE) / 100.0 AS stock_value
    FROM per_part, tot
    WHERE cents * 1000 > tot_cents
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-group value vs a global-scalar HAVING threshold
    (value > 0.1% of total).  The threshold compare is EXACT INTEGER cents
    (cents*1000 > tot_cents) — no float-boundary flakiness between engines.
    The total rides back as a broadcast 1-row aggregate; one data shuffle
    (groupBy ps_partkey), supplier/nation broadcast."""
    ps = _partsupp(spark, sf_dir)
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 2)
        .select("n_nationkey")
    )
    per_part = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .withColumn(
            "val_cents",
            F.round(F.col("ps_supplycost") * F.col("ps_availqty") * 100).cast("long"),
        )
        .groupBy("ps_partkey")
        .agg(F.sum("val_cents").alias("cents"))
    )
    tot = per_part.agg(F.sum("cents").alias("tot_cents"))
    return (
        per_part.crossJoin(F.broadcast(tot))
        .filter(F.col("cents") * 1000 > F.col("tot_cents"))
        .select(
            "ps_partkey",
            (F.col("cents").cast("double") / 100.0).alias("stock_value"),
        )
    )


# ---------------------------------------------------------------------
# TPC-H Q16: supplier count by part descriptor, excluding flagged suppliers
# ---------------------------------------------------------------------

@query(
    "op-tpch-q16",
    oracle=f"""
    WITH {_PS_CTE}
    SELECT p_brand, p_type, p_size,
           count(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp
    JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'ECONOMY'
      AND p_size IN (2, 5, 11, 17, 23, 29, 35, 41)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT-IN exclusion + count(DISTINCT) rollup.  The
    spec's `comment LIKE '%Complaints%'` exclusion is adapted to the
    available columns as s_acctbal < 0 (6 suppliers at sf0.01).  The
    exclusion list is a broadcast LEFT ANTI join (never a NOT-IN hash set
    on the driver); distinct-count shuffles once on the grouping key."""
    ps = _partsupp(spark, sf_dir)
    part = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "ECONOMY")
            & F.col("p_size").isin(2, 5, 11, 17, 23, 29, 35, 41)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    flagged = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(F.broadcast(flagged), ps.ps_suppkey == flagged.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------
# TPC-H Q20: suppliers holding excess stock of promo parts
# ---------------------------------------------------------------------

@query(
    "op-tpch-q20",
    oracle=f"""
    WITH {_PS_CTE},
    qty AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY 1, 2
    ),
    excess AS (
      SELECT DISTINCT ps_suppkey
      FROM partsupp
      JOIN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%') red
        ON red.p_partkey = ps_partkey
      JOIN qty ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
      WHERE ps_availqty > 0.5 * qty
    )
    SELECT s_name, s_acctbal, n_name
    FROM supplier
    JOIN excess ON s_suppkey = ps_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_regionkey IN (0, 1, 2)
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: semi-join chain gated by a correlated aggregate —
    keep suppliers whose availqty exceeds half the 1996 shipped quantity of
    that (part, supplier).  The correlated scalar subquery becomes ONE
    pre-aggregation of lineitem on (l_partkey, l_suppkey) joined back (the
    spec's per-row re-scan would be quadratic); per TPC-H semantics pairs
    with no 1996 shipments drop out (NULL compare), which the inner join
    encodes.  Only lineitem shuffles; part filter and the final supplier/
    nation joins broadcast.  l_quantity is integer-valued, so sum and the
    0.5* compare are exact in both engines."""
    ps = _partsupp(spark, sf_dir)
    red = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    lo, hi = F.to_timestamp(F.lit("1996-01-01")), F.to_timestamp(F.lit("1997-01-01"))
    qty = (
        _t(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    excess = (
        ps.join(F.broadcast(red), ps.ps_partkey == red.p_partkey)
        .join(
            qty,
            (ps.ps_partkey == qty.l_partkey) & (ps.ps_suppkey == qty.l_suppkey),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    supp = _t(spark, sf_dir, "supplier")
    nat = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey").isin(0, 1, 2))
        .select("n_nationkey", "n_name")
    )
    return (
        supp.join(F.broadcast(excess), supp.s_suppkey == excess.ps_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .select("s_name", "s_acctbal", "n_name")
    )
