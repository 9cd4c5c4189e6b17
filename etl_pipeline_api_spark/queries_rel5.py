"""Relational breadth, batch 5: TPC-H Q4/Q9/Q12/Q15/Q21 plan shapes.

Completes the expressible TPC-H surface (with batches 1-4: Q1/Q3/Q5/Q6/
Q7/Q8/Q10/Q13/Q14/Q17/Q18/Q19/Q22 already registered). The five here
cover the remaining distinct shapes:

- Q4: EXISTS semi join — orders having at least one qualifying line,
  counted by priority. The subquery never contributes columns, so the
  join must be a SEMI join (an inner join + distinct would re-shuffle
  the fact table; EXISTS keeps orders' cardinality).
- Q9: multi-dim profit rollup — revenue minus cost per line, rolled up
  by supplier nation and order year; part filtered by a name LIKE.
- Q12: conditional class counting after a fact-fact join — per ship
  class, how many high- vs low-priority lines (two conditional sums in
  one pass).
- Q15: top-by-global-max — per-supplier revenue, keep the row(s) equal
  to the global max: a scalar aggregate broadcast back as a filter, not
  a global sort.
- Q21: the hardest correlated shape — EXISTS(other supplier in the same
  order) AND NOT EXISTS(other LATE supplier in the same order),
  re-expressed as ONE per-order aggregation joined back (two distinct
  counts replace two correlated rescans).

Testdata adaptations (documented deltas, same plan shapes): the driver
parquet has no l_commitdate/l_receiptdate/l_shipmode/partsupp, so
"late" ≡ l_returnflag = 'R' (Q4's late-delivery EXISTS, Q21's kept-
waiting predicate), Q12's ship modes → l_returnflag classes, and Q9's
ps_supplycost → cost proxy round(p_retailprice*100) * l_quantity in
exact integer cents. Q2/Q11/Q16/Q20 need partsupp and are intentionally
out of scope (no such table to read — see COVERAGE.md).

Money math follows the round-1 oracle-float rules: sums as exact
integer cents (bigint), a single /100.0 at the end; counts CAST to
BIGINT in DuckDB.

Reference parity: the reference's one-table aggregation
(proj-eng-dados/main.py:239-258) is the degenerate case; these pin the
join/semi-join/anti-correlation machinery the engine adds beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _t, query

_REV_CENTS = "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"


def _rev_cents() -> F.Column:
    return F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "long"
    )


# ---------------------------------------------------------------------
# TPC-H Q4: order priority checking (EXISTS semi join)
# ---------------------------------------------------------------------

@query(
    "op-tpch-q4",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
      )
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (orders with >=1 qualifying line, counted by
    priority): the EXISTS subquery is a LEFT SEMI join — lineitem's
    return-flag filter is pushed to its scan, the semi join keeps
    orders' row count (no fan-out, no distinct), and only the two join
    keys shuffle. 'Late delivery' adapts to l_returnflag='R' (no
    commit/receipt dates in testdata); the quarter window prunes the
    orders scan."""
    lo, hi = F.to_timestamp(F.lit("1997-01-01")), F.to_timestamp(F.lit("1997-10-01"))
    ords = (
        _t(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .select("o_orderkey", "o_orderpriority")
    )
    flagged = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        ords.join(flagged, ords.o_orderkey == flagged.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------
# TPC-H Q9: product-type profit measure (nation × year rollup)
# ---------------------------------------------------------------------

@query(
    "op-tpch-q9",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           CAST(sum({_REV_CENTS}
                    - CAST(round(p_retailprice * 100) AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS BIGINT) / 100.0
             AS sum_profit
    FROM lineitem, orders, supplier, part, nation
    WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
      AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      AND p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit by supplier nation and order year): part is
    filtered by the name LIKE *before* its broadcast (the selective dim
    shrinks the fact early), supplier/nation broadcast, and the only
    shuffle is lineitem⨝orders then the final two-key aggregation.
    ps_supplycost has no testdata analog, so cost is the documented
    proxy retailprice×quantity — computed in exact integer cents
    (bigint × bigint), subtracted from revenue cents, one /100.0 at the
    end, so both engines sum identical integers."""
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    ords = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    cost_cents = (
        F.round(F.col("p_retailprice") * 100).cast("long")
        * F.col("l_quantity").cast("long")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(((F.sum(_rev_cents() - cost_cents)) / F.lit(100.0)).alias("sum_profit"))
    )


# ---------------------------------------------------------------------
# TPC-H Q12: shipping classes vs order priority
# ---------------------------------------------------------------------

@query(
    "op-tpch-q12",
    oracle="""
    SELECT l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_returnflag IN ('A', 'R')
      AND l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate < TIMESTAMP '1999-01-01'
    GROUP BY 1
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (per ship class, high- vs low-priority line
    counts): both conditional sums ride ONE fact-fact join and one
    aggregation pass — the class filter and ship-year window are pushed
    to the lineitem scan, so the shuffle carries only qualifying lines.
    Ship modes adapt to l_returnflag classes (no l_shipmode column);
    the priority split is the classic URGENT/HIGH vs rest."""
    lo, hi = F.to_timestamp(F.lit("1998-01-01")), F.to_timestamp(F.lit("1999-01-01"))
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_returnflag").isin("A", "R")
            & (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") < hi)
        )
        .select("l_orderkey", "l_returnflag")
    )
    ords = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------
# TPC-H Q15: top supplier by period revenue (global-max filter)
# ---------------------------------------------------------------------

@query(
    "op-tpch-q15",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(sum({_REV_CENTS}) AS BIGINT) AS total_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_cents / 100.0 AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_cents = (SELECT max(total_cents) FROM revenue)
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (supplier(s) with the period's max revenue): the
    per-supplier revenue view aggregates once, its global max collapses
    to ONE scalar row that cross-join-broadcasts back as an equality
    filter — no global sort, no second scan of lineitem (Spark reuses
    the aggregated frame on both sides; the view is tiny after the
    groupBy). Ties all survive, exactly like the SQL. Revenue compares
    in integer cents so max-equality cannot straddle an ulp."""
    lo, hi = F.to_timestamp(F.lit("1997-01-01")), F.to_timestamp(F.lit("1997-04-01"))
    revenue = (
        _t(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev_cents()).alias("total_cents"))
    )
    best = revenue.agg(F.max("total_cents").alias("best_cents"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(best))
        .filter(F.col("total_cents") == F.col("best_cents"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_cents") / F.lit(100.0)).alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------
# TPC-H Q21: suppliers who kept orders waiting
# ---------------------------------------------------------------------

@query(
    "op-tpch-q21",
    oracle="""
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R'
      )
    GROUP BY s_name
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (the sole failing supplier in multi-supplier
    orders): the correlated EXISTS / NOT EXISTS pair — 'some other
    supplier in this order' and 'no other FAILING supplier' — becomes
    ONE per-order aggregation producing two distinct-supplier counts,
    joined back to the failing lines:

        n_supp > 1          ≡ EXISTS(other supplier)
        n_late_supp = 1     ≡ NOT EXISTS(other late supplier), given
                              the joined line itself is late

    The oracle keeps the literal EXISTS form, so the gate proves the
    rewrite. One shuffle for the per-order counts, one for the
    join-back (same key — AQE coalesces), dims broadcast. 'Kept waiting'
    adapts to l_returnflag='R' (no receipt/commit dates in testdata);
    the nation gate keeps the classic selectivity."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    # size(collect_set) not countDistinct: two countDistincts over one
    # groupBy trigger an Expand that doubles the shuffled rows; the sets
    # dedup map-side in one pass (measured 1.57s -> 1.14s warm @ sf0.1)
    # and stay bounded by suppliers-per-order.
    per_order = li.groupBy("l_orderkey").agg(
        F.size(F.collect_set("l_suppkey")).alias("n_supp"),
        F.size(
            F.collect_set(F.when(F.col("l_returnflag") == "R", F.col("l_suppkey")))
        ).alias("n_late_supp"),
    )
    ords = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    nat = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_1")
        .select("n_nationkey")
    )
    supp = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    late = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    return (
        late.join(per_order, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(ords), F.col("l_orderkey") == ords.o_orderkey, "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey, "left_semi")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
