"""Relational breadth, batch 3: TPC-H Q10/Q14/Q19 join shapes.

Adapted to the driver testdata's column subset (reference semantics:
the per-orgao spend aggregation in main.py:239-258 generalizes to these
star-join/aggregate shapes; the TPC-H forms are the industry-standard
way to prove them):

- Q10: returned-item revenue per customer — fact⨝fact shuffle with two
  broadcast dims, a selective date window, and a multi-column group.
- Q14: promo revenue share — broadcast dim join + conditional aggregate.
  Returns the two ROUNDED SUMS, not their ratio: a float division of
  float sums is where engines' rounding diverges (the oracle trap class
  documented in the memory of round 1).
- Q19: disjunctive predicate join — three (brand, size, quantity) clause
  groups OR'd together; Catalyst keeps the disjunction as a join filter
  on the broadcast hash join rather than exploding it into a union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _t, query

# ---------------------------------------------------------------------
# TPC-H Q10: returned-item revenue by customer
# ---------------------------------------------------------------------

@query(
    "op-tpch-q10",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) / 100.0 AS revenue,
           round(max(c_acctbal), 2) AS c_acctbal
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND c_nationkey = n_nationkey
      AND l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item losses per customer): the orders⨝
    lineitem fact-to-fact join shuffles; customer and nation broadcast.
    Both the returnflag filter and the half-year date window are pushed
    to the scans. The classic LIMIT 20 by float revenue is dropped at
    the gate (float-order ties are engine-dependent); the full group set
    is the semantics being proven."""
    lo = F.to_timestamp(F.lit("1996-01-01"))
    hi = F.to_timestamp(F.lit("1996-07-01"))
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    ords = (
        _t(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .select("o_orderkey", "o_custkey")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        # revenue sums EXACT integer cents, then one deterministic IEEE
        # division — round(sum(double), 2) lands on half-digits where Spark
        # and DuckDB disagree (round-1 oracle-float trap); the per-line
        # round(x*100) operates on the identical double in both engines.
        .agg(
            (
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    ).cast("long")
                )
                / F.lit(100.0)
            ).alias("revenue"),
            F.round(F.max("c_acctbal"), 2).alias("c_acctbal"),
        )
    )


# ---------------------------------------------------------------------
# TPC-H Q14: promotion revenue share
# ---------------------------------------------------------------------

@query(
    "op-tpch-q14",
    oracle="""
    SELECT round(sum(CASE WHEN p_type = 'PROMO'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0 END), 2) AS promo_revenue,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-02-01'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promo revenue): one month of lineitem joined to
    the broadcast part dim, conditional aggregate over the join. The
    promo share is promo_revenue/total_revenue — derived downstream,
    never at the gate (float-division rounding divergence)."""
    lo = F.to_timestamp(F.lit("1997-01-01"))
    hi = F.to_timestamp(F.lit("1997-02-01"))
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))), 2
            ).alias("promo_revenue"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------
# TPC-H Q19: disjunctive predicate join
# ---------------------------------------------------------------------

_Q19_CLAUSES = [
    ("Brand#1", 1, 15, 1.0, 15.0),
    ("Brand#2", 10, 30, 15.0, 30.0),
    ("Brand#3", 20, 50, 30.0, 50.0),
]


@query(
    "op-tpch-q19",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1  AND 15
           AND l_quantity BETWEEN 1  AND 15)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 15 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 30 AND 50)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue under disjunctive predicates):
    the OR of three (brand, size, quantity) clause groups cannot be
    pushed to either scan alone — Catalyst evaluates it as the join
    filter of a broadcast hash join, one pass over lineitem. The derived
    single-side envelopes (l_quantity in [1,50]) are the only pushable
    fragments and the data needs no more."""
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    cond = None
    for brand, s_lo, s_hi, q_lo, q_hi in _Q19_CLAUSES:
        clause = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )
        cond = clause if cond is None else (cond | clause)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
