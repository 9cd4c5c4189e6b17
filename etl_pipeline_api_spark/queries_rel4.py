"""Relational breadth, batch 4: TPC-H Q7/Q8/Q13/Q17/Q18/Q22 plan shapes.

These six cover the classic shapes the earlier batches don't:

- Q7: the same dimension table (nation) joined under TWO roles with a
  symmetric pair predicate — broadcast twice, disjunction as join filter.
- Q8: market share — two nation roles plus region gating, conditional
  share aggregate by year.
- Q13: outer-join fan-out distribution — a LEFT join that must preserve
  order-less customers, aggregated twice (per-customer, then histogram).
- Q17: correlated per-group average — each lineitem compared against its
  part's mean quantity (window over the join, NOT a re-scan subquery).
- Q18: group-HAVING semi join — only orders whose line quantities total
  above a threshold survive into the customer join.
- Q22: global scalar threshold + anti join — customers above the average
  balance with no recent orders.

Testdata adaptations (columns absent from the driver parquet): Q13's
comment regex → o_orderpriority filter; Q17's p_container → p_type;
Q22's phone-prefix cntrycode → c_nationkey % 5 and "no orders at all"
→ "no orders since 2000-01-01" (every customer has SOME order at this
density). Money sums use the exact-integer-cents form throughout
(round-1 oracle-float traps): sum(CAST(round(x*100) AS BIGINT))/100.0
is bit-identical across engines, unlike round(sum(double), 2).
l_quantity and c_acctbal are integer- and 2dp-valued doubles, so cents
and quantity sums are exact in IEEE double in both engines.

Reference parity: the reference's single aggregation (main.py:239-258)
is the degenerate one-table case of these; the TPC-H forms prove the
join/agg machinery generalizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _t, query


def _cents(col: str | F.Column) -> F.Column:
    """Exact money: 2dp double → integer cents (bigint), summable exactly."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


_REV_CENTS = "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"


# ---------------------------------------------------------------------
# TPC-H Q7: volume shipping between a nation pair
# ---------------------------------------------------------------------

@query(
    "op-tpch-q7",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
           CAST(sum({_REV_CENTS}) AS BIGINT) / 100.0 AS revenue
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      AND c_custkey = o_custkey
      AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                         AND TIMESTAMP '1997-12-31'
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: nation joined twice under different roles (supplier
    side and customer side), with the symmetric pair disjunction evaluated
    after both broadcasts. Only lineitem⨝orders shuffles; supplier,
    customer, and both nation roles broadcast. The two-year ship window is
    pushed to the lineitem scan."""
    lo, hi = F.to_timestamp(F.lit("1996-01-01")), F.to_timestamp(F.lit("1997-12-31"))
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    ords = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate").between(lo, hi))
        .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            (
                F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                / F.lit(100.0)
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------
# TPC-H Q8: national market share within a region
# ---------------------------------------------------------------------

@query(
    "op-tpch-q8",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
                         THEN {_REV_CENTS} ELSE 0 END) AS BIGINT) / 100.0
             AS nation_revenue,
           CAST(sum({_REV_CENTS}) AS BIGINT) / 100.0 AS total_revenue
    FROM part, lineitem, orders, customer, supplier, nation n1, nation n2,
         region
    WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
      AND o_custkey = c_custkey AND l_suppkey = s_suppkey
      AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
      AND s_nationkey = n2.n_nationkey
      AND r_name = 'ASIA' AND p_type = 'ECONOMY'
      AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                          AND TIMESTAMP '1997-12-31'
    GROUP BY 1
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (market share of NATION_3 suppliers in ASIA's ECONOMY
    market): eight-table star with nation in two roles — customer-side
    nation gates through region, supplier-side nation labels the share.
    Numerator and denominator are returned per year; the share division
    happens downstream (float-division gate trap). All dims broadcast;
    lineitem⨝orders is the only shuffle."""
    lo, hi = F.to_timestamp(F.lit("1996-01-01")), F.to_timestamp(F.lit("1997-12-31"))
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    region = (
        _t(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    n_cust = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    n_supp = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    ords = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").between(lo, hi))
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev_cents = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(region), F.col("nc_region") == F.col("r_regionkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("ns_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", rev_cents).otherwise(
                        F.lit(0).cast("long")
                    )
                )
                / F.lit(100.0)
            ).alias("nation_revenue"),
            (F.sum(rev_cents) / F.lit(100.0)).alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------
# TPC-H Q13: orders-per-customer distribution
# ---------------------------------------------------------------------

@query(
    "op-tpch-q13",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (how many customers placed N orders): LEFT outer
    join so zero-order customers land in the c_count=0 bucket (an inner
    join would silently drop them — the whole point of the shape), then a
    second aggregation over the first's output. count(o_orderkey) counts
    only matched rows, exactly like SQL. The priority filter stands in for
    the reference comment regex (column absent in testdata) and must live
    in the JOIN condition, not a WHERE — as a WHERE it would turn the
    outer join back into an inner one."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    ords = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(ords, cust.c_custkey == ords.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------
# TPC-H Q17: small-quantity-order revenue (correlated per-part average)
# ---------------------------------------------------------------------

@query(
    "op-tpch-q17",
    oracle="""
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             / 100.0 AS total_price,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1' AND p_type = 'SMALL'
      AND l_quantity < (
          SELECT 0.2 * avg(l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = p_partkey
      )
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (lines ordering under 20% of their part's mean
    quantity): the correlated scalar subquery re-expressed as ONE window
    average over the part-filtered join — the subquery's per-part rescan
    becomes a single shuffle on l_partkey, the plan you want at scale.
    Semantics match because the subquery's only correlation is the part
    key and the dim filter keeps every lineitem row of qualifying parts.
    The comparison is exact: l_quantity is integer-valued, so each side's
    avg is the same IEEE double in both engines (integer sum < 2^53)."""
    part = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#1") & (F.col("p_type") == "SMALL"))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    part_avg = F.avg("l_quantity").over(Window.partitionBy("l_partkey"))
    return (
        joined.withColumn("part_avg", part_avg)
        .filter(F.col("l_quantity") < 0.2 * F.col("part_avg"))
        .agg(
            (F.sum(_cents("l_extendedprice")) / F.lit(100.0)).alias("total_price"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------
# TPC-H Q18: large-volume orders (group-HAVING semi join)
# ---------------------------------------------------------------------

@query(
    "op-tpch-q18",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           round(o_totalprice, 2) AS o_totalprice,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 300
    )
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY 1, 2, 3, 4, 5
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (orders totalling >300 units): the HAVING subquery
    is one partial-aggregated pass over lineitem whose surviving keys
    (dozens, not millions) BROADCAST back onto lineitem — the semi join
    costs no extra shuffle, and re-aggregating the filtered lines gives
    sum_qty without carrying the subquery's sum through the join. Orders
    and customer attach by broadcast after the fact table has already
    shrunk to the qualifying keys."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    ords = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(F.broadcast(big), li.l_orderkey == F.col("big_orderkey"))
        .join(F.broadcast(ords), li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .agg(F.sum("l_quantity").cast("long").alias("sum_qty"))
    )


# ---------------------------------------------------------------------
# TPC-H Q22: dormant high-balance customers (scalar threshold + anti join)
# ---------------------------------------------------------------------

@query(
    "op-tpch-q22",
    oracle="""
    WITH cust AS (
        SELECT c_custkey, CAST(c_nationkey % 5 AS BIGINT) AS cntrycode,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        FROM customer
    ),
    thr AS (
        SELECT CAST(floor(sum(bal_cents) * 1.0 / count(*)) AS BIGINT) AS t
        FROM cust WHERE bal_cents > 0
    )
    SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(bal_cents) AS BIGINT) / 100.0 AS totacctbal
    FROM cust, thr
    WHERE bal_cents > t
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY cntrycode
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (high-balance customers gone quiet): the global
    positive-balance average is ONE scalar broadcast into the filter (not
    a rescan per row), then an anti join against recent orders removes
    active customers. Threshold arithmetic is exact integer cents — floor
    of an integer-over-integer division is the same double → same bigint
    in both engines — so the > comparison cannot straddle an ulp.
    Adaptations for testdata: cntrycode from c_nationkey (no phone
    column); 'no orders since 2000' (every customer has lifetime orders
    at this key density, which would make the classic form vacuous)."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_nationkey") % 5).cast("long").alias("cntrycode"),
        _cents("c_acctbal").alias("bal_cents"),
    )
    thr = (
        cust.filter(F.col("bal_cents") > 0)
        .agg(
            F.floor(F.sum("bal_cents") * F.lit(1.0) / F.count(F.lit(1)))
            .cast("long")
            .alias("t")
        )
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01")))
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(thr))
        .filter(F.col("bal_cents") > F.col("t"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum("bal_cents") / F.lit(100.0)).alias("totacctbal"),
        )
    )
