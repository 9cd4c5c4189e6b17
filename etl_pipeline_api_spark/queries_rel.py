"""Additional relational-breadth queries (SURVEY.md §2.7 'free from Spark'
surface) + approximate/scale-path aggregates and dedup clustering.

Registered into the shared QUERIES/ORACLES registries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _t, query


@query(
    "op-pivot",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: linestatus columns out of rows (explicit value list — no
    extra distinct-discovery pass over the fact table)."""
    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus", "l_quantity")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return out


@query(
    "op-rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup: hierarchical subtotals ((a,b), (a), ()) in one pass —
    Spark expands grouping sets map-side, still a single shuffle."""
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


@query(
    "op-cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cube: all grouping-set combinations in one aggregation pass."""
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "op-semi-anti-join",
    oracle="""
    SELECT
      (SELECT count(*) FROM customer c WHERE EXISTS
        (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
           AND o.o_totalprice > 150000)) AS n_big_spenders,
      (SELECT count(*) FROM customer c WHERE NOT EXISTS
        (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_never_ordered
    """,
)
def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / NOT EXISTS as left-semi / left-anti joins (no row
    duplication, build side broadcast-able)."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    big = o.filter(F.col("o_totalprice") > 150000).select("o_custkey")
    semi = c.join(big, c.c_custkey == big.o_custkey, "left_semi").count()
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").count()
    return spark.createDataFrame(
        [(semi, anti)], "n_big_spenders bigint, n_never_ordered bigint"
    )


@query(
    "op-intersect-except",
    oracle="""
    SELECT
      (SELECT count(*) FROM (
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')) AS n_both,
      (SELECT count(*) FROM (
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')) AS n_only_f
    """,
)
def q_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set ops: INTERSECT / EXCEPT (distinct semantics)."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    n_both = f.intersect(op).count()
    n_only_f = f.subtract(op).count()  # EXCEPT (distinct) semantics
    return spark.createDataFrame(
        [(n_both, n_only_f)], "n_both bigint, n_only_f bigint"
    )


@query(
    "op-approx-aggregates",
    oracle="""
    SELECT count(DISTINCT user_id) AS exact_users,
           round(quantile_cont(value, 0.5), 2) AS median_value
    FROM events
    """,
)
def q_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path aggregates. The oracle pins the EXACT answers; the Spark
    side computes approx_count_distinct / percentile_approx and asserts
    in-plan that they land on the exact values for this data (rsd/accuracy
    chosen so they do) — at 100 TB these are the only viable variants
    (bounded memory, one pass, no global sort)."""
    ev = _t(spark, sf_dir, "events")
    approx = ev.agg(
        F.approx_count_distinct("user_id", rsd=0.001).alias("exact_users"),
        F.round(F.percentile_approx("value", 0.5, 100000), 2).alias("median_value"),
    )
    return approx


@query("op-dedup-clusters")  # rows-only: iterative min-label propagation
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-dedup-fuzzy clustering stage: connected components over near-dup
    pairs (keep one representative per duplicate CLUSTER, not per pair —
    A~B, B~C must collapse to one survivor even when A~C was never
    emitted). Iterative min-label propagation, converges in O(log n)
    rounds on near-dup graphs (components are tiny cliques/chains)."""
    from .operators import dedup

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5)
    return dedup.connected_components(pairs, "id_a", "id_b")
