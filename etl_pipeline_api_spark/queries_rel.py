"""Additional relational-breadth queries (SURVEY.md §2.7 'free from Spark'
surface) + approximate/scale-path aggregates and dedup clustering.

Registered into the shared QUERIES/ORACLES registries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _t, _unique_view, query


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
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup: hierarchical subtotals ((a,b), (a), ()) in one pass —
    Spark expands grouping sets map-side, still a single shuffle.

    Money totals use the exact-integer-cents discipline (queries_rel4):
    round(sum(double), 2) diverged between engines at sf1 on the GRAND
    TOTAL row only — 1.5M-row double summation at 1e11 magnitude differs
    by summation order beyond the 2-dp rounding boundary. Summing exact
    cents as longs is order-independent, and the final /100.0 of an
    integer < 2^53 is the same double in both engines."""
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                / 100.0
            ).alias("total"),
        )
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
           round(quantile_cont(value, 0.5) * 100.0) / 100.0 AS median_value,
           CAST(1 AS INTEGER) AS users_ok,
           CAST(1 AS INTEGER) AS median_ok
    FROM events
    """,
)
def q_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path sketch aggregates, GATED against their exact twins in
    one pass: the hash pins the exact answers (count distinct, R-7
    interpolated median — bit-identical formula in both engines), while
    the sketches are asserted within tolerance and emitted as 0/1 flags
    the oracle pins to 1. Bit-equality of a sketch to the exact answer is
    scale-dependent luck (HLL at rsd=0.002 was off by 1/1500 at sf0.1);
    the gates are the honest contract: HLL within 5% (5x its rsd), and
    the KLL/GK median within the ±1%-rank value window [p49, p51]
    (accuracy=10000 guarantees 0.01% rank error — 100x margin). Sketch
    sizes stay moderate: rsd=0.01 (2^14 registers, 0.9s) and
    accuracy=10000 — the previous rsd=0.002 (2^19 registers) spent
    18-20s GC-thrashing a vanilla 1g driver for ONE aggregate (and
    OOM'd it outright in isolation; rsd=0.005 still cost 4.3s in
    register-buffer overhead); bounded-memory is the entire point of
    sketching at 100 TB, so the sketch must stay small enough to ride
    in every task."""
    ev = _t(spark, sf_dir, "events")
    r = ev.agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("_a_users"),
        F.expr("percentile(value, array(0.49D, 0.5D, 0.51D))").alias("_p"),
        F.percentile_approx("value", 0.5, 10000).alias("_a_med"),
    )
    # coalesce-to-1: on a degenerate corpus (empty / all-NULL value) the
    # percentiles and sketch values go NULL and the gates must read as
    # "nothing to gate" — the oracle pins constant 1 (r10 all-empty fuzz)
    return r.select(
        "exact_users",
        (F.round(F.col("_p")[1] * 100.0, 0) / 100.0).alias("median_value"),
        F.coalesce(
            (
                F.abs(F.col("_a_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).cast("int"),
            F.lit(1),
        ).alias("users_ok"),
        F.coalesce(
            (
                (F.col("_a_med") >= F.col("_p")[0])
                & (F.col("_a_med") <= F.col("_p")[2])
            ).cast("int"),
            F.lit(1),
        ).alias("median_ok"),
    )


@query(
    "op-dedup-clusters",
    oracle=r"""
    WITH RECURSIVE tok AS MATERIALIZED (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tokens FROM documents),
    sh AS MATERIALIZED (
      SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(tokens)-2, 0)),
                    i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])) AS shingle
      FROM tok),
    sizes AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS MATERIALIZED (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS MATERIALIZED (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
      WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5),
    edges AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs),
    reach(node, comp) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.node)
    SELECT node, min(comp) AS component FROM reach GROUP BY node
    """,
)
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


# =====================================================================
# Multi-join analytical queries (TPC-H-shaped; exercise join ordering,
# broadcast planning, partial aggregation — the 100 TB star-join path)
# =====================================================================

@query(
    "op-tpch-q3",
    oracle="""
    SELECT l_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           o_orderpriority,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_shipdate  > TIMESTAMP '1997-01-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping-priority revenue): selective dim filter →
    broadcast → fact join → hash agg → top-k. Catalyst pushes both date
    filters into the parquet scans; the filtered customer side is tiny and
    broadcast explicitly; TakeOrderedAndProject avoids a global sort."""
    cut = F.to_timestamp(F.lit("1997-01-01"))
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    ords = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cut).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cut).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
        .select(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "op-tpch-q5",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local-supplier volume): 6-way star join. All dims
    (region→nation→customer/supplier) broadcast; only the orders⨝lineitem
    fact-to-fact join shuffles. The c_nationkey = s_nationkey predicate is
    the classic non-key equi-condition Catalyst keeps as a join filter."""
    lo = F.to_timestamp(F.lit("1996-01-01"))
    hi = F.to_timestamp(F.lit("1997-01-01"))
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    ords = (
        _t(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .select("o_orderkey", "o_custkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
    )


@query(
    "op-grouping-sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube): the three granularities
    compute in ONE pass — Expand replicates each input row per set, then a
    single hash aggregation; no re-scan per granularity."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag", "l_linestatus",
        )
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "op-salted-join",
    oracle="""
    SELECT o_orderpriority,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-salted-join (skew toolkit): fact rows scattered over (key, salt),
    dim replicated salt× — identical result to the plain join (what the
    oracle asserts), hot keys spread across `salt` reducers. The rename to
    the shared key name makes the equi-join condition explicit."""
    from .operators.joins import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("orderkey"), "l_extendedprice", "l_discount"
    )
    ords = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("orderkey"), "o_orderpriority"
    )
    return (
        salted_join(li, ords, "orderkey", salt=8)
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "op-csv-roundtrip",
    oracle="""
    SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem WHERE l_linenumber = 1 GROUP BY 1
    """,
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source/sink: write a projection out as headered CSV, read it back
    with an EXPLICIT schema (no inference job at scale — schema-on-read),
    aggregate. Proves the engine speaks delimited text, the second-most
    common lake format after parquet."""
    import tempfile

    out = tempfile.mkdtemp(prefix="csv_rt_")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1).select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    li.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema(
        "l_orderkey long, l_returnflag string, l_quantity double"
    ).option("header", True).csv(out)
    return back.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


# =====================================================================
# Embedding-column operators (the 100 TB vector-pipeline surface)
# =====================================================================

@query(
    "op-embed-normalize",
    oracle="""
    WITH t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM t)
    SELECT vec_id, round(v[1] / nrm, 4) + 0.0 AS e0, round(v[64] / nrm, 4) + 0.0 AS e63
    FROM n
    """,
)
def q_embed_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize embeddings row-locally (zero shuffle); first/last unit
    components checked against DuckDB list arithmetic."""
    from .operators.similarity import l2_normalize
    from .session import fan_out

    # fan_out: one scan partition at small SF would serialize the per-row
    # norm+divide on a single core (no-op at real scale)
    emb = l2_normalize(fan_out(_t(spark, sf_dir, "embeddings")), "embedding")
    # + 0.0 canonicalizes IEEE -0.0 → 0.0 after round (both sides)
    return emb.select(
        "vec_id",
        (F.round(F.col("unit")[0], 4) + F.lit(0.0)).alias("e0"),
        (F.round(F.col("unit")[63], 4) + F.lit(0.0)).alias("e63"),
    )


@query(
    "op-embed-centroid",
    oracle="""
    SELECT label, CAST(i - 1 AS INT) AS dim,
           round(avg(v[i]), 4) + 0.0 AS c
    FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         generate_series(1, 64) AS t(i)
    GROUP BY 1, 2
    """,
)
def q_embed_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroids in long (label, dim, c) form — posexplode + one
    partial-agg shuffle of |labels|×64 rows (k-means assign/update building
    block; also the IVF centroid refinement step)."""
    from .operators.similarity import centroids

    return centroids(_t(spark, sf_dir, "embeddings"), "label", "embedding").select(
        # + 0.0 canonicalizes -0.0 → 0.0 (IEEE negative zero survives round
        # and hashes differently across engines; also applied in the oracle)
        "label", "dim", (F.round("c", 4) + F.lit(0.0)).alias("c")
    )


@query(
    "op-bucketed-join",
    oracle="""
    SELECT o_orderstatus,
           round(sum(l_extendedprice), 2) AS total_price, count(*) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-bucketed-join: both sides materialized as bucketed+sorted tables
    on the join key — the join plan has NO exchange and NO sort (asserted in
    tests/test_plans.py). At 100 TB this is the co-located fact-to-fact
    join strategy: pay the bucketing shuffle once at ingest, never again."""
    from .operators.joins import bucketed_table

    li = bucketed_table(
        _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice"),
        "li_bucketed", "l_orderkey",
    )
    ords = bucketed_table(
        _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus"),
        "ord_bucketed", "o_orderkey",
    )
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "op-range-join",
    oracle="""
    SELECT e1.event_id, count(e2.event_id) AS n_prev
    FROM events e1 LEFT JOIN events e2
      ON e1.user_id = e2.user_id
     AND e2.ts > e1.ts - INTERVAL 5 MINUTE AND e2.ts < e1.ts
    GROUP BY 1
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-range-join: per event, how many same-user events in the preceding
    5 minutes. Time-bucketed equi-join (linear shuffle, 2x right side) —
    never the quadratic theta-join the naive SQL implies."""
    from .operators.joins import range_join_count

    ev = _t(spark, sf_dir, "events")
    return range_join_count(ev, ev, "event_id", "user_id", "ts", lookback_s=300)


@query(
    "op-window-running",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING), 2) AS running_total,
           round(value - coalesce(lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0.0),
                 2) AS delta_prev
    FROM events
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregates: cumulative sum + lag delta per user — one window
    shuffle on user_id serves both frames (event_id tiebreak makes the
    running order deterministic under ts ties)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).alias("running_total"),
        F.round(F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0)), 2).alias("delta_prev"),
    )


@query(
    "op-embed-quantize",
    oracle="""
    WITH t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    s AS (SELECT vec_id, v,
                 127.0 / nullif(list_max(list_transform(v, x -> abs(x))), 0.0) AS scale
          FROM t)
    SELECT vec_id,
           CAST(round(v[1]  * scale) AS INT) AS q0,
           CAST(round(v[64] * scale) AS INT) AS q63,
           round(scale, 6) AS scale
    FROM s
    """,
)
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 scalar quantization (max-abs symmetric): 4x memory reduction for
    the ANN candidate scan — row-local transform, zero shuffle; scale rides
    with the row for dequantization."""
    from .session import fan_out

    emb = fan_out(_t(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # materialize scale as a column FIRST (higher-order expr-copy trap)
    emb = emb.withColumn(
        "scale",
        F.lit(127.0)
        / F.nullif(
            F.array_max(F.transform(F.col("v"), lambda x: F.abs(x))), F.lit(0.0)
        ),
    )
    return emb.select(
        "vec_id",
        F.round(F.col("v")[0] * F.col("scale")).cast("int").alias("q0"),
        F.round(F.col("v")[63] * F.col("scale")).cast("int").alias("q63"),
        F.round("scale", 6).alias("scale"),
    )


@query(
    "op-percentile",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.9), 4) AS p90,
           round(median(value), 4) AS med
    FROM events GROUP BY 1
    """,
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (sort-based; the scale path is
    op-approx-aggregates' approx_percentile sketch — same API shape, bounded
    memory). Spark percentile() and DuckDB quantile_cont share linear
    interpolation — checked to 4 decimals."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.median("value"), 4).alias("med"),
    )


@query(
    "op-null-semantics",
    oracle="""
    SELECT event_id,
           coalesce(try_cast(event_type AS DOUBLE), value, 0.0) AS first_present,
           (props IS NOT DISTINCT FROM NULL) AS props_is_null,
           CASE WHEN value IS NOT DISTINCT FROM value THEN 1 ELSE 0 END AS self_eq
    FROM events
    """,
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null semantics surface: coalesce chains and null-safe equality
    (Spark <=> ≡ SQL IS NOT DISTINCT FROM) — the coerce-then-default
    pattern the reference's fillna pipelines rely on (main.py:212-213)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.coalesce(
            F.col("event_type").try_cast("double"), F.col("value"), F.lit(0.0)
        ).alias("first_present"),
        F.col("props").eqNullSafe(F.lit(None).cast("string")).alias("props_is_null"),
        F.when(F.col("value").eqNullSafe(F.col("value")), 1).otherwise(0).alias("self_eq"),
    )


@query(
    "op-grouped-zscore",
    oracle="""
    SELECT event_id, user_id,
           round((value - avg(value) OVER (PARTITION BY user_id))
                 / stddev_samp(value) OVER (PARTITION BY user_id), 4) AS z
    FROM events
    """,
)
def q_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map Pandas UDF (applyInPandas) with an ORACLE: per-user
    z-scores computed in Arrow-batched Python match the SQL window twin to
    4 decimals — proving the Python escape hatch is numerically faithful,
    not just plumbed. State per group is one pandas frame (memory bounded
    by the largest group, the applyInPandas contract)."""
    import pandas as pd

    from .session import ship_package

    ship_package(spark)
    # explicit partition count: AQE would coalesce this few-MB shuffle to
    # one partition and serialize every per-user python call on one core
    # (see op-asof-cogroup — same fix, measured 7x there)
    ev = (
        _t(spark, sf_dir, "events")
        .select("event_id", "user_id", "value")
        .repartition(spark.sparkContext.defaultParallelism, "user_id")
    )

    def zscore(pdf: "pd.DataFrame") -> "pd.DataFrame":
        s = pdf["value"].std(ddof=1)
        z = ((pdf["value"] - pdf["value"].mean()) / s).round(4)
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "user_id": pdf["user_id"],
             "z": z.astype("Float64")}
        )

    return ev.groupBy("user_id").applyInPandas(
        zscore, "event_id long, user_id long, z double"
    )


_SHARED_SQL = """
    SELECT l_returnflag,
           count(*) AS n,
           round(sum(l_extendedprice), 2) AS total,
           round(avg(l_discount), 4) AS avg_disc
    FROM lineitem WHERE l_quantity > 10
    GROUP BY l_returnflag
"""


@query("op-sql-passthrough", oracle=_SHARED_SQL)
def q_sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-sql-passthrough: the engine's SQL surface — temp views over the
    lake tables + spark.sql. The SAME SQL text runs on Spark and DuckDB
    (ANSI-compatible subset), so the query IS its own oracle; Catalyst
    plans it identically to the DataFrame API (one scan, partial+final
    hash agg)."""
    import re as _re

    # per-call UNIQUE view name: registering "lineitem" itself raced
    # concurrent SQL-surface queries in one session (r10 ADVICE — B drops
    # the shared name before A's spark.sql analyzes); the oracle keeps the
    # canonical name, the Spark text substitutes the unique one
    v = _unique_view(_t(spark, sf_dir, "lineitem"), "lineitem")
    out = spark.sql(_re.sub(r"\blineitem\b", v, _SHARED_SQL))
    spark.catalog.dropTempView(v)  # analyzed eagerly; unique → race-free
    return out


@query(
    "op-scd2",
    oracle="""
    SELECT user_id, event_type AS state, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           CASE WHEN lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                IS NULL THEN 1 ELSE 0 END AS is_current
    FROM events
    """,
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-scd2: slowly-changing-dimension type-2 intervals from an event
    log — each state change opens a validity window closed by the next
    change (lead over the user timeline; one window shuffle). The warehouse
    pattern for reconstructing 'attribute as of time T' at 100 TB without
    storing snapshots."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


@query(
    "op-histogram",
    oracle="""
    SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket,
           count(*) AS n,
           round(min(value), 2) AS lo,
           round(max(value), 2) AS hi
    FROM events
    GROUP BY 1
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram: bucket assignment is row-local arithmetic,
    counts are one partial-agg shuffle of |buckets| rows — the profile
    primitive behind data-drift monitors at scale (vs. exact sort-based
    percentiles). Bucket ids are BIGINT on both sides: an INT bucket
    cast overflows (ANSI task kill) on wide value ranges — value/25 at
    1e12 is 4e10 > 2^31 — found by the r9 events fuzz."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("bucket", F.floor(F.col("value") / 25.0).cast("long"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
    )
