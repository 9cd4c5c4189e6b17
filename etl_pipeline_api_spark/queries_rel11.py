"""Relational batch 11 — statistical profiling, inference, and graph
analytics (SURVEY.md §2.9 extensions; the reference engine's EDA stops
at count/mean/min/max — /root/reference/proj-eng-dados/main.py:270-323 —
these are the next rungs of that ladder, distributed).

- op-corr-matrix: all pairwise Pearson correlations in ONE scan.
- op-entropy-profile: per-column Shannon entropy (key-ness screen).
- op-mutual-info: MI between two label columns (association screen).
- op-ab-test: two-proportion z-test under a deterministic user split.
- op-revenue-concentration: Gini + top-1%/top-10% revenue share.
- op-benford: first-digit distribution vs Benford + χ² contributions.
- op-cusum-changepoint: per-series CUSUM extreme (most likely single
  changepoint in each event-type's hourly count series).
- op-knn-classify: k-NN majority-vote labeling over the embedding
  corpus (the classifier the sim-search path gives for free).
- op-pagerank: 3-iteration PageRank over the mined co-purchase graph.
- op-graph-triangles: triangle count + global clustering coefficient.

All DuckDB-oracle-gated with explicit rounding and total-order
tie-breaks; the graph oracles unroll the iteration as nested CTEs so
the SQL stays engine-portable (no recursive-aggregate extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import graph, similarity, stats
from .queries import _t, query


@query(
    "op-corr-matrix",
    oracle="""
    WITH w AS (
      SELECT round(corr(l_quantity, l_extendedprice), 4) AS q_p,
             round(corr(l_quantity, l_discount), 4)      AS q_d,
             round(corr(l_quantity, l_tax), 4)           AS q_t,
             round(corr(l_extendedprice, l_discount), 4) AS p_d,
             round(corr(l_extendedprice, l_tax), 4)      AS p_t,
             round(corr(l_discount, l_tax), 4)           AS d_t
      FROM lineitem)
    SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, q_p AS corr FROM w
    UNION ALL SELECT 'l_quantity', 'l_discount', q_d FROM w
    UNION ALL SELECT 'l_quantity', 'l_tax', q_t FROM w
    UNION ALL SELECT 'l_extendedprice', 'l_discount', p_d FROM w
    UNION ALL SELECT 'l_extendedprice', 'l_tax', p_t FROM w
    UNION ALL SELECT 'l_discount', 'l_tax', d_t FROM w
    """,
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-corr-matrix: all six Pearson correlations among lineitem's
    numeric measures computed in ONE map-combined aggregation (one scan
    however many pairs), unpivoted to long form (operators/stats.py
    corr_matrix)."""
    return stats.corr_matrix(
        _t(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )


@query(
    "op-entropy-profile",
    oracle="""
    WITH c1 AS (SELECT lang AS v, count(*) AS n FROM documents GROUP BY 1),
    c2 AS (SELECT source AS v, count(*) AS n FROM documents GROUP BY 1)
    SELECT 'lang' AS column_name, count(*) AS n_distinct,
           round(-sum((n * 1.0 / (SELECT sum(n) FROM c1))
                 * log2(n * 1.0 / (SELECT sum(n) FROM c1))), 4) AS entropy_bits
    FROM c1
    UNION ALL
    SELECT 'source', count(*),
           round(-sum((n * 1.0 / (SELECT sum(n) FROM c2))
                 * log2(n * 1.0 / (SELECT sum(n) FROM c2))), 4)
    FROM c2
    """,
)
def q_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-entropy-profile: Shannon entropy (bits) + distinct count for
    the documents lang/source columns — one tiny groupBy per column,
    entropy on the |levels|-row frame (operators/stats.py
    entropy_profile)."""
    return stats.entropy_profile(
        _t(spark, sf_dir, "documents"), ["lang", "source"]
    )


@query(
    "op-mutual-info",
    oracle="""
    WITH joint AS (
      SELECT l_returnflag AS x, l_linestatus AS y, count(*) AS n_xy
      FROM lineitem GROUP BY 1, 2),
    cells AS (
      SELECT n_xy,
             sum(n_xy) OVER ()               AS n,
             sum(n_xy) OVER (PARTITION BY x) AS n_x,
             sum(n_xy) OVER (PARTITION BY y) AS n_y
      FROM joint)
    SELECT CAST(max(n) AS BIGINT) AS n,
           round(-sum((n_xy*1.0/n) * log2(n_x*1.0/n)), 4) AS h_x,
           round(-sum((n_xy*1.0/n) * log2(n_y*1.0/n)), 4) AS h_y,
           round(-sum((n_xy*1.0/n) * log2(n_xy*1.0/n)), 4) AS h_xy,
           round(sum((n_xy*1.0/n) * log2((n_xy*1.0/n)
                 / ((n_x*1.0/n) * (n_y*1.0/n)))), 4) AS mi_bits
    FROM cells
    """,
)
def q_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-mutual-info: MI between l_returnflag and l_linestatus — one
    joint groupBy is the only pass over the fact table; marginals are
    window sums over the |X|x|Y| joint frame (operators/stats.py
    mutual_info)."""
    return stats.mutual_info(
        _t(spark, sf_dir, "lineitem"), "l_returnflag", "l_linestatus"
    )


@query(
    "op-ab-test",
    oracle="""
    WITH pu AS (
      SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
             CASE WHEN sum(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) >= count(*) * 0.25
                  THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY 1, 2),
    v AS (
      SELECT variant, count(*) AS n_users, sum(converted) AS n_conv
      FROM pu GROUP BY 1),
    w AS (
      SELECT sum(CASE WHEN variant = 0 THEN n_users END) AS n_a,
             sum(CASE WHEN variant = 1 THEN n_users END) AS n_b,
             sum(CASE WHEN variant = 0 THEN n_conv END) AS conv_a,
             sum(CASE WHEN variant = 1 THEN n_conv END) AS conv_b
      FROM v)
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(conv_a AS BIGINT) AS conv_a, CAST(conv_b AS BIGINT) AS conv_b,
           round(conv_a * 1.0 / n_a, 4) AS rate_a,
           round(conv_b * 1.0 / n_b, 4) AS rate_b,
           round(CASE WHEN conv_a + conv_b > 0
                       AND conv_a + conv_b < n_a + n_b
                      THEN (conv_b * 1.0 / n_b - conv_a * 1.0 / n_a)
                 / sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))
                        * (1 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)) END, 4) AS z
    FROM w
    """,
)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-ab-test: pooled two-proportion z-test on purchase conversion
    under the deterministic user_id%2 split — re-auditable assignment,
    one scan, arithmetic on a 2-row frame (operators/stats.py
    ab_test)."""
    return stats.ab_test(_t(spark, sf_dir, "events"))


@query(
    "op-revenue-concentration",
    oracle="""
    WITH pk AS (
      SELECT o_custkey AS k, sum(o_totalprice) AS amt
      FROM orders GROUP BY 1),
    r AS (
      SELECT amt, row_number() OVER (ORDER BY amt ASC, k ASC) AS i,
             count(*) OVER () AS n, sum(amt) OVER () AS total
      FROM pk)
    SELECT max(n) AS n_customers,
           round((2 * sum(i * amt)) / (max(n) * max(total))
                 - (max(n) + 1.0) / max(n), 4) AS gini,
           round(sum(CASE WHEN i > max_n - ceil(max_n * 0.01) THEN amt
                          ELSE 0.0 END) / max(total), 4) AS top1_share,
           round(sum(CASE WHEN i > max_n - ceil(max_n * 0.10) THEN amt
                          ELSE 0.0 END) / max(total), 4) AS top10_share
    FROM (SELECT r.*, max(n) OVER () AS max_n FROM r)
    """,
)
def q_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-revenue-concentration: customer-revenue Gini + top-1%/10%
    share — the fact table reduces to |customers| rows in one agg; the
    Gini rank formula is windows over that frame with (amt, key)
    total-order ties (operators/stats.py revenue_concentration)."""
    return stats.revenue_concentration(_t(spark, sf_dir, "orders"))


@query(
    "op-benford",
    oracle="""
    WITH d AS (
      SELECT CAST(floor(l_extendedprice
                  / power(10, floor(log10(l_extendedprice)))) AS INT)
               AS digit
      FROM lineitem WHERE l_extendedprice > 0),
    c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
    t AS (SELECT c.*, sum(n) OVER () AS total FROM c)
    SELECT digit, n,
           round(n * 1.0 / total, 4) AS obs_share,
           round(log10(1 + 1.0 / digit), 4) AS exp_share,
           round(power(n - total * log10(1 + 1.0 / digit), 2)
                 / (total * log10(1 + 1.0 / digit)), 4) AS chi2_part
    FROM t ORDER BY digit
    """,
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-benford: first-digit distribution of l_extendedprice vs
    Benford's law with per-digit chi-square contributions — row-local
    digit extraction, one 9-row agg (operators/stats.py
    benford_profile)."""
    return stats.benford_profile(_t(spark, sf_dir, "lineitem"), "l_extendedprice")


@query(
    "op-cusum-changepoint",
    oracle="""
    WITH b AS (
      SELECT event_type, date_trunc('hour', ts) AS b, count(*) AS y
      FROM events GROUP BY 1, 2),
    c AS (
      SELECT event_type, b,
             count(*) OVER (PARTITION BY event_type) AS n_buckets,
             sum(y) OVER (PARTITION BY event_type ORDER BY b
                          ROWS UNBOUNDED PRECEDING)
               - row_number() OVER (PARTITION BY event_type ORDER BY b)
                 * avg(y) OVER (PARTITION BY event_type) AS cusum
      FROM b),
    ranked AS (
      SELECT event_type, n_buckets, b AS cp_ts,
             round(abs(cusum), 4) AS max_abs_cusum,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY round(abs(cusum), 6) DESC, b ASC)
               AS rn
      FROM c)
    SELECT event_type, n_buckets, cp_ts, max_abs_cusum
    FROM ranked WHERE rn = 1
    """,
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-cusum-changepoint: most-likely single changepoint per
    event-type hourly count series via the CUSUM extreme — one
    map-combined bucket agg, running deviation + deterministic struct
    argmax on the bucket frame (operators/stats.py cusum_changepoint)."""
    return stats.cusum_changepoint(_t(spark, sf_dir, "events"))


@query(
    "op-knn-classify",
    oracle="""
    WITH topk AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label
      FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
      WHERE q.vec_id < 16
      QUALIFY row_number() OVER (
        PARTITION BY q.vec_id
        ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                 c.vec_id) <= 5),
    votes AS (
      SELECT query_id, label, count(*) AS votes
      FROM topk GROUP BY 1, 2),
    best AS (
      SELECT query_id, label AS pred_label, votes AS n_votes,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY votes DESC, label ASC) AS rn
      FROM votes)
    SELECT query_id, pred_label, n_votes FROM best WHERE rn = 1
    """,
)
def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-knn-classify: 5-NN majority-vote labels for 16 query vectors
    over the embedding corpus — rides the audited cosine_topk search
    path; the vote is two tiny shuffles with a (votes, -label) struct
    argmax (operators/similarity.py knn_classify)."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.knn_classify(
        emb, emb.filter(F.col("vec_id") < 16), "vec_id", "embedding",
        "label", k=5,
    )


# Shared CTE prefix: the mined co-purchase graph (support >= 2, a < c —
# support 3 leaves a near-empty matching at sf0.1; 2 gives a 2-4k-edge
# graph at every shipped SF).
_EDGES_CTE = """
    bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
    edges AS (
      SELECT x.i AS a, y.i AS c, count(*) AS support
      FROM bi x JOIN bi y ON x.b = y.b AND x.i < y.i
      GROUP BY 1, 2 HAVING count(*) >= 2)
"""


@query(
    "op-pagerank",
    oracle=f"""
    WITH {_EDGES_CTE},
    dir AS (
      SELECT a AS src, c AS dst FROM edges
      UNION ALL SELECT c, a FROM edges),
    deg AS (SELECT src, count(*) AS deg FROM dir GROUP BY 1),
    nodes AS (SELECT src AS node FROM deg),
    nn AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),
    r1 AS (
      SELECT nd.node,
             0.15 / (SELECT n FROM nn)
             + 0.85 * coalesce(sum(r0.rank / deg.deg), 0) AS rank
      FROM nodes nd
      LEFT JOIN dir ON dir.dst = nd.node
      LEFT JOIN deg ON deg.src = dir.src
      LEFT JOIN r0  ON r0.node = dir.src
      GROUP BY 1),
    r2 AS (
      SELECT nd.node,
             0.15 / (SELECT n FROM nn)
             + 0.85 * coalesce(sum(r1.rank / deg.deg), 0) AS rank
      FROM nodes nd
      LEFT JOIN dir ON dir.dst = nd.node
      LEFT JOIN deg ON deg.src = dir.src
      LEFT JOIN r1  ON r1.node = dir.src
      GROUP BY 1),
    r3 AS (
      SELECT nd.node,
             0.15 / (SELECT n FROM nn)
             + 0.85 * coalesce(sum(r2.rank / deg.deg), 0) AS rank
      FROM nodes nd
      LEFT JOIN dir ON dir.dst = nd.node
      LEFT JOIN deg ON deg.src = dir.src
      LEFT JOIN r2  ON r2.node = dir.src
      GROUP BY 1)
    SELECT node, round(rank, 6) AS rank, CAST(rn AS INT) AS rnk
    FROM (SELECT r3.*, row_number() OVER (ORDER BY rank DESC, node ASC)
                   AS rn
          FROM r3)
    WHERE rn <= 20
    """,
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-pagerank: top-20 PageRank (3 iterations, d=0.85) over the
    support>=2 co-purchase graph — edge-partitioned joins, lineage
    truncated per round, node count broadcast not collected
    (operators/graph.py pagerank; oracle unrolls the iteration as
    nested CTEs)."""
    li = _t(spark, sf_dir, "lineitem")
    edges = graph.basket_edges(li, "l_orderkey", "l_partkey", min_support=2)
    return graph.pagerank(edges, iters=3, damping=0.85, k=20)


@query(
    "op-graph-triangles",
    oracle=f"""
    WITH {_EDGES_CTE},
    tri AS (
      SELECT count(*) AS n_triangles
      FROM edges ab
      JOIN edges bc ON bc.a = ab.c
      JOIN edges ac ON ac.a = ab.a AND ac.c = bc.c),
    deg AS (
      SELECT node, count(*) AS deg FROM (
        SELECT a AS node FROM edges
        UNION ALL SELECT c FROM edges)
      GROUP BY 1),
    base AS (
      SELECT count(*) AS n_nodes,
             CAST(sum(deg) / 2 AS BIGINT) AS n_edges,
             CAST(sum(deg * (deg - 1) / 2) AS BIGINT) AS n_wedges
      FROM deg)
    SELECT n_nodes, n_edges, n_triangles,
           round(CASE WHEN n_wedges > 0
                      THEN 3.0 * n_triangles / n_wedges END, 4)
             AS clustering_coeff
    FROM base, tri
    """,
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-graph-triangles: triangle count + global clustering
    coefficient of the same mined graph — oriented a<b<c wedge probe +
    closure join (two linear equi-joins, never all-pairs); wedges from
    a degree agg (operators/graph.py triangle_stats)."""
    li = _t(spark, sf_dir, "lineitem")
    edges = graph.basket_edges(li, "l_orderkey", "l_partkey", min_support=2)
    return graph.triangle_stats(edges)
