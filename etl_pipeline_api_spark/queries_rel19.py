"""Relational batch 19 — distribution testing + collocation mining +
containment dedup (SURVEY.md §2.9 extensions).

- op-ks-drift: two-sample Kolmogorov–Smirnov drift per event type
  (first vs second half of each series) — the bucket-free companion to
  op-psi-drift, with an EXACT integer statistic numerator.
- op-chi2-independence: Pearson χ² + Cramér's V between two label
  columns — the hypothesis-test companion to op-mutual-info.
- op-pmi-bigrams: PMI collocation mining over the documents corpus —
  the phrase detector a tokenizer pipeline runs before vocab decisions.
- op-containment-dedup: near-superset pairs by shingle CONTAINMENT
  |S(a)∩S(b)|/min(|Sa|,|Sb|) — the asymmetric score Jaccard misses
  (a doc quoted whole inside a 10× larger one: J≈0.1, C=1.0).

All four DuckDB-oracle-gated (rows + schema + value hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import dedup, stats, text
from .queries import _t, query
from .queries_ext import _FUZZY_MAX_DF


@query(
    "op-ks-drift",
    oracle="""
    WITH s AS (
      SELECT event_type AS g, value AS v, epoch_us(ts) AS us
      FROM events WHERE value IS NOT NULL),
    m AS (SELECT g, (min(us) + max(us)) // 2 AS mid FROM s GROUP BY 1),
    t AS (
      SELECT s.g, v, CASE WHEN us >= mid THEN 1 ELSE 0 END AS cur
      FROM s JOIN m USING (g)),
    pv AS (
      SELECT g, v,
             sum(CASE WHEN cur = 0 THEN 1 ELSE 0 END) AS d_base,
             sum(cur) AS d_cur
      FROM t GROUP BY 1, 2),
    cum AS (
      SELECT g,
             sum(d_base) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_base,
             sum(d_cur) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_cur,
             sum(d_base) OVER (PARTITION BY g) AS n_base,
             sum(d_cur) OVER (PARTITION BY g) AS n_cur
      FROM pv),
    agg AS (
      SELECT g AS event_type,
             CAST(max(n_base) AS BIGINT) AS n_base,
             CAST(max(n_cur) AS BIGINT) AS n_cur,
             CAST(max(abs(c_base * n_cur - c_cur * n_base)) AS BIGINT)
               AS d_num
      FROM cum GROUP BY 1)
    SELECT event_type, n_base, n_cur, d_num,
           round(d_num / (n_base * n_cur), 6) AS ks_d,
           CASE WHEN n_base * n_cur > 0 THEN
             CAST(d_num / (n_base * n_cur)
                  > 1.358 * sqrt((n_base + n_cur) / (n_base * n_cur))
                  AS INTEGER) END AS drifted
    FROM agg
    """,
)
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-ks-drift: two-sample KS per event type, first vs second half
    of each series' time range (stats.ks_test) — integer-exact D
    numerator (max|c1·n2 − c2·n1|), one division at the end, the
    α=0.05 rejection bound as a gate flag."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return stats.ks_test(ev, "event_type", "value")


@query(
    "op-chi2-independence",
    oracle="""
    WITH joint AS (
      SELECT o_orderpriority AS x, o_orderstatus AS y, count(*) AS n_xy
      FROM orders
      WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
      GROUP BY 1, 2),
    k AS (
      SELECT count(DISTINCT x) AS kx, count(DISTINCT y) AS ky FROM joint),
    cells AS (
      SELECT n_xy,
             sum(n_xy) OVER ()               AS n,
             sum(n_xy) OVER (PARTITION BY x) AS n_x,
             sum(n_xy) OVER (PARTITION BY y) AS n_y
      FROM joint)
    SELECT CAST(max(n) AS BIGINT) AS n,
           CAST(kx AS INTEGER) AS n_levels_x,
           CAST(ky AS INTEGER) AS n_levels_y,
           CAST((kx - 1) * (ky - 1) AS INTEGER) AS dof,
           round(greatest(
                 sum((n_xy - (n_x * n_y) / n) * (n_xy - (n_x * n_y) / n)
                     / ((n_x * n_y) / n))
                 + max(n) - sum((n_x * n_y) / n), 0.0), 4) + 0.0 AS chi2,
           round(CASE WHEN least(kx - 1, ky - 1) > 0 THEN
             sqrt(greatest(
                  sum((n_xy - (n_x * n_y) / n) * (n_xy - (n_x * n_y) / n)
                       / ((n_x * n_y) / n))
                   + max(n) - sum((n_x * n_y) / n), 0.0)
                  / (max(n) * least(kx - 1, ky - 1))) END, 4) + 0.0
             AS cramers_v
    FROM cells, k GROUP BY kx, ky
    """,
)
def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-chi2-independence: Pearson χ² of independence between order
    priority and order status (stats.chi2_independence) — one joint
    groupBy over the fact table, marginals as window sums, observed-
    zero cells folded in closed form (Σ_missing e = n − Σ_present e)."""
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isNotNull()
        & F.col("o_orderstatus").isNotNull()
    )
    return stats.chi2_independence(o, "o_orderpriority", "o_orderstatus")


@query(
    "op-pmi-bigrams",
    oracle="""
    WITH tok0 AS (
      SELECT string_split_regex(lower(trim(text)), '\\s+') AS tokens
      FROM documents WHERE text IS NOT NULL),
    tk AS (SELECT list_filter(tokens, t -> t <> '') AS tokens FROM tok0),
    uc AS (
      SELECT w, count(*) AS c_w
      FROM (SELECT unnest(tokens) AS w FROM tk) GROUP BY 1),
    n1 AS (SELECT sum(c_w) AS n_unigrams FROM uc),
    bc AS (
      SELECT w1, w2, count(*) AS c_12 FROM (
        SELECT unnest(tokens[1:greatest(len(tokens) - 1, 0)]) AS w1,
               unnest(tokens[2:len(tokens)]) AS w2
        FROM tk WHERE len(tokens) >= 2)
      GROUP BY 1, 2),
    n2 AS (SELECT sum(c_12) AS n_bigrams FROM bc)
    SELECT w1, w2,
           CAST(c_12 AS BIGINT) AS c_12,
           CAST(u1.c_w AS BIGINT) AS c_1,
           CAST(u2.c_w AS BIGINT) AS c_2,
           CAST(n_bigrams AS BIGINT) AS n_bigrams,
           CAST(n_unigrams AS BIGINT) AS n_unigrams,
           round(ln((c_12 / n_bigrams)
                 / ((u1.c_w / n_unigrams) * (u2.c_w / n_unigrams))), 4)
             + 0.0 AS pmi
    FROM bc
    JOIN uc u1 ON bc.w1 = u1.w
    JOIN uc u2 ON bc.w2 = u2.w
    CROSS JOIN n1 CROSS JOIN n2
    WHERE c_12 >= 5
    """,
)
def q_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-pmi-bigrams: PMI collocation mining over the documents corpus
    (text.pmi_bigrams) — two vocabulary-sized explode→count passes, then
    broadcast joins attach unigram counts to the bigram frame; the five
    exact integer counts ride into the output so the single ln+round is
    the only float step."""
    return text.pmi_bigrams(
        _t(spark, sf_dir, "documents"), "doc_id", "text", min_count=5
    )


def _containment_oracle(max_df: int, threshold: float) -> str:
    """DuckDB twin of ``dedup.containment_pairs`` — same 3-gram shingle
    sets, same hot-shingle df cap (sizes recomputed on survivors), score
    = inter/min(|Sa|,|Sb|) with Jaccard riding along."""
    return f"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tokens
      FROM documents),
    sh0 AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(tokens)-2, 0)),
                    i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])) AS shingle
      FROM tok),
    keep AS (SELECT shingle FROM sh0 GROUP BY shingle
             HAVING count(*) <= {max_df}),
    sh AS (SELECT sh0.* FROM sh0 JOIN keep USING (shingle)),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           CAST(inter AS BIGINT) AS inter,
           CAST(least(sa.n, sb.n) AS BIGINT) AS n_small,
           CAST(greatest(sa.n, sb.n) AS BIGINT) AS n_big,
           round(inter / least(sa.n, sb.n), 4) AS containment,
           round(inter * 1.0 / (sa.n + sb.n - inter), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON id_a = sa.doc_id
    JOIN sizes sb ON id_b = sb.doc_id
    WHERE inter / least(sa.n, sb.n) >= {threshold}
"""


@query(
    "op-containment-dedup",
    oracle=_containment_oracle(max_df=_FUZZY_MAX_DF, threshold=0.8),
)
def q_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-containment-dedup: near-superset pairs at C ≥ 0.8 by shingle
    containment (dedup.containment_pairs) — the same two-shuffle
    shared-shingle join as op-dedup-fuzzy with the same df≤64
    boilerplate guard (see queries_ext._FUZZY_MAX_DF), scoring
    inter/min(|Sa|,|Sb|) so embedded copies surface even when symmetric
    Jaccard stays low."""
    return dedup.containment_pairs(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        threshold=0.8,
        max_df=_FUZZY_MAX_DF,
    )
