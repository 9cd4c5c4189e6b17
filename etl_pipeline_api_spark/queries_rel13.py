"""Relational batch 13 — time-series decomposition, privacy risk, and
distributed resampling (SURVEY.md §2.9 extensions).

- op-grouped-trend: per-series OLS slope/intercept over hourly counts,
  closed-form from exact INTEGER sums (engine-identical doubles).
- op-seasonality: one-way ANOVA η² — how much hourly variance the
  hour-of-day profile explains, again from integer sums-of-squares.
- op-k-anonymity: k-anonymity + l-diversity re-identification profile
  over quasi-identifier equivalence classes — the structural privacy
  gate beside text.pii_redact's content scrubbing.
- op-bootstrap-ci: Poisson-bootstrap CI for the mean — per-row
  DETERMINISTIC Poisson(1) weights from the det_key mixer, so both
  engines replay the identical resample and the interval itself is
  oracle-checked (a with-replacement resample would need a global
  shuffle per replicate; the Poisson form is row-local).

All DuckDB-oracle-gated; every stochastic-looking quantity is a pure
function of row ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import stats
from .queries import _t, query


@query(
    "op-grouped-trend",
    oracle="""
    WITH b AS (
      SELECT event_type,
             epoch_us(date_trunc('hour', ts)) // 3600000000 AS h,
             count(*) AS y
      FROM events GROUP BY 1, 2),
    x AS (
      SELECT event_type,
             h - min(h) OVER (PARTITION BY event_type) AS x, y
      FROM b),
    a AS (
      SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM x GROUP BY 1)
    SELECT event_type, n AS n_points,
           round(CASE WHEN n * sxx - sx * sx != 0
                      THEN (n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx)
                 END, 6) AS slope,
           round((sy - (n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx)
                        * sx) / n, 4) AS intercept
    FROM a
    """,
)
def q_grouped_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-grouped-trend: per-event-type OLS trend over hourly counts —
    one bucket agg, one min-window re-zero, closed-form normal
    equations from exact integer sums (operators/stats.py
    grouped_trend)."""
    return stats.grouped_trend(_t(spark, sf_dir, "events"))


@query(
    "op-seasonality",
    oracle="""
    WITH b AS (
      SELECT event_type, date_trunc('hour', ts) AS b, count(*) AS y
      FROM events GROUP BY 1, 2),
    c AS (
      SELECT event_type, hour(b) AS hod, count(*) AS nh,
             sum(y) AS sh, sum(y * y) AS sh2
      FROM b GROUP BY 1, 2),
    a AS (
      SELECT event_type, sum(nh) AS n, sum(sh) AS sy, sum(sh2) AS sy2,
             sum(CAST(sh * sh AS DOUBLE) / nh) AS ssb_raw
      FROM c GROUP BY 1)
    SELECT event_type, CAST(n AS BIGINT) AS n_buckets,
           round(CASE WHEN sy2 - CAST(sy * sy AS DOUBLE) / n > 0
                      THEN (ssb_raw - CAST(sy * sy AS DOUBLE) / n)
                           / (sy2 - CAST(sy * sy AS DOUBLE) / n)
                 END, 4) AS eta2
    FROM a
    """,
)
def q_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-seasonality: hour-of-day variance share (ANOVA eta-squared)
    per event type — two stacked integer aggs, one final division
    (operators/stats.py seasonality_strength)."""
    return stats.seasonality_strength(_t(spark, sf_dir, "events"))


@query(
    "op-k-anonymity",
    oracle="""
    WITH c AS (
      SELECT o_orderstatus, o_orderpriority,
             date_trunc('month', o_orderdate) AS m,
             count(*) AS sz,
             count(DISTINCT o_custkey) AS ell
      FROM orders GROUP BY 1, 2, 3)
    SELECT CAST(sum(sz) AS BIGINT) AS n_rows,
           count(*) AS n_classes,
           min(sz) AS k_anonymity,
           min(ell) AS l_diversity,
           CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
             AS n_rows_below_k,
           round(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) * 100.0
                 / sum(sz), 2) AS pct_rows_below_k
    FROM c
    """,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-k-anonymity: re-identification risk profile of orders under
    the (status, priority, order-month) quasi-identifier with customer
    as the sensitive attribute — one equivalence-class groupBy + one
    profile agg (operators/stats.py k_anonymity_profile)."""
    o = _t(spark, sf_dir, "orders")
    return stats.k_anonymity_profile(
        o.withColumn("m", F.date_trunc("month", F.col("o_orderdate"))),
        ["o_orderstatus", "o_orderpriority", "m"],
        "o_custkey",
        k_threshold=5,
    )


@query(
    "op-bootstrap-ci",
    oracle="""
    WITH rep AS (
      SELECT o_orderkey AS id, o_totalprice AS v, t.range AS r
      FROM orders CROSS JOIN range(50) t),
    k AS (
      SELECT r, v,
             (((id * 50 + r) * 2654435761) % 4294967296)
               / 4294967296.0 AS u
      FROM rep),
    w AS (
      SELECT r, v,
             CASE WHEN u < 0.36787944117144233 THEN 0
                  WHEN u < 0.7357588823428847  THEN 1
                  WHEN u < 0.9196986029286058  THEN 2
                  WHEN u < 0.9810118431238462  THEN 3
                  WHEN u < 0.9963401531726563  THEN 4
                  ELSE 5 END AS w
      FROM k),
    means AS (
      SELECT r, sum(v * w) / sum(w) AS m FROM w GROUP BY 1)
    SELECT count(*) AS n_replicates,
           round(avg(m), 4) AS mean,
           round(quantile_cont(m, 0.025), 4) AS ci_lo,
           round(quantile_cont(m, 0.975), 4) AS ci_hi
    FROM means
    """,
)
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-bootstrap-ci: 95% Poisson-bootstrap CI for mean order value —
    50 deterministic row-local resamples (det_key-mixed Poisson(1)
    weights, decimal-widened so 100 TB ids don't overflow), one
    replicate agg, percentiles over the 50-row means frame
    (operators/stats.py bootstrap_mean_ci)."""
    return stats.bootstrap_mean_ci(
        _t(spark, sf_dir, "orders"), "o_orderkey", "o_totalprice",
        n_replicates=50,
    )


@query(
    "op-ab-welch",
    oracle="""
    WITH m AS (
      SELECT CAST(user_id % 2 AS INT) AS variant, value AS v
      FROM events WHERE event_type = 'purchase'),
    bv AS (
      SELECT variant, count(*) AS n, avg(v) AS m, var_samp(v) AS s2
      FROM m GROUP BY 1),
    w AS (
      SELECT sum(CASE WHEN variant = 0 THEN n END) AS n_a,
             sum(CASE WHEN variant = 1 THEN n END) AS n_b,
             max(CASE WHEN variant = 0 THEN m END) AS m_a,
             max(CASE WHEN variant = 1 THEN m END) AS m_b,
             max(CASE WHEN variant = 0 THEN s2 END) AS s2_a,
             max(CASE WHEN variant = 1 THEN s2 END) AS s2_b
      FROM bv)
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           round(m_a, 4) AS mean_a, round(m_b, 4) AS mean_b,
           round(CASE WHEN n_a > 1 AND n_b > 1
                       AND s2_a / n_a + s2_b / n_b > 0
                      THEN (m_b - m_a) / sqrt(s2_a / n_a + s2_b / n_b)
                 END, 4) AS t,
           round(CASE WHEN n_a > 1 AND n_b > 1
                       AND s2_a / n_a + s2_b / n_b > 0
                      THEN power(s2_a / n_a + s2_b / n_b, 2)
                           / (power(s2_a / n_a, 2) / (n_a - 1)
                              + power(s2_b / n_b, 2) / (n_b - 1))
                 END, 2) AS df
    FROM w
    """,
)
def q_ab_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-ab-welch: Welch unequal-variance t-test on purchase VALUE
    between the deterministic user_id%2 variants — the continuous-
    metric companion to op-ab-test's proportions z; one filtered
    map-combined agg, Welch statistic + Satterthwaite df on the 2-row
    frame, NULL-guarded (operators/stats.py welch_t_test)."""
    return stats.welch_t_test(_t(spark, sf_dir, "events"))


@query(
    "op-cuped",
    oracle="""
    WITH m AS (
      SELECT user_id, epoch_us(ts) AS us, value FROM events
      WHERE event_type = 'purchase'),
    sp AS (SELECT (min(us) + max(us)) // 2 AS mid FROM m),
    pu AS (
      SELECT user_id,
             sum(CASE WHEN us < mid THEN value ELSE 0.0 END) AS x,
             sum(CASE WHEN us >= mid THEN value ELSE 0.0 END) AS y
      FROM m, sp GROUP BY 1),
    s AS (
      SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      FROM pu),
    d AS (
      SELECT n,
             sxx / n - (sx / n) * (sx / n) AS var_x,
             syy / n - (sy / n) * (sy / n) AS var_y,
             sxy / n - (sx / n) * (sy / n) AS cov
      FROM s)
    SELECT CAST(n AS BIGINT) AS n_users,
           round(CASE WHEN var_x > 0 THEN cov / var_x END, 4) + 0.0 AS theta,
           round(var_y, 4) + 0.0 AS var_y,
           round(CASE WHEN var_x > 0 THEN var_y - cov * cov / var_x
                      ELSE var_y END, 4) + 0.0 AS var_yadj,
           round(CASE WHEN var_y > 0
                      THEN 100.0 * (1 - (CASE WHEN var_x > 0
                                    THEN var_y - cov * cov / var_x
                                    ELSE var_y END) / var_y) END, 2) + 0.0
             AS reduction_pct
    FROM d
    """,
)
def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-cuped: CUPED variance reduction for purchase value — pre-period
    spend as the control covariate, theta = cov/var from one
    |users|-frame agg of raw sums; var(Y-thetaX) = var_y - cov^2/var_x
    (operators/stats.py cuped_adjustment)."""
    return stats.cuped_adjustment(_t(spark, sf_dir, "events"))
