"""Relational batch 18 — one-pass distributed model fitting (SURVEY.md
§2.9 analytics extensions).

The reference engine (/root/reference/proj-eng-dados/main.py) stops at
descriptive aggregation; a training-data pipeline also needs cheap
MODEL fitting over corpus statistics — e.g. calibrating a document-
quality regressor against a labeled signal — at a scale where anything
but a one-pass sufficient-statistics reduction is off the table.

``stats.linear_fit`` is that operator: X'X / X'y / y'y / n in ONE
map-combined aggregation (exact DECIMAL sums — partitioning- and
engine-independent), then an exact-rational K x K solve on the driver.
Gating strategy:

- op-linear-regression pins the COEFFICIENTS as oracle literals: the
  target is constructed exactly linear in the features with binary-
  fraction coefficients, and the exact-rational solve recovers them
  EXACTLY at any scale factor. The per-feature X'y column is
  recomputed by DuckDB from the raw documents table with the identical
  decimal casts, so the distributed aggregation itself is hash-pinned,
  not just the solve.
- op-ridge-regression exercises the l2 path. Ridge coefficients are
  data-dependent (no literal), so the gate pins the exact X'y stats
  plus two invariants that are theorems, not tolerances: the exact
  solve satisfies its own penalized normal equations (normal_eq_ok),
  and ||b_ridge||2 < ||b_ols||2 strictly when l2 > 0 and b_ols != 0
  (norm_shrunk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import stats
from .queries import _t, query

# the generating model for the gate target: y = 1.5 + 2*f1 - 0.25*f2
# + 0.5*f3 over integer text statistics — every coefficient is a binary
# fraction, so the target column is EXACT in double and on the 0.001
# decimal grid linear_fit sums on.
_B0, _B1, _B2, _B3 = 1.5, 2.0, -0.25, 0.5

# identical arithmetic in Spark and DuckDB: codepoint length and
# occurrence counts via length-difference (no regex dialect risk)
_ORACLE_FEATURES = """
        SELECT length(text)                                    AS f1,
               length(text) - length(replace(text, ' ', ''))   AS f2,
               length(text) - length(replace(text, 'e', ''))   AS f3
        FROM documents WHERE text IS NOT NULL
"""


def _doc_features(spark: SparkSession, sf_dir: str):
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    f1 = F.length("text")
    f2 = F.length("text") - F.length(F.regexp_replace("text", " ", ""))
    f3 = F.length("text") - F.length(F.regexp_replace("text", "e", ""))
    y = (
        F.lit(_B0)
        + F.lit(_B1) * f1
        + F.lit(_B2) * f2
        + F.lit(_B3) * f3
    )
    feats = [("f1", f1), ("f2", f2), ("f3", f3)]
    return docs, feats, y


def _oracle_xty(expr: str) -> str:
    """The DuckDB twin of linear_fit's exact decimal X'y sum."""
    return (
        "CAST(SUM(CAST(" + expr + " AS DECIMAL(18,0))"
        " * CAST(1.5 + 2*f1 - 0.25*f2 + 0.5*f3 AS DECIMAL(18,3))) AS DOUBLE)"
    )


@query(
    "op-linear-regression",
    oracle=f"""
    WITH f AS ({_ORACLE_FEATURES})
    SELECT * FROM (
      SELECT '__intercept__' AS feature, 1.5 AS coef,
             {_oracle_xty('1')} AS xty,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(1.0 AS DOUBLE) AS r2, CAST(1 AS INTEGER) AS normal_eq_ok
      FROM f
      UNION ALL
      SELECT 'f1', 2.0, {_oracle_xty('f1')},
             CAST(count(*) AS BIGINT), 1.0, 1 FROM f
      UNION ALL
      SELECT 'f2', -0.25, {_oracle_xty('f2')},
             CAST(count(*) AS BIGINT), 1.0, 1 FROM f
      UNION ALL
      SELECT 'f3', 0.5, {_oracle_xty('f3')},
             CAST(count(*) AS BIGINT), 1.0, 1 FROM f
    )
    """,
)
def q_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-linear-regression: fit y ~ 1 + f1 + f2 + f3 over per-document
    text statistics with stats.linear_fit (one exact-decimal pass +
    exact-rational solve). The target is exactly linear by construction,
    so OLS recovers the generating coefficients EXACTLY (coef literals
    in the oracle), r2 is exactly 1, and the X'y column hash-pins the
    distributed aggregation against DuckDB's identical decimal sums."""
    docs, feats, y = _doc_features(spark, sf_dir)
    return stats.linear_fit(docs, feats, y)


@query(
    "op-ridge-regression",
    oracle=f"""
    WITH f AS ({_ORACLE_FEATURES})
    SELECT * FROM (
      SELECT '__intercept__' AS feature, {_oracle_xty('1')} AS xty,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(1 AS INTEGER) AS normal_eq_ok,
             CAST(1 AS INTEGER) AS norm_shrunk
      FROM f
      UNION ALL
      SELECT 'f1', {_oracle_xty('f1')}, CAST(count(*) AS BIGINT), 1, 1 FROM f
      UNION ALL
      SELECT 'f2', {_oracle_xty('f2')}, CAST(count(*) AS BIGINT), 1, 1 FROM f
      UNION ALL
      SELECT 'f3', {_oracle_xty('f3')}, CAST(count(*) AS BIGINT), 1, 1 FROM f
    )
    """,
)
def q_ridge_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-ridge-regression: the l2 > 0 path of stats.linear_fit on the
    same design. Coefficients are data-dependent (not literal-able), so
    the gate pins the exact X'y stats plus two exact-arithmetic
    theorems: the rational solve satisfies its penalized normal
    equations, and the ridge solution norm strictly shrinks vs OLS."""
    docs, feats, y = _doc_features(spark, sf_dir)
    ols = stats.linear_fit(docs, feats, y, l2=0.0)
    ridge = stats.linear_fit(docs, feats, y, l2=1.0e6)
    # SLOPE-only norms: with the intercept unpenalized, ridge is
    # equivalent to centered ridge on the slopes + b0 = ybar - xbar'b,
    # so ||slopes_ridge|| < ||slopes_ols|| is the theorem — the full
    # vector is NOT (the intercept grows toward ybar as slopes shrink).
    # Both frames are K rows; the comparison is a broadcast of two
    # 1-row aggregates.
    slopes = F.col("feature") != "__intercept__"
    n_ols = ols.filter(slopes).agg(
        F.sum(F.col("coef") * F.col("coef")).alias("n2_ols")
    )
    n_ridge = ridge.filter(slopes).agg(
        F.sum(F.col("coef") * F.col("coef")).alias("n2_ridge")
    )
    gate = n_ols.crossJoin(n_ridge).select(
        (F.col("n2_ridge") < F.col("n2_ols")).cast("int").alias("norm_shrunk")
    )
    return ridge.select("feature", "xty", "n_rows", "normal_eq_ok").crossJoin(
        F.broadcast(gate)
    )
