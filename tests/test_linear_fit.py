"""stats.linear_fit — one-pass OLS/ridge via exact decimal sufficient
statistics + exact-rational driver solve (queries_rel18 gates it against
DuckDB; these tests pin the operator's algebra on constructed frames)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from etl_pipeline_api_spark.operators import stats


def _fit_map(df, feats, y, **kw):
    rows = stats.linear_fit(df, feats, y, **kw).collect()
    return {r["feature"]: r for r in rows}


@pytest.fixture(scope="module")
def design(spark):
    # integer features, exactly-linear target with binary-fraction coefs
    rows = [(i, (i * 7) % 13, (i * 3) % 5) for i in range(40)]
    df = spark.createDataFrame(rows, "a int, b int, c int")
    y = F.lit(2.5) + 3 * F.col("a") - 0.5 * F.col("b") + 1.25 * F.col("c")
    feats = [("a", F.col("a")), ("b", F.col("b")), ("c", F.col("c"))]
    return df, feats, y


def test_exact_recovery(design):
    df, feats, y = design
    m = _fit_map(df, feats, y)
    assert m["__intercept__"]["coef"] == 2.5
    assert m["a"]["coef"] == 3.0
    assert m["b"]["coef"] == -0.5
    assert m["c"]["coef"] == 1.25
    assert all(r["normal_eq_ok"] == 1 for r in m.values())
    assert m["a"]["r2"] == 1.0
    assert m["a"]["n_rows"] == 40


def test_xty_is_exact_sum(design):
    df, feats, y = design
    m = _fit_map(df, feats, y)
    expect = df.select(
        F.sum(F.col("a").cast("double") * y).alias("s")
    ).collect()[0]["s"]
    assert m["a"]["xty"] == pytest.approx(expect, abs=1e-6)


def test_singular_collinear(spark):
    df = spark.createDataFrame([(i, 2 * i) for i in range(10)], "a int, b int")
    m = _fit_map(
        df, [("a", F.col("a")), ("b", F.col("b"))], F.col("a") * 1.0
    )
    assert all(r["coef"] is None for r in m.values())
    assert all(r["normal_eq_ok"] == 0 for r in m.values())
    # sufficient stats still reported — the pass happened
    assert m["a"]["xty"] is not None


def test_empty_input(spark):
    df = spark.createDataFrame([], "a int")
    m = _fit_map(df.filter(F.lit(False)), [("a", F.col("a"))], F.col("a") * 1.0)
    assert m["a"]["n_rows"] == 0
    assert m["a"]["coef"] is None
    assert m["a"]["normal_eq_ok"] == 0


def test_ridge_slope_shrinkage_and_self_consistency(design):
    df, feats, y = design
    ols = _fit_map(df, feats, y)
    ridge = _fit_map(df, feats, y, l2=1e4)
    n2 = lambda m: sum(  # noqa: E731
        m[f]["coef"] ** 2 for f in ("a", "b", "c")
    )
    assert n2(ridge) < n2(ols)
    # the penalized solve still satisfies ITS normal equations exactly
    assert all(r["normal_eq_ok"] == 1 for r in ridge.values())
    # and r2 degrades but stays sane
    assert ridge["a"]["r2"] is not None and ridge["a"]["r2"] < 1.0


def test_noisy_target_r2_below_one(spark):
    rows = [(i, (i % 7) - 3) for i in range(50)]
    df = spark.createDataFrame(rows, "a int, noise int")
    y = 2 * F.col("a") + F.col("noise") * 0.125
    m = _fit_map(df, [("a", F.col("a"))], y)
    assert m["a"]["normal_eq_ok"] == 1
    assert m["a"]["r2"] is not None and 0.9 < m["a"]["r2"] < 1.0


def test_no_intercept(spark):
    df = spark.createDataFrame([(i,) for i in range(1, 20)], "a int")
    m = _fit_map(
        df, [("a", F.col("a"))], 4 * F.col("a") * 1.0, add_intercept=False
    )
    assert set(m) == {"a"}
    assert m["a"]["coef"] == 4.0
