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


def test_grouped_fit_per_group_models(spark):
    # two groups with DIFFERENT generating models: the grouped fit must
    # recover each group's own coefficients exactly
    rows = [("a", i, (i * 7) % 13) for i in range(30)] + [
        ("b", i, (i * 5) % 11) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "g string, x1 int, x2 int")
    y = F.when(F.col("g") == "a", 1.0 + 2 * F.col("x1") - 0.5 * F.col("x2"))\
         .otherwise(-3.0 + 0.25 * F.col("x1") + 1.5 * F.col("x2"))
    out = stats.grouped_linear_fit(
        df, "g", [("x1", F.col("x1")), ("x2", F.col("x2"))], y
    ).collect()
    m = {(r["g"], r["feature"]): r for r in out}
    assert m[("a", "__intercept__")]["coef"] == 1.0
    assert m[("a", "x1")]["coef"] == 2.0
    assert m[("a", "x2")]["coef"] == -0.5
    assert m[("b", "__intercept__")]["coef"] == -3.0
    assert m[("b", "x1")]["coef"] == 0.25
    assert m[("b", "x2")]["coef"] == 1.5
    assert all(r["normal_eq_ok"] == 1 for r in out)
    assert m[("a", "x1")]["n_rows"] == 30 and m[("b", "x1")]["n_rows"] == 30


def test_grouped_fit_degenerate_group_isolated(spark):
    # group "bad" is collinear (x2 = 2*x1): NULL coefs there, while the
    # healthy group is untouched
    rows = [("ok", i, (i * 3) % 7) for i in range(20)] + [
        ("bad", i, 2 * i) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "g string, x1 int, x2 int")
    y = F.col("x1") * 1.0 + F.col("x2") * 0.5
    out = stats.grouped_linear_fit(
        df, "g", [("x1", F.col("x1")), ("x2", F.col("x2"))], y
    ).collect()
    m = {(r["g"], r["feature"]): r for r in out}
    assert m[("bad", "x1")]["coef"] is None
    assert m[("bad", "x1")]["normal_eq_ok"] == 0
    assert m[("ok", "x1")]["coef"] == 1.0
    assert m[("ok", "x2")]["coef"] == 0.5
    assert m[("ok", "x1")]["normal_eq_ok"] == 1
