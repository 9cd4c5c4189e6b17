from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row

from etl_pipeline_api_spark.operators import cleaning


def test_cast_int_and_nullable(spark):
    df = spark.createDataFrame(
        [Row(a="3", b="x"), Row(a="7", b="12"), Row(a=None, b=None)]
    )
    strict = cleaning.cast_int(df, ["a"])
    assert [r.a for r in strict.orderBy("a").collect()] == [None, 3, 7]
    coerced = cleaning.cast_nullable_int(df, ["b"])
    assert {r.b for r in coerced.collect()} == {None, 12}


def test_numeric_coerce_fillna(spark):
    df = spark.createDataFrame(
        [Row(valor="428.14"), Row(valor="abc"), Row(valor=None), Row(valor="-10.00")]
    )
    out = cleaning.numeric_coerce_fillna(df, "valor")
    assert sorted(r.valor for r in out.collect()) == [-10.0, 0.0, 0.0, 428.14]


def test_parse_date_coerce(spark):
    df = spark.createDataFrame(
        [Row(d="2017-12-01"), Row(d="not-a-date"), Row(d=None)]
    )
    out = cleaning.parse_date(df, ["d"])
    assert {r.d for r in out.collect()} == {datetime.date(2017, 12, 1), None}


def test_upper_trim_null_preserving(spark):
    df = spark.createDataFrame([Row(n="  ministério x "), Row(n=None)])
    out = cleaning.upper_trim(df, ["n"])
    assert {r.n for r in out.collect()} == {"MINISTÉRIO X", None}


def test_require_columns(spark):
    df = spark.createDataFrame([Row(ano=2017, mes=12)])
    cleaning.require_columns(df, ["ano", "mes"])
    with pytest.raises(cleaning.MissingColumnsError):
        cleaning.require_columns(df, ["ano", "nome_orgao"])


def test_is_empty(spark):
    df = spark.createDataFrame([Row(x=1)])
    assert not cleaning.is_empty(df)
    assert cleaning.is_empty(df.filter("x > 1"))
