from __future__ import annotations

import datetime

from pyspark.sql import Row

from etl_pipeline_api_spark.operators import aggregations as agg


def test_groupby_sum_rename(spark):
    df = spark.createDataFrame(
        [
            Row(ano=2017, mes=1, nome_orgao="A", valor=1.5),
            Row(ano=2017, mes=1, nome_orgao="A", valor=2.5),
            Row(ano=2017, mes=2, nome_orgao="B", valor=3.0),
        ]
    )
    out = agg.groupby_sum(df, ["ano", "mes", "nome_orgao"], "valor")
    rows = {(r.ano, r.mes, r.nome_orgao): r.total_gasto for r in out.collect()}
    assert rows == {(2017, 1, "A"): 4.0, (2017, 2, "B"): 3.0}
    assert out.columns == ["ano", "mes", "nome_orgao", "total_gasto"]


def test_eda_profile_single_pass(spark):
    df = spark.createDataFrame(
        [
            Row(org="A", d=datetime.date(2017, 1, 1), v=1.0),
            Row(org="B", d=datetime.date(2017, 3, 1), v=2.0),
            Row(org="A", d=datetime.date(2017, 2, 1), v=3.005),
        ]
    )
    row = agg.eda_profile(df, "org", "d", "v").collect()[0]
    assert row.n_rows == 3
    assert row.n_distinct == 2
    assert row.min_date == datetime.date(2017, 1, 1)
    assert row.max_date == datetime.date(2017, 3, 1)
    assert row.mean_value == 2.0

def test_count_min_max_mean(spark):
    df = spark.createDataFrame([Row(x=1.0), Row(x=2.0), Row(x=4.0)])
    assert agg.count_rows(df) == 3
    mm = agg.min_max(df, "x").collect()[0]
    assert (mm.min_value, mm.max_value) == (1.0, 4.0)
    assert agg.mean_round(df, "x").collect()[0].mean_value == 2.33
