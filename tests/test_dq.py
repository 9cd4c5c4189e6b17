from __future__ import annotations

import pytest
from pyspark.sql import Row

from etl_pipeline_api_spark.operators.dq import (
    DataQualityError,
    DQSuite,
    gastos_dq_suite,
    non_negative_check,
    not_null_check,
    range_check,
)


def _gastos_rows():
    ok = dict(ano=2017, mes=6, nome_orgao="X", nome_favorecido="Y", valor=10.0)
    return [
        Row(**ok),
        Row(**{**ok, "mes": 13}),          # range violation
        Row(**{**ok, "valor": -1.0}),      # non-negative violation
        Row(**{**ok, "nome_orgao": None}), # not-null violation
    ]


def test_suite_counts_violations_one_pass(spark):
    df = spark.createDataFrame(_gastos_rows())
    counts = gastos_dq_suite().run(df)
    assert counts["range_mes"] == 1
    assert counts["negative_valor"] == 1
    assert counts["null_nome_orgao"] == 1
    assert counts["null_nome_favorecido"] == 0


def test_gate_raises_and_passes(spark):
    dirty = spark.createDataFrame(_gastos_rows())
    with pytest.raises(DataQualityError) as e:
        gastos_dq_suite().gate(dirty)
    assert "range_mes" in e.value.violations

    clean = dirty.filter(
        "mes between 1 and 12 and valor >= 0 and nome_orgao is not null"
    )
    assert gastos_dq_suite().gate(clean) is clean


def test_checks_on_clean_data(spark):
    df = spark.createDataFrame([Row(a=1, b=5.0), Row(a=2, b=0.0)])
    suite = DQSuite(
        checks=[not_null_check("a"), range_check("a", 1, 12), non_negative_check("b")]
    )
    assert all(v == 0 for v in suite.run(df).values())


def test_table_diff_statuses(spark):
    from etl_pipeline_api_spark.operators.dq import table_diff

    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, None, None), (4, 40.0, "D")],
        "k long, v double, s string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "A"),        # unchanged
         (2, 25.0, "B"),        # changed (v)
         (3, None, None),       # unchanged — all-null compare cols still present
         (5, 50.0, "E")],       # added; key 4 removed
        "k long, v double, s string",
    )
    out = {r.k: r.status for r in table_diff(old, new, ["k"], ["v", "s"]).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "unchanged",
                   4: "removed", 5: "added"}
