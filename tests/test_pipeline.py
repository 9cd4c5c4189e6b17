from __future__ import annotations

import json

import pytest

from etl_pipeline_api_spark.operators.dq import DataQualityError
from etl_pipeline_api_spark.plans.gastos import build_pipeline
from etl_pipeline_api_spark.plans.pipeline import StageError
from tests.test_sources import _record, write_raw_pages


def _dirs(tmp_path):
    return {k: str(tmp_path / k) for k in ("raw", "bronze", "silver", "gold")}


def test_end_to_end_raw_to_gold(spark, tmp_path):
    d = _dirs(tmp_path)
    write_raw_pages(tmp_path / "raw", 24)
    pipe = build_pipeline(d["raw"], d["bronze"], d["silver"], d["gold"])
    pipe.run(spark)

    gold = spark.read.parquet(d["gold"])
    assert set(gold.columns) == {"ano", "mes", "nome_orgao", "total_gasto"}
    rows = gold.collect()
    # names standardized before aggregation → uppercase, trimmed keys
    assert all(r.nome_orgao.startswith("ORGAO ") for r in rows)
    # sum of all groups == sum of all valor strings coerced to double
    assert sum(r.total_gasto for r in rows) == pytest.approx(
        sum(100 + i + 0.5 for i in range(24))
    )
    # hive layout: ano/mes partition directories exist
    assert (tmp_path / "gold" / "ano=2017").exists()

    # silver: date parsed to a real date type
    silver = spark.read.parquet(d["silver"])
    assert dict(silver.dtypes)["data_pagamento"] == "date"


def test_dq_gate_aborts_silver_before_write(spark, tmp_path):
    d = _dirs(tmp_path)
    raw = tmp_path / "raw"
    raw.mkdir()
    recs = [_record(i) for i in range(8)] + [_record(99, mes=13)]  # range violation
    (raw / "page_1.json").write_text(json.dumps(recs))
    pipe = build_pipeline(d["raw"], d["bronze"], d["silver"], d["gold"])
    with pytest.raises(StageError) as e:
        pipe.run(spark)
    assert e.value.stage == "silver"
    assert isinstance(e.value.cause, DataQualityError)
    assert "range_mes" in e.value.cause.violations
    assert not (tmp_path / "silver").exists()  # gate fired before any write


def test_empty_input_guard(spark, tmp_path):
    d = _dirs(tmp_path)
    (tmp_path / "raw").mkdir()
    (tmp_path / "raw" / "page_1.json").write_text(json.dumps([]))
    pipe = build_pipeline(d["raw"], d["bronze"], d["silver"], d["gold"])
    with pytest.raises(StageError) as e:
        pipe.run(spark)
    assert e.value.stage == "bronze"


def test_engine_facade(spark, tmp_path):
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from etl_pipeline_api_spark.engine import Engine
    from etl_pipeline_api_spark.operators.dq import non_negative_check

    eng = Engine(spark)
    df = spark.createDataFrame(
        [Row(ano=2024, mes=1, valor=10.0), Row(ano=2024, mes=2, valor=-1.0)]
    )
    out = str(tmp_path / "part")
    eng.write_partitioned(df, out)
    back = eng.read_parquet(out)
    assert back.count() == 2
    viol = eng.dq(back, [non_negative_check("valor")]).collect()[0]
    assert viol["negative_valor"] == 1
    back.createOrReplaceTempView("facade_t")
    assert eng.sql("SELECT sum(valor) AS s FROM facade_t").collect()[0].s == 9.0
    import pytest as _pytest

    from etl_pipeline_api_spark.operators.dq import DataQualityError

    with _pytest.raises(DataQualityError):
        eng.dq_gate(back, [non_negative_check("valor")])


def test_engine_facade_operator_surface(spark, tmp_path):
    """The round-4 facade methods are thin delegations — one smoke each."""
    from pyspark.sql import Row

    from etl_pipeline_api_spark.engine import Engine

    eng = Engine(spark)
    docs = spark.createDataFrame([
        Row(doc_id=1, text="alpha beta gamma delta", lang="en"),
        Row(doc_id=2, text="alpha beta gamma delta", lang="en"),
        Row(doc_id=3, text="something else entirely here", lang="en"),
    ])
    # dedup: 1 and 2 are exact dups -> min id survives
    kept = {r.doc_id for r in eng.dedup_exact(docs, ["text"], "doc_id").collect()}
    assert kept == {1, 3}
    pairs = {(r.id_a, r.id_b) for r in eng.dedup_minhash(docs, "doc_id", "text").collect()}
    assert (1, 2) in pairs
    # orc round trip
    out = str(tmp_path / "orc")
    eng.write_orc(docs, out)
    assert eng.read_orc(out).count() == 3
    # sampling + diagnostics
    assert eng.stratified_sample(docs, ["lang"], "doc_id", 2).count() == 2
    rep = eng.skew_report(docs, "lang").collect()[0]
    assert rep.n_keys == 1 and rep.max_n == 3
    # similarity
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(4)], "vec_id long, embedding array<double>"
    )
    topk = eng.similar_topk(emb, emb.limit(1), "vec_id", "embedding", k=2)
    assert topk.count() == 2
    # curation capstone delegation
    assert eng.curate(docs, quality_min=0.0).count() <= 3
