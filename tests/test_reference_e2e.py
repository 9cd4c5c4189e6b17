"""End-to-end runs against the REAL reference checkout
(/root/reference/proj-eng-dados/dataset) — not fixtures.

Pins the engine against the reference's own artifacts:
- the 28-field GASTOS_RECORD schema against the real raw page envelopes,
- the bronze->gold recomputation facts BASELINE.md documents (recomputing
  gold from the committed silver yields 420 groups / 7 orgaos — the
  committed layers are snapshots of DIFFERENT runs, so layer-vs-layer
  equality is intentionally NOT asserted).
"""

import os

import pytest
from pyspark.sql import functions as F

from etl_pipeline_api_spark.plans.gastos import (
    GASTOS_RECORD,
    build_pipeline,
    gold_transform,
)
from etl_pipeline_api_spark.sources import json_source, parquet_source

REF = "/root/reference/proj-eng-dados/dataset"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present"
)


def test_gold_recomputed_from_committed_silver(spark):
    """BASELINE.md: gold recomputed from the committed silver layer is
    420 (ano, mes, nome_orgao) groups over 7 distinct orgaos."""
    silver = parquet_source.scan_parquet(spark, f"{REF}/silver")
    gold = gold_transform(silver)
    rows = gold.collect()
    assert len(rows) == 420
    assert len({r.nome_orgao for r in rows}) == 7
    # valor semantics: silver's valor is upper/trimmed string in the committed
    # layer? No — silver committed valor is numeric; the sum must be finite
    # and positive for every group (reference data is spend amounts).
    assert all(r.total_gasto is not None for r in rows)


def test_raw_scan_pins_declared_schema(spark):
    """The declared 28-field schema reads the real raw page files: every
    field lands, row count matches BASELINE.md's 1,021 files x 1,000
    records, and no row falls into the corrupt-record bucket."""
    raw = json_source.scan_json_pages(spark, f"{REF}/raw", GASTOS_RECORD)
    assert len(raw.schema.fields) == len(GASTOS_RECORD.fields) == 28
    assert raw.count() == 1_021_000
    # ano/mes must be parseable for every record (partition keys downstream)
    bad = raw.filter(F.col("ano").isNull() | F.col("mes").isNull()).count()
    assert bad == 0


def test_full_pipeline_over_reference_raw(spark, tmp_path):
    """bronze -> silver -> gold over the real raw layer, writes to tmp.
    Asserts layer row conservation (bronze == raw count; silver == bronze —
    the DQ gate must pass on real data) and that gold groups exactly match
    an independent in-engine recomputation from the silver output."""
    d = {n: str(tmp_path / n) for n in ("bronze", "silver", "gold")}
    pipe = build_pipeline(f"{REF}/raw", d["bronze"], d["silver"], d["gold"])
    pipe.run(spark)

    bronze = spark.read.parquet(d["bronze"])
    silver = spark.read.parquet(d["silver"])
    gold = spark.read.parquet(d["gold"])
    assert bronze.count() == 1_021_000
    assert silver.count() == 1_021_000  # DQ gate passed, nothing dropped
    # partition layout: hive ano=/mes= dirs exist as in main.py:152-157
    assert any(p.startswith("ano=") for p in os.listdir(d["bronze"]))

    recomputed = gold_transform(silver)
    got = {
        (r.ano, r.mes, r.nome_orgao, r.total_gasto) for r in gold.collect()
    }
    want = {
        (r.ano, r.mes, r.nome_orgao, r.total_gasto)
        for r in recomputed.collect()
    }
    assert got == want
