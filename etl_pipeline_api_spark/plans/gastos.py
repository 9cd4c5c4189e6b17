"""The reference pipeline end-to-end, Spark-first: raw JSON → bronze →
silver → gold over the gastos data model (SURVEY.md §1, §3).

Stage semantics (citations into /root/reference/proj-eng-dados/main.py):
- bronze (main.py:104-164): dual-envelope JSON scan → declared schema →
  partition-key int casts → partitioned parquet.
- silver (main.py:189-267): valor coerce+fillna(0) → upper/trim 6 name cols →
  nullable-int casts → DQ GATE (aborts before write) → date parse →
  partitioned parquet.
- gold (main.py:270-323): hive scan → required-cols guard → groupby-sum →
  rename → partitioned parquet.

Differences by design (SURVEY §7 "semantic deltas"): null-preserving
upper/trim; fail-fast stages; dynamic partition overwrite so an incremental
month load rewrites only that month.
"""

from __future__ import annotations

from functools import partial

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..operators import aggregations as agg
from ..operators import cleaning
from ..operators.dq import gastos_dq_suite
from ..sources import json_source, parquet_source
from .pipeline import Pipeline, Stage

NAME_COLS = [
    "nome_orgao", "nome_favorecido", "nome_acao",
    "nome_programa", "nome_funcao", "nome_grupo_despesa",
]

# Declared 28-field record schema (SURVEY §1.3) — deterministic, no inference.
GASTOS_RECORD = T.StructType(
    [T.StructField(n, T.LongType(), True) for n in (
        "codigo_elemento_despesa", "codigo_funcao", "codigo_grupo_despesa",
        "codigo_orgao", "codigo_orgao_superior", "codigo_programa",
        "codigo_subfuncao", "codigo_unidade_gestora",
    )]
    + [T.StructField(n, T.StringType(), True) for n in (
        "codigo_acao", "codigo_favorecido", "data_pagamento",
        "data_pagamento_original", "gestao_pagamento", "linguagem_cidada",
        "nome_acao", "nome_elemento_despesa", "nome_favorecido", "nome_funcao",
        "nome_grupo_despesa", "nome_orgao", "nome_orgao_superior",
        "nome_programa", "nome_subfuncao", "nome_unidade_gestora",
        "numero_documento", "valor",
    )]
    + [T.StructField("ano", T.LongType(), True), T.StructField("mes", T.LongType(), True)]
)


def bronze_transform(df: DataFrame) -> DataFrame:
    cleaning.require_columns(df, ["ano", "mes"])  # main.py:135-139
    return cleaning.cast_int(df, ["ano", "mes"])  # main.py:143-144


def silver_transform(df: DataFrame) -> DataFrame:
    df = cleaning.numeric_coerce_fillna(df, "valor")        # main.py:212-213
    df = cleaning.upper_trim(df, NAME_COLS)                 # main.py:216-226
    df = cleaning.cast_nullable_int(df, ["ano", "mes"])     # main.py:229-231
    return df


def silver_post_dq(df: DataFrame) -> DataFrame:
    # date parse happens AFTER the DQ gate in the reference (main.py:252-253)
    return cleaning.parse_date(df, ["data_pagamento"])


def gold_transform(df: DataFrame) -> DataFrame:
    cleaning.require_columns(df, ["ano", "mes", "nome_orgao", "valor"])  # main.py:295-298
    return agg.groupby_sum(df, ["ano", "mes", "nome_orgao"], "valor")    # main.py:303-307


def build_pipeline(raw_dir: str, bronze_dir: str, silver_dir: str, gold_dir: str) -> Pipeline:
    sink = partial(parquet_source.write_partitioned, partition_cols=["ano", "mes"])
    dq = gastos_dq_suite()
    return Pipeline(
        stages=[
            Stage(
                "bronze",
                read=lambda s: json_source.scan_json_pages(s, raw_dir, GASTOS_RECORD),
                transform=bronze_transform,
                write=lambda df: sink(df, bronze_dir),
            ),
            Stage(
                "silver",
                read=lambda s: parquet_source.scan_parquet(s, bronze_dir),
                transform=silver_transform,
                dq=dq,  # gate sits between transform and write (main.py:234-239)
                write=lambda df: sink(silver_post_dq(df), silver_dir),
            ),
            Stage(
                "gold",
                read=lambda s: parquet_source.scan_parquet(s, silver_dir),
                transform=gold_transform,
                write=lambda df: sink(df, gold_dir),
            ),
        ]
    )
