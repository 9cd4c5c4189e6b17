"""Relational batch 6: Spark-4 extension surfaces — custom Python
DataSource, Observation-based single-pass DQ, unpivot, and parquet
schema evolution.

- op-datasource-pages: the reference's paginated-page raw layer read
  through Spark 4's ``pyspark.sql.datasource`` plugin API (a registered
  ``page_json`` format with one InputPartition per page) instead of
  ``spark.read.json``. Same rows as op-json-scan — the point is the
  extension seam for paging protocols Spark has no built-in format for.
- op-dq-observed: the DQ counters computed by ``df.observe(...)`` — the
  metrics piggyback on an action the pipeline already runs (here a
  count), so the quality gate costs ZERO extra scans, vs. the dedicated
  aggregation pass of op-dq-suite. Same counters, same oracle shape.
- op-unpivot: wide→long melt with the native ``DataFrame.unpivot``
  (one Expand node, no per-column union re-scan).
- op-schema-evolution: two parquet batches with drifted schemas read
  back through ``mergeSchema`` — late columns arrive as nulls in old
  batches. The standard lakehouse drift story, pinned.

Float discipline: no new float arithmetic anywhere (raw parquet values
pass through untouched); counters are BIGINT-cast in the oracles.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .queries import _SCRATCH, _t, query


# ---------------------------------------------------------------------
# op-datasource-pages: custom Python DataSource (Spark 4 plugin API)
# ---------------------------------------------------------------------

@query(
    "op-datasource-pages",
    oracle="SELECT doc_id, lang, source FROM documents",
)
def q_datasource_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the dual-envelope page directory through the registered
    ``page_json`` Python DataSource: the driver lists pages once, each
    page parses in its own task (Arrow-batched back to the JVM), corrupt
    pages isolate as `_corrupt_path` rows instead of failing the scan.
    Fixture setup (.collect() of 500 docs to write the pages) is
    driver-side test scaffolding, not the operator path — the scan
    itself never routes rows through the driver."""
    from .session import ship_package
    from .sources.page_datasource import (
        CORRUPT_PATH_COL,
        PageFileDataSource,
        with_corrupt_col,
    )

    from .sources.page_datasource import write_page_fixture

    ship_package(spark)  # executors import the datasource module by name
    spark.dataSource.register(PageFileDataSource)

    docs = [
        r.asDict()
        for r in _t(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source")
        .collect()
    ]
    out = os.path.join(_SCRATCH, "datasource_pages")
    # bare-array + API envelopes + one corrupt page (must isolate, not fail)
    write_page_fixture(docs, out)

    record = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ])
    raw = (
        spark.read.format("page_json")
        .schema(with_corrupt_col(record))
        .option("path", out)
        .load()
    )
    return raw.filter(F.col(CORRUPT_PATH_COL).isNull()).drop(CORRUPT_PATH_COL)


# ---------------------------------------------------------------------
# op-dq-observed: zero-extra-scan DQ metrics via df.observe
# ---------------------------------------------------------------------

@query(
    "op-dq-observed",
    oracle="""
    SELECT CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_o_custkey,
           CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_o_orderdate,
           CAST(SUM(CASE WHEN NOT (month(o_orderdate) BETWEEN 1 AND 12)
                         THEN 1 ELSE 0 END) AS BIGINT) AS range_mes,
           CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS negative_o_totalprice
    FROM orders
    """,
)
def q_dq_observed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The op-dq-suite counters as OBSERVED metrics: `df.observe` attaches
    the four conditional sums to the scan the pipeline is already paying
    for (here a count action stands in for the silver write), so the
    quality gate adds no pass over the data — the 100 TB version of
    "check while you write". The observation result is re-lifted into a
    one-row DataFrame for the gate; a real pipeline would branch on it
    directly (see plans/pipeline.py for the abort path)."""
    from pyspark.sql import Observation

    ords = _t(spark, sf_dir, "orders")
    obs = Observation("dq")
    observed = ords.observe(
        obs,
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias(
            "null_o_custkey"
        ),
        F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0)).alias(
            "null_o_orderdate"
        ),
        F.sum(
            F.when(~F.month("o_orderdate").between(1, 12), 1).otherwise(0)
        ).alias("range_mes"),
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0)).alias(
            "negative_o_totalprice"
        ),
    )
    observed.count()  # the action the metrics ride on (stand-in for a write)
    m = obs.get
    schema = T.StructType([
        T.StructField("null_o_custkey", T.LongType()),
        T.StructField("null_o_orderdate", T.LongType()),
        T.StructField("range_mes", T.LongType()),
        T.StructField("negative_o_totalprice", T.LongType()),
    ])
    return spark.createDataFrame(
        [(m["null_o_custkey"], m["null_o_orderdate"], m["range_mes"],
          m["negative_o_totalprice"])],
        schema,
    )


# ---------------------------------------------------------------------
# op-unpivot: wide→long melt (native Expand, no union-of-scans)
# ---------------------------------------------------------------------

@query(
    "op-unpivot",
    oracle="""
    SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_size', CAST(p_size AS DOUBLE) FROM part
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long with `DataFrame.unpivot`: ONE scan feeding an Expand node
    (each row fans to one output row per value column) — the oracle's
    UNION ALL form re-scans the table per column, which is exactly what
    unpivot avoids at scale. Value columns unify to double before the
    melt (unpivot requires a common type)."""
    part = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").cast("double"),
        F.col("p_size").cast("double"),
    )
    return part.unpivot(
        ids=["p_partkey"],
        values=["p_retailprice", "p_size"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# ---------------------------------------------------------------------
# op-schema-evolution: mergeSchema over drifted parquet batches
# ---------------------------------------------------------------------

@query(
    "op-schema-evolution",
    oracle="""
    SELECT doc_id, source,
           CASE WHEN doc_id % 2 = 1 THEN lang END AS lang
    FROM documents
    """,
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema drift round-trip: batch 1 lands WITHOUT the `lang` column,
    batch 2 lands with it; `mergeSchema` unifies the footers at read time
    and back-fills nulls for the early batch. Footer merging is a
    driver-side metadata union — the data files are never rewritten
    (the cheap half of lakehouse schema evolution; widening types needs
    a rewrite and is intentionally out of scope)."""
    docs = _t(spark, sf_dir, "documents")
    out = os.path.join(_SCRATCH, "schema_evolution")
    shutil.rmtree(out, ignore_errors=True)
    docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "source").write.parquet(
        os.path.join(out, "batch=1")
    )
    docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "source", "lang"
    ).write.parquet(os.path.join(out, "batch=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(out, "batch=*")
    )
    return merged.select("doc_id", "source", "lang")
