"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``etl_pipeline_api_spark`` (see SURVEY.md §2 for the
operator inventory each query name refers to).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_pipeline_api_spark.queries import ORACLES, QUERIES  # noqa: E402
import etl_pipeline_api_spark.queries_ext  # noqa: E402,F401  (registers extension queries)
import etl_pipeline_api_spark.queries_rel  # noqa: E402,F401  (registers relational-breadth queries)
import etl_pipeline_api_spark.queries_rel2  # noqa: E402,F401  (registers second breadth batch)
import etl_pipeline_api_spark.queries_corpus  # noqa: E402,F401  (registers corpus-curation batch 2)
import etl_pipeline_api_spark.queries_corpus2  # noqa: E402,F401  (registers corpus-layout batch 3)
import etl_pipeline_api_spark.queries_rel3  # noqa: E402,F401  (registers relational batch 3)
import etl_pipeline_api_spark.queries_rel4  # noqa: E402,F401  (registers relational batch 4)
import etl_pipeline_api_spark.queries_layout  # noqa: E402,F401  (registers physical-layout queries)
import etl_pipeline_api_spark.queries_rel5  # noqa: E402,F401  (registers relational batch 5)
import etl_pipeline_api_spark.queries_corpus3  # noqa: E402,F401  (registers corpus-quality batch 4)
import etl_pipeline_api_spark.queries_corpus4  # noqa: E402,F401  (registers corpus batch 5)
import etl_pipeline_api_spark.queries_rel6  # noqa: E402,F401  (registers relational batch 6)
import etl_pipeline_api_spark.queries_rel7  # noqa: E402,F401  (registers relational batch 7)
import etl_pipeline_api_spark.queries_rel8  # noqa: E402,F401  (registers relational batch 8)
import etl_pipeline_api_spark.queries_rel9  # noqa: E402,F401  (registers relational batch 9)
import etl_pipeline_api_spark.queries_rel10  # noqa: E402,F401  (registers relational batch 10)
import etl_pipeline_api_spark.queries_rel11  # noqa: E402,F401  (registers relational batch 11)
import etl_pipeline_api_spark.queries_rel12  # noqa: E402,F401  (registers relational batch 12)
import etl_pipeline_api_spark.queries_rel13  # noqa: E402,F401  (registers relational batch 13)
import etl_pipeline_api_spark.queries_rel14  # noqa: E402,F401  (registers relational batch 14)
import etl_pipeline_api_spark.queries_rel15  # noqa: E402,F401  (registers relational batch 15)
import etl_pipeline_api_spark.queries_rel16  # noqa: E402,F401  (registers relational batch 16)
import etl_pipeline_api_spark.queries_rel17  # noqa: E402,F401  (registers relational batch 17: partsupp TPC-H four)
import etl_pipeline_api_spark.queries_rel18  # noqa: E402,F401  (registers relational batch 18: one-pass model fitting)
import etl_pipeline_api_spark.queries_rel19  # noqa: E402,F401  (registers relational batch 19: KS/chi2 tests, PMI phrases, containment dedup)
import etl_pipeline_api_spark.queries_rel20  # noqa: E402,F401  (registers relational batch 20: count-min frequency sketch)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the reference's gold aggregation re-expressed over the
    star schema: total spend by year/month/org-analog) on sf0.001."""
    return QUERIES["op-groupby-sum"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; non-SQL-expressible ops are omitted
    (driver records a rows-only check for those)."""
    return dict(ORACLES)
