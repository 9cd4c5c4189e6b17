"""Engine facade — the one-object entry point a reference user switches to.

The reference (``/root/reference/proj-eng-dados/main.py``) exposes four
module-level stage functions over global path constants. The engine exposes
the same lifecycle (extract → bronze → silver → gold) plus the full operator
surface as methods over an owned SparkSession:

    from etl_pipeline_api_spark.engine import Engine

    eng = Engine()                              # builds the tuned session
    df = eng.read_parquet("/data/bronze")       # hive-aware scan
    df = eng.sql("SELECT ...")                  # SQL passthrough
    report = eng.dq(df, checks=[...])           # one-pass DQ gate
    eng.write_partitioned(df, "/data/silver")   # snappy, dynamic overwrite
    eng.run_pipeline(stages)                    # medallion runner

Everything is a thin delegation to the operator modules — the facade adds
discoverability, not behavior (each target documents its own scale shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .operators.dq import DQCheck, DQSuite
from .session import get_spark


class Engine:
    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark or get_spark()

    # -- sources / sinks ------------------------------------------------
    def read_parquet(self, path: str) -> DataFrame:
        from .sources.parquet_source import scan_parquet

        return scan_parquet(self.spark, path)

    def read_json_pages(self, path: str, record_schema) -> DataFrame:
        """Dual-envelope JSON scan with corrupt-record isolation (§2.1).
        ``record_schema`` is the explicit record StructType — declared, not
        inferred, for deterministic typing at scale (SURVEY §1.3)."""
        from .sources.json_source import scan_json_pages

        return scan_json_pages(self.spark, path, record_schema)

    def write_partitioned(
        self, df: DataFrame, path: str, partition_cols: list[str] = ("ano", "mes")
    ) -> None:
        from .sources.parquet_source import write_partitioned

        write_partitioned(df, path, list(partition_cols))

    # -- query surfaces -------------------------------------------------
    def sql(self, text: str) -> DataFrame:
        return self.spark.sql(text)

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    # -- quality --------------------------------------------------------
    def dq(
        self,
        df: DataFrame,
        checks: list[DQCheck],
        required_columns: list[str] | None = None,
    ) -> DataFrame:
        """One-pass violation counts (does not gate; see DQSuite.gate)."""
        return DQSuite(
            required_columns=list(required_columns or []), checks=checks
        ).violations_df(df)

    def dq_gate(
        self,
        df: DataFrame,
        checks: list[DQCheck],
        required_columns: list[str] | None = None,
    ) -> None:
        """Abort-before-write gate (the reference's silver gate semantics,
        main.py:234-239, hardened to raise instead of print-and-continue)."""
        DQSuite(
            required_columns=list(required_columns or []), checks=checks
        ).gate(df)

    # -- orchestration --------------------------------------------------
    def run_pipeline(self, pipeline) -> dict[str, DataFrame]:
        return pipeline.run(self.spark)
