"""Parquet scan / hive-partitioned sink (SURVEY.md §2.1).

op-parquet-scan       ~ proj-eng-dados/main.py:198  (read all partitions)
op-parquet-scan-hive  ~ main.py:283-286             (hive partition discovery)
op-parquet-partitioned-sink ~ main.py:152-157, 259-264, 314-319

Spark gives partition discovery, predicate/partition pruning, and the
vectorized reader natively; the sink pins snappy + dynamic partition
overwrite (so re-running a month only rewrites that month — the reference's
whole-layer overwrite would be a full rewrite at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def scan_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Flat or hive-partitioned parquet scan; partition columns (e.g.
    ano/mes directory keys) are recovered automatically."""
    return spark.read.parquet(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str] = ("ano", "mes"),
    mode: str = "overwrite",
) -> None:
    """Snappy parquet partitioned by the reference's ano/mes layout.

    ``partitionOverwriteMode=dynamic`` scopes the overwrite to partitions
    present in ``df`` — incremental month loads don't clobber history.
    """
    (
        df.write.mode(mode)
        .option("compression", "snappy")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
