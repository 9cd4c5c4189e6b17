"""ORC source/sink (SURVEY.md §2.9 format breadth).

The reference reads JSON and writes parquet only (proj-eng-dados/main.py:
119-157); a lake engine also meets ORC — the other columnar format with
predicate pushdown, column pruning, and splittable stripes, native in
Spark (spark.read.orc / df.write.orc, zero extra dependencies).

Same scale properties as the parquet path: the scan is distributed by
stripe, filters and projections push into the reader, and a partitioned
write lays out one directory per partition value for partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Columnar ORC sink; ``partition_by`` gives hive-style directory
    partitioning (partition pruning on read, exactly like the parquet
    sink in sources/parquet_source.py)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_orc(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Distributed ORC scan (stripe-splittable; pushdown/pruning apply).

    Pass ``schema`` when the layout may be EMPTY: a zero-row partitioned
    write produces no data files, so schema inference has nothing to read
    (UNABLE_TO_INFER_SCHEMA) — with the schema declared, an empty day reads
    back as a valid zero-row frame, which is what an idempotent nightly
    job needs."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)
