"""Physical data layout: z-order clustering and small-file compaction.

At 100 TB the scan is the query: a selective 2-D predicate against a
layout that is sorted on neither column reads EVERY file, because
per-file min/max stats are useless when both columns span their full
range in every file. Interleaving the key bits (Morton / z-order) and
range-partitioning on the interleaved value clusters rows so each file
covers a small rectangle of the key space — parquet footer stats then
prune whole files driver-side before a single byte is read. This is the
same layout strategy `OPTIMIZE ZORDER BY` applies in lakehouse engines,
built here from plain DataFrame ops: an arithmetic projection, one range
shuffle, a sorted write.

Compaction attacks the other scan killer: a table written by many small
triggers (streaming micro-batches, per-task output) degrades into
thousands of KB-scale files whose open/footer overhead dominates. One
range-free repartition to size-targeted files restores scan throughput;
content is bit-identical (oracle-checked).

Everything is JVM expression arithmetic — no UDFs, no driver collects.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def scale_to_int(col: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Affine-map a numeric column from [lo, hi] onto [0, 2^bits), clamped.

    The caller supplies the domain bounds (known, or one cheap global agg)
    so the mapping is a pure row-local projection — no pass over the data
    hides inside the expression. floor() keeps the arithmetic exactly
    reproducible in any engine that has IEEE doubles.
    """
    span = float(hi) - float(lo)
    top = (1 << bits) - 1
    scaled = F.floor((col - F.lit(float(lo))) / F.lit(span) * F.lit(float(1 << bits)))
    return F.least(F.greatest(scaled.cast("long"), F.lit(0)), F.lit(top))


def zorder_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton code: interleave the low `bits` of two non-negative ints.

    Bit b of x lands at position 2b, bit b of y at 2b+1 — adjacent z
    values differ in few low bits of either key, which is the clustering
    property the range partitioner exploits. Built as a balanced tree of
    bitwise ORs over 2*bits disjoint-bit terms (all JVM-side, one
    projection, whole-stage codegen keeps it in registers).
    """
    terms = []
    for b in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b))
        terms.append(F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1))
    # balanced OR tree: depth log2(2*bits) instead of a 2*bits-deep chain
    while len(terms) > 1:
        terms = [
            terms[i].bitwiseOR(terms[i + 1]) if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return terms[0]


def zorder_sql(x: str, y: str, bits: int = 16) -> str:
    """The exact same Morton arithmetic as ANSI SQL text (oracle twin).

    Disjoint bit positions mean the OR of terms equals their SUM, which
    every dialect can express without bitwise-OR support.
    """
    terms = []
    for b in range(bits):
        terms.append(f"((({x} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({y} >> {b}) & 1) << {2 * b + 1})")
    return " + ".join(terms)


def write_zordered(
    df: DataFrame,
    zcol: Column,
    path: str,
    n_files: int,
) -> None:
    """Cluster `df` into `n_files` parquet files by z-value range.

    repartitionByRange samples the z distribution and assigns contiguous
    z ranges to files (one range shuffle — the unavoidable cost of any
    global re-clustering); the within-partition sort makes row-group
    stats monotone inside each file, so both file-level AND row-group-
    level pruning engage on read. At cluster scale `n_files` is
    ceil(table_bytes / target_file_size), not a constant.
    """
    zname = "__z"
    (
        df.withColumn(zname, zcol)
        .repartitionByRange(n_files, zname)
        .sortWithinPartitions(zname)
        .drop(zname)
        .write.mode("overwrite")
        .parquet(path)
    )


def compact(
    spark_df: DataFrame,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    input_bytes: int | None = None,
) -> int:
    """Rewrite `spark_df` at `path` in size-targeted files; returns file count.

    File count = ceil(input_bytes / target_file_bytes), where input_bytes
    defaults to the source's scan statistics (sizeInBytes from the
    relation — metadata, not a data pass). Coalesce-style repartition(n)
    is a round-robin shuffle; for compaction that is the right tool
    (purely size-driven, no key semantics to preserve — keyed layouts go
    through write_zordered / bucketed_table instead).
    """
    if input_bytes is None:
        input_bytes = int(
            spark_df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    n = max(1, math.ceil(input_bytes / target_file_bytes))
    spark_df.repartition(n).write.mode("overwrite").parquet(path)
    return n


def global_row_index(
    df: DataFrame,
    order_col: str | list[str],
    n_parts: int = 32,
    idx_col: str = "idx",
) -> DataFrame:
    """Contiguous 0-based global row index in `order_col` order — the
    distributed zipWithIndex.

    The naive `row_number() OVER (ORDER BY ...)` funnels the whole table
    through ONE task (empty partitionBy = SinglePartition sort) — the
    classic scale killer. This does it in two balanced exchanges and no
    single-task stage:

    1. range-partition on the order key (sampling-based bounds, balanced),
       sort within partitions — global order across partition ids;
    2. count rows per partition (tiny agg), running-sum the counts into
       per-partition OFFSETS (a k-row window on one task — k = n_parts,
       not N), broadcast them back;
    3. index = offset + (row_number within partition) − 1, where the
       within-partition window re-uses the range exchange (partitionBy
       spark_partition_id over already-partitioned data).

    Ties in `order_col` get an arbitrary-but-deterministic order only if
    the key is unique — pass a unique key, a tiebreaker column, or a
    LIST of columns whose combination is unique (the list orders
    lexicographically, matching a multi-column ORDER BY).
    """
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    ranged = df.repartitionByRange(
        n_parts, *[F.col(c) for c in order_cols]
    ).withColumn("_pid", F.spark_partition_id())
    # repartitionByRange picks its bounds by SAMPLING (SPARK-28699): two
    # executions of the same plan can place rows in different partitions.
    # This plan evaluates `ranged` twice (offset agg + final join), so the
    # exchange must be pinned to ONE materialization or offsets can be
    # computed against a different row placement than the join sees
    # (surfaced as off-by-a-few indices at sf0.1). localCheckpoint is the
    # same one-materialization-for-counts job RDD zipWithIndex runs.
    ranged = ranged.localCheckpoint(eager=True)
    offsets = (
        ranged.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_n").over(
                    W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_offset")
    )
    w = W.partitionBy("_pid").orderBy(*order_cols)
    return (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn(idx_col, F.row_number().over(w) + F.col("_offset") - 1)
        .drop("_pid", "_offset")
    )
