"""Distribution / skew diagnostics (SURVEY.md §2.9 scale toolkit).

The reference (a single-process pandas pipeline, /root/reference/
proj-eng-dados/main.py) never needs these; on a cluster they are the
pre-flight checks that decide a join strategy. A 100 TB join that
shuffles on a key with one hot value stalls the whole stage on one
reducer — the fix menu (broadcast, salting via operators.joins.salted_join,
AQE skew splitting) all starts with MEASURING the key distribution, which
is what this module does.

Both operators are two hash aggregations (key -> count, then a global
rollup of the counts): partial aggregation combines map-side, the second
agg carries |distinct keys| rows, nothing touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_histogram(df: DataFrame, key_col: str) -> DataFrame:
    """Per-key row counts — the raw material for any skew decision."""
    return df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))


def skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """One-row skew summary for a prospective join/groupBy key:

    (n_keys, max_n, min_n, avg_n, heavy_key, skew_ratio)

    ``skew_ratio`` = max/avg per-key count — ~1 means uniform, >> 1 means
    a hot key will dominate a reducer (rule of thumb: salt or broadcast
    past ~8-16). ``heavy_key`` is the argmax, deterministic for ANY
    orderable key type: ties break toward the LARGEST key via a single
    struct max (max(struct(n, key)) compares n first, then key — no
    numeric negation, so string keys work). Cost: two map-combined
    aggregations; safe to run on the full 100 TB input.
    """
    counts = key_histogram(df, key_col)
    return counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_n"),
        F.min("n").alias("min_n"),
        F.round(F.avg("n"), 2).alias("avg_n"),
        F.max(
            F.struct(F.col("n").alias("n"), F.col(key_col).alias("k"))
        )["k"].alias("heavy_key"),
        F.round(F.max("n") / F.avg("n"), 2).alias("skew_ratio"),
    )
