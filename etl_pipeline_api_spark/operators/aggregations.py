"""Aggregation operators (SURVEY.md §2.4) and the EDA profile (§2.6).

All are single ``groupBy().agg()`` / ``agg()`` plans → Spark executes them as
partial (map-side) + final hash aggregation with AQE coalescing; at 100 TB the
only shuffle is the one on the grouping keys, with partial aggregates shrinking
the shuffle to ~|groups| rows per task.

Reference citations:
- groupby_sum  ~ proj-eng-dados/main.py:303-307 (gold aggregation + rename)
- eda_profile  ~ main.py:242-249 (count / nunique / min / max / mean-round),
  collapsed from 5 separate pandas passes into ONE Spark pass.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def groupby_sum(
    df: DataFrame,
    keys: Iterable[str],
    value_col: str,
    out_col: str = "total_gasto",
    round_to: int | None = None,
) -> DataFrame:
    """Hash aggregation: SUM(value) per key tuple, renamed (op-groupby-sum +
    op-rename in one plan node). ``round_to`` pins float output for oracle
    comparison (double summation is order-sensitive)."""
    total = F.sum(value_col)
    if round_to is not None:
        total = F.round(total, round_to)
    return df.groupBy(*keys).agg(total.alias(out_col))


def eda_profile(
    df: DataFrame,
    count_distinct_col: str,
    date_col: str,
    mean_col: str,
) -> DataFrame:
    """One-pass exploratory profile: row count, distinct entities, temporal
    range, rounded mean (main.py:242-249 does this in 5 full passes over the
    pandas frame; this is a single aggregate — one scan, no shuffle beyond
    the 1-row final agg)."""
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col(count_distinct_col)).alias("n_distinct"),
        F.min(date_col).alias("min_date"),
        F.max(date_col).alias("max_date"),
        F.round(F.avg(mean_col), 2).alias("mean_value"),
    )


def count_rows(df: DataFrame) -> int:
    """op-count (main.py:132,243,287,309)."""
    return df.count()


def count_distinct(df: DataFrame, col: str) -> DataFrame:
    """op-count-distinct (main.py:244). Exact; swap to approx_count_distinct
    at 100 TB when a ±2% estimate is acceptable."""
    return df.agg(F.count_distinct(F.col(col)).alias("n_distinct"))


def min_max(df: DataFrame, col: str) -> DataFrame:
    """op-min-max (main.py:245-248)."""
    return df.agg(F.min(col).alias("min_value"), F.max(col).alias("max_value"))


def mean_round(df: DataFrame, col: str, digits: int = 2) -> DataFrame:
    """op-mean-round (main.py:249)."""
    return df.agg(F.round(F.avg(col), digits).alias("mean_value"))
