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


def copurchase_lift(
    df,
    basket_col: str,
    item_col: str,
    min_pair_support: int = 5,
    k: int = 20,
):
    """Market-basket co-occurrence: top-k item pairs by lift
    (P(a,b) / (P(a)·P(b))), the frequent-itemset primitive behind
    "bought together" recommendations.

    Shape: the pair join is a SELF-JOIN ON THE BASKET KEY, so fan-out
    is Σ|basket|² — bounded by real basket sizes (≈4–13 items here),
    never |items|²; the a < b predicate emits each unordered pair once.
    Supports are two map-combined counts broadcast back onto the pair
    frame; min-support prunes before ranking; the final top-k ranks a
    ≤|pairs|-row frame by (rounded lift, a, b) — a total order, so the
    cut is deterministic. At 100 TB the dial is ``min_pair_support``
    (raise it and the rank frame shrinks) plus a basket-size cap
    upstream for degenerate wholesale orders.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    bi = df.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    n_baskets = bi.select("__b").distinct().count()
    item_n = bi.groupBy("__i").agg(F.count(F.lit(1)).alias("__n_i"))
    a = bi.select("__b", F.col("__i").alias("ia"))
    b = bi.select("__b", F.col("__i").alias("ib"))
    pairs = (
        a.join(b, "__b")
        .filter(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_pair_support)
    )
    scored = (
        pairs.join(
            F.broadcast(item_n.select(F.col("__i").alias("ia"),
                                      F.col("__n_i").alias("n_a"))), "ia")
        .join(
            F.broadcast(item_n.select(F.col("__i").alias("ib"),
                                      F.col("__n_i").alias("n_b"))), "ib")
        .select(
            "ia", "ib", "n_pair", "n_a", "n_b",
            F.round(
                F.col("n_pair") * F.lit(float(n_baskets))
                / (F.col("n_a") * F.col("n_b")),
                4,
            ).alias("lift"),
        )
    )
    w = Window.orderBy(F.col("lift").desc(), "ia", "ib")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("ia", "ib", "n_pair", "lift", F.col("rnk").cast("int").alias("rnk"))
    )
