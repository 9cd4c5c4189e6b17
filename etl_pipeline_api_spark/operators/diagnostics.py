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
    # avg and max/avg are rounded via round(x * 100.0) / 100.0 instead of
    # round(x, 2): when the true ratio is a decimal half-way case (e.g.
    # 99*1500/100000 = 1.485), 1.485 is NOT representable in binary and
    # engines disagree on which side the double lands; 148.5 IS exact
    # (odd/2), so scaling first makes the tie deterministic and both
    # engines round half-up away from zero. Counts are exact in double
    # far past any realistic key-cardinality, so the quotient is the
    # correctly-rounded true value in both engines.
    return counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_n"),
        F.min("n").alias("min_n"),
        (F.round(F.sum("n") * 100.0 / F.count(F.lit(1)), 0) / 100.0).alias(
            "avg_n"
        ),
        F.max(
            F.struct(F.col("n").alias("n"), F.col(key_col).alias("k"))
        )["k"].alias("heavy_key"),
        (
            F.round(F.max("n") * 100.0 * F.count(F.lit(1)) / F.sum("n"), 0)
            / 100.0
        ).alias("skew_ratio"),
    )


def mad_outliers(
    df: DataFrame, key_col: str, value_col: str, k: float = 3.0
) -> DataFrame:
    """Robust per-group outlier detection via median absolute deviation.

    Flags rows where ``|v - median| > k * 1.4826 * MAD`` (1.4826 scales
    MAD to σ under normality — the standard robust z-score). Unlike
    mean/stddev, one bot key spamming extreme values cannot drag the
    threshold, which is the point of running this on raw event streams.

    Returns per key: ``(key, n, n_outliers, med_value, mad_value)``.

    Cost: two exact-median aggregations plus one counting pass — three
    scans, but every join broadcasts a |keys|-row frame, so nothing
    shuffles the fact table beyond the aggs' map-side-combined partials.
    Exact median is the oracle-parity choice; at 100 TB swap the first
    two passes for ``approx_percentile(0.5)`` (sketch-mergeable, one
    scan) and keep the same threshold pass.
    """
    med = df.groupBy(key_col).agg(F.median(value_col).alias("med_value"))
    mad = (
        df.join(F.broadcast(med), key_col)
        .groupBy(key_col)
        .agg(
            F.median(F.abs(F.col(value_col) - F.col("med_value"))).alias(
                "mad_value"
            ),
            F.first("med_value").alias("med_value"),
        )
    )
    thresh = F.lit(k) * F.lit(1.4826) * F.col("mad_value")
    return (
        df.join(F.broadcast(mad), key_col)
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (
                    F.abs(F.col(value_col) - F.col("med_value")) > thresh
                ).cast("long")
            ).alias("n_outliers"),
            F.round(F.first("med_value"), 4).alias("med_value"),
            F.round(F.first("mad_value"), 4).alias("mad_value"),
        )
    )


def join_advisor(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    broadcast_row_limit: int = 100_000,
    skew_ratio_limit: float = 8.0,
) -> DataFrame:
    """Pre-flight join planner: measure both sides and emit the strategy
    a 100 TB join should use — the decision procedure this module's
    skew_report exists to feed, packaged as one operator.

    Rules (in priority order, mirroring what a human plans):
    1. a side under ``broadcast_row_limit`` rows → BROADCAST it
       (no shuffle at all; Spark's own autoBroadcastJoinThreshold is
       bytes-based, rows are the engine-independent proxy here);
    2. otherwise if the BUILD-side key distribution is skewed
       (max/avg per-key count > ``skew_ratio_limit``) → SALTED join
       (operators.joins.salted_join) or AQE skew splitting;
    3. otherwise → plain co-partitioned SHUFFLE join.

    Cost: two row counts + two map-combined key histograms — all
    linear, safe on the full input. Output one row:
    (left_rows, right_rows, left_keys, right_keys, left_skew,
    right_skew, strategy, build_side).
    """
    def side_stats(df: DataFrame, name: str) -> DataFrame:
        counts = df.groupBy(F.col(key_col)).agg(
            F.count(F.lit(1)).alias("n")
        )
        return counts.agg(
            F.sum("n").alias(f"{name}_rows"),
            F.count(F.lit(1)).alias(f"{name}_keys"),
            F.round(F.max("n") / F.avg("n"), 2).alias(f"{name}_skew"),
        )
    stats = side_stats(left, "left").crossJoin(
        F.broadcast(side_stats(right, "right"))
    )
    smaller_is_right = F.col("right_rows") <= F.col("left_rows")
    small_rows = F.least("left_rows", "right_rows")
    big_skew = F.when(
        smaller_is_right, F.col("left_skew")
    ).otherwise(F.col("right_skew"))
    strategy = (
        F.when(small_rows <= broadcast_row_limit, F.lit("broadcast"))
        .when(big_skew > skew_ratio_limit, F.lit("salted"))
        .otherwise(F.lit("shuffle"))
    )
    return stats.select(
        "left_rows",
        "right_rows",
        "left_keys",
        "right_keys",
        "left_skew",
        "right_skew",
        strategy.alias("strategy"),
        F.when(smaller_is_right, F.lit("right"))
        .otherwise(F.lit("left"))
        .alias("build_side"),
    )
