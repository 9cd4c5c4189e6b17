"""Statistical profiling / inference operators (SURVEY.md §2.9 analytics
extensions; the reference engine — /root/reference/proj-eng-dados/main.py —
stops at count/mean/min/max, these are the next rung of the same EDA
ladder, re-expressed as distributed one-pass aggregations).

Scale posture: every operator here reduces the fact table to a tiny
frame (one row, |digits| rows, |levels|² rows, |groups| rows) in ONE
map-combined hash aggregation, then finishes the arithmetic on that
tiny frame with windows or a second micro-agg. Nothing is collected to
the driver; nothing is quadratic; every output is deterministic
(explicit rounding + total-order tie-breaks) so a DuckDB oracle can
hash-match it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlation in ONE pass over the fact table.

    All C(n,2) ``corr(a, b)`` aggregates ride a single map-combined
    aggregation (Spark evaluates them together — one scan, one 1-row
    result), then the 1-row wide frame is unpivoted to long form
    ``(col_a, col_b, corr)``. At 100 TB this is exactly one scan + one
    tiny shuffle regardless of how many column pairs are requested.
    """
    aggs = []
    pairs: list[tuple[str, str]] = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            pairs.append((a, b))
            aggs.append(F.round(F.corr(a, b), 4).alias(f"{a}__{b}"))
    wide = df.agg(*aggs)
    stacked = ", ".join(
        f"'{a}', '{b}', `{a}__{b}`" for a, b in pairs
    )
    return wide.selectExpr(
        f"stack({len(pairs)}, {stacked}) AS (col_a, col_b, corr)"
    )


def entropy_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column Shannon entropy (bits) of categorical columns.

    For each column: one map-combined ``groupBy(col).count()`` (the only
    shuffle, carrying |distinct| rows), then entropy = -Σ p·log2 p on
    that tiny frame. Columns are computed independently and unioned —
    at scale each is a single linear aggregation of the same scan.
    Output: (column_name, n_distinct, entropy_bits) — the standard
    data-profiling signal for key-ness vs constant-ness.

    The per-column entropy uses the aggregation-friendly identity
    ``H = log2(N) − (Σ n·log2 n) / N`` so the second stage is one plain
    agg over the counts frame — no window, no second scan.
    """
    outs = []
    for c in cols:
        counts = df.groupBy(F.col(c).alias("v")).agg(
            F.count(F.lit(1)).alias("n")
        )
        outs.append(
            counts.agg(
                F.lit(c).alias("column_name"),
                F.count(F.lit(1)).alias("n_distinct"),
                F.round(
                    F.log2(F.sum("n"))
                    - F.sum(F.col("n") * F.log2("n")) / F.sum("n"),
                    4,
                ).alias("entropy_bits"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def mutual_info(df: DataFrame, col_x: str, col_y: str) -> DataFrame:
    """Mutual information (bits) between two categorical columns.

    One map-combined joint ``groupBy(x, y).count()`` is the ONLY pass
    over the fact table; marginals are window sums over that tiny
    |X|·|Y|-row joint frame (no second scan, no join). Output one row:
    (n, h_x, h_y, h_xy, mi_bits) — MI = H(x) + H(y) − H(x,y), the
    standard redundancy / association screen between two label columns.
    """
    joint = df.groupBy(
        F.col(col_x).alias("x"), F.col(col_y).alias("y")
    ).agg(F.count(F.lit(1)).alias("n_xy"))
    w_all = Window.partitionBy()
    n = F.sum("n_xy").over(w_all)
    n_x = F.sum("n_xy").over(Window.partitionBy("x"))
    n_y = F.sum("n_xy").over(Window.partitionBy("y"))
    cells = joint.select(
        F.col("n_xy"),
        n.alias("n"),
        n_x.alias("n_x"),
        n_y.alias("n_y"),
    )
    # Marginal entropies telescope over cells: Σ_cells p_xy·log2 p_x
    # = Σ_x p_x·log2 p_x, so no separate marginal frames are needed.
    p_xy = F.col("n_xy") / F.col("n")
    return cells.agg(
        F.max("n").alias("n"),
        F.round(
            -F.sum(p_xy * F.log2(F.col("n_x") / F.col("n"))), 4
        ).alias("h_x"),
        F.round(
            -F.sum(p_xy * F.log2(F.col("n_y") / F.col("n"))), 4
        ).alias("h_y"),
        F.round(-F.sum(p_xy * F.log2(p_xy)), 4).alias("h_xy"),
        F.round(
            F.sum(
                p_xy
                * F.log2(
                    (p_xy)
                    / ((F.col("n_x") / F.col("n")) * (F.col("n_y") / F.col("n")))
                )
            ),
            4,
        ).alias("mi_bits"),
    )


def ab_test(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    convert_type: str = "purchase",
    min_share: float = 0.25,
) -> DataFrame:
    """Two-sample conversion z-test under a DETERMINISTIC assignment.

    Variant = ``user_id % 2`` — engine-independent and reproducible, the
    property an A/B harness actually needs (a random() split can never
    be re-audited). "Converted" = at least ``min_share`` of the user's
    events are ``convert_type`` — a RATIO, so the definition stays
    non-degenerate as per-user event volume grows with scale (an
    any-purchase flag saturates to 100% and zeroes the pooled
    standard error). One per-user reduction, one 2-row variant agg,
    then the pooled two-proportion z on that 2-row frame; z is NULL if
    the pooled rate is degenerate (0 or 1) rather than a divide error.
    Output one row: (n_a, n_b, conv_a, conv_b, rate_a, rate_b, z).
    """
    per_user = events.groupBy(
        F.col(user_col).alias("u"),
        (F.col(user_col) % 2).cast("int").alias("variant"),
    ).agg(
        (
            F.sum(
                F.when(F.col(type_col) == convert_type, F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            >= F.count(F.lit(1)) * min_share
        )
        .cast("int")
        .alias("converted")
    )
    by_variant = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_conv"),
    )
    wide = by_variant.agg(
        F.sum(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n_a"),
        F.sum(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n_b"),
        F.sum(F.when(F.col("variant") == 0, F.col("n_conv"))).alias("conv_a"),
        F.sum(F.when(F.col("variant") == 1, F.col("n_conv"))).alias("conv_b"),
    )
    p_a = F.col("conv_a") / F.col("n_a")
    p_b = F.col("conv_b") / F.col("n_b")
    p_pool = (F.col("conv_a") + F.col("conv_b")) / (
        F.col("n_a") + F.col("n_b")
    )
    se = F.sqrt(
        p_pool * (1 - p_pool) * (1 / F.col("n_a") + 1 / F.col("n_b"))
    )
    return wide.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(p_a, 4).alias("rate_a"),
        F.round(p_b, 4).alias("rate_b"),
        F.round(
            F.when(se > 0, (p_b - p_a) / se), 4
        ).alias("z"),
    )


def revenue_concentration(
    orders: DataFrame,
    key_col: str = "o_custkey",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Gini coefficient + top-1% / top-10% revenue share per customer.

    One map-combined ``groupBy(customer).sum`` reduces the fact table to
    |customers| rows; the Gini rank formula
    ``(2·Σ i·xᵢ)/(n·Σx) − (n+1)/n`` (xᵢ ascending) needs a GLOBAL rank
    over that frame, which a bare ``row_number() OVER (ORDER BY …)``
    would funnel through one task — so the rank rides
    :func:`~..layout.global_row_index` (range partition + broadcast
    offsets, two balanced exchanges, no single-task sort) and (n, total)
    come from a separate 1-row agg broadcast back. Ties are
    total-ordered on (amount, key) so the rank — and therefore the
    hash — is deterministic. Linear at a 10⁹-customer frame.
    """
    from .layout import global_row_index

    per_key = orders.groupBy(F.col(key_col).alias("k")).agg(
        F.sum(amount_col).alias("amt")
    )
    ranked = global_row_index(per_key, ["amt", "k"], idx_col="_idx").select(
        "amt", (F.col("_idx") + 1).alias("i")
    )
    totals = per_key.agg(
        F.count(F.lit(1)).alias("n"), F.sum("amt").alias("total")
    )
    enriched = ranked.crossJoin(F.broadcast(totals))
    top_cut_1 = F.ceil(F.col("n") * 0.01)
    top_cut_10 = F.ceil(F.col("n") * 0.10)
    return enriched.agg(
        F.max("n").alias("n_customers"),
        F.round(
            (2 * F.sum(F.col("i") * F.col("amt")))
            / (F.max("n") * F.max("total"))
            - (F.max("n") + 1) / F.max("n"),
            4,
        ).alias("gini"),
        F.round(
            F.sum(
                F.when(
                    F.col("i") > F.col("n") - top_cut_1, F.col("amt")
                ).otherwise(F.lit(0.0))
            )
            / F.max("total"),
            4,
        ).alias("top1_share"),
        F.round(
            F.sum(
                F.when(
                    F.col("i") > F.col("n") - top_cut_10, F.col("amt")
                ).otherwise(F.lit(0.0))
            )
            / F.max("total"),
            4,
        ).alias("top10_share"),
    )


def _first_digit(col: Column) -> Column:
    """Leading decimal digit of a positive numeric, row-local."""
    return F.floor(
        col / F.pow(F.lit(10.0), F.floor(F.log10(col)))
    ).cast("int")


def benford_profile(df: DataFrame, amount_col: str) -> DataFrame:
    """First-digit (Benford) distribution + per-digit chi² contribution.

    The classic fraud / data-entry anomaly screen: natural multi-scale
    amounts follow P(d) = log10(1 + 1/d); fabricated or truncated data
    does not. Row-local digit extraction, one 9-row map-combined agg,
    then expected shares and χ² contributions as literals on the 9-row
    frame. Output: (digit, n, obs_share, exp_share, chi2_part).
    """
    pos = df.where(F.col(amount_col) > 0)
    digits = pos.select(_first_digit(F.col(amount_col)).alias("digit"))
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    w_all = Window.partitionBy()
    exp_share = F.log10(1 + 1 / F.col("digit"))
    total = F.sum("n").over(w_all)
    return (
        counts.select(
            "digit",
            "n",
            F.round(F.col("n") / total, 4).alias("obs_share"),
            F.round(exp_share, 4).alias("exp_share"),
            F.round(
                F.pow(F.col("n") - total * exp_share, 2)
                / (total * exp_share),
                4,
            ).alias("chi2_part"),
        )
        .orderBy("digit")
    )


def cusum_changepoint(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    bucket: str = "hour",
) -> DataFrame:
    """Per-series changepoint detection via the CUSUM statistic.

    Buckets each series to hourly counts (ONE map-combined agg — the
    only pass over the fact table), then on the |types|·|hours| bucket
    frame computes the running cumulative deviation from the series
    mean and reports its extreme point:
    ``cusumᵢ = Σ_{j≤i} (yⱼ − ȳ)``; the argmax of |cusum| is the most
    likely single changepoint (Page 1954 shape). Deterministic argmax
    via one struct max (|cusum| desc, then earliest bucket). Output per
    series: (event_type, n_buckets, cp_ts, max_abs_cusum).
    """
    buckets = events.groupBy(
        F.col(type_col).alias("event_type"),
        F.date_trunc(bucket, F.col(ts_col)).alias("b"),
    ).agg(F.count(F.lit(1)).alias("y"))
    w_series = Window.partitionBy("event_type")
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cusum = buckets.select(
        "event_type",
        "b",
        F.count(F.lit(1)).over(w_series).alias("n_buckets"),
        (
            F.sum("y").over(w_run)
            - F.row_number().over(Window.partitionBy("event_type").orderBy("b"))
            * F.avg("y").over(w_series)
        ).alias("cusum"),
    )
    return (
        cusum.groupBy("event_type")
        .agg(
            F.max("n_buckets").alias("n_buckets"),
            F.max(
                F.struct(
                    F.round(F.abs("cusum"), 6).alias("a"),
                    (-F.unix_micros(F.col("b"))).alias("neg_us"),
                )
            ).alias("top"),
        )
        .select(
            "event_type",
            "n_buckets",
            F.timestamp_micros(-F.col("top.neg_us")).alias("cp_ts"),
            F.round(F.col("top.a"), 4).alias("max_abs_cusum"),
        )
    )


def grouped_trend(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    bucket: str = "hour",
) -> DataFrame:
    """Per-series OLS trend (slope/intercept) over bucketed counts —
    "is this event type growing?" as one closed-form aggregation.

    Buckets each series to hourly counts (the only fact-table pass),
    re-zeroes the bucket index per series (x = hours since the series'
    first bucket — keeps x small and the normal equations well-scaled),
    then the closed-form ``slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)``
    on the bucket frame. Every Σ is an INTEGER sum (x: hour index,
    y: count), so both engines compute bit-identical doubles at the
    final division — no float-association drift to round away.
    Output per series: (event_type, n_points, slope, intercept).
    """
    buckets = events.groupBy(
        F.col(type_col).alias("event_type"),
        # integer div, not float-divide-then-cast: exact at any epoch
        F.expr(
            f"unix_micros(date_trunc('{bucket}', `{ts_col}`))"
            " div 3600000000"
        ).alias("h"),
    ).agg(F.count(F.lit(1)).alias("y"))
    w_g = Window.partitionBy("event_type")
    xy = buckets.select(
        "event_type",
        (F.col("h") - F.min("h").over(w_g)).alias("x"),
        "y",
    )
    agg = xy.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    det = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(
        det != 0,
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / det,
    )
    return agg.select(
        "event_type",
        F.col("n").alias("n_points"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 4).alias(
            "intercept"
        ),
    )


def seasonality_strength(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """How much of a series' hourly variance is explained by its
    hour-of-day profile — the one-way ANOVA η² over bucketed counts.

    Two stacked integer aggregations: fact → (series, hour) counts,
    then (series, hour-of-day) cell sums; η² = SS_between / SS_total
    with every sum-of-squares assembled from exact integer Σy and Σy²
    (``SS_t = Σy² − (Σy)²/n``), so the single final division is the
    only float op — engine-identical. η² near 1 ⇒ a time-of-day
    profile (cache warming, cron load-shedding) dominates; near 0 ⇒
    the series is trend/noise. Output: (event_type, n_buckets, eta2).
    """
    buckets = events.groupBy(
        F.col(type_col).alias("event_type"),
        F.date_trunc("hour", F.col(ts_col)).alias("b"),
    ).agg(F.count(F.lit(1)).alias("y"))
    cells = buckets.groupBy(
        "event_type", F.hour("b").alias("hod")
    ).agg(
        F.count(F.lit(1)).alias("nh"),
        F.sum("y").alias("sh"),
        F.sum(F.col("y") * F.col("y")).alias("sh2"),
    )
    agg = cells.groupBy("event_type").agg(
        F.sum("nh").alias("n"),
        F.sum("sh").alias("sy"),
        F.sum("sh2").alias("sy2"),
        # Σ_h (Σ_h y)²/n_h needs per-cell division — keep it as the one
        # rational term; numerator/denominator are exact ints per cell.
        F.sum(
            (F.col("sh") * F.col("sh")).cast("double") / F.col("nh")
        ).alias("ssb_raw"),
    )
    ss_t = F.col("sy2") - (F.col("sy") * F.col("sy")).cast("double") / F.col("n")
    ss_b = F.col("ssb_raw") - (F.col("sy") * F.col("sy")).cast("double") / F.col("n")
    return agg.select(
        "event_type",
        F.col("n").alias("n_buckets"),
        F.round(F.when(ss_t > 0, ss_b / ss_t), 4).alias("eta2"),
    )


def k_anonymity_profile(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k_threshold: int = 5,
) -> DataFrame:
    """Re-identification risk profile: k-anonymity + l-diversity in one
    pass — the privacy gate a training-data release needs next to
    text.pii_redact's content scrubbing.

    Equivalence classes = one groupBy on the quasi-identifier columns
    (count + per-class distinct of the sensitive attribute); the
    profile is a second tiny agg over the |classes| frame. Output one
    row: (n_rows, n_classes, k_anonymity [= min class size — the
    worst-case crowd an individual hides in], l_diversity [= min
    distinct sensitive values per class], n_rows_below_k,
    pct_rows_below_k for the chosen threshold).
    """
    classes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("sz"),
        F.count_distinct(F.col(sensitive_col)).alias("ell"),
    )
    return classes.agg(
        F.sum("sz").alias("n_rows"),
        F.count(F.lit(1)).alias("n_classes"),
        F.min("sz").alias("k_anonymity"),
        F.min("ell").alias("l_diversity"),
        F.sum(F.when(F.col("sz") < k_threshold, F.col("sz")).otherwise(F.lit(0)))
        .alias("n_rows_below_k"),
        F.round(
            F.sum(
                F.when(F.col("sz") < k_threshold, F.col("sz")).otherwise(
                    F.lit(0)
                )
            )
            * 100.0
            / F.sum("sz"),
            2,
        ).alias("pct_rows_below_k"),
    )


# Poisson(1) inverse-CDF thresholds (cumulative e⁻¹·Σ 1/i!) — enough
# digits that a double comparison lands identically in any engine.
_POIS = (0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
         0.9810118431238462, 0.9963401531726563)


def bootstrap_mean_ci(
    df: DataFrame,
    id_col: str,
    value_col: str,
    n_replicates: int = 50,
    alpha: float = 0.05,
) -> DataFrame:
    """Bootstrap confidence interval for the mean — DISTRIBUTED Poisson
    bootstrap (Chamandy et al.'s "Estimating Uncertainty for Massive
    Data Streams" shape): resampling n-out-of-n is impossible at 100 TB
    (it needs a global shuffle per replicate), but a per-row
    Poisson(1) weight per replicate is free, row-local, and converges
    to the same bootstrap distribution.

    Weights are DETERMINISTIC: u = knuth_hash(id·R + r)/2³² (the
    sampling.det_key mixer, decimal-widened so 100 TB id regimes don't
    overflow), inverse-CDF'd to a Poisson count — both engines replay
    the identical resample, so the CI is oracle-checkable, not just
    plausible.

    ONE PASS, NO EXPLODE, NO BIGDECIMAL: the r5 shape exploded ×R rows
    (R·n row materializations) and mixed the key in decimal(20,0) —
    22.5M BigDecimal multiplies at sf0.1. Both are gone: the weight
    array is built once per row by an int64-only mix (id mod 2³² first,
    then the Knuth multiply mod 2³² via a 16-bit split — every
    intermediate < 2⁴⁹, so the arithmetic is exact and identical to the
    decimal form for the non-negative ids the contract assumes), and
    each replicate's (Σw·v, Σw) pair is one conditional-sum pair in a
    single global aggregate — 2R agg expressions over array slots,
    map-side partial, a 1-row exchange — then the R means are unstacked
    from the 1×2R row (driver-free, R-row frame) for the percentile
    agg. Same weights, same math, so the DuckDB oracle (which still
    writes the explode as a CROSS JOIN range(R) over a plain modulo)
    is unchanged. Output one row: (n_replicates, mean, ci_lo, ci_hi).
    """
    from ..session import fan_out
    from .sampling import KNUTH, M32

    # R weight draws per row are CPU-bound: spread a small-on-disk scan
    # across the cluster (no-op at real scale where the scan already has
    # more partitions than cores).
    base = fan_out(
        df.select(F.col(id_col).alias("__id"), F.col(value_col).alias("__v"))
    )

    def w_lambda(r: F.Column) -> F.Column:
        # (idm·R + r) mod 2³² with idm = id mod 2³² equals
        # (id·R + r) mod 2³² — multiples of 2³² drop out of the product.
        m = F.pmod(
            F.pmod(F.col("__id"), F.lit(M32)) * n_replicates + r,
            F.lit(M32),
        )
        # (m·K) mod 2³² without overflow: m = m1·2¹⁶ + m0, so
        # m·K ≡ ((m1·K mod 2³²)·2¹⁶ + m0·K) (mod 2³²); m1·K < 2⁴⁸.
        m1, m0 = F.shiftright(m, 16), m.bitwiseAND(F.lit(65535))
        key = F.pmod(
            F.pmod(m1 * F.lit(KNUTH), F.lit(M32)) * F.lit(65536)
            + m0 * F.lit(KNUTH),
            F.lit(M32),
        )
        u = key / F.lit(float(M32))
        return (
            F.when(u < _POIS[0], 0)
            .when(u < _POIS[1], 1)
            .when(u < _POIS[2], 2)
            .when(u < _POIS[3], 3)
            .when(u < _POIS[4], 4)
            .otherwise(5)
        )

    witharr = base.withColumn(
        "warr",
        F.transform(
            F.sequence(F.lit(0), F.lit(n_replicates - 1)), w_lambda
        ),
    )
    aggs = []
    for r in range(n_replicates):
        aggs.append(
            F.sum(F.col("__v") * F.col("warr")[r]).alias(f"s{r}")
        )
        aggs.append(F.sum(F.col("warr")[r]).alias(f"c{r}"))
    wide = witharr.agg(*aggs)
    means = (
        wide.select(
            F.expr(
                "stack({n}, {cols}) AS (s, c)".format(
                    n=n_replicates,
                    cols=", ".join(
                        f"s{r}, c{r}" for r in range(n_replicates)
                    ),
                )
            )
        )
        # empty input → sums are NULL → drop, matching the exploded
        # shape where zero groups existed; a replicate CAN draw all-zero
        # weights (probability e^-n): its mean is NULL and the
        # percentile/avg below skip it
        .filter(F.col("c").isNotNull())
        .select(
            F.when(
                F.col("c") > 0, F.col("s") / F.col("c")
            ).alias("m")
        )
    )
    return means.agg(
        F.count(F.lit(1)).alias("n_replicates"),
        F.round(F.avg("m"), 4).alias("mean"),
        F.round(F.expr(f"percentile(m, {alpha / 2})"), 4).alias("ci_lo"),
        F.round(F.expr(f"percentile(m, {1 - alpha / 2})"), 4).alias("ci_hi"),
    )


def winsorized_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.01,
    hi: float = 0.99,
) -> DataFrame:
    """Per-group mean before/after winsorization (clipping at the
    [lo, hi] quantiles) — the robust-mean counterpart to
    diagnostics.mad_outliers: instead of FLAGGING outliers it bounds
    their influence, the standard pre-aggregation step for metrics fed
    by bot-inflated values.

    Two passes: one exact per-group percentile agg (tiny |groups|-row
    threshold frame, broadcast back) and one clipped aggregation via
    row-local least/greatest. At 100 TB swap the exact percentile for
    percentile_approx — the clip pass is unchanged; exact here keeps
    the op oracle-checkable. Output per group:
    (group, n, mean, wins_mean, p_lo, p_hi).
    """
    thresholds = df.groupBy(F.col(group_col).alias("__wg")).agg(
        F.expr(f"percentile({value_col}, {lo})").alias("p_lo"),
        F.expr(f"percentile({value_col}, {hi})").alias("p_hi"),
    )
    joined = df.join(
        F.broadcast(thresholds), F.col(group_col) == F.col("__wg")
    )
    clipped = F.least(
        F.greatest(F.col(value_col), F.col("p_lo")), F.col("p_hi")
    )
    return (
        joined.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(value_col), 4).alias("mean"),
            F.round(F.avg(clipped), 4).alias("wins_mean"),
            F.round(F.min("p_lo"), 4).alias("p_lo"),
            F.round(F.min("p_hi"), 4).alias("p_hi"),
        )
    )


def psi_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ts_col: str = "ts",
    n_buckets: int = 10,
) -> DataFrame:
    """Population Stability Index between the first and second half of
    each series — the standard model-monitoring drift score, computed
    without a model: PSI = Σ (p_cur − p_base)·ln(p_cur/p_base) over
    baseline-decile buckets.

    The split point is the integer midpoint of each group's time range
    (deterministic, no quantile of time needed); bucket edges are the
    BASELINE's exact value deciles (tiny |groups|×(n_buckets−1) frame
    broadcast back), so every baseline share is exactly 1/n_buckets and
    only the current side can drift. Empty current-side buckets are
    clamped at 1e−6 before the log (the standard continuity fix, same
    literal in both engines). Rule of thumb: <0.1 stable, 0.1–0.25
    drifting, >0.25 act. Output per group: (group, n_base, n_cur, psi).

    Two scans of the fact table (split stats + bucketed counts) — at
    100 TB both are map-combined aggs; swap exact deciles for
    percentile_approx exactly like winsorized_stats.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    spans = df.groupBy(F.col(group_col).alias("__pg")).agg(
        F.floor((F.min(us) + F.max(us)) / 2).cast("long").alias("__mid")
    )
    tagged = df.join(
        F.broadcast(spans), F.col(group_col) == F.col("__pg")
    ).withColumn("__cur", (us >= F.col("__mid")).cast("int"))
    qs = [i / n_buckets for i in range(1, n_buckets)]
    edges = (
        tagged.where(F.col("__cur") == 0)
        .groupBy("__pg")
        .agg(
            F.expr(
                f"percentile({value_col}, array({', '.join(map(str, qs))}))"
            ).alias("__edges")
        )
    )
    bucketed = (
        tagged.join(F.broadcast(edges), "__pg")
        .withColumn(
            "__b",
            # bucket = #edges strictly below the value — row-local scan
            # of the (n_buckets-1)-element edge array
            F.aggregate(
                "__edges",
                F.lit(0),
                lambda acc, e: acc
                + F.when(F.col(value_col) > e, 1).otherwise(0),
            ),
        )
        .groupBy(F.col(group_col).alias("g"), "__cur", "__b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_side = Window.partitionBy("g", "__cur")
    shares = bucketed.select(
        "g",
        "__cur",
        "__b",
        (F.col("n") / F.sum("n").over(w_side)).alias("p"),
        F.sum("n").over(w_side).alias("n_side"),
    )
    base = shares.where(F.col("__cur") == 0).select(
        "g", "__b", F.col("p").alias("pb"), F.col("n_side").alias("n_base")
    )
    cur = shares.where(F.col("__cur") == 1).select(
        "g", "__b", F.col("p").alias("pc"), F.col("n_side").alias("n_cur")
    )
    joined = base.join(cur, ["g", "__b"], "full").select(
        "g",
        F.coalesce("n_base", F.lit(0)).alias("n_base"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        F.greatest(F.coalesce("pb", F.lit(0.0)), F.lit(1e-6)).alias("pb"),
        F.greatest(F.coalesce("pc", F.lit(0.0)), F.lit(1e-6)).alias("pc"),
    )
    return (
        joined.groupBy(F.col("g").alias(group_col))
        .agg(
            F.max("n_base").alias("n_base"),
            F.max("n_cur").alias("n_cur"),
            F.round(
                F.sum(
                    (F.col("pc") - F.col("pb"))
                    * F.log(F.col("pc") / F.col("pb"))
                ),
                4,
            ).alias("psi"),
        )
    )


def dp_noisy_counts(
    df: DataFrame,
    group_col: str,
    epsilon: float = 1.0,
) -> DataFrame:
    """ε-differentially-private group counts via the Laplace mechanism —
    the release shape for publishing aggregate statistics about a
    training corpus (counts have L1 sensitivity 1, so noise scale
    b = 1/ε).

    Noise is DETERMINISTIC here: each group gets a dense-rank id under
    the group-name total order, the det_key mixer turns it into a
    uniform, and the Laplace inverse-CDF turns that into noise — so the
    release is rerun-stable and oracle-checkable. (A production release
    would use a secret seed; the MECHANISM — sensitivity, scale,
    inverse-CDF — is exactly what ships, and is the part worth
    verifying.) Output: (group, n_noisy, epsilon); true counts do not
    appear in the output schema.
    """
    from .sampling import KNUTH, M32

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    w = Window.orderBy(group_col)
    ranked = counts.withColumn("__gid", F.dense_rank().over(w))
    key = (
        (
            F.col("__gid").cast("decimal(20,0)")
            * F.lit(KNUTH).cast("decimal(10,0)")
        )
        % F.lit(M32).cast("decimal(11,0)")
    ).cast("long")
    u = (key + 0.5) / F.lit(float(M32))
    b = 1.0 / epsilon
    noise = (
        -F.lit(b)
        * F.signum(u - 0.5)
        * F.log(1 - 2 * F.abs(u - 0.5))
    )
    return ranked.select(
        group_col,
        F.round(F.col("__n") + noise, 4).alias("n_noisy"),
        F.lit(epsilon).alias("epsilon"),
    )


def welch_t_test(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
    metric_type: str = "purchase",
) -> DataFrame:
    """Welch's unequal-variance t-test on a CONTINUOUS metric between
    the deterministic user_id%2 variants — the companion to
    :func:`ab_test` (proportions): "did the treatment move spend?",
    not just "did it move conversion?".

    One filtered scan → per-variant (n, mean, sample variance) in a
    single map-combined agg, then the Welch statistic and its
    Satterthwaite degrees of freedom on the 2-row frame:
    ``t = (m₁ − m₀) / √(s₀²/n₀ + s₁²/n₁)``. NULL t (not a divide
    error) when either side is empty/degenerate. Output one row:
    (n_a, n_b, mean_a, mean_b, t, df).
    """
    m = events.where(F.col(type_col) == metric_type).select(
        (F.col(user_col) % 2).cast("int").alias("variant"),
        F.col(value_col).alias("v"),
    )
    by_v = m.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("v").alias("m"),
        F.var_samp("v").alias("s2"),
    )
    wide = by_v.agg(
        F.sum(F.when(F.col("variant") == 0, F.col("n"))).alias("n_a"),
        F.sum(F.when(F.col("variant") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 0, F.col("m"))).alias("m_a"),
        F.max(F.when(F.col("variant") == 1, F.col("m"))).alias("m_b"),
        F.max(F.when(F.col("variant") == 0, F.col("s2"))).alias("s2_a"),
        F.max(F.when(F.col("variant") == 1, F.col("s2"))).alias("s2_b"),
    )
    se2 = F.col("s2_a") / F.col("n_a") + F.col("s2_b") / F.col("n_b")
    df_w = (se2 * se2) / (
        F.pow(F.col("s2_a") / F.col("n_a"), 2) / (F.col("n_a") - 1)
        + F.pow(F.col("s2_b") / F.col("n_b"), 2) / (F.col("n_b") - 1)
    )
    ok = (
        (F.col("n_a") > 1) & (F.col("n_b") > 1) & (se2 > 0)
    )
    return wide.select(
        "n_a",
        "n_b",
        F.round("m_a", 4).alias("mean_a"),
        F.round("m_b", 4).alias("mean_b"),
        F.round(
            F.when(ok, (F.col("m_b") - F.col("m_a")) / F.sqrt(se2)), 4
        ).alias("t"),
        F.round(F.when(ok, df_w), 2).alias("df"),
    )


def cuped_adjustment(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    metric_type: str = "purchase",
) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013) — the third leg of
    the experimentation toolkit beside :func:`ab_test` (proportions)
    and :func:`welch_t_test` (means): use each user's PRE-period metric
    as a control covariate so the experiment needs a fraction of the
    traffic for the same power.

    Pre/post split at the integer midpoint of the metric's time range
    (deterministic); per user X = pre-period total, Y = post-period
    total (one conditional-sum agg — the only fact pass); then
    θ = cov(X,Y)/var(X) and the variance of Y_adj = Y − θ(X − X̄),
    everything assembled from one |users|-frame agg of raw sums
    (Σx, Σy, Σxy, Σx², Σy², n) so both engines share the arithmetic.
    Output one row: (n_users, theta, var_y, var_yadj, reduction_pct).
    """
    m = events.where(F.col(type_col) == metric_type)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    span = m.agg(
        F.floor((F.min(us) + F.max(us)) / 2).cast("long").alias("mid")
    )
    tagged = m.crossJoin(F.broadcast(span))
    per_user = tagged.groupBy(F.col(user_col).alias("u")).agg(
        F.sum(
            F.when(us < F.col("mid"), F.col(value_col)).otherwise(F.lit(0.0))
        ).alias("x"),
        F.sum(
            F.when(us >= F.col("mid"), F.col(value_col)).otherwise(F.lit(0.0))
        ).alias("y"),
    )
    sums = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n")
    var_x = F.col("sxx") / n - F.pow(F.col("sx") / n, 2)
    var_y = F.col("syy") / n - F.pow(F.col("sy") / n, 2)
    cov = F.col("sxy") / n - (F.col("sx") / n) * (F.col("sy") / n)
    theta = F.when(var_x > 0, cov / var_x)
    # var(Y - θX) = var_y - cov²/var_x  (the CUPED identity)
    var_adj = F.when(var_x > 0, var_y - cov * cov / var_x).otherwise(var_y)
    # + 0.0 canonicalizes IEEE -0.0 -> 0.0 after round (a theta from a
    # tiny negative covariance rounds to -0.0 in one engine and 0.0 in
    # the other — found by the r9 events fuzz; same fix as random_project)
    return sums.select(
        n.alias("n_users"),
        (F.round(theta, 4) + F.lit(0.0)).alias("theta"),
        (F.round(var_y, 4) + F.lit(0.0)).alias("var_y"),
        (F.round(var_adj, 4) + F.lit(0.0)).alias("var_yadj"),
        (
            F.round(F.when(var_y > 0, 100.0 * (1 - var_adj / var_y)), 2)
            + F.lit(0.0)
        ).alias("reduction_pct"),
    )


def classification_report(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """Per-class precision / recall / F1 from a labeled prediction
    frame — the evaluation harness for any classifier op in the engine
    (langid vs the corpus's true lang, the hashed quality classifier
    vs curation labels, k-NN vs held-out labels).

    One map-combined confusion groupBy is the only pass over the data;
    per-class totals are window sums over the |classes|² confusion
    frame. Classes are the TRUE labels (a prediction never seen as a
    truth contributes to false-positive counts, not its own row).
    Guards: precision/F1 NULL when the class is never predicted.
    Output per class: (label, n_true, n_pred, tp, precision, recall, f1).
    """
    conf = df.groupBy(
        F.col(label_col).alias("y"), F.col(pred_col).alias("p")
    ).agg(F.count(F.lit(1)).alias("n"))
    # predicted totals live on a separate tiny frame: a class predicted
    # ONLY for other true classes has no (y, y) cell, so a window over
    # the y-grouped rows could never see its prediction count
    pred_totals = conf.groupBy(F.col("p").alias("label")).agg(
        F.sum("n").alias("n_pred")
    )
    per_class = conf.groupBy(F.col("y").alias("label")).agg(
        F.sum("n").alias("n_true"),
        F.coalesce(
            F.sum(F.when(F.col("p") == F.col("y"), F.col("n"))), F.lit(0)
        ).alias("tp"),
    )
    joined = per_class.join(F.broadcast(pred_totals), "label", "left")
    prec = F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred"))
    rec = F.col("tp") / F.col("n_true")
    return joined.select(
        "label",
        "n_true",
        F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
        "tp",
        F.round(prec, 4).alias("precision"),
        F.round(rec, 4).alias("recall"),
        F.round(
            F.when(
                prec.isNotNull() & (prec + rec > 0),
                2 * prec * rec / (prec + rec),
            ),
            4,
        ).alias("f1"),
    )


def linear_fit(
    df: DataFrame,
    features: list[tuple[str, Column]],
    target: Column,
    l2: float = 0.0,
    add_intercept: bool = True,
) -> DataFrame:
    """Multivariate linear / ridge regression in ONE distributed pass.

    The 100 TB way to fit a (small-K) linear model — e.g. a document-
    quality regressor over text statistics: reduce the fact table to the
    normal-equation sufficient statistics X'X (K(K+1)/2 upper-triangle
    entries), X'y (K), y'y and n in a single map-combined aggregation,
    then solve the K x K system on the driver. The data pass is exactly
    one scan + one tiny shuffle of partial-agg states regardless of row
    count; the driver holds K^2 numbers, never rows (the same bounded-
    collect contract as kmeans seeds / the BPE merge table).

    Exactness contract: every per-row product is cast to DECIMAL before
    summation, so the sufficient statistics are EXACT and independent of
    partitioning, task count, and engine — a DuckDB oracle recomputes
    them bit-for-bit (the op-tpch-q1 decimal-money lesson applied to
    X'X). The K x K solve then runs in EXACT RATIONAL arithmetic
    (fractions.Fraction Gaussian elimination — K is small and bounded,
    cost is driver-side microseconds), so the coefficients are a pure
    function of the data with NO float-summation or LAPACK dependence:
    when the target is exactly linear in the features, OLS recovers the
    generating coefficients exactly, and the oracle can pin them as
    literals at any scale factor.

    Ridge (``l2 > 0``) adds l2 to every non-intercept diagonal entry of
    X'X (the intercept is conventionally unpenalized). Guaranteed
    invariants surfaced for gating: ``normal_eq_ok`` (the exact solve
    satisfies its own normal equations — a self-check that degenerates
    only on a singular system, where the fit returns NULL coefficients)
    and ``r2`` (computed exactly, rounded to 6dp).

    Output: one row per feature (plus ``__intercept__``):
    (feature, coef double round-6, xty double — the EXACT decimal X'y
    entry for that feature, the oracle's recomputation hook), with
    per-fit scalars repeated on every row: n_rows, r2, normal_eq_ok.

    Singular X'X (collinear features, n < K): coefficients and r2 come
    back NULL with normal_eq_ok = 0 — never a raise (the empty-corpus /
    degenerate-input posture every operator here follows).
    """
    names = [n for n, _ in features]
    cols = [c for _, c in features]
    if add_intercept:
        names = ["__intercept__"] + names
        cols = [F.lit(1)] + cols
    k = len(cols)
    # per-row values on the exact decimal grid: features are expected to
    # be integer-valued expressions (counts, lengths, flags); the target
    # is expected on the 0.001 grid (e.g. binary-fraction generating
    # coefficients). Precisions are chosen so every PRODUCT stays within
    # DECIMAL(38,_) without scale reduction — (18,0)x(18,0) -> (37,0),
    # (18,0)x(18,3) -> (37,3), (18,3)x(18,3) -> (37,6) — because a
    # 38-digit overflow makes Spark round the product scale (engine-
    # dependent!) while these shapes stay EXACT in both Spark and DuckDB.
    xd = [c.cast("decimal(18,0)") for c in cols]
    yd = target.cast("decimal(18,3)")
    row = df.agg(*_linfit_aggs(xd, yd)).collect()[0]  # ONE row of stats

    spark = df.sparkSession
    schema = (
        "feature string, coef double, xty double, n_rows bigint, "
        "r2 double, normal_eq_ok int"
    )
    out = [
        (nm,) + tail
        for nm, tail in zip(names, _linfit_solve(row, k, l2, add_intercept))
    ]
    return spark.createDataFrame(out, schema)


def _linfit_aggs(xd: list[Column], yd: Column) -> list[Column]:
    """The normal-equation sufficient-statistic aggregates (exact
    decimal sums; see linear_fit's exactness contract)."""
    k = len(xd)
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(k):
        for j in range(i, k):
            aggs.append(F.sum(xd[i] * xd[j]).alias(f"xx_{i}_{j}"))
    for i in range(k):
        aggs.append(F.sum(xd[i] * yd).alias(f"xy_{i}"))
    aggs.append(F.sum(yd * yd).alias("yy"))
    return aggs


def _linfit_solve(row, k: int, l2: float, add_intercept: bool):
    """Exact-rational solve of one fit's sufficient statistics.

    ``row`` is any mapping of the _linfit_aggs aliases to values
    (a Spark Row or a pandas row). Returns, per coefficient index, the
    tuple (coef, xty, n_rows, r2, normal_eq_ok) — Nones on empty or
    singular input, never a raise."""
    from decimal import Decimal
    from fractions import Fraction

    n = int(row["n"])
    if n == 0 or row["xx_0_0"] is None:
        return [(None, None, 0, None, 0)] * k

    def frac(v) -> Fraction:
        return Fraction(Decimal(v))

    A = [[Fraction(0)] * k for _ in range(k)]
    for i in range(k):
        for j in range(i, k):
            A[i][j] = A[j][i] = frac(row[f"xx_{i}_{j}"])
    c = [frac(row[f"xy_{i}"]) for i in range(k)]
    xty_out = [float(row[f"xy_{i}"]) for i in range(k)]
    if l2:
        pen = Fraction(l2)
        for i in range(k):
            if not (add_intercept and i == 0):
                A[i][i] += pen

    # exact Gaussian elimination with partial (max-|pivot|) pivoting —
    # pivot choice only affects intermediate sizes, never the result
    M = [A[i][:] + [c[i]] for i in range(k)]
    sol: list[Fraction] | None = [Fraction(0)] * k
    for col in range(k):
        piv = max(range(col, k), key=lambda r: abs(M[r][col]))
        if M[piv][col] == 0:
            sol = None  # singular: collinear features or n < K
            break
        M[col], M[piv] = M[piv], M[col]
        for r in range(col + 1, k):
            f = M[r][col] / M[col][col]
            if f:
                for cc in range(col, k + 1):
                    M[r][cc] -= f * M[col][cc]
    if sol is not None:
        for i in range(k - 1, -1, -1):
            acc = M[i][k] - sum(M[i][j] * sol[j] for j in range(i + 1, k))
            sol[i] = acc / M[i][i]

    if sol is None:
        return [(None, xty_out[i], n, None, 0) for i in range(k)]

    # exact self-check + exact R^2 (rational arithmetic end to end)
    ok = all(
        sum(A[i][j] * sol[j] for j in range(k)) == c[i] for i in range(k)
    )
    yy = frac(row["yy"])
    sse = yy - 2 * sum(c[i] * sol[i] for i in range(k)) + sum(
        sol[i] * A[i][j] * sol[j] for i in range(k) for j in range(k)
    )
    if l2:  # A carries the penalty; SSE needs the raw X'X quadratic form
        sse = yy - 2 * sum(c[i] * sol[i] for i in range(k))
        for i in range(k):
            for j in range(k):
                aij = A[i][j]
                if i == j and not (add_intercept and i == 0):
                    aij = aij - Fraction(l2)
                sse += sol[i] * aij * sol[j]
    ybar = c[0] / n if add_intercept else Fraction(0)
    sst = yy - n * ybar * ybar if add_intercept else yy
    r2 = float(1 - sse / sst) if sst != 0 else None
    return [
        (
            round(float(sol[i]), 6),
            xty_out[i],
            n,
            round(r2, 6) if r2 is not None else None,
            int(ok),
        )
        for i in range(k)
    ]


def grouped_linear_fit(
    df: DataFrame,
    group_col: str,
    features: list[tuple[str, Column]],
    target: Column,
    l2: float = 0.0,
    add_intercept: bool = True,
) -> DataFrame:
    """Per-group linear / ridge regression — one model per group value
    (per-language quality calibration, per-source drift slopes), fully
    distributed end to end.

    Same exactness contract as ``linear_fit``, different topology: ONE
    grouped map-combined aggregation reduces the fact table to |groups|
    rows of exact-decimal sufficient statistics (the only data shuffle,
    and it moves partial-agg states, not rows), then the K x K
    exact-rational solves run INSIDE an applyInPandas over the tiny
    stats frame — per-group model fitting with zero driver state, so
    a million groups fit as cheaply as five. Arrow delivers Spark
    decimals as Python Decimal, so the workers' Fraction solve sees the
    exact values the aggregation produced.

    Output: one row per (group, feature): (group_col, feature, coef,
    xty, n_rows, r2, normal_eq_ok) — the linear_fit surface plus the
    group key; degenerate groups (singular X'X) carry NULL coef with
    normal_eq_ok = 0 while healthy groups are unaffected.
    """
    from ..session import ship_package

    names = [n for n, _ in features]
    cols = [c for _, c in features]
    if add_intercept:
        names = ["__intercept__"] + names
        cols = [F.lit(1)] + cols
    k = len(cols)
    xd = [c.cast("decimal(18,0)") for c in cols]
    yd = target.cast("decimal(18,3)")
    stats_df = df.groupBy(F.col(group_col).alias("__g")).agg(
        *_linfit_aggs(xd, yd)
    )
    g_dtype = df.schema[group_col].dataType.simpleString()
    out_schema = (
        f"{group_col} {g_dtype}, feature string, coef double, xty double, "
        "n_rows bigint, r2 double, normal_eq_ok int"
    )
    ship_package(df.sparkSession)  # the solver closure unpickles on workers

    def solve_groups(pdf):
        import pandas as pd

        out_rows = []
        for _, r in pdf.iterrows():
            for nm, tail in zip(names, _linfit_solve(r, k, l2, add_intercept)):
                out_rows.append((r["__g"], nm) + tail)
        return pd.DataFrame(
            out_rows,
            columns=[
                group_col, "feature", "coef", "xty",
                "n_rows", "r2", "normal_eq_ok",
            ],
        )

    return stats_df.groupBy("__g").applyInPandas(solve_groups, out_schema)


def ks_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ts_col: str = "ts",
    c_alpha: float = 1.358,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift test between the first and
    second half of each series — the distribution-shape companion to
    ``psi_drift`` (PSI sees bucket mass shifts; KS sees ANY CDF
    separation, bucket-free).

    The split point is the same deterministic integer time midpoint as
    psi_drift. The statistic is computed EXACTLY in integers: with
    per-side cumulative counts c_base(x), c_cur(x) at each distinct
    value x, D = max|c_base·n_cur − c_cur·n_base| / (n_base·n_cur) —
    the numerator is an int64 max (no float CDF subtraction), so the
    result is partitioning- and engine-independent and the final
    division is ONE IEEE op both engines perform identically.
    ``drifted`` applies the standard two-sample rejection bound
    D > c(α)·√((n1+n2)/(n1·n2)) (c=1.358 ↔ α=0.05).

    Scale shape: one map-combined groupBy(group, value, side) collapses
    the fact table to the distinct-value frame FIRST; the ordered
    running-sum window then runs over that collapsed frame, one task
    per group. For bounded-cardinality metrics that frame is tiny; for
    a continuous metric with ~all-distinct values on a 100 TB single
    group, pre-quantize the value (the psi_drift bucketing) or use the
    global_row_index range-partition prefix-sum shape instead.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    spans = df.groupBy(F.col(group_col).alias("__kg")).agg(
        F.floor((F.min(us) + F.max(us)) / 2).cast("long").alias("__mid")
    )
    tagged = df.join(
        F.broadcast(spans), F.col(group_col) == F.col("__kg")
    ).withColumn("__cur", (us >= F.col("__mid")).cast("int"))
    per_val = tagged.groupBy(F.col(group_col).alias("g"), F.col(value_col).alias("v")).agg(
        F.sum(F.when(F.col("__cur") == 0, 1).otherwise(0)).alias("d_base"),
        F.sum(F.col("__cur")).alias("d_cur"),
    )
    w_run = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("g")
    cum = per_val.select(
        "g",
        F.sum("d_base").over(w_run).alias("c_base"),
        F.sum("d_cur").over(w_run).alias("c_cur"),
        F.sum("d_base").over(w_all).alias("n_base"),
        F.sum("d_cur").over(w_all).alias("n_cur"),
    )
    out = cum.groupBy("g").agg(
        F.max(
            F.abs(
                F.col("c_base") * F.col("n_cur")
                - F.col("c_cur") * F.col("n_base")
            )
        ).alias("d_num"),
        F.max("n_base").alias("n_base"),
        F.max("n_cur").alias("n_cur"),
    )
    # try_divide: a one-sided group (all rows before/after its midpoint —
    # fuzz-reachable) has n_base·n_cur = 0; KS is undefined there and both
    # engines must say NULL (ANSI `/` would throw, DuckDB returns NULL)
    nn = F.col("n_base") * F.col("n_cur")
    ks_d = F.try_divide(F.col("d_num"), nn)
    bound = F.lit(c_alpha) * F.sqrt(
        F.try_divide(F.col("n_base") + F.col("n_cur"), nn)
    )
    return out.select(
        F.col("g").alias(group_col),
        F.col("n_base").cast("long").alias("n_base"),
        F.col("n_cur").cast("long").alias("n_cur"),
        F.col("d_num").cast("long").alias("d_num"),
        F.round(ks_d, 6).alias("ks_d"),
        F.when(nn > 0, (ks_d > bound).cast("int")).alias("drifted"),
    )


def chi2_independence(df: DataFrame, col_x: str, col_y: str) -> DataFrame:
    """Pearson χ² test of independence between two categorical columns —
    the hypothesis-test companion to ``mutual_info`` (MI measures the
    association's size in bits; χ²/Cramér's V calibrates it against the
    independence null).

    One map-combined joint ``groupBy(x, y).count()`` is the ONLY pass
    over the fact table (the mutual_info shape); marginals are window
    sums over the tiny |X|·|Y| joint frame. Observed-zero cells
    contribute e (not 0) to χ², so the sum runs over the PRESENT cells
    plus a closed-form correction: Σ_missing e = n − Σ_present e — no
    dense cell cross join is materialized. Output one row:
    (n, n_levels_x, n_levels_y, dof, chi2, cramers_v).
    """
    joint = df.groupBy(
        F.col(col_x).alias("x"), F.col(col_y).alias("y")
    ).agg(F.count(F.lit(1)).alias("n_xy"))
    w_all = Window.partitionBy()
    cells = joint.select(
        "n_xy",
        F.sum("n_xy").over(w_all).alias("n"),
        F.sum("n_xy").over(Window.partitionBy("x")).alias("n_x"),
        F.sum("n_xy").over(Window.partitionBy("y")).alias("n_y"),
        F.size(F.collect_set("x").over(w_all)).alias("kx"),
        F.size(F.collect_set("y").over(w_all)).alias("ky"),
    )
    # n_x·n_y as double BEFORE the divide: a long×long product overflows
    # at n ≳ 3e9 rows; sub-ulp exactness holds while counts < 2^53 (and
    # DuckDB's hugeint product lands on the same double in that range)
    e = F.col("n_x").cast("double") * F.col("n_y") / F.col("n")
    # clamp at 0: at (near-)exact independence the closed-form missing-
    # cell correction can cancel to a tiny NEGATIVE float, which would
    # make sqrt() NaN here and CRASH DuckDB's sqrt in the oracle twin
    chi2 = F.greatest(
        F.sum((F.col("n_xy") - e) * (F.col("n_xy") - e) / e)
        + F.max("n")
        - F.sum(e),
        F.lit(0.0),
    )
    k_min = F.least(F.max("kx") - 1, F.max("ky") - 1)
    # + 0.0 canonicalizes -0.0 → +0.0 at knife-edge rounds (the
    # pmi_bigrams convention) so both engines hash identically
    out = cells.agg(
        F.max("n").cast("long").alias("n"),
        F.max("kx").cast("int").alias("n_levels_x"),
        F.max("ky").cast("int").alias("n_levels_y"),
        ((F.max("kx") - 1) * (F.max("ky") - 1)).cast("int").alias("dof"),
        (F.round(chi2, 4) + F.lit(0.0)).alias("chi2"),
        (
            F.round(
                F.when(
                    k_min > 0, F.sqrt(chi2 / (F.max("n") * k_min))
                ),
                4,
            )
            + F.lit(0.0)
        ).alias("cramers_v"),
    )
    # empty input: the global agg manufactures one all-NULL row, but the
    # test is undefined on no data — emit ZERO rows (what a SQL twin's
    # GROUP BY over the empty cell frame produces)
    return out.where(F.col("n").isNotNull())
