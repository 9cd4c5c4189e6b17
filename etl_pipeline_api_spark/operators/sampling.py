"""Deterministic sampling + training-shard assignment (SURVEY.md §2.9).

A training-data pipeline needs REPRODUCIBLE subsets (holdouts, per-domain
mixes, debug slices) and balanced output shards. Engine RNG sampling
(``df.sample``) is seed- and partitioning-dependent, so none of it is
oracle-checkable or stable across engines; everything here derives order
from a Knuth multiplicative hash of the row id —

    det_key(id) = (id * 2654435761) mod 2^32

— plain int64 arithmetic that DuckDB/any ANSI engine computes identically,
scrambles insertion order thoroughly, and never needs a seed exchange.
(For non-integer or adversarial keys swap in xxhash64 — same plan shape,
engine-specific constant, rows-only check.)

Scale shapes:
- stratified_sample: one window shuffle on the strata key; per-group state
  is a row_number counter, never the group.
- assign_shards / shard_stats: row-local shard id; stats are one
  map-combined groupBy carrying n_shards rows per task.
- write_shards: repartition(n_shards, shard) + sortWithinPartitions →
  each output file is one shard, internally ordered — what a data loader
  wants to stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

KNUTH = 2654435761  # 2^32 / golden ratio, the classic multiplicative mixer
M32 = 4_294_967_296


def det_key(id_col: Column | str) -> Column:
    """Deterministic pseudo-random sort key, identical in any int64 engine.

    The multiply is done in decimal: a bigint ``id * KNUTH`` overflows int64
    for ids ≥ ~3.47e9 (ARITHMETIC_OVERFLOW under ANSI mode — exactly the id
    regime of a 100 TB corpus). decimal(20,0) * decimal(10,0) → decimal(31,0)
    holds the product for every int64 id, matching DuckDB's silent
    int128/HUGEINT promotion bit-for-bit, so the oracle SQL stays the plain
    ``(id * 2654435761) % 4294967296``."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    wide = c.cast("decimal(20,0)") * F.lit(KNUTH).cast("decimal(10,0)")
    return (wide % F.lit(M32).cast("decimal(11,0)")).cast("long")


def stratified_sample(
    df: DataFrame, strata_cols: list[str], id_col: str, n_per: int
) -> DataFrame:
    """op-sample-stratified: exactly min(n_per, |stratum|) rows per stratum,
    chosen by deterministic hash order (ties broken by id — total order, so
    the sample is unique and rerun-stable)."""
    w = Window.partitionBy(*strata_cols).orderBy(det_key(id_col), F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per)
        .drop("__rn")
    )


def assign_shards(df: DataFrame, id_col: str, n_shards: int) -> DataFrame:
    """Row-local shard id in [0, n_shards): hash-scrambled so consecutive
    ids land on different shards (contiguous-id hotspots spread out)."""
    return df.withColumn("shard", (det_key(id_col) % F.lit(n_shards)).cast("int"))


def shard_stats(df: DataFrame, size_col: str, n_shards: int, id_col: str) -> DataFrame:
    """Shard balance report: row count + payload bytes per shard — the
    pre-write check that no training shard is pathologically hot."""
    return (
        assign_shards(df, id_col, n_shards)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(size_col)).alias("total_chars"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
        )
    )


def write_shards(
    df: DataFrame, path: str, id_col: str, n_shards: int, order_col: str | None = None
) -> None:
    """Materialize training shards: one file per shard, rows ordered within
    each shard (by the hash key unless order_col overrides) so a loader
    streams a shard sequentially with no further sort."""
    sharded = assign_shards(df, id_col, n_shards).repartition(n_shards, F.col("shard"))
    order = F.col(order_col) if order_col else det_key(id_col)
    sharded.sortWithinPartitions(order).write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(path)


def temperature_mix(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    temperature: float = 0.7,
    target_rows: int = 1000,
) -> DataFrame:
    """op-domain-temperature: temperature-scaled domain mixture — the
    multilingual/multi-domain rebalancing rule (share_d^T, T<1 upsamples
    the tail) used to compose pretraining mixes, made DETERMINISTIC.

    Per-domain keep count k_d = round(target_rows * share_d^T / Σ share^T)
    (capped at |d| — no replacement), rows chosen in Knuth-hash order:
    integer comparisons decide membership, so any int64 engine reproduces
    the exact row set (same contract as stratified_sample/weighted_mix —
    no RNG, no seed exchange, rerun-stable shards).

    Plan: one tiny groupBy for domain sizes (|domains| rows, broadcast
    back), one window shuffle on the domain for the ranked take. The
    weight math runs on the |domains|-row frame, never per data row.
    """
    sizes = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n"))
    w = F.pow(F.col("__n").cast("double"), F.lit(float(temperature)))
    tot = Window.partitionBy()
    quota = sizes.select(
        domain_col,
        "__n",
        F.least(
            F.col("__n"),
            F.round(F.lit(target_rows) * w / F.sum(w).over(tot)).cast("long"),
        ).alias("__k"),
    )
    wd = Window.partitionBy(domain_col).orderBy(det_key(id_col), F.col(id_col))
    return (
        df.join(F.broadcast(quota.select(domain_col, "__k")), domain_col)
        .withColumn("__rn", F.row_number().over(wd))
        .filter(F.col("__rn") <= F.col("__k"))
        .drop("__rn", "__k")
    )


def weighted_mix(
    df: DataFrame, domain_col: str, id_col: str, quotas: dict[str, int]
) -> DataFrame:
    """op-domain-mix: compose a training mixture by per-domain quota —
    take exactly min(quota[d], |d|) rows from each domain in deterministic
    hash order, drop domains with no quota. This is the "20% code, 5%
    books" mixing step; rerun-stable so a re-export ships byte-identical
    shards.

    Same single window shuffle as stratified_sample; the variable per-group
    limit is a when-chain literal (quotas are small driver-side config, not
    data). Domains absent from `quotas` are filtered BEFORE the shuffle.
    """
    limit = F.lit(None).cast("int")
    for dom, n in quotas.items():
        limit = F.when(F.col(domain_col) == dom, F.lit(n)).otherwise(limit)
    w = Window.partitionBy(domain_col).orderBy(det_key(id_col), F.col(id_col))
    return (
        df.filter(F.col(domain_col).isin(*quotas.keys()))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= limit)
        .drop("__rn")
    )


def weighted_sample(
    df: DataFrame, id_col: str, weight_col: str, k: int
) -> DataFrame:
    """Deterministic weighted sampling without replacement (A-ES /
    Efraimidis-Spirakis): priority = u^(1/w) with u the det_key uniform,
    take the k largest — inclusion probability rises with weight, the
    standard way to sample docs ∝ quality/length for a training mix.
    Rows with non-positive weight are excluded (their priority is
    undefined).

    Deterministic: u derives from det_key(id), so the same input always
    yields the same sample, in any partitioning; ties (identical
    priority ⟹ identical (u, w)) break on id. Scale shape: row-local
    priority + global top-k (per-partition heads then a k·p-row driver
    merge — no full sort, no shuffle of the data). The float pow means
    cross-ENGINE membership is not bit-guaranteed (unlike det_key
    order), so the oracle gate checks the sample's invariants — size
    and heavy-bias — not exact membership; rerun-stability is pinned by
    unit test."""
    u = (det_key(id_col) + F.lit(1.0)) / F.lit(float(M32 + 1))
    pri = F.pow(u, F.lit(1.0) / F.col(weight_col))
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__pri", pri)
        .orderBy(F.col("__pri").desc(), F.col(id_col))
        .limit(k)
        .drop("__pri")
    )


def negative_samples(
    emb: DataFrame,
    anchors: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 4,
    max_cos: float = 0.5,
) -> DataFrame:
    """Deterministic contrastive negative sampling — for each anchor,
    ``m`` pseudo-random corpus items that are NOT semantically close
    (cosine < ``max_cos``), the standard guard against false negatives
    when mining contrastive training pairs (a random "negative" that is
    actually a near-duplicate teaches the model to collapse).

    Sampling key: sha256(anchor_id:candidate_id) hex — a per-PAIR
    deterministic uniform, so the draw is rerunnable, shard-independent,
    and engine-portable (a DuckDB oracle replays the exact sample; the
    repo-wide no-RNG rule). Plan shape is the op-sim-search scan: the
    bounded anchor set broadcasts across ONE corpus pass (JVM dot
    products, no Python), then a per-anchor window takes the m smallest
    keys among the far-enough candidates — |anchors| partitions, each
    a linear scan. Output: (anchor_id, neg_id, rank), rank 1..m by
    (key, neg_id) — the sampled SET is the contract; cosine scores are
    engine-arithmetic-specific and stay internal (the op-dedup-embedding
    convention).
    """
    from .similarity import _dot, _norm

    a = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(vec_col).cast("array<double>").alias("av"),
    ).withColumn("an", _norm(F.col("av")))
    c = emb.select(
        F.col(id_col).alias("neg_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("cn", _norm(F.col("cv")))
    scored = (
        c.crossJoin(F.broadcast(a))
        .filter(F.col("anchor_id") != F.col("neg_id"))
        .withColumn(
            # try_divide: zero-norm candidates have no direction; NULL
            # cosine fails the < max_cos guard (cannot be certified far)
            "cos",
            F.try_divide(
                _dot(F.col("av"), F.col("cv")), F.col("an") * F.col("cn")
            ),
        )
        .filter(F.col("cos") < max_cos)
        .withColumn(
            "__key",
            F.sha2(
                F.concat_ws(
                    ":",
                    F.col("anchor_id").cast("string"),
                    F.col("neg_id").cast("string"),
                ),
                256,
            ),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy("__key", "neg_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= m)
        .select(
            "anchor_id",
            "neg_id",
            F.col("rank").cast("int").alias("rank"),
        )
    )
