"""Deduplication operators (SURVEY.md §2.9 / BASELINE.json north star).

Not in the reference (it has no dedup at all — SURVEY §2.7); these are the
LLM-training-data operators the north star requires, each designed for the
100 TB shape first:

- exact_dedup:        hash groupBy on the key (or all columns) — one shuffle
  on the dedup key, min-id representative kept. No window, no sort.
- ngram_jaccard_pairs: shingle → explode → self-equi-join on shingle →
  count/union arithmetic. The shuffle key is the shingle; hot shingles are
  the skew risk, so `max_df` drops shingles that occur in more than N docs
  (stop-shingle removal — standard MinHash-pipeline practice) before the
  join. Exact Jaccard, no LSH approximation.
- minhash_lsh_pairs:  spark.ml MinHashLSH over HashingTF shingle vectors —
  the sub-quadratic scale path (band-bucket join via approxSimilarityJoin).
- simhash:            64-bit SimHash from xxhash64 token hashes via 64
  conditional aggregations — one groupBy per corpus, no pairwise work;
  near-dups are hamming-close fingerprints (join on band equality).
- embedding near-dups: see similarity.cosine_pairs (threshold variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """op-dedup-exact: one representative row id (min id) per duplicate group.

    groupBy-min instead of Window(row_number): partial aggregation combines
    map-side, so the shuffle carries ~|groups| rows, not |rows|.
    """
    return df.groupBy(*key_cols).agg(F.min(id_col).alias(id_col))


def tokens_expr(text_col: str):
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle)."""
    toks = tokens_expr(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    return (
        df.select(F.col(id_col).alias("__id"), F.explode(grams).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """op-dedup-fuzzy (exact variant): pairs with shingle-set Jaccard >=
    threshold. Returns (id_a, id_b, jaccard) with id_a < id_b.

    Scale: the self-join shuffles on the shingle; `max_df` removes shingles
    present in more than `max_df` docs (they contribute join-explosion but
    little Jaccard mass). Leave None for oracle-exact semantics.
    """
    sh = shingles(df, id_col, text_col, n).cache()
    if max_df is not None:
        rare = (
            sh.groupBy("shingle").count().filter(F.col("count") <= max_df)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle")
    sizes = sh.groupBy("__id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("__id").alias("id_a"), "shingle")
    b = sh.select(F.col("__id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("__id").alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("__id").alias("id_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    num_hash_tables: int = 8,
    num_features: int = 1 << 18,
) -> DataFrame:
    """op-dedup-fuzzy (scale path): MinHash LSH candidate pairs with
    approximate Jaccard >= threshold. Sub-quadratic: shingle sets →
    HashingTF sparse vectors → MinHash signatures → banded bucket join
    (approxSimilarityJoin shuffles on bucket keys, never all-pairs).

    Returns (id_a, id_b, jaccard_approx) with id_a < id_b. Candidate recall
    grows with num_hash_tables; distances are exact Jaccard distances on the
    hashed feature space (collisions in HashingTF can merge rare shingles).
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = shingles(df, id_col, text_col, n)
    sets = sh.groupBy("__id").agg(F.collect_list("shingle").alias("sh"))
    tf = HashingTF(
        inputCol="sh", outputCol="features", numFeatures=num_features, binary=True
    )
    feats = tf.transform(sets)
    # MinHashLSH requires at least one non-zero entry; empty docs are dropped
    feats = feats.filter(F.size("sh") > 0)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(
        feats, feats, 1.0 - threshold, distCol="dist"
    )
    return (
        pairs.select(
            F.col("datasetA.__id").alias("id_a"),
            F.col("datasetB.__id").alias("id_b"),
            F.round(1.0 - F.col("dist"), 4).alias("jaccard_approx"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """op-dedup-simhash: 64-bit SimHash fingerprint per document.

    Token hashes via xxhash64 (JVM-side); bit j of the fingerprint is the
    sign of sum(+1/-1 over tokens' bit j). Implementation is explode +
    ONE groupBy with 64 conditional sums — a single shuffle keyed on the
    doc id, no pairwise comparisons. Near-dup retrieval then joins on
    fingerprint bands (e.g. 4x16-bit) — hamming-close docs collide.

    No DuckDB oracle: xxhash64 has no DuckDB twin (rows-only check).
    """
    tok = df.select(
        F.col(id_col).alias("__id"),
        F.explode(tokens_expr(text_col)).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    bit_sums = tok.groupBy("__id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(bits)
        ]
    )
    fp = sum(
        (F.when(F.col(f"b{j}") > 0, F.lit(1 << j) if j < 63 else F.lit(-(1 << 63))).otherwise(F.lit(0)))
        for j in range(bits)
    )
    return bit_sums.select(F.col("__id").alias(id_col), fp.alias("simhash"))


def simhash_band_candidates(fp_df: DataFrame, id_col: str, n_bands: int = 4) -> DataFrame:
    """Candidate near-dup pairs: equal 16-bit band of the simhash (hamming
    distance <= n_bands-1 guarantees a shared band). Join is on (band_idx,
    band_value) — linear shuffle, not quadratic."""
    band_w = 64 // n_bands
    bands = fp_df.select(
        F.col(id_col).alias("__id"),
        F.col("simhash"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("simhash"), i * band_w)
                    .bitwiseAND(F.lit((1 << band_w) - 1)).alias("val"),
                )
                for i in range(n_bands)
            ])
        ).alias("bv"),
    ).select("__id", "simhash", "bv.band", "bv.val")
    a = bands.select(F.col("__id").alias("id_a"), F.col("simhash").alias("fp_a"), "band", "val")
    b = bands.select(F.col("__id").alias("id_b"), F.col("simhash").alias("fp_b"), "band", "val")
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).alias("hamming"))
        .distinct()
    )
