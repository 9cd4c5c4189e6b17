"""Extension operator queries (SURVEY.md §2.9 + relational breadth §2.7).

Registered into the same QUERIES/ORACLES dicts as queries.py. Ops whose
Spark implementation uses engine-specific hashing (xxhash64 MinHash/SimHash)
or approximation (LSH) have no DuckDB twin → rows-only checks; the
oracle-checked ngram-Jaccard / brute-force-cosine variants pin the exact
semantics those approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import dedup, multimodal, similarity, text
from .queries import _t, query

# ---------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------

@query(
    "op-dedup-exact",
    oracle="""
    SELECT lang, source, min(doc_id) AS doc_id
    FROM documents GROUP BY lang, source
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-dedup-exact: representative (min-id) doc per (lang, source) group —
    hash groupBy, single shuffle, map-side combined."""
    return dedup.exact_dedup(
        _t(spark, sf_dir, "documents"), ["lang", "source"], "doc_id"
    )


def _jaccard_oracle(max_df: int | None = None) -> str:
    """DuckDB twin of ``dedup.ngram_jaccard_pairs`` — same 3-gram shingle
    sets, same Jaccard, and (when ``max_df`` is set) the IDENTICAL
    boilerplate-shingle filter: shingles present in more than max_df docs
    are excluded from the similarity definition on both engines, with
    set sizes recomputed on the surviving shingles."""
    df_filter = "" if max_df is None else f"""
    keep AS (SELECT shingle FROM sh0 GROUP BY shingle
             HAVING count(*) <= {max_df}),
    sh AS (SELECT sh0.* FROM sh0 JOIN keep USING (shingle)),"""
    alias = "sh AS (SELECT * FROM sh0)," if max_df is None else df_filter
    return f"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tokens
      FROM documents),
    sh0 AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(tokens)-2, 0)),
                    i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])) AS shingle
      FROM tok),
    {alias}
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           round(inter * 1.0 / (sa.n + sb.n - inter), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON id_a = sa.doc_id
    JOIN sizes sb ON id_b = sb.doc_id
    WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5
"""


_JACCARD_ORACLE = _jaccard_oracle()

# Boilerplate document-frequency cap for the REGISTERED op-dedup-fuzzy.
# Why 64, measured (testdata documents table):
# - gate SFs are untouched: max shingle df is 25 at sf0.1 (less at
#   sf0.01), so results there are byte-identical to the unfiltered op;
# - the corpus vocabulary is bounded (~52k distinct shingles at sf1 for
#   50k docs), so unfiltered candidate mass Sum(df^2) grows QUADRATICALLY:
#   2.8M at sf0.1 -> 202M at sf1 (the measured 13.1x time at 10x data in
#   BENCH_SCALING r6). With df<=64 the mass is bounded by
#   max_df * |shingle rows| = O(corpus), measured 68M at sf1;
# - semantics stay sane: df<=32 manufactures ~20k FALSE Jaccard>=0.99
#   pairs at sf1 (tiny surviving sets), while df<=64 keeps the genuine
#   rare-content near-dups (2,132 of the unfiltered 2,526 pairs at
#   j>=0.9) and drops only boilerplate-driven near-threshold pairs —
#   the standard stop-shingle discipline of LLM-corpus dedup.
_FUZZY_MAX_DF = 64


@query("op-dedup-fuzzy", oracle=_jaccard_oracle(max_df=_FUZZY_MAX_DF))
def q_dedup_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-dedup-fuzzy (exact n-gram Jaccard): near-dup pairs at tau=0.5 —
    the corpus has a clean gap (seeded dups ~0.98, background <0.3).

    Registered WITH the ``max_df`` boilerplate guard engaged (see
    _FUZZY_MAX_DF above): shingles in >64 docs are excluded from the
    similarity definition, mirrored exactly in the DuckDB oracle. This is
    what bounds the shared-shingle join to O(max_df * corpus) candidate
    rows — without it the bounded-vocabulary worst case is Theta(Sum df^2),
    quadratic in corpus size (r6's one scaling "watch"). The unguarded
    oracle-exact form stays available as dedup.ngram_jaccard_pairs(
    max_df=None) and is still exercised (unfiltered) inside the
    op-dedup-minhash / op-dedup-simhash recall gates."""
    return dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.5,
        max_df=_FUZZY_MAX_DF,
    )


@query(
    "op-dedup-minhash",
    oracle=f"""
    WITH pairs AS ({_JACCARD_ORACLE})
    SELECT CAST(count(*) AS BIGINT) AS n_exact,
           CAST(1 AS INTEGER) AS precision_exact,
           CAST(1 AS INTEGER) AS recall_ge_95
    FROM pairs
    """,
)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-dedup-fuzzy scale path: MinHash LSH pairs at tau=0.5, RECALL-GATED.

    Returns ONE row (n_exact, precision_exact, recall_ge_95): the exact
    n-gram Jaccard pair count (hash-pinned against the oracle's own
    derivation), then two STRUCTURAL gates the oracle pins to 1 —
    precision 1.0 (every emitted LSH pair re-verifies its Jaccard
    in-plan, so lsh ⊆ exact by construction, at any scale) and recall
    >= 95% (banding theory: a pair AT the tau=0.5 threshold shares a
    band with prob 1-(1-0.5^2)^16 ≈ 0.99, and pairs above threshold
    collide even more often, so 95% is a conservative floor). An earlier
    gate pinned recall = 1.0 exactly — true at sf0.01/sf0.1 and 99.4%
    at sf1 (85432/85945), i.e. the same corpus-luck class as the old
    simhash 4x-docs bound. A real recall collapse (banding bug, hash
    regression) still hash-mismatches; the pair-level output stays
    pinned by op-dedup-fuzzy's oracle."""
    docs = _t(spark, sf_dir, "documents")
    # ONE shared shingle/signature pass (r12 optimization round, guide
    # §2.4): both paths read the checkpointed sets frame — the exact
    # pairs explode its hshs arrays, the LSH pipeline bands its sig
    # column — instead of each re-tokenizing and re-shingling the corpus.
    # Pair-level equivalence to the old two-pass shape is pinned by
    # tests/test_extensions.py::test_jaccard_pairs_from_sets_matches_direct
    # and this query's unchanged oracle hash.
    sets = dedup.minhash_signature_sets(
        docs, "doc_id", "text", n=3, num_hashes=32
    )
    lsh = dedup.minhash_lsh_pairs_from_sets(
        sets, threshold=0.5, num_hashes=32
    ).select("id_a", "id_b")
    exact = dedup.jaccard_pairs_from_sets(sets, threshold=0.5).select(
        "id_a", "id_b"
    )
    # one full-outer pass counts exact / lsh / common together so the
    # shingle self-join and the minhash pipeline each execute ONCE — the
    # earlier crossJoin-of-aggregates re-ran both subtrees for their own
    # counts (Catalyst only reuses identical exchanges)
    both = exact.withColumn("__e", F.lit(1)).join(
        lsh.withColumn("__l", F.lit(1)), ["id_a", "id_b"], "full_outer"
    )
    return both.agg(
        F.count("__e").alias("n_exact"),
        F.count("__l").alias("__n_lsh"),
        F.count(
            F.when(F.col("__e").isNotNull() & F.col("__l").isNotNull(), 1)
        ).alias("__n_common"),
    ).select(
        "n_exact",
        (F.col("__n_lsh") == F.col("__n_common"))
        .cast("int")
        .alias("precision_exact"),
        (F.col("__n_common") * 100 >= F.col("n_exact") * 95)
        .cast("int")
        .alias("recall_ge_95"),
    )


@query(
    "op-dedup-simhash",
    oracle=f"""
    WITH pairs AS ({_JACCARD_ORACLE})
    SELECT CAST((SELECT count(*) FROM pairs) AS BIGINT) AS n_exact,
           TRUE AS zone_recall_ge_2of3,
           TRUE AS cand_linear
    """,
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-dedup-simhash: 64-bit fingerprints + banded hamming candidates
    behind the max_bucket skew guard, gated on STRUCTURAL properties.
    One row (n_exact, zone_recall_ge_2of3, cand_linear):

    - zone_recall_ge_2of3: of the exact Jaccard>=0.5 pairs whose
      fingerprints are within hamming <= n_bands-1 = 3 — banding's
      PIGEONHOLE ZONE, where an uncapped band join catches 100% by
      construction — the capped pipeline keeps >= 2/3 (measured 1.0 /
      0.98 / 0.83 at sf0.01/0.1/1; losses are cap-dropped mega-cluster
      buckets, the exact-dedup/line-dedup case). The zone join is linear
      (|exact pairs| rows). An earlier gate demanded 3/4 of ALL exact
      Jaccard pairs — corpus-dependent, not an algorithm property:
      SimHash approximates token-multiset cosine, not Jaccard, and on
      the sf1 replica (near-threshold pair mass) even UNCAPPED
      hamming<=8 candidates recover only 18% of Jaccard pairs.
    - cand_linear: candidate volume respects the guard's structural
      bound n_cand <= n_docs * n_bands * max_bucket / 2, which holds on
      ANY corpus (an earlier "<= 4x docs" bound was sf0.01 corpus luck:
      the sf0.1 table is denser and blew it 46x uncapped).

    Candidate pairs themselves stay pinned by unit tests."""
    n_bands, max_bucket = 4, 64
    docs = _t(spark, sf_dir, "documents")
    fp = dedup.simhash(docs, "doc_id", "text")
    cand_all = dedup.simhash_band_candidates(
        fp, "doc_id", n_bands=n_bands, max_bucket=max_bucket
    )
    exact = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5
    ).select("id_a", "id_b")
    fa = fp.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("__fa"))
    fb = fp.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("__fb"))
    # exact pairs carry their zone membership as a FLAG (not a filter),
    # and one full-outer join against the (distinct) candidate set serves
    # all four pair-level counts in a single pass — the earlier shape
    # crossJoined five 1-row aggregates, re-running the shingle self-join
    # and the zone joins for each count (Catalyst only reuses identical
    # exchanges). cand_all rows are distinct (id_a, id_b, hamming), so
    # the full outer cannot fan out.
    ez = (
        exact.join(fa, "id_a")
        .join(fb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.lit(1).alias("__e"),
            (
                F.bit_count(F.col("__fa").bitwiseXOR(F.col("__fb")))
                <= n_bands - 1
            ).cast("int").alias("__zone"),
        )
    )
    both = ez.join(
        cand_all.select("id_a", "id_b", "hamming"), ["id_a", "id_b"], "full_outer"
    )
    counts = both.agg(
        F.count("__e").alias("n_exact"),
        F.coalesce(F.sum("__zone"), F.lit(0)).alias("__n_zone"),
        F.count(
            F.when((F.col("__zone") == 1) & (F.col("hamming") <= 8), 1)
        ).alias("__n_rec"),
        F.count("hamming").alias("__n_cand"),
    )
    return counts.crossJoin(
        F.broadcast(docs.agg(F.count(F.lit(1)).alias("__n_docs")))
    ).select(
        "n_exact",
        (F.col("__n_rec") * 3 >= F.col("__n_zone") * 2).alias(
            "zone_recall_ge_2of3"
        ),
        (
            F.col("__n_cand") * 2
            <= F.col("__n_docs") * n_bands * max_bucket
        ).alias("cand_linear"),
    )


@query(
    "op-dedup-embedding",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
    """,
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-dedup-embedding: near-dup pairs by embedding cosine >= 0.4 via
    numpy-blocked matmul (mapInPandas over Arrow batches, corpus broadcast).
    Scores are engine-arithmetic-specific (float32 vs float64 summation), so
    the contract — and the oracle — is the PAIR SET, not the score."""
    pairs = similarity.cosine_pairs(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding", threshold=0.4
    )
    return pairs.select("id_a", "id_b")


# Banding-theory recall floor for sign-LSH at the query's threshold: a pair
# AT cos=tau agrees per hyperplane bit with prob p = 1 - acos(tau)/pi, shares
# a width-w band with prob p^w, and misses ALL b bands with prob
# (1-p^w)^b — pairs above tau miss strictly less often. The gate allows 3x
# that worst-case expected miss rate (covers the all-pairs-at-threshold
# corpus plus Poisson fluctuation of a fixed-seed draw); the floor is
# DERIVED from (tau, n_planes, band_width), not fitted to any corpus.
def _lsh_recall_floor_ppm(tau: float, n_planes: int = 32, band_width: int = 2) -> int:
    import math

    p = 1.0 - math.acos(tau) / math.pi
    miss = (1.0 - p**band_width) ** (n_planes // band_width)
    return int((1.0 - 3.0 * miss) * 1_000_000)


@query(
    "op-dedup-embedding-lsh",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_exact,
           CAST(1 AS INTEGER) AS precision_exact,
           CAST(1 AS INTEGER) AS recall_ge_floor
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    AND substr(md5(CAST(a.vec_id AS VARCHAR)), 1, 1) <= '4'
    AND substr(md5(CAST(b.vec_id AS VARCHAR)), 1, 1) <= '4'
    AND list_cosine_similarity(a.embedding, b.embedding) >= 0.4
    """,
)
def q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-dedup-embedding via banded sign-LSH candidates + exact re-score —
    fully distributed, no driver collect — RECALL-GATED like op-dedup-minhash.

    Returns ONE row (n_exact, precision_exact, recall_ge_floor). The gate
    measures precision/recall on a ~31% DETERMINISTIC CORPUS SAMPLE
    (first md5 hex digit of vec_id <= '4', i.e. 5/16 of ids — identical
    arithmetic in Spark and DuckDB, so the oracle pins the same subset):
    the LSH pipeline under test still runs on the FULL corpus (its pairs
    are the product), but the exact reference set — the quadratic blocked
    matmul that existed only to measure the gate — runs on the sample,
    ~10% of the pair mass and of the matmul cost (r8; the gate was ~2/3
    of the query's sf1 wall-clock). Sampling is hash-keyed, NOT id-modulo:
    near-dup pairs cluster at adjacent generator ids, and an id%k sample
    would systematically exclude same-residue-adjacent pairs. Soundness:
    per-pair banding miss probability is unchanged, so the theory floor
    applies to the sampled set exactly as to the full set (sf1: ~9.4k
    sampled true pairs, expected misses ~2.7, floor allowance ~8.4 — the
    3x slack is preserved). n_exact is the SAMPLED exact pair count,
    hash-pinned against the oracle's identically-sampled quadratic join.
    Precision is 1.0 up to an ulp-wide threshold boundary (every LSH
    pair carries its exact in-plan re-score, so lsh ⊆ exact by construction
    — except pairs whose cosine straddles tau within summation-order noise
    between the pairwise-sum re-score and the BLAS-matmul exact kernel;
    those are tolerated, see the gate comment), and recall >= the
    banding-theory floor (99.91% for tau=0.4, w=2, b=16 — see
    _lsh_recall_floor_ppm). An earlier gate pinned the LSH pair SET equal to
    the exact set — corpus-lucky: theory puts a pair at the threshold in no
    shared band with prob 2.96e-4, so sf1's 95,967 true pairs expect ~28
    misses (22 observed, cos 0.40–0.45), while the gate SFs' <10^3 pairs
    expect none. Same restructuring as the minhash/simhash gates (r6).

    NOTE the regime: at this low threshold (0.4 ~ 66° angles) width-2 bands
    make the candidate join near-quadratic — LSH earns its keep at
    thresholds >= ~0.8 where wide bands discriminate. For exact low-threshold
    pairs at scale, op-dedup-embedding-blocked is the right plan; pair-level
    outputs stay oracle-pinned by op-dedup-embedding[-blocked]."""
    emb = _t(spark, sf_dir, "embeddings")

    def _in_sample(col):
        return F.substring(F.md5(col.cast("string")), 1, 1) <= "4"

    lsh = (
        similarity.cosine_pairs_lsh(emb, "vec_id", "embedding", threshold=0.4)
        # restrict the MEASUREMENT to sampled-endpoint pairs; the pipeline
        # itself ran on the full corpus above
        .filter(_in_sample(F.col("id_a")) & _in_sample(F.col("id_b")))
        .select("id_a", "id_b", "cos")
    )
    exact = similarity.cosine_pairs_blocked(
        emb.filter(_in_sample(F.col("vec_id"))),
        "vec_id",
        "embedding",
        threshold=0.4,
    ).select("id_a", "id_b")
    floor_ppm = _lsh_recall_floor_ppm(0.4)
    # One full-outer pass counts exact / lsh / common together, so the
    # blocked matmul and the LSH pipeline each execute ONCE — the previous
    # crossJoin-of-aggregates shape re-ran both subtrees for their own
    # counts (Catalyst only reuses identical exchanges, and the agg vs join
    # exchanges differ), doubling the query's cost.
    both = exact.withColumn("__e", F.lit(1)).join(
        lsh.withColumn("__l", F.lit(1)), ["id_a", "id_b"], "full_outer"
    )
    # precision tolerates the threshold BOUNDARY: the LSH re-score is numpy
    # pairwise summation while the exact set is a BLAS matmul (identical
    # formula, different summation order), so a pair with true cos within an
    # ulp of tau can be admitted by one kernel and not the other. An lsh-only
    # pair is a precision VIOLATION only when its own re-score is clearly
    # above tau (> tau + 1e-4, past the round-4 display quantum) — a broken
    # kernel admitting genuinely sub-threshold pairs still scores them >= tau
    # itself and is caught; an ulp straddle is not a bug.
    return (
        both.agg(
            F.count("__e").alias("n_exact"),
            F.count("__l").alias("__n_lsh"),
            F.count(F.when(F.col("__e").isNotNull() & F.col("__l").isNotNull(), 1)).alias(
                "__n_common"
            ),
            F.count(
                F.when(
                    F.col("__e").isNull()
                    & F.col("__l").isNotNull()
                    & (F.col("cos") > 0.4 + 1e-4),
                    1,
                )
            ).alias("__n_lsh_only_clear"),
        )
        .select(
            "n_exact",
            (F.col("__n_lsh_only_clear") == 0)
            .cast("int")
            .alias("precision_exact"),
            (F.col("__n_common") * 1_000_000 >= F.col("n_exact") * floor_ppm)
            .cast("int")
            .alias("recall_ge_floor"),
        )
    )


@query(
    "op-dedup-embedding-blocked",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    AND list_cosine_similarity(a.embedding, b.embedding) >= 0.4
    """,
)
def q_dedup_embedding_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-dedup-embedding SCALE path: exact all-pairs via block-pair matmul
    (applyInPandas per block pair). No driver collect, no full-corpus
    broadcast — per-task memory is 2N/B x dim, every unordered pair meets in
    exactly one group. The variant a 1000-executor cluster should run for
    exact low-threshold near-dup; same pair-set oracle as op-dedup-embedding."""
    pairs = similarity.cosine_pairs_blocked(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding", threshold=0.4
    )
    return pairs.select("id_a", "id_b")


# ---------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------

@query(
    "op-sim-search",
    oracle="""
    SELECT query_id, neighbor_id, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                        c.vec_id) AS INT) AS rank
      FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
      WHERE q.vec_id < 8)
    WHERE rank <= 5
    """,
)
def q_sim_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-sim-search: exact brute-force cosine top-5 for 8 query vectors
    against the full corpus (query side broadcast; corpus distributed).
    Neighbor gaps >> float error on this data, so ranks are engine-stable;
    the contract is (query, neighbor, rank), scores stay internal."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(
        emb, emb.filter(F.col("vec_id") < 8), "vec_id", "embedding", k=5
    )


# Oracle for the recall-gated ANN queries: DuckDB derives the exact top-k
# universe size; the booleans assert the approximate path's quality floor.
# Aggregate recall at the default knobs measures 0.55-0.58 on this data
# and 8/8 queries get >= 1 true neighbor (deterministic — hash-seeded
# centroids/planes). The gated floors (aggregate >= 0.4, >= 3/4 of queries
# hit) sit a margin below the measured values so the gate survives modest
# testdata drift, while a plumbing break (empty probes, degenerate
# buckets, broken re-rank) lands near zero and fails the hash.
_ANN_RECALL_ORACLE = """
    WITH exact AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
      WHERE q.vec_id < 8
      QUALIFY row_number() OVER (
        PARTITION BY q.vec_id
        ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                 c.vec_id) <= 5)
    SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries,
           CAST(count(*) AS BIGINT) AS n_exact,
           TRUE AS most_queries_hit,
           TRUE AS recall_ge_2of5
    FROM exact
"""


def _ann_recall_summary(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """One-row quality summary of an approximate top-k vs its exact twin:
    (n_queries, n_exact, most_queries_hit, recall_ge_2of5). Both inputs are
    (query_id, neighbor_id, ...) frames; the hits semi-join and both
    aggregations are in-plan (nothing driver-side), so the driver's value
    hash pins the recall floor, not just a row count."""
    hits = approx.select("query_id", "neighbor_id").join(
        exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
    )
    per_q = (
        exact.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .join(
            hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hits")),
            "query_id",
            "left",
        )
        .select("query_id", "n_exact", F.coalesce("n_hits", F.lit(0)).alias("n_hits"))
    )
    # coalesce: with ZERO queries (empty corpus) the sums go NULL and the
    # recall gates must be vacuously TRUE, total 0 — the oracle's counts
    # over an empty exact set (r10 all-empty fuzz)
    return per_q.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.coalesce(F.sum("n_exact"), F.lit(0)).alias("n_exact"),
        F.coalesce(
            F.sum((F.col("n_hits") >= 1).cast("int")) * 4
            >= F.count(F.lit(1)) * 3,
            F.lit(True),
        ).alias("most_queries_hit"),
        F.coalesce(
            F.sum("n_hits") * 5 >= F.sum("n_exact") * 2, F.lit(True)
        ).alias("recall_ge_2of5"),
    )


@query("op-sim-search-ivf", oracle=_ANN_RECALL_ORACLE)
def q_sim_search_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-sim-search scale path #2: IVF coarse quantization (probe
    n_probe/n_centroids of the corpus per query, exact re-rank in-cell),
    RECALL-GATED: returns the one-row quality summary vs the exact top-k
    computed in-plan (see _ann_recall_summary) so the driver's hash check
    gates recall (>= 0.4 aggregate, >= 3/4 of queries hit), not row
    counts. Unit tests measure the finer-grained recall."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    exact = similarity.cosine_topk(emb, q, "vec_id", "embedding", k=5)
    approx = similarity.ivf_topk(emb, q, "vec_id", "embedding", k=5)
    return _ann_recall_summary(exact, approx)


@query("op-sim-search-lsh", oracle=_ANN_RECALL_ORACLE)
def q_sim_search_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-sim-search scale path: random-hyperplane LSH buckets + exact
    re-score, RECALL-GATED like op-sim-search-ivf (same summary shape,
    same oracle floor)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    exact = similarity.cosine_topk(emb, q, "vec_id", "embedding", k=5)
    approx = similarity.lsh_topk(emb, q, "vec_id", "embedding", k=5)
    return _ann_recall_summary(exact, approx)


# ---------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------

@query(
    "op-text-analysis",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, text,
             string_split_regex(lower(trim(text)), '\s+') AS tokens
      FROM documents)
    SELECT doc_id,
           length(text) AS n_chars,
           CAST(len(tokens) AS INT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT)
             AS n_bpe_tokens,
           CAST(len(list_distinct(tokens)) AS INT) AS n_distinct_tokens,
           round(length(regexp_replace(text, '\s+', '', 'g')) * 1.0
                 / greatest(len(tokens), 1), 4) AS mean_token_len
    FROM tok
    """,
)
def q_text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-text-analysis: per-doc token statistics, one JVM projection pass."""
    return text.token_stats(_t(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "op-text-quality",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, text,
             string_split_regex(lower(trim(text)), '\s+') AS tokens
      FROM documents)
    SELECT doc_id,
           round(
             0.4 * least(length(text) / 200.0, 1.0)
           + 0.3 * least((len(list_filter(tokens, t -> list_contains(
                 ['the','a','of','to','and','in','is','for','on','with'], t)))
                 * 1.0 / greatest(len(tokens), 1)) / 0.08, 1.0)
           + 0.3 * (1.0 - length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
                 * 1.0 / greatest(length(text), 1)), 4) AS quality
    FROM tok
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-text-quality: heuristic [0,1] quality score (length, stopword
    rate, punctuation ratio)."""
    return text.quality_score(_t(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "op-text-langid",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id,
             string_split_regex(lower(trim(text)), '\s+') AS tokens,
             greatest(len(string_split_regex(lower(trim(text)), '\s+')), 1) AS n
      FROM documents),
    rates AS (
      SELECT doc_id,
        len(list_filter(tokens, t -> list_contains(['the','and','of'], t))) * 1.0 / n AS r_en,
        len(list_filter(tokens, t -> list_contains(['el','la','los','de'], t))) * 1.0 / n AS r_es,
        len(list_filter(tokens, t -> list_contains(['le','les','des','une'], t))) * 1.0 / n AS r_fr,
        len(list_filter(tokens, t -> list_contains(['der','die','und','das'], t))) * 1.0 / n AS r_de,
        len(list_filter(tokens, t -> list_contains(['的','是','了'], t))) * 1.0 / n AS r_zh
      FROM tok)
    SELECT doc_id,
           CASE WHEN greatest(r_en, r_es, r_fr, r_de, r_zh) = 0 THEN 'unknown'
                WHEN r_en = greatest(r_en, r_es, r_fr, r_de, r_zh) THEN 'en'
                WHEN r_es = greatest(r_en, r_es, r_fr, r_de, r_zh) THEN 'es'
                WHEN r_fr = greatest(r_en, r_es, r_fr, r_de, r_zh) THEN 'fr'
                WHEN r_de = greatest(r_en, r_es, r_fr, r_de, r_zh) THEN 'de'
                ELSE 'zh' END AS lang_guess,
           round(greatest(r_en, r_es, r_fr, r_de, r_zh), 4) AS marker_rate
    FROM rates
    """,
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-text-langid: marker-stopword rate argmax (first-listed language
    wins ties — mirrored exactly in the oracle's CASE order)."""
    return text.langid(_t(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "op-text-fingerprint",
    oracle=r"""
    WITH norm AS (
      SELECT doc_id,
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
      FROM documents)
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, length(t)),
                              i -> CAST(ascii(substring(t, i, 1)) AS BIGINT))),
             (acc, x) -> (acc * 131 + x) % 1000000007) AS fingerprint
    FROM norm
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-text-fingerprint: rolling polynomial hash (base 131, mod 1e9+7)
    over whitespace-normalized text — identical fold on both engines."""
    return text.fingerprint(_t(spark, sf_dir, "documents"), "doc_id", "text")


# ---------------------------------------------------------------------
# multimodal columns
# ---------------------------------------------------------------------

@query(
    "op-multimodal-col",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS content_sha
    FROM documents
    """,
)
def q_multimodal_col(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-multimodal-col: opaque binary payload + typed metadata struct.
    Payloads here are utf-8 document bytes standing in for media bytes; the
    JVM-side plumbing (byte length, content hash) is the oracle-checked part."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "payload", F.encode("text", "utf-8")
    )
    wrapped = multimodal.attach_payload(docs, "payload", "image", "application/octet-stream")
    return wrapped.select(
        "doc_id", F.col("meta.n_bytes").alias("n_bytes"), "content_sha"
    )


# The stub decoder is sha256(payload)[:8]/255.0 (multimodal.py::fake_decode),
# which DuckDB can replicate exactly: sha256() yields the same lowercase hex,
# and each digest byte is two hex digits decoded via strpos arithmetic. The
# divisions are IEEE-identical on both sides (same integer / 255.0), so the
# eight feature columns compare bit-exact; only feat_norm needs the shared
# round-to-6dp (sqrt addition order ulps).
def _digest_byte(i: int) -> str:
    hexd = "'0123456789abcdef'"
    return (
        f"(strpos({hexd}, substr(hx, {2 * i + 1}, 1)) - 1) * 16"
        f" + (strpos({hexd}, substr(hx, {2 * i + 2}, 1)) - 1)"
    )


_DECODE_ORACLE = f"""
    WITH h AS (
      SELECT doc_id, sha256(coalesce(text, '')) AS hx FROM documents
    ),
    f AS (
      SELECT doc_id,
             {", ".join(f"CAST({_digest_byte(i)} AS DOUBLE) / 255.0 AS f{i}" for i in range(8))}
      FROM h
    )
    SELECT doc_id,
           round(sqrt({" + ".join(f"f{i} * f{i}" for i in range(8))}), 6) AS feat_norm,
           {", ".join(f"f{i}" for i in range(8))}
    FROM f
"""


@query("op-multimodal-decode", oracle=_DECODE_ORACLE)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-multimodal-col decode path: Arrow-batched mapInPandas feature
    extraction through the injected (stub) decoder. The decoder runs in
    Python workers (numpy over Arrow batches); the oracle recomputes the
    same sha256-derived features in pure SQL, so the whole mapInPandas
    plumbing — batch shape, schema, ordering — is value-checked, closing
    the last rows-only gap in the driver's 50-query gate."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "payload", F.encode("text", "utf-8")
    )
    wrapped = multimodal.attach_payload(docs, "payload", "image", "application/octet-stream")
    feats = multimodal.decode_features(wrapped, "doc_id")
    # Project the array<double> features to scalar columns for the harness:
    # the driver's pandas canonicalizer sorts every column and crashes on
    # list cells. The operator API keeps the raw array.
    return feats.select(
        "doc_id",
        "feat_norm",
        *[F.col("features").getItem(i).alias(f"f{i}") for i in range(8)],
    )


# op-multimodal-neardup oracle: re-derive the ENTIRE perceptual pipeline
# in SQL — sha256-digest features (as in _DECODE_ORACLE), [0,1]-byte
# quantization, Gray coding, signed-64 packing, 16-bit band self-join
# with the bucket-skew guard, Hamming filter. Every step is integer-
# or single-IEEE-op exact, so the pair set hash-matches bit-for-bit.
_NEARDUP_ORACLE = f"""
    WITH h AS (
      SELECT doc_id, sha256(coalesce(text, '')) AS hx FROM documents
    ),
    q AS (
      SELECT doc_id,
             {", ".join(
                 f"CAST(least(255, greatest(0, floor(({_digest_byte(i)})"
                 f" / 255.0 * 256))) AS INTEGER) AS q{i}"
                 for i in range(8)
             )}
      FROM h
    ),
    g AS (
      SELECT doc_id,
             {", ".join(f"xor(q{i}, q{i} >> 1) AS g{i}" for i in range(8))}
      FROM q
    ),
    fp AS (
      SELECT doc_id,
             CAST(CASE WHEN g7 >= 128 THEN g7 - 256 ELSE g7 END AS BIGINT)
               * (CAST(1 AS BIGINT) << 56)
             + {" + ".join(f"CAST(g{i} AS BIGINT) * {1 << (8 * i)}" for i in range(7))}
               AS fp,
             {", ".join(f"(g{2 * k} + 256 * g{2 * k + 1}) AS band{k}" for k in range(4))}
      FROM g
    ),
    bands AS (
      {" UNION ALL ".join(
          f"SELECT doc_id, fp, {k} AS band, band{k} AS val FROM fp"
          for k in range(4)
      )}
    ),
    guarded AS (
      SELECT doc_id, fp, band, val FROM (
        SELECT doc_id, fp, band, val,
               count(*) OVER (PARTITION BY band, val) AS bn
        FROM bands)
      WHERE bn <= 64
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hamming
    FROM guarded a JOIN guarded b ON a.band = b.band AND a.val = b.val
    WHERE a.doc_id < b.doc_id AND bit_count(xor(a.fp, b.fp)) <= 12
"""


@query("op-multimodal-neardup", oracle=_NEARDUP_ORACLE)
def q_multimodal_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-multimodal-neardup: perceptual near-dup pairs over opaque
    payloads (multimodal.neardup_payloads) — Arrow-batched decode →
    Gray-coded pHash fingerprints → banded Hamming candidates (the
    simhash LSH machinery) → exact bit_count(xor) filter. The exact
    sha256 dedup (op-multimodal-dedup) misses a one-bit re-encode by
    construction; this is the curation pass that catches it. The stub
    decoder keeps the fingerprints deterministic, so the oracle replays
    the full pipeline in SQL."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "payload", F.encode("text", "utf-8")
    )
    wrapped = multimodal.attach_payload(
        docs, "payload", "image", "application/octet-stream"
    )
    return multimodal.neardup_payloads(wrapped, "doc_id")


# ---------------------------------------------------------------------
# streaming (batch/stream dual plans; streaming execution via AvailableNow)
# ---------------------------------------------------------------------

@query(
    "op-stream-window-agg",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n, round(sum(value), 2) AS total
    FROM events GROUP BY 1, 2
    """,
)
def q_stream_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-stream-window-agg: tumbling 1h counts/sums per event_type executed
    AS A STREAMING QUERY (file source → watermark → windowed state → memory
    sink, Trigger.AvailableNow) — the result table is compared against the
    batch/DuckDB date_trunc twin, proving stream/batch result parity."""
    from .streaming import events as sev

    stream = sev.read_events_stream(spark, sf_dir)
    return sev.run_available_now(sev.windowed_agg(stream))


@query(
    "op-stream-session-window",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 10 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps)
    SELECT min(ts) AS session_start, user_id,
           count(*) AS n_events, round(sum(value), 2) AS session_value
    FROM sessions GROUP BY user_id, session_id
    """,
)
def q_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-stream-session-window: gap-based (10 min) per-user sessions via
    session_window — same operator streams with a watermark; the oracle
    reconstructs sessions with the classic lag/cumsum SQL."""
    from .streaming import events as sev

    ev = _t(spark, sf_dir, "events")
    return sev.sessionized(ev)


@query(
    "op-stream-stateful",
    oracle="""
    SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM events GROUP BY 1
    """,
)
def q_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-stream-stateful: custom stateful operator (applyInPandasWithState)
    — per-user running totals over the stream; after draining the backlog
    the final state per user must equal the batch groupBy (the oracle).
    Last update per user taken defensively in case the source splits the
    backlog into multiple micro-batches."""
    from pyspark.sql import Window

    from .streaming import events as sev

    stream = sev.read_events_stream(spark, sf_dir)
    # Python-stateful drain width sized to the BACKLOG (r12): one
    # worker+store per ~128 KiB clamped to [min(8, cores), cores] —
    # the measured winner at sf0.01/0.1/1 on both local[4] and
    # local[32]; see python_stateful_drain_partitions for the numbers.
    out = sev.run_available_now(
        sev.user_running_totals(stream),
        output_mode="update",
        state_partitions=sev.python_stateful_drain_partitions(spark, sf_dir),
    )
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value")
    )


# ---------------------------------------------------------------------
# relational breadth (§2.7 — free from Spark, exposed for completeness)
# ---------------------------------------------------------------------

@query(
    "op-window-topk",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per priority (window row_number, deterministic
    tie-break on key)."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )


@query(
    "op-join-broadcast",
    oracle="""
    SELECT r_name, count(*) AS n_orders,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY 1
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with every dimension broadcast — the fact table never
    shuffles before aggregation."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        # exact-integer-cents sum: order-independent (see op-rollup)
        .agg(F.count(F.lit(1)).alias("n_orders"),
             (F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
              / 100.0).alias("revenue"))
    )


@query(
    "op-sort-limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 global sort — Spark executes as per-partition top-K + merge
    (TakeOrderedAndProject), never a full sort at scale."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "op-asof-join",
    oracle="""
    SELECT event_id, user_id, ts,
           last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
    FROM events
    QUALIFY event_type = 'purchase'
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark lacks a native one): for each purchase, the user's
    most recent STRICTLY-prior click — window last_value(ignore nulls) over
    a rows-frame ending at 1 PRECEDING. One shuffle on user_id; no
    range-join explosion."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ev.withColumn(
            "last_click_ts",
            F.last(F.when(F.col("event_type") == "click", F.col("ts")), ignorenulls=True).over(w),
        )
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "last_click_ts")
    )


@query(
    "op-stream-dedup",
    oracle="""
    SELECT event_type, count(*) AS n FROM events GROUP BY 1
    """,
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-stream-dedup: exact dedup over an at-least-once stream. The
    events file is read TWICE (two stream sources unioned → every row
    duplicated); dropDuplicatesWithinWatermark collapses the duplicates
    with watermark-bounded state, so the drained output equals the batch
    table — the oracle counts the ORIGINAL events once."""
    from .streaming import events as sev

    doubled = sev.read_events_stream(spark, sf_dir).unionByName(
        sev.read_events_stream(spark, sf_dir)
    )
    out = sev.run_available_now(sev.deduped(doubled), output_mode="append")
    return out.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


@query(
    "op-kmeans",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_assigned,
           TRUE AS clusters_valid,
           TRUE AS wcss_monotone,
           TRUE AS wcss_le_global
    FROM embeddings
    """,
)
def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-kmeans: Lloyd's clustering as DataFrame ops — row-local assign
    (centroid literals in codegen), one k×dim partial-agg shuffle per
    update. Unit tests pin purity on separated synthetic clusters; here it
    clusters the embeddings table and returns a STRUCTURALLY GATED 1-row
    summary the DuckDB oracle pins (the minhash recall-gate shape — the
    iteration itself is not SQL-expressible, its invariants are):

    - n_assigned: every embedding gets exactly one assignment row
      (hash-pinned against count(*) of the table);
    - clusters_valid: all cluster ids in [0, k) and one row per vec_id;
    - wcss_monotone: the per-iteration WCSS sequence (recorded by the
      update shuffle itself, see kmeans(wcss_out=...)) never increases —
      Lloyd's convergence guarantee; a broken assign or update bumps it;
    - wcss_le_global: final WCSS <= total corpus variance (the k=1
      optimum) — k centroids chosen by k-means|| + Lloyd must beat the
      single global mean; computed against an in-plan variance agg
      (Σ_dim (Σx² − (Σx)²/n)), never a second corpus collect.
    """
    emb = _t(spark, sf_dir, "embeddings")
    k = 4
    wcss: list[float] = []
    assigned, _ = similarity.kmeans(
        emb, "vec_id", "embedding", k=k, max_iter=3, wcss_out=wcss
    )
    monotone = all(
        wcss[i + 1] <= wcss[i] * (1.0 + 1e-9) + 1e-9 for i in range(len(wcss) - 1)
    )
    final_wcss = wcss[-1] if wcss else 0.0
    # wcss_le_global relies on variance decomposition, which only holds once
    # centroids are cluster MEANS — i.e. after >=2 Lloyd iterations (the
    # first wcss entry measures cost against raw k-means|| seeds and can
    # legitimately exceed the k=1 optimum). max_iter=3 above satisfies this;
    # the flag below keeps the gate sound if anyone re-uses it with
    # max_iter=1: an undefined gate passes vacuously rather than flaking.
    wcss_gate_defined = len(wcss) >= 2
    stats = assigned.agg(
        F.count(F.lit(1)).alias("n_assigned"),
        F.coalesce(
            (F.min("cluster") >= 0)
            & (F.max("cluster") < k)
            & (F.count_distinct("vec_id") == F.count(F.lit(1))),
            F.lit(True),  # empty corpus: no rows to violate
        ).alias("clusters_valid"),
    )
    gvar = (
        emb.select(F.posexplode(F.col("embedding").cast("array<double>"))
                   .alias("dim", "x"))
        .groupBy("dim")
        .agg((F.sum(F.col("x") * F.col("x"))
              - F.pow(F.sum("x"), 2) / F.count(F.lit(1))).alias("v"))
        .agg(F.sum("v").alias("gv"))
    )
    return stats.crossJoin(F.broadcast(gvar)).select(
        "n_assigned",
        "clusters_valid",
        F.lit(bool(monotone)).alias("wcss_monotone"),
        F.coalesce(
            F.lit(not wcss_gate_defined)
            | (F.lit(float(final_wcss)) <= F.col("gv") * (1.0 + 1e-9) + 1e-6),
            F.lit(True),  # empty corpus: gv is NULL, nothing to beat
        ).alias("wcss_le_global"),
    )


@query(
    "op-text-topk-tokens",
    oracle="""
    SELECT tok, count(*) AS n FROM (
      SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
      FROM documents) t
    WHERE tok <> ''
    GROUP BY 1 ORDER BY n DESC, tok LIMIT 20
    """,
)
def q_text_topk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-k vocabulary: explode tokens → partial-agg count →
    TakeOrderedAndProject (per-partition top-k, no global sort). The
    building block for stop-shingle discovery (dedup.max_df) and BPE
    vocabulary induction."""
    from .operators.dedup import tokens_expr
    from .session import fan_out

    docs = fan_out(_t(spark, sf_dir, "documents"))
    return (
        docs.select(F.explode_outer(tokens_expr("text")).alias("tok"))
        .filter(F.col("tok").isNotNull() & (F.col("tok") != ""))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(20)
    )


@query(
    "op-multimodal-framesample",
    oracle="""
    SELECT doc_id, CAST(i AS INT) AS frame_idx,
           round(i / 2.0, 3) AS t_s
    FROM documents, generate_series(0, 3) t(i)
    WHERE doc_id < 200
    """,
)
def q_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-multimodal-col companion: deterministic frame sampling over opaque
    binary payloads (every k-th frame offset; the decode itself is the
    stubbed codec — Spark plumbing, schema, and batch shape are real).
    duration_s=2.0 at fps=2.0 ⇒ 4 frames per payload, which the DuckDB
    twin re-derives arithmetically — the oracle pins the sampling plan
    (frame count from metadata duration, timestamps) end to end. The doc
    subset is doc_id < 200, not limit(200): an un-ordered limit is an
    arbitrary subset and would be engine-dependent."""
    from .operators import multimodal

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select(
        "doc_id", F.encode("text", "utf-8").alias("raw")
    )
    payloads = multimodal.attach_payload(
        docs, "raw", "video", "video/mp4", duration_s=2.0
    )
    return multimodal.frame_sample(payloads, "doc_id", fps=2.0)


@query(
    "op-stream-stream-join",
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id
    FROM events c JOIN events p
      ON c.event_type = 'click' AND p.event_type = 'purchase'
     AND c.user_id = p.user_id
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
    """,
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-stream-stream-join: click→purchase attribution executed AS TWO
    STREAMS (watermarked time-interval join, state bounded by watermark +
    interval, AvailableNow drain) — result must equal the batch/DuckDB
    join, proving stream/batch parity for the join operator."""
    from .streaming import events as sev

    # infer the backlog's RAW schema once and feed it to both stream
    # reads — same files, one footer-read instead of two (r12
    # optimization round)
    raw_schema = sev.events_backlog_schema(spark, sf_dir)
    clicks = sev.read_events_stream(spark, sf_dir, schema=raw_schema).filter(
        F.col("event_type") == "click"
    )
    purchases = sev.read_events_stream(
        spark, sf_dir, schema=raw_schema
    ).filter(F.col("event_type") == "purchase")
    return sev.run_available_now(
        sev.purchases_after_clicks(clicks, purchases),
        output_mode="append",
        # a stream-stream join keeps FOUR state stores per partition, so
        # the drain is store-overhead-bound at batch-analytics width —
        # size to the backlog instead (1 MiB/partition, floor 2; the
        # measurement table lives on stateful_drain_partitions)
        state_partitions=sev.stateful_drain_partitions(
            spark, sf_dir, per_bytes=1 << 20, floor=2
        ),
    )


@query(
    "op-stream-foreachbatch",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
    FROM events GROUP BY 1
    """,
)
def q_stream_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-stream-foreachbatch: exactly-once sink for non-transactional
    stores. Each micro-batch lands a partial aggregate in a parquet
    directory keyed by batch_id (replay → same directory overwritten, no
    double counting); the read-back re-aggregated across batches equals
    the batch answer — which is exactly what the oracle computes from the
    static table. The reference's closest analog is its per-page JSON
    file sink with filename-based resume (main.py:52-86); this is that
    idea upgraded to Spark's deterministic-batch replay contract."""
    from .streaming import events as sev

    stream = sev.read_events_stream(spark, sf_dir, max_files_per_trigger=1)
    back = sev.run_foreach_batch_idempotent(stream, ["event_type"])
    return back.groupBy("event_type").agg(
        F.sum("n").alias("n"), F.round(F.sum("total"), 2).alias("total")
    )
