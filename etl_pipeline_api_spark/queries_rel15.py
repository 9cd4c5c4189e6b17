"""Relational batch 15 — production monitoring + private release
(SURVEY.md §2.9 extensions).

- op-psi-drift: Population Stability Index per event type between the
  first and second half of its time range — the model-monitoring drift
  score, computed from baseline-decile buckets.
- op-dp-counts: ε-differentially-private group counts via the Laplace
  mechanism with a DETERMINISTIC (det_key-mixed) noise draw, so the
  release mechanism itself — sensitivity, scale, inverse-CDF — is
  oracle-verified.

Both DuckDB-oracle-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import stats
from .queries import _t, query


@query(
    "op-psi-drift",
    oracle="""
    WITH s AS (
      SELECT event_type AS g, value, epoch_us(ts) AS us FROM events),
    m AS (SELECT g, (min(us) + max(us)) // 2 AS mid FROM s GROUP BY 1),
    t AS (
      SELECT s.*, CASE WHEN us >= mid THEN 1 ELSE 0 END AS cur
      FROM s JOIN m USING (g)),
    e AS (
      SELECT g, quantile_cont(value,
               [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS edges
      FROM t WHERE cur = 0 GROUP BY 1),
    bk AS (
      SELECT t.g, cur,
             len(list_filter(e.edges, x -> t.value > x)) AS b,
             count(*) AS n
      FROM t JOIN e USING (g) GROUP BY 1, 2, 3),
    sh AS (
      SELECT g, cur, b,
             n * 1.0 / sum(n) OVER (PARTITION BY g, cur) AS p,
             sum(n) OVER (PARTITION BY g, cur) AS n_side
      FROM bk),
    ba AS (SELECT g, b, p AS pb, n_side AS nb FROM sh WHERE cur = 0),
    cu AS (SELECT g, b, p AS pc, n_side AS nc FROM sh WHERE cur = 1),
    j AS (
      SELECT coalesce(ba.g, cu.g) AS g,
             greatest(coalesce(pb, 0), 1e-6) AS pb,
             greatest(coalesce(pc, 0), 1e-6) AS pc,
             coalesce(nb, 0) AS nb, coalesce(nc, 0) AS nc
      FROM ba FULL JOIN cu USING (g, b))
    SELECT g AS event_type,
           CAST(max(nb) AS BIGINT) AS n_base,
           CAST(max(nc) AS BIGINT) AS n_cur,
           round(sum((pc - pb) * ln(pc / pb)), 4) AS psi
    FROM j GROUP BY 1
    """,
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-psi-drift: PSI per event type, first vs second half of the
    series — baseline-decile buckets broadcast back, row-local bucket
    assignment via an array scan, two map-combined aggs; 1e-6 clamp on
    empty current buckets (operators/stats.py psi_drift)."""
    return stats.psi_drift(
        _t(spark, sf_dir, "events"), "event_type", "value"
    )


@query(
    "op-dp-counts",
    oracle="""
    WITH c AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
    r AS (
      SELECT *, dense_rank() OVER (ORDER BY event_type) AS gid FROM c),
    k AS (
      SELECT event_type, n,
             (((gid * 2654435761) % 4294967296) + 0.5) / 4294967296.0 AS u
      FROM r)
    SELECT event_type,
           round(n + (-1.0) * sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5)), 4)
             AS n_noisy,
           1.0 AS epsilon
    FROM k
    """,
)
def q_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-dp-counts: Laplace-mechanism event-type counts at epsilon=1 —
    dense-rank group ids under the name total order, det_key-mixed
    uniform, inverse-CDF noise; true counts never reach the output
    schema (operators/stats.py dp_noisy_counts)."""
    return stats.dp_noisy_counts(_t(spark, sf_dir, "events"), "event_type")


# Oracle for op-random-project: the Achlioptas matrix is inlined as
# literals (it IS part of the query definition — deterministic Knuth-mix
# of the (row, col) index, reproducible in any engine).
def _rp_oracle(out_dim: int = 16, in_dim: int = 64) -> str:
    from .operators.similarity import _achlioptas_matrix

    m = _achlioptas_matrix(out_dim, in_dim)
    scale = (3.0 / out_dim) ** 0.5
    def coord(k: int) -> str:
        return (
            "list_dot_product(v, ["
            + ", ".join(f"{float(e)}" for e in m[k])
            + f"]) * {scale!r}"
        )

    all_coords = ", ".join(coord(k) for k in range(out_dim))
    return f"""
    WITH t AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT vec_id,
           round({coord(0)}, 4) + 0.0 AS p0,
           round({coord(out_dim - 1)}, 4) + 0.0 AS p{out_dim - 1},
           round(sqrt(list_sum(list_transform([{all_coords}],
                 x -> x * x))), 4) + 0.0 AS pnorm
    FROM t
    """


@query("op-random-project", oracle=_rp_oracle())
def q_random_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-random-project: Johnson–Lindenstrauss 64→16 reduction with the
    deterministic Achlioptas ±1 sparse matrix — row-local zip_with +
    aggregate per output coordinate, zero shuffle; cuts every downstream
    ANN/dedup dot product 4x (operators/similarity.py random_project).
    The hash check probes the first/last coordinate and the full
    projection norm (arrays don't canonicalize; the norm covers every
    coordinate)."""
    from .operators import similarity

    proj = similarity.random_project(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding", out_dim=16
    )
    # + 0.0 canonicalizes IEEE -0.0 → 0.0 after round (both sides)
    return proj.select(
        "vec_id",
        (F.round(F.col("proj")[0], 4) + F.lit(0.0)).alias("p0"),
        (F.round(F.col("proj")[15], 4) + F.lit(0.0)).alias("p15"),
        (
            F.round(
                F.sqrt(
                    F.aggregate("proj", F.lit(0.0), lambda a, x: a + x * x)
                ),
                4,
            )
            + F.lit(0.0)
        ).alias("pnorm"),
    )


@query(
    "op-bpe-train",
    oracle=r"""
    WITH wrd AS (
      SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
      FROM documents),
    wf AS (SELECT w, count(*) AS n FROM wrd WHERE w <> '' GROUP BY 1),
    sym AS (
      SELECT n,
             list_append(
               list_transform(generate_series(1, length(w)),
                              i -> substring(w, i, 1)),
               '</w>') AS s
      FROM wf),
    pr AS (
      SELECT unnest(s[1:len(s) - 1]) AS a, unnest(s[2:len(s)]) AS b, n
      FROM sym),
    pc AS (SELECT a, b, sum(n) AS cnt FROM pr GROUP BY 1, 2),
    frst AS (SELECT a, b, cnt FROM pc ORDER BY cnt DESC, a ASC, b ASC LIMIT 1)
    SELECT CAST(8 AS INT) AS n_merges,
           a AS first_left, b AS first_right, CAST(cnt AS BIGINT) AS first_n,
           TRUE AS counts_ge_2, TRUE AS merged_concat_ok
    FROM frst
    """,
)
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-bpe-train: the FULL BPE training loop (op-bpe-pairs is one
    round of it) — 8 merge rounds over the word-frequency table; each
    round is one vocab-frame pair agg + deterministic argmax + a
    row-local Catalyst merge fold, lineage checkpointed per round.

    The iterative argmax FEEDBACK is not SQL-expressible, but the merge
    table's structure is — this query emits a 1-row summary the DuckDB
    oracle pins (rows-only until r8): the FIRST merge is exactly the
    argmax of the round-1 weighted symbol-pair counts ((cnt desc, a, b)
    order), which DuckDB derives independently from the raw corpus
    (first_left/first_right/first_n are exact value pins, the same class
    as op-bpe-pairs); n_merges = 8; every merge count respects the >= 2
    stop condition; merged == left || right on every row. Rounds 2-8's
    exact contents stay pinned by the pure-Python Sennrich reference in
    tests/test_stats_graph.py and by op-bpe-encode's compression twin
    (operators/text.py bpe_train).

    GATE CONTRACT (r9, ADVICE): the oracle pins n_merges = 8, which is
    only correct on corpora that SUSTAIN 8 merges (best pair count >= 2
    every round). All gate SFs do (verified in the full sweeps at
    sf0.001/0.01/0.1 and SF1CHECK at sf1). A corpus that legitimately
    exhausts merges early is NOT an engine bug, so instead of a silent
    hash mismatch this query raises a named contract error; a corpus
    with no words at all returns 0 rows on BOTH sides (the oracle's
    LIMIT 1 over an empty pair table emits nothing)."""
    from .operators.text import bpe_train

    docs = _t(spark, sf_dir, "documents")
    mt = bpe_train(docs, "text", n_merges=8)
    n_trained = mt.count()  # local relation (driver-built) — instant
    if n_trained != 8:
        schema = (
            "n_merges int, first_left string, first_right string, "
            "first_n bigint, counts_ge_2 boolean, merged_concat_ok boolean"
        )
        if n_trained == 0 and docs.where(
            F.trim(F.col("text")) != ""
        ).isEmpty():
            # word-free corpus: oracle emits 0 rows too
            return spark.createDataFrame([], schema)
        raise AssertionError(
            f"op-bpe-train gate contract violated: corpus sustained only "
            f"{n_trained}/8 merges (best-pair count dropped below 2). The "
            "oracle hard-pins n_merges=8; re-derive the gate for this "
            "corpus or exclude it — this is a gate-corpus property, not "
            "an engine defect (see docstring)."
        )
    return mt.agg(
        F.count(F.lit(1)).cast("int").alias("n_merges"),
        F.min_by("left", "rnk").alias("first_left"),
        F.min_by("right", "rnk").alias("first_right"),
        F.min_by("n", "rnk").cast("bigint").alias("first_n"),
        (F.min("n") >= 2).alias("counts_ge_2"),
        (
            F.sum(
                F.when(
                    F.col("merged") != F.concat(F.col("left"), F.col("right")),
                    1,
                ).otherwise(0)
            )
            == 0
        ).alias("merged_concat_ok"),
    )


@query(
    "op-bpe-encode",
    oracle=r"""
    WITH wrd AS (
      SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
      FROM documents),
    wok AS (SELECT w FROM wrd WHERE w <> '')
    SELECT (SELECT count(*) FROM documents) AS n_docs,
           CAST(coalesce(sum(length(w) + 1), 0) AS BIGINT) AS char_tokens,
           count(*) AS n_words,
           TRUE AS bpe_le_chars, TRUE AS bpe_ge_words
    FROM wok
    """,
)
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-bpe-encode: train 8 merges, then encode the corpus with them —
    the inference half of the tokenizer; one row-local pass, zero
    shuffle, merge table baked into the plan as literals
    (operators/text.py bpe_encode).

    Oracle (r9 — closes the last rows-only gate): the greedy iterative
    merge loop itself is not SQL-expressible, but its input and bounds
    are. char_tokens is EXACTLY derivable from the raw corpus — every
    non-empty whitespace-split word contributes length(w) characters
    plus one </w> marker — as is n_words; DuckDB pins both to the digit.
    n_bpe_tok is gated by its structural invariants: each merge only
    shrinks a word's token sequence (bpe <= chars) and every word
    encodes to >= 1 token (bpe >= n_words). The exact per-word BPE
    counts stay pinned by the pure-Python Sennrich reference and the
    JVM-fold-vs-pandas path equality test in tests/test_stats_graph.py.
    """
    from .operators.text import bpe_encode, bpe_train

    docs = _t(spark, sf_dir, "documents")
    merges = [
        (r["left"], r["right"])
        for r in bpe_train(docs, "text", n_merges=8).orderBy("rnk").collect()
    ]
    enc = bpe_encode(docs, "doc_id", "text", merges)
    # coalesce-to-0 on every total (ADVICE r9): NULL-text docs carry NULL
    # per-doc counts on BOTH encode paths (sum skips them, matching the
    # oracle's unnest-of-NULL emitting no rows), but a corpus that is
    # EMPTY or entirely word-free would sum to NULL and turn both bound
    # flags NULL while the oracle emits TRUE — pin the degenerate corpus
    # to 0s so the flags stay boolean (oracle side coalesces char_tokens
    # identically).
    tot = enc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum("n_chars_tok"), F.lit(0)).alias("char_tokens"),
        F.coalesce(F.sum("n_bpe_tok"), F.lit(0)).alias("bpe_tokens"),
    )
    # n_words from the same split the encoder uses (JVM-side, one scan).
    # NULL text pins the per-doc count to 0 explicitly — conf-independent
    # (size(NULL) is NULL by default but -1 under legacy sizeOfNull, and
    # either value would corrupt the sum; ADVICE r9).
    nw = docs.agg(
        F.coalesce(
            F.sum(
                F.when(F.col("text").isNull(), F.lit(0)).otherwise(
                    F.size(
                        F.filter(
                            F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                            lambda w: w != "",
                        )
                    )
                )
            ),
            F.lit(0),
        ).alias("n_words")
    )
    return tot.crossJoin(F.broadcast(nw)).select(
        "n_docs",
        "char_tokens",
        "n_words",
        (F.col("bpe_tokens") <= F.col("char_tokens")).alias("bpe_le_chars"),
        (F.col("bpe_tokens") >= F.col("n_words")).alias("bpe_ge_words"),
    )


@query(
    "op-hll-intersect",
    oracle="""
    WITH p AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'purchase'),
    v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view')
    SELECT (SELECT count(*) FROM p) AS n_a,
           (SELECT count(*) FROM v) AS n_b,
           (SELECT count(*) FROM p JOIN v USING (user_id)) AS n_exact,
           true AS within_tol
    """,
)
def q_hll_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-hll-intersect: audience-overlap estimation from PERSISTED
    sketches via inclusion–exclusion — |A∩B| ≈ |A|+|B|−|A∪B| on HLL
    estimates, tolerance-gated against the exact overlap. This is the
    sketch-algebra completion of op-hll-merge (union): segment overlap
    at 100 TB from two KB-sized sketches, no raw-data join. The
    tolerance is wider than the union case (inclusion–exclusion
    differences amplify relative error) — 10% of the smaller set or
    ±10 absolute, whichever is larger."""
    ev = _t(spark, sf_dir, "events")
    sk = ev.agg(
        F.hll_sketch_agg(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("sk_a"),
        F.hll_sketch_agg(
            F.when(F.col("event_type") == "view", F.col("user_id"))
        ).alias("sk_b"),
    ).select(
        F.hll_sketch_estimate("sk_a").alias("est_a"),
        F.hll_sketch_estimate("sk_b").alias("est_b"),
        F.hll_sketch_estimate(
            F.hll_union("sk_a", "sk_b")
        ).alias("est_ab"),
    )
    exact = ev.agg(
        F.count_distinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("n_a"),
        F.count_distinct(
            F.when(F.col("event_type") == "view", F.col("user_id"))
        ).alias("n_b"),
    )
    exact_inter = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .join(
            ev.where(F.col("event_type") == "view")
            .select("user_id")
            .distinct(),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    est_inter = F.col("est_a") + F.col("est_b") - F.col("est_ab")
    tol = F.greatest(
        F.lit(10.0),
        0.10 * F.least(F.col("n_a"), F.col("n_b")),
    )
    return (
        sk.crossJoin(exact)
        .crossJoin(F.broadcast(exact_inter))
        .select(
            "n_a",
            "n_b",
            "n_exact",
            (F.abs(est_inter - F.col("n_exact")) <= tol).alias("within_tol"),
        )
    )


@query(
    "op-langid-eval",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, lang,
             string_split_regex(lower(trim(text)), '\s+') AS tokens,
             greatest(len(string_split_regex(lower(trim(text)), '\s+')), 1) AS n
      FROM documents),
    rates AS (
      SELECT doc_id, lang,
        len(list_filter(tokens, t -> list_contains(['the','and','of'], t))) * 1.0 / n AS r_en,
        len(list_filter(tokens, t -> list_contains(['el','la','los','de'], t))) * 1.0 / n AS r_es,
        len(list_filter(tokens, t -> list_contains(['le','les','des','une'], t))) * 1.0 / n AS r_fr,
        len(list_filter(tokens, t -> list_contains(['der','die','und','das'], t))) * 1.0 / n AS r_de,
        len(list_filter(tokens, t -> list_contains(['的','是','了'], t))) * 1.0 / n AS r_zh
      FROM tok),
    pred AS (
      SELECT lang AS y,
             CASE WHEN greatest(r_en, r_es, r_fr, r_de, r_zh) = 0 THEN 'unknown'
                  WHEN r_en = greatest(r_en, r_es, r_fr, r_de, r_zh) THEN 'en'
                  WHEN r_es = greatest(r_en, r_es, r_fr, r_de, r_zh) THEN 'es'
                  WHEN r_fr = greatest(r_en, r_es, r_fr, r_de, r_zh) THEN 'fr'
                  WHEN r_de = greatest(r_en, r_es, r_fr, r_de, r_zh) THEN 'de'
                  ELSE 'zh' END AS p
      FROM rates),
    conf AS (SELECT y, p, count(*) AS n FROM pred GROUP BY 1, 2),
    pt AS (SELECT p AS label, sum(n) AS n_pred FROM conf GROUP BY 1),
    pc AS (
      SELECT y AS label, sum(n) AS n_true,
             coalesce(sum(CASE WHEN p = y THEN n END), 0) AS tp
      FROM conf GROUP BY 1),
    j AS (SELECT pc.*, pt.n_pred FROM pc LEFT JOIN pt USING (label))
    SELECT label, CAST(n_true AS BIGINT) AS n_true,
           CAST(coalesce(n_pred, 0) AS BIGINT) AS n_pred,
           CAST(tp AS BIGINT) AS tp,
           round(CASE WHEN n_pred > 0 THEN tp * 1.0 / n_pred END, 4)
             AS precision,
           round(tp * 1.0 / n_true, 4) AS recall,
           round(CASE WHEN n_pred > 0
                       AND tp * 1.0 / n_pred + tp * 1.0 / n_true > 0
                      THEN 2 * (tp * 1.0 / n_pred) * (tp * 1.0 / n_true)
                           / (tp * 1.0 / n_pred + tp * 1.0 / n_true)
                 END, 4) AS f1
    FROM j
    """,
)
def q_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-langid-eval: per-class precision/recall/F1 of the langid
    heuristic against the corpus's TRUE lang column — the generic
    classification_report harness (one confusion groupBy + tiny joined
    totals) applied to a real labeled prediction
    (operators/stats.py classification_report; predictor:
    operators/text.py langid)."""
    from .operators import text

    docs = _t(spark, sf_dir, "documents")
    pred = text.langid(docs, "doc_id", "text").select(
        "doc_id", "lang_guess"
    )
    labeled = docs.select("doc_id", "lang").join(pred, "doc_id")
    return stats.classification_report(labeled, "lang", "lang_guess")
