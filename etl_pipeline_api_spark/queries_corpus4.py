"""Corpus batch 5: global row indexing, BPE pair counting, SemDeDup,
HTML boilerplate stripping.

- op-row-index: contiguous global row ids in key order — the distributed
  zipWithIndex every packing/sharding step needs. The SCALE point: a bare
  `row_number() OVER (ORDER BY …)` is a single-task global sort;
  `layout.global_row_index` does range-partition → per-partition counts →
  broadcast offsets instead, so no stage ever sees the whole table. The
  oracle IS the naive single-task form — same result, different plan.
- op-bpe-pairs: adjacent-token-pair frequencies (the counting kernel of a
  BPE merge round, and of any bigram LM). One explode of zip_with'd
  shifted slices, one count shuffle, per-partition top-k.
- op-semdedup: semantic near-dup removal, SemDeDup shape — k-means blocks
  the embedding space, near-dup search runs within clusters only
  (~N²/k), min-id canonical survives. Oracle-gated via a structural
  1-row summary (row completeness, exact droppable ceiling, drops ⊆
  exact); unit tests pin k=1 ≡ exact all-pairs.
- op-html-strip: crawl-to-text boilerplate strip — tag removal +
  whitespace normalization + tag census, pure JVM regex, zero shuffle.
  HTML is synthesized deterministically from the row (testdata has no
  markup column); the strip/count plumbing is the operator.

Reference parity: none of these exist in the reference (334-line pandas
`main.py`); they extend SURVEY §2.9's training-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _t, query

_TOKS_SQL = "regexp_split_to_array(lower(trim(text)), '\\s+')"


# ---------------------------------------------------------------------
# op-row-index: distributed zipWithIndex
# ---------------------------------------------------------------------

@query(
    "op-row-index",
    oracle="""
    SELECT doc_id, source,
           CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS idx
    FROM documents
    """,
)
def q_row_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous global index in doc_id order via
    `layout.global_row_index`: range exchange → tiny per-partition count
    agg → broadcast offsets → within-partition row_number. Every stage is
    balanced; the only single-task step is the k-row offset cumsum
    (k = number of partitions). The oracle computes the same index with
    the single-task window — identical values, scale-hostile plan."""
    from .operators.layout import global_row_index

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    out = global_row_index(docs, "doc_id", n_parts=16)
    return out.select("doc_id", "source", F.col("idx").cast("long"))


# ---------------------------------------------------------------------
# op-bpe-pairs: adjacent-pair counting (one BPE merge round's kernel)
# ---------------------------------------------------------------------

@query(
    "op-bpe-pairs",
    oracle=f"""
    WITH toks AS (SELECT {_TOKS_SQL} AS toks FROM documents),
    pairs AS (
        SELECT unnest(toks[1:len(toks) - 1]) AS w1,
               unnest(toks[2:len(toks)]) AS w2
        FROM toks
    )
    SELECT w1 || ' ' || w2 AS pair, CAST(count(*) AS BIGINT) AS n
    FROM pairs
    GROUP BY 1 ORDER BY n DESC, pair LIMIT 20
    """,
)
def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent token pairs — the argmax-search kernel of a BPE
    merge round (and the count table of a bigram LM). Pairs come from
    `dedup.ngrams_expr(toks, 2)` (zip_with over shifted slices — constant
    re-evaluations of the token array, see its docstring), then ONE
    count shuffle and TakeOrderedAndProject (per-partition top-k, no
    global sort). The DuckDB twin zips two shifted list slices through
    paired unnest."""
    from .operators.dedup import ngrams_expr, tokens_expr
    from .session import fan_out

    docs = fan_out(_t(spark, sf_dir, "documents"))
    return (
        docs.select(
            F.explode_outer(ngrams_expr(tokens_expr("text"), 2)).alias("pair")
        )
        .filter(F.col("pair").isNotNull())
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(20)
    )


# ---------------------------------------------------------------------
# op-semdedup: k-means-blocked semantic near-dup removal
# ---------------------------------------------------------------------

@query(
    "op-semdedup",
    oracle="""
    WITH drp AS (
      SELECT DISTINCT b.vec_id AS id
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       AND list_cosine_similarity(a.embedding, b.embedding) >= 0.4)
    SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_points,
           CAST((SELECT count(*) FROM drp) AS BIGINT) AS n_droppable,
           CAST(0 AS BIGINT) AS n_dropped_outside_exact
    """,
)
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table at cos >= 0.4 with k=4 blocks,
    returned as a STRUCTURALLY GATED 1-row summary (the minhash shape —
    k-means blocking is iterative and clustering-dependent, so the pair
    set itself has no SQL twin, but its invariants do):

    - n_points: one (vec_id, cluster, keep) row per embedding,
      hash-pinned against count(*) of the table;
    - n_droppable: |{b : ∃ a<b with cos(a,b) >= τ}| — the EXACT greedy
      min-id drop ceiling, computed in-plan by the block-pair matmul
      (cosine_pairs_blocked, no driver state) and cross-engine pinned
      against DuckDB's all-pairs join;
    - n_dropped_outside_exact: SemDeDup may MISS a near-dup pair that
      straddles a cluster boundary (recall < 1 is the documented
      trade), but every id it drops must be droppable under the exact
      rule — a left-anti join counted in-plan, pinned to 0.

    Unit tests additionally pin the k=1 case equal to the exact
    all-pairs drop set and blocked candidates ⊆ exact pairs
    (`tests/test_corpus4.py`)."""
    from .operators.similarity import cosine_pairs_blocked, semdedup

    emb = _t(spark, sf_dir, "embeddings")
    sd = semdedup(emb, "vec_id", "embedding", threshold=0.4, k=4)
    droppable = (
        cosine_pairs_blocked(emb, "vec_id", "embedding", threshold=0.4)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    # One full-outer pass derives all three counts, so the iterative
    # k-means (sd) and the block-pair matmul (droppable) each execute
    # ONCE — the previous crossJoin-of-aggregates re-ran both subtrees
    # (Catalyst only reuses identical exchanges). droppable ⊆ sd ids by
    # construction; full_outer keeps the gate honest if that ever broke.
    both = sd.select("vec_id", "keep").join(
        droppable.withColumn("__d", F.lit(1)), "vec_id", "full_outer"
    )
    return both.agg(
        F.count("keep").alias("n_points"),
        F.count("__d").alias("n_droppable"),
        F.count(
            F.when(~F.col("keep") & F.col("__d").isNull(), 1)
        ).alias("n_dropped_outside_exact"),
    )


# ---------------------------------------------------------------------
# op-html-strip: crawl boilerplate removal
# ---------------------------------------------------------------------

@query(
    "op-html-strip",
    oracle="""
    WITH pages AS (
        SELECT doc_id,
               '<div class="doc"><h1>' || source || '</h1><p>' || text
                 || '</p><footer>(c) ' || source || '</footer></div>' AS html
        FROM documents
    )
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(html, '<[^>]+>', ' ', 'g'),
                               '\\s+', ' ', 'g')) AS clean,
           CAST(len(regexp_extract_all(html, '<[^>]+>')) AS BIGINT) AS n_tags
    FROM pages
    """,
)
def q_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate strip: drop every tag, collapse whitespace, census the
    tags removed. Row-local JVM regex — zero shuffle, no Python. The
    markup is synthesized from the row itself (no HTML column in
    testdata); a real crawl swaps the synthesis for the raw page bytes
    and keeps the identical strip pipeline."""
    docs = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<div class="doc"><h1>'), F.col("source"), F.lit("</h1><p>"),
        F.col("text"), F.lit("</p><footer>(c) "), F.col("source"),
        F.lit("</footer></div>"),
    )
    return (
        docs.select("doc_id", html.alias("html"))
        .select(
            "doc_id",
            F.trim(
                F.regexp_replace(
                    F.regexp_replace("html", "<[^>]+>", " "), r"\s+", " "
                )
            ).alias("clean"),
            F.regexp_count("html", F.lit("<[^>]+>")).cast("long").alias("n_tags"),
        )
    )


# ---------------------------------------------------------------------
# op-corpus-datasheet: one-pass per-source corpus profile
# ---------------------------------------------------------------------

@query(
    "op-corpus-datasheet",
    oracle=r"""
    WITH tok AS (
      SELECT source, lang, text,
             string_split_regex(lower(trim(text)), '\s+') AS tokens
      FROM documents),
    q AS (
      SELECT source, lang, len(tokens) AS n_tokens,
             round(
               0.4 * least(length(text) / 200.0, 1.0)
             + 0.3 * least((len(list_filter(tokens, t -> list_contains(
                   ['the','a','of','to','and','in','is','for','on','with'], t)))
                   * 1.0 / greatest(len(tokens), 1)) / 0.08, 1.0)
             + 0.3 * (1.0 - length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
                   * 1.0 / greatest(length(text), 1)), 4) AS quality
      FROM tok)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(CAST(round(quality * 10000) AS BIGINT)) AS BIGINT)
             AS sum_quality_q4,
           CAST(quantile_disc(n_tokens, 0.5) AS BIGINT) AS p50_tokens,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM q GROUP BY source
    """,
)
def q_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source corpus datasheet ("data card" numbers): doc and
    token volume, summed 4dp-quantized quality, median doc length, and
    language spread — ALL in one projection + one groupBy shuffle (the
    *_col builders keep every metric in the same row-local pass; see the
    curate() filter-phase lesson in operators/text.py). Exactness: the
    per-doc quality double is oracle-identical (op-text-quality pins
    it), so round(q*10000) is the same bigint in both engines and group
    sums stay integer-exact regardless of summation order;
    percentile_approx at accuracy 10000 is exact (returns a data
    element, = DuckDB quantile_disc) at any per-source n below the
    accuracy."""
    from .operators.dedup import tokens_expr
    from .operators.text import quality_col
    from .session import fan_out

    docs = fan_out(_t(spark, sf_dir, "documents"))
    per_doc = docs.select(
        "source",
        "lang",
        F.size(tokens_expr("text")).alias("n_tokens"),
        F.round(quality_col("text") * 10000).cast("long").alias("q4"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("q4").alias("sum_quality_q4"),
        F.percentile_approx("n_tokens", 0.5, 10000).cast("long").alias("p50_tokens"),
        F.countDistinct("lang").alias("n_langs"),
    )
