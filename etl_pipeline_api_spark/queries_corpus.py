"""Training-corpus curation queries, batch 2 (SURVEY.md §2.9): PII
redaction, boilerplate line-dedup, benchmark decontamination, stratified
sampling, shard assignment.

The synthetic documents carry no PII/newlines, so op-pii-redact constructs
deterministic PII inline (same expression in the Spark query and the DuckDB
oracle — the redaction mechanics are what's under test), and line-dedup
chunks tokens into position-aligned 10-token "lines" (the corpus-frequency
machinery is identical to newline-split web text).

All five are oracle-checked: the sampling/sharding ops use the Knuth
multiplicative hash ((id * 2654435761) mod 2^32) precisely because any
int64 engine computes it identically (operators/sampling.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import dedup, sampling, text
from .queries import _t, query

# ---------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------

_PII_SYNTH_SQL = (
    "text || ' reach user' || doc_id || '@mail.example.com or +1-555-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' from 10.' || "
    "CAST(doc_id % 200 AS VARCHAR) || '.0.' || CAST(doc_id % 250 AS VARCHAR)"
)


@query(
    "op-pii-redact",
    oracle=f"""
    WITH synth AS (
      SELECT doc_id, {_PII_SYNTH_SQL} AS t FROM documents)
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(t,
             '{text.PII_EMAIL}', '[EMAIL]', 'g'),
             '{text.PII_PHONE}', '[PHONE]', 'g'),
             '{text.PII_IPV4}', '[IP]', 'g') AS clean_text,
           CAST(len(regexp_extract_all(t, '{text.PII_EMAIL}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{text.PII_PHONE}')) AS INT) AS n_phones,
           CAST(len(regexp_extract_all(t, '{text.PII_IPV4}')) AS INT)  AS n_ips
    FROM synth
    """,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-pii-redact: email/phone/IPv4 scrubbing + removal counts, one
    row-local projection (operators/text.py pii_redact). The synthetic PII
    suffix is built with the same expression on both sides; patterns are
    the RE2-and-Java-compatible subset so the oracle is exact."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" reach user"), F.col("doc_id"),
            F.lit("@mail.example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" from 10."), (F.col("doc_id") % 200).cast("string"),
            F.lit(".0."), (F.col("doc_id") % 250).cast("string"),
        ).alias("t"),
    )
    return text.pii_redact(docs, "doc_id", "t")


# ---------------------------------------------------------------------
# Boilerplate line-level dedup (CCNet/RefinedWeb shape)
# ---------------------------------------------------------------------

@query(
    "op-line-dedup",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents),
    ls AS (
      SELECT doc_id, list_transform(
               generate_series(0, CAST(ceil(len(toks)/10.0) AS INT) - 1),
               i -> array_to_string(toks[i*10+1:i*10+10], ' ')) AS arr
      FROM tok),
    lines AS (
      SELECT doc_id, unnest(arr) AS line,
             unnest(generate_series(0, len(arr)-1)) AS pos
      FROM ls),
    ldf AS (SELECT line, count(DISTINCT doc_id) AS line_docs FROM lines GROUP BY 1),
    kept AS (
      SELECT l.* FROM lines l JOIN ldf USING (line) WHERE line_docs <= 1),
    totals AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY 1)
    SELECT d.doc_id,
           coalesce(string_agg(k.line, ' ' ORDER BY k.pos), '') AS clean_text,
           CAST(count(k.line) AS BIGINT) AS n_kept,
           CAST(coalesce(min(tt.n_lines), 0) AS BIGINT) AS n_lines
    FROM documents d
    LEFT JOIN kept k USING (doc_id)
    LEFT JOIN totals tt USING (doc_id)
    GROUP BY d.doc_id
    """,
)
def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-line-dedup: drop 10-token chunks that occur in more than one
    document (boilerplate removal), preserving order — three linear
    shuffles, 8-byte join keys (operators/dedup.py dedup_lines)."""
    out = dedup.dedup_lines(
        _t(spark, sf_dir, "documents"), "doc_id", "text", chunk=10, max_df=1
    )
    return out.select(
        "doc_id", "clean_text",
        F.col("n_kept").cast("long").alias("n_kept"),
        F.col("n_lines").cast("long").alias("n_lines"),
    )


# ---------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------

@query(
    "op-decontaminate",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(toks)-3, 0)),
               i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3])) AS shingle
      FROM tok),
    ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
    hits AS (
      SELECT DISTINCT sh.doc_id FROM sh JOIN ev USING (shingle)
      WHERE sh.doc_id % 50 != 0)
    SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
    FROM documents d LEFT JOIN hits h USING (doc_id)
    WHERE d.doc_id % 50 != 0
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-decontaminate: flag training docs sharing any word 4-gram with the
    held-out eval slice (doc_id % 50 == 0 stands in for the benchmark
    suite). Eval shingles broadcast; train side is one semi-join probe
    (operators/dedup.py decontaminate)."""
    docs = _t(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    return dedup.decontaminate(train, ev, "doc_id", "text", n=4)


# ---------------------------------------------------------------------
# Deterministic stratified sampling + shard assignment
# ---------------------------------------------------------------------

@query(
    "op-sample-stratified",
    oracle="""
    SELECT doc_id, lang, source FROM documents
    QUALIFY row_number() OVER (
      PARTITION BY lang, source
      ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) <= 5
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-sample-stratified: exactly 5 docs per (lang, source) stratum in
    deterministic Knuth-hash order — one window shuffle, rerun-stable,
    engine-independent (operators/sampling.py stratified_sample)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return sampling.stratified_sample(docs, ["lang", "source"], "doc_id", 5)


@query(
    "op-shard-assign",
    oracle="""
    SELECT CAST((doc_id * 2654435761) % 4294967296 % 16 AS INT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           min(doc_id) AS min_id, max(doc_id) AS max_id
    FROM documents GROUP BY 1
    """,
)
def q_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-shard-assign: hash-scrambled training-shard ids + per-shard
    balance stats (row counts, payload bytes) — the pre-write check before
    write_shards materializes one ordered file per shard."""
    docs = _t(spark, sf_dir, "documents")
    stats = sampling.shard_stats(docs, "n_chars", 16, "doc_id")
    return stats.select(
        "shard",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("total_chars").cast("long").alias("total_chars"),
        "min_id", "max_id",
    )


# ---------------------------------------------------------------------
# Full-curation capstone (rows-only: composition of oracle-checked stages)
# ---------------------------------------------------------------------

@query("op-corpus-curate-full")
def q_corpus_curate_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete curation flow a pretraining corpus runs: PII scrub
    (folded into the filter projection, free) → lang/quality filter →
    boilerplate line-dedup → exact dedup → MinHash near-dup components →
    benchmark decontamination over the final survivor set. Rows-only at the
    gate — every constituent stage has its own oracle-checked query
    (op-pii-redact, op-line-dedup, op-corpus-curate, op-decontaminate)."""
    from .plans.corpus import curate

    docs = _t(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 50 == 0)
    out = curate(
        docs.filter(F.col("doc_id") % 50 != 0),
        quality_min=0.5,
        scale_path=True,
        redact_pii=True,
        line_max_df=1,
        decontam_eval=ev,
    )
    return out.select("doc_id", "source", "lang").orderBy("doc_id")


# ---------------------------------------------------------------------
# Repetition quality signals (Gopher-style) + domain mixture
# ---------------------------------------------------------------------

@query(
    "op-text-repetition",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents),
    g AS (
      SELECT doc_id, toks,
             list_transform(generate_series(1, greatest(len(toks)-2, 0)),
               i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]) AS grams
      FROM tok)
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_tokens,
           CAST(len(grams) AS INT) AS n_grams,
           CAST(len(grams) - len(list_distinct(grams)) AS INT) AS n_dup_grams,
           CAST(coalesce(list_max(list_transform(list_distinct(toks),
             t -> len(list_filter(toks, x -> x = t)))), 0) AS INT) AS top_token_count
    FROM g
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-text-repetition: Gopher-style repetition signals — duplicate
    3-gram count and most-common-token count per doc, entirely row-local
    (operators/text.py repetition_cols). The query returns the exact
    integer counts; ratios are derived downstream (count/count divisions
    round differently across engines at half-digits)."""
    out = text.repetition_metrics(
        _t(spark, sf_dir, "documents"), "doc_id", "text", n=3
    )
    return out.select(
        "doc_id", "n_tokens", "n_grams", "n_dup_grams", "top_token_count"
    )


@query(
    "op-domain-mix",
    oracle="""
    SELECT doc_id, lang, source FROM documents
    WHERE lang IN ('en', 'es', 'fr', 'de')
    QUALIFY row_number() OVER (
      PARTITION BY lang
      ORDER BY (doc_id * 2654435761) % 4294967296, doc_id)
      <= CASE lang WHEN 'en' THEN 40 WHEN 'es' THEN 12
                   WHEN 'fr' THEN 9  WHEN 'de' THEN 7 END
    """,
)
def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-domain-mix: compose a training mixture by per-domain quota (here
    per-language: 40 en / 12 es / 9 fr / 7 de, zh excluded) in
    deterministic hash order — rerun-stable mixture export, one window
    shuffle (operators/sampling.py weighted_mix)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return sampling.weighted_mix(
        docs, "lang", "doc_id", {"en": 40, "es": 12, "fr": 9, "de": 7}
    )
