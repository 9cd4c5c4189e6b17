"""Corpus-layout queries, batch 3 (SURVEY.md §2.9): document chunking,
concat-and-chunk sequence packing, tf-idf keyword extraction.

These cover the layout step between curation and training: cutting
documents into overlapping context windows (op-doc-chunk), assigning every
document a contiguous span in the fixed-length-sequence token stream
(op-seq-pack — a distributed prefix sum), and surfacing per-doc
characteristic vocabulary (op-tfidf).

All three are oracle-checked. op-seq-pack's oracle is ONE global window
cumsum in (shard, key, id) order — by construction identical to the
engine's sharded two-level prefix sum, which is the point: the semantics
are a global scan, the plan never builds one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import chunking, text
from .queries import _t, query

# ---------------------------------------------------------------------
# Sliding-window document chunking
# ---------------------------------------------------------------------

@query(
    "op-doc-chunk",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents),
    c AS (
      SELECT doc_id, CAST(len(toks) AS INT) AS n_tok,
             list_transform(
               generate_series(0,
                 CAST(ceil(greatest(len(toks) - 16, 1) / 48.0) AS INT) - 1),
               j -> array_to_string(toks[j*48+1 : j*48+64], ' ')) AS chunks
      FROM tok),
    u AS (
      SELECT doc_id, n_tok,
             CAST(unnest(generate_series(0, len(chunks)-1)) AS INT) AS chunk_id,
             unnest(chunks) AS chunk_text
      FROM c)
    SELECT doc_id, chunk_id, chunk_text,
           CAST(least(64, n_tok - chunk_id * 48) AS INT) AS n_chunk_tokens
    FROM u
    """,
)
def q_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-doc-chunk: 64-token windows, 16-token overlap (stride 48) — the
    RAG/long-context splitter. One token projection + one generator,
    zero shuffle (operators/chunking.py chunk_docs)."""
    return chunking.chunk_docs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", size=64, overlap=16
    )


# ---------------------------------------------------------------------
# Concat-and-chunk sequence packing (distributed prefix sum)
# ---------------------------------------------------------------------

@query(
    "op-seq-pack",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)
               AS n_tokens,
             (doc_id * 2654435761) % 4294967296 AS key
      FROM documents),
    s AS (SELECT *, CAST(key % 32 AS INT) AS shard FROM t),
    c AS (
      SELECT *,
             CAST(sum(n_tokens) OVER (
               ORDER BY shard, key, doc_id ROWS UNBOUNDED PRECEDING)
               - n_tokens AS BIGINT) AS "offset"
      FROM s)
    SELECT doc_id, n_tokens, "offset",
           CAST("offset" // 1024 AS BIGINT) AS seq_first,
           CAST(("offset" + n_tokens - 1) // 1024 AS BIGINT) AS seq_last,
           CAST("offset" % 1024 AS BIGINT) AS pos_in_seq
    FROM c
    """,
)
def q_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-seq-pack: every doc's exclusive offset in the packed token
    stream + the 1024-token training sequences it spans. The oracle's
    single global window cumsum is computed here as a sharded two-level
    prefix sum — one data shuffle, an n_shards-row offset broadcast
    (operators/chunking.py pack_sequences)."""
    docs = _t(spark, sf_dir, "documents")
    from .operators.dedup import tokens_expr

    with_counts = docs.select(
        "doc_id", F.size(tokens_expr("text")).alias("__n_tokens")
    )
    return chunking.pack_sequences(
        with_counts, "doc_id", "__n_tokens", seq_len=1024, n_shards=32
    )


# ---------------------------------------------------------------------
# tf-idf keyword extraction
# ---------------------------------------------------------------------

@query(
    "op-tfidf",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
      FROM documents),
    tf AS (
      SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY 1, 2),
    dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS df_docs FROM tf GROUP BY 1)
    SELECT doc_id, token, tf, df_docs, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT tf.*, dfq.df_docs,
             row_number() OVER (
               PARTITION BY doc_id
               ORDER BY tf DESC, df_docs ASC, token ASC) AS rnk
      FROM tf JOIN dfq USING (token))
    WHERE rnk <= 5
    """,
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-tfidf: top-5 keywords per doc by (tf desc, df asc, token) —
    integer-exact tf-idf ranking (idf is monotone in df, so the float
    never needs to exist at the gate). Linear explode + two map-combined
    groupBys + one window (operators/text.py tfidf_keywords)."""
    out = text.tfidf_keywords(_t(spark, sf_dir, "documents"), "doc_id", "text", k=5)
    return out.select(
        "doc_id", "token",
        F.col("tf").cast("long").alias("tf"),
        F.col("df_docs").cast("long").alias("df_docs"),
        "rnk",
    )
