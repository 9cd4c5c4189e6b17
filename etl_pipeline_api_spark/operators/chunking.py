"""Corpus layout operators: document chunking and sequence packing
(SURVEY.md §2.9 — training-data pipeline surface).

Both operators turn a curated document set into the physical layout a
training job consumes:

- chunk_docs:     sliding-window token chunks (size/overlap) — the RAG /
                  long-context splitter. Entirely row-local: one token
                  projection + one generator, zero shuffle at any scale.
- pack_sequences: concat-and-chunk packing — assign every document a
                  contiguous token span in a virtual global token stream,
                  so fixed-length training sequences can be cut without
                  padding. The global order is a deterministic Knuth-hash
                  scramble; the global running offset is computed as a
                  DISTRIBUTED prefix sum (per-shard window cumsum + tiny
                  shard-offset broadcast), never a single-partition
                  global window — the classic scan pattern that survives
                  1000 executors.

Scale notes (100 TB): chunk_docs is scan-speed (whole-stage codegen,
array ops only). pack_sequences shuffles once on the shard key for the
windowed cumsum; the shard-totals frame is n_shards rows (driver-free
broadcast join), so the only data-sized movement is that one exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import tokens_expr
from .sampling import det_key


def chunk_docs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """op-doc-chunk: split each document into token windows of ``size``
    with ``overlap`` tokens shared between consecutive chunks.

    Chunk starts are 0, stride, 2*stride, ... (stride = size - overlap)
    while start < max(n_tokens - overlap, 1): every token is covered, the
    last chunk may be short, and no chunk is fully contained in its
    predecessor. Returns (id, chunk_id, chunk_text, n_chunk_tokens).

    Plan shape: tokens materialize in one projection (the array is
    referenced by the window transform — inlining split() would be
    O(len²), see ngrams_expr), then ONE generator. posexplode_outer
    instead of posexplode: plain generators get an inferred size()>0
    filter pushed below the projection that re-evaluates the whole
    array build (InferFiltersFromGenerate).
    """
    stride = size - overlap
    from ..session import fan_out

    toks_df = fan_out(df).select(
        F.col(id_col), tokens_expr(text_col).alias("__toks")
    )
    toks = F.col("__toks")
    n_tok = F.size(toks)
    n_chunks = F.ceil(F.greatest(n_tok - overlap, F.lit(1)) / F.lit(float(stride)))
    chunks = F.transform(
        F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
        lambda j: F.concat_ws(" ", F.slice(toks, j * stride + 1, size)),
    )
    out = toks_df.select(
        F.col(id_col),
        n_tok.alias("__n_tok"),
        F.posexplode_outer(chunks).alias("chunk_id", "chunk_text"),
    )
    return out.filter(F.col("chunk_text").isNotNull()).select(
        F.col(id_col),
        F.col("chunk_id"),
        F.col("chunk_text"),
        F.least(F.lit(size), F.col("__n_tok") - F.col("chunk_id") * stride).alias(
            "n_chunk_tokens"
        ),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    seq_len: int = 1024,
    n_shards: int = 32,
) -> DataFrame:
    """op-seq-pack: concat-and-chunk sequence packing. Documents are laid
    end-to-end in deterministic Knuth-hash order into one virtual token
    stream; each doc gets its exclusive starting ``offset`` and the
    fixed-length training sequences it spans (seq_first..seq_last,
    pos_in_seq = offset within its first sequence).

    The global prefix sum is distributed in three steps:
      1. shard = det_key(id) % n_shards; within-shard running sum via a
         window partitioned BY shard (parallel, one shuffle);
      2. per-shard totals (n_shards rows) get exclusive prefix offsets
         via a window over that tiny frame;
      3. broadcast-join the offsets back: global offset = shard offset +
         within-shard running sum - own length.
    The (shard, key, id) order equals a single global ORDER BY — which is
    exactly what the DuckDB oracle computes with one window — but no
    stage here ever sees more than one shard's rows in one task.

    Integer division throughout (`div`): offsets exceed 2^53 at real
    corpus scale, where double-precision floor(/) silently loses tokens.
    """
    key = det_key(id_col)
    shard = (key % F.lit(n_shards)).cast("int")
    n = F.col(n_tokens_col).cast("long")
    base = df.select(
        F.col(id_col),
        n.alias("__n"),
        key.alias("__key"),
        shard.alias("__shard"),
    )
    w = Window.partitionBy("__shard").orderBy("__key", id_col)
    local = base.withColumn("__cum", F.sum("__n").over(w))

    totals = base.groupBy("__shard").agg(F.sum("__n").alias("__tot"))
    # n_shards rows: the single-partition window is over driver-config-sized
    # data, not the corpus — this is the distributed-scan trick, not a
    # global sort.
    wo = Window.orderBy("__shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__shard", F.coalesce(F.sum("__tot").over(wo), F.lit(0)).alias("__base")
    )

    packed = (
        local.join(F.broadcast(offsets), "__shard")
        .withColumn("offset", F.col("__base") + F.col("__cum") - F.col("__n"))
        .withColumn("seq_first", F.expr(f"offset div {seq_len}"))
        .withColumn("seq_last", F.expr(f"(offset + __n - 1) div {seq_len}"))
        .withColumn("pos_in_seq", F.col("offset") % F.lit(seq_len))
    )
    return packed.select(
        F.col(id_col),
        F.col("__n").alias("n_tokens"),
        "offset",
        "seq_first",
        "seq_last",
        "pos_in_seq",
    )
