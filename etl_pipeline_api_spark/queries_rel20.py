"""Registered queries, batch 20 (round 12): mergeable frequency sketches.

- op-countmin-freq: count-min heavy hitters over document tokens — the
  d×w-counter sketch a 100 TB stream keeps instead of exact per-item
  counts. The sha256-derived hash family makes the WHOLE sketch
  engine-portable, so the DuckDB oracle replays build + probe + top-k
  bit-for-bit (est/exact/overcount all hash-pinned; overcount >= 0 is
  the one-sided CM guarantee surfacing in data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .operators import sketches
from .queries import _t, query
from .queries_ext import _digest_byte

_CM_DEPTH, _CM_WIDTH, _CM_K = 4, 1024, 20


def _cm_bucket_sql(j: int) -> str:
    """DuckDB twin of sketches._bucket: digest bytes 2j,2j+1 mod width."""
    return (
        f"(({_digest_byte(2 * j)}) * 256 + ({_digest_byte(2 * j + 1)}))"
        f" % {_CM_WIDTH}"
    )


_CM_ORACLE = f"""
    WITH tok0 AS (
      SELECT string_split_regex(lower(trim(text)), '\\s+') AS tokens
      FROM documents WHERE text IS NOT NULL),
    items AS (
      SELECT t AS item FROM (SELECT unnest(tokens) AS t FROM tok0)
      WHERE t <> ''),
    exact AS (SELECT item, count(*) AS exact FROM items GROUP BY 1),
    hb AS (
      SELECT item, exact,
             {", ".join(f"({_cm_bucket_sql(j)}) AS b{j}" for j in range(_CM_DEPTH))}
      FROM (SELECT item, exact, sha256(item) AS hx FROM exact)),
    sk AS (
      SELECT j, bucket, sum(exact) AS cnt FROM (
        {" UNION ALL ".join(f"SELECT {j} AS j, b{j} AS bucket, exact FROM hb" for j in range(_CM_DEPTH))}
      ) GROUP BY 1, 2),
    est AS (
      SELECT hb.item, hb.exact,
             least({", ".join(f"s{j}.cnt" for j in range(_CM_DEPTH))}) AS est
      FROM hb
      {" ".join(f"JOIN sk s{j} ON s{j}.j = {j} AND s{j}.bucket = hb.b{j}" for j in range(_CM_DEPTH))}
    )
    SELECT item, est, exact, overcount, CAST(rn AS INTEGER) AS rank FROM (
      SELECT item, CAST(est AS BIGINT) AS est, CAST(exact AS BIGINT) AS exact,
             CAST(est - exact AS BIGINT) AS overcount,
             row_number() OVER (ORDER BY est DESC, item) AS rn
      FROM est)
    WHERE rn <= {_CM_K}
"""


@query("op-countmin-freq", oracle=_CM_ORACLE)
def q_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-countmin-freq: top-{k} document tokens by count-min estimate
    (sketches.heavy_hitters) — build is ONE map-combined groupBy bounded
    at d*w counters regardless of corpus size; probe is a broadcast join
    + min over d rows; top-k via sort+limit (TakeOrdered), never a
    global window. exact/overcount ride along as the in-plan gate."""
    docs = _t(spark, sf_dir, "documents")
    from pyspark.sql import functions as F

    from .operators.dedup import tokens_expr

    toks = (
        docs.where(F.col("text").isNotNull())
        .select(F.explode(tokens_expr("text")).alias("item"))
        .where(F.col("item") != "")
    )
    return sketches.heavy_hitters(
        toks, "item", k=_CM_K, depth=_CM_DEPTH, width=_CM_WIDTH
    )


_BLOOM_M, _BLOOM_K = 1024, 4


def _bloom_pos_sql(j: int) -> str:
    """DuckDB twin of sketches._bucket at width m_bits."""
    return (
        f"(({_digest_byte(2 * j)}) * 256 + ({_digest_byte(2 * j + 1)}))"
        f" % {_BLOOM_M}"
    )


_BLOOM_ORACLE = f"""
    WITH dk AS (
      SELECT DISTINCT c_custkey AS key FROM customer
      WHERE c_mktsegment = 'BUILDING' AND c_custkey IS NOT NULL),
    dh AS (SELECT key, sha256(CAST(key AS VARCHAR)) AS hx FROM dk),
    dpos AS (
      {" UNION ALL ".join(f"SELECT ({_bloom_pos_sql(j)}) AS pos FROM dh" for j in range(_BLOOM_K))}
    ),
    words AS (
      SELECT pos // 32 AS word,
             bit_or(CAST(1 AS BIGINT) << (pos % 32)) AS bits
      FROM dpos GROUP BY 1),
    f AS (
      SELECT o_custkey AS key, sha256(CAST(o_custkey AS VARCHAR)) AS hx
      FROM orders WHERE o_custkey IS NOT NULL),
    fp AS (
      SELECT key,
             {", ".join(f"({_bloom_pos_sql(j)}) AS p{j}" for j in range(_BLOOM_K))}
      FROM f),
    probe AS (
      SELECT fp.key,
             {" AND ".join(
                 f"(coalesce(w{j}.bits, 0) & (CAST(1 AS BIGINT) << (p{j} % 32))) <> 0"
                 for j in range(_BLOOM_K)
             )} AS bloom
      FROM fp
      {" ".join(f"LEFT JOIN words w{j} ON w{j}.word = p{j} // 32" for j in range(_BLOOM_K))}
    ),
    tagged AS (
      SELECT probe.bloom, (dk.key IS NOT NULL) AS is_true
      FROM probe LEFT JOIN dk ON probe.key = dk.key)
    SELECT CAST(count(*) AS BIGINT) AS n_fact,
           CAST(sum(CASE WHEN bloom THEN 1 ELSE 0 END) AS BIGINT)
             AS n_candidates,
           CAST(sum(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT)
             AS n_true,
           CAST(sum(CASE WHEN bloom AND NOT is_true THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_pos,
           round(sum(CASE WHEN bloom AND NOT is_true THEN 1 ELSE 0 END)
                 / greatest(count(*), 1), 6) AS fp_rate
    FROM tagged
"""


@query("op-bloom-semijoin", oracle=_BLOOM_ORACLE)
def q_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-bloom-semijoin: the join-pruning pattern made explicit —
    Bloom filter over BUILDING-segment customer keys (bounded
    bit_or-aggregated build), probed by every order row with k
    sha-derived bit tests (zero shuffle, zero Python), reported against
    the exact semi-join: no false negatives by construction, measured
    false-positive rate. sketches.bloom_semijoin_stats."""
    from pyspark.sql import functions as F

    dim = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    fact = _t(spark, sf_dir, "orders")
    return sketches.bloom_semijoin_stats(
        fact, "o_custkey", dim, "c_custkey", m_bits=_BLOOM_M, k=_BLOOM_K
    )


_SCM_DEPTH, _SCM_WIDTH = 4, 256


_STREAM_CM_ORACLE = f"""
    WITH u AS (
      SELECT CAST(user_id AS VARCHAR) AS item, count(*) AS n
      FROM events WHERE user_id IS NOT NULL GROUP BY 1),
    hb AS (
      SELECT n,
             {", ".join(
                 f"((({_digest_byte(2 * j)}) * 256 + ({_digest_byte(2 * j + 1)}))"
                 f" % {_SCM_WIDTH}) AS b{j}"
                 for j in range(_SCM_DEPTH)
             )}
      FROM (SELECT n, sha256(item) AS hx FROM u))
    SELECT j, CAST(bucket AS INTEGER) AS bucket, CAST(sum(n) AS BIGINT) AS cnt
    FROM (
      {" UNION ALL ".join(f"SELECT {j} AS j, b{j} AS bucket, n FROM hb" for j in range(_SCM_DEPTH))}
    ) GROUP BY 1, 2
"""


@query("op-stream-countmin", oracle=_STREAM_CM_ORACLE)
def q_stream_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-stream-countmin: the count-min sketch maintained AS A STREAM —
    the d*w-counter groupBy is a stateful streaming aggregation whose
    state is BOUNDED BY THE SKETCH SIZE no matter how many events flow
    through (the whole point of sketches in a 100 TB stream: per-user
    exact streaming counts keep |users| state; this keeps 4x256
    counters). Drained over the backlog with AvailableNow in complete
    mode, the final sketch equals the batch build — the DuckDB oracle
    replays it from the parquet. sketches.countmin_build on the
    streaming frame; same engine-portable sha256 hash family."""
    from .streaming import events as sev

    stream = sev.read_events_stream(spark, sf_dir)
    sk = sketches.countmin_build(
        stream, "user_id", depth=_SCM_DEPTH, width=_SCM_WIDTH
    )
    from pyspark.sql import functions as F

    # the sketch's streaming STATE is d*w counters no matter the input —
    # parallelism lives in the map-side partial agg, so the state/reduce
    # width only grows with backlog to bound per-reducer partial volume
    # (4 MiB/partition, floor 1; measurement table on
    # stateful_drain_partitions)
    out = sev.run_available_now(
        sk,
        output_mode="complete",
        state_partitions=sev.stateful_drain_partitions(
            spark, sf_dir, per_bytes=4 << 20, floor=1
        ),
    )
    return out.select(
        "j", F.col("bucket").cast("int").alias("bucket"),
        F.col("cnt").cast("long").alias("cnt"),
    )


@query(
    "op-negative-sampling",
    oracle="""
    WITH a AS (
      SELECT vec_id AS anchor_id, embedding AS av FROM embeddings
      WHERE vec_id < 8),
    scored AS (
      SELECT a.anchor_id, c.vec_id AS neg_id,
             sha256(CAST(a.anchor_id AS VARCHAR) || ':'
                    || CAST(c.vec_id AS VARCHAR)) AS key
      FROM a JOIN embeddings c ON c.vec_id <> a.anchor_id
      WHERE list_cosine_similarity(
              CAST(a.av AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])
            ) < 0.5)
    SELECT anchor_id, neg_id, CAST(rn AS INTEGER) AS rank FROM (
      SELECT anchor_id, neg_id,
             row_number() OVER (PARTITION BY anchor_id
                                ORDER BY key, neg_id) AS rn
      FROM scored)
    WHERE rn <= 4
    """,
)
def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-negative-sampling: deterministic contrastive negatives — for
    each of 8 anchor vectors, 4 sha-ranked pseudo-random corpus items
    certified far (cosine < 0.5, the false-negative guard)
    (sampling.negative_samples). One broadcast corpus pass, JVM dots,
    per-anchor window; the sampled SET is the oracle contract."""
    from pyspark.sql import functions as F

    from .operators import sampling

    emb = _t(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < 8)
    return sampling.negative_samples(emb, anchors, "vec_id", "embedding")
