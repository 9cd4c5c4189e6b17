"""Relational batch 14 — CDC consumption, binary exact-dedup, and
robust-metric winsorization (SURVEY.md §2.9 extensions).

- op-changelog-compact: APPLY a CDC feed (latest version per key wins,
  terminal delete removes the key) — the consumer twin of
  op-table-diff's feed construction; one struct-argmax shuffle, never
  a per-key sort window.
- op-binary-dedup: exact dedup of opaque binary payloads by
  (octet length, sha256) — the first pass of any image/audio corpus,
  before perceptual hashing; the multimodal twin of op-dedup-exact.
- op-winsorize: per-group mean before/after clipping at the p01/p99
  quantiles — bounds bot-inflated values instead of flagging them.

All DuckDB-oracle-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import multimodal, stats
from .operators.dq import changelog_compact
from .queries import _t, query


@query(
    "op-changelog-compact",
    oracle="""
    WITH log AS (
      SELECT o_custkey,
             epoch_us(o_orderdate) AS v0, o_orderkey AS v1,
             CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op,
             o_totalprice
      FROM orders),
    last AS (
      SELECT * FROM log
      QUALIFY row_number() OVER (
        PARTITION BY o_custkey ORDER BY v0 DESC, v1 DESC) = 1)
    SELECT o_custkey, o_totalprice
    FROM last WHERE op != 'D'
    """,
)
def q_changelog_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-changelog-compact: orders replayed as a per-customer CDC feed
    (order date + key = version, status F = delete) compacted to the
    current snapshot — ONE map-combined max(struct(version, op,
    payload)) per key; the exchange carries one row per key, not one
    per change (operators/dq.py changelog_compact)."""
    log = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("v0"),
        F.col("o_orderkey").alias("v1"),
        F.when(F.col("o_orderstatus") == "F", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "o_totalprice",
    )
    return changelog_compact(
        log, ["o_custkey"], ["v0", "v1"], "op", ["o_totalprice"]
    )


@query(
    "op-binary-dedup",
    oracle="""
    SELECT sha256(substring(text, 1, 40)) AS content_sha,
           CAST(octet_length(encode(substring(text, 1, 40))) AS BIGINT)
             AS n_bytes,
           count(*) AS n_copies,
           min(doc_id) AS keeper_id
    FROM documents
    GROUP BY 1, 2 HAVING count(*) >= 2
    """,
)
def q_binary_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-binary-dedup: exact duplicate groups of binary payloads keyed
    by (octet length, sha256) — one map-combined shuffle, deterministic
    min-id keeper (operators/multimodal.py dedup_payloads). Payloads
    are the utf-8 bytes of each document's 40-char head (a thumbnail
    stand-in with real collisions — full texts are unique in this
    corpus, which would make the query a no-op)."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "payload", F.encode(F.substring("text", 1, 40), "utf-8")
    )
    return multimodal.dedup_payloads(docs, "doc_id", "payload")


@query(
    "op-winsorize",
    oracle="""
    WITH t AS (
      SELECT event_type AS g,
             quantile_cont(value, 0.01) AS p_lo,
             quantile_cont(value, 0.99) AS p_hi
      FROM events GROUP BY 1)
    SELECT event_type, count(*) AS n,
           round(avg(value), 4) AS mean,
           round(avg(least(greatest(value, p_lo), p_hi)), 4) AS wins_mean,
           round(min(p_lo), 4) AS p_lo,
           round(min(p_hi), 4) AS p_hi
    FROM events JOIN t ON t.g = events.event_type
    GROUP BY 1
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-winsorize: per-event-type mean before/after p01/p99 clipping —
    exact per-group percentiles broadcast back, row-local
    least/greatest clip, one aggregation pass (operators/stats.py
    winsorized_stats; swap percentile_approx in at 100 TB)."""
    return stats.winsorized_stats(
        _t(spark, sf_dir, "events"), "event_type", "value"
    )
