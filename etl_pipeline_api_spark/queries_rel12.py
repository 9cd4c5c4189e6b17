"""Relational batch 12 — interval analytics + incremental view
maintenance (SURVEY.md §2.9 extensions).

- op-interval-overlap: which sessions ran concurrently — the interval
  generalization of the time-bucketed range join: cell-bucketed
  equi-join candidates, each overlapping pair counted exactly once in
  the first cell of its intersection (no distinct pass).
- op-peak-concurrency: max simultaneously-open sessions via the
  sweep-line +1/−1 prefix sum, distributed with the range-partition +
  broadcast-offset shape (no single-task global window).
- op-stream-incremental-agg: a continuously-maintained rollup — each
  micro-batch MERGES its per-key delta into a compact O(|keys|) state
  table (versioned by batch id for exactly-once replay); the final
  state must equal the batch answer, which is exactly what the oracle
  computes from the static table.

Session intervals come from the already-oracle-checked sessionize();
both engines build them from the same (us, event_id)-ordered gap walk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import behavioral, joins
from .queries import _t, query

# Session intervals in epoch-µs with a single bigint id — shared by both
# interval queries. session_idx < 1e6 at any shipped SF (events per user
# bounds it), so user_id*1e6+idx is collision-free.
_IV_CTE = """
    e AS (
      SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
    f AS (
      SELECT *, CASE WHEN lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w > 1800000000
                     THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
    s AS (
      SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM f),
    iv AS (
      SELECT user_id * 1000000 + sid AS id, min(us) AS s_us, max(us) AS e_us
      FROM s GROUP BY 1)
"""


def _session_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    sess = behavioral.sessionize(_t(spark, sf_dir, "events"), gap_minutes=30)
    return sess.select(
        (F.col("user_id") * 1_000_000 + F.col("session_idx")).alias("id"),
        F.unix_micros(F.col("start_ts").cast("timestamp")).alias("s_us"),
        F.unix_micros(F.col("end_ts").cast("timestamp")).alias("e_us"),
    )


@query(
    "op-interval-overlap",
    oracle=f"""
    WITH {_IV_CTE},
    p AS (
      SELECT count(*) AS n_pairs
      FROM iv a JOIN iv b
        ON a.id < b.id AND a.s_us < b.e_us AND b.s_us < a.e_us)
    SELECT (SELECT count(*) FROM iv) AS n_intervals,
           (SELECT n_pairs FROM p) AS n_pairs
    """,
)
def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-interval-overlap: count of concurrently-running session pairs
    (strict half-open overlap) — hour-cell bucketed equi-join, each pair
    kept exactly once in its intersection's first cell, never a
    quadratic theta-join or a distinct over the pair fan-out
    (operators/joins.py interval_overlap_pairs)."""
    iv = _session_intervals(spark, sf_dir)
    pairs = joins.interval_overlap_pairs(iv, "id", "s_us", "e_us", cell_s=3600)
    return (
        iv.agg(F.count(F.lit(1)).alias("n_intervals"))
        .crossJoin(
            F.broadcast(pairs.agg(F.count(F.lit(1)).alias("n_pairs")))
        )
    )


@query(
    "op-peak-concurrency",
    oracle=f"""
    WITH {_IV_CTE},
    d AS (
      SELECT s_us AS us, 1 AS d FROM iv
      UNION ALL SELECT e_us, -1 FROM iv),
    r AS (
      SELECT us, sum(d) OVER (ORDER BY us, d ROWS UNBOUNDED PRECEDING)
               AS conc
      FROM d)
    SELECT (SELECT count(*) FROM iv) AS n_intervals,
           CAST(max(conc) AS BIGINT) AS peak,
           make_timestamp(min(us) FILTER (
             conc = (SELECT max(conc) FROM r))) AS peak_at
    FROM r
    """,
)
def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-peak-concurrency: max simultaneously-open sessions and the
    earliest instant it occurs — sweep-line +1/−1 deltas, running sum
    distributed as range partitions + broadcast exclusive-prefix
    offsets (the global_row_index shape; no single-task sort)
    (operators/behavioral.py peak_concurrency)."""
    return behavioral.peak_concurrency(
        _session_intervals(spark, sf_dir), "s_us", "e_us"
    )


@query(
    "op-stream-incremental-agg",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
    FROM events GROUP BY 1
    """,
)
def q_stream_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-stream-incremental-agg: incrementally-maintained per-type
    rollup. The events table is split into 8 files so AvailableNow +
    maxFilesPerTrigger=1 yields a REAL multi-batch stream; each batch
    merges its delta into the versioned O(|keys|) state table
    (union + re-agg — the parquet stand-in for MERGE INTO), and the
    final state must equal the one-shot batch aggregate
    (streaming/events.py run_incremental_state)."""
    import tempfile

    from .streaming import events as sev

    src = tempfile.mkdtemp(prefix="inc_src_")
    _t(spark, sf_dir, "events").repartition(8).write.mode(
        "overwrite"
    ).parquet(src)
    schema = spark.read.parquet(src).schema
    stream = sev.normalize_event_ts(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = sev.run_incremental_state(stream, ["event_type"])
    return state.select(
        "event_type", "n", F.round("total", 2).alias("total")
    )
