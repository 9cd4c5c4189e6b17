"""Unit tests for interval analytics (overlap join, sweep-line peak
concurrency) and incremental keyed-state maintenance — hand-built
frames pin the boundary semantics (touching endpoints, cross-cell
pairs, equal-time end/start ordering, multi-batch merge equality)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_pipeline_api_spark.operators import behavioral, joins

US = 1_000_000
HOUR = 3600 * US


def _iv(spark, rows):
    return spark.createDataFrame(rows, "id long, s_us long, e_us long")


def test_interval_overlap_basic_and_touching(spark):
    iv = _iv(
        spark,
        [
            (1, 0, 10 * US),          # overlaps 2
            (2, 5 * US, 15 * US),     # overlaps 1, touches 3
            (3, 15 * US, 20 * US),    # touches 2 (no overlap, half-open)
            (4, 100 * US, 101 * US),  # isolated
        ],
    )
    out = joins.interval_overlap_pairs(iv, "id", "s_us", "e_us").collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 2)}


def test_interval_overlap_cross_cell_counted_once(spark):
    # Both intervals span 3+ hour-cells and co-occupy several; the pair
    # must appear exactly once, and pairs meeting only across a cell
    # boundary must still be found.
    iv = _iv(
        spark,
        [
            (1, 0, 3 * HOUR + US),
            (2, 2 * HOUR, 5 * HOUR),
            (3, 3 * HOUR + 2 * US, 4 * HOUR),  # overlaps 2 only
        ],
    )
    out = joins.interval_overlap_pairs(
        iv, "id", "s_us", "e_us", cell_s=3600
    ).collect()
    pairs = sorted((r["id_a"], r["id_b"]) for r in out)
    assert pairs == [(1, 2), (2, 3)]  # each exactly once


def test_peak_concurrency_sweep_and_half_open(spark):
    # 1: [0,10) 2: [5,15) 3: [10,20) — at t=10, #1 ends as #3 starts:
    # half-open means they do NOT overlap, so peak is 2 (at t=5).
    iv = _iv(
        spark,
        [(1, 0, 10 * US), (2, 5 * US, 15 * US), (3, 10 * US, 20 * US)],
    )
    r = behavioral.peak_concurrency(iv, "s_us", "e_us").collect()[0]
    assert r["n_intervals"] == 3
    assert r["peak"] == 2
    assert r["peak_at"] == dt.datetime(1970, 1, 1, 0, 0, 5)
    # Adding [6,9) pushes the peak to 3 at t=6.
    iv2 = _iv(
        spark,
        [
            (1, 0, 10 * US),
            (2, 5 * US, 15 * US),
            (3, 10 * US, 20 * US),
            (4, 6 * US, 9 * US),
        ],
    )
    r = behavioral.peak_concurrency(iv2, "s_us", "e_us").collect()[0]
    assert r["peak"] == 3
    assert r["peak_at"] == dt.datetime(1970, 1, 1, 0, 0, 6)


def test_incremental_state_equals_batch(spark, tmp_path):
    # 3 unbalanced files -> 3 micro-batches; the merged state must equal
    # the one-shot batch aggregate and stay O(|keys|) rows.
    from etl_pipeline_api_spark.streaming import events as sev

    T0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, T0 + dt.timedelta(seconds=i), i % 7, ["a", "b", "c"][i % 3],
         float(i))
        for i in range(90)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )
    src = str(tmp_path / "src")
    df.repartition(3).write.parquet(src)
    stream = sev.normalize_event_ts(
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = sev.run_incremental_state(stream, ["event_type"])
    got = {
        r["event_type"]: (r["n"], round(r["total"], 2))
        for r in state.collect()
    }
    want = {
        r["event_type"]: (r["n"], round(r["total"], 2))
        for r in df.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == want
    assert len(got) == 3  # compact: one row per key, not per batch


def test_incremental_cdc_tombstone_survives_batches(spark, tmp_path):
    """A delete in batch 1 must NOT be resurrected by an OLDER update
    arriving in batch 2 (late data) — the reason tombstones live in the
    state between batches."""
    from etl_pipeline_api_spark.streaming import events as sev

    b1 = [(1, 10, 1, "U", 100.0), (1, 20, 2, "D", None),
          (2, 10, 3, "U", 200.0)]
    b2 = [(1, 15, 4, "U", 999.0),   # older than the delete -> stays dead
          (2, 30, 5, "U", 250.0),   # newer update -> wins
          (3, 5, 6, "U", 300.0)]    # new key
    schema = "k long, v0 long, v1 long, op string, amt double"
    src = str(tmp_path / "src")
    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema(
            spark.read.parquet(src).schema
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = sev.run_incremental_compact(
        stream, ["k"], ["v0", "v1"], "op", ["amt"]
    )
    got = {r["k"]: r["amt"] for r in out.collect()}
    assert got == {2: 250.0, 3: 300.0}  # key 1 stays deleted
