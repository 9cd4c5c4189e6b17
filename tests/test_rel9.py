"""Batch-9 operators: sketches, skew diagnostics, ORC, sliding windows."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_api_spark.operators.diagnostics import key_histogram, skew_report
from etl_pipeline_api_spark.sources.orc_source import read_orc, write_orc
from etl_pipeline_api_spark.streaming import events as sev

SF = "/root/testdata/sf0.001"


def test_skew_report_values(spark):
    # 3 keys: 1 -> 4 rows, 2 -> 1 row, 3 -> 1 row
    df = spark.createDataFrame(
        [(1,), (1,), (1,), (1,), (2,), (3,)], "user_id long"
    )
    r = skew_report(df, "user_id").collect()[0]
    assert (r.n_keys, r.max_n, r.min_n) == (3, 4, 1)
    assert r.avg_n == 2.0
    assert r.heavy_key == 1
    assert r.skew_ratio == 2.0


def test_skew_report_heavy_key_tiebreak(spark):
    # two keys tie at max count -> LARGEST key wins deterministically
    # (struct-max tiebreak: works for string keys too, no numeric negation)
    df = spark.createDataFrame([(9,), (9,), (4,), (4,), (7,)], "user_id long")
    assert skew_report(df, "user_id").collect()[0].heavy_key == 9
    sdf = spark.createDataFrame([("b",), ("b",), ("a",), ("a",)], "k string")
    assert skew_report(sdf, "k").collect()[0].heavy_key == "b"


def test_key_histogram_no_driver_state(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    h = key_histogram(ev, "user_id")
    assert h.count() == ev.select("user_id").distinct().count()


def test_orc_roundtrip_content_and_pruning(spark, tmp_path):
    ev = sev.normalize_event_ts(
        spark.read.parquet(f"{SF}/events.parquet")
    ).select("event_id", "event_type", "value")
    out = str(tmp_path / "orc")
    write_orc(ev, out, partition_by=["event_type"])
    back = read_orc(spark, out)
    assert back.count() == ev.count()
    want = {
        (r.event_type): round(r.s, 2)
        for r in ev.groupBy("event_type").agg(F.sum("value").alias("s")).collect()
    }
    got = {
        (r.event_type): round(r.s, 2)
        for r in back.groupBy("event_type").agg(F.sum("value").alias("s")).collect()
    }
    assert got == want
    # partition pruning: a filter on the partition column must reach the scan
    # as a partition filter, not a data filter
    plan = back.filter(F.col("event_type") == "click")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_sliding_window_stream_batch_parity(spark):
    batch = sev.normalize_event_ts(spark.read.parquet(f"{SF}/events.parquet"))
    b = {
        tuple(r)
        for r in sev.windowed_agg(batch, "1 hour", slide="30 minutes").collect()
    }
    stream = sev.read_events_stream(spark, SF)
    s = {
        tuple(r)
        for r in sev.run_available_now(
            sev.windowed_agg(stream, "1 hour", slide="30 minutes")
        ).collect()
    }
    assert s == b and len(s) > 0
    # every event lands in exactly 2 hopping windows
    assert sum(r[2] for r in s) == 2 * batch.count()


def test_approx_flags_hold(spark):
    from etl_pipeline_api_spark.queries import QUERIES
    import etl_pipeline_api_spark.queries_rel9  # noqa: F401

    rows = QUERIES["op-approx-distinct"](spark, SF).collect()
    assert rows and all(r.within_tol for r in rows)
    q = QUERIES["op-approx-quantile"](spark, SF).collect()[0]
    assert q.ok50 and q.ok90 and q.ok99
