from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_api_spark.streaming import events as sev

SF = "/root/testdata/sf0.001"


def _batch_events(spark):
    df = spark.read.parquet(f"{SF}/events.parquet")
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def test_stream_batch_parity_windowed_agg(spark):
    stream = sev.read_events_stream(spark, SF)
    assert stream.isStreaming
    streamed = sev.run_available_now(sev.windowed_agg(stream))
    batch = sev.windowed_agg(_batch_events(spark))
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b and len(s) > 0


def test_stream_incremental_triggers(spark):
    # maxFilesPerTrigger exercises multi-batch catch-up on the static backlog
    stream = sev.read_events_stream(spark, SF, max_files_per_trigger=1)
    out = sev.run_available_now(sev.windowed_agg(stream))
    assert out.count() > 0


def test_sessionization_batch_stream_duality(spark):
    sessions = sev.sessionized(_batch_events(spark))
    rows = sessions.collect()
    assert len(rows) > 0
    assert all(r.n_events >= 1 for r in rows)
    # session totals cover every event exactly once
    assert sum(r.n_events for r in rows) == _batch_events(spark).count()
