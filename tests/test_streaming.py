from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_api_spark.streaming import events as sev

SF = "/root/testdata/sf0.001"


def _batch_events(spark):
    df = spark.read.parquet(f"{SF}/events.parquet")
    return sev.normalize_event_ts(df)


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


def test_checkpoint_resume_processes_only_new_files(spark, tmp_path):
    """Restart-from-checkpoint contract: a second run over the SAME
    checkpoint + sink sees only files that arrived after the first run.
    If the old file were reprocessed (fresh batch ids + keyed overwrite
    can't dedup ACROSS files), the totals would double — so exact
    equality with the batch aggregate proves exactly-once across the
    restart."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select(
            "event_id", "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    pdf = ev.toPandas()
    src = tmp_path / "src"
    src.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    half = len(pdf) // 2
    pdf.iloc[:half].to_parquet(src / "f1.parquet")

    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("cents", T.LongType()),
    ])

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src))

        def write_batch(df, batch_id):
            (
                df.groupBy("event_type")
                .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("total"))
                .write.mode("overwrite")
                .parquet(os.path.join(sink, f"batch_id={batch_id}"))
            )

        q = (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    n_batches_first = len(os.listdir(sink))
    pdf.iloc[half:].to_parquet(src / "f2.parquet")
    drain()  # resume: same checkpoint, same sink

    got = (
        spark.read.parquet(sink)
        .groupBy("event_type")
        .agg(F.sum("n").alias("n"), F.sum("total").alias("total"))
        .collect()
    )
    want = {
        (r.event_type): (r.n, r.total)
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("total"))
        .collect()
    }
    assert {r.event_type: (r.n, r.total) for r in got} == want
    assert len(os.listdir(sink)) > n_batches_first  # second run added batches


def test_transform_with_state_totals(spark):
    """transformWithStateInPandas twin of user_running_totals: final state
    per user equals the batch groupBy. SKIPS where google.protobuf is
    absent (the transformWithState JVM<->Python protocol needs it; not
    shipped in this container)."""
    import pytest

    pytest.importorskip("google.protobuf")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_pipeline_api_spark.streaming import events as sev

    stream = sev.read_events_stream(spark, "/root/testdata/sf0.001")
    out = sev.run_available_now(
        sev.user_running_totals_tws(stream), output_mode="update"
    )
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = {
        r.user_id: (r.n_events, r.cents)
        for r in out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    want = {
        r.user_id: (r.n, r.cents)
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert final == want
