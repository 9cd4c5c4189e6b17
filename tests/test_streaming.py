from __future__ import annotations

import uuid

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


def test_watermark_drops_late_rows(spark, tmp_path):
    """Late-data contract: a row older than (max event time - watermark)
    arriving in a later micro-batch is DROPPED from the windowed aggregate
    — asserted via the state operator's numRowsDroppedByWatermark metric,
    which is the bounded-state guarantee that lets the 100 TB stream keep
    finite window state instead of growing forever."""
    import datetime as dt
    import json

    from pyspark.sql import types as T

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])
    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def write_rows(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src))
        agg = sev.windowed_agg(stream, window="1 hour", watermark="30 minutes")
        q = (
            agg.writeStream.format("noop")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sum(
            op.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for op in json.loads(p.json).get("stateOperators", [])
        )

    # batch 1: on-time rows spanning 2 h -> watermark persists at 1:30
    write_rows([
        (i, base + dt.timedelta(minutes=10 * i), 1, "click", 1.0)
        for i in range(13)
    ])
    assert drain() == 0
    # batch 2: one row in the long-closed 0:00 window + one fresh row
    write_rows([
        (100, base, 1, "click", 1.0),                          # late -> dropped
        (101, base + dt.timedelta(hours=2, minutes=30), 1, "click", 1.0),
    ])
    assert drain() == 1


def test_stream_stream_left_outer_emits_on_watermark(spark, tmp_path):
    """Left-outer stream-stream join contract: an unconverted click emits
    (purchase_id NULL) only once the watermark proves no matching purchase
    can still arrive. Batch 1's unmatched click must NOT appear after
    batch 1 (watermark hasn't passed it) and MUST appear after batch 2
    advances the watermark."""
    import datetime as dt

    from pyspark.sql import types as T

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])
    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def write_rows(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src))
        joined = sev.purchases_after_clicks(
            stream.filter(F.col("event_type") == "click"),
            stream.filter(F.col("event_type") == "purchase"),
            how="left_outer",
        )
        # file sink: append-mode and checkpoint-recoverable across drains
        # (the memory sink cannot resume from a checkpoint)
        q = (
            joined.writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (r.click_id, r.purchase_id)
            for r in spark.read.parquet(sink).collect()
        }

    # batch 1: click 1 converts, click 2 does not
    write_rows([
        (1, base, 7, "click", 1.0),
        (10, base + dt.timedelta(minutes=5), 7, "purchase", 9.0),
        (2, base + dt.timedelta(minutes=20), 7, "click", 1.0),
    ])
    out1 = drain()
    assert (1, 10) in out1
    assert (2, None) not in out1  # watermark hasn't closed click 2 yet
    # Two contract details this pins: (a) the GLOBAL watermark is the MIN
    # over both sides' watermark nodes, so BOTH streams need advancing
    # events or an idle side holds every outer row hostage; (b) a batch's
    # watermark only takes EFFECT in the following batch, so the null-emit
    # lands one drain after the advancing data.
    write_rows([
        (99, base + dt.timedelta(hours=3), 8, "click", 1.0),
        (98, base + dt.timedelta(hours=3), 9, "purchase", 2.0),
    ])
    drain()
    write_rows([
        (100, base + dt.timedelta(hours=4), 8, "click", 1.0),
        (101, base + dt.timedelta(hours=4), 9, "purchase", 2.0),
    ])
    out3 = drain()
    assert (2, None) in out3


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


def test_stream_funnel_checkpoint_restart(spark, tmp_path):
    """Streaming funnel: per-user (stage, last_us) state survives a
    checkpointed restart. The backlog is split into two files at a time
    boundary (in-order arrival), run as two separate AvailableNow
    executions against the SAME checkpoint; the recovered state must
    carry stage progress across the restart so the final stages equal
    the one-shot batch walk."""
    import pyspark.sql.functions as F
    from etl_pipeline_api_spark.operators import behavioral

    steps = ["view", "click", "purchase"]
    src = _batch_events(spark)
    mid = src.agg(F.expr("percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.5)")).collect()[0][0]
    d = tmp_path / "events_split"
    early = src.filter(F.unix_micros(F.col("ts").cast("timestamp")) <= mid)
    late = src.filter(F.unix_micros(F.col("ts").cast("timestamp")) > mid)
    early.coalesce(1).write.parquet(str(d / "f1.parquet"))

    schema = src.schema
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(d) + "/*")
        q = (
            sev.funnel_stage_stream(sev.normalize_event_ts(stream), steps)
            .writeStream.foreachBatch(
                lambda df, _bid: df.write.mode("append").parquet(out_dir)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()                      # batch 1: early half
    late.coalesce(1).write.parquet(str(d / "f2.parquet"))
    run_once()                      # restart: late half against same ckpt

    got = (
        spark.read.parquet(out_dir)
        .groupBy("user_id")
        .agg(F.max("stage").alias("stage"))
    )
    expected = behavioral._funnel_walk(
        src, steps, "user_id", "ts", "event_type", "event_id", 10_000
    ).select("user_id", F.col("_stage").alias("stage"))
    g = {(r.user_id, r.stage) for r in got.collect()}
    e = {(r.user_id, r.stage) for r in expected.collect()}
    assert g == e and len(g) > 0


def test_concurrent_drains_conf_race_and_snapshot(spark, sf_dir):
    """Two drains racing from two driver threads (the query-service
    shape; plans/corpus.py already runs threaded branches) must (a)
    leave the session's shuffle-partition conf exactly as found — the
    naive set/await/restore pattern lets thread B read thread A's
    temporary value as its 'saved' and restore it permanently — and
    (b) each actually run at its requested state-partition count even
    though the conf is restored immediately after start (Spark clones
    the session conf during start; numShufflePartitions in the last
    progress is the ground truth). Results must equal the serial runs."""
    import threading

    from etl_pipeline_api_spark.streaming import events as sev

    saved = spark.conf.get("spark.sql.shuffle.partitions")

    def drain(out, idx, parts):
        stream = sev.read_events_stream(spark, sf_dir)
        res = sev.run_available_now(
            sev.windowed_agg(stream), state_partitions=parts
        )
        out[idx] = {tuple(r) for r in res.collect()}

    results: dict[int, set] = {}
    for _ in range(3):  # three rounds of racing starts
        threads = [
            threading.Thread(target=drain, args=(results, i, parts))
            for i, parts in ((0, 5), (1, 7))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert spark.conf.get("spark.sql.shuffle.partitions") == saved
    assert results[0] == results[1]

    # snapshot pin: the scoped value reaches the state operator even
    # though the conf is restored right after start
    stream = sev.read_events_stream(spark, sf_dir)
    agg = sev.windowed_agg(stream)
    import os as _os
    import tempfile as _tf
    import uuid as _uuid

    name = f"snap_{_uuid.uuid4().hex[:8]}"
    ckpt = _os.path.join(_tf.gettempdir(), f"ckpt_{name}")
    with sev._drain_conf(spark, 5):
        q = (
            agg.writeStream.format("memory").queryName(name)
            .outputMode("complete").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
    assert spark.conf.get("spark.sql.shuffle.partitions") == saved
    q.awaitTermination()
    ops = q.lastProgress.get("stateOperators", [])
    assert ops and ops[0]["numShufflePartitions"] == 5, ops
    spark.catalog.dropTempView(name)
    import shutil as _sh

    _sh.rmtree(ckpt, ignore_errors=True)


def test_python_stateful_drain_partitions_backlog_sized(spark, tmp_path):
    """r12: the python-stateful drain width follows the backlog —
    one partition per ~128 KiB clamped to [min(8, cores), cores] —
    so a tiny backlog never pays 32 workers' spin-up and a large one
    never starves the box (measured table in the function docstring)."""
    dp = spark.sparkContext.defaultParallelism
    floor = min(8, dp)
    # tiny flat file -> floor
    small = tmp_path / "events.parquet"
    small.write_bytes(b"x" * 1024)
    assert sev.python_stateful_drain_partitions(spark, str(tmp_path)) == floor
    # directory layout: sums leaf files, skips _SUCCESS-style sentinels
    big = tmp_path / "dir" / "events.parquet"
    big.mkdir(parents=True)
    (big / "part-0.parquet").write_bytes(b"x" * (128 * 1024 * 10))
    (big / "part-1.parquet").write_bytes(b"x" * (128 * 1024 * 10))
    (big / "_SUCCESS").write_bytes(b"x" * (128 * 1024 * 100))
    got = sev.python_stateful_drain_partitions(spark, str(tmp_path / "dir"))
    assert got == max(floor, min(dp, 20))
    # huge backlog clamps at the session's cores
    (big / "part-2.parquet").write_bytes(b"x" * (128 * 1024 * 500))
    assert sev.python_stateful_drain_partitions(
        spark, str(tmp_path / "dir")
    ) == dp
    # missing path (non-local URI shape) -> full width, no crash
    assert sev.python_stateful_drain_partitions(
        spark, str(tmp_path / "nope")
    ) == dp
