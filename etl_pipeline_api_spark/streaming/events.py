"""Structured Streaming operators over the events stream (SURVEY.md §2.9;
the reference has NO streaming — §2.7 — its extract loop is batch polling.
These are the Spark-native stream variants a production ingest would use).

Batch/stream duality: every aggregation here is written so the SAME logic
runs in batch (for the DuckDB oracle) and as a streaming query (watermarked,
incremental state). ``run_available_now`` drives a stream to completion over
a static source — the Trigger.AvailableNow catch-up pattern, which is also
how the reference's resumable poll-loop maps onto Spark (SURVEY §2.1).

Scale notes: watermark bounds state (late rows beyond it are dropped);
windowed aggs shuffle on (window, key); session windows merge in-state per
key. ``maxFilesPerTrigger`` throttles catch-up batches at 100 TB backfills.
"""

from __future__ import annotations

import contextlib
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


_DRAIN_CONF_LOCK = __import__("threading").Lock()


@contextlib.contextmanager
def _drain_conf(spark: SparkSession, state_partitions: int | None):
    """Scope `spark.sql.shuffle.partitions` to one stream START.

    A streaming drain creates one state store per shuffle partition per
    stateful operator per micro-batch (and the foreachBatch helpers run
    their per-batch groupBy + parquet write at the same width), so the
    session's batch-analytics width is pure overhead against a bounded
    backlog — measured 7.6+ s -> ~2.5 s on op-stream-stream-join at
    sf0.1 (32 -> 8 partitions), identical results.

    CONTRACT: the `with` block must contain ONLY the `.start()` call —
    `awaitTermination` goes outside. Spark clones the session conf
    DURING start (verified: numShufflePartitions in lastProgress
    reports the scoped value even when the conf is restored immediately
    after start returns), so the set window can be this narrow — and it
    must be, because the window is serialized under a module lock to
    make CONCURRENT drains safe: without it, thread B could read thread
    A's temporary value as its `saved` and "restore" it permanently
    (the set/restore race a query service with parallel drains would
    hit). Holding the lock through a whole drain would serialize
    drains; holding it only across start keeps them concurrent. The
    session-hygiene sweep pins the restore; the concurrency test pins
    both the snapshot and the race."""
    key = "spark.sql.shuffle.partitions"
    if state_partitions is None:
        yield
        return
    with _DRAIN_CONF_LOCK:
        saved = spark.conf.get(key)
        spark.conf.set(key, str(state_partitions))
        try:
            yield
        finally:
            spark.conf.set(key, saved)

def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Type-driven ts normalization shared by the batch and stream readers.

    The events source has shipped in two encodings: parquet timestamp[us]
    (arrives as TIMESTAMP_NTZ — passes through untouched) and legacy
    TIMESTAMP(NANOS) (readable only with nanosAsLong, which session.py sets;
    arrives as bigint and is truncated ns→µs exactly like DuckDB's
    TIMESTAMP_NS→TIMESTAMP read). Branching on the ACTUAL column type means
    a change of source encoding can never silently rescale timestamps.

    Streaming requires plain TIMESTAMP for event time (watermarks reject
    TIMESTAMP_NTZ: EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), so NTZ is cast —
    value-identical under the engine's UTC session timezone (session.py)."""
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        # integer div (not /1000 via double — int64 ns exceeds double mantissa)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dt == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _events_src(sf_dir: str) -> tuple[str, dict[str, str]]:
    """(path, reader options) for the events backlog — directory layout
    streams directly, the driver's flat file is glob-selected out of the
    shared dir (see read_events_stream's docstring)."""
    import os

    p = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(p):
        return p, {}
    return sf_dir, {"pathGlobFilter": "events.parquet"}


def events_backlog_schema(spark: SparkSession, sf_dir: str):
    """The RAW (pre-normalization) inferred schema of the events backlog —
    what ``read_events_stream`` feeds its reader. Callers that open the
    same backlog as several streams (stream-stream joins) call this once
    and pass it to each read, so footer-read inference runs once per
    query build instead of once per side (r12 optimization round)."""
    src_path, opts = _events_src(sf_dir)
    reader = spark.read
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.parquet(src_path).schema


def read_events_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
    schema=None,
) -> DataFrame:
    """File-source stream over the events parquet. The stream schema is
    inferred from a batch read of the same files, so whatever ts encoding
    the batch reader handles, the stream handles identically (no hardcoded
    schema to go stale when the source encoding changes).

    Handles BOTH table layouts (r10 partition-invariance finding): a
    multi-file DIRECTORY named events.parquet — every real cluster's
    layout — streams directly; the driver's single flat FILE is selected
    out of the shared testdata dir with a pathGlobFilter (the file
    stream source itself only accepts directories). The old
    glob-only path matched LEAF file names, so a directory layout
    matched nothing and died with UNABLE_TO_INFER_SCHEMA."""
    src_path, opts = _events_src(sf_dir)
    batch_reader = spark.read
    stream_reader = spark.readStream
    for k, v in opts.items():
        batch_reader = batch_reader.option(k, v)
        stream_reader = stream_reader.option(k, v)
    # ``schema``: callers that open the SAME backlog as several streams
    # (stream-stream joins) pass the first read's schema so the batch
    # footer-read inference runs once per query build, not once per side
    # (r12 optimization round; semantics identical — it is the same files'
    # inferred schema either way).
    if schema is None:
        schema = batch_reader.parquet(src_path).schema
    stream_reader = stream_reader.schema(schema)
    if max_files_per_trigger is not None:
        stream_reader = stream_reader.option(
            "maxFilesPerTrigger", max_files_per_trigger
        )
    return normalize_event_ts(stream_reader.parquet(src_path))


def windowed_agg(events: DataFrame, window: str = "1 hour",
                 watermark: str = "30 minutes",
                 slide: str | None = None) -> DataFrame:
    """Tumbling (or, with ``slide``, sliding/hopping) window counts/sums per
    event_type. In streaming mode the watermark bounds state and admits late
    data up to 30 min; in batch mode the same expression computes the
    identical result (oracle twin: date_trunc / time_bucket-unnest).

    Sliding windows multiply state by window/slide overlapping windows per
    event — at 100 TB keep the ratio small (2-4) or pre-aggregate into
    slide-sized tumbling panes and roll up (the two-level pane trick)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        src.groupBy(win, "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type", "n", "total",
        )
    )


def sessionized(events: DataFrame, gap: str = "10 minutes",
                watermark: str = "30 minutes") -> DataFrame:
    """Per-user session windows (gap-based). session_window works in both
    batch and streaming plans; streaming needs the watermark to finalize
    sessions."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("session_value"))
        .select(
            F.col("session_window.start").alias("session_start"),
            "user_id", "n_events", "session_value",
        )
    )


def python_stateful_drain_partitions(
    spark: SparkSession, sf_dir: str, table: str = "events.parquet"
) -> int:
    """State-partition count for a PYTHON-stateful backlog drain
    (applyInPandasWithState / transformWithStateInPandas), sized to the
    BACKLOG rather than to a fixed width (VERDICT r11 task 2).

    Each state partition is one python worker plus one state store
    instance committing per micro-batch, so the drain is
    parallelism-bound for large backlogs and pure-overhead-bound for
    small ones. Measured on the running-totals drain at local[32]:
    sf0.1 (2 MB backlog) reads 1.57 s median at 16 partitions vs 1.77 s
    at 32 and 2.18 s at 8; sf1 (12 MB) reads 4.1 s at 32 vs 7.4 s at 8
    (workers starved); the correctness gate's local[4]/sf0.01 reads
    ~1.4 s at 4-8 vs 15-22 s at 32 (task waves paying worker spin-up +
    store init on 4 cores). One partition per ~128 KiB of backlog,
    clamped to [min(8, cores), cores], lands on the measured winner at
    every one of those points. On a real cluster the same rule holds
    with cores = executors x cores-per-executor; a durable-checkpoint
    production stream should instead size once to steady-state state
    volume (Spark pins the count in the checkpoint at first start)."""
    return stateful_drain_partitions(
        spark, sf_dir, table, per_bytes=128 * 1024, floor=8
    )


def stateful_drain_partitions(
    spark: SparkSession,
    sf_dir: str,
    table: str = "events.parquet",
    per_bytes: int = 128 * 1024,
    floor: int = 8,
) -> int:
    """Backlog-proportional state-partition count for an AvailableNow
    drain: one partition per ``per_bytes`` of backlog, clamped to
    [min(floor, cores), cores] — the generic form of
    :func:`python_stateful_drain_partitions` (r12 optimization round).

    ``per_bytes`` encodes the per-partition overhead of the drain's
    stateful operator, measured at sf0.1/local[32] (7-run medians):

    - PYTHON-stateful (applyInPandasWithState): one python worker + one
      state store per partition → 128 KiB/partition (the r12-build
      measurement on the running-totals drain: 16 partitions 1.57 s vs
      32 at 1.77 s and 8 at 2.18 s).
    - JVM stream-stream JOIN: FOUR state stores per partition (left/
      right x keyToNumValues/keyWithIndexToValue), each committed and
      snapshotted per micro-batch, but no python workers → the overhead
      is store-count-bound and the win from narrowing is larger:
      1 MiB/partition (measured on op-stream-stream-join: 2 partitions
      2.05 s, 4 → 2.66 s, 8 → 3.51 s, 16 → 3.44 s; at sf0.01 2 → 2.32 s
      vs 8 → 2.52 s).
    - BOUNDED-state sketch aggs (count-min: state = d·w counters no
      matter the input): parallelism lives in the MAP-side partial
      aggregation, so the reduce/state width only needs to grow enough
      to bound per-reducer partial-row volume → 4 MiB/partition with
      floor 1 (measured on op-stream-countmin: 1 partition 1.02 s,
      2 → 1.14 s, 4 → 1.45 s, 8 → 1.54 s).

    On a real cluster the same rules hold with cores = executors x
    cores/executor; a production stream against a durable checkpoint
    should size ONCE to steady-state state volume (Spark pins the count
    in the checkpoint at first start — see run_available_now)."""
    import os

    p = os.path.join(sf_dir, table)
    if os.path.isdir(p):
        backlog = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(p)
            for f in files
            if not f.startswith(("_", "."))
        )
    elif os.path.exists(p):
        backlog = os.path.getsize(p)
    else:  # non-local URI — no cheap size; fall back to full width
        return spark.sparkContext.defaultParallelism
    dp = spark.sparkContext.defaultParallelism
    return max(min(floor, dp), min(dp, backlog // per_bytes))


def user_running_totals(events: DataFrame) -> DataFrame:
    """Custom STATEFUL streaming operator via applyInPandasWithState:
    per-user running (n_events, total_value), state carried across
    micro-batches, one updated row per user per batch.

    This is the escape hatch for operators Spark's built-in streaming aggs
    can't express (custom eviction, sketches, ML feature state …) — state
    is partitioned by key, Arrow-batched per group, bounded by the state
    store not executor memory.
    """
    import pandas as pd

    def update(key, pdf_iter, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n],
             "total_value": [round(total, 2)]}
        )

    from ..session import ship_package

    ship_package(events.sparkSession)
    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def run_available_now(
    result: DataFrame,
    output_mode: str = "complete",
    state_partitions: int | None = 8,
) -> DataFrame:
    """Execute a streaming DataFrame to completion over its static backlog
    (Trigger.AvailableNow) into a memory sink; returns the materialized
    result as a batch DataFrame. Checkpoint is per-run (throwaway).

    ``state_partitions`` sizes the stateful-operator partition count for
    the drain (r10): a streaming query creates, commits, and snapshots
    one state store PER shuffle partition PER stateful operator PER
    micro-batch, so draining a bounded backlog under the session's
    batch-analytics width (32 at the bench SF) is pure store-management
    overhead — measured on op-stream-stream-join at sf0.1: 7.6+ s at 32
    partitions vs ~2.5 s at 8 with identical results (state hash
    partitioning is internal; the stream/batch-parity oracles and the
    determinism/layout sweeps pin output equality). Spark pins the count
    in the checkpoint at FIRST start, so a per-run throwaway drain picks
    it fresh each time; a production stream against a durable checkpoint
    sets it once, sized to state volume and cluster cores — pass an
    explicit value (or None to inherit the session conf) there. The
    session conf is set around query START only and restored in a
    finally (the query captures it at start; the session-hygiene sweep
    asserts the restore).

    Session hygiene (r10): the memory sink registers a uuid-named temp
    view and the throwaway checkpoint writes a per-run /tmp directory —
    in a long-lived session server both grow without bound (one leaked
    view + one leaked dir PER DRAIN). The view is dropped immediately
    after capturing the result DataFrame (analysis resolves the sink
    relation at `spark.table(...)` time, so the frame stays readable —
    the sink's rows live as long as the plan references them), and the
    checkpoint dir is deleted once the query has terminated (it is
    per-run by construction; nothing can resume from it).
    tests/test_session_hygiene.py sweeps the whole registry for this
    invariant class."""
    spark = result.sparkSession
    name = f"stream_out_{uuid.uuid4().hex[:10]}"
    ckpt = os.path.join(tempfile.gettempdir(), f"ckpt_{name}")
    try:
        with _drain_conf(spark, state_partitions):
            q = (
                result.writeStream.format("memory")
                .queryName(name)
                .outputMode(output_mode)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
        q.awaitTermination()
        out = spark.table(name)
    finally:
        spark.catalog.dropTempView(name)
        shutil.rmtree(ckpt, ignore_errors=True)
    return out


def deduped(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming exact dedup on event_id: dropDuplicatesWithinWatermark
    keeps dedup state only for ids younger than the watermark — bounded
    state, unlike a plain dropDuplicates over an unbounded stream. This is
    the streaming twin of operators.dedup.exact_dedup (at-least-once
    sources → exactly-once rows)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    if events.isStreaming:
        return src.dropDuplicatesWithinWatermark(["event_id"])
    return src.dropDuplicates(["event_id"])


def purchases_after_clicks(
    clicks: DataFrame, purchases: DataFrame, within: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: purchases attributed to a same-user click in the
    preceding `within` interval. Both sides are watermarked, and the
    time-range join condition lets Spark expire buffered rows — state stays
    bounded by (watermark + interval), the canonical stream-stream join
    contract. In batch mode the identical expression computes the oracle
    twin.

    ``how="left_outer"`` additionally emits unconverted clicks with a null
    purchase_id — in streaming, an unmatched click emits only once the
    watermark proves no matching purchase can still arrive. Two operational
    caveats (pinned by tests/test_streaming.py): the global watermark is
    the MIN across both sides' watermark nodes, so an IDLE side holds every
    pending outer row (at 100 TB, feed heartbeats or set
    multipleWatermarkPolicy=max deliberately); and a batch's watermark
    takes effect one batch later, so null-emits trail the advancing data
    by one micro-batch."""
    if how not in ("inner", "left_outer"):
        raise ValueError("purchases_after_clicks supports inner/left_outer")
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("c_ts", within)
        p = p.withWatermark("p_ts", within)
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {within}")),
        how,
    ).select("click_id", "purchase_id")


def run_foreach_batch_idempotent(result: DataFrame, agg_keys: list[str]) -> DataFrame:
    """Drain a streaming DataFrame through ``foreachBatch`` into a
    batch_id-partitioned parquet sink, then read the sink back.

    This is the exactly-once-sink pattern for stores without transactional
    streaming support: each micro-batch writes (mode=overwrite) into a
    directory KEYED BY ``batch_id``, so a replayed batch after a failure
    overwrites its own previous partial output instead of double-counting —
    idempotence from deterministic batch ids + keyed overwrite, the
    documented Structured Streaming contract for foreachBatch sinks.
    The per-batch payload is a partial aggregate on ``agg_keys`` (count +
    sum), so what lands on disk is compact regardless of batch size; the
    caller re-aggregates the read-back to the global result."""
    sink = tempfile.mkdtemp(prefix="fb_sink_")
    ckpt = os.path.join(tempfile.gettempdir(), f"ckpt_fb_{uuid.uuid4().hex[:10]}")

    def write_batch(df: DataFrame, batch_id: int) -> None:
        (
            df.groupBy(*agg_keys)
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
            .write.mode("overwrite")
            .parquet(os.path.join(sink, f"batch_id={batch_id}"))
        )

    spark = result.sparkSession
    with _drain_conf(spark, 8):
        q = (
            result.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
    try:
        q.awaitTermination()
    finally:
        # per-run throwaway checkpoint: cleaned even when the drain raises
        # (r10 ADVICE — a StreamingQueryException used to leak the dir,
        # the leak class run_available_now's try/finally already closes)
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.read.option("basePath", sink).parquet(os.path.join(sink, "batch_id=*"))


def user_running_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running totals via ``transformWithStateInPandas`` — Spark
    4's successor to applyInPandasWithState (``user_running_totals`` pins
    the older API with the same semantics): explicit typed ValueState per
    key, Arrow-batched row iterators, RocksDB state store (required by
    the API; set at runtime so vanilla sessions work).

    ENVIRONMENT GATE: the transformWithState protocol speaks protobuf
    between the JVM and the Python state server; containers without
    ``google.protobuf`` cannot run it (this one — see
    tests/test_streaming.py::test_transform_with_state_totals, which
    importorskips). The operator is kept importable (no protobuf needed
    until execution) as the documented Spark-4 shape; totals accumulate
    in integer cents so the result is exact under any micro-batch split.
    """
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    # transformWithState REQUIRES the RocksDB state-store provider, and the
    # provider must be active when the query *starts* — which happens after
    # this builder returns (run_available_now) — so a set-and-restore inside
    # the builder cannot work. This is therefore a deliberate, documented,
    # idempotent session-level set: the one conf mutation in this module.
    # Per-query state isolation still holds (each run uses a fresh
    # checkpoint dir), and other streaming operators here are
    # provider-agnostic.
    rocksdb = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    spark = events.sparkSession
    if spark.conf.get("spark.sql.streaming.stateStore.providerClass", "") != rocksdb:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", rocksdb)

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", T.StructType([
                    T.StructField("n", T.LongType()),
                    T.StructField("cents", T.LongType()),
                ])
            )

        def handleInputRows(self, key, rows, timerValues):
            n, cents = (0, 0)
            if self._state.exists():
                n, cents = self._state.get()
            for pdf in rows:
                n += len(pdf)
                cents += int(pdf["cents"].sum())
            self._state.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "cents": [cents]}
            )

        def close(self) -> None:
            pass

    src = events.select(
        "user_id", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    out_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("cents", T.LongType()),
    ])
    return src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def ohlc_windowed(
    events: DataFrame, window: str = "1 hour", watermark: str = "30 minutes"
) -> DataFrame:
    """Tumbling-window OHLC rollup per event_type — the continuously-
    maintained form of operators.behavioral.ohlc_downsample. min_by /
    max_by over the (ts, event_id) struct are declarative aggregates
    with O(1) mergeable partial state, so they run inside streaming
    state exactly like count/sum (no per-window sort, no arbitrary
    stateful operator needed); the watermark bounds open windows. In
    batch mode the same expression computes the identical result
    (oracle twin: date_trunc + row_number selection)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    ordk = F.struct(F.col("ts").alias("t"), F.col("event_id").alias("i"))
    return (
        src.groupBy(F.window("ts", window), "event_type")
        .agg(
            F.round(F.min_by("value", ordk), 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.max_by("value", ordk), 2).alias("close"),
            F.round(F.sum("value"), 2).alias("volume"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type", "open", "high", "low", "close", "volume", "n",
        )
    )


def funnel_stage_stream(events: DataFrame, steps: list[str]) -> DataFrame:
    """STREAMING funnel: per-user funnel stage maintained across
    micro-batches via applyInPandasWithState — the real-time form of
    operators.behavioral.funnel. State per user is just (stage,
    last_us): O(1), not the event history; each batch's group rows are
    sorted (ts, event_id) and walked with the same greedy
    first-qualifying-event rule as the batch walk.

    Ordering caveat (inherent to any incremental funnel): the walk
    cannot backtrack, so events arriving in a LATER micro-batch with
    EARLIER timestamps than already-consumed state are ignored — with
    an in-order source (or the single-batch AvailableNow backlog the
    oracle uses) the result equals the batch funnel exactly; with
    out-of-order arrival it is the standard at-arrival approximation.

    Emits one (user_id, stage) row per user per batch (update mode);
    stage is monotone, so downstream consumers aggregate with max.
    """
    import pandas as pd

    us = F.unix_micros(F.col("ts").cast("timestamp"))
    fev = events.filter(F.col("event_type").isin(steps)).select(
        "user_id", us.alias("_us"), "event_id", "event_type"
    )
    n_steps = len(steps)

    def update(key, pdf_iter, state):
        stage, last = state.get if state.exists else (0, -1)
        rows = pd.concat(list(pdf_iter))
        rows = rows.sort_values(["_us", "event_id"])
        for u, et in zip(rows["_us"], rows["event_type"]):
            if stage < n_steps and et == steps[stage] and u > last:
                stage += 1
                last = int(u)
        state.update((stage, last))
        yield pd.DataFrame({"user_id": [key[0]], "stage": [stage]})

    from ..session import ship_package

    ship_package(events.sparkSession)
    return fev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, stage int",
        stateStructType="stage int, last_us long",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def run_incremental_state(
    result: DataFrame, agg_keys: list[str]
) -> DataFrame:
    """Incremental materialized-view maintenance: each micro-batch MERGES
    its delta into a compact keyed state table, so the final state IS the
    answer — no re-aggregation over per-batch partials at read time
    (contrast :func:`run_foreach_batch_idempotent`, whose sink grows one
    partial per batch and is re-aggregated by the reader).

    Per batch: (1) reduce the batch to a per-key delta (count + sum —
    associatively mergeable state, the only kind this pattern supports);
    (2) read the PREDECESSOR state = highest version strictly below this
    batch_id; (3) union + re-aggregate (the parquet-only stand-in for
    ``MERGE INTO`` on a lakehouse table — same shuffle shape, |keys|
    rows); (4) write to ``v=<batch_id>``. A replayed batch after a crash
    recomputes from the SAME predecessor and overwrites its own version —
    exactly-once from deterministic batch ids, never double-merged.

    State stays O(|keys|) regardless of stream length — the property
    that makes the pattern viable for a 100 TB backfill feeding a
    continuously-maintained rollup. Returns the final state read back.
    """
    root = tempfile.mkdtemp(prefix="inc_state_")
    ckpt = os.path.join(
        tempfile.gettempdir(), f"ckpt_inc_{uuid.uuid4().hex[:10]}"
    )
    spark = result.sparkSession

    def versions() -> list[int]:
        return sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(root)
            if d.startswith("v=")
        )

    def merge_batch(df: DataFrame, batch_id: int) -> None:
        delta = df.groupBy(*agg_keys).agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")
        )
        prior = [v for v in versions() if v < batch_id]
        if prior:
            prev = spark.read.parquet(os.path.join(root, f"v={prior[-1]}"))
            merged = (
                prev.unionByName(delta)
                .groupBy(*agg_keys)
                .agg(F.sum("n").alias("n"), F.sum("total").alias("total"))
            )
        else:
            merged = delta
        merged.write.mode("overwrite").parquet(
            os.path.join(root, f"v={batch_id}")
        )

    with _drain_conf(spark, 8):
        q = (
            result.writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
    try:
        q.awaitTermination()
    finally:
        # per-run throwaway checkpoint: cleaned even when the drain raises
        # (r10 ADVICE — a StreamingQueryException used to leak the dir,
        # the leak class run_available_now's try/finally already closes)
        shutil.rmtree(ckpt, ignore_errors=True)
    vs = versions()
    return spark.read.parquet(os.path.join(root, f"v={vs[-1]}"))


def run_incremental_compact(
    result: DataFrame,
    key_cols: list[str],
    version_cols: list[str],
    op_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Streaming CDC APPLY: each micro-batch of change rows is merged
    into the maintained current-snapshot table with latest-version-wins
    /delete semantics — the streaming twin of
    operators.dq.changelog_compact, closing the loop with
    operators.dq.table_diff (which PRODUCES such feeds).

    Unlike :func:`run_incremental_state` (additive counts/sums), the
    merge here is an ARGMAX per key, so deletes must survive between
    batches: the state table keeps every key's latest change INCLUDING
    tombstones (op = delete), and only the final read filters them out —
    dropping a tombstone early would let an older update resurrect the
    key in a later batch. State stays O(|keys|); versioned ``v=<batch>``
    dirs give the same deterministic-replay exactly-once contract as
    the additive variant. Returns the final live snapshot.
    """
    from ..operators import dq as _dq

    root = tempfile.mkdtemp(prefix="inc_cdc_")
    ckpt = os.path.join(
        tempfile.gettempdir(), f"ckpt_cdc_{uuid.uuid4().hex[:10]}"
    )
    spark = result.sparkSession

    def versions() -> list[int]:
        return sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(root)
            if d.startswith("v=")
        )

    def merge_batch(df: DataFrame, batch_id: int) -> None:
        prior = [v for v in versions() if v < batch_id]
        merged_src = df
        if prior:
            prev = spark.read.parquet(os.path.join(root, f"v={prior[-1]}"))
            merged_src = prev.unionByName(df)
        # keep tombstones in state (delete_op chosen to match nothing,
        # so the argmax retains every key's latest change row) AND keep
        # the version columns — the next batch's merge must compare its
        # changes against the state's versions, not start from zero
        state = _dq.changelog_compact(
            merged_src,
            key_cols,
            version_cols,
            op_col,
            version_cols + payload_cols + [op_col],
            delete_op="(never)",
        )
        state.write.mode("overwrite").parquet(
            os.path.join(root, f"v={batch_id}")
        )

    with _drain_conf(spark, 8):
        q = (
            result.writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
    try:
        q.awaitTermination()
    finally:
        # per-run throwaway checkpoint: cleaned even when the drain raises
        # (r10 ADVICE — a StreamingQueryException used to leak the dir,
        # the leak class run_available_now's try/finally already closes)
        shutil.rmtree(ckpt, ignore_errors=True)
    vs = versions()
    final = spark.read.parquet(os.path.join(root, f"v={vs[-1]}"))
    return final.where(F.col(op_col) != "D").drop(op_col, *version_cols)
