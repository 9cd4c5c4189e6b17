"""Relational batch 10 — event-sequence analytics + substring-level dedup
(SURVEY.md §2.9 extensions; the reference engine has no event analytics).

- op-sessionize: inactivity-gap sessionization of the events stream —
  the canonical clickstream building block (one shuffle on user).
- op-funnel: strict-order view→click→purchase conversion funnel via a
  higher-order-aggregate walk over each user's sorted events.
- op-retention: weekly cohort retention matrix (first-event cohort ×
  activity week).
- op-transitions: first-order event-type Markov transition counts with
  per-source probabilities.
- op-funnel-timing: time-to-convert p50/p90 over the same greedy chain.
- op-stream-funnel: the funnel maintained AS A STREAM — O(1)
  (stage, last_us) state per user via applyInPandasWithState.
- op-rolling-window: per-event trailing-hour count/sum (RANGE frame
  over epoch-µs — equal timestamps share one frame).
- op-active-users: DAU / trailing-7-day WAU / stickiness; the windowed
  count-distinct is an offset fan-out of the distinct (user, day) set.
- op-ohlc-downsample / op-stream-ohlc: time-bucket OHLC rollup as one
  map-combined min_by/max_by aggregation, batch and watermarked-stream.
- op-attribution: last-touch conversion attribution (24 h age cut) via
  a running ignore-nulls struct window.
- op-span-dup-stats: per-document duplicated-span fraction over rolling
  word 8-grams — the substring-level train-dedup ranking signal.
- op-anomaly-mad: robust per-type outlier counts via median absolute
  deviation (median/MAD, not mean/σ — resistant to the very outliers
  it is hunting).
- op-bm25: Okapi BM25 keyword retrieval — the exact-match baseline
  beside the ANN search path; single corpus scan, broadcast stats.
- op-sample-weighted: A-ES weighted sampling without replacement on the
  det_key uniform (invariant-gated: exact k + heavy-bias).

All DuckDB-oracle-gated; tie-breaks are total-ordered on
``(ts, event_id)`` in BOTH engines so the results are deterministic
under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import behavioral, dedup, diagnostics
from .queries import _t, query


@query(
    "op-sessionize",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, ts, epoch_us(ts) AS us, value FROM events),
    f AS (
      SELECT *,
             CASE WHEN lag(us) OVER w IS NULL
                    OR us - lag(us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
    s AS (
      SELECT *,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM f)
    SELECT user_id,
           CAST(session_idx AS BIGINT)            AS session_idx,
           count(*)                               AS n_events,
           min(ts)                                AS start_ts,
           max(ts)                                AS end_ts,
           CAST((max(us) - min(us)) // 1000000 AS BIGINT) AS duration_sec,
           round(sum(value), 2)                   AS total_value
    FROM s GROUP BY 1, 2
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-sessionize: 30-min inactivity-gap sessions over events. One
    hash partitioning on user feeds the lag window, the running session
    index, and the per-session aggregation (operators/behavioral.py)."""
    return behavioral.sessionize(_t(spark, sf_dir, "events"), gap_minutes=30)


@query(
    "op-funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1),
    c AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t2
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1 GROUP BY 1),
    p AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t3
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2 GROUP BY 1)
    SELECT
      (SELECT count(DISTINCT user_id) FROM events
       WHERE event_type IN ('view','click','purchase')) AS n_users,
      (SELECT count(*) FROM v) AS n_step_1,
      (SELECT count(*) FROM c) AS n_step_2,
      (SELECT count(*) FROM p) AS n_step_3
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-funnel: strict-order view→click→purchase funnel. The greedy
    sorted-array walk (first qualifying event per stage) is provably the
    same chain the oracle's min-timestamp CTEs compute: first view, then
    first click strictly after it, then first purchase strictly after
    that (operators/behavioral.py funnel)."""
    return behavioral.funnel(
        _t(spark, sf_dir, "events"), steps=["view", "click", "purchase"]
    )


@query(
    "op-retention",
    oracle="""
    WITH f AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort
      FROM events GROUP BY 1),
    a AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events)
    SELECT CAST(f.cohort AS DATE) AS cohort_week,
           CAST(date_diff('day', f.cohort, a.wk) // 7 AS INT) AS week_offset,
           count(DISTINCT a.user_id) AS n_users
    FROM a JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-retention: weekly cohort retention. Output is |weeks|² rows
    regardless of input size; both aggs are map-side-combined on the
    same user key (operators/behavioral.py retention)."""
    return behavioral.retention(_t(spark, sf_dir, "events"))


@query(
    "op-transitions",
    oracle="""
    WITH pr AS (
      SELECT lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type,
             event_type AS next_type
      FROM events),
    c AS (
      SELECT prev_type, next_type, count(*) AS n
      FROM pr WHERE prev_type IS NOT NULL GROUP BY 1, 2)
    SELECT prev_type, next_type, n,
           round(n / sum(n) OVER (PARTITION BY prev_type), 4) AS p
    FROM c
    """,
)
def q_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-transitions: event-type Markov transition matrix — |types|²
    output rows, two linear shuffles (operators/behavioral.py)."""
    return behavioral.transitions(_t(spark, sf_dir, "events"))


@query(
    "op-span-dup-stats",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents),
    sp AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(toks)-7, 0)),
               i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3]
                 ||' '||toks[i+4]||' '||toks[i+5]||' '||toks[i+6]||' '||toks[i+7]
             )) AS gram
      FROM tok),
    dup AS (
      SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM sp)
      GROUP BY gram HAVING count(*) >= 2),
    agg AS (
      SELECT sp.doc_id, count(*) AS n_spans,
             sum(CASE WHEN dup.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_dup
      FROM sp LEFT JOIN dup USING (gram) GROUP BY 1)
    SELECT d.doc_id,
           CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(coalesce(a.n_dup, 0) AS BIGINT)   AS n_dup,
           round(CASE WHEN coalesce(a.n_spans, 0) = 0 THEN 0.0
                      ELSE a.n_dup * 1.0 / a.n_spans END, 4) AS dup_frac
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
)
def q_span_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-span-dup-stats: per-doc duplicated rolling-8-gram fraction —
    the substring-level dedup ranking signal. Spans travel as xxhash64
    keys, never strings; three linear shuffles, no pair join
    (operators/dedup.py span_dup_stats)."""
    return dedup.span_dup_stats(
        _t(spark, sf_dir, "documents"), "doc_id", "text", n=8
    )


@query(
    "op-anomaly-mad",
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS med_value
      FROM events GROUP BY 1),
    mad AS (
      SELECT e.event_type,
             median(abs(e.value - m.med_value)) AS mad_value,
             any_value(m.med_value) AS med_value
      FROM events e JOIN med m USING (event_type) GROUP BY 1)
    SELECT e.event_type,
           count(*) AS n,
           CAST(sum(CASE WHEN abs(e.value - m.med_value)
                              > 3.0 * 1.4826 * m.mad_value
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(any_value(m.med_value), 4) AS med_value,
           round(any_value(m.mad_value), 4) AS mad_value
    FROM events e JOIN mad m USING (event_type)
    GROUP BY 1
    """,
)
def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-anomaly-mad: robust per-type outlier counts (|v-med| >
    3·1.4826·MAD). Exact medians for oracle parity; the two |keys|-row
    frames broadcast, so the fact table is never shuffled
    (operators/diagnostics.py mad_outliers)."""
    return diagnostics.mad_outliers(
        _t(spark, sf_dir, "events"), "event_type", "value", k=3.0
    )


@query(
    "op-bm25",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents),
    pd AS (SELECT doc_id, len(toks) AS dl, toks FROM tok),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM pd),
    tf AS (
      SELECT doc_id, dl, term,
             len(list_filter(toks, x -> x = term)) AS tf
      FROM pd, (SELECT unnest(['spark','query','join']) AS term) q),
    tf2 AS (SELECT * FROM tf WHERE tf > 0),
    dfq AS (SELECT term, count(*) AS df_docs FROM tf2 GROUP BY 1)
    SELECT doc_id,
           round(sum(
             ln((n_docs - df_docs + 0.5) / (df_docs + 0.5) + 1.0)
             * (tf * 2.2)
             / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
           ), 4) AS score,
           CAST(count(*) AS BIGINT) AS n_terms
    FROM tf2 CROSS JOIN stats JOIN dfq USING (term)
    GROUP BY 1
    """,
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-bm25: Okapi BM25 keyword retrieval (query = spark/query/join,
    k1=1.2, b=0.75) — the exact-match baseline beside the ANN search
    path. Full scored set, no top-k cut at the gate (operators/text.py
    bm25_scores); single corpus scan, broadcast stats."""
    from .operators import text as text_ops

    return text_ops.bm25_scores(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        ["spark", "query", "join"],
    )


@query(
    "op-rolling-window",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, epoch_us(ts) AS us, value FROM events)
    SELECT event_id, user_id,
           count(*) OVER w            AS n_trailing,
           round(sum(value) OVER w, 2) AS sum_trailing
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY us
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def q_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-rolling-window: per-event trailing-hour count/sum for the same
    user — a RANGE frame over epoch-µs, so equal timestamps share one
    frame (no tie ambiguity); one shuffle, O(n) sliding frame
    (operators/behavioral.py rolling_window_features)."""
    return behavioral.rolling_window_features(
        _t(spark, sf_dir, "events"), lookback_s=3600
    )


@query(
    "op-active-users",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events),
    dau AS (SELECT d AS day, count(DISTINCT u) AS dau FROM ud GROUP BY 1),
    span AS (SELECT max(d) AS maxd FROM ud),
    fan AS (
      SELECT u, d + CAST(k AS INT) AS day
      FROM ud, (SELECT unnest(generate_series(0, 6)) AS k) ks),
    wau AS (
      SELECT day, count(DISTINCT u) AS wau
      FROM fan, span WHERE day <= maxd GROUP BY 1)
    SELECT day, dau, wau, round(dau * 1.0 / wau, 4) AS stickiness
    FROM dau JOIN wau USING (day)
    """,
)
def q_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-active-users: DAU / trailing-7-day WAU / stickiness. The
    trailing distinct-user window is an offset fan-out of the DISTINCT
    (user, day) set — windowed count-distinct without a self-join or
    driver state (operators/behavioral.py active_users)."""
    return behavioral.active_users(_t(spark, sf_dir, "events"), window_days=7)


@query(
    "op-ohlc-downsample",
    oracle="""
    WITH e AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             epoch_us(ts) AS us, event_id, value,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY epoch_us(ts), event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn_d
      FROM events)
    SELECT event_type, bucket,
           round(max(CASE WHEN rn_a = 1 THEN value END), 2) AS open,
           round(max(value), 2)  AS high,
           round(min(value), 2)  AS low,
           round(max(CASE WHEN rn_d = 1 THEN value END), 2) AS close,
           round(sum(value), 2)  AS volume,
           count(*)              AS n
    FROM e GROUP BY 1, 2
    """,
)
def q_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-ohlc-downsample: hourly OHLC rollup per event type — ONE
    map-combined aggregation (min_by/max_by over the (µs, id) struct
    replaces the oracle's rn=1 window selection with an O(1)-state
    fold); persistable so later scans never re-touch raw events
    (operators/behavioral.py ohlc_downsample)."""
    return behavioral.ohlc_downsample(_t(spark, sf_dir, "events"))


@query(
    "op-attribution",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
    t AS (
      SELECT *,
             last_value(CASE WHEN event_type != 'purchase'
                             THEN struct_pack(tus := us, ttype := event_type)
                        END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch
      FROM e),
    conv AS (
      SELECT CASE WHEN touch IS NOT NULL
                    AND us - touch.tus <= 86400000000
                  THEN touch.ttype ELSE '(none)' END AS channel
      FROM t WHERE event_type = 'purchase')
    SELECT channel, count(*) AS n_conversions
    FROM conv GROUP BY 1
    """,
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-attribution: last-touch attribution of purchases to the most
    recent preceding non-purchase event within 24 h — one running
    ignore-nulls window, no self-join (operators/behavioral.py
    last_touch_attribution)."""
    return behavioral.last_touch_attribution(
        _t(spark, sf_dir, "events"), conversion_type="purchase"
    )


@query(
    "op-stream-ohlc",
    oracle="""
    WITH e AS (
      SELECT event_type, date_trunc('hour', ts) AS window_start,
             epoch_us(ts) AS us, event_id, value,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY epoch_us(ts), event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn_d
      FROM events)
    SELECT window_start, event_type,
           round(max(CASE WHEN rn_a = 1 THEN value END), 2) AS open,
           round(max(value), 2)  AS high,
           round(min(value), 2)  AS low,
           round(max(CASE WHEN rn_d = 1 THEN value END), 2) AS close,
           round(sum(value), 2)  AS volume,
           count(*)              AS n
    FROM e GROUP BY 1, 2
    """,
)
def q_stream_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-stream-ohlc: the OHLC rollup executed AS A STREAM (file source
    → watermark → windowed min_by/max_by state → memory sink,
    Trigger.AvailableNow) — O(1) mergeable partial state per window, no
    per-window sort; result table oracle-matched against the batch
    row_number twin (streaming/events.py ohlc_windowed)."""
    from .streaming import events as sev

    stream = sev.read_events_stream(spark, sf_dir)
    return sev.run_available_now(sev.ohlc_windowed(stream))


@query(
    "op-sample-weighted",
    oracle="""
    SELECT CAST(100 AS BIGINT) AS n, true AS biased_heavy
    """,
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-sample-weighted: A-ES weighted sampling of 100 docs with
    weight = n_chars. Exact membership is engine-hash-specific (float
    pow priorities), so — like the approx-sketch gates — the oracle
    checks the invariants: exactly k rows came back, and the sample's
    mean weight exceeds the corpus mean (the defining bias of weighted
    sampling; a uniform sampler fails this with high probability).
    Rerun determinism is unit-pinned (operators/sampling.py
    weighted_sample)."""
    from .operators import sampling

    docs = _t(spark, sf_dir, "documents")
    corpus_avg = docs.agg(F.avg("n_chars").alias("corpus_avg"))
    samp = sampling.weighted_sample(docs, "doc_id", "n_chars", 100)
    return (
        samp.agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("n_chars").alias("sample_avg"),
        )
        .crossJoin(F.broadcast(corpus_avg))
        .select(
            F.col("n").cast("long").alias("n"),
            (F.col("sample_avg") > F.col("corpus_avg")).alias("biased_heavy"),
        )
    )


@query(
    "op-funnel-timing",
    oracle="""
    WITH v AS (
      SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1),
    c AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t2
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1 GROUP BY 1),
    p AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t3, any_value(v.t1) AS t1
      FROM events e JOIN c USING (user_id) JOIN v USING (user_id)
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2 GROUP BY 1),
    t AS (SELECT (t3 - t1) / 1000000.0 AS t_sec FROM p)
    SELECT count(*) AS n_converted,
           round(quantile_cont(t_sec, 0.5), 2) AS p50_sec,
           round(quantile_cont(t_sec, 0.9), 2) AS p90_sec
    FROM t
    """,
)
def q_funnel_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-funnel-timing: time-to-convert quantiles for users completing
    view→click→purchase — (last step − first view) of the same greedy
    chain op-funnel counts, exact interpolated percentiles over the
    converted set (operators/behavioral.py funnel_times)."""
    return behavioral.funnel_times(
        _t(spark, sf_dir, "events"), steps=["view", "click", "purchase"]
    )


@query(
    "op-stream-funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1),
    c AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t2
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1 GROUP BY 1),
    p AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t3
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2 GROUP BY 1)
    SELECT
      (SELECT count(DISTINCT user_id) FROM events
       WHERE event_type IN ('view','click','purchase')) AS n_users,
      (SELECT count(*) FROM v) AS n_step_1,
      (SELECT count(*) FROM c) AS n_step_2,
      (SELECT count(*) FROM p) AS n_step_3
    """,
)
def q_stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-stream-funnel: the conversion funnel maintained AS A STREAM —
    applyInPandasWithState carries (stage, last_us) per user across
    micro-batches (O(1) state, no event history); over the in-order
    AvailableNow backlog the per-user stages equal the batch walk, so
    the same oracle gates both. Post-stream the |users|-row update
    table is batch-aggregated to stage counts (streaming/events.py
    funnel_stage_stream)."""
    from .streaming import events as sev

    steps = ["view", "click", "purchase"]
    stream = sev.read_events_stream(spark, sf_dir)
    per_user = sev.run_available_now(
        sev.funnel_stage_stream(stream, steps),
        output_mode="update",
        # python-stateful drain: backlog-sized width (r12, measured in
        # python_stateful_drain_partitions)
        state_partitions=sev.python_stateful_drain_partitions(spark, sf_dir),
    )
    final = per_user.groupBy("user_id").agg(F.max("stage").alias("_stage"))
    # coalesce: counts are 0 on an empty stream, not NULL (r10 all-empty
    # fuzz — same fix as operators/behavioral.py funnel)
    aggs = [F.count("*").alias("n_users")] + [
        F.coalesce(
            F.sum((F.col("_stage") >= i).cast("long")), F.lit(0)
        ).alias(f"n_step_{i}")
        for i in range(1, len(steps) + 1)
    ]
    return final.agg(*aggs)


@query(
    "op-table-diff",
    oracle="""
    WITH oldv AS (
      SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
      WHERE c_custkey % 97 != 0),
    newv AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 10 = 0
                  THEN round(c_acctbal + 100.0, 2) ELSE c_acctbal END AS c_acctbal,
             c_mktsegment
      FROM customer
      WHERE c_custkey % 89 != 0),
    j AS (
      SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
             CASE WHEN o.c_custkey IS NULL THEN 'added'
                  WHEN n.c_custkey IS NULL THEN 'removed'
                  WHEN o.c_acctbal IS NOT DISTINCT FROM n.c_acctbal
                   AND o.c_mktsegment IS NOT DISTINCT FROM n.c_mktsegment
                  THEN 'unchanged' ELSE 'changed' END AS status
      FROM oldv o FULL OUTER JOIN newv n USING (c_custkey))
    SELECT status, count(*) AS n FROM j GROUP BY 1
    """,
)
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-table-diff: snapshot diff between two deterministic versions of
    customer (drop %97 keys in old, drop %89 and bump %10 balances in
    new) — one co-partitioned full outer join, null-safe compare,
    status counts (operators/dq.py table_diff)."""
    from .operators.dq import table_diff

    cust = _t(spark, sf_dir, "customer")
    oldv = cust.filter(F.col("c_custkey") % 97 != 0).select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    newv = cust.filter(F.col("c_custkey") % 89 != 0).select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 10 == 0, F.round(F.col("c_acctbal") + 100.0, 2)
        )
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
        "c_mktsegment",
    )
    diff = table_diff(oldv, newv, ["c_custkey"], ["c_acctbal", "c_mktsegment"])
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n"))


@query(
    "op-session-stats",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
    f AS (
      SELECT *,
             CASE WHEN lag(us) OVER w IS NULL
                    OR us - lag(us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
    s AS (
      SELECT *,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM f),
    sess AS (
      SELECT user_id, session_idx, count(*) AS n_events,
             (max(us) - min(us)) // 1000000 AS duration_sec
      FROM s GROUP BY 1, 2)
    SELECT count(*) AS n_sessions,
           round(avg(CASE WHEN n_events = 1 THEN 1.0 ELSE 0.0 END), 4)
             AS bounce_rate,
           round(avg(n_events), 4) AS avg_events,
           round(avg(duration_sec), 2) AS avg_duration_sec
    FROM sess
    """,
)
def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-session-stats: session count / bounce rate / mean depth and
    duration — one global agg over the sessionize() output
    (operators/behavioral.py session_stats)."""
    return behavioral.session_stats(_t(spark, sf_dir, "events"))


@query(
    "op-path-trigrams",
    oracle="""
    WITH tri AS (
      SELECT lag(event_type, 2) OVER w AS step_1,
             lag(event_type, 1) OVER w AS step_2,
             event_type AS step_3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    c AS (
      SELECT step_1, step_2, step_3, count(*) AS n
      FROM tri WHERE step_1 IS NOT NULL GROUP BY 1, 2, 3)
    SELECT step_1, step_2, step_3, n, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT c.*, row_number() OVER (
        ORDER BY n DESC, step_1, step_2, step_3) AS rnk
      FROM c)
    WHERE rnk <= 10
    """,
)
def q_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-path-trigrams: top-10 consecutive 3-event journeys — two lag
    windows on one user partitioning, ≤|types|³ count keys, full lexical
    tie-break (operators/behavioral.py path_trigrams)."""
    return behavioral.path_trigrams(_t(spark, sf_dir, "events"), k=10)


@query(
    "op-new-vs-returning",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day FROM events),
    f AS (SELECT u, min(day) AS first_day FROM ud GROUP BY 1)
    SELECT day,
           CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
             AS new_users,
           CAST(sum(CASE WHEN day != first_day THEN 1 ELSE 0 END) AS BIGINT)
             AS returning_users
    FROM ud JOIN f USING (u) GROUP BY 1
    """,
)
def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-new-vs-returning: per-day acquisition vs retention split —
    distinct (user, day) set joined to first-seen day, two map-combined
    aggs (operators/behavioral.py new_vs_returning)."""
    return behavioral.new_vs_returning(_t(spark, sf_dir, "events"))


@query(
    "op-interevent-time",
    oracle="""
    WITH g AS (
      SELECT event_type,
             (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                PARTITION BY user_id, event_type
                ORDER BY epoch_us(ts), event_id)) / 1000000.0 AS gap_s
      FROM events)
    SELECT event_type,
           count(*) AS n_gaps,
           round(quantile_cont(gap_s, 0.5), 2) AS p50_s,
           round(quantile_cont(gap_s, 0.9), 2) AS p90_s
    FROM g WHERE gap_s IS NOT NULL GROUP BY 1
    """,
)
def q_interevent_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-interevent-time: per-type p50/p90 inter-arrival seconds within
    each user's stream — one lag window on (user, type), one percentile
    agg (operators/behavioral.py interevent_times)."""
    return behavioral.interevent_times(_t(spark, sf_dir, "events"))


@query(
    "op-fuzzy-join",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part),
    probe AS (
      SELECT DISTINCT
             substr(p_name, 1, len(p_name)//2 - 1)
               || substr(p_name, len(p_name)//2 + 1) AS q
      FROM part WHERE p_partkey % 50 = 0),
    cand AS (
      SELECT probe.q, names.p_name
      FROM probe JOIN names
        ON substr(probe.q, 1, 1) = substr(names.p_name, 1, 1)
       AND abs(len(probe.q) - len(names.p_name)) <= 2)
    SELECT q, p_name, CAST(levenshtein(q, p_name) AS INT) AS dist
    FROM cand WHERE levenshtein(q, p_name) <= 2
    """,
)
def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-fuzzy-join: record linkage — part names corrupted by dropping
    a middle character are re-linked to the catalog at edit distance
    ≤ 2, blocked on (first char, length band) so the quadratic compare
    never leaves a block (operators/joins.py fuzzy_join)."""
    from .operators.joins import fuzzy_join

    part = _t(spark, sf_dir, "part")
    probe = (
        part.filter(F.col("p_partkey") % 50 == 0)
        .select(
            F.expr(
                "concat(substr(p_name, 1, length(p_name) div 2 - 1), "
                "substr(p_name, length(p_name) div 2 + 1))"
            ).alias("q")
        )
        .distinct()
    )
    return fuzzy_join(probe, part, "q", "p_name", max_dist=2)


@query(
    "op-attribution-linear",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
    conv AS (
      SELECT user_id, event_id AS cid, us AS cus FROM e
      WHERE event_type = 'purchase'),
    touch AS (
      SELECT user_id, event_id AS tid, us AS tus, event_type AS channel
      FROM e WHERE event_type != 'purchase'),
    pairs AS (
      SELECT c.user_id, c.cid, t.channel,
             count(*) OVER (PARTITION BY c.user_id, c.cid) AS n_touches
      FROM conv c JOIN touch t USING (user_id)
      WHERE (t.tus < c.cus OR (t.tus = c.cus AND t.tid < c.cid))
        AND c.cus - t.tus <= 86400000000)
    SELECT channel,
           round(sum(1.0 / n_touches), 4) AS credit,
           count(*) AS n_pairs
    FROM pairs GROUP BY 1
    """,
)
def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-attribution-linear: multi-touch linear attribution — each
    purchase's credit split equally over the user's touches in the 24 h
    window before it; co-partitioned per-user self-join, per-conversion
    count window (operators/behavioral.py linear_attribution)."""
    return behavioral.linear_attribution(
        _t(spark, sf_dir, "events"), conversion_type="purchase"
    )


@query(
    "op-forecast-backtest",
    oracle="""
    WITH s AS (
      SELECT event_type, date_trunc('hour', ts) AS b, count(*) AS y
      FROM events GROUP BY 1, 2),
    j AS (
      SELECT a.event_type, a.y, p.y AS yhat
      FROM s a JOIN s p
        ON a.event_type = p.event_type
       AND a.b = p.b + INTERVAL 86400 SECONDS)
    SELECT event_type,
           count(*) AS n_points,
           round(avg(abs(y - yhat)), 4) AS mae,
           round(avg(abs(y - yhat) / ((abs(y) + abs(yhat)) / 2.0)), 4)
             AS smape
    FROM j GROUP BY 1
    """,
)
def q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-forecast-backtest: seasonal-naive (t−24 h) backtest over the
    hourly per-type count series, scored with MAE and sMAPE — the
    baseline every forecaster must beat (operators/behavioral.py
    seasonal_naive_backtest)."""
    return behavioral.seasonal_naive_backtest(_t(spark, sf_dir, "events"))


@query(
    "op-copurchase",
    oracle="""
    WITH bi AS (
      SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
    nb AS (SELECT count(DISTINCT b) AS n_baskets FROM bi),
    supp AS (SELECT i, count(*) AS n_i FROM bi GROUP BY 1),
    pairs AS (
      SELECT x.i AS ia, y.i AS ib, count(*) AS n_pair
      FROM bi x JOIN bi y ON x.b = y.b AND x.i < y.i
      GROUP BY 1, 2 HAVING count(*) >= 3),
    scored AS (
      SELECT p.ia, p.ib, p.n_pair,
             round(p.n_pair * 1.0 * nb.n_baskets / (sa.n_i * sb.n_i), 4)
               AS lift
      FROM pairs p, nb
      JOIN supp sa ON sa.i = p.ia
      JOIN supp sb ON sb.i = p.ib)
    SELECT ia, ib, n_pair, lift, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT scored.*, row_number() OVER (ORDER BY lift DESC, ia, ib) AS rnk
      FROM scored)
    WHERE rnk <= 20
    """,
)
def q_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-copurchase: top-20 part pairs by lift across order baskets —
    self-join on the basket key (fan-out Σ|basket|², never |items|²),
    broadcast supports, min-support prune before the deterministic
    (lift, ia, ib) rank (operators/aggregations.py copurchase_lift)."""
    from .operators.aggregations import copurchase_lift

    li = _t(spark, sf_dir, "lineitem")
    return copurchase_lift(li, "l_orderkey", "l_partkey",
                           min_pair_support=3, k=20)


@query(
    "op-rfm-segments",
    oracle="""
    WITH pu AS (
      SELECT user_id,
             max(epoch_us(ts)) AS last_us,
             count(*) AS freq,
             round(sum(value), 2) AS money
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    scored AS (
      SELECT ntile(5) OVER (ORDER BY last_us, user_id) AS r,
             ntile(5) OVER (ORDER BY freq, user_id)    AS f,
             ntile(5) OVER (ORDER BY money, user_id)   AS m
      FROM pu)
    SELECT r, f, m, count(*) AS n_users
    FROM scored GROUP BY 1, 2, 3
    """,
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-rfm-segments: quintile RFM segmentation of purchasers —
    count-balanced ntile buckets under a (metric, user) total order;
    segment counts ≤ 125 rows (operators/behavioral.py rfm_segments)."""
    return behavioral.rfm_segments(_t(spark, sf_dir, "events"))
