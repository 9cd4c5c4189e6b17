"""Second batch of relational-breadth queries: statistical aggregates,
deterministic sampling, ntile bucketing, regex surface, lateral explode
with ordinality, array-function surface, MERGE-style upsert, and the two
classic TPC-H scan-aggregate shapes (Q1, Q6).

All oracle-checked (driver t2 gate). Registered into the shared
QUERIES/ORACLES registries. None of these exist in the reference
(SURVEY.md §2.7 — its only aggregate surface is main.py:303-307's
groupby-sum); they are the Spark-native breadth a user migrating off the
reference gains for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _t, query


# =====================================================================
# TPC-H scan-aggregate classics (pure map-side-combine shapes)
# =====================================================================

@query(
    "op-tpch-q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
             AS DOUBLE)                                                AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
             AS DOUBLE)                                                AS sum_disc_price,
           round(avg(l_quantity), 4)                                   AS avg_qty,
           round(avg(l_discount), 4)                                   AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical pricing-summary scan-aggregate.

    Scale notes: 4-group output means the shuffle moves only partial-agg
    states (a few rows per map task) — the plan is scan → partial
    HashAggregate → tiny exchange → final agg, all in one codegen stage.
    The shipdate predicate reaches the parquet scan (PushedFilters), so
    at 100 TB the scan skips row groups on min/max stats.

    Money sums run in DECIMAL (r10 partition-invariance finding): the
    double sums are summation-order-dependent, and at sf0.001
    sum_disc_price lands within an ulp of a half-cent boundary — the
    flat-file and 7-shard layouts rounded to different cents. Decimal
    sums are exact, so the result is independent of partitioning, task
    count, and engine. TPC-H itself types these columns DECIMAL(15,2);
    the cast-from-double is exact-in-effect because 2dp prices stored as
    doubles sit ~1e-11 from the decimal grid, never at a cast boundary.
    Quantity sums/averages stay double: quantities are small integers,
    exactly summable in double to 2^53.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    price_dec = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_dec = F.col("l_discount").cast("decimal(4,2)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum(price_dec), 2).cast("double").alias("sum_base_price"),
        F.round(F.sum(price_dec * (F.lit(1).cast("decimal(4,2)") - disc_dec)), 2)
        .cast("double")
        .alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "op-tpch-q6",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: highly selective filter → scalar sum. Every
    predicate is a plain comparison on a scanned column, so all four
    reach the parquet reader; at scale this is an I/O-pruned scan plus a
    near-free aggregation (no shuffle beyond the single-row final agg)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.02, 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# =====================================================================
# Statistical aggregate surface
# =====================================================================

@query(
    "op-stats-agg",
    oracle="""
    SELECT event_type,
           round(stddev_samp(value), 2)                       AS sd,
           round(var_samp(value), 1)                          AS var,
           round(corr(value, CAST(user_id AS DOUBLE)), 3)     AS corr_vu,
           round(covar_samp(value, CAST(user_id AS DOUBLE)), 1) AS cov_vu
    FROM events
    GROUP BY event_type
    """,
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment aggregate surface: stddev/variance/correlation/
    covariance. All are single-pass distributive sketches (sum, sum-of-
    squares, co-moments) with map-side partial merge — the same
    one-shuffle shape as a plain sum, so they scale identically.
    Rounding is coarse (2/1/3/1 dp) because the merge order of partial
    moments differs between engines at the ~1e-10 level."""
    ev = _t(spark, sf_dir, "events")
    u = F.col("user_id").cast("double")
    return ev.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 2).alias("sd"),
        F.round(F.var_samp("value"), 1).alias("var"),
        F.round(F.corr(F.col("value"), u), 3).alias("corr_vu"),
        F.round(F.covar_samp(F.col("value"), u), 1).alias("cov_vu"),
    )


@query(
    "op-ntile",
    oracle="""
    SELECT event_type, bucket, count(*) AS n, round(sum(value), 2) AS total
    FROM (SELECT event_type,
                 ntile(4) OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS bucket, value
          FROM events)
    GROUP BY event_type, bucket
    """,
)
def q_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile quartile bucketing per event_type → per-bucket rollup. The
    ORDER BY is a total order (value, event_id) so bucket assignment is
    deterministic, and the window is PARTITIONED — each group sorts
    independently in its own task, so the plan scales with the key
    cardinality instead of funneling the table into one task (the
    unpartitioned form is exactly the global-sort trap). For GLOBAL
    quantile cuts at 100 TB, op-histogram / op-percentile derive cutpoints
    via percentile_approx and assign buckets with a comparison, which
    stays embarrassingly parallel."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.select("event_type", F.ntile(4).over(w).alias("bucket"), "value")
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )


@query(
    "op-sample-deterministic",
    oracle="""
    SELECT count(*) AS n, round(sum(value), 2) AS total,
           round(avg(value), 3) AS mean
    FROM events WHERE event_id % 20 = 0
    """,
)
def q_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5% systematic sample (key mod 20): reproducible
    across engines and runs, unlike Bernoulli df.sample (seeded RNG is
    engine-specific, so it cannot be oracle-checked). At 100 TB the
    modulo predicate is evaluated in the scan stage — no shuffle, no
    materialized sample, and the same rows are selected on every rerun,
    which is what a training-data pipeline needs for reproducible
    holdouts. For key-skew-free sampling of arbitrary keys, substitute
    pmod(xxhash64(key), 20) — same plan shape (hash differs per engine,
    hence the plain modulo in the oracle-checked query)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 20 == 0)
    return ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total"),
        F.round(F.avg("value"), 3).alias("mean"),
    )


# =====================================================================
# Regex + lateral-explode + array-function surface
# =====================================================================

@query(
    "op-regex-funcs",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1)                 AS first_word,
           regexp_replace(text, '[aeiou]', '_', 'g')           AS devoweled,
           CAST(regexp_matches(text, 'spark') AS INT)          AS has_spark,
           length(regexp_replace(text, '[^ ]', '', 'g')) + 1   AS n_tokens
    FROM documents WHERE doc_id < 50
    """,
)
def q_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar surface: extract / replace-all / rlike / count-via-
    strip. All JVM-codegen'd expressions (no UDF); dialect deltas are
    confined to the oracle (DuckDB needs the 'g' flag for replace-all
    and regexp_matches in place of RLIKE)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("text", "[aeiou]", "_").alias("devoweled"),
        F.col("text").rlike("spark").cast("int").alias("has_spark"),
        (F.length(F.regexp_replace("text", "[^ ]", "")) + 1).alias("n_tokens"),
    )


@query(
    "op-posexplode",
    oracle="""
    SELECT doc_id,
           CAST(unnest(generate_series(1, len(toks))) - 1 AS INT) AS pos,
           unnest(toks) AS tok
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
          FROM documents WHERE doc_id < 20)
    """,
)
def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: token stream with ordinal position (the input shape
    for shingling, BPE counting, positional n-grams). explode_outer
    rather than explode — plain explode triggers Catalyst's
    InferFiltersFromGenerate, whose size()>0 predicate is pushed below
    the exchange and re-evaluates the whole split per row (measured ~4x
    on this shape); text is never null here so outer semantics match."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    toks = d.select("doc_id", F.split(F.trim("text"), r"\s+").alias("toks"))
    return (
        toks.select("doc_id", F.posexplode_outer("toks").alias("pos", "tok"))
        .filter(F.col("tok").isNotNull())
    )


@query(
    "op-array-funcs",
    oracle="""
    SELECT doc_id, tok, CAST(rn - 1 AS INT) AS pos
    FROM (SELECT doc_id, tok,
                 row_number() OVER (PARTITION BY doc_id ORDER BY tok) AS rn
          FROM (SELECT DISTINCT doc_id, unnest(toks) AS tok
                FROM (SELECT doc_id,
                             regexp_split_to_array(trim(text), '\\s+') AS toks
                      FROM documents WHERE doc_id < 20)))
    WHERE rn <= 3
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface: split → array_distinct → array_sort →
    slice → posexplode, entirely row-local (the oracle needs a window +
    DISTINCT to express the same thing relationally). Row-local array
    ops are the scale-friendly form: zero shuffles, and the per-row
    arrays never leave the task that scanned them."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    top3 = d.select(
        "doc_id",
        F.slice(F.array_sort(F.array_distinct(F.split(F.trim("text"), r"\s+"))), 1, 3).alias(
            "toks"
        ),
    )
    return (
        top3.select("doc_id", F.posexplode_outer("toks").alias("pos", "tok"))
        .filter(F.col("tok").isNotNull())
        .select("doc_id", "tok", "pos")
    )


# =====================================================================
# MERGE-style upsert (SCD1)
# =====================================================================

@query(
    "op-upsert",
    oracle="""
    WITH delta AS (
        SELECT c_custkey, 'UPDATED_' || CAST(c_custkey AS VARCHAR) AS c_name,
               round(c_acctbal + 100, 2) AS c_acctbal
        FROM customer WHERE c_custkey % 100 < 10
        UNION ALL
        SELECT c_custkey + 1000000, 'NEW_' || CAST(c_custkey AS VARCHAR),
               0.0
        FROM customer WHERE c_custkey % 100 = 50
    )
    SELECT coalesce(d.c_custkey, t.c_custkey)   AS c_custkey,
           coalesce(d.c_name, t.c_name)         AS c_name,
           round(coalesce(d.c_acctbal, t.c_acctbal), 2) AS c_acctbal,
           CASE WHEN d.c_custkey IS NULL THEN 'kept'
                WHEN t.c_custkey IS NULL THEN 'inserted'
                ELSE 'updated' END              AS merge_action
    FROM customer t FULL OUTER JOIN delta d USING (c_custkey)
    """,
)
def q_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style SCD1 upsert as a full-outer join + coalesce — the
    engine-agnostic core of what Delta/Iceberg MERGE INTO compiles to.
    The delta here is derived from the snapshot so the query is
    self-contained and oracle-checkable; [[op-scd2]] covers the
    history-keeping variant.

    Scale notes: both sides hash-partition on the merge key, so the
    join is a co-partitioned shuffle; when the delta is small relative
    to the snapshot (the common case) Spark's AQE converts it to a
    broadcast join automatically. A real lakehouse MERGE adds
    file-level pruning on top; the row-level semantics are exactly
    this plan."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    updates = (
        cust.filter(F.col("c_custkey") % 100 < 10)
        .select(
            "c_custkey",
            F.concat(F.lit("UPDATED_"), F.col("c_custkey").cast("string")).alias("c_name"),
            F.round(F.col("c_acctbal") + 100, 2).alias("c_acctbal"),
        )
    )
    inserts = (
        cust.filter(F.col("c_custkey") % 100 == 50)
        .select(
            (F.col("c_custkey") + 1000000).alias("c_custkey"),
            F.concat(F.lit("NEW_"), F.col("c_custkey").cast("string")).alias("c_name"),
            F.lit(0.0).alias("c_acctbal"),
        )
    )
    delta = updates.unionByName(inserts)
    t, d = cust.alias("t"), delta.alias("d")
    merged = t.join(d, on="c_custkey", how="full_outer").select(
        F.col("c_custkey"),
        F.coalesce(F.col("d.c_name"), F.col("t.c_name")).alias("c_name"),
        F.round(F.coalesce(F.col("d.c_acctbal"), F.col("t.c_acctbal")), 2).alias("c_acctbal"),
        F.when(F.col("d.c_name").isNull(), F.lit("kept"))
        .when(F.col("t.c_name").isNull(), F.lit("inserted"))
        .otherwise(F.lit("updated"))
        .alias("merge_action"),
    )
    return merged


# =====================================================================
# Additional source/sink formats (§2.1 breadth beyond parquet/CSV/JSON)
# =====================================================================

@query(
    "op-orc-orders-roundtrip",
    oracle="""
    SELECT o_orderstatus, count(*) AS n,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total
    FROM orders GROUP BY 1
    """,
)
def q_orc_orders_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink round-trip on ORDERS (date + money columns; the
    events twin is queries_rel9's op-orc-roundtrip — this one was
    registered under the same name and silently shadowed until the
    registry learned to reject duplicates). Write orders as ORC (the
    other columnar lake format; same predicate-pushdown + column-pruning
    contract as parquet in Spark's DSv2 reader), read it back, aggregate.
    The oracle computes the identical aggregate from the parquet original
    — equality proves the format round-trip is lossless. Money totals use
    the exact-integer-cents discipline (order-independent; see op-rollup
    for the sf1 double-summation divergence this avoids)."""
    import tempfile

    out = tempfile.mkdtemp(prefix="orc_rt_")
    _t(spark, sf_dir, "orders").write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0
        ).alias("total"),
    )


@query(
    "op-ndjson-roundtrip",
    oracle="""
    SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS bal
    FROM customer GROUP BY 1
    """,
)
def q_ndjson_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newline-delimited JSON round-trip with an EXPLICIT read schema
    (schema-on-read: no sampling/inference job over 100 TB of text).
    Distinct from op-json-scan, which handles the reference's
    pretty-printed page envelopes (multiLine, corrupt isolation) —
    NDJSON is the splittable, scale-friendly JSON layout: one record
    per line means the scan parallelizes by byte range."""
    import tempfile

    out = tempfile.mkdtemp(prefix="ndjson_rt_")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
    cust.write.mode("overwrite").json(out)
    back = spark.read.schema("c_custkey long, c_mktsegment string, c_acctbal double").json(out)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("c_acctbal"), 2).alias("bal"),
    )


# =====================================================================
# Corpus-curation capstone (composes §2.9 extension operators end-to-end)
# =====================================================================

@query(
    "op-corpus-curate",
    oracle=r"""
    WITH RECURSIVE tok0 AS MATERIALIZED (
      SELECT doc_id, text,
             string_split_regex(lower(trim(text)), '\s+') AS tokens
      FROM documents),
    rates AS (
      SELECT doc_id,
        len(list_filter(tokens, t -> list_contains(['the','and','of'], t))) * 1.0
          / greatest(len(tokens), 1) AS r_en,
        len(list_filter(tokens, t -> list_contains(['el','la','los','de'], t))) * 1.0
          / greatest(len(tokens), 1) AS r_es,
        len(list_filter(tokens, t -> list_contains(['le','les','des','une'], t))) * 1.0
          / greatest(len(tokens), 1) AS r_fr,
        len(list_filter(tokens, t -> list_contains(['der','die','und','das'], t))) * 1.0
          / greatest(len(tokens), 1) AS r_de,
        len(list_filter(tokens, t -> list_contains(['的','是','了'], t))) * 1.0
          / greatest(len(tokens), 1) AS r_zh
      FROM tok0),
    lang_keep AS (
      SELECT doc_id FROM rates
      WHERE greatest(r_en, r_es, r_fr, r_de, r_zh) > 0
        AND r_en = greatest(r_en, r_es, r_fr, r_de, r_zh)),
    quality_keep AS (
      SELECT doc_id FROM tok0
      WHERE round(
          0.4 * least(length(text) / 200.0, 1.0)
        + 0.3 * least((len(list_filter(tokens, t -> list_contains(
              ['the','a','of','to','and','in','is','for','on','with'], t)))
              * 1.0 / greatest(len(tokens), 1)) / 0.08, 1.0)
        + 0.3 * (1.0 - length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
              * 1.0 / greatest(length(text), 1)), 4) >= 0.8),
    filtered AS MATERIALIZED (
      SELECT d.doc_id, d.text FROM documents d
      JOIN lang_keep USING (doc_id) JOIN quality_keep USING (doc_id)),
    fp AS MATERIALIZED (
      SELECT doc_id,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(generate_series(1, length(t)),
                                i -> CAST(ascii(substring(t, i, 1)) AS BIGINT))),
               (acc, x) -> (acc * 131 + x) % 1000000007) AS fingerprint
      FROM (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
            FROM filtered)),
    exact_survivors AS MATERIALIZED (
      SELECT f.doc_id, f.text FROM filtered f
      WHERE f.doc_id IN (SELECT min(doc_id) FROM fp GROUP BY fingerprint)),
    tok AS MATERIALIZED (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tokens
      FROM exact_survivors),
    sh AS MATERIALIZED (
      SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(tokens)-2, 0)),
                    i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])) AS shingle
      FROM tok),
    sizes AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS MATERIALIZED (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS MATERIALIZED (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
      WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5),
    edges AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs),
    reach(node, comp) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.node),
    losers AS (
      SELECT node FROM reach GROUP BY node HAVING min(comp) < node)
    SELECT doc_id FROM exact_survivors
    WHERE doc_id NOT IN (SELECT node FROM losers)
    """,
)
def q_corpus_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation (plans/corpus.py): language filter →
    quality filter → exact fingerprint dedup → near-dup cluster dedup,
    every stage one of the §2.9 operators, oracle-checked as ONE composed
    query (the DuckDB twin re-derives the whole flow including the
    recursive-CTE transitive closure). The exact-Jaccard verification
    path keeps the composition oracle-expressible; `curate(scale_path=
    True)` swaps the pair stage for MinHash LSH with identical downstream
    semantics — that variant is pinned by unit tests (LSH recall 1.0 on
    this corpus) and exercised in tests/test_corpus.py."""
    from .plans.corpus import curate

    docs = _t(spark, sf_dir, "documents")
    return curate(docs, quality_min=0.8, lang="en", scale_path=False).select("doc_id")


# =====================================================================
# Time-series resample: gap-fill + last-observation-carried-forward
# =====================================================================

@query(
    "op-gapfill-locf",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             count(*) AS n, round(sum(value), 2) AS v
      FROM events GROUP BY 1, 2),
    bounds AS (
      SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
      FROM events),
    spine AS (
      SELECT t.event_type, s.bucket
      FROM (SELECT DISTINCT event_type FROM events) t,
           (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
            FROM bounds) s)
    SELECT sp.event_type, sp.bucket,
           coalesce(h.n, 0) AS n,
           last_value(h.v IGNORE NULLS)
             OVER (PARTITION BY sp.event_type ORDER BY sp.bucket)
             AS sum_locf
    FROM spine sp LEFT JOIN hourly h USING (event_type, bucket)
    """,
)
def q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample: dense hourly spine per series + gap-fill with
    last-observation-carried-forward — the standard shape for sensor /
    metric pipelines (downstream models need a regular grid).

    Scale shape: the fact table reduces FIRST (hourly pre-aggregation, one
    shuffle); the spine is generated from a one-row bounds agg (sequence +
    explode — rows never touch the driver) crossed with the tiny distinct
    series set, so the left join runs against the already-reduced side.
    LOCF is a per-series ordered window — partitions are bounded by series
    cardinality × grid length, never by raw event volume."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        # the carried-forward statistic is the 2dp-quantized SUM, not a
        # mean: dividing by small counts lands on exact .0005 halves where
        # engine rounding modes diverge, while a 2dp-rounded sum of 2dp
        # inputs is order-stable and boundary-free (consumers divide by n
        # themselves if they want the mean)
        F.round(F.sum("value"), 2).alias("v"),
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine_hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("bucket")
    )
    spine = ev.select("event_type").distinct().crossJoin(spine_hours)
    w = Window.partitionBy("event_type").orderBy("bucket")
    return spine.join(hourly, ["event_type", "bucket"], "left").select(
        "event_type",
        "bucket",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.last("v", ignorenulls=True).over(w).alias("sum_locf"),
    )


# =====================================================================
# Cogrouped-map Pandas UDF (applyInPandas over a cogroup)
# =====================================================================

@query(
    "op-asof-cogroup",
    oracle="""
    SELECT event_id, user_id, ts,
           last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
    FROM events
    QUALIFY event_type = 'purchase'
    """,
)
def q_asof_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via the COGROUPED-map Pandas API — the same semantics as
    op-asof-join (same oracle), computed by `groupBy(user).cogroup(...)
    .applyInPandas(merge_asof)` instead of a window. Exists to exercise
    and pin the cogroup escape hatch: both sides hash-partition on the
    key, each (purchases, clicks) group pair arrives as two Arrow-backed
    pandas frames, and state is bounded by the largest single user's
    rows — the right tool when per-key logic genuinely needs imperative
    pandas (irregular resampling, curve fitting) and no window/join
    composition expresses it. The JVM window form (op-asof-join) remains
    the preferred plan when it does."""
    import pandas as pd

    from .session import ship_package

    ship_package(spark)
    ev = _t(spark, sf_dir, "events")
    # EXPLICIT hash repartition on the cogroup key: AQE sizes post-shuffle
    # partitions by BYTES, so this few-MB shuffle coalesces to one
    # partition and the python-worker stage — whose cost is per-GROUP call
    # overhead, not bytes — serializes 1,500 groups on one core (measured
    # 7.1 s noop floor -> 1.1 s at 32-way). A user-specified partition
    # count disables AQE coalescing for exactly this exchange; at cluster
    # scale defaultParallelism is the executor-core count, the right
    # parallelism for a compute-bound Arrow stage either way.
    n_part = spark.sparkContext.defaultParallelism
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    ).repartition(n_part, "user_id")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("c_event_id"),
        F.col("ts").alias("c_ts"),
    ).repartition(n_part, "c_user")

    def merge(p: "pd.DataFrame", c: "pd.DataFrame") -> "pd.DataFrame":
        # Tie-break exactly like the oracle's ROWS frame ordered by
        # (ts, event_id): a click at the purchase's own ts counts iff its
        # event_id is smaller — merge_asof can't express a composite asof
        # key, so bisect on the lexicographic (ts, event_id) tuple instead.
        import bisect

        if p.empty:
            return pd.DataFrame(
                {"event_id": [], "user_id": [], "ts": [], "last_click_ts": []}
            ).astype({"event_id": "int64", "user_id": "int64",
                      "ts": "datetime64[us]", "last_click_ts": "datetime64[us]"})
        out = p.copy()
        if c.empty:
            out["last_click_ts"] = pd.Series(
                pd.NaT, index=out.index, dtype="datetime64[us]"
            )
            return out[["event_id", "user_id", "ts", "last_click_ts"]]
        c = c.sort_values(["c_ts", "c_event_id"])
        ckeys = list(
            zip(c["c_ts"].astype("int64"), c["c_event_id"].astype("int64"))
        )
        cts = c["c_ts"].to_numpy()
        pts = out["ts"].astype("int64").to_numpy()
        pid = out["event_id"].astype("int64").to_numpy()
        picks = [
            cts[i - 1] if (i := bisect.bisect_left(ckeys, (t, e))) > 0 else None
            for t, e in zip(pts, pid)
        ]
        out["last_click_ts"] = pd.Series(
            picks, index=out.index, dtype="datetime64[us]"
        )
        return out[["event_id", "user_id", "ts", "last_click_ts"]]

    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("c_user"))
        .applyInPandas(
            merge, "event_id long, user_id long, ts timestamp, last_click_ts timestamp"
        )
    )


# =====================================================================
# Ranking-window surface (dense_rank / percent_rank / cume_dist / lead /
# nth_value — the remaining ANSI window functions not yet pinned)
# =====================================================================

@query(
    "op-window-funcs",
    oracle="""
    SELECT o_orderkey,
           dense_rank() OVER w                    AS drank,
           round(percent_rank() OVER w, 6)        AS prank,
           round(cume_dist() OVER w, 6)           AS cdist,
           lead(o_totalprice) OVER w              AS next_price,
           nth_value(o_totalprice, 2) OVER w      AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window surface: dense_rank / percent_rank / cume_dist /
    lead / nth_value in one pass — ONE shuffle on the partition key
    serves all five functions (Catalyst collapses same-window frames
    into a single Window node). The ORDER BY is a total order
    (price, key) so every rank is deterministic; ratio functions round
    at 6dp (exact halves at that position need power-of-two partition
    sizes — see op-gapfill-locf for the rounding-boundary discipline)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        F.dense_rank().over(w).alias("drank"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


# =====================================================================
# Selector / conditional aggregate surface (max_by, min_by, count_if,
# bool_and, bool_or)
# =====================================================================

@query(
    "op-argmax-agg",
    oracle="""
    SELECT event_type,
           arg_max(event_id, value * 10000000 + event_id) AS top_event,
           arg_min(event_id, value * 10000000 + event_id) AS bottom_event,
           count(*) FILTER (WHERE value > 400)            AS n_big,
           bool_or(value > 480)                           AS any_huge,
           bool_and(value > 0)                            AS all_positive
    FROM events
    GROUP BY event_type
    """,
)
def q_argmax_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selector/conditional aggregates: arg-max/arg-min rows, filtered
    counts, boolean alls/anys — all distributive single-pass aggregates
    (one shuffle, map-side partials, same scale shape as sum). The
    max_by ordering key is the composite value*1e7 + event_id: ties on
    the raw 2dp value would make arg-max nondeterministic across
    engines/partitionings, and the composite stays exactly representable
    in a double (< 2^53), so both engines order identically."""
    ev = _t(spark, sf_dir, "events")
    ordkey = F.col("value") * 10000000 + F.col("event_id")
    return ev.groupBy("event_type").agg(
        F.max_by("event_id", ordkey).alias("top_event"),
        F.min_by("event_id", ordkey).alias("bottom_event"),
        F.count_if(F.col("value") > 400).alias("n_big"),
        F.bool_or(F.col("value") > 480).alias("any_huge"),
        F.bool_and(F.col("value") > 0).alias("all_positive"),
    )
