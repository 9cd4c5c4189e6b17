"""Relational batch 9 — what a 100 TB deployment runs that small engines
skip (SURVEY.md §2.9).

- op-approx-distinct / op-approx-quantile: HLL++ cardinality and GK-sketch
  percentiles next to their exact twins, gated by exact values PLUS
  5%-tolerance flags — approximate operators under a deterministic oracle.
- op-hll-merge: per-day HLL sketches union-merged to an any-range distinct
  count — the incremental form (persist sketches, never rescan raw data).
- op-skew-report: the pre-join key-distribution probe that decides
  broadcast vs salt vs plain shuffle (operators/diagnostics.py).
- op-orc-roundtrip: ORC partitioned sink + distributed scan
  (sources/orc_source.py) — the last mainstream columnar format.
- op-parquet-corrupt-isolation: ignoreCorruptFiles lenient bronze scan —
  one truncated object must not fail a million-file read.
- op-domain-temperature: share^T domain rebalancing (the multilingual
  mixing rule), deterministic via Knuth-hash-order membership.
- op-stream-sliding-window: hopping-window (1 h / 30 min) aggregation
  executed AS A STREAM; the DuckDB twin unnests each event into its two
  containing windows.
- op-stream-datasource-pages: the custom page_json Python DataSource
  consumed as an incremental STREAM (filename offsets, restart-resume).
- op-lateral-topk / op-map-funcs: correlated LATERAL per-row top-N and
  the MapType surface (map_from_entries / transform_values / map_zip_with).

The reference implements none of these (its whole engine is
proj-eng-dados/main.py — single-process pandas); they are the §2.9
extension surface, each oracle- or tolerance-gated.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _SCRATCH, _t, _unique_view, query


# ---------------------------------------------------------------------
# op-approx-distinct: HLL cardinality with a tolerance-flag oracle
# ---------------------------------------------------------------------

@query(
    "op-approx-distinct",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_exact,
           true AS within_tol
    FROM events GROUP BY 1
    """,
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-approx-distinct: per-type distinct users, exact and HLL-sketched
    in ONE aggregation. The sketch (rsd 2%) must land within 5% of exact —
    that flag is what the oracle checks, making an approximate operator
    deterministic enough to gate. At 100 TB you drop the exact branch and
    keep the sketch: constant memory per group, map-side mergeable (this
    is also the shape of incremental/streaming cardinality)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("n_approx"),
        )
        .select(
            "event_type",
            "n_exact",
            (
                F.abs(F.col("n_approx") - F.col("n_exact"))
                <= 0.05 * F.col("n_exact")
            ).alias("within_tol"),
        )
    )


# ---------------------------------------------------------------------
# op-approx-quantile: GK-sketch percentiles with a tolerance-flag oracle
# ---------------------------------------------------------------------

@query(
    "op-approx-quantile",
    oracle="""
    SELECT round(quantile_cont(value, 0.5), 2)  AS p50,
           round(quantile_cont(value, 0.9), 2)  AS p90,
           round(quantile_cont(value, 0.99), 2) AS p99,
           true AS ok50, true AS ok90, true AS ok99
    FROM events
    """,
)
def q_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-approx-quantile: exact interpolated percentiles (the oracle
    values) plus percentile_approx sketches gated on RANK error — the
    guarantee the GK/KLL sketch actually makes. The r8 flag gated VALUE
    error (within 5% of the interpolated exact), which is meaningless on
    heavy-tailed gaps: with an extreme outlier the interpolated p99 falls
    in a value gap no data-member-returning sketch can be near (found by
    the r9 events fuzz). The rank gate: the sketch's returned value must
    occupy a rank interval [#(<v)+1, #(<=v)] intersecting the target
    rank q*n within 1 + n/accuracy — tight on every distribution, and a
    broken sketch still lands far outside it. The exact percentile is a
    full sort at scale; the sketch is a bounded-size mergeable summary —
    the only viable form at 100 TB, and the flags keep it under the
    correctness gate."""
    ev = _t(spark, sf_dir, "events")
    exact = [F.expr(f"percentile(value, {q})").alias(f"e{int(q * 100)}")
             for q in (0.5, 0.9, 0.99)]
    approx = [F.percentile_approx("value", q, 10000).alias(f"a{int(q * 100)}")
              for q in (0.5, 0.9, 0.99)]
    agg = ev.agg(*exact, *approx)
    ranked = ev.crossJoin(F.broadcast(agg)).agg(
        F.count(F.lit(1)).alias("n"),
        *[F.max(f"e{p}").alias(f"e{p}") for p in (50, 90, 99)],
        *[
            F.sum((F.col("value") < F.col(f"a{p}")).cast("long")).alias(
                f"lt{p}"
            )
            for p in (50, 90, 99)
        ],
        *[
            F.sum((F.col("value") <= F.col(f"a{p}")).cast("long")).alias(
                f"le{p}"
            )
            for p in (50, 90, 99)
        ],
    )

    def flag(p: int):
        t = (p / 100.0) * F.col("n")
        slack = F.lit(1.0) + F.col("n") / 10000.0
        # vacuous truth on degenerate input (empty corpus / all-NULL
        # value): the rank sums and sketch value go NULL, which must read
        # as "nothing to gate", matching the oracle's constant TRUE
        # (r10 all-empty fuzz — the op-bpe-encode treatment)
        return F.coalesce(
            (F.col(f"lt{p}") + 1 <= t + slack)
            & (F.col(f"le{p}") >= t - slack),
            F.lit(True),
        ).alias(f"ok{p}")

    return ranked.select(
        F.round("e50", 2).alias("p50"),
        F.round("e90", 2).alias("p90"),
        F.round("e99", 2).alias("p99"),
        flag(50), flag(90), flag(99),
    )


# ---------------------------------------------------------------------
# op-skew-report: join-key distribution probe
# ---------------------------------------------------------------------

@query(
    "op-skew-report",
    oracle="""
    WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1)
    SELECT count(*) AS n_keys,
           max(n) AS max_n,
           min(n) AS min_n,
           -- scale-then-round: decimal half-way cases (1.485) are inexact
           -- in double but 148.5 is exact, so both engines tie-break the
           -- same way (matches operators/diagnostics.py skew_report)
           round(sum(n) * 100.0 / count(*)) / 100.0 AS avg_n,
           (SELECT user_id FROM c ORDER BY n DESC, user_id DESC LIMIT 1) AS heavy_key,
           round(max(n) * 100.0 * count(*) / sum(n)) / 100.0 AS skew_ratio
    FROM c
    """,
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-skew-report: one-row key-skew summary for events.user_id — the
    measurement that picks broadcast vs salted vs plain shuffle join
    (operators/diagnostics.py skew_report; two map-combined aggs, nothing
    driver-side)."""
    from .operators.diagnostics import skew_report

    return skew_report(_t(spark, sf_dir, "events"), "user_id")


# ---------------------------------------------------------------------
# op-orc-roundtrip: ORC partitioned sink + distributed scan
# ---------------------------------------------------------------------

@query(
    "op-orc-roundtrip",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total
    FROM events GROUP BY 1
    """,
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round trip: events projected, written as an event_type-
    partitioned ORC layout (sources/orc_source.py), scanned back
    distributed, aggregated — values must survive the format exactly.
    Partitioning by the group key means the read-side agg enjoys
    partition pruning exactly like the hive-parquet sink."""
    from .sources.orc_source import read_orc, write_orc

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    out = os.path.join(_SCRATCH, "orc_roundtrip")
    shutil.rmtree(out, ignore_errors=True)
    write_orc(ev, out, partition_by=["event_type"])
    # schema declared so a zero-row write still reads back (see read_orc)
    back = read_orc(spark, out, schema=ev.schema)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total"),
    )


# ---------------------------------------------------------------------
# op-parquet-corrupt-isolation: lenient bronze-layer scan
# ---------------------------------------------------------------------

@query(
    "op-parquet-corrupt-isolation",
    oracle="SELECT doc_id, lang, source FROM documents",
)
def q_parquet_corrupt_isolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-parquet-corrupt-isolation: a truncated parquet object among good
    files must be SKIPPED (ignoreCorruptFiles), not fail the scan — rows
    from every intact file survive. Fixture: the documents table rewritten
    as parquet + one garbage '.parquet' file; the oracle is the intact
    content (sources/parquet_source.py scan_parquet_lenient)."""
    from .sources.parquet_source import scan_parquet_lenient

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    out = os.path.join(_SCRATCH, "corrupt_parquet")
    shutil.rmtree(out, ignore_errors=True)
    docs.coalesce(2).write.parquet(out)
    with open(os.path.join(out, "part-junk.parquet"), "wb") as f:
        f.write(b"PAR1 this is not a real parquet footer")
    return scan_parquet_lenient(spark, out, schema=docs.schema)


# ---------------------------------------------------------------------
# op-lateral-topk: correlated LATERAL subquery (per-row top-N)
# ---------------------------------------------------------------------

_LATERAL_SQL = """
    SELECT n.n_name, t.c_name, round(t.c_acctbal, 2) AS acctbal
    FROM nation n, LATERAL (
      SELECT c_name, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name LIMIT 2
    ) t
"""


@query("op-lateral-topk", oracle=_LATERAL_SQL)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-lateral-topk: top-2 customers per nation via a correlated
    LATERAL subquery — the SQL-surface twin of the window row_number
    top-k (op-window-topk). Catalyst decorrelates the lateral into a
    ranked join (no per-row re-execution); the SAME SQL text runs on
    DuckDB (with canonical table names), so the query is its own oracle.
    The Spark run substitutes per-call UNIQUE view names — registering
    the lake-table names themselves raced concurrent SQL-surface queries
    in one session (r10 ADVICE: register→drop of a shared name)."""
    import re as _re

    vn = _unique_view(_t(spark, sf_dir, "nation"), "nation")
    vc = _unique_view(_t(spark, sf_dir, "customer"), "customer")
    sql = _re.sub(r"\bnation\b", vn, _LATERAL_SQL)
    sql = _re.sub(r"\bcustomer\b", vc, sql)
    out = spark.sql(sql)
    # analyzed eagerly — drop both (unique, so the drop is race-free)
    spark.catalog.dropTempView(vn)
    spark.catalog.dropTempView(vc)
    return out


# ---------------------------------------------------------------------
# op-map-funcs: MapType construction / merge / filter / explode
# ---------------------------------------------------------------------

@query(
    "op-map-funcs",
    oracle="""
    WITH per AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY 1, 2)
    SELECT user_id, event_type, n,
           CAST(n >= 10 AS BOOLEAN) AS hot
    FROM per
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-map-funcs: per-user event-type histogram carried as a MapType
    column — map_from_entries(collect_list(struct)) builds it in one agg,
    transform_values derives a flag map, map_filter/map_concat compose,
    and explode(map) flattens back to rows for the oracle (DuckDB has no
    comparable MAP aggregation surface, so the canonical form is the
    exploded one; the map is the engine-side artifact a feature store
    would keep)."""
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    maps = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("hist")
    )
    flagged = maps.withColumn(
        "hot_map", F.transform_values("hist", lambda k, v: v >= 10)
    )
    return flagged.select(
        "user_id",
        F.explode(
            F.map_zip_with(
                "hist", "hot_map", lambda k, n, hot: F.struct(n.alias("n"), hot.alias("hot"))
            )
        ).alias("event_type", "nh"),
    ).select(
        "user_id", "event_type", F.col("nh.n").alias("n"), F.col("nh.hot").alias("hot")
    )


# ---------------------------------------------------------------------
# op-domain-temperature: temperature-scaled training mixture
# ---------------------------------------------------------------------

@query(
    "op-domain-temperature",
    oracle="""
    WITH sizes AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
    q AS (
      SELECT source,
             least(n, CAST(round(200 * pow(n, 0.7) / sum(pow(n, 0.7)) OVER ())
                           AS BIGINT)) AS k
      FROM sizes),
    ranked AS (
      SELECT doc_id, source, lang,
             row_number() OVER (
               PARTITION BY source
               ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn
      FROM documents)
    SELECT r.doc_id, r.source, r.lang
    FROM ranked r JOIN q USING (source) WHERE r.rn <= q.k
    """,
)
def q_domain_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-domain-temperature: compose a 200-row training mix with T=0.7
    domain rebalancing (share^0.7 — upsamples tail domains relative to
    their raw share, the standard multilingual mixing rule). Deterministic
    hash-order membership means the SQL twin reproduces the exact row set
    (operators/sampling.py temperature_mix)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    from .operators.sampling import temperature_mix

    return temperature_mix(
        docs, "source", "doc_id", temperature=0.7, target_rows=200
    ).select("doc_id", "source", "lang")


# ---------------------------------------------------------------------
# op-hll-merge: persisted sketch rollup (incremental cardinality)
# ---------------------------------------------------------------------

@query(
    "op-hll-merge",
    oracle="""
    SELECT CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           count(DISTINCT user_id) AS n_exact,
           true AS within_tol
    FROM events
    """,
)
def q_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-hll-merge: per-DAY Datasketches-HLL sketches (hll_sketch_agg)
    union-merged into a global distinct-user estimate (hll_union_agg →
    hll_sketch_estimate), tolerance-gated against the exact count.

    This is the INCREMENTAL form of count-distinct at 100 TB: each day's
    binary sketch is a few KB that a nightly job materializes once; any
    date-range cardinality is then a sketch union over the range — no
    rescan of the raw events, and the union is associative so it
    parallelizes/merges map-side. (op-approx-distinct demonstrates the
    one-shot estimate; this demonstrates sketch REUSE across partitions,
    which is why warehouses persist sketch columns.)"""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_est"),
    )
    exact = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    return merged.crossJoin(exact).select(
        "n_days",
        "n_exact",
        (F.abs(F.col("n_est") - F.col("n_exact")) <= 0.05 * F.col("n_exact")).alias(
            "within_tol"
        ),
    )


# ---------------------------------------------------------------------
# op-stream-datasource-pages: custom Python DataSource as a STREAM source
# ---------------------------------------------------------------------

@query(
    "op-stream-datasource-pages",
    oracle="SELECT doc_id, lang, source FROM documents",
)
def q_stream_datasource_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The page_json plugin source consumed as a STREAM
    (sources/page_datasource.py PageStreamReader): new page files become
    micro-batches, the offset is the last processed filename (monotonic
    page names — the reference's sequential downloader contract), and a
    corrupt page isolates as a filtered _corrupt_path row instead of
    killing the stream. Drained to completion with AvailableNow; result
    must equal the batch scan of the same pages (the op-datasource-pages /
    op-json-scan oracle)."""
    from pyspark.sql import types as T

    from .session import ship_package
    from .sources.page_datasource import (
        CORRUPT_PATH_COL,
        PageFileDataSource,
        with_corrupt_col,
        write_page_fixture,
    )
    from .streaming.events import run_available_now

    ship_package(spark)
    spark.dataSource.register(PageFileDataSource)
    docs = [
        r.asDict()
        for r in _t(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source")
        .collect()
    ]
    out = os.path.join(_SCRATCH, "datasource_pages_stream")
    write_page_fixture(docs, out)
    record = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ])
    raw = (
        spark.readStream.format("page_json")
        .schema(with_corrupt_col(record))
        .option("path", out)
        .load()
    )
    clean = raw.filter(F.col(CORRUPT_PATH_COL).isNull()).drop(CORRUPT_PATH_COL)
    return run_available_now(clean, output_mode="append")


# ---------------------------------------------------------------------
# op-stream-sliding-window: hopping-window streaming aggregation
# ---------------------------------------------------------------------

@query(
    "op-stream-sliding-window",
    oracle="""
    SELECT window_start, event_type, count(*) AS n,
           round(sum(value), 2) AS total
    FROM (
      SELECT unnest([time_bucket(INTERVAL 30 MINUTE, ts),
                     time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE
                    ]) AS window_start,
             event_type, value
      FROM events) t
    GROUP BY 1, 2
    """,
)
def q_stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-stream-sliding-window: 1 h windows hopping every 30 min, executed
    AS A STREAMING QUERY (watermarked state, Trigger.AvailableNow) — every
    event lands in exactly 2 windows; the DuckDB twin unnests each row into
    its two epoch-aligned window starts. Spark's window() and DuckDB's
    time_bucket both align hops to the epoch, so window_start matches
    value-for-value."""
    from .streaming import events as sev

    stream = sev.read_events_stream(spark, sf_dir)
    return sev.run_available_now(
        sev.windowed_agg(stream, window="1 hour", slide="30 minutes")
    )
