"""Corpus-quality batch 4: LM scoring, model-based filtering, URL plumbing,
per-group sampling, and stream-static enrichment.

Five operators a production training-data pipeline runs between crawl and
tokenizer that the earlier batches don't cover:

- op-lm-score: CCNet-style unigram language-model surprisal — train token
  frequencies on the corpus itself, score every document by its mean
  negative log-probability. The standard "too weird to train on" filter.
- op-quality-classifier: a hashed linear text classifier (fastText shape:
  token → hashed weight → sum). The weights here are a deterministic hash
  function of the token (a real model would broadcast learned weights —
  same plan, different constants), and the score stays in exact integer
  milli-units so both engines agree bit-for-bit.
- op-url-parse: URL synthesis→normalization→registrable-domain extraction
  →blocklist filter — the metadata spine of any crawl pipeline. URLs are
  derived deterministically from (source, doc_id, lang) since the testdata
  has no URL column; the parsing/filtering plumbing is the operator.
- op-sample-pergroup: deterministic k-per-group subsampling (the "cap any
  one domain's contribution" step) via portable Knuth-hash ordering — no
  engine RNG, rerun-stable, one window shuffle.
- op-stream-static-join: streaming fact enriched by a broadcast static
  dimension (events ⨝ customer → per-segment totals), executed as a real
  stream (AvailableNow) and compared against the batch join — the
  canonical enrichment topology Structured Streaming runs without extra
  state (the static side is just a broadcast per micro-batch).

Float discipline (round-1 rules): op-lm-score is the only float output —
ln() may differ in the last ulp between engines, so the mean surprisal is
rounded to 4dp (drift ~1e-14 vs quantum 1e-4); everything else is exact
integers/strings. Token splits share `dedup.tokens_expr` and its DuckDB
twin `regexp_split_to_array(lower(trim(text)), '\\s+')`.

Reference parity: the reference (proj-eng-dados/main.py) has no corpus
surface; these extend SURVEY §2.9's training-data mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _t, query

_TOKS_SQL = "regexp_split_to_array(lower(trim(text)), '\\s+')"


# ---------------------------------------------------------------------
# op-lm-score: unigram LM surprisal (CCNet-style quality filter)
# ---------------------------------------------------------------------

@query(
    "op-lm-score",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    toks_f AS (SELECT * FROM toks WHERE tok <> ''),
    counts AS (SELECT tok, count(*) AS c FROM toks_f GROUP BY tok),
    total AS (SELECT count(*) AS t FROM toks_f)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(-ln(c * 1.0 / t)), 4) AS avg_surprisal
    FROM toks_f JOIN counts USING (tok), total
    GROUP BY doc_id
    """,
)
def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram LM perplexity filter: ONE tokenize+explode pass feeds both
    the frequency training (token groupBy — shuffle 1) and the scoring
    join. The trained table is vocabulary-sized (bounded: ~10^6-10^7 rows
    even at 100 TB after min-count pruning), so it is persisted once and
    BROADCASTS back onto the exploded tokens — scoring costs no second
    shuffle — and the corpus total is summed from the CACHED vocabulary
    (one tiny job), never by rescanning the corpus. The raw corpus is
    tokenized exactly twice (train pass + scoring probe); the per-doc
    mean is the only remaining aggregation (shuffle 2, on doc_id)."""
    from .operators.dedup import tokens_expr
    from .session import fan_out

    docs = fan_out(_t(spark, sf_dir, "documents"))
    toks = (
        docs.select("doc_id", F.explode_outer(tokens_expr("text")).alias("tok"))
        .filter(F.col("tok").isNotNull() & (F.col("tok") != ""))
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).persist()
    total = counts.agg(F.sum("c").alias("t"))
    return (
        toks.join(F.broadcast(counts), "tok")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(-F.log(F.col("c") * 1.0 / F.col("t"))), 4).alias(
                "avg_surprisal"
            ),
        )
    )


# ---------------------------------------------------------------------
# op-quality-classifier: hashed linear model, exact integer score
# ---------------------------------------------------------------------

@query(
    "op-quality-classifier",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    weighted AS (
        SELECT doc_id,
               CAST((length(tok) * 2654435761 + ascii(tok) * 97) % 1001
                    AS BIGINT) - 500 AS w_milli
        FROM toks WHERE tok <> ''
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(w_milli) AS BIGINT) AS score_milli,
           sum(w_milli) > 0 AS keep
    FROM weighted GROUP BY doc_id
    """,
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filter, fastText topology: token → weight →
    per-doc sum → threshold. Weights come from a deterministic hash of
    the token (length × Knuth constant + first-codepoint, mod 1001,
    centered) — the engine-portable stand-in for a learned weight table;
    swapping in real weights is a broadcast join against the same
    exploded tokens, identical plan. Entirely row-local until the single
    per-doc aggregation; the score stays in integer milli-units (no
    float division) so keep/drop decisions are bit-stable across
    engines. Both operands are non-negative, so Spark's pmod and
    DuckDB's % agree."""
    from .operators.dedup import tokens_expr
    from .session import fan_out

    docs = fan_out(_t(spark, sf_dir, "documents"))
    toks = (
        docs.select("doc_id", F.explode_outer(tokens_expr("text")).alias("tok"))
        .filter(F.col("tok").isNotNull() & (F.col("tok") != ""))
    )
    w_milli = (
        F.pmod(
            F.length("tok") * F.lit(2654435761) + F.ascii("tok") * F.lit(97),
            F.lit(1001),
        ).cast("long")
        - 500
    )
    return (
        toks.select("doc_id", w_milli.alias("w_milli"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w_milli").alias("score_milli"),
            (F.sum("w_milli") > 0).alias("keep"),
        )
    )


# ---------------------------------------------------------------------
# op-url-parse: URL normalization + registrable domain + blocklist
# ---------------------------------------------------------------------

@query(
    "op-url-parse",
    oracle="""
    WITH urls AS (
        SELECT doc_id,
               'https://www.' || source || '.example.com/docs/' || doc_id
                 || '?ref=' || lang AS url
        FROM documents
    ),
    parsed AS (
        SELECT doc_id, url,
               split_part(split_part(url, '//', 2), '/', 1) AS host,
               '/' || split_part(split_part(split_part(url, '//', 2), '?', 1),
                                 '/', 2)
                 || '/' || split_part(split_part(url, '?', 1), '/', -1)
                 AS path,
               split_part(url, '?', 2) AS query,
               regexp_extract(split_part(split_part(url, '//', 2), '/', 1),
                              '([^.]+\\.[^.]+)$', 1) AS domain
        FROM urls
    )
    SELECT doc_id, host, path, query, domain
    FROM parsed
    WHERE host NOT IN ('www.src13.example.com', 'www.src7.example.com')
    """,
)
def q_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-metadata plumbing: build the canonical URL, split it into
    host/path/query with Spark's JVM parse_url (the oracle re-derives the
    same pieces with split_part — the gate proves parse_url's semantics
    on this shape), extract the registrable domain with a shared regex,
    and drop blocklisted hosts. Pure row-local projection — zero
    shuffles; the blocklist is a literal IN (a real pipeline broadcasts
    a blocklist table into a left-anti join — same row-local plan)."""
    docs = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://www."), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?ref="), F.col("lang"),
    )
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    return (
        docs.select("doc_id", url.alias("url"))
        .withColumn("host", host)
        .withColumn("path", F.parse_url(F.col("url"), F.lit("PATH")))
        .withColumn("query", F.parse_url(F.col("url"), F.lit("QUERY")))
        .withColumn(
            "domain", F.regexp_extract(F.col("host"), r"([^.]+\.[^.]+)$", 1)
        )
        .filter(
            ~F.col("host").isin("www.src13.example.com", "www.src7.example.com")
        )
        .select("doc_id", "host", "path", "query", "domain")
    )


# ---------------------------------------------------------------------
# op-sample-pergroup: deterministic k-per-group cap
# ---------------------------------------------------------------------

@query(
    "op-sample-pergroup",
    oracle="""
    SELECT doc_id, source FROM documents
    QUALIFY row_number() OVER (
        PARTITION BY source
        ORDER BY (doc_id * 2654435761) % 4294967296, doc_id
    ) <= 5
    """,
)
def q_sample_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain contribution cap: keep a deterministic pseudo-random 5
    docs per source. Ordering by the Knuth multiplicative hash of doc_id
    (mod 2^32) is the engine-portable shuffle — rerun-stable, no RNG, no
    bias toward low ids. One hash-partition exchange on source feeds the
    row_number window; Spark's WindowGroupLimit pushes the <=5 into the
    partial sort, so no group ever fully sorts."""
    docs = _t(spark, sf_dir, "documents")
    h = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(4294967296))
    w = Window.partitionBy("source").orderBy(h, "doc_id")
    return (
        docs.select("doc_id", "source")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )


# ---------------------------------------------------------------------
# op-stream-static-join: streaming fact ⨝ broadcast static dimension
# ---------------------------------------------------------------------

@query(
    "op-stream-static-join",
    oracle="""
    SELECT c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY 1
    """,
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the events STREAM joins the static
    customer dimension (broadcast — re-evaluated per micro-batch, no
    join state kept), then aggregates per market segment; executed to
    completion with AvailableNow and compared against the batch join.
    This is the standard streaming enrichment topology — only the
    aggregation holds state, the dimension never does. Value sums ride
    exact integer cents."""
    from .streaming import events as sev

    stream = sev.read_events_stream(spark, sf_dir)
    dim = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    enriched = stream.join(F.broadcast(dim), stream.user_id == dim.c_custkey)
    agg = enriched.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(F.round(F.col("value") * 100).cast("long")) / F.lit(100.0)).alias(
            "total_value"
        ),
    )
    return sev.run_available_now(agg)
