"""Relational batch 7: VariantType semi-structured access, Python UDTF
seam, and hidden-metadata file lineage.

- op-variant-json: Spark 4's VariantType path for semi-structured data —
  ``parse_json`` once into the binary variant encoding, then typed
  ``variant_get`` extractions (nested object field, array index, and the
  real ``events.props`` payload). Variant decodes the JSON text ONCE and
  shreds lazily per extraction, vs. ``get_json_object`` re-parsing the
  string per call (op-json-funcs pins that older path). The oracle
  recomputes every extraction from the source columns directly, so the
  whole encode→shred round trip is what's being verified.
- op-udtf-chunk: the document chunker as a Python UDTF (Spark 4's
  table-function seam) — SAME oracle as op-doc-chunk, so the gate proves
  the Python table function and the JVM zip_with/slice pipeline agree
  row-for-row. The JVM form stays the production path (UDTFs are the
  slow path; this exists to pin the extension point and its semantics).
- op-file-lineage: per-file row provenance via the hidden ``_metadata``
  struct — the zero-cost lineage column every audit/debug workflow
  reaches for. Rows-only (file names are engine-internal);
  `tests/test_rel7.py` pins multi-file behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _t, query


# ---------------------------------------------------------------------
# op-variant-json: typed extraction through the variant encoding
# ---------------------------------------------------------------------

@query(
    "op-variant-json",
    oracle="""
    SELECT event_id,
           user_id AS uid,
           event_type AS mtype,
           value * 2 AS v2,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VariantType round trip: a nested payload (object + array) is built
    with to_json, parsed ONCE into variant, and read back with typed
    variant_get paths — plus the same extraction over the table's real
    JSON column. The oracle derives every output straight from the
    source columns, so any loss in encode→shred round-trips fails the
    gate. Row-local, zero shuffle; v2 = value*2 is exact in IEEE (no
    rounding needed)."""
    ev = _t(spark, sf_dir, "events")
    payload = F.to_json(
        F.struct(
            F.col("event_id").alias("id"),
            F.struct(
                F.col("event_type").alias("type"), F.col("user_id").alias("uid")
            ).alias("meta"),
            F.array(F.col("value"), F.col("value") * 2).alias("vals"),
        )
    )
    v = F.parse_json(payload)
    pv = F.parse_json(F.col("props"))
    return ev.select(
        "event_id",
        F.variant_get(v, "$.meta.uid", "bigint").alias("uid"),
        F.variant_get(v, "$.meta.type", "string").alias("mtype"),
        F.variant_get(v, "$.vals[1]", "double").alias("v2"),
        F.variant_get(pv, "$.k", "bigint").alias("k_val"),
    )


# ---------------------------------------------------------------------
# op-udtf-chunk: the chunker through the Python UDTF seam
# ---------------------------------------------------------------------

@query(
    "op-udtf-chunk",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents),
    c AS (
      SELECT doc_id, CAST(len(toks) AS INT) AS n_tok,
             list_transform(
               generate_series(0,
                 CAST(ceil(greatest(len(toks) - 16, 1) / 48.0) AS INT) - 1),
               j -> array_to_string(toks[j*48+1 : j*48+64], ' ')) AS chunks
      FROM tok),
    u AS (
      SELECT doc_id, n_tok,
             CAST(unnest(generate_series(0, len(chunks)-1)) AS INT) AS chunk_id,
             unnest(chunks) AS chunk_text
      FROM c)
    SELECT doc_id, chunk_id, chunk_text,
           CAST(least(64, n_tok - chunk_id * 48) AS INT) AS n_chunk_tokens
    FROM u
    """,
)
def q_udtf_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 64/16 sliding-window chunker as a Python UDTF, lateral-joined
    in SQL — byte-identical to op-doc-chunk's JVM pipeline (they share
    this oracle). One row in, ceil((n−16)/48) rows out, per-partition
    Python workers, no shuffle. Kept as the seam exemplar: when per-row
    fan-out logic genuinely can't be a generator expression (stateful
    tokenizers, model-based splitters), THIS is the shape it takes."""
    import math
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: long, chunk_id: int, chunk_text: string, "
                     "n_chunk_tokens: int")
    class ChunkDocs:
        def eval(self, doc_id, text):
            toks = re.split(r"\s+", (text or "").strip(" ").lower())
            n_tok = len(toks)
            n_chunks = math.ceil(max(n_tok - 16, 1) / 48.0)
            for j in range(int(n_chunks)):
                window = toks[j * 48 : j * 48 + 64]
                yield doc_id, j, " ".join(window), min(64, n_tok - j * 48)

    spark.udtf.register("chunk_udtf", ChunkDocs)
    _t(spark, sf_dir, "documents").createOrReplaceTempView("docs_for_udtf")
    out = spark.sql(
        "SELECT s.doc_id, s.chunk_id, s.chunk_text, s.n_chunk_tokens "
        "FROM docs_for_udtf, LATERAL chunk_udtf(doc_id, text) s"
    )
    spark.catalog.dropTempView("docs_for_udtf")  # resolved into the plan
    return out


# ---------------------------------------------------------------------
# op-file-lineage: hidden _metadata provenance
# ---------------------------------------------------------------------

@query(
    "op-file-lineage",
    oracle="""
    SELECT 'lineitem.parquet' AS file_name,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    HAVING count(*) > 0
    """,
)
def q_file_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source-file row counts via the hidden `_metadata` struct — free
    provenance on every file-based scan (no extra column stored, the
    reader injects it). The audit primitive for 'which input file
    produced these bad rows'. The driver testdata ships each table as ONE
    parquet file, so the oracle can pin both the surfaced file name and
    its row count (scale-free — holds at every sf dir); multi-file
    semantics are pinned in tests/test_rel7.py over a sharded write.
    Lineage lists files that CONTRIBUTED SCANNED ROWS — `_metadata` rides
    on rows, so a zero-row file is invisible to it; the oracle's HAVING
    mirrors that (r10 all-empty fuzz)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(F.col("_metadata.file_name").alias("file_name"))
        .groupBy("file_name")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("file_name")
    )
