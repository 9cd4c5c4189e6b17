"""Relational batch 8: recursive CTEs, native XML, parameterized SQL,
collations (Spark 4.1 SQL surfaces).

- op-recursive-cte: WITH RECURSIVE hierarchy walk — Spark 4.1 runs the
  SAME SQL text DuckDB does (the oracle is byte-identical modulo
  dialect-neutral syntax). Engine note: for the near-dup clustering at
  100 TB the iterative `dedup.connected_components` (localCheckpoint per
  round) remains the scale path; the recursive CTE is the right tool for
  BOUNDED-depth hierarchies (org charts, BOMs, referral chains).
- op-xml-roundtrip: the native XML source/sink (rowTag records) — write
  a table out as XML shards, scan them back distributed, prove content
  parity. The remaining file format the engine had not round-tripped
  (CSV/ORC/NDJSON/parquet elsewhere).
- op-sql-params: parameterized `spark.sql(..., args=...)` — named-bind
  literals without string interpolation (the injection-safe API a
  query service fronts the engine with).
- op-collation: UTF8_LCASE collation — case-insensitive equality/grouping
  as a COLUMN TYPE property instead of lower() rewrites; the oracle IS
  the lower() rewrite, proving the collation semantics.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _SCRATCH, _t, _unique_view, query


# ---------------------------------------------------------------------
# op-recursive-cte: bounded hierarchy walk
# ---------------------------------------------------------------------

_RECURSIVE_SQL = """
    WITH RECURSIVE chain(c_custkey, root, depth) AS (
        SELECT c_custkey, c_custkey AS root, 0 AS depth
        FROM customer WHERE c_custkey < 8
        UNION ALL
        SELECT c.c_custkey, chain.root, chain.depth + 1
        FROM customer c JOIN chain ON c.c_custkey // 8 = chain.c_custkey
        WHERE chain.depth < 4
    )
    SELECT root, depth, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(c_custkey) AS BIGINT) AS sum_keys
    FROM chain GROUP BY root, depth
"""


@query("op-recursive-cte", oracle=_RECURSIVE_SQL)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE over a synthesized referral tree (parent(k) = k div
    8 over customer keys, roots < 8): each customer descends from a
    sub-8 root in <= 4 hops; the walk labels every node with (root,
    depth). Spark 4.1 executes the recursion as iterated union steps —
    per-step plans are ordinary joins, so broadcast/pushdown apply
    per round. The oracle is the IDENTICAL query text in DuckDB. For
    unbounded-diameter graphs use dedup.connected_components instead
    (this recursion is depth-capped by construction)."""
    import re as _re

    # per-call UNIQUE view name: registering "customer" itself raced
    # concurrent SQL-surface queries in one session (r10 ADVICE — B drops
    # the shared name before A's spark.sql analyzes); the oracle keeps the
    # canonical name, the Spark text substitutes the unique one
    v = _unique_view(_t(spark, sf_dir, "customer"), "customer")
    # one dialect token differs: integer division is `//` in DuckDB and
    # `div` in Spark (`/` is fractional in BOTH — a bare `/` would break
    # the parent join the same way in each engine)
    sql = _re.sub(r"\bcustomer\b", v, _RECURSIVE_SQL.replace("// 8", "div 8"))
    out = spark.sql(sql)
    spark.catalog.dropTempView(v)  # analyzed eagerly; unique → race-free
    return out


# ---------------------------------------------------------------------
# op-xml-roundtrip: native XML source/sink
# ---------------------------------------------------------------------

@query(
    "op-xml-roundtrip",
    oracle="""
    SELECT lang, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
)
def q_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML round trip: documents land as rowTag-framed XML shards
    (distributed write), scan back with an explicit schema (no inference
    pass), aggregate — values must survive markup framing exactly.
    XML is row-splittable on the rowTag, so the scan parallelizes like
    any text format; schema declaration keeps types deterministic."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    out = os.path.join(_SCRATCH, "xml_roundtrip")
    shutil.rmtree(out, ignore_errors=True)
    docs.write.format("xml").option("rowTag", "doc").save(out)
    back = (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .schema("doc_id long, lang string, n_chars long")
        .load(out)
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


# ---------------------------------------------------------------------
# op-sql-params: named-parameter SQL binding
# ---------------------------------------------------------------------

@query(
    "op-sql-params",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
           -- NO re-CAST around the sum: BIGINT / 100.0 routes DuckDB into
           -- DECIMAL division (100.0 parses as DECIMAL) whose result
           -- converts to float64 one ulp off Spark's double division at
           -- sf1 magnitudes; leaving the sum as HUGEINT keeps the /100.0
           -- on the double path, bit-identical to Spark (same form as
           -- op-rollup / op-orc-orders-roundtrip, both sf1-green)
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total
    FROM orders
    WHERE o_totalprice >= 50000.0 AND o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def q_sql_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL: the threshold and status arrive as NAMED BINDS
    (`spark.sql(..., args=...)`), not string interpolation — the
    injection-safe front door for a query service. Catalyst folds the
    bound literals before optimization, so pushdown/pruning see plain
    constants (identical plan to the inlined form the oracle uses)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_p")
    out = spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n,
               -- CAST(100 AS DOUBLE): in Spark SQL text `100.0` parses as
               -- DECIMAL(4,1), routing this into decimal division whose
               -- 6-scale result formats one ulp off DuckDB's double
               -- division at sf1 magnitudes; the PySpark-API twin queries
               -- (op-rollup et al.) get double division from the Python
               -- float literal automatically
               sum(CAST(round(o_totalprice * 100) AS BIGINT))
                 / CAST(100 AS DOUBLE) AS total
        FROM orders_p
        WHERE o_totalprice >= :min_price AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"min_price": 50000.0, "status": "F"},
    )
    spark.catalog.dropTempView("orders_p")  # resolved into the plan above
    return out


# ---------------------------------------------------------------------
# op-collation: case-insensitive semantics as a type property
# ---------------------------------------------------------------------

@query(
    "op-collation",
    oracle="""
    SELECT lower(CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                      ELSE c_mktsegment END) AS segment,
           CAST(count(*) AS BIGINT) AS n
    FROM customer GROUP BY 1
    """,
)
def q_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTF8_LCASE collation: a mixed-case segment column (half the rows
    lowercased) groups case-insensitively because the COLUMN carries the
    collation — no lower() scattered through the query. Comparisons,
    joins, and aggregations all inherit the semantics from the type; the
    oracle is the classic lower() rewrite. Output is normalized to
    lowercase on both sides (group keys under a collation keep an
    arbitrary representative casing)."""
    cust = _t(spark, sf_dir, "customer")
    mixed = F.when(
        F.col("c_custkey") % 2 == 0, F.lower("c_mktsegment")
    ).otherwise(F.col("c_mktsegment"))
    return (
        cust.select(F.collate(mixed, "UTF8_LCASE").alias("segment"))
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lower(F.collate("segment", "UTF8_BINARY")).alias("segment"), "n")
    )
