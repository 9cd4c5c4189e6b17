"""Cleaning / coercion operators (SURVEY.md §2.2–2.3).

Each operator is a pure ``DataFrame -> DataFrame`` function built from
``pyspark.sql.functions`` only — JVM-side, whole-stage-codegen'd, no UDFs —
so Catalyst can push projections/filters into the parquet scan and keep the
whole chain in one codegen stage.

Reference semantics mirrored (citations into /root/reference):
- cast_int             ~ proj-eng-dados/main.py:143-144 (``astype(int)``)
- cast_nullable_int    ~ main.py:229-231 (``pd.to_numeric(errors='coerce').astype('Int64')``)
- numeric_coerce_fillna~ main.py:212-213 (``pd.to_numeric(errors='coerce').fillna(0)``)
- parse_date           ~ main.py:252-253 (``pd.to_datetime(errors='coerce')``)
- upper_trim           ~ main.py:216-226 (``astype(str).str.upper().str.strip()``)
- rename               ~ main.py:306 (``rename(columns=...)``)

Semantic delta (documented in SURVEY.md §7): pandas ``astype(str)`` turns
null into the literal string before upper/trim; we keep null-preserving
semantics (``upper(trim(NULL)) -> NULL``), which is what the DuckDB oracle
computes too.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cast_int(df: DataFrame, cols: Iterable[str]) -> DataFrame:
    """Strict int cast for partition-key columns (null rows would fail the
    reference's ``astype(int)``; Spark casts null→null, DQ gate catches it)."""
    return df.withColumns({c: F.col(c).cast("int") for c in cols})


def cast_nullable_int(df: DataFrame, cols: Iterable[str]) -> DataFrame:
    """Coercing int cast: unparseable → null (pandas ``errors='coerce'``)."""
    return df.withColumns({c: F.col(c).try_cast("int") for c in cols})


def numeric_coerce_fillna(df: DataFrame, col: str, fill: float = 0.0) -> DataFrame:
    """``to_numeric(errors='coerce').fillna(fill)`` as one null-safe expression."""
    return df.withColumn(
        col, F.coalesce(F.col(col).try_cast("double"), F.lit(float(fill)))
    )


def numeric_coerce_fillna_expr(col: Column, fill: float = 0.0) -> Column:
    """Expression form, for use inside wider selects."""
    return F.coalesce(col.try_cast("double"), F.lit(float(fill)))


def parse_date(df: DataFrame, cols: Iterable[str], fmt: str = "yyyy-MM-dd") -> DataFrame:
    """Coercing date parse: unparseable → null. ``try_to_date`` (not
    ``to_date``) because under ANSI mode ``to_date`` raises on bad input;
    the reference's ``errors='coerce'`` semantics are null-on-failure."""
    return df.withColumns({c: F.try_to_date(F.col(c), fmt) for c in cols})


def upper_trim(df: DataFrame, cols: Iterable[str]) -> DataFrame:
    """Text standardization over name columns; null-preserving (see module doc)."""
    return df.withColumns({c: F.upper(F.trim(F.col(c))) for c in cols})


def rename(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Column rename (main.py:306)."""
    return df.withColumnsRenamed(mapping)


# --- guards (SURVEY.md §2.2 op-col-presence-guard / op-empty-guard) -------

class MissingColumnsError(ValueError):
    """Raised when a stage's required columns are absent (main.py:135-139, 295-298)."""


def require_columns(df: DataFrame, required: Iterable[str]) -> DataFrame:
    """Fail-fast schema guard. Pure metadata check — no job is triggered."""
    missing = sorted(set(required) - set(df.columns))
    if missing:
        raise MissingColumnsError(f"missing required columns: {missing}")
    return df


def is_empty(df: DataFrame) -> bool:
    """Empty-input guard (main.py:110-112, 203-205). ``isEmpty`` scans at most
    one partition's first row — O(1), not a full count."""
    return df.isEmpty()
