"""Scalar-function surface (SURVEY.md §2.8).

The reference's complete scalar vocabulary — upper, trim, numeric/int casts,
date parse, round, sum/mean/min/max/count/nunique, between, comparisons,
isna/fillna — each maps 1:1 onto a built-in ``pyspark.sql.functions``
expression (nothing needs a UDF). This module re-exports the engine's
expression-level helpers so users have one import point for the scalar
surface; DataFrame-level operators live in ``..operators``.
"""

from pyspark.sql import functions as F

from ..operators.cleaning import numeric_coerce_fillna_expr
from ..operators.dedup import tokens_expr
from ..operators.sampling import det_key
from ..operators.text import (
    BPE_ISH,
    FP_BASE,
    FP_MOD,
    PII_EMAIL,
    PII_IPV4,
    PII_PHONE,
    pii_clean_col,
    repetition_cols,
)


def upper_trim_expr(col) -> "F.Column":
    """upper(trim(col)), null-preserving (main.py:216-226 semantics)."""
    return F.upper(F.trim(col))


def try_int_expr(col) -> "F.Column":
    """Coercing int cast, null on failure (main.py:229-231 semantics)."""
    return col.try_cast("int")


def try_date_expr(col, fmt: str = "yyyy-MM-dd") -> "F.Column":
    """Coercing date parse (main.py:252-253 semantics)."""
    return F.try_to_date(col, fmt)


__all__ = [
    "numeric_coerce_fillna_expr",
    "det_key",
    "pii_clean_col",
    "repetition_cols",
    "PII_EMAIL",
    "PII_PHONE",
    "PII_IPV4",
    "tokens_expr",
    "upper_trim_expr",
    "try_int_expr",
    "try_date_expr",
    "BPE_ISH",
    "FP_BASE",
    "FP_MOD",
]
