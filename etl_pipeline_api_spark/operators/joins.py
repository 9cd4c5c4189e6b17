"""Join strategies beyond the optimizer's defaults (scale toolkit).

The reference has no joins at all (SURVEY.md §2.7); Spark gives the engine
broadcast/shuffle-hash/sort-merge natively, and AQE rebalances skewed
shuffle joins at runtime. This module adds the one pattern that still needs
explicit code at 100 TB: SALTING, for when a handful of hot keys overwhelm
a single reducer even under AQE (e.g. the null-key/celebrity-key problem on
a fact-to-dim join whose dim side is too big to broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: scatter each fact row into one of ``salt``
    sub-partitions of its key; replicate every dim row across all ``salt``
    sub-keys. The shuffle key becomes (key, salt) — a hot key's rows spread
    over ``salt`` reducers instead of one.

    Result is EXACTLY the plain ``facts.join(dim, key, how)`` (any salt
    assignment is correct — it only changes data placement), which is what
    the oracle checks. Cost: dim side is duplicated ``salt``× — use for
    mid-size dims that don't fit a broadcast but are far smaller than the
    fact table; for broadcast-able dims use broadcast, for mild skew let
    AQE's skew-join splitting handle it.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (dim-side fanout)")
    fact_salt = F.pmod(F.xxhash64(*[F.col(c) for c in facts.columns]), F.lit(salt))
    salted_f = facts.withColumn("__salt", fact_salt)
    salted_d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return salted_f.join(salted_d, [key, "__salt"], how).drop("__salt")
