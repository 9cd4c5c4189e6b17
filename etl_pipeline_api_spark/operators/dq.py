"""Data-quality suite (SURVEY.md §2.5).

The reference's ``run_data_quality_tests`` (proj-eng-dados/main.py:167-186)
evaluates 4 asserts with one full pandas pass EACH, and aborts the silver
stage on failure (main.py:234-239). Here the whole suite is ONE conditional
aggregation — a single scan producing per-check violation counts:

    agg(sum(when(violation, 1).otherwise(0)) for each check)

At 100 TB that is one map-side pass with an O(#checks)-wide 1-row result —
no shuffle of data rows at all. Checks are (name, violation-predicate) pairs,
so the suite is extensible beyond the reference's four.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .cleaning import require_columns


class DataQualityError(AssertionError):
    """Raised by the gate when any check has violations (main.py:234-239)."""

    def __init__(self, violations: dict[str, int]):
        self.violations = violations
        super().__init__(f"data-quality violations: {violations}")


@dataclass
class DQCheck:
    name: str
    violation: Column  # predicate that is TRUE for a BAD row

    def agg_expr(self) -> Column:
        # null predicate results (e.g. comparisons on null) count as violations
        # only for explicit isNull checks; otherwise nulls are not "in range"
        # failures in the reference either (pandas comparisons are null-false).
        return F.sum(
            F.when(self.violation, F.lit(1)).otherwise(F.lit(0))
        ).alias(self.name)


def not_null_check(col: str) -> DQCheck:
    """op-dq-not-null (main.py:178)."""
    return DQCheck(f"null_{col}", F.col(col).isNull())


def range_check(col: str, lo, hi) -> DQCheck:
    """op-dq-range (main.py:181: mes BETWEEN 1 AND 12)."""
    return DQCheck(f"range_{col}", ~F.col(col).between(lo, hi))


def non_negative_check(col: str) -> DQCheck:
    """op-dq-non-negative (main.py:184: valor >= 0)."""
    return DQCheck(f"negative_{col}", F.col(col) < 0)


@dataclass
class DQSuite:
    """Named checks + required columns, evaluated in one pass."""

    required_columns: list[str] = field(default_factory=list)
    checks: list[DQCheck] = field(default_factory=list)

    def violations_df(self, df: DataFrame) -> DataFrame:
        """Lazy 1-row DataFrame of violation counts (op-dq-* as a query)."""
        require_columns(df, self.required_columns)  # op-dq-col-exists
        if not self.checks:
            return df.agg(F.count(F.lit(1)).alias("n_rows"))
        return df.agg(*[c.agg_expr() for c in self.checks])

    def run(self, df: DataFrame) -> dict[str, int]:
        """Execute the suite; returns {check_name: violation_count}."""
        row = self.violations_df(df).collect()[0]
        return {k: int(v or 0) for k, v in row.asDict().items()}

    def gate(self, df: DataFrame) -> DataFrame:
        """Hard gate: raise DataQualityError if any violations; else pass the
        input through unchanged (so it composes into a pipeline stage between
        transform and write, exactly where main.py:234-239 sits)."""
        violations = {k: v for k, v in self.run(df).items() if v > 0}
        if violations:
            raise DataQualityError(violations)
        return df


def gastos_dq_suite() -> DQSuite:
    """The reference's exact suite (main.py:175-184) for gastos-shaped data."""
    return DQSuite(
        required_columns=["ano", "mes", "nome_orgao", "nome_favorecido"],
        checks=[
            not_null_check("ano"),
            not_null_check("mes"),
            not_null_check("nome_orgao"),
            not_null_check("nome_favorecido"),
            range_check("mes", 1, 12),
            non_negative_check("valor"),
        ],
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Snapshot diff (the change-data-feed shape): classify every key as
    ``added`` / ``removed`` / ``changed`` / ``unchanged`` between two
    table versions, comparing ``compare_cols`` null-safely.

    One co-partitioned full outer join on the key — both sides shuffle
    once on the same key (or zero shuffles if both snapshots are
    bucketed by it); the comparison is row-local. This is how you audit
    an incremental load or build a CDC feed when the table format
    doesn't provide one.

    Returns per-row ``(key_cols…, status)`` — aggregate downstream for
    counts, or filter ``status != 'unchanged'`` for the feed itself.

    Contract: ``key_cols`` must be UNIQUE within each snapshot — the
    keyed-diff precondition shared with SQL MERGE and Delta/Iceberg
    snapshot diffs. Under a duplicate key the outer join fans out to the
    per-key cross product (K_old × K_new rows; cross-pairs classify as
    ``changed``) — deterministic, but not a multiset diff. Not guarded
    at runtime: a uniqueness assertion would cost a full extra
    aggregation per diff at 100 TB; validate keys upstream with
    ``DQSuite`` if the source can't promise them (pinned in
    tests/test_fuzz_rel.py FUZZ_SKIP).
    """
    o = old.select(
        *key_cols,
        F.lit(True).alias("__o_present"),
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
    )
    n = new.select(
        *key_cols,
        F.lit(True).alias("__n_present"),
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
    )
    j = o.join(n, key_cols, "full_outer")
    # presence markers, not compare-col nulls: a row whose compare cols
    # are ALL null still exists on its side
    in_old = F.col("__o_present").isNotNull()
    in_new = F.col("__n_present").isNotNull()
    same = None
    for c in compare_cols:
        eq = F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
        same = eq if same is None else (same & eq)
    status = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(*key_cols, status.alias("status"))


def changelog_compact(
    changelog: DataFrame,
    key_cols: list[str],
    version_cols: list[str],
    op_col: str,
    payload_cols: list[str],
    delete_op: str = "D",
) -> DataFrame:
    """Apply a CDC changelog to produce the current snapshot — the
    inverse of :func:`table_diff` (which CONSTRUCTS a feed, this one
    CONSUMES it): latest version per key wins, a terminal delete
    removes the key.

    One map-combined ``max(struct(version…, op, payload…))`` per key is
    the whole operator — deliberately NOT a row_number window (which
    would sort every key group) nor an iterative apply: at 100 TB a
    changelog compaction is exactly an argmax-per-key shuffle, and the
    struct-max form partial-aggregates map-side so the exchange carries
    one row per key, not one per change. Version columns must form a
    total order per key (e.g. (ts, change_id)).
    """
    ver = [F.col(c).alias(f"__v{i}") for i, c in enumerate(version_cols)]
    packed = changelog.groupBy(*key_cols).agg(
        F.max(
            F.struct(
                *ver,
                F.col(op_col).alias("__op"),
                *[F.col(c).alias(c) for c in payload_cols],
            )
        ).alias("__last")
    )
    return (
        packed.where(F.col(f"__last.__op") != delete_op)
        .select(
            *key_cols,
            *[F.col(f"__last.{c}").alias(c) for c in payload_cols],
        )
    )
