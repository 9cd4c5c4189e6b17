"""Global ALL-EMPTY oracle sweep (r10): every oracle query whose tables
are NOT already covered by tests/test_fuzz_rel.py's all-empty sweep runs
against a dataset where EVERY table has ZERO rows (schema-correct flat
parquet, the exact driver layout byte-for-byte minus the rows).

Stronger than tests/test_empty_inputs.py, which only asserts queries
plan and execute: here the empty-input RESULT must hash-match DuckDB's.
A first()-default, a coalesce'd aggregate, a NULL-vs-0 disagreement, or
a seed derived from an empty frame diverges HERE even though both
engines "ran fine". Because the fixture is written with pyarrow as flat
files, the file-stream queries are IN scope (the empty-inputs module had
to exclude them — Spark's own empty rewrite can only produce
directories).

Ops documented to REQUIRE data (contract errors on empty input) are
pinned in EMPTY_SKIP with the error they raise — a documented boundary,
not a silent hole.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import pytest

from conftest import sweep_params

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from check_correctness import TABLES, canon  # noqa: E402

SRC = "/root/testdata/sf0.001"
REL = {"region", "nation", "customer", "supplier", "part", "orders",
       "lineitem"}

# name -> documented reason this op cannot (or must not) run on an
# all-empty dataset. Every entry is a contract boundary with the raised
# error or the semantic delta on record.
EMPTY_SKIP: dict[str, str] = {
    "op-random-project": (
        "contract error by design: random_project infers the input "
        "dimension from the first row and raises ValueError('cannot "
        "infer input dimension from an empty corpus (pass a non-empty "
        "DataFrame)') — the documented loud-failure boundary shared "
        "with cosine_pairs_lsh's dim inference "
        "(operators/similarity.py)."
    ),
    "op-sample-weighted": (
        "the oracle is the CONSTANT (100, true) — it hard-pins the "
        "sample size k=100 under the corpus-size assumption |docs| >= k, "
        "exactly like op-bpe-train's hard-pinned n_merges=8. On an empty "
        "corpus the CORRECT sample is 0 rows (the engine returns it; "
        "execute-correctness pinned in tests/test_empty_inputs.py), but "
        "no constant oracle can express both corpora."
    ),
}


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("fuzz_allempty_sf")
    for t in TABLES:
        schema = pq.read_schema(f"{SRC}/{t}.parquet")
        # strip pandas metadata: zero-row roundtrip via the pandas
        # metadata path can resurrect index columns
        schema = schema.remove_metadata()
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


def _table_mentions(sql: str) -> set[str]:
    return {t for t in TABLES if re.search(rf"\b{t}\b", sql)}


def _names():
    """Every oracle query NOT already in the rel-only all-empty sweep
    (tests/test_fuzz_rel.py) and not a documented EMPTY_SKIP."""
    import __spark_entry__ as m

    names = []
    for name, sql in sorted(m.oracle_sql().items()):
        mentioned = _table_mentions(sql)
        if mentioned and mentioned <= REL:
            continue  # covered by test_fuzz_rel's all-empty sweep
        if name not in EMPTY_SKIP:
            names.append(name)
    return names


@pytest.mark.parametrize("name", sweep_params(_names()))
def test_all_empty_query_matches_oracle(spark, empty_dir, name):
    import duckdb

    import __spark_entry__ as m

    spdf = m.queries()[name](spark, empty_dir).toPandas()
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{empty_dir}/{t}.parquet')"
            )
        dpdf = con.sql(m.oracle_sql()[name]).df()
    finally:
        con.close()
    assert sorted(spdf.columns) == sorted(dpdf.columns), (
        f"{name}: column mismatch spark={sorted(spdf.columns)} "
        f"duckdb={sorted(dpdf.columns)}"
    )
    slines, dlines = canon(spdf), canon(dpdf)
    assert slines == dlines, (
        f"{name}: {len(slines)} spark rows vs {len(dlines)} oracle rows; "
        f"spark-only={sorted(set(slines) - set(dlines))[:3]} "
        f"duck-only={sorted(set(dlines) - set(slines))[:3]}"
    )


def test_all_empty_inventory_pinned():
    """The dynamic name list must never silently shrink (r10 floor:
    120 enrolled), and every skip must name a registered query with a
    written rationale."""
    import __spark_entry__ as m

    names = _names()
    assert len(names) >= 120, f"all-empty sweep shrank to {len(names)}"
    registered = set(m.oracle_sql())
    for k, why in EMPTY_SKIP.items():
        assert k in registered, f"EMPTY_SKIP names unknown query {k}"
        assert len(why) > 40, f"EMPTY_SKIP[{k}] lacks a real rationale"


@pytest.fixture(scope="module", autouse=True)
def _cache_hygiene(spark):
    """This module runs the ENTIRE registry, including self-persisting
    queries (op-lm-score, dedup-cluster caches) — drop their CacheManager
    entries and freed memory on module exit so later plan-shape tests
    audit pristine plans (r10 in-suite flake)."""
    yield
    spark.catalog.clearCache()
