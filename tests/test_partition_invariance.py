"""Partition-layout invariance sweep (r10): every registered query must
produce the SAME result when each input table arrives as a differently
sharded multi-file parquet directory instead of the driver's single flat
file.

This is the 100 TB portability invariant the single-layout oracle gate
cannot see: on a real cluster the same table arrives as thousands of
files in arbitrary order, partial aggregation runs in a different
grouping, and scans interleave differently. An op that leaks layout into
results — monotonically_increasing_id in output, an unordered limit, a
first()/any_value without a total order, a range-exchange boundary
artifact, float summation rounded ON a half-way boundary — diverges here
deterministically (both layouts are fixed, so a failure reproduces; no
flake).

The comparison is Spark-vs-Spark (original sf0.001 layout vs a
repartition(7) rewrite), canon-hashed like the driver gate. File-stream
queries are IN scope: the sharded events directory drains as multiple
micro-batches, so this doubles as stream/batch parity under batching.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

from conftest import sweep_params

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from check_correctness import TABLES, canon  # noqa: E402

SRC = "/root/testdata/sf0.001"

# name -> documented reason the op's output legitimately depends on the
# file layout. Every entry is a contract statement, not a silent hole.
LAYOUT_SKIP: dict[str, str] = {
    "op-file-lineage": (
        "the op's OUTPUT IS the file layout: per-source-file row counts "
        "via _metadata.file_name. Rewriting the table as 7 shards "
        "changes the file names and the per-file counts by definition; "
        "multi-file semantics are pinned separately in "
        "tests/test_rel7.py over a sharded write."
    ),
}


@pytest.fixture(scope="module")
def sharded_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sharded_sf")
    for t in TABLES:
        (
            spark.read.parquet(f"{SRC}/{t}.parquet")
            .repartition(7)
            .write.parquet(str(d / f"{t}.parquet"))
        )
    return str(d)


def _names():
    import __spark_entry__ as m

    return [n for n in sorted(m.queries()) if n not in LAYOUT_SKIP]


@pytest.mark.parametrize("name", sweep_params(_names()))
def test_query_is_partition_layout_invariant(spark, sharded_dir, name):
    import __spark_entry__ as m

    fn = m.queries()[name]
    flat = canon(fn(spark, SRC).toPandas())
    sharded = canon(fn(spark, sharded_dir).toPandas())
    assert flat == sharded, (
        f"{name}: result depends on input file layout — "
        f"flat-only={sorted(set(flat) - set(sharded))[:3]} "
        f"sharded-only={sorted(set(sharded) - set(flat))[:3]}"
    )


def test_layout_inventory_pinned():
    import __spark_entry__ as m

    names = _names()
    assert len(names) >= 228, f"layout sweep shrank to {len(names)}"
    registered = set(m.queries())
    for k, why in LAYOUT_SKIP.items():
        assert k in registered, f"LAYOUT_SKIP names unknown query {k}"
        assert len(why) > 40, f"LAYOUT_SKIP[{k}] lacks a real rationale"


@pytest.fixture(scope="module", autouse=True)
def _cache_hygiene(spark):
    """This module runs the ENTIRE registry, including self-persisting
    queries (op-lm-score, dedup-cluster caches) — drop their CacheManager
    entries and freed memory on module exit so later plan-shape tests
    audit pristine plans (r10 in-suite flake)."""
    yield
    spark.catalog.clearCache()
