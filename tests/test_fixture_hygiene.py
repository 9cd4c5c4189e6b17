"""Fixture/scratch hygiene regressions (r10 ADVICE).

1. _ensure_hive_layout must be BUILD-ONCE: dynamic partition overwrite's
   commit protocol leaves no top-level _SUCCESS, so gating completeness on
   Spark's own marker made the cache check always false — every call
   rmtree'd and rebuilt the fixture, deterministically racing any
   concurrent reader. The sentinel is now written explicitly before the
   rename; a second call must return the SAME directory untouched.
2. _sweep_stale_siblings must delete only prefix-matching dirs older than
   the TTL (the per-run uuid scratch dirs leaked one dir per run).
3. _unique_view must register per-call unique names (registering shared
   lake-table names raced register→drop under concurrent SQL queries).
"""

from __future__ import annotations

import os
import time

from etl_pipeline_api_spark.queries import (
    _ensure_hive_layout,
    _sweep_stale_siblings,
    _unique_view,
)


def test_hive_layout_builds_once(spark, sf_dir):
    out1 = _ensure_hive_layout(spark, sf_dir)
    sentinel = os.path.join(out1, "_SUCCESS")
    assert os.path.exists(sentinel), "explicit _SUCCESS must be written"
    # fingerprint the directory: a rebuild replaces the inode set
    stat1 = os.stat(out1).st_ino
    mtimes1 = {
        f: os.path.getmtime(os.path.join(out1, f)) for f in os.listdir(out1)
    }
    out2 = _ensure_hive_layout(spark, sf_dir)
    assert out2 == out1
    assert os.stat(out2).st_ino == stat1, "second call must not rebuild"
    mtimes2 = {
        f: os.path.getmtime(os.path.join(out2, f)) for f in os.listdir(out2)
    }
    assert mtimes2 == mtimes1, "second call must leave the fixture untouched"


def test_sweep_stale_siblings_ttl(tmp_path):
    old = tmp_path / "probe_old"
    fresh = tmp_path / "probe_fresh"
    other = tmp_path / "unrelated_old"
    for d in (old, fresh, other):
        d.mkdir()
        (d / "x").write_text("x")
    past = time.time() - 3600
    os.utime(old, (past, past))
    os.utime(other, (past, past))
    _sweep_stale_siblings(str(tmp_path), "probe_", ttl_s=1800)
    assert not old.exists(), "stale prefix-matching dir must be swept"
    assert fresh.exists(), "fresh dir must survive"
    assert other.exists(), "non-matching prefix must never be touched"
    # missing base dir is a no-op, not an error
    _sweep_stale_siblings(str(tmp_path / "nope"), "probe_")


def test_unique_view_names_do_not_collide(spark, sf_dir):
    df = spark.range(3)
    a = _unique_view(df, "customer")
    b = _unique_view(df, "customer")
    try:
        assert a != b
        assert a.startswith("customer_") and b.startswith("customer_")
        assert spark.table(a).count() == 3
    finally:
        spark.catalog.dropTempView(a)
        spark.catalog.dropTempView(b)


def test_sql_surface_queries_concurrent(spark, sf_dir):
    """The r10 ADVICE race, exercised directly: the three SQL-surface
    queries that used to register/drop shared lake-table names now run
    concurrently in one session without TABLE_OR_VIEW_NOT_FOUND."""
    from concurrent.futures import ThreadPoolExecutor

    from etl_pipeline_api_spark.queries_rel import q_sql_passthrough
    from etl_pipeline_api_spark.queries_rel8 import q_recursive_cte
    from etl_pipeline_api_spark.queries_rel9 import q_lateral_topk

    def run(fn):
        return fn(spark, sf_dir).count()

    fns = [q_sql_passthrough, q_recursive_cte, q_lateral_topk] * 3
    with ThreadPoolExecutor(max_workers=6) as ex:
        counts = list(ex.map(run, fns))
    assert all(c >= 0 for c in counts)
