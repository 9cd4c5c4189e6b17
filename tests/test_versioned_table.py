"""Unit tests for sources/versioned_table.py — the commit-log
invariants: snapshot isolation (orphan data invisible), append as
manifest union, time travel, non-destructive rollback."""

from __future__ import annotations

import os

import pytest

from etl_pipeline_api_spark.sources.versioned_table import VersionedTable


def _df(spark, ids):
    return spark.createDataFrame([(i, i * 10.0) for i in ids], "id long, v double")


def test_commit_append_time_travel_rollback(spark, tmp_path):
    vt = VersionedTable(str(tmp_path / "t"))
    v1 = vt.commit(_df(spark, [1, 2]), mode="overwrite")
    v2 = vt.commit(_df(spark, [3]), mode="append")
    assert (v1, v2) == (1, 2)
    assert {r.id for r in vt.read(spark).collect()} == {1, 2, 3}
    # time travel: version 1 is still exactly the first commit
    assert {r.id for r in vt.read(spark, version=1).collect()} == {1, 2}
    # overwrite starts a fresh manifest
    vt.commit(_df(spark, [9]), mode="overwrite")
    assert {r.id for r in vt.read(spark).collect()} == {9}
    # rollback: new version with v2's manifest; nothing destroyed
    v4 = vt.rollback(2)
    assert v4 == 4
    assert {r.id for r in vt.read(spark).collect()} == {1, 2, 3}
    assert {r.id for r in vt.read(spark, version=3).collect()} == {9}
    assert vt.versions() == [1, 2, 3, 4]


def test_orphan_data_dir_is_invisible(spark, tmp_path):
    """A crashed writer = data dir with no commit marker. Readers must
    never see it — the atomic-rename commit is the visibility point."""
    vt = VersionedTable(str(tmp_path / "t"))
    vt.commit(_df(spark, [1]), mode="overwrite")
    # simulate a crash: data written, commit marker never landed
    _df(spark, [777]).write.parquet(str(tmp_path / "t" / "d99"))
    assert {r.id for r in vt.read(spark).collect()} == {1}
    # and the next commit does not resurrect it
    vt.commit(_df(spark, [2]), mode="append")
    assert {r.id for r in vt.read(spark).collect()} == {1, 2}


def test_invalid_operations_raise(spark, tmp_path):
    vt = VersionedTable(str(tmp_path / "t"))
    with pytest.raises(ValueError, match="no committed versions"):
        vt.read(spark)
    vt.commit(_df(spark, [1]))
    with pytest.raises(ValueError, match="never committed"):
        vt.read(spark, version=5)
    with pytest.raises(ValueError, match="never committed"):
        vt.rollback(7)
    with pytest.raises(ValueError, match="unknown commit mode"):
        vt.commit(_df(spark, [2]), mode="merge")


def test_append_does_not_rewrite_existing_files(spark, tmp_path):
    """Append must be a manifest union: the first version's files are
    byte-identical afterwards (mtime+size unchanged)."""
    root = str(tmp_path / "t")
    vt = VersionedTable(root)
    vt.commit(_df(spark, list(range(50))), mode="overwrite")
    before = {
        f: os.path.getmtime(os.path.join(root, "d1", f))
        for f in os.listdir(os.path.join(root, "d1"))
    }
    vt.commit(_df(spark, [100]), mode="append")
    after = {
        f: os.path.getmtime(os.path.join(root, "d1", f))
        for f in os.listdir(os.path.join(root, "d1"))
    }
    assert before == after


def test_keyed_commit_replay_replaces_not_duplicates(spark, tmp_path):
    from etl_pipeline_api_spark.sources.versioned_table import (
        KeyedVersionedTable,
    )

    vt = KeyedVersionedTable(str(tmp_path / "t"))
    vt.commit_keyed(_df(spark, [1, 2]), key=0)
    vt.commit_keyed(_df(spark, [3]), key=1)
    # replay of the LATEST batch (failure before checkpoint advanced):
    # same key, possibly different content — must REPLACE, not append
    vt.commit_keyed(_df(spark, [3, 4]), key=1)
    assert {r.id for r in vt.read(spark).collect()} == {1, 2, 3, 4}
    assert vt.versions() == [1, 2]  # replay reused version 2
    # interior replay is rejected (streaming never does this)
    vt.commit_keyed(_df(spark, [5]), key=2)
    with pytest.raises(ValueError, match="interior"):
        vt.commit_keyed(_df(spark, [9]), key=1)
    # non-monotonic new keys are rejected
    with pytest.raises(ValueError, match="monotonic"):
        vt.commit_keyed(_df(spark, [9]), key=-5)
    # time travel still works across keyed commits
    assert {r.id for r in vt.read(spark, version=1).collect()} == {1, 2}


def test_vacuum_retains_referenced_dirs_only(spark, tmp_path):
    from etl_pipeline_api_spark.sources.versioned_table import (
        VersionedTable,
        vacuum,
    )

    vt = VersionedTable(str(tmp_path / "t"))
    vt.commit(_df(spark, [1]), mode="overwrite")       # v1 -> d1
    vt.commit(_df(spark, [2]), mode="append")          # v2 -> d1, d2
    vt.commit(_df(spark, [9]), mode="overwrite")       # v3 -> d3
    vt.commit(_df(spark, [10]), mode="append")         # v4 -> d3, d4
    # orphan from a crashed writer
    _df(spark, [777]).write.parquet(str(tmp_path / "t" / "d99"))
    deleted = vacuum(vt, retain_last=2)
    # v3/v4 reference d3, d4; d1, d2 and the orphan go
    assert deleted == ["d1", "d2", "d99"]
    assert {r.id for r in vt.read(spark).collect()} == {9, 10}
    assert {r.id for r in vt.read(spark, version=3).collect()} == {9}
    # expired time travel now fails at read (data gone, tombstone kept)
    import pytest as _pytest

    with _pytest.raises(Exception):
        vt.read(spark, version=1).collect()


def test_merge_into_versions_pre_merge_snapshot(spark, tmp_path):
    from etl_pipeline_api_spark.sources.versioned_table import (
        VersionedTable,
        merge_into,
    )

    vt = VersionedTable(str(tmp_path / "t"))
    vt.commit(_df(spark, [1, 2, 3]), mode="overwrite")
    updates = spark.createDataFrame(
        [(2, 999.0), (7, 70.0)], "id long, v double"
    )
    v = merge_into(vt, spark, updates, ["id"])
    assert v == 2
    got = {r.id: r.v for r in vt.read(spark).collect()}
    assert got == {1: 10.0, 2: 999.0, 3: 30.0, 7: 70.0}
    # the pre-merge snapshot is still time-travelable
    pre = {r.id: r.v for r in vt.read(spark, version=1).collect()}
    assert pre == {1: 10.0, 2: 20.0, 3: 30.0}


def test_schema_evolution_and_empty_commit(spark, tmp_path):
    from etl_pipeline_api_spark.sources.versioned_table import VersionedTable

    vt = VersionedTable(str(tmp_path / "t"))
    # empty overwrite commit is READABLE (schema recorded in the commit)
    vt.commit(_df(spark, []), mode="overwrite")
    out = vt.read(spark)
    assert out.count() == 0 and set(out.columns) == {"id", "v"}
    # append that ADDS a column: old rows read the new column as null
    vt.commit(_df(spark, [1]), mode="append")
    wide = spark.createDataFrame([(2, 20.0, "x")], "id long, v double, tag string")
    vt.commit(wide, mode="append")
    rows = {r.id: (r.v, r.tag) for r in vt.read(spark).collect()}
    assert rows == {1: (10.0, None), 2: (20.0, "x")}
    # type conflict fails the COMMIT, never a later read
    bad = spark.createDataFrame([(3, "oops")], "id long, v string")
    with pytest.raises(ValueError, match="schema conflict"):
        vt.commit(bad, mode="append")


def test_random_history_matches_model(spark, tmp_path):
    """Randomized op sequences vs a pure-Python commit-log model: every
    committed version remains readable with exactly the modeled content
    (no vacuum here — full history)."""
    import random

    from etl_pipeline_api_spark.sources.versioned_table import VersionedTable

    rng = random.Random(42)
    vt = VersionedTable(str(tmp_path / "t"))
    model: dict[int, frozenset] = {}
    next_id = 0
    for step in range(12):
        ops = ["overwrite", "append"] + (["rollback"] if model else [])
        op = rng.choice(ops)
        v = max(model) + 1 if model else 1
        if op == "rollback":
            target = rng.choice(sorted(model))
            assert vt.rollback(target) == v
            model[v] = model[target]
        else:
            ids = [next_id + i for i in range(rng.randint(1, 3))]
            next_id += len(ids)
            assert vt.commit(_df(spark, ids), mode=op) == v
            base = model[v - 1] if (op == "append" and v > 1) else frozenset()
            model[v] = base | frozenset(ids)
    for v, want in model.items():
        got = frozenset(r.id for r in vt.read(spark, version=v).collect())
        assert got == want, f"version {v}"
