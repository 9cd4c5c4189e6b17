"""Miniature manifest-based table format: versioned commits, snapshot
isolation, time travel, and rollback over plain parquet — the lakehouse
mechanics (Iceberg/Delta's core ideas) in ~100 lines, built only on an
atomic rename.

Why it exists here: the reference's medallion layers
(/root/reference/proj-eng-dados/main.py:104-319) overwrite parquet
directories in place — a reader racing a writer sees a half-written
table, and yesterday's state is gone. At 100 TB both are disqualifying.
The fix is the standard one:

- **Data is immutable.** Every commit writes a NEW data directory
  (``d<N>/``); nothing is ever modified in place.
- **A commit is one atomic rename.** The table state is the highest
  ``_commits/<N>.json``; the file is staged with a temp name and
  ``os.rename``d into place (atomic on POSIX), so readers see either
  the old version or the new one, never a torn state. A crashed writer
  leaves an orphan data dir that no commit references — invisible.
- **Appends are manifest unions, not rewrites.** A commit's manifest
  lists the data dirs that compose the version; append = previous
  manifest + one new dir. Reading version N is
  ``spark.read.parquet(*manifest)`` — Spark's multi-path reader plans
  one scan over all listed dirs, so a year of daily appends is one
  commit file of paths, zero data movement.
- **Time travel / rollback are manifest operations.** ``read(v)``
  resolves any committed manifest; ``rollback(v)`` writes a NEW commit
  whose manifest equals version v's — history is never destroyed
  (an audit can still read the rolled-back state).

Scale notes: the commit log is O(versions) tiny JSON files and the
manifest O(dirs) paths — driver-side metadata, exactly like a real
table format's metadata layer; the data path stays fully distributed.
Compaction = read latest + one overwrite commit (op-compact-files'
sizing applies).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


class VersionedTable:
    """A parquet table with an atomic commit log.

    Layout::

        <root>/d1/, d2/, ...          immutable data directories
        <root>/_commits/1.json, ...   {"version": N, "manifest": [dirs],
                                       "mode": "overwrite|append|rollback"}
    """

    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "_commits"), exist_ok=True)

    # ---- commit log -------------------------------------------------

    def versions(self) -> list[int]:
        cdir = os.path.join(self.root, "_commits")
        return sorted(
            int(f.split(".")[0])
            for f in os.listdir(cdir)
            if f.endswith(".json")
        )

    def _commit_meta(self, version: int) -> dict:
        with open(
            os.path.join(self.root, "_commits", f"{version}.json")
        ) as f:
            return json.load(f)

    def _write_commit(self, meta: dict) -> int:
        """Stage the commit json and atomically rename it into place."""
        cdir = os.path.join(self.root, "_commits")
        version = meta["version"]
        fd, tmp = tempfile.mkstemp(dir=cdir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
        os.rename(tmp, os.path.join(cdir, f"{version}.json"))
        return version

    def _next_version(self) -> int:
        vs = self.versions()
        return (vs[-1] + 1) if vs else 1

    # ---- writes -----------------------------------------------------

    @staticmethod
    def _merge_schema(base_json: str | None, df: DataFrame) -> str:
        """Commit-time schema tracking: append may ADD columns (old
        files read them as null — parquet's missing-column contract)
        but may not change an existing column's type; conflicts fail
        the commit, not some later read."""
        from pyspark.sql.types import StructType

        new = df.schema
        if base_json is None:
            return new.json()
        base = StructType.fromJson(json.loads(base_json))
        by_name = {f.name: f for f in base.fields}
        out = list(base.fields)
        for f in new.fields:
            old = by_name.get(f.name)
            if old is None:
                out.append(f)
            elif old.dataType != f.dataType:
                raise ValueError(
                    f"schema conflict on column {f.name!r}: "
                    f"{old.dataType.simpleString()} vs "
                    f"{f.dataType.simpleString()}"
                )
        return StructType(out).json()

    def commit(self, df: DataFrame, mode: str = "overwrite") -> int:
        """Write a new version. ``overwrite``: manifest = the new dir
        only. ``append``: manifest = previous manifest + the new dir
        (no rewrite of existing data). The commit records the version's
        READ schema, so empty tables stay readable and appends may add
        columns (schema evolution) without a type conflict ever
        reaching a reader."""
        if mode not in ("overwrite", "append"):
            raise ValueError(f"unknown commit mode {mode!r}")
        version = self._next_version()
        data_dir = f"d{version}"
        manifest = [data_dir]
        schema = df.schema.json()
        if mode == "append" and version > 1:
            prev = self._commit_meta(version - 1)
            manifest = prev["manifest"] + manifest
            schema = self._merge_schema(prev.get("schema"), df)
        df.write.parquet(os.path.join(self.root, data_dir))
        self._write_commit(
            {
                "version": version,
                "manifest": manifest,
                "mode": mode,
                "schema": schema,
            }
        )
        return version

    def rollback(self, to_version: int) -> int:
        """New commit whose manifest equals an earlier version's —
        history stays readable; nothing is deleted."""
        if to_version not in self.versions():
            raise ValueError(f"version {to_version} was never committed")
        version = self._next_version()
        self._write_commit(
            {
                "version": version,
                "manifest": self._commit_meta(to_version)["manifest"],
                "mode": "rollback",
            }
        )
        return version

    # ---- reads ------------------------------------------------------

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Latest committed version, or time-travel to ``version``.
        Only COMMITTED data dirs are visible: an orphan dir from a
        crashed writer is never listed in any manifest."""
        vs = self.versions()
        if not vs:
            raise ValueError(f"{self.root}: no committed versions")
        v = vs[-1] if version is None else version
        if v not in vs:
            raise ValueError(f"version {v} was never committed")
        meta = self._commit_meta(v)
        reader = spark.read
        if meta.get("schema"):
            # the commit's recorded schema: empty versions read with the
            # right columns, and files predating an added column fill it
            # with nulls (parquet's missing-column contract)
            from pyspark.sql.types import StructType

            reader = reader.schema(
                StructType.fromJson(json.loads(meta["schema"]))
            )
        return reader.parquet(
            *[os.path.join(self.root, d) for d in meta["manifest"]]
        )


class KeyedVersionedTable(VersionedTable):
    """VersionedTable + idempotent keyed commits — the exactly-once
    STREAMING sink contract: ``commit_keyed(df, key=batch_id)`` lands a
    batch so that a replayed batch (failure before the checkpoint
    advanced) REPLACES its own previous attempt instead of appending
    twice.

    Replay safety without torn reads: every attempt writes a FRESH data
    directory (``k<key>_a<attempt>``); the commit json — the only
    visibility point — is atomically renamed over the previous
    attempt's, so a reader resolves either the old attempt's dir or the
    new one, never a half-rewritten directory.

    Scope guard: Structured Streaming replays only the LATEST
    unacknowledged batch (single sequential writer), so a keyed commit
    must target a new key or the most recent one; rewriting an interior
    version would desynchronize later manifests that already embed its
    dirs, and is rejected loudly.
    """

    def commit_keyed(self, df: DataFrame, key: int) -> int:
        metas = [self._commit_meta(v) for v in self.versions()]
        keyed = {m.get("key"): m for m in metas if "key" in m}
        if key in keyed:
            meta = keyed[key]
            if meta["version"] != (self.versions() or [None])[-1]:
                raise ValueError(
                    f"keyed commit {key} is not the latest version; "
                    "interior replays are not supported (streaming "
                    "replays only the last batch)"
                )
            attempt = meta.get("attempt", 1) + 1
            version = meta["version"]
            base = meta["base_manifest"]
        else:
            if keyed and key < max(keyed):
                raise ValueError(
                    f"keyed commits must be monotonic: got {key} after "
                    f"{max(keyed)}"
                )
            attempt = 1
            version = self._next_version()
            base = (
                self._commit_meta(version - 1)["manifest"]
                if version > 1
                else []
            )
        data_dir = f"k{key}_a{attempt}"
        base_schema = (
            self._commit_meta(version - 1).get("schema")
            if version > 1
            else None
        )
        schema = self._merge_schema(base_schema, df)
        df.write.parquet(os.path.join(self.root, data_dir))
        self._write_commit(
            {
                "version": version,
                "manifest": base + [data_dir],
                "mode": "append",
                "key": key,
                "attempt": attempt,
                "base_manifest": base,
                "schema": schema,
            }
        )
        return version


def vacuum(table: VersionedTable, retain_last: int = 2) -> list[str]:
    """Physically delete data directories no RETAINED version references
    — the only destructive operation in the format, and the reason
    rollback/time-travel have a horizon.

    Keeps every dir referenced by the manifests of the last
    ``retain_last`` versions; removes the rest AND any orphan dir from
    a crashed writer (never referenced by any commit). Commit jsons for
    expired versions are kept as tombstone history but reading them
    raises once their data is gone — matching real table formats'
    "time travel limited by retention" contract. Returns the deleted
    dir names (driver-side metadata op; data deletion is per-dir)."""
    import shutil

    vs = table.versions()
    retained = vs[-retain_last:] if retain_last > 0 else []
    keep: set[str] = set()
    for v in retained:
        keep.update(table._commit_meta(v)["manifest"])
    deleted = []
    for entry in os.listdir(table.root):
        p = os.path.join(table.root, entry)
        if entry == "_commits" or not os.path.isdir(p):
            continue
        if entry not in keep:
            shutil.rmtree(p)
            deleted.append(entry)
    return sorted(deleted)


def merge_into(
    table: VersionedTable,
    spark: SparkSession,
    updates: DataFrame,
    key_cols: list[str],
) -> int:
    """MERGE INTO for the versioned table: SCD1 row semantics (update
    when matched, insert when not — the full-outer coalesce plan
    op-upsert pins) + format semantics (the merge lands as a NEW
    overwrite commit, so the pre-merge snapshot stays time-travelable
    and a crashed merge is invisible).

    Both sides hash-partition on the key; AQE broadcasts a small delta
    automatically. A real lakehouse MERGE adds file pruning on top of
    exactly this row plan — here the whole snapshot rewrites, which is
    the honest posture for a format whose manifests don't track
    per-file key ranges (z-ordered layouts + min/max pruning are the
    upgrade path, see operators/layout.py)."""
    from pyspark.sql import functions as F

    target = table.read(spark)
    value_cols = [c for c in target.columns if c not in key_cols]
    t, d = target.alias("t"), updates.alias("d")
    merged = t.join(d, on=key_cols, how="full_outer").select(
        *key_cols,
        *[
            F.coalesce(F.col(f"d.{c}"), F.col(f"t.{c}")).alias(c)
            for c in value_cols
        ],
    )
    return table.commit(merged, mode="overwrite")
