"""Custom Python DataSource (Spark 4 API) for paginated JSON page files.

The reference ingests a paginated HTTP API into per-page JSON files and
then loops over them in the driver (proj-eng-dados/main.py:109-124). The
repo's primary scan path is ``json_source.scan_json_pages`` (one
distributed ``spark.read.json``); THIS module re-expresses the same source
through Spark 4's ``pyspark.sql.datasource`` plugin API —
``spark.dataSource.register(PageFileDataSource)`` then
``spark.read.format("page_json").load(dir)`` — to pin the extension point
a user would reach for when the paging protocol is NOT a format Spark
ships (a proprietary cursor API, a checksum-framed feed, ...).

Scale shape: ``partitions()`` lists the page files ONCE on the driver
(cheap metadata — the same listing any FileIndex does) and emits one
``InputPartition`` per page, so parsing fans out across executors; each
task streams its own file through an Arrow-batched iterator. No page ever
routes through the driver. Schema is declared by the caller — no
inference pass.

Both envelope shapes from the reference raw layer are handled per page:
a bare JSON array of records, or ``{count, next, previous, results}``.
Undecodable files yield a single all-null row with ``_corrupt_path`` set
(the DataSource twin of PERMISSIVE ``_corrupt_record``).
"""

from __future__ import annotations

import glob
import json
import os
import re

_DIGIT_RUNS = re.compile(r"(\d+)")


def page_order_key(name: str) -> tuple:
    """Natural-order key for page filenames: digit runs compare numerically,
    so ``page_10.json`` sorts AFTER ``page_9.json`` regardless of padding.
    ``re.split`` alternates non-digit/digit chunks, so same-index elements of
    any two keys are always the same type — tuple comparison never raises."""
    return tuple(
        int(chunk) if chunk.isdigit() else chunk
        for chunk in _DIGIT_RUNS.split(name)
    )

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql import types as T

CORRUPT_PATH_COL = "_corrupt_path"


class PagePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class PageFileReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.schema = schema
        self.options = options

    def partitions(self):
        root = self.options["path"]
        pattern = self.options.get("pattern", "*.json")
        paths = sorted(glob.glob(os.path.join(root, pattern)))
        # one partition per page file: the unit of parallelism AND of
        # corruption isolation (mirrors the reference's per-file try/except)
        return [PagePartition(p) for p in paths]

    def read(self, partition: PagePartition):
        names = [f.name for f in self.schema.fields if f.name != CORRUPT_PATH_COL]
        try:
            with open(partition.path, encoding="utf-8") as fh:
                doc = json.load(fh)
        except (json.JSONDecodeError, OSError):
            yield tuple([None] * len(names) + [partition.path])
            return
        records = doc.get("results", []) if isinstance(doc, dict) else doc
        for rec in records:
            yield tuple(rec.get(n) for n in names) + (None,)


class PageStreamReader(DataSourceStreamReader):
    """Streaming twin of PageFileReader: the reference's poll-loop
    (proj-eng-dados/main.py:84-99 — "fetch pages until none are new") as a
    real incremental micro-batch source with replayable offsets.

    OFFSET CONTRACT: page files are named with a monotonically increasing
    page number (page_1.json, page_2.json, … — what the reference's
    sequential downloader produces); the offset is the LAST FILENAME
    processed under NATURAL (numeric-aware) order, so ``page_10`` correctly
    sorts after ``page_9`` even unpadded, a restart resumes after the
    committed name, and a replayed batch re-reads precisely its own
    (start, end] file range — deterministic batches, the foundation
    foreachBatch idempotence builds on. Two distinct names that tie under
    the natural key (page_1.json vs page_01.json) make the order ambiguous
    and raise rather than silently drop a file.
    Each new file is one InputPartition: parsing fans out across executors,
    nothing routes through the driver (latestOffset lists the directory —
    driver-side metadata only, same as any FileIndex)."""

    def __init__(self, schema: T.StructType, options: dict):
        self.schema = schema
        self.options = options

    def _files(self) -> list[str]:
        root = self.options["path"]
        pattern = self.options.get("pattern", "*.json")
        files = sorted(
            glob.glob(os.path.join(root, pattern)),
            key=lambda p: page_order_key(os.path.basename(p)),
        )
        keys = [page_order_key(os.path.basename(p)) for p in files]
        for a, b, ka, kb in zip(files, files[1:], keys, keys[1:]):
            if ka == kb:
                raise ValueError(
                    "page_json offset order is ambiguous: "
                    f"{os.path.basename(a)!r} and {os.path.basename(b)!r} "
                    "tie under numeric filename order; rename one"
                )
        return files

    def initialOffset(self) -> dict:
        return {"last": ""}

    def latestOffset(self) -> dict:
        files = self._files()
        return {"last": os.path.basename(files[-1]) if files else ""}

    def partitions(self, start: dict, end: dict):
        lo = page_order_key(start.get("last", ""))
        hi = page_order_key(end.get("last", ""))
        batch = [
            p
            for p in self._files()
            if lo < page_order_key(os.path.basename(p)) <= hi
        ]
        # zero-partition batches are rejected by the engine; emit an empty
        # marker partition instead (read() yields nothing for it)
        return [PagePartition(p) for p in batch] or [PagePartition("")]

    def read(self, partition: PagePartition):
        if not partition.path:
            return
        yield from PageFileReader(self.schema, self.options).read(partition)

    def commit(self, end: dict) -> None:
        pass


class PageFileDataSource(DataSource):
    """``spark.read.format("page_json").schema(s).option("path", d).load()``
    for batch; ``spark.readStream`` with the same format/schema/options for
    the incremental stream (new page files become micro-batches)."""

    @classmethod
    def name(cls) -> str:
        return "page_json"

    def schema(self):
        raise NotImplementedError(
            "page_json requires an explicit .schema(...) — inference would "
            "scan every page twice"
        )

    def reader(self, schema: T.StructType) -> PageFileReader:
        return PageFileReader(schema, self.options)

    def streamReader(self, schema: T.StructType) -> PageStreamReader:
        return PageStreamReader(schema, self.options)


def with_corrupt_col(record: T.StructType) -> T.StructType:
    """The schema to pass to ``.schema(...)``: record fields + corrupt-path."""
    return T.StructType(
        list(record.fields) + [T.StructField(CORRUPT_PATH_COL, T.StringType(), True)]
    )


def write_page_fixture(records: list[dict], out_dir: str, corrupt: bool = True) -> None:
    """Test/oracle scaffolding: lay `records` out as the reference's raw page
    layer — page 1 bare-array envelope, page 2 API envelope, and (optionally)
    a corrupt page 3 that the scan must isolate rather than fail on. Names
    are zero-padded (page_00001.json) so they are monotonic under BOTH plain
    lexicographic and the stream reader's natural order."""
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    half = len(records) // 2
    with open(os.path.join(out_dir, "page_00001.json"), "w") as f:
        json.dump(records[:half], f)
    with open(os.path.join(out_dir, "page_00002.json"), "w") as f:
        json.dump(
            {"count": len(records), "next": None, "previous": None,
             "results": records[half:]}, f,
        )
    if corrupt:
        with open(os.path.join(out_dir, "page_00003.json"), "w") as f:
            f.write("{corrupt!!")
