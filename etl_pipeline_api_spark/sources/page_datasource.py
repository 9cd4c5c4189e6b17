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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
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


class PageFileDataSource(DataSource):
    """``spark.read.format("page_json").schema(s).option("path", d).load()``."""

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


def with_corrupt_col(record: T.StructType) -> T.StructType:
    """The schema to pass to ``.schema(...)``: record fields + corrupt-path."""
    return T.StructType(
        list(record.fields) + [T.StructField(CORRUPT_PATH_COL, T.StringType(), True)]
    )
