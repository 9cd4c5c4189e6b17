"""Physical-layout queries: z-order clustering values and lossless compaction.

The layout operators (operators/layout.py) are about what the SCAN costs
at 100 TB; the oracle gate can only see values, so these queries check
the two things values can prove: (a) the Morton interleave arithmetic is
engine-exact (op-zorder-layout), and (b) compaction rewrites are
lossless (op-compact-files). The parts values cannot prove — file-level
pruning engaging, file counts shrinking — are pinned by
tests/test_layout.py on real written files.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.layout import compact, scale_to_int, zorder_sql, zorder_value
from .queries import _sweep_stale_siblings, _t, query

# Fixed, documented key domains for the events table (clamped outside):
# user_id is a small integer id, value a bounded metric. Constants, not
# per-run aggregates, so the mapping is identical at every scale factor
# and in both engines.
_UID_LO, _UID_HI = 0.0, 128.0
_VAL_LO, _VAL_HI = 0.0, 32.0
_BITS = 16

_SCALE_SQL = {
    "uid": (
        f"least(greatest(CAST(floor((user_id - {_UID_LO}) / "
        f"({_UID_HI} - {_UID_LO}) * {1 << _BITS}) AS BIGINT), 0), {(1 << _BITS) - 1})"
    ),
    "val": (
        f"least(greatest(CAST(floor((value - {_VAL_LO}) / "
        f"({_VAL_HI} - {_VAL_LO}) * {1 << _BITS}) AS BIGINT), 0), {(1 << _BITS) - 1})"
    ),
}


@query(
    "op-zorder-layout",
    oracle=f"""
    WITH scaled AS (
        SELECT event_id,
               {_SCALE_SQL['uid']} AS ux,
               {_SCALE_SQL['val']} AS vy
        FROM events
    )
    SELECT event_id, CAST({zorder_sql('ux', 'vy', _BITS)} AS BIGINT) AS zval
    FROM scaled
    """,
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-value per event over (user_id, value): the clustering key
    write_zordered range-partitions on. Pure projection — zero shuffle,
    zero data passes beyond the scan — and bit-exact across engines
    (disjoint-bit OR == SUM; the affine scaling is floor() on identical
    IEEE doubles)."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    ux = scale_to_int(F.col("user_id").cast("double"), _UID_LO, _UID_HI, _BITS)
    vy = scale_to_int(F.col("value"), _VAL_LO, _VAL_HI, _BITS)
    return ev.select(
        "event_id", zorder_value(ux, vy, _BITS).cast("long").alias("zval")
    )


@query(
    "op-compact-files",
    oracle="""
    SELECT event_id, user_id, event_type, round(value, 2) AS value
    FROM events
    """,
)
def q_compact_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction is lossless: fragment events into many tiny
    files (the streaming-sink pathology), compact to size-targeted files,
    and return the FULL read-back content — the oracle compares it against
    the original source table, so any dropped/duplicated/mangled row fails the
    hash. File-count mechanics are unit-tested (values can't carry them)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.round("value", 2).alias("value")
    )
    # per-run base (r10 concurrency sweep): the old fixed
    # "spark_graft_compact" path + rmtree-at-start let a concurrent (or
    # even a later) run delete a directory whose lazily-evaluated result
    # frame a prior caller still held
    import uuid as _uuid

    _sweep_stale_siblings(tempfile.gettempdir(), "spark_graft_compact_")
    base = os.path.join(
        tempfile.gettempdir(), f"spark_graft_compact_{_uuid.uuid4().hex[:10]}"
    )
    frag, dense = os.path.join(base, "frag"), os.path.join(base, "dense")
    # fixture: the pathological layout (40 shards of a small table)
    ev.repartition(40).write.mode("overwrite").parquet(frag)
    fragmented = spark.read.parquet(frag)
    compact(fragmented, dense, target_file_bytes=4 * 1024 * 1024)
    return spark.read.parquet(dense)
