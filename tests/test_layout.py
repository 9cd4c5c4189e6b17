"""Layout operators: Morton math, file pruning on z-ordered writes,
lossless size-targeted compaction."""

from __future__ import annotations

import glob
import shutil

import pyspark.sql.functions as F
import pytest

from etl_pipeline_api_spark.operators.layout import (
    compact,
    scale_to_int,
    write_zordered,
    zorder_value,
)

TMP = "/tmp/spark_graft_test_layout"


def _morton_ref(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_value_matches_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder_value(F.col("x"), F.col("y"), 16).alias("z")
        ).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _morton_ref(x, y, 16)


def test_scale_to_int_clamps_and_is_monotone(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (16.0,), (31.999,), (99.0,)], "v double")
    out = [
        r.s
        for r in df.select(scale_to_int(F.col("v"), 0.0, 32.0, 8).alias("s"))
        .orderBy("v")
        .collect()
    ]
    assert out[0] == 0  # below-range clamps to 0
    assert out[-1] == 255  # above-range clamps to top
    assert out == sorted(out)
    assert out[1] == 0 and out[2] == 128  # affine: 16/32 * 256


def test_zordered_write_prunes_files_on_2d_box(spark, sf_dir):
    """The point of the layout: a selective (user_id, value) box touches a
    small fraction of z-ordered files, while the same predicate against a
    round-robin layout touches essentially all of them."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    shutil.rmtree(TMP, ignore_errors=True)
    ux = scale_to_int(F.col("user_id").cast("double"), 0.0, 128.0, 16)
    vy = scale_to_int(F.col("value"), 0.0, 32.0, 16)
    write_zordered(ev, zorder_value(ux, vy, 16), f"{TMP}/z", n_files=16)
    ev.repartition(16).write.mode("overwrite").parquet(f"{TMP}/rr")

    box = (F.col("user_id").between(10, 20)) & (F.col("value").between(2.0, 4.0))

    def files_touched(path: str) -> int:
        return (
            spark.read.parquet(path)
            .filter(box)
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    z_files = files_touched(f"{TMP}/z")
    rr_files = files_touched(f"{TMP}/rr")
    n_match = spark.read.parquet(f"{TMP}/z").filter(box).count()
    assert n_match == spark.read.parquet(f"{TMP}/rr").filter(box).count()
    assert n_match > 0
    # round-robin spreads matches everywhere; z-order concentrates them
    assert rr_files >= 8
    assert z_files <= rr_files // 2


def test_compact_reduces_files_and_preserves_content(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    shutil.rmtree(TMP, ignore_errors=True)
    ev.repartition(37).write.mode("overwrite").parquet(f"{TMP}/frag")
    frag = spark.read.parquet(f"{TMP}/frag")
    n = compact(frag, f"{TMP}/dense", target_file_bytes=1024 * 1024)
    dense_files = glob.glob(f"{TMP}/dense/part-*.parquet")
    frag_files = glob.glob(f"{TMP}/frag/part-*.parquet")
    assert len(frag_files) == 37
    assert len(dense_files) == n < 37
    # lossless: same multiset of rows
    back = spark.read.parquet(f"{TMP}/dense")
    assert back.count() == ev.count()
    assert back.exceptAll(ev).isEmpty() and ev.exceptAll(back).isEmpty()


def test_zorder_projection_is_shuffle_free(spark):
    import __spark_entry__ as entry

    df = entry.queries()["op-zorder-layout"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "rangepartitioning" not in plan
