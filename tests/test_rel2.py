"""Semantics tests for the second relational batch (beyond the oracle
hash-match): MERGE upsert action accounting and gap-fill grid density."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_upsert_action_accounting(spark):
    out = entry.queries()["op-upsert"](spark, SF)
    base = spark.read.parquet(f"{SF}/customer.parquet")
    n_base = base.count()
    n_upd = base.filter(F.col("c_custkey") % 100 < 10).count()
    n_ins = base.filter(F.col("c_custkey") % 100 == 50).count()
    by_action = {r["merge_action"]: r["n"] for r in
                 out.groupBy("merge_action").agg(F.count("*").alias("n")).collect()}
    assert by_action.get("updated", 0) == n_upd
    assert by_action.get("inserted", 0) == n_ins
    assert by_action.get("kept", 0) == n_base - n_upd
    # every merge key is unique in the result (MERGE cardinality contract)
    assert out.count() == out.select("c_custkey").distinct().count() == n_base + n_ins
    # updated rows actually carry the delta payload
    assert (
        out.filter(F.col("merge_action") == "updated")
        .filter(~F.col("c_name").startswith("UPDATED_")).count() == 0
    )


def test_gapfill_grid_is_dense_and_locf_non_null_after_first_obs(spark):
    out = entry.queries()["op-gapfill-locf"](spark, SF).persist()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_types = ev.select("event_type").distinct().count()
    # dense grid: every series has exactly the same number of hourly buckets
    per_series = out.groupBy("event_type").agg(F.count("*").alias("n"))
    counts = {r["event_type"]: r["n"] for r in per_series.collect()}
    assert len(counts) == n_types
    assert len(set(counts.values())) == 1  # identical grid length per series
    # LOCF contract: once a series has observed a value, sum_locf never
    # goes back to null; gap rows (n=0) inherit the previous observation
    w_ok = out.filter(
        (F.col("n") == 0) & F.col("sum_locf").isNull()
    )
    # null gap rows may exist only before a series' first observation:
    # check each such bucket precedes the series' first non-null bucket
    firsts = (
        out.filter(F.col("sum_locf").isNotNull())
        .groupBy("event_type").agg(F.min("bucket").alias("first_obs"))
    )
    bad = (
        w_ok.join(firsts, "event_type")
        .filter(F.col("bucket") >= F.col("first_obs"))
        .count()
    )
    assert bad == 0
    out.unpersist()
