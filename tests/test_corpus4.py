"""Corpus batch 5 semantics: SemDeDup blocking and distributed row index."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_api_spark.operators import similarity
from etl_pipeline_api_spark.operators.layout import global_row_index

SF = "/root/testdata/sf0.001"


def _emb(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_semdedup_k1_equals_exact_allpairs(spark):
    """With a single cluster the blocked candidate join IS all-pairs: the
    drop set must equal the one derived from exact cosine_pairs."""
    emb = _emb(spark)
    exact = similarity.cosine_pairs(emb, "vec_id", "embedding", 0.4)
    exact_drops = {r.id_b for r in exact.select("id_b").distinct().collect()}
    out = similarity.semdedup(emb, "vec_id", "embedding", 0.4, k=1).collect()
    sem_drops = {r.vec_id for r in out if not r.keep}
    assert sem_drops == exact_drops
    assert len(out) == emb.count()  # every row labeled, none lost


def test_semdedup_blocked_drops_subset_of_exact(spark):
    """With k>1 blocking, every drop must be justified by a REAL near-dup
    pair (subset of the exact drop set — clustering can only miss pairs,
    never invent them)."""
    emb = _emb(spark)
    exact = similarity.cosine_pairs(emb, "vec_id", "embedding", 0.4)
    exact_drops = {r.id_b for r in exact.select("id_b").distinct().collect()}
    out = similarity.semdedup(emb, "vec_id", "embedding", 0.4, k=4).collect()
    sem_drops = {r.vec_id for r in out if not r.keep}
    assert sem_drops <= exact_drops


def test_global_row_index_contiguous_and_ordered(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    out = global_row_index(docs, "doc_id", n_parts=8).collect()
    n = len(out)
    assert sorted(r.idx for r in out) == list(range(n))
    by_doc = sorted(out, key=lambda r: r.doc_id)
    assert [r.idx for r in by_doc] == list(range(n))  # index follows key order


def test_global_row_index_correct_at_volume(spark):
    """Regression for the SPARK-28699 class: repartitionByRange bounds are
    SAMPLED, and before the localCheckpoint pin the offsets aggregate and
    the final join could execute the exchange with different bounds —
    correct at toy sizes, off-by-a-few at sf0.1 (50k rows). Assert exact
    idx == rank on a 200k-row skewed frame, twice (two full plans, two
    checkpoint materializations — both must agree with the rank)."""
    from pyspark.sql import functions as F

    df = spark.range(200_000).select(
        # non-uniform key distribution so sampled range bounds are uneven
        (F.col("id") * F.col("id") % 1_000_003).alias("k"),
        F.col("id"),
    )
    for _ in range(2):
        out = global_row_index(df, ["k", "id"], n_parts=16).withColumn(
            "rk", F.expr("rank() over (order by k, id)") - 1
        )
        assert out.filter(F.col("idx") != F.col("rk")).count() == 0


def test_global_row_index_no_full_table_single_partition_sort(spark):
    """The scale property: the only SinglePartition step is the k-row
    offset aggregation, never a sort of the full table. (The range
    exchange itself happens inside the localCheckpoint materialization
    job — SPARK-28699 nondeterministic sampling forces the pin, see
    global_row_index — so the downstream plan starts from the
    checkpointed RDD and re-clusters by _pid with a balanced hash
    exchange.)"""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    plan = global_row_index(docs, "doc_id", n_parts=8)._jdf.queryExecution().executedPlan().toString()
    # the full-table window partitions by _pid — never an empty
    # partition spec (which would be the single-task global window)
    assert "windowspecdefinition(_pid" in plan
    # exactly one SinglePartition exchange: the k-row offsets frame
    assert plan.count("Exchange SinglePartition") == 1
    # every Sort is within-partition (global flag false)
    for line in plan.splitlines():
        if "+- Sort [" in line:
            assert "], false, 0" in line, line
