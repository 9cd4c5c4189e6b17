"""Corpus-curation pipeline (plans/corpus.py) — composition semantics.

The composed flow itself is oracle-checked end-to-end (op-corpus-curate,
exact-Jaccard path). These tests pin what the oracle can't express:
exact-dedup actually collapsing identical payloads, the MinHash scale
path agreeing with the exact path, and the Pipeline wrapper's write.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from etl_pipeline_api_spark.plans.corpus import build_corpus_pipeline, curate

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_exact_dedup_collapses_identical_texts(spark):
    docs = _docs(spark)
    # every text duplicated under a fresh doc_id: curation output must be
    # IDENTICAL to the single-copy corpus (copies share a fingerprint;
    # min doc_id — the original — survives the exact-dedup stage)
    doubled = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    assert _ids(curate(doubled)) == _ids(curate(docs))


def test_scale_path_matches_exact_path(spark):
    docs = _docs(spark)
    # MinHash LSH candidates (scale path) recover the exact-Jaccard pairs
    # on this corpus (unit-pinned recall 1.0), so the curated survivor
    # sets must be identical
    assert _ids(curate(docs, scale_path=True)) == _ids(curate(docs, scale_path=False))


def test_curation_is_monotone_and_keeps_representatives(spark):
    docs = _docs(spark)
    out = curate(docs)
    n_docs = docs.count()
    n_out = out.count()
    assert 0 < n_out < n_docs  # both filters and dedup actually fire
    # idempotence: curating the curated corpus changes nothing (filters
    # pass survivors, no dups remain)
    assert _ids(curate(out)) == _ids(out)


def test_pipeline_writes_curated_parquet(spark):
    out_dir = tempfile.mkdtemp(prefix="corpus_gold_")
    try:
        pipe = build_corpus_pipeline(SF, out_dir)
        results = pipe.run(spark)
        back = spark.read.parquet(out_dir)
        assert _ids(back) == _ids(results["curate"])
        # partitioned by source (hive layout)
        assert back.select("source").distinct().count() >= 1
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
