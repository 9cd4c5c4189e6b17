"""similarity.pq_encode / pq_adc_topk — product quantization
(queries_rel18 hash-pins codes and ADC ranks against DuckDB; these
tests pin the operator semantics on constructed corpora)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from etl_pipeline_api_spark.operators import similarity


def _corpus(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


@pytest.fixture(scope="module")
def clustered(spark):
    # 3 tight clusters in 8-d, 6 points each: PQ with m=2,k=4 must keep
    # clustermates closer than cross-cluster points even after coding
    rng = np.random.RandomState(7)
    centers = rng.randn(3, 8) * 10
    vecs = [c + rng.randn(8) * 0.01 for c in centers for _ in range(6)]
    return _corpus(spark, vecs)


def test_codes_shape_and_range(clustered):
    rows = similarity.pq_encode(
        clustered, "vec_id", "embedding", m=2, k=4
    ).collect()
    assert len(rows) == 18
    for r in rows:
        assert len(r["codes"]) == 2
        assert all(0 <= c < 4 for c in r["codes"])


def test_encode_deterministic(clustered):
    a = {r["id"]: r["codes"] for r in
         similarity.pq_encode(clustered, "vec_id", "embedding", m=2, k=4).collect()}
    b = {r["id"]: r["codes"] for r in
         similarity.pq_encode(clustered, "vec_id", "embedding", m=2, k=4).collect()}
    assert a == b


def test_codes_stay_in_cluster(clustered):
    # full-corpus codebook (k=18): clusters are 3000x tighter than the
    # inter-cluster gap, so every point's nearest centroid subvector
    # must come from a clustermate — in EVERY subspace
    rows = similarity.pq_encode(
        clustered, "vec_id", "embedding", m=2, k=18
    ).collect()
    cent_rows = (
        clustered.select("vec_id")
        .orderBy(F.md5(F.col("vec_id").cast("string")))
        .limit(18)
        .collect()
    )
    cent_cluster = [r["vec_id"] // 6 for r in cent_rows]
    for r in rows:
        for code in r["codes"]:
            assert cent_cluster[code] == r["id"] // 6


def test_recon2_matches_numpy(clustered):
    enc = similarity.pq_encode(
        clustered, "vec_id", "embedding", m=2, k=4, with_recon2=True
    ).collect()
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in clustered.collect()}
    cents = similarity._pq_centroids(clustered, "vec_id", "embedding", 4, 8)
    for r in enc:
        v = vecs[r["id"]]
        expect = 0.0
        for s, code in enumerate(r["codes"]):
            expect += ((v[s * 4:(s + 1) * 4] - cents[code][s * 4:(s + 1) * 4]) ** 2).sum()
        assert r["recon2"] == pytest.approx(expect, rel=1e-12)


def test_adc_topk_recovers_clusters(clustered):
    res = similarity.pq_adc_topk(
        clustered, clustered.filter(F.col("vec_id") < 3),
        "vec_id", "embedding", k_neighbors=5, m=2, k=6,
    ).collect()
    assert len(res) == 15  # 3 queries x top-5
    for r in res:
        assert r["query_id"] // 6 == r["neighbor_id"] // 6  # same cluster


def test_empty_corpus(spark):
    empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    out = similarity.pq_encode(empty, "vec_id", "embedding", m=2, k=4)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["id", "codes"]


def test_bad_dim_raises(clustered):
    with pytest.raises(ValueError, match="not divisible"):
        similarity.pq_encode(clustered, "vec_id", "embedding", m=3, k=4)
