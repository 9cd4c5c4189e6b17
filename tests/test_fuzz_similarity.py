"""Adversarial fuzz for the similarity kernel family (VERDICT r11 task 5).

The r11 edge-input bugs (b0ac279's ADC LUT stride on small codebooks; the
sf1 pq-quality gate redesign) both came from inputs the unit suite never
planted. This sweep feeds the PQ/IVF/LSH/cosine kernels the degenerate
shapes a 100 TB corpus WILL contain — zero vectors, constant vectors,
all-identical clusters, dim-1 subspaces, k > N, empty query/probe sets,
empty corpora — and asserts the STRUCTURAL gates hold or fail loudly:

- subset-of-exact: every approximate pair/neighbor set is drawn from the
  exact universe (IVF/LSH/PQ never invent a pair);
- probe monotonicity: ivf_topk recall is non-decreasing in n_probe, and
  probing every cell reproduces the exact top-k verbatim;
- ADC near-optimality (the op-pq-quality theorem) on adversarial data:
  sqrt(adist(pick)) <= sqrt(exact d2(true top-1)) + 2*max reconstruction
  error — quantized search can only be off by quantization, never more;
- zero-norm vectors rank last / never pair (cosine undefined -> NULL,
  not a task-killing ANSI divide or a silent 1.0);
- schema-correct empties for empty corpus / empty queries.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_pipeline_api_spark.operators import similarity

DIM = 8


def _vecs_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def _random_vecs(n, dim=DIM, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randn(n, dim)


def _exact_pairs(vecs, threshold):
    out = set()
    for a in range(len(vecs)):
        for b in range(a + 1, len(vecs)):
            na, nb = np.linalg.norm(vecs[a]), np.linalg.norm(vecs[b])
            if na == 0 or nb == 0:
                continue
            if float(np.dot(vecs[a], vecs[b]) / (na * nb)) >= threshold:
                out.add((a, b))
    return out


def _exact_topk(vecs, qids, k):
    out = set()
    for q in qids:
        nq = np.linalg.norm(vecs[q])
        scored = []
        for c in range(len(vecs)):
            if c == q:
                continue
            nc = np.linalg.norm(vecs[c])
            cos = (
                float(np.dot(vecs[q], vecs[c]) / (nq * nc))
                if nq and nc
                else float("-inf")
            )
            scored.append((-cos, c))
        for _, c in sorted(scored)[:k]:
            out.add((q, c))
    return out


# ------------------------------------------------------- zero vectors

def test_zero_vectors_never_pair_and_rank_last(spark):
    vecs = np.vstack([_random_vecs(6), np.zeros((2, DIM))])
    df = _vecs_df(spark, vecs)
    # cosine_pairs' documented zero-norm convention is the CLAMP (a zero
    # vector scores cosine 0 against everything), so at any POSITIVE
    # threshold a zero vector must never pair — and the surviving pair
    # set must equal the exact universe
    got = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_pairs(
            df, "vec_id", "embedding", threshold=0.5
        ).collect()
    }
    assert not any(6 in p or 7 in p for p in got)
    assert got == _exact_pairs(vecs, 0.5)
    # topk from a zero-vector query: neighbors still ranked (NULL cos
    # ranks last), no ANSI divide-by-zero task kill
    q = df.filter(F.col("vec_id") == 6)
    rows = similarity.cosine_topk(df, q, "vec_id", "embedding", k=3).collect()
    assert len(rows) == 3 and all(r.query_id == 6 for r in rows)


def test_all_zero_corpus_pq_and_ivf_no_crash(spark):
    df = _vecs_df(spark, np.zeros((5, DIM)))
    codes = similarity.pq_encode(df, "vec_id", "embedding", m=4, k=4).collect()
    assert len(codes) == 5
    # all-identical (zero) vectors quantize identically, code 0 everywhere
    assert {tuple(r.codes) for r in codes} == {(0, 0, 0, 0)}
    got = similarity.ivf_topk(
        df, df.limit(2), "vec_id", "embedding", k=2, n_centroids=4, n_probe=4
    ).collect()
    # cosine undefined everywhere -> NULL ranks; row_number still yields k
    assert len(got) == 4


# -------------------------------------------------- all-identical corpus

def test_identical_corpus_pairs_complete_and_ties_deterministic(spark):
    vecs = np.tile(_random_vecs(1), (6, 1))
    df = _vecs_df(spark, vecs)
    want = {(a, b) for a in range(6) for b in range(a + 1, 6)}
    exact = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_pairs(
            df, "vec_id", "embedding", threshold=0.99
        ).collect()
    }
    assert exact == want
    # blocked kernel agrees with the naive one on the degenerate cluster
    blocked = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_pairs_blocked(
            df, "vec_id", "embedding", threshold=0.99
        ).collect()
    }
    assert blocked == want
    # adc top-k on an all-identical corpus: pure tie -> neighbor_id order
    topk = similarity.pq_adc_topk(
        df, df.limit(1), "vec_id", "embedding", k_neighbors=3, m=4, k=4
    ).collect()
    assert [(r.rank, r.neighbor_id) for r in sorted(topk, key=lambda r: r.rank)] == [
        (1, 1), (2, 2), (3, 3)
    ]


# ------------------------------------------------- k > N / tiny corpora

def test_k_exceeds_corpus_everywhere(spark):
    vecs = _random_vecs(3)
    df = _vecs_df(spark, vecs)
    topk = similarity.cosine_topk(df, df, "vec_id", "embedding", k=10).collect()
    assert len(topk) == 3 * 2  # N-1 neighbors each, no crash
    ivf = similarity.ivf_topk(
        df, df, "vec_id", "embedding", k=10, n_centroids=16, n_probe=16
    ).collect()
    assert len(ivf) == 3 * 2
    adc = similarity.pq_adc_topk(
        df, df, "vec_id", "embedding", k_neighbors=10, m=4, k=16
    ).collect()
    assert len(adc) == 3 * 2


def test_pq_codebook_larger_than_corpus_stride(spark):
    # the b0ac279 regression class: requested k=16 centroids, corpus of 5
    # -> k_eff=5; codes and LUT strides must use the ACTUAL size
    vecs = _random_vecs(5)
    df = _vecs_df(spark, vecs)
    codes = similarity.pq_encode(df, "vec_id", "embedding", m=4, k=16).collect()
    assert len(codes) == 5
    assert all(0 <= c < 5 for r in codes for c in r.codes)
    got = similarity.pq_adc_topk(
        df, df.limit(2), "vec_id", "embedding", k_neighbors=2, m=4, k=16
    ).collect()
    assert len(got) == 4  # 2 queries x 2 neighbors, no element_at OOB


# ----------------------------------------------------- dim-1 subspaces

def test_pq_dim1_subspaces_exact_roundtrip(spark):
    # dim == m -> every subspace is a single float; ADC distance equals
    # the exact squared L2 to the quantized vector, and with k >= distinct
    # values the quantization is lossless -> ADC top-1 IS the exact top-1
    vecs = _random_vecs(6, dim=4, seed=11)
    df = _vecs_df(spark, vecs)
    codes = similarity.pq_encode(df, "vec_id", "embedding", m=4, k=6).collect()
    assert len(codes) == 6 and all(len(r.codes) == 4 for r in codes)
    got = similarity.pq_adc_topk(
        df, df, "vec_id", "embedding", k_neighbors=1, m=4, k=6
    ).collect()
    want = {}
    for qi in range(6):
        d2 = {
            c: float(np.sum((vecs[qi] - vecs[c]) ** 2))
            for c in range(6)
            if c != qi
        }
        want[qi] = min(d2, key=lambda c: (d2[c], c))
    assert {r.query_id: r.neighbor_id for r in got} == want


def test_pq_rejects_indivisible_dim(spark):
    df = _vecs_df(spark, _random_vecs(4, dim=6))
    with pytest.raises(ValueError, match="not divisible"):
        similarity.pq_encode(df, "vec_id", "embedding", m=4, k=4)


# ------------------------------------------- empty corpus / empty queries

def test_empty_corpus_schema_correct_everywhere(spark):
    df = _vecs_df(spark, np.zeros((0, DIM)))
    for out in (
        similarity.pq_encode(df, "vec_id", "embedding", m=4, k=4),
        similarity.pq_adc_topk(df, df, "vec_id", "embedding", m=4, k=4),
        similarity.ivf_topk(df, df, "vec_id", "embedding"),
        similarity.cosine_pairs(df, "vec_id", "embedding", threshold=0.5),
    ):
        assert out.count() == 0
        assert len(out.schema) >= 2  # schema survives, not a bare empty


def test_empty_query_set_yields_empty_not_error(spark):
    df = _vecs_df(spark, _random_vecs(6))
    empty_q = df.filter(F.col("vec_id") < 0)
    assert (
        similarity.ivf_topk(df, empty_q, "vec_id", "embedding", k=3).count()
        == 0
    )
    assert (
        similarity.pq_adc_topk(
            df, empty_q, "vec_id", "embedding", k_neighbors=3, m=4, k=4
        ).count()
        == 0
    )
    assert (
        similarity.cosine_topk(df, empty_q, "vec_id", "embedding", k=3).count()
        == 0
    )


# --------------------------------------------------- structural gates

def test_ivf_pairs_subset_of_exact_with_zero_and_dup_vectors(spark):
    vecs = np.vstack(
        [_random_vecs(20, seed=3), np.zeros((2, DIM)),
         np.tile(_random_vecs(1, seed=3), (3, 1))]
    )
    df = _vecs_df(spark, vecs)
    exact = _exact_pairs(vecs, 0.8)
    approx = {
        (r.id_a, r.id_b)
        for r in similarity.ivf_pairs(
            df, "vec_id", "embedding", threshold=0.8, n_centroids=4, n_probe=2
        ).collect()
    }
    assert approx <= exact  # IVF may miss, must never invent
    dup_pairs = {(20 + 2 + a, 20 + 2 + b) for a in range(3) for b in range(a + 1, 3)}
    assert dup_pairs <= approx  # identical vectors share a cell by definition


def test_ivf_probe_monotonicity_and_full_probe_equals_exact(spark):
    vecs = _random_vecs(24, seed=5)
    df = _vecs_df(spark, vecs)
    qids = [0, 1, 2]
    q = df.filter(F.col("vec_id") < 3)
    exact = _exact_topk(vecs, qids, k=3)
    recalls = []
    for n_probe in (1, 2, 4, 8):
        got = {
            (r.query_id, r.neighbor_id)
            for r in similarity.ivf_topk(
                df, q, "vec_id", "embedding", k=3,
                n_centroids=8, n_probe=n_probe,
            ).collect()
        }
        assert got <= exact or n_probe < 8  # partial probe may substitute
        recalls.append(len(got & exact) / len(exact))
    assert all(a <= b + 1e-9 for a, b in zip(recalls, recalls[1:])), recalls
    # probing every cell scans the whole corpus -> exact top-k verbatim
    full = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_topk(
            df, q, "vec_id", "embedding", k=3, n_centroids=8, n_probe=8
        ).collect()
    }
    assert full == exact


def test_adc_near_optimality_theorem_on_adversarial_corpus(spark):
    # the op-pq-quality bound, re-checked on data WITH zero vectors and a
    # duplicated cluster: sqrt(exact d2 of the ADC pick) <= sqrt(exact d2
    # of the true top-1) + 2 * max reconstruction error
    vecs = np.vstack(
        [_random_vecs(12, seed=9), np.zeros((1, DIM)),
         np.tile(_random_vecs(1, seed=9), (2, 1))]
    )
    df = _vecs_df(spark, vecs)
    recon = similarity.pq_encode(
        df, "vec_id", "embedding", m=4, k=8, with_recon2=True
    ).collect()
    max_recon = max(math.sqrt(max(r.recon2, 0.0)) for r in recon)
    picks = similarity.pq_adc_topk(
        df, df, "vec_id", "embedding", k_neighbors=1, m=4, k=8
    ).collect()
    assert len(picks) == len(vecs)
    for r in picks:
        qv = vecs[r.query_id]
        d_pick = math.sqrt(float(np.sum((qv - vecs[r.neighbor_id]) ** 2)))
        d_true = min(
            math.sqrt(float(np.sum((qv - vecs[c]) ** 2)))
            for c in range(len(vecs))
            if c != r.query_id
        )
        assert d_pick <= d_true + 2 * max_recon + 1e-9, (
            r.query_id, d_pick, d_true, max_recon
        )


def test_lsh_pairs_subset_of_exact_with_constant_vectors(spark):
    # constant-value vectors all point the same direction: every pair is
    # cosine 1.0; LSH must surface them (identical sign pattern) and the
    # random tail must stay inside the exact universe
    vecs = np.vstack([np.full((4, DIM), 2.5), _random_vecs(16, seed=13)])
    df = _vecs_df(spark, vecs)
    exact = _exact_pairs(vecs, 0.9)
    got = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_pairs_lsh(
            df, "vec_id", "embedding", threshold=0.9
        ).collect()
    }
    assert got <= exact
    const_pairs = {(a, b) for a in range(4) for b in range(a + 1, 4)}
    assert const_pairs <= got


def test_wrong_dim_vector_fails_loudly_not_silently(spark):
    rows = [(0, [1.0] * DIM), (1, [1.0] * (DIM - 1))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="dim"):
        similarity.pq_encode(
            df, "vec_id", "embedding", m=4, k=2, dim=DIM
        ).collect()
