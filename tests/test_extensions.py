from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_pipeline_api_spark.operators import dedup, multimodal, similarity, text

DOCS = [
    Row(doc_id=0, text="the quick brown fox jumps over the lazy dog near the river bank"),
    Row(doc_id=1, text="the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of 0
    Row(doc_id=2, text="completely different content about spark query engines and shuffles here"),
    Row(doc_id=3, text="the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0
]


def test_exact_dedup(spark):
    df = spark.createDataFrame(DOCS)
    out = dedup.exact_dedup(df, ["text"], "doc_id")
    assert sorted(r.doc_id for r in out.collect()) == [0, 1, 2]


def test_ngram_jaccard_finds_near_dups(spark):
    df = spark.createDataFrame(DOCS)
    pairs = {(r.id_a, r.id_b): r.jaccard
             for r in dedup.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.5).collect()}
    assert (0, 3) in pairs and pairs[(0, 3)] == 1.0
    assert (0, 1) in pairs and 0.5 <= pairs[(0, 1)] < 1.0
    assert not any(2 in p for p in pairs)


def test_ngram_jaccard_short_docs(spark):
    # docs with < n tokens: Spark's sequence(1, 0) DESCENDS — these must
    # yield empty shingle sets, not an element_at out-of-bounds crash
    rows = [Row(doc_id=0, text="one two"), Row(doc_id=1, text="a b c d e f"),
            Row(doc_id=2, text="a b c d e f"), Row(doc_id=3, text="x")]
    df = spark.createDataFrame(rows)
    pairs = dedup.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.5).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in pairs] == [(1, 2, 1.0)]
    sets = {r["__id"]: r.n_sh for r in dedup.shingle_sets(df, "doc_id", "text").collect()}
    assert sets[0] == 0 and sets[3] == 0


def test_jaccard_pairs_from_sets_matches_direct(spark, sf_dir):
    """r12 optimization pin: exact pairs derived from the shared
    minhash_signature_sets frame must equal ngram_jaccard_pairs
    (max_df=None) row-for-row — including jaccard values — on a real
    corpus AND on short/empty-doc edge rows (the empty-set explode vs
    explode_outer+filter equivalence)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    direct = {(r.id_a, r.id_b): r.jaccard
              for r in dedup.ngram_jaccard_pairs(
                  docs, "doc_id", "text", threshold=0.5).collect()}
    sets = dedup.minhash_signature_sets(docs, "doc_id", "text")
    shared = {(r.id_a, r.id_b): r.jaccard
              for r in dedup.jaccard_pairs_from_sets(
                  sets, threshold=0.5).collect()}
    assert direct and shared == direct

    rows = [Row(doc_id=0, text="one two"), Row(doc_id=1, text="a b c d e"),
            Row(doc_id=2, text="a b c d e"), Row(doc_id=3, text=""),
            Row(doc_id=4, text=None)]
    edge = spark.createDataFrame(rows, "doc_id long, text string")
    direct_e = {(r.id_a, r.id_b, r.jaccard)
                for r in dedup.ngram_jaccard_pairs(
                    edge, "doc_id", "text", threshold=0.5).collect()}
    shared_e = {(r.id_a, r.id_b, r.jaccard)
                for r in dedup.jaccard_pairs_from_sets(
                    dedup.minhash_signature_sets(edge, "doc_id", "text"),
                    threshold=0.5).collect()}
    assert shared_e == direct_e == {(1, 2, 1.0)}


def test_minhash_recovers_exact_pairs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {(r.id_a, r.id_b)
             for r in dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()}
    approx = {(r.id_a, r.id_b)
              for r in dedup.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5).collect()}
    assert exact, "corpus should contain seeded near-dups"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"MinHash recall {recall} too low ({exact - approx})"


def test_minhash_bucket_cap_skew_guard(spark):
    """max_bucket drops degenerate band buckets: 40 identical docs form one
    hot bucket per band (40^2/2 candidates each); with the cap those pairs
    vanish while pairs in small buckets survive untouched."""
    rows = [Row(doc_id=i, text="the same boilerplate line repeated here") for i in range(40)]
    rows += [Row(doc_id=100, text="alpha beta gamma delta epsilon zeta eta"),
             Row(doc_id=101, text="alpha beta gamma delta epsilon zeta theta")]
    df = spark.createDataFrame(rows)
    uncapped = {(r.id_a, r.id_b)
                for r in dedup.minhash_lsh_pairs(df, "doc_id", "text", threshold=0.5).collect()}
    capped = {(r.id_a, r.id_b)
              for r in dedup.minhash_lsh_pairs(
                  df, "doc_id", "text", threshold=0.5, max_bucket=10).collect()}
    assert (100, 101) in uncapped and (100, 101) in capped
    assert any(a < 40 and b < 40 for a, b in uncapped)   # hot cluster found uncapped
    assert not any(a < 40 and b < 40 for a, b in capped)  # and dropped under the cap
    assert capped <= uncapped


def test_cosine_lsh_bucket_cap_skew_guard(spark):
    import numpy as np

    from etl_pipeline_api_spark.operators import similarity

    rng = np.random.RandomState(3)
    hot = [1.0] * 16
    vecs = [(i, hot) for i in range(30)]  # identical cluster -> hot buckets
    vecs += [(100 + i, [float(x) for x in rng.randn(16)]) for i in range(20)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    capped = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_pairs_lsh(
            df, "vec_id", "embedding", threshold=0.9, max_bucket=10
        ).collect()
    }
    assert not any(a < 30 and b < 30 for a, b in capped)


def test_connected_components_transitive(spark):
    # A~B, B~C, (A~C never emitted) must still collapse into one cluster
    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=2, id_b=3), Row(id_a=10, id_b=11)]
    )
    comp = {r.node: r.component
            for r in dedup.connected_components(pairs, "id_a", "id_b").collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_simhash_fingerprints(spark):
    df = spark.createDataFrame(DOCS)
    fps = {r.doc_id: r.simhash for r in dedup.simhash(df, "doc_id", "text").collect()}
    assert fps[0] == fps[3]  # identical text → identical fingerprint
    ham01 = bin((fps[0] ^ fps[1]) & (2**64 - 1)).count("1")
    ham02 = bin((fps[0] ^ fps[2]) & (2**64 - 1)).count("1")
    assert ham01 < ham02  # near-dup closer than unrelated
    cands = dedup.simhash_band_candidates(
        dedup.simhash(df, "doc_id", "text"), "doc_id"
    ).collect()
    assert {(r.id_a, r.id_b) for r in cands if r.hamming == 0} == {(0, 3)}


def test_cosine_topk_and_lsh_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {(r.query_id, r.neighbor_id)
             for r in similarity.cosine_topk(emb, queries, "vec_id", "embedding", k=3).collect()}
    assert len(exact) == 15  # 5 queries x top-3, self excluded
    approx = {(r.query_id, r.neighbor_id)
              for r in similarity.lsh_topk(emb, queries, "vec_id", "embedding", k=3).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"LSH recall {recall}"


def test_ivf_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {(r.query_id, r.neighbor_id)
             for r in similarity.cosine_topk(emb, queries, "vec_id", "embedding", k=3).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in similarity.ivf_topk(emb, queries, "vec_id", "embedding",
                                           k=3, n_centroids=8, n_probe=4).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"IVF recall {recall}"  # probing half the cells
    # IVF must return results for every query
    assert {q for q, _ in approx} == {0, 1, 2, 3, 4}


def test_cosine_pairs_threshold(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0]),
        Row(vec_id=1, embedding=[0.9, 0.1, 0.0]),   # cos(0,1) ~ 0.9939
        Row(vec_id=2, embedding=[0.0, 1.0, 0.0]),   # orthogonal
    ]
    df = spark.createDataFrame(rows)
    pairs = {(r.id_a, r.id_b) for r in
             similarity.cosine_pairs(df, "vec_id", "embedding", threshold=0.9).collect()}
    assert pairs == {(0, 1)}


def test_text_ops_deterministic(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="The cat and the dog!  ")])
    stats = text.token_stats(df, "doc_id", "text").collect()[0]
    assert stats.n_tokens == 5
    assert stats.n_bpe_tokens == 6  # 5 words + '!'
    assert stats.n_distinct_tokens == 4  # 'the' twice after lowering
    q = text.quality_score(df, "doc_id", "text").collect()[0]
    assert 0.0 <= q.quality <= 1.0
    lang = text.langid(df, "doc_id", "text").collect()[0]
    assert lang.lang_guess == "en"


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame([
        Row(doc_id=0, text="hello   world"),
        Row(doc_id=1, text="  hello world "),
        Row(doc_id=2, text="hello worlds"),
    ])
    fps = {r.doc_id: r.fingerprint for r in text.fingerprint(df, "doc_id", "text").collect()}
    assert fps[0] == fps[1]  # whitespace-normalized
    assert fps[0] != fps[2]


def test_multimodal_plumbing(spark):
    df = spark.createDataFrame([Row(item_id=0, raw=b"fake-image-bytes"),
                                Row(item_id=1, raw=b"")])
    wrapped = multimodal.attach_payload(df, "raw", "image", "image/png", width=64, height=64)
    meta = wrapped.select("meta.*", "content_sha").collect()
    assert [m.n_bytes for m in meta] == [16, 0]
    assert all(m.modality == "image" and len(r.content_sha) == 64
               for m, r in zip(meta, wrapped.select("meta.*", "content_sha").collect()))

    feats = multimodal.decode_features(
        wrapped.withColumnRenamed("raw", "payload"), "item_id"
    ).collect()
    assert {len(r.features) for r in feats} == {8}
    assert all(r.feat_norm > 0 for r in feats)
    # deterministic: same payload → same features
    again = multimodal.decode_features(
        wrapped.withColumnRenamed("raw", "payload"), "item_id"
    ).collect()
    assert sorted(r.features for r in feats) == sorted(r.features for r in again)


def test_multimodal_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.real_decode(b"x", {})


def _make_byte_decoder():
    """Locality-preserving stand-in for a perceptual decoder: features =
    the first 8 payload bytes / 255 (a real pHash decoder returns low-
    frequency DCT coefficients — near-identical media give near features;
    sha-avalanche fake_decode deliberately does NOT, so the perceptual
    property is pinned through the injection point). Returned as a
    CLOSURE so cloudpickle ships it by value — a module-level test
    function would serialize by reference to a module the executors
    cannot import."""

    def decode(payload, meta):
        import numpy as np

        return (
            np.frombuffer(
                (payload or b"")[:8].ljust(8, b"\0"), dtype=np.uint8
            )
            / 255.0
        )

    return decode


def test_multimodal_neardup_pairs_near_payload_not_unrelated(spark):
    # A and B differ by one quantization step in ONE feature byte (a
    # one-bit-re-encode analog); C is unrelated. Gray coding keeps the
    # A-B Hamming distance tiny (shared bands -> candidate -> kept);
    # C shares no band with either and must not pair.
    a = bytes([10, 20, 30, 40, 50, 60, 70, 80])
    b = bytes([10, 20, 30, 40, 50, 60, 70, 81])
    c = bytes([200, 150, 99, 3, 250, 17, 128, 64])
    df = spark.createDataFrame(
        [Row(item_id=0, payload=a), Row(item_id=1, payload=b),
         Row(item_id=2, payload=c)]
    )
    wrapped = multimodal.attach_payload(df, "payload", "image", "image/png")
    pairs = multimodal.neardup_payloads(
        wrapped, "item_id", decoder=_make_byte_decoder()
    ).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(0, 1)]
    assert pairs[0].hamming <= 2  # one Gray step in one byte


def test_multimodal_neardup_exact_dup_hamming_zero(spark):
    # byte-identical payloads fingerprint identically: hamming 0 through
    # the full banded pipeline (the exact-dedup case stays visible here)
    p = bytes(range(8))
    df = spark.createDataFrame(
        [Row(item_id=7, payload=p), Row(item_id=3, payload=p)]
    )
    wrapped = multimodal.attach_payload(df, "payload", "image", "image/png")
    pairs = multimodal.neardup_payloads(
        wrapped, "item_id", decoder=_make_byte_decoder()
    ).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in pairs] == [(3, 7, 0)]


def test_multimodal_phash_gray_locality(spark):
    # the Gray-coding property the fingerprint depends on: adjacent
    # quantization levels differ in exactly ONE bit, while plain binary
    # can flip 8 (127 vs 128) — pin it at the worst-case boundary
    df = spark.createDataFrame(
        [
            Row(item_id=0, features=[127 / 255.0] + [0.0] * 7),
            Row(item_id=1, features=[128 / 255.0] + [0.0] * 7),
        ]
    )
    fps = {
        r.item_id: r.simhash
        for r in multimodal.phash_fingerprints(df, "item_id").collect()
    }
    assert bin(fps[0] ^ fps[1]).count("1") == 1


def test_frame_sample(spark):
    df = spark.createDataFrame([Row(vid_id=0, raw=b"fake-video")])
    wrapped = multimodal.attach_payload(df, "raw", "video", "video/mp4", duration_s=3.0)
    frames = multimodal.frame_sample(wrapped, "vid_id", fps=2.0).collect()
    assert len(frames) == 6
    assert [r.t_s for r in frames] == [0.0, 0.5, 1.0, 1.5, 2.0, 2.5]
