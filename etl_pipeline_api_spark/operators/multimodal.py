"""Multimodal (image/audio/video) column plumbing (SURVEY.md §2.9).

Design: media payloads are opaque ``binary`` columns + a typed metadata
struct (modality, mime, width/height/duration, source uri). All Spark-side
plumbing — schema, partition sizing, Arrow batch shape, UDF signatures — is
real and tested; the actual codec calls are STUBBED (this container has no
image/audio libraries) behind ``decoder=`` injection points with a
deterministic fake, so swapping in PIL/ffmpeg later changes one function.

Patterns:
- attach_payload:   make a (binary, metadata) multimodal column pair from any
  source bytes; metadata is computed JVM-side (length, hashes) where possible.
- decode_features:  mapInPandas over Arrow batches — the 100 TB shape for
  per-item decode: batch-at-a-time, no per-row Python overhead, memory
  bounded by ``maxRecordsPerBatch`` not partition size.
- frame_sample:     deterministic pseudo frame sampling driven by metadata
  (real decoder slots into the same signature).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

METADATA_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType()),   # image|audio|video|text
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)


def attach_payload(
    df: DataFrame, bytes_col: str, modality: str, mime: str,
    width=None, height=None, duration_s=None,
) -> DataFrame:
    """Wrap raw bytes as a multimodal (payload, meta) column pair; n_bytes
    and content hash are computed JVM-side (no UDF)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(mime).alias("mime"),
            F.length(F.col(bytes_col)).cast("long").alias("n_bytes"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.lit(duration_s).cast("double").alias("duration_s"),
        ),
    ).withColumn("content_sha", F.sha2(F.col(bytes_col), 256))


def fake_decode(payload: bytes, meta: dict) -> np.ndarray:
    """Deterministic stand-in for a real image/audio decoder: derives a fixed
    8-dim feature vector from the payload bytes (sha256-seeded). Replace with
    PIL/torchvision/ffmpeg in production — same signature."""
    digest = hashlib.sha256(payload or b"").digest()
    return (np.frombuffer(digest[:32], dtype=np.uint8)[:8] / 255.0).astype(np.float64)


def real_decode(payload: bytes, meta: dict) -> np.ndarray:
    """The production decode slot. Not available in this container."""
    raise NotImplementedError(
        "media codecs (PIL/ffmpeg) are not installed in this environment; "
        "inject fake_decode or a real decoder via decode_features(decoder=...)"
    )


def decode_features(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    meta_col: str = "meta",
    decoder: Callable[[bytes, dict], np.ndarray] = fake_decode,
    feature_dim: int = 8,
) -> DataFrame:
    """Batch decode → feature vectors via mapInPandas (Arrow batches).

    Output: (id, features array<double>, feat_norm double). Each Arrow batch
    is decoded in one Python call; per-executor memory is bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch regardless of partition size.
    """
    from ..session import fan_out, ship_package

    ship_package(df.sparkSession)  # workers must import this module's decoder
    df = fan_out(df)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = [
                decoder(payload, meta)
                for payload, meta in zip(b[payload_col], b[meta_col])
            ]
            mat = np.stack(feats) if feats else np.zeros((0, feature_dim))
            yield pd.DataFrame(
                {
                    id_col: b[id_col],
                    "features": list(mat),
                    "feat_norm": np.round(np.linalg.norm(mat, axis=1), 6),
                }
            )

    out_schema = f"{id_col} long, features array<double>, feat_norm double"
    return df.select(id_col, payload_col, meta_col).mapInPandas(run, out_schema)


def frame_sample(
    df: DataFrame, id_col: str, meta_col: str = "meta", fps: float = 1.0
) -> DataFrame:
    """Deterministic frame-sampling plan for video payloads: one row per
    sampled frame timestamp, derived from metadata duration (JVM-side
    sequence/explode — the decoder only runs on the sampled frames,
    which is the point at 100 TB). Output: (id, frame_idx, t_s)."""
    n_frames = F.greatest(
        (F.col(f"{meta_col}.duration_s") * fps).cast("int"), F.lit(1)
    )
    return (
        df.filter(F.col(f"{meta_col}.modality") == "video")
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        )
        .withColumn("t_s", F.round(F.col("frame_idx") / fps, 3))
    )


def phash_fingerprints(
    feats: DataFrame, id_col: str, feature_dim: int = 8
) -> DataFrame:
    """pHash-style 64-bit perceptual fingerprint from decoded features
    (VERDICT r11 task 4).

    Classic pHash quantizes an image's low-frequency DCT coefficients
    and compares fingerprints by Hamming distance; here the decoder's
    feature vector plays the coefficient role (with a real decoder,
    inject one that returns the 8 lowest DCT coefficients — same
    signature, same plumbing). Each feature in [0, 1] is quantized to a
    byte (``floor(f*256)`` clamped) and GRAY-CODED (``q XOR q>>1``) so
    a small feature delta flips few bits — the property plain binary
    quantization lacks (127 vs 128 differ in 8 bits; Gray: 1) and the
    reason Hamming distance on the packed code tracks feature
    distance. The 8 Gray bytes pack into one signed 64-bit fingerprint
    (byte 7 sign-handled portably, so a DuckDB oracle reproduces the
    exact long), column-named ``simhash`` so the banded-candidate
    machinery (dedup.simhash_band_candidates) applies unchanged.

    Everything here is JVM-side Column arithmetic over the feature
    array — the only Python in the pipeline is the decoder batch UDF.
    """
    assert feature_dim == 8, "the 64-bit packing is 8 bytes by design"
    cols = [F.col(id_col)]
    for i in range(feature_dim):
        q = F.greatest(
            F.lit(0),
            F.least(
                F.lit(255),
                F.floor(F.col("features").getItem(i) * 256).cast("int"),
            ),
        )
        cols.append(q.bitwiseXOR(F.shiftright(q, 1)).alias(f"g{i}"))
    withg = feats.select(*cols)
    # byte 7 occupies bits 56-63: map [128, 255] to its negative two's-
    # complement value BEFORE the multiply so the arithmetic stays in
    # signed-long range on engines that overflow-check (DuckDB)
    fp = (
        F.when(F.col("g7") >= 128, F.col("g7") - 256)
        .otherwise(F.col("g7"))
        .cast("long")
        * F.lit(1 << 56)
    )
    for i in range(7):
        fp = fp + F.col(f"g{i}").cast("long") * F.lit(1 << (8 * i))
    return withg.select(F.col(id_col), fp.alias("simhash"))


def neardup_payloads(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    meta_col: str = "meta",
    decoder: Callable[[bytes, dict], np.ndarray] = fake_decode,
    hamming_max: int = 12,
    max_bucket: int | None = 64,
) -> DataFrame:
    """Perceptual near-dup pairs for multimodal payloads — the
    one-bit-re-encode case ``dedup_payloads`` (exact sha256) cannot see.

    Pipeline: Arrow-batched decode (``decode_features``) → Gray-coded
    pHash fingerprints (``phash_fingerprints``) → banded Hamming
    candidates via the simhash LSH machinery (equal 16-bit band ⇒
    candidate; hamming ≤ n_bands−1 guarantees a shared band, so the
    band join is a lossless filter for ``hamming_max < n_bands``
    thresholds per band width, and a high-recall one above) → exact
    Hamming filter JVM-side (``bit_count(xor)``). Linear shuffles
    end-to-end; ``max_bucket`` is the standard bucket-skew guard
    (oversized 16-bit-band clusters are the exact-dup case, handled by
    ``dedup_payloads`` first). Output: (id_a, id_b, hamming) with
    id_a < id_b.
    """
    from .dedup import simhash_band_candidates

    feats = decode_features(df, id_col, payload_col, meta_col, decoder)
    fp = phash_fingerprints(feats, id_col)
    cand = simhash_band_candidates(fp, id_col, n_bands=4, max_bucket=max_bucket)
    return cand.where(F.col("hamming") <= hamming_max)


def dedup_payloads(
    df: DataFrame, id_col: str, payload_col: str
) -> DataFrame:
    """Exact dedup of binary payloads — the multimodal twin of
    operators.dedup.dedup_exact (identical bytes ⇒ identical media;
    the first pass every image/audio corpus runs before any perceptual
    hashing).

    Group key is (octet length, sha256): the length pre-splits hash
    buckets so a (vanishingly unlikely) digest collision across
    different-sized payloads cannot merge groups, and both are
    row-local JVM projections. ONE map-combined shuffle produces per-
    content groups; output is the duplicate groups only:
    (content_sha, n_bytes, n_copies, keeper_id) with keeper = min id —
    deterministic, so an oracle can hash-match it.
    """
    hashed = df.select(
        F.col(id_col).alias("__id"),
        F.octet_length(F.col(payload_col)).cast("bigint").alias("n_bytes"),
        F.sha2(F.col(payload_col), 256).alias("content_sha"),
    )
    return (
        hashed.groupBy("content_sha", "n_bytes")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("__id").alias("keeper_id"),
        )
        .where(F.col("n_copies") >= 2)
    )
