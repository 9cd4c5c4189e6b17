"""Measure the sign-LSH -> IVF pair-finding crossover (VERDICT r10 task 7).

BENCH_SCALING.md states the qualitative ceiling: sign-LSH band buckets
can only take 2^w values, so at fixed recall its candidate mass is
~N^2/c (c = a constant set by the band geometry) while ivf_pairs with
K tracking N is ~linear. This harness turns "switch paths at ~N" into a
measured number: sweep corpus size, run both methods at EQUAL MEASURED
RECALL on a planted near-dup set, record wall time and the LSH candidate
mass, and report the N where the curves cross.

Protocol:
- corpus sizes are deterministic hash-prefix subsets of the sf1/sf10
  embeddings tables (20k/200k vectors, d=64);
- a 2% clone set is planted (vec_id + 1e9, coordinates perturbed by a
  deterministic per-coordinate sin ripple) giving known true pairs at
  cos ~0.99 — the near-dup regime (tau=0.9) where banding is viable at
  all; the corpus-native >=0.4 pairs need near-all-pairs candidates
  from ANY blocking scheme (see cosine_pairs_lsh's recall math);
- LSH config: 96 planes, width 8, 12 bands -> theory recall 0.988 at
  tau=0.9 (p = 1 - acos(.9)/pi = 0.857, 1-(1-p^8)^12), max_bucket=20000
  skew guard; IVF config: K = max(16, N/500), n_probe=2;
- a method-config whose banded candidate mass (sum of bucket^2 over
  band buckets, computed linearly BEFORE running) exceeds MASS_CAP is
  recorded as projected-infeasible with the measured mass instead of
  ground through;
- one warmup-free timed run per point (minutes-long runs; the sf10
  convention), count() forced.

Usage: python tools/bench_crossover.py            # writes JSON to stdout
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from etl_pipeline_api_spark.operators import similarity  # noqa: E402
from etl_pipeline_api_spark.session import get_spark  # noqa: E402

TAU = 0.9
N_PLANES, BAND_W = 96, 8
MASS_CAP = 5e8  # candidate pairs; ~several minutes of Arrow re-score


def planted_corpus(emb, num: int, den: int):
    """Deterministic ~num/den hash subset + 2% clones at cos ~0.99.

    Returns (corpus, true_pairs_df[id_a,id_b]). Subset by hash FILTER,
    not orderBy+limit — TakeOrderedAndProject merges every partition's
    top-n in ONE task, which ground for >10 min at the 200k point
    (first harness version). Clone ids are vec_id + 1_000_000_000; the
    perturbation is a per-coordinate multiplicative sin ripple
    (deterministic, engine-side)."""
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).filter(
        F.pmod(F.xxhash64(F.col("vec_id").cast("string")), F.lit(den)) < num
    )
    clones = base.filter(F.pmod(F.xxhash64(F.col("vec_id").cast("string")), F.lit(50)) == 0).select(
        (F.col("vec_id") + F.lit(1_000_000_000)).alias("vec_id"),
        F.transform(
            "v",
            lambda x, i: x * (1.0 + 0.02 * F.sin(F.col("vec_id") * 31 + i)),
        ).alias("v"),
    )
    corpus = base.unionByName(clones).localCheckpoint()
    truth = (
        corpus.filter(F.col("vec_id") >= 1_000_000_000)
        .select(
            (F.col("vec_id") - 1_000_000_000).alias("id_a"),
            F.col("vec_id").alias("id_b"),
        )
        .localCheckpoint()
    )
    return corpus, truth


def lsh_mass(corpus) -> float:
    """Banded candidate mass sum(bucket^2)/2 — linear pre-measurement."""
    rng_planes = similarity.np.random.RandomState(42).randn(N_PLANES, 64)
    pl = similarity._planes_lit(rng_planes)
    bits = F.concat_ws("", F.transform(
        pl,
        lambda p: F.when(similarity._dot(p, F.col("v")) >= 0, F.lit("1")).otherwise(F.lit("0")),
    ))
    banded = corpus.select(
        F.explode(similarity._band_array(bits, N_PLANES // BAND_W, BAND_W)).alias("band")
    )
    row = (
        banded.groupBy("band").agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") * F.col("n") / 2).alias("mass"))
        .first()
    )
    return float(row["mass"] or 0.0)


def recall_of(pairs, truth) -> float:
    n_truth = truth.count()
    if n_truth == 0:
        return float("nan")
    hit = pairs.join(truth, ["id_a", "id_b"]).count()
    return hit / n_truth


def main() -> int:
    spark = get_spark("bench-crossover")
    sizes = []
    sf1 = os.path.join(REPO, "testdata_sf1", "embeddings.parquet")
    sf10 = os.path.join(REPO, "testdata_sf10", "embeddings.parquet")
    if os.path.exists(sf1):
        sizes += [(5_000, 5, 20, sf1), (10_000, 10, 20, sf1), (20_000, 20, 20, sf1)]
    if os.path.exists(sf10):
        sizes += [(60_000, 6, 20, sf10), (200_000, 20, 20, sf10)]
    out = []
    for n, num, den, path in sizes:
        emb = spark.read.parquet(path)
        corpus, truth = planted_corpus(emb, num, den)
        n_corpus = corpus.count()  # materialize the checkpoint pre-timing
        n_truth = truth.count()
        rec = {"n": n, "n_corpus": n_corpus, "n_truth": n_truth}

        mass = lsh_mass(corpus)
        rec["lsh_mass"] = int(mass)
        if mass <= MASS_CAP:
            t0 = time.perf_counter()
            lsh = similarity.cosine_pairs_lsh(
                corpus, "vec_id", "v", threshold=TAU,
                n_planes=N_PLANES, band_width=BAND_W, max_bucket=20_000,
            )
            lsh_n = lsh.count()
            rec["lsh_s"] = round(time.perf_counter() - t0, 2)
            rec["lsh_recall"] = round(recall_of(lsh, truth), 4)
            rec["lsh_pairs"] = lsh_n
        else:
            rec["lsh_s"] = None
            rec["lsh_note"] = f"projected mass {mass:.1e} > cap {MASS_CAP:.0e}"

        K = max(16, n // 500)
        t0 = time.perf_counter()
        ivf = similarity.ivf_pairs(
            corpus, "vec_id", "v", threshold=TAU, n_centroids=K, n_probe=2,
        )
        ivf_n = ivf.count()
        rec["ivf_s"] = round(time.perf_counter() - t0, 2)
        rec["ivf_recall"] = round(recall_of(ivf, truth), 4)
        rec["ivf_pairs"] = ivf_n
        rec["ivf_k"] = K
        out.append(rec)
        print(json.dumps(rec), file=sys.stderr, flush=True)
    result = {"tau": TAU, "lsh": f"{N_PLANES}p/w{BAND_W}",
              "theory_recall": round(
                  1 - (1 - (1 - math.acos(TAU) / math.pi) ** BAND_W)
                  ** (N_PLANES // BAND_W), 4),
              "rows": out}
    print(json.dumps(result))
    # committed results file: tools/bench_scaling.write_md embeds the
    # crossover section from here, so regeneration preserves it
    with open(os.path.join(REPO, "tools", "crossover_results.json"), "w") as f:
        json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
