"""Scaling-curve bench: the same headline queries at sf0.1 AND sf1 (10×).

A single-point bench can hide a superlinear operator (it looks identical
at one scale factor); this runs the heavy/representative set at both
scale points and reports the sf1/sf0.1 runtime ratio per query. With a
10× data factor on 32 local cores:

- ratio ≲ 12×: linear-or-better (small constants amortize; AQE coalesce
  shifts work between task counts — anything near 10 is healthy);
- 12× < ratio ≤ 15×: WATCH — re-read the plan at sf1;
- ratio > 15×: SUPERLINEAR — a plan fix or a documented output-size
  cause is required (the gate treats it as a defect).

Deliberately excluded: op-dedup-embedding* / op-sim-search-lsh at the
repo's 0.4 cosine test threshold — at d=64, packing 10× more unit
vectors makes the ≥0.4 PAIR OUTPUT itself grow superlinearly (geometry,
not plan; see tools/gen_scale.py). Their scale story is the recall-gated
LSH/IVF paths whose candidate sets are banded by construction.

Known output-driven superlinears (documented, not plan defects — each
has a measured linear scale path):

- op-dedup-fuzzy: the EXACT shared-shingle pair baseline. Candidates are
  Θ(Σ_shingle df²); the synthetic corpus has a bounded ~30-word vocab,
  so df grows with the corpus and candidates grow quadratically. On real
  corpora vocabulary grows too, but the op is still the exactness
  baseline, not the scale path — that is op-dedup-minhash (banded LSH,
  measured ~10× at 10× data), plus the max_df stop-shingle guard the
  operator exposes for hot keys.

Usage:
    python tools/gen_scale.py          # once: builds ./testdata_sf1
    python tools/bench_scaling.py      # all queries -> BENCH_SCALING.md
    python tools/bench_scaling.py op-a op-b   # subset (results accumulate
        in .scratch/scaling_results.jsonl; the md is rebuilt from the
        latest result per query, so long runs can be split across calls)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", os.path.join(REPO, "testdata_sf1"))
SF10 = os.environ.get("SPARK_GRAFT_SF10_DIR", os.path.join(REPO, "testdata_sf10"))
DATA_FACTOR = 10.0
WATCH, SUPER = 12.0, 15.0

# Second decade (r8): sf1 -> sf10 for the heavy family. One decade of
# evidence says "linear at 10x"; two say the CURVE is flat — constants
# amortized, no hidden quadratic waking up past the first decade. Mode:
#     SCALE_MODE=sf10 python tools/bench_scaling.py [names...]
# sf10 runs are minutes-long, so this mode measures ONE timed run after
# one warmup (scheduler wobble is invisible at that duration) and writes
# a second table into BENCH_SCALING.md from its own results file.

QUERIES_TO_SCALE = [
    # heaviest from the round-5 board
    "op-corpus-curate-full", "op-bootstrap-ci", "op-graph-bfs",
    "op-pagerank", "op-corpus-curate", "op-dedup-minhash",
    "op-tpch-q21", "op-span-dup-stats", "op-interval-overlap",
    # join/agg representatives + verdict watch-list
    "op-tpch-q7", "op-tpch-q9", "op-dedup-fuzzy", "op-sessionize",
    "op-groupby-sum", "op-line-dedup", "op-decontaminate",
    # new partsupp shape (constant fan-out build must stay linear)
    "op-tpch-q2",
    # exact top-k ANN baseline (broadcast queries, linear corpus pass)
    "op-sim-search",
    # round-6 determinism fixes: the localCheckpoint pin adds a full
    # materialization to the range-exchange ops, and simhash gained the
    # max_bucket guard — verify each stays linear at 10x
    "op-row-index", "op-peak-concurrency", "op-dedup-simhash",
    # streaming family (r10, VERDICT r9 task 3): op-stream-stream-join is
    # the single slowest bench query (5.2 s sf0.1) and the family had no
    # committed scaling row — measure whether the cost is the
    # per-micro-batch machinery floor (expected: flat-ish, ratio << 10)
    # or grows with data. AvailableNow over the flat events file drains
    # in few micro-batches, so the ratio reads state+shuffle growth.
    "op-stream-stream-join", "op-stream-stateful",
    # r11: PQ encode is the new zero-shuffle scan-only family member —
    # its ratio should read the pure scan/codegen growth; pq-topk adds
    # the ADC crossJoin + one window shuffle over the coded corpus
    "op-pq-encode", "op-pq-topk",
    # r12 (VERDICT r11 task 6): the r11 batch-19 ops' first scaling rows —
    # grouped regression (per-group applyInPandas over sufficient stats),
    # KS (distinct-value window; the documented all-distinct single-task
    # ceiling is the thing to watch), chi2 (joint groupBy + tiny window),
    # PMI (bigram explode + two group-bys), containment (shingle join
    # under the df<=64 guard), and the r12 perceptual near-dup (decode
    # UDF + band self-join)
    "op-grouped-regression", "op-ks-drift", "op-chi2-independence",
    "op-pmi-bigrams", "op-containment-dedup", "op-multimodal-neardup",
    # r12 second batch: the sketch family (state bounded by d*w or m/32
    # regardless of input — the ratio should read pure scan growth) and
    # the broadcast-anchor negative sampler
    "op-countmin-freq", "op-bloom-semijoin", "op-stream-countmin",
    "op-negative-sampling",
]

# query -> documented output-driven cause; reported but not counted as a
# plan defect (see module docstring)
EXPECTED_SUPERLINEAR = {
    "op-dedup-fuzzy": "exact shared-shingle baseline: candidates are "
                      "Θ(Σ df²), quadratic under the corpus's bounded "
                      "vocab; scale path = op-dedup-minhash (banded LSH, "
                      "~10× measured) + the operator's max_df guard.",
    # r10: crossed the 12x watch line (13.2x; was 9.6x r9 — the driver
    # regenerates sf0.1 each round, moving the dup-density constant).
    # Measured cause on current data: the query's recall gate embeds the
    # UNGUARDED exact-Jaccard anchor (its oracle's own derivation,
    # max_df=None), whose candidate mass Σ df² = 2.79M at sf0.1 →
    # 202.6M at sf1 — 72.6× mass at 10× data under gen_scale's bounded
    # vocab. The LSH pipeline itself is the scale path and is measured
    # separately (path-minhash-lsh, 5.8×/decade at sf10 with the
    # max_bucket guard); the anchor is verification apparatus that a
    # production run never executes.
    "op-dedup-minhash": "recall-gate apparatus: the embedded UNGUARDED "
                        "exact-Jaccard anchor's candidate mass is "
                        "Θ(Σ df²) = 2.79M (sf0.1) → 202.6M (sf1), 72.6× "
                        "at 10× data; the production path (banded LSH + "
                        "max_bucket) is measured separately as "
                        "path-minhash-lsh at 5.8×/decade.",
    # r12, measured at the second decade: the dual-path gate's
    # exact-Jaccard branch (ngram_jaccard_pairs, deliberately unguarded
    # — it IS the anchor the LSH path is gated against) has candidate
    # mass Σ df² = 11.68M on the sf1 gate sample → 848.4M on the sf10
    # gate sample: 72.6× at 9.8× sampled docs, the bounded-vocab
    # quadratic (distinct shingles grew only 1.76×, so per-shingle df
    # grows ~linearly). The production stages of this query — prefix,
    # MinHash-LSH pairs, tails — are all measured linear elsewhere
    # (path-minhash-lsh, op-dedup-fuzzy, op-line-dedup).
    "op-corpus-curate-full": "dual-path gate apparatus: the exact-"
                             "Jaccard branch's candidate mass is "
                             "Θ(Σ df²) = 11.68M (sf1 sample) → 848.4M "
                             "(sf10 sample), 72.6× at 9.8× docs under "
                             "the generator's bounded vocab; the "
                             "production path (prefix + banded LSH + "
                             "tails) is measured linear as "
                             "path-minhash-lsh / op-dedup-fuzzy / "
                             "op-line-dedup.",
}


def force(df) -> None:
    """Execute the full plan on executors WITHOUT materializing to the
    driver (same noop sink as bench.py): for near-full-table outputs
    (op-row-index is ~500k wide rows at sf1) a .collect() would measure
    py4j row transfer, not the plan, and risks driver OOM at sf1."""
    df.write.format("noop").mode("overwrite").save()


def median3(fn) -> float:
    force(fn())  # warmup (scans cached, codegen jitted)
    ts = []
    for _ in range(3):
        t0 = time.time()
        force(fn())
        ts.append(time.time() - t0)
    return sorted(ts)[1]


MODE = os.environ.get("SCALE_MODE", "sf1")

SF10_QUERIES = [
    # the r8 heavy set, minus ops triaged out below:
    # - op-semdedup is measured as path-semdedup-k-scaled: the registered
    #   query pins k=4 for its oracle, making its own growth ~N^2/4 BY
    #   CONSTRUCTION — the operator's scale contract is k tracking N.
    # - op-dedup-minhash / op-dedup-simhash / op-corpus-curate /
    #   op-lsh-tuning embed the deliberately
    #   UNGUARDED exact n-gram Jaccard reference (their oracles' anchor).
    #   Under the generator's bounded vocab its candidate mass is
    #   Theta(Sum df^2) — measured: >60 GB shuffle spill and a disk-full
    #   abort at sf10 (r8). That reference is verification apparatus, not
    #   the scale path; the production shapes are measured instead by
    #   op-dedup-fuzzy (max_df guard engaged, 1.8x at sf10) and
    #   path-minhash-lsh below (banded candidates, no exact reference).
    "op-dedup-fuzzy", "op-span-dup-stats", "op-graph-bfs",
    "op-interval-overlap", "op-pagerank", "op-tpch-q21",
    "op-bootstrap-ci",
    # streaming representative at the second decade (r10): the
    # watermarked stream-stream join over 10M events — state is
    # watermark+interval-bounded, so this reads whether the micro-batch
    # floor amortizes or the join state becomes the bottleneck.
    "op-stream-stream-join",
    # curate capstone at the second decade (r10, VERDICT r9 task 6): r8's
    # sf10 attempt disk-filled on the FULL exact-Jaccard tail (>60 GB
    # spill, Theta(Sum df^2) over 500k docs); the r9 restructure runs the
    # gate on a ~31% md5 sample of the prefix survivors, cutting the
    # candidate mass to (sample/full)^2 ~ 1.5% of that run — feasible.
    "op-corpus-curate-full",
    # r12 (VERDICT r11 task 6): second-decade rows for the r11 batch-19
    # ops (sf1 evidence only until now) + the streaming drain at its new
    # backlog-sized width + the r12 perceptual near-dup. op-ks-drift's
    # ratio reads the documented distinct-value-window ceiling growing
    # with 10x values per group — the measurement that tells us when the
    # pre-quantize alternative becomes mandatory.
    "op-pq-encode", "op-pq-topk", "op-grouped-regression", "op-ks-drift",
    "op-chi2-independence", "op-pmi-bigrams", "op-containment-dedup",
    "op-multimodal-neardup", "op-stream-stateful",
    "op-countmin-freq", "op-bloom-semijoin", "op-stream-countmin",
    "op-negative-sampling",
]

# sf10 triage (named causes, same policy as EXPECTED_SUPERLINEAR):
# - op-dedup-embedding-lsh / op-sim-search-lsh at the repo's tau=0.4 test
#   threshold are excluded from BOTH decades: at d=64 the >=0.4 pair
#   OUTPUT grows superlinearly with corpus size (unit-vector packing
#   geometry, not a plan property — see gen_scale.py), and the recall
#   gate's exact reference matmul is Theta(N^2) BY DESIGN (it is the
#   measurement apparatus, not the scale path). The embedding scale
#   paths measured instead: path-ivf-topk and path-semdedup-k-scaled.
SF10_PATHS_DOC = """
Operator scale paths measured alongside the registered queries (the
registered gate queries embed deliberately-quadratic exact references;
these rows measure the production path itself):
- path-ivf-topk: IVF similarity search, 32 queries over the full corpus
  (64 centroids, 4 probes — scan fraction 1/16 per query, row-local
  assignment). This, with path-semdedup-k-scaled, is the embedding
  scale story; banded sign-LSH is NOT measured at sf10 because its
  bucket resolution is bounded (2^w values per band), so at 500k+
  vectors no (width, bands) choice is simultaneously recall-viable and
  sub-quadratic — measured r8: the tau=0.8 default-band path ground
  into a 10^11-candidate join. cosine_pairs_lsh remains the right shape
  at corpus sizes where band buckets stay small relative to N (its
  max_bucket guard caps the failure mode); past that, k-means blocking
  and IVF are the engine's embedding scale paths.
- path-semdedup-k-scaled: semdedup with k scaled with the corpus
  (k=16 at sf1, k=160 at sf10) — the operator's documented contract at
  scale (within-cluster work ~ N^2/k stays ~linear when k tracks N);
  the registered op-semdedup pins k=4 for its oracle, which makes its
  OWN growth ~N^2/4 by construction.
- path-minhash-lsh: the raw MinHash-LSH dedup pipeline with the
  max_bucket skew guard — the production near-dup scale path. The
  registered gate queries (op-dedup-minhash/-simhash, op-corpus-curate*,
  op-lsh-tuning) anchor their oracles on the deliberately-unguarded
  exact Jaccard join, whose Theta(Sum df^2) candidate mass under the
  generator's bounded vocab spilled >60 GB and filled the disk at sf10
  — measurement apparatus, excluded with that named cause.
- path-ivf-pairs-k-scaled (r12): ivf_pairs under its documented scale
  contract, K = N/500 tracking the corpus (candidate mass
  ~ N^2 n_probe^2 / K stays linear) — the production embedding pair
  path per the measured crossover table below; the registered
  op-ivf-pairs pins K for its exhaustive-probe oracle.
"""


def _path_ivf_topk(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_pipeline_api_spark.operators import similarity

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.orderBy("vec_id").limit(32)
    return similarity.ivf_topk(
        emb, queries, "vec_id", "embedding", k=5, n_centroids=64, n_probe=4
    )


def _path_semdedup_k_scaled(spark, sf_dir):
    from etl_pipeline_api_spark.operators import similarity

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    k = 160 if "sf10" in os.path.basename(sf_dir.rstrip("/")) else 16
    return similarity.semdedup(emb, "vec_id", "embedding", threshold=0.4, k=k)


def _path_minhash_lsh(spark, sf_dir):
    from etl_pipeline_api_spark.operators import dedup

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # max_bucket: the production skew guard (boilerplate bands would
    # otherwise go quadratic — the same reason the exact reference can't
    # run at sf10); candidates verify exact Jaccard in-plan as always
    return dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, max_bucket=1000
    )


def _path_ivf_pairs_k_scaled(spark, sf_dir):
    from etl_pipeline_api_spark.operators import similarity

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    # the operator's documented scale contract: K tracks N (candidate
    # mass ~ N^2 * n_probe^2 / K stays linear) — K = N/500 as in the
    # measured sign-LSH->IVF crossover (tools/bench_crossover.py); at
    # sf10 that is ~1200 cells over ~600k vectors (VERDICT r11 task 6:
    # "ivf_pairs's K-tracks-N contract shown at 60M rows" — the sf10
    # replica; embeddings are its 600k-vector table)
    n = emb.count()  # parquet metadata count — no full scan
    return similarity.ivf_pairs(
        emb, "vec_id", "embedding", threshold=0.8,
        n_centroids=max(16, n // 500), n_probe=2,
    )


SF10_PATHS = {
    "path-ivf-topk": _path_ivf_topk,
    "path-semdedup-k-scaled": _path_semdedup_k_scaled,
    "path-minhash-lsh": _path_minhash_lsh,
    "path-ivf-pairs-k-scaled": _path_ivf_pairs_k_scaled,
}

RESULTS = os.path.join(REPO, ".scratch", "scaling_results.jsonl")
RESULTS_SF10 = os.path.join(REPO, ".scratch", "scaling_results_sf10.jsonl")


def read_prev_ratios(path: str) -> dict[str, float]:
    """Parse the prior committed BENCH_SCALING.md table so each refresh
    records the round-over-round ratio delta — a superlinear regression
    shows up the round it lands, not at the next manual read."""
    import re as _re

    prev: dict[str, float] = {}
    if not os.path.exists(path):
        return prev
    for line in open(path):
        if line.startswith("# Second decade"):
            break  # sf10 rows share names with sf1 rows; Δ is sf1-only
        m = _re.match(
            r"\|\s*(op-[a-z0-9-]+)\s*\|[^|]*\|[^|]*\|\s*([0-9.]+)x", line
        )
        if m:
            prev[m.group(1)] = float(m.group(2))
    return prev


def _load(path: str) -> dict[str, dict]:
    # latest wins, INCLUDING failures: an err record evicts the query's
    # prior successful row (stale timings must not be re-published as
    # current) and is kept so the table renders a visible FAILED row.
    acc: dict[str, dict] = {}
    if os.path.exists(path):
        for line in open(path):
            rec = json.loads(line)
            acc[rec["name"]] = rec
    return acc


def _emit_table(f, rows, prev, with_delta=True):
    f.write("| query | small (s) | big (s) | ratio | \u0394 prev | verdict |\n")
    f.write("|---|---|---|---|---|---|\n")
    for r in rows:
        if "err" in r:
            f.write(
                f"| {r['name']} | \u2014 | \u2014 | \u2014 | \u2014 | FAILED ({r['err']}) |\n"
            )
            continue
        d = (
            f"{r['ratio'] - prev[r['name']]:+.1f}"
            if with_delta and r["name"] in prev else "new"
        )
        f.write(
            f"| {r['name']} | {r['t_small']:.2f} | {r['t_big']:.2f} "
            f"| {r['ratio']:.1f}x | {d} | {r['verdict']} |\n"
        )


def _summary(f, rows, planned):
    failed = [r for r in rows if "err" in r]
    rows = [r for r in rows if "err" not in r]
    if failed:
        f.write(
            f"\n**{len(failed)} query(ies) FAILED on the last run** "
            f"({', '.join(r['name'] for r in failed)}) — no current "
            "timing exists; prior rounds' numbers were evicted, not "
            "re-published.\n"
        )
    defects = [r for r in rows if r["verdict"] == "SUPERLINEAR"]
    byout = [r for r in rows if r["verdict"] == "superlinear-by-output"]
    noted = [r for r in rows
             if r["name"] in EXPECTED_SUPERLINEAR and r["ratio"] > WATCH]
    if noted:
        f.write("\nDocumented output-driven growth:\n\n")
        for r in noted:
            f.write(f"- **{r['name']}** ({r['ratio']:.1f}x): "
                    f"{EXPECTED_SUPERLINEAR[r['name']]}\n")
    if rows:
        worst = max(rows, key=lambda x: x["ratio"])
        f.write(
            f"\nWorst ratio: **{worst['name']} at {worst['ratio']:.1f}x**. "
            f"{len(defects)} superlinear plan defect(s), {len(byout)} "
            "documented output-driven, "
            f"{sum(1 for r in rows if r['verdict'] == 'watch')} watch, "
            f"{sum(1 for r in rows if r['verdict'] == 'linear-or-better')} "
            f"linear-or-better of {len(rows)} "
            f"({planned} planned).\n"
        )


def write_md() -> dict[str, dict]:
    acc = _load(RESULTS)
    rows = [acc[n] for n in QUERIES_TO_SCALE if n in acc]
    acc10 = _load(RESULTS_SF10)
    names10 = SF10_QUERIES + sorted(SF10_PATHS)
    rows10 = [acc10[n] for n in names10 if n in acc10]
    out = os.path.join(REPO, "BENCH_SCALING.md")
    prev = read_prev_ratios(out)
    with open(out, "w") as f:
        f.write(
            "# Scaling curve: sf0.1 -> sf1 (10x data) on local[32]\n\n"
            "Generated by tools/bench_scaling.py over ./testdata_sf1 "
            "(tools/gen_scale.py replication; see its docstring for why\n"
            "distributions, join fan-outs and dup densities scale ~linearly). "
            "Median-of-3 after warmup, one shared session, noop-sink forced "
            "(no driver collect).\n\n"
            f"Thresholds: watch > {WATCH}x, SUPERLINEAR > {SUPER}x "
            f"(data factor {DATA_FACTOR:.0f}x). Queries with a documented "
            "output-driven cause are marked `by-output`. The \u0394 column is "
            "the ratio change vs the previous committed table.\n\n"
        )
        _emit_table(f, rows, prev)
        _summary(f, rows, len(QUERIES_TO_SCALE))
        if rows10:
            f.write(
                "\n# Second decade: sf1 -> sf10 (10x data, 60M-row "
                "lineitem) on local[32]\n\n"
                "Heavy-family curve over ./testdata_sf10 "
                "(SCALE_MODE=sf10; one timed run after one warmup — "
                "minutes-long runs make scheduler wobble invisible). Same "
                "thresholds as above.\n"
            )
            f.write(SF10_PATHS_DOC)
            f.write("\n")
            _emit_table(f, rows10, {}, with_delta=False)
            _summary(f, rows10, len(names10))
        else:
            f.write(
                "\n# Second decade: sf1 -> sf10 — not re-measured in "
                "this run\n\nThe sf10 scratch replica (gitignored "
                "./testdata_sf10, ~60M-row lineitem) was evicted with a "
                "container reset and regenerating + re-running the heavy "
                "family does not fit the round budget; the r10-measured "
                "rows live in git history (BENCH_SCALING.md @ cf9740d). "
                "Engine changes since are covered by the sf1 curve above "
                "and the full sf1 oracle disposition (SF1CHECK_r11.md).\n"
            )
        _emit_crossover(f)
    return acc if MODE != "sf10" else acc10


def _emit_crossover(f) -> None:
    """Embed the measured sign-LSH -> IVF pair-finding crossover
    (tools/bench_crossover.py; VERDICT r10 task 7) so the qualitative
    "bucket-resolution ceiling" claim above carries its number."""
    src = os.path.join(REPO, "tools", "crossover_results.json")
    if not os.path.exists(src):
        return
    d = json.load(open(src))
    f.write(
        f"\n# Sign-LSH -> IVF pair-finding crossover (measured, "
        f"tau={d['tau']})\n\n"
        "tools/bench_crossover.py: both methods at EQUAL MEASURED RECALL "
        "on planted near-dup pairs (2% clones at cos ~0.99) over "
        f"hash-subset corpora; LSH = {d['lsh']} "
        f"(theory recall {d['theory_recall']}), max_bucket=20000 guard; "
        "IVF = ivf_pairs with K = N/500, n_probe=2. lsh_mass = banded "
        "candidate pairs (sum bucket^2 / 2), pre-measured linearly; runs "
        "with projected mass > 5e8 are recorded, not ground through.\n\n"
        "| N | truth pairs | LSH mass | LSH s | LSH recall | IVF s | "
        "IVF recall |\n|---|---|---|---|---|---|---|\n"
    )
    for r in d["rows"]:
        lsh_s = r.get("lsh_s")
        lsh_cell = f"{lsh_s}" if lsh_s is not None else (
            f"skipped: {r.get('lsh_note', 'projected infeasible')}")
        f.write(
            f"| {r['n']:,} | {r['n_truth']:,} | {r['lsh_mass']:.2e} | "
            f"{lsh_cell} | {r.get('lsh_recall', '—')} | {r['ivf_s']} | "
            f"{r['ivf_recall']} |\n"
        )
    f.write(
        "\n**The measured answer: there is no crossover to wait for — "
        "IVF pair finding is faster at EVERY measured size at equal "
        "(1.0) recall, and the gap grows quadratically** (LSH candidate "
        "mass x4 per x2 N: band values are bounded by 2^w, so buckets "
        "scale with N and mass with N^2/c; IVF mass ~ N * n_probe^2 * "
        "500 stays linear when K tracks N). Guarded sign-LSH's remaining "
        "role is the oracle-exact gate regime at gate SFs "
        "(op-dedup-embedding-lsh) and one-off small-corpus passes; the "
        "production embedding pair path at any scale is ivf_pairs / "
        "k-means blocking (cosine_pairs_blocked group_col) / semdedup.\n"
    )


def main() -> int:
    import __spark_entry__ as entry
    from etl_pipeline_api_spark.session import get_spark

    if MODE == "sf10":
        small_dir, big_dir, results = SF1, SF10, RESULTS_SF10
        default_names = SF10_QUERIES + sorted(SF10_PATHS)
        runs = int(os.environ.get("SCALE_RUNS", "1"))
    else:
        small_dir, big_dir, results = SF01, SF1, RESULTS
        default_names = QUERIES_TO_SCALE
        runs = int(os.environ.get("SCALE_RUNS", "3"))
    if not os.path.isdir(big_dir):
        print(f"missing {big_dir}; run tools/gen_scale.py first")
        return 1

    def measure(fn) -> float:
        force(fn())  # warmup
        ts = []
        for _ in range(runs):
            t0 = time.time()
            force(fn())
            ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2]

    names = sys.argv[1:] or default_names
    spark = get_spark("bench_scaling")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    os.makedirs(os.path.dirname(results), exist_ok=True)
    import gc

    for name in names:
        fn = SF10_PATHS[name] if name in SF10_PATHS else qs[name]
        # drop refs to prior queries' localCheckpoint blocks before timing:
        # a shared session otherwise accumulates cached RDD blocks and the
        # later queries pay their GC/eviction (measured: op-graph-bfs read
        # 91 s mid-batch at sf10 vs 30 s isolated)
        gc.collect()
        spark._jvm.System.gc()
        try:
            t_small = measure(lambda: fn(spark, small_dir))
            t_big = measure(lambda: fn(spark, big_dir))
        except Exception as e:  # noqa: BLE001 — isolate, record, continue
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
            with open(results, "a") as f:
                f.write(json.dumps({"name": name, "err": f"{type(e).__name__}"}) + "\n")
            continue
        ratio = t_big / t_small if t_small > 0 else float("inf")
        verdict = (
            # a documented output-driven cause covers the watch band too:
            # the triage names the measured mass, so 12-15x with a known
            # Θ(output) driver is "by-output", not an untriaged "watch"
            "superlinear-by-output"
            if (name in EXPECTED_SUPERLINEAR and ratio > WATCH)
            else "SUPERLINEAR" if ratio > SUPER
            else "watch" if ratio > WATCH
            else "linear-or-better"
        )
        rec = {"name": name, "t_small": round(t_small, 3),
               "t_big": round(t_big, 3), "ratio": round(ratio, 2),
               "verdict": verdict}
        with open(results, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"{name}: {t_small:.2f}s -> {t_big:.2f}s  x{ratio:.1f}  {verdict}")

    acc = write_md()
    print(f"wrote BENCH_SCALING.md ({len(acc)} measured in this mode)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
