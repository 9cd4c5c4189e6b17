"""Adversarial-corpus fuzz sweep (r8): the oracle corpora are
generator-shaped — well-formed text, sane embeddings. This module seeds a
PATHOLOGICAL fixture (empty/whitespace/NULL text, 1-token docs, a 10-copy
exact-dup cluster, unicode combining chars + CJK + emoji, docs shorter
than the shingle window, a 500-token cyclic doc, PII strings, shared
boilerplate chunks; zero/tiny/antipodal/threshold-straddling embeddings)
and runs every documents-only and embeddings-only oracle query through the
SAME Spark-vs-DuckDB comparison the driver gate uses (tools/
check_correctness.canon). Divergences found here are either fixed in the
engine or pinned below as documented semantic deltas.

Findings from the initial sweep are recorded inline where they shaped the
fixture or the engine (see FUZZ_SKIP and the boundary-pair comment).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import pytest

from conftest import sweep_params

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from check_correctness import TABLES, canon  # noqa: E402

SRC = "/root/testdata/sf0.001"

# Queries excluded from the fuzz sweep, each with the reason on record.
# An entry here is a DOCUMENTED semantic delta or contract boundary, not
# a silent hole.
FUZZ_SKIP = {
    # file-stream sources need the driver's flat-file events layout; the
    # fuzz fixture only reshapes documents/embeddings (same exclusion as
    # tests/test_empty_inputs.py)
}


def _doc_rows():
    """The pathological documents corpus. doc_id 0 is the decontam eval
    slice (doc_id % 50 == 0) and deliberately shares a 4-gram with the
    dup cluster so the decontamination path fires."""
    dup = "the quick brown fox jumps over the lazy dog and runs away"
    near = "the quick brown fox jumps over the lazy cat and runs away"
    rows = [
        (0, "quick brown fox jumps benchmark slice", "en", "eval"),
        (1, "", "en", "web"),
        (2, "   ", "en", "web"),
        # NULL text is engine-only (test_null_text_engine_semantics): the
        # ORACLES' NULL propagation through greatest()/CASE legitimately
        # differs from the engine's explicit unknown/NULL handling, and the
        # generator contract ships text NOT NULL — the engine must not
        # crash, which the dedicated test pins.
        (4, "hello", "en", "web"),
        (5, "the the the the the the", "en", "web"),
    ]
    rows += [(10 + i, dup, "en", "web") for i in range(10)]  # exact-dup x10
    rows += [
        (20, near, "en", "web"),
        (21, "the quick brown fox jumps", "en", "web"),  # prefix of dup
        (22, "The Quick Brown Fox Jumps Over The Lazy Dog And Runs Away",
         "en", "web"),  # case-fold dup of the cluster
        (23, "  the quick brown fox jumps over the lazy dog and runs away  ",
         "en", "web"),  # pad-trim dup
        (24, "café café naïve résumé the of and",
         "en", "web"),  # composed unicode
        (25, "café café naïve résumé the of and",
         "en", "web"),  # decomposed (combining chars) — must NOT equal 24
        (26, "的 是 了 的 是 了 的", "zh", "web"),
        (27, "\U0001f680 \U0001f680 \U0001f680 rocket rocket the of",
         "en", "web"),
        (28, "!!! ??? ... ,,,", "en", "web"),
        (29, "a\tb\nc  d e", "en", "web"),  # mixed whitespace
        (30, "alpha beta", "en", "web"),  # below 3-shingle window
        (31, "alpha beta gamma", "en", "web"),  # exactly one 3-shingle
        (32, " ".join(f"tok{i % 7}" for i in range(500)), "en", "web"),
        (33, "contact john.doe@example.com or 555-123-4567 at 192.168.1.1 "
             "now please thanks the of and", "en", "web"),
        (34, "el la los de el la los de", "es", "web"),
        (35, "le les des une le les des une", "fr", "web"),
        (36, "der die und das der die und das", "de", "web"),
        (37, "x", "en", "web"),
        (38, "<p>hello world</p> <div>bye</div> the of and", "en", "web"),
        (39, "123 456 123 456 789 the of and", "en", "web"),
        # shared 10-token boilerplate chunk (line-dedup bait), distinct tails
        (40, "shared chunk one two three four five six seven eight "
             "unique tail alpha the of", "en", "web"),
        (41, "shared chunk one two three four five six seven eight "
             "different tail beta the of", "en", "web"),
    ]
    return [
        (i, t, lang, src, len(t) if t is not None else None)
        for (i, t, lang, src) in rows
    ]


def _emb_rows():
    """Pathological embeddings (dim 64 — the generator contract several
    embed queries encode, e.g. op-embed-normalize probes embedding[63]):
    exact duplicates, a tiny-magnitude vector, antipodal pair, orthogonal
    pair, and pairs engineered CLEARLY on each side of the cosine 0.4
    threshold (0.39 / 0.41) — deliberately NOT exactly 0.4: at the exact
    threshold the >= comparison is decided by summation-order ulps and
    legitimately differs between numpy/BLAS and DuckDB (the documented
    boundary class in the op-dedup-embedding-lsh gate); pair-list oracles
    would flake on such a pair in either engine, so the fixture stays off
    the knife edge the way any finite-precision contract must."""
    import math

    def v(**kv):
        out = [0.0] * 64
        for i, x in kv.items():
            out[int(i[1:])] = float(x)
        return out

    unit = v(_0=1.0)
    rows = [
        (0, unit, 0),
        (1, list(unit), 0),                      # exact duplicate of 0
        # the ZERO vector is engine-only (test_zero_vector_engine_semantics):
        # cosine against it is mathematically undefined, and the engines
        # disagree BY DESIGN on the undefined case — DuckDB yields NaN,
        # which sorts FIRST under ORDER BY DESC, while the engine yields
        # NULL (try_divide), which ranks LAST; the engine contract (no
        # crash, zero vectors never outrank real matches) is pinned there.
        # tiny magnitude, parallel to 0. 1e-7, NOT 1e-15: at 1e-15 the
        # quantization scale hits 1.27e17 and round(x, 6) needs x*1e6 >
        # 2^53 — Spark (BigDecimal) and DuckDB (multiply-round-divide)
        # then legitimately differ by one ulp (op-embed-quantize found
        # this). 1e-7 keeps every derived magnitude exactly roundable in
        # both engines; the 1e-15 zero-only-clamp regression is pinned
        # engine-side in test_zero_vector_engine_semantics.
        (3, v(_0=1e-7), 0),
        (4, v(_0=-1.0), 1),                      # antipodal to 0
        (5, v(_1=1.0), 1),                       # orthogonal to 0
        # cos vs vec 0 = 0.41 (clearly above tau=0.4)
        (6, v(_0=0.41, _1=math.sqrt(1 - 0.41 ** 2)), 1),
        # cos vs vec 0 = 0.39 (clearly below)
        (7, v(_0=0.39, _1=math.sqrt(1 - 0.39 ** 2)), 1),
        # near-duplicate of 0 (cos ~ 1 - 5e-9)
        (8, v(_0=1.0, _1=1e-4), 0),
        (9, [0.5] * 64, 2),
        (10, [-0.5] * 64, 2),
        (11, v(_0=2.0, _1=2.0, _63=0.5), 2),     # non-unit norm, last-dim mass
    ]
    return rows


@pytest.fixture(scope="module")
def fuzz_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz_sf")
    for t in TABLES:
        if t in ("documents", "embeddings"):
            continue
        (
            spark.read.parquet(f"{SRC}/{t}.parquet")
            .limit(0)
            .coalesce(1)
            .write.parquet(str(d / f"{t}.parquet"))
        )
    spark.createDataFrame(
        _doc_rows(),
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    spark.createDataFrame(
        [(i, [float(x) for x in v], lb) for i, v, lb in _emb_rows()],
        "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def _table_mentions(sql: str) -> set[str]:
    return {t for t in TABLES if re.search(rf"\b{t}\b", sql)}


def _fuzz_names():
    """All oracle-bearing queries whose SQL touches ONLY documents and/or
    embeddings — the text/dedup/embedding family the fixture perturbs.
    Computed dynamically so new corpus queries join the sweep for free."""
    import __spark_entry__ as m

    names = []
    for name, sql in sorted(m.oracle_sql().items()):
        used = _table_mentions(sql)
        if used and used <= {"documents", "embeddings"} and name not in FUZZ_SKIP:
            names.append(name)
    return names


def test_null_text_engine_semantics(spark):
    """NULL text is out of oracle scope (see _doc_rows) but IN the engine
    contract: no crash, and explicit, documented outputs — langid
    'unknown' with rate 0.0, NULL fingerprint, NULL token counts."""
    from etl_pipeline_api_spark.operators import text
    from etl_pipeline_api_spark.operators.dedup import tokens_expr
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, None), (2, "the quick fox")], "doc_id long, text string"
    )
    lang_c, rate_c = text.langid_cols("text", toks=tokens_expr("text"))
    r = {
        row["doc_id"]: row
        for row in df.select(
            "doc_id",
            lang_c.alias("lang"),
            rate_c.alias("rate"),
            text.fingerprint_col("text").alias("fp"),
        ).collect()
    }
    assert r[1]["lang"] == "unknown" and r[1]["rate"] == 0.0
    assert r[1]["fp"] is None
    assert r[2]["lang"] == "en" and r[2]["fp"] is not None
    # BPE encode propagates NULL counts (documented in text.bpe_encode)
    enc = {
        row["doc_id"]: row
        for row in text.bpe_encode(
            df, "doc_id", "text", [("t", "h"), ("th", "e")]
        ).collect()
    }
    assert enc[1]["n_chars_tok"] is None and enc[1]["n_bpe_tok"] is None
    assert enc[2]["n_chars_tok"] is not None


def test_zero_vector_engine_semantics(spark):
    """Zero-norm vectors are out of oracle scope (see _emb_rows) but IN
    the engine contract: no ANSI divide-by-zero task kill anywhere, a
    zero vector never outranks a real match (NULL cosine ranks last),
    l2-normalizing it yields the zero vector, and pair ops at a positive
    threshold never emit it."""
    from etl_pipeline_api_spark.operators import similarity

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0, 0.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),  # zero vector
            (3, [0.0, 1.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    top = similarity.cosine_topk(emb, emb, "vec_id", "embedding", k=2).collect()
    by_q = {}
    for r in top:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    # vec 0's best match is vec 1; the zero vector must not be rank 1
    assert sorted(by_q[0])[0][1] == 1
    for q, lst in by_q.items():
        if q != 2:  # for real queries the zero vector ranks behind real cos
            assert sorted(lst)[0][1] != 2
    pairs = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_pairs_blocked(
            emb, "vec_id", "embedding", threshold=0.4
        ).collect()
    }
    assert (0, 1) in pairs
    assert all(2 not in p for p in pairs)
    # zero-ONLY clamp regression (r8): a 1e-15-norm vector parallel to a
    # unit vector has cosine exactly 1.0 — the old np.maximum(n, 1e-12)
    # clamp scaled it to ~1e-3 and silently dropped the pair
    tiny = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1e-15, 0.0])],
        "vec_id long, embedding array<double>",
    )
    tp = similarity.cosine_pairs_blocked(
        tiny, "vec_id", "embedding", threshold=0.9
    ).collect()
    assert [(r["id_a"], r["id_b"], r["cos"]) for r in tp] == [(0, 1, 1.0)]
    units = {
        r["vec_id"]: list(r["unit"])
        for r in similarity.l2_normalize(emb, "embedding").collect()
    }
    assert units[2] == [0.0, 0.0, 0.0, 0.0]
    assert units[0] == [1.0, 0.0, 0.0, 0.0]
    # LSH/IVF topk paths execute without a divide-by-zero kill
    similarity.lsh_topk(emb, emb, "vec_id", "embedding", k=2).collect()
    similarity.ivf_topk(emb, emb, "vec_id", "embedding", k=2, n_centroids=2).collect()


@pytest.mark.parametrize("name", sweep_params(_fuzz_names()))
def test_fuzz_corpus_query_matches_oracle(spark, fuzz_dir, name):
    import duckdb

    import __spark_entry__ as m

    spdf = m.queries()[name](spark, fuzz_dir).toPandas()
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{fuzz_dir}/{t}.parquet/*.parquet')"
            )
        dpdf = con.sql(m.oracle_sql()[name]).df()
    finally:
        con.close()
    assert sorted(spdf.columns) == sorted(dpdf.columns), (
        f"{name}: column mismatch spark={sorted(spdf.columns)} "
        f"duckdb={sorted(dpdf.columns)}"
    )
    slines, dlines = canon(spdf), canon(dpdf)
    assert slines == dlines, (
        f"{name}: {len(slines)} spark rows vs {len(dlines)} oracle rows; "
        f"spark-only={sorted(set(slines) - set(dlines))[:3]} "
        f"duck-only={sorted(set(dlines) - set(slines))[:3]}"
    )
