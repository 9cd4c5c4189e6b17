"""Property-based tests (hypothesis): operator semantics vs brute-force
Python models on randomized tiny inputs — the reference has no tests at all
(SURVEY §5); these pin OUR operators' semantics beyond the fixed oracle
corpora."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_pipeline_api_spark.operators import dedup
from etl_pipeline_api_spark.operators.dq import (
    DQSuite,
    non_negative_check,
    range_check,
)

WORDS = ["alpha", "beta", "gamma", "delta", "eps"]
doc_strategy = st.lists(st.sampled_from(WORDS), min_size=0, max_size=8).map(" ".join)


def brute_jaccard_pairs(texts: list[str], n: int, threshold: float):
    def shingles(t: str) -> set[str]:
        toks = [w for w in t.strip().lower().split() if w]
        if len(toks) < n:
            return set()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sets = {i: shingles(t) for i, t in enumerate(texts)}
    out = set()
    for a in sets:
        for b in sets:
            if a < b and sets[a] and sets[b]:
                j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
                if j >= threshold:
                    out.add((a, b))
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(doc_strategy, min_size=2, max_size=8))
def test_ngram_jaccard_matches_bruteforce(spark, texts):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    got = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", n=2, threshold=0.4
        ).collect()
    }
    assert got == brute_jaccard_pairs(texts, n=2, threshold=0.4)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(min_value=-3, max_value=15), st.floats(-10, 10)),
        min_size=1,
        max_size=30,
    )
)
def test_dq_violation_counts_match_python(spark, rows):
    df = spark.createDataFrame(
        [Row(mes=m, valor=v) for m, v in rows], "mes int, valor double"
    )
    suite = DQSuite(
        checks=[range_check("mes", 1, 12), non_negative_check("valor")]
    )
    got = suite.violations_df(df).collect()[0].asDict()
    expect_mes = sum(1 for m, _ in rows if not (1 <= m <= 12))
    expect_val = sum(1 for _, v in rows if v < 0)
    assert got["range_mes"] == expect_mes
    assert got["negative_valor"] == expect_val


def brute_line_dedup(texts: list[str], chunk: int, max_df: int):
    """Python reference for dedup_lines: chunk normalized tokens, drop
    chunks whose document frequency exceeds max_df, rejoin in order."""
    docs = {}
    for i, t in enumerate(texts):
        toks = [w for w in t.strip().lower().split() if w]
        docs[i] = [
            " ".join(toks[j : j + chunk]) for j in range(0, len(toks), chunk)
        ]
    from collections import Counter

    dfreq = Counter()
    for lines in docs.values():
        for line in set(lines):
            dfreq[line] += 1
    return {
        i: (
            " ".join(ln for ln in lines if dfreq[ln] <= max_df),
            sum(1 for ln in lines if dfreq[ln] <= max_df),
            len(lines),
        )
        for i, lines in docs.items()
    }


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(doc_strategy.filter(bool), min_size=1, max_size=6),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=1, max_value=2),
)
def test_dedup_lines_matches_bruteforce(spark, texts, chunk, max_df):
    from etl_pipeline_api_spark.operators.dedup import dedup_lines

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, t string"
    )
    got = {
        r.id: (r.clean_text, r.n_kept, r.n_lines)
        for r in dedup_lines(df, "id", "t", chunk=chunk, max_df=max_df).collect()
    }
    assert got == brute_line_dedup(texts, chunk, max_df)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**63 - 1), min_size=1, max_size=12,
        unique=True,
    )
)
def test_det_key_matches_python_model(spark, ids):
    """det_key must equal the Python-bigint (id * KNUTH) % 2^32 for ANY
    int64 id — including the >= 3.47e9 regime where a bigint multiply
    overflows under ANSI (the decimal-widening contract)."""
    from etl_pipeline_api_spark.operators import sampling

    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = {r.id: r.k for r in df.withColumn("k", sampling.det_key("id")).collect()}
    assert got == {i: (i * sampling.KNUTH) % sampling.M32 for i in ids}


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(min_value=1, max_value=9), min_size=1, max_size=10),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=4),
)
def test_pack_sequences_is_exact_partition(spark, lens, seq_len, n_shards):
    """Packing invariants for any doc-length multiset / seq_len / shard
    count: offsets tile the token stream exactly (no gap, no overlap, in
    deterministic hash order), and every derived column is consistent."""
    from etl_pipeline_api_spark.operators import chunking, sampling

    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(lens)], "doc_id long, n_tok long"
    )
    rows = chunking.pack_sequences(
        df, "doc_id", "n_tok", seq_len=seq_len, n_shards=n_shards
    ).collect()
    # deterministic global order = (shard, det_key, id)
    order = sorted(
        range(len(lens)),
        key=lambda i: (
            ((i * sampling.KNUTH) % sampling.M32) % n_shards,
            (i * sampling.KNUTH) % sampling.M32,
            i,
        ),
    )
    expect_off, off = {}, 0
    for i in order:
        expect_off[i] = off
        off += lens[i]
    assert {r.doc_id: r.offset for r in rows} == expect_off
    for r in rows:
        assert r.seq_first == r.offset // seq_len
        assert r.seq_last == (r.offset + r.n_tokens - 1) // seq_len
        assert r.pos_in_seq == r.offset % seq_len


def test_weighted_sample_deterministic_and_biased(spark):
    from etl_pipeline_api_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, float(1 + (i % 10) * 10)) for i in range(200)],
        "id long, w double",
    )
    s1 = sorted(r.id for r in weighted_sample(df, "id", "w", 50).collect())
    s2 = sorted(r.id for r in weighted_sample(df, "id", "w", 50).collect())
    assert s1 == s2 and len(s1) == 50          # rerun-stable, exact k
    # heavy-weight bias: mean weight of sample >> corpus mean (46 here)
    mean_w = sum(1 + (i % 10) * 10 for i in s1) / 50
    corpus_mean = sum(1 + (i % 10) * 10 for i in range(200)) / 200
    assert mean_w > corpus_mean
    # zero/negative weights never sampled
    df2 = df.union(spark.createDataFrame([(999, 0.0), (998, -5.0)], "id long, w double"))
    assert {999, 998}.isdisjoint(
        {r.id for r in weighted_sample(df2, "id", "w", 202).collect()}
    )


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(1, 5_000)),
        min_size=2,
        max_size=12,
    )
)
def test_interval_overlap_matches_bruteforce(spark, spans):
    """Cell-bucketed interval join == O(n²) brute force, any cell width."""
    from etl_pipeline_api_spark.operators import joins

    iv = [(i, s * 1_000_000, (s + d) * 1_000_000) for i, (s, d) in enumerate(spans)]
    want = {
        (a[0], b[0])
        for a in iv
        for b in iv
        if a[0] < b[0] and a[1] < b[2] and b[1] < a[2]
    }
    df = spark.createDataFrame(iv, "id long, s_us long, e_us long")
    got = {
        (r["id_a"], r["id_b"])
        for r in joins.interval_overlap_pairs(
            df, "id", "s_us", "e_us", cell_s=1800
        ).collect()
    }
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.floats(0.1, 1000.0, allow_nan=False), min_size=2, max_size=15)
)
def test_gini_matches_bruteforce(spark, amounts):
    """revenue_concentration's Gini == the rank-formula computed in Python."""
    from etl_pipeline_api_spark.operators import stats

    df = spark.createDataFrame(
        [(i, "O", float(a), None, "p") for i, a in enumerate(amounts)],
        "o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate timestamp, o_orderpriority string",
    )
    r = stats.revenue_concentration(df).collect()[0]
    xs = sorted(amounts)
    n = len(xs)
    gini = (2 * sum((i + 1) * x for i, x in enumerate(xs))) / (n * sum(xs)) - (
        n + 1
    ) / n
    assert abs(r["gini"] - gini) < 1e-3


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(0, 3), st.sampled_from("UD")),
        min_size=1,
        max_size=12,
    )
)
def test_changelog_compact_matches_replay(spark, changes):
    """changelog_compact == a sequential Python replay of the log."""
    from etl_pipeline_api_spark.operators.dq import changelog_compact

    log = [
        (k, v, i, op, float(i))
        for i, (k, v, op) in enumerate(changes)
    ]
    state: dict = {}
    for k, v0, v1, op, amt in sorted(log, key=lambda r: (r[1], r[2])):
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = amt
    df = spark.createDataFrame(
        log, "k string, v0 long, v1 long, op string, amt double"
    )
    got = {
        r["k"]: r["amt"]
        for r in changelog_compact(
            df, ["k"], ["v0", "v1"], "op", ["amt"]
        ).collect()
    }
    assert got == state


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.integers(-5, 5), min_size=4, max_size=4),
        min_size=6,
        max_size=14,
    ).filter(lambda vs: all(any(x != 0 for x in v) for v in vs))
)
def test_knn_classify_matches_bruteforce(spark, vecs):
    """knn_classify == brute-force cosine top-k + majority vote with the
    (votes desc, label asc) tie-break, on random small corpora."""
    import math

    from etl_pipeline_api_spark.operators import similarity

    rows = [
        (i, [float(x) for x in v], i % 3) for i, v in enumerate(vecs)
    ]
    corpus, queries = rows[2:], rows[:2]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    k = 3

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    want = {}
    for qid, qv, _ in queries:
        scored = sorted(
            ((cos(qv, cv), cid, lab) for cid, cv, lab in corpus),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        votes: dict = {}
        for _, _, lab in scored:
            votes[lab] = votes.get(lab, 0) + 1
        best = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
        want[qid] = best
    got = {
        r["query_id"]: (r["pred_label"], r["n_votes"])
        for r in similarity.knn_classify(
            df.filter("vec_id >= 2"),
            df.filter("vec_id < 2"),
            "vec_id",
            "embedding",
            "label",
            k=k,
        ).collect()
    }
    assert got == {q: (lab, n) for q, (lab, n) in want.items()}


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.floats(1.0, 100.0, allow_nan=False), min_size=3, max_size=20)
)
def test_bootstrap_ci_matches_python_replay(spark, values):
    """The Poisson bootstrap is a pure function of row ids — a Python
    replay of the same Knuth-mix arithmetic must produce the identical
    replicate means, mean, and CI."""
    from etl_pipeline_api_spark.operators import stats

    R = 10
    POIS = (0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
            0.9810118431238462, 0.9963401531726563)

    def weight(uid, r):
        key = ((uid * R + r) * 2654435761) % 2**32
        u = key / 2**32
        for w, t in enumerate(POIS):
            if u < t:
                return w
        return 5

    means = []
    for r in range(R):
        num = sum(v * weight(i, r) for i, v in enumerate(values))
        den = sum(weight(i, r) for i, v in enumerate(values))
        means.append(num / den if den else None)
    ms = sorted(m for m in means if m is not None)

    def pct(q):
        # linear interpolation, matching Spark percentile / quantile_cont
        if not ms:
            return None
        pos = (len(ms) - 1) * q
        lo, hi = int(pos), min(int(pos) + 1, len(ms) - 1)
        return ms[lo] + (ms[hi] - ms[lo]) * (pos - lo)

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)], "id long, v double"
    )
    r = stats.bootstrap_mean_ci(df, "id", "v", n_replicates=R).collect()[0]
    valid = [m for m in means if m is not None]
    assert r["n_replicates"] == R
    assert abs(r["mean"] - sum(valid) / len(valid)) < 1e-3
    assert abs(r["ci_lo"] - pct(0.025)) < 1e-3
    assert abs(r["ci_hi"] - pct(0.975)) < 1e-3


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 100), st.integers(1, 50)),
        min_size=1,
        max_size=15,
    )
)
def test_peak_concurrency_matches_bruteforce(spark, spans):
    from etl_pipeline_api_spark.operators import behavioral

    iv = [(i, s * 1_000_000, (s + d) * 1_000_000) for i, (s, d) in enumerate(spans)]
    # brute force: evaluate concurrency just after every start instant
    # (half-open [s, e): peak is attained at some start point)
    peak = 0
    for _, s, _e in iv:
        c = sum(1 for _, s2, e2 in iv if s2 <= s < e2)
        peak = max(peak, c)
    df = spark.createDataFrame(iv, "id long, s_us long, e_us long")
    r = behavioral.peak_concurrency(df, "s_us", "e_us").collect()[0]
    assert r["n_intervals"] == len(iv)
    assert r["peak"] == peak
