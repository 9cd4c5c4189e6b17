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
