"""Unit tests for batch 19 — KS drift, χ² independence, PMI bigrams,
containment dedup. Tiny hand-built frames with closed-form expected
values, pinning the math independently of the DuckDB oracle sweep."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from etl_pipeline_api_spark.operators import dedup, stats, text

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(i: int) -> dt.datetime:
    return T0 + dt.timedelta(hours=i)


# ---------------------------------------------------------------- ks_test

def test_ks_disjoint_halves_d_is_one(spark):
    # first half all values in [0,4), second half in [10,14): CDFs fully
    # separate -> D = 1 exactly (d_num = n_base * n_cur).
    rows = [("m", _ts(i), float(i)) for i in range(4)] + [
        ("m", _ts(i + 4), 10.0 + i) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    r = stats.ks_test(df, "g", "v").collect()[0]
    assert (r["n_base"], r["n_cur"]) == (4, 4)
    assert r["d_num"] == 16  # max |c_base*n_cur - c_cur*n_base| = 4*4
    assert r["ks_d"] == pytest.approx(1.0)
    assert r["drifted"] == 1


def test_ks_identical_halves_small_d(spark):
    # both halves carry the SAME value multiset -> at every distinct v
    # the scaled cumulative counts agree -> d_num = 0, not drifted.
    vals = [1.0, 2.0, 3.0, 4.0]
    rows = [("m", _ts(i), v) for i, v in enumerate(vals)] + [
        ("m", _ts(i + 4), v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    r = stats.ks_test(df, "g", "v").collect()[0]
    assert r["d_num"] == 0
    assert r["ks_d"] == 0.0
    assert r["drifted"] == 0


def test_ks_hand_case_exact_numerator(spark):
    # base = {1, 2}, cur = {2, 3}: at v=1 |1*2-0*2|=2, at v=2 |2*2-1*2|=2,
    # at v=3 |2*2-2*2|=0 -> d_num=2, D = 2/(2*2) = 0.5.
    rows = [
        ("m", _ts(0), 1.0),
        ("m", _ts(1), 2.0),
        ("m", _ts(10), 2.0),
        ("m", _ts(11), 3.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    r = stats.ks_test(df, "g", "v").collect()[0]
    assert r["d_num"] == 2
    assert r["ks_d"] == pytest.approx(0.5)


def test_ks_per_group_isolation(spark):
    # group 'a' drifts completely, group 'b' is identical across halves —
    # per-group split points and statistics must not leak across groups.
    rows = (
        [("a", _ts(i), float(i)) for i in range(3)]
        + [("a", _ts(i + 3), 100.0 + i) for i in range(3)]
        + [("b", _ts(i), 7.0) for i in range(3)]
        + [("b", _ts(i + 3), 7.0) for i in range(3)]
    )
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = {r["g"]: r for r in stats.ks_test(df, "g", "v").collect()}
    assert out["a"]["ks_d"] == pytest.approx(1.0)
    assert out["b"]["d_num"] == 0


# ---------------------------------------------------- chi2_independence

def test_chi2_perfect_dependence_2x2(spark):
    # x == y on 40 rows split 20/20: chi2 = n = 40, V = 1.
    rows = [("a", "a")] * 20 + [("b", "b")] * 20
    df = spark.createDataFrame(rows, "x string, y string")
    r = stats.chi2_independence(df, "x", "y").collect()[0]
    assert r["n"] == 40
    assert (r["n_levels_x"], r["n_levels_y"], r["dof"]) == (2, 2, 1)
    assert r["chi2"] == pytest.approx(40.0)
    assert r["cramers_v"] == pytest.approx(1.0)


def test_chi2_exact_independence_is_zero(spark):
    # counts exactly proportional to the product of marginals -> chi2 = 0.
    rows = (
        [("a", "u")] * 8 + [("a", "v")] * 2
        + [("b", "u")] * 16 + [("b", "v")] * 4
    )
    df = spark.createDataFrame(rows, "x string, y string")
    r = stats.chi2_independence(df, "x", "y").collect()[0]
    assert r["chi2"] == pytest.approx(0.0)
    assert r["cramers_v"] == pytest.approx(0.0)


def test_chi2_independence_clamped_non_negative_plus_zero(spark):
    # At (near-)exact independence float cancellation in
    # sum((n_xy-e)^2/e) + n - sum(e) can land a tiny NEGATIVE chi2,
    # which would NaN Spark's sqrt and CRASH DuckDB's (it throws on
    # sqrt(<0)). The greatest(chi2, 0) clamp plus the +0.0 negative-
    # zero canonicalization must pin BOTH outputs to exactly +0.0.
    rows = [("a", "u")] * 3 + [("a", "v")] * 3 + [("b", "u")] * 3 + [
        ("b", "v")
    ] * 3
    df = spark.createDataFrame(rows, "x string, y string")
    r = stats.chi2_independence(df, "x", "y").collect()[0]
    assert r["chi2"] == 0.0 and math.copysign(1.0, r["chi2"]) == 1.0
    assert not math.isnan(r["cramers_v"])
    assert r["cramers_v"] == 0.0
    assert math.copysign(1.0, r["cramers_v"]) == 1.0


def test_chi2_observed_zero_cell_counts_expected_mass(spark):
    # Total dependence with TWO cells absent from the joint frame:
    # x=a always pairs with u (6 rows), x=b always with v (6 rows), so
    # (a,v) and (b,u) are never observed. Each absent cell's expected
    # count e = 6*6/12 = 3 must still contribute e to chi2 via the
    # closed-form missing-cell fold: chi2 = 12, Cramér's V = 1.
    rows = [("a", "u")] * 6 + [("b", "v")] * 6
    df = spark.createDataFrame(rows, "x string, y string")
    r = stats.chi2_independence(df, "x", "y").collect()[0]
    assert r["chi2"] == pytest.approx(12.0)
    assert r["cramers_v"] == pytest.approx(1.0)


# --------------------------------------------------------- pmi_bigrams

def test_pmi_exact_counts_and_value(spark):
    # corpus: "x y" repeated 6 times in one doc (tokens x y x y ...):
    # bigrams: (x,y) x6, (y,x) x5; unigrams x=6, y=6, N1=12, N2=11.
    docs = spark.createDataFrame(
        [(1, " ".join(["x y"] * 6))], "doc_id long, text string"
    )
    out = {
        (r["w1"], r["w2"]): r
        for r in text.pmi_bigrams(docs, "doc_id", "text", min_count=5).collect()
    }
    assert set(out) == {("x", "y"), ("y", "x")}
    r = out[("x", "y")]
    assert (r["c_12"], r["c_1"], r["c_2"]) == (6, 6, 6)
    assert (r["n_bigrams"], r["n_unigrams"]) == (11, 12)
    want = round(math.log((6 / 11) / ((6 / 12) * (6 / 12))), 4)
    assert r["pmi"] == pytest.approx(want)


def test_pmi_min_count_filters(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "c d")], "doc_id long, text string"
    )
    out = text.pmi_bigrams(docs, "doc_id", "text", min_count=2).collect()
    assert {(r["w1"], r["w2"]) for r in out} == {("a", "b")}


def test_pmi_skips_null_and_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, "solo"), (3, "p q"), (4, "p q")],
        "doc_id long, text string",
    )
    out = text.pmi_bigrams(docs, "doc_id", "text", min_count=1).collect()
    # 'solo' yields no bigram; unigram totals still include it
    assert {(r["w1"], r["w2"]) for r in out} == {("p", "q")}
    assert out[0]["n_unigrams"] == 5  # solo + p,q,p,q


# --------------------------------------------------- containment_pairs

_BASE = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"


def test_containment_subset_pair_scores_one(spark):
    # doc 1 is a strict prefix of doc 2 (10 vs 30 tokens): every shingle
    # of doc 1 appears in doc 2 -> containment = 1.0, jaccard well below.
    big = _BASE + " " + " ".join(f"w{i} x{i} y{i}" for i in range(7))
    docs = spark.createDataFrame(
        [(1, _BASE), (2, big)], "doc_id long, text string"
    )
    out = dedup.containment_pairs(
        docs, "doc_id", "text", threshold=0.8
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["containment"] == pytest.approx(1.0)
    assert r["n_small"] == 8  # 10 tokens -> 8 distinct 3-gram shingles
    assert r["jaccard"] < 0.5  # symmetric score misses the embedding


def test_containment_unrelated_docs_no_pair(spark):
    docs = spark.createDataFrame(
        [(1, _BASE), (2, "one two three four five six seven eight nine")],
        "doc_id long, text string",
    )
    assert (
        dedup.containment_pairs(docs, "doc_id", "text", threshold=0.5).count()
        == 0
    )


def test_containment_max_df_guard_drops_hot_shingles(spark):
    # one boilerplate sentence shared by ALL docs plus unique content:
    # with max_df=2 the shared shingles are excluded, so no pair survives.
    docs = spark.createDataFrame(
        [(i, _BASE + f" unique{i}") for i in range(1, 5)],
        "doc_id long, text string",
    )
    hot = dedup.containment_pairs(docs, "doc_id", "text", threshold=0.8)
    guarded = dedup.containment_pairs(
        docs, "doc_id", "text", threshold=0.8, max_df=2
    )
    assert hot.count() > 0  # boilerplate alone fakes high containment
    assert guarded.count() == 0
