"""Unit tests for operators/stats.py and operators/graph.py — tiny
hand-built frames with closed-form expected values, so the statistics
(entropy, MI, Gini, Benford, CUSUM, z-test) and graph results
(PageRank mass conservation, triangle count) are pinned independently
of the DuckDB oracle sweep."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from etl_pipeline_api_spark.operators import graph, similarity, stats

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def test_corr_matrix_perfect_and_inverse(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0)],
        "a double, b double, c double",
    )
    out = {
        (r["col_a"], r["col_b"]): r["corr"]
        for r in stats.corr_matrix(df, ["a", "b", "c"]).collect()
    }
    assert out[("a", "b")] == pytest.approx(1.0)
    assert out[("a", "c")] == pytest.approx(-1.0)
    assert out[("b", "c")] == pytest.approx(-1.0)
    assert len(out) == 3


def test_entropy_profile_closed_form(spark):
    # 'x': uniform over 4 levels -> 2 bits; 'y': constant -> 0 bits.
    df = spark.createDataFrame(
        [(lv, "k") for lv in ["a", "b", "c", "d"]], "x string, y string"
    )
    out = {
        r["column_name"]: (r["n_distinct"], r["entropy_bits"])
        for r in stats.entropy_profile(df, ["x", "y"]).collect()
    }
    assert out["x"] == (4, 2.0)
    assert out["y"] == (1, 0.0)


def test_mutual_info_independent_and_determined(spark):
    # Independent uniform bits: MI = 0, H(x)=H(y)=1, H(xy)=2.
    ind = spark.createDataFrame(
        [(x, y) for x in "01" for y in "01"], "x string, y string"
    )
    r = stats.mutual_info(ind, "x", "y").collect()[0]
    assert r["mi_bits"] == 0.0 and r["h_xy"] == 2.0
    # y determined by x: MI = H(x) = H(y) = H(xy) = 1 bit.
    det = spark.createDataFrame(
        [("0", "a"), ("1", "b")], "x string, y string"
    )
    r = stats.mutual_info(det, "x", "y").collect()[0]
    assert r["mi_bits"] == 1.0 and r["h_xy"] == 1.0


def test_ab_test_deterministic_split_and_guarded_z(spark):
    # users 0,2 (variant 0) never purchase; users 1,3 (variant 1) always.
    rows = []
    eid = 0
    for u in range(4):
        for i in range(4):
            rows.append(
                (
                    eid,
                    T0 + dt.timedelta(seconds=i),
                    u,
                    "purchase" if u % 2 == 1 else "view",
                    1.0,
                )
            )
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    r = stats.ab_test(ev).collect()[0]
    assert (r["n_a"], r["n_b"]) == (2, 2)
    assert (r["conv_a"], r["conv_b"]) == (0, 2)
    assert r["rate_a"] == 0.0 and r["rate_b"] == 1.0
    assert r["z"] == pytest.approx(2.0)  # (1-0)/sqrt(.5*.5*(1/2+1/2))
    # Degenerate pool (everyone converts): z must be NULL, not an error.
    all_p = ev.withColumn("event_type", F.lit("purchase"))
    r = stats.ab_test(all_p).collect()[0]
    assert r["z"] is None


def test_revenue_concentration_equal_vs_skewed(spark):
    eq = spark.createDataFrame(
        [(k, f"O", 100.0, T0, "p") for k in range(10)],
        "o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate timestamp, o_orderpriority string",
    )
    r = stats.revenue_concentration(eq).collect()[0]
    assert r["gini"] == pytest.approx(0.0)
    assert r["top10_share"] == pytest.approx(0.1)
    skew = spark.createDataFrame(
        [(k, "O", 1.0 if k else 991.0, T0, "p") for k in range(10)],
        "o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate timestamp, o_orderpriority string",
    )
    r = stats.revenue_concentration(skew).collect()[0]
    assert r["top10_share"] == pytest.approx(0.991)
    assert r["gini"] > 0.8


def test_benford_shares_and_chi2(spark):
    # Exactly Benford-distributed counts out of 1000 -> tiny chi2 parts.
    rows = []
    for d in range(1, 10):
        n = round(math.log10(1 + 1 / d) * 1000)
        rows += [(float(f"{d}00"),)] * n
    df = spark.createDataFrame(rows, "l_extendedprice double")
    out = stats.benford_profile(df, "l_extendedprice").collect()
    assert [r["digit"] for r in out] == list(range(1, 10))
    assert all(r["chi2_part"] < 0.01 for r in out)
    assert sum(r["obs_share"] for r in out) == pytest.approx(1.0, abs=0.01)


def test_cusum_changepoint_finds_level_shift(spark):
    # 10 hourly buckets: 5 at ~2 events, then 5 at ~8 events; the CUSUM
    # extreme must land on the last low bucket (hour 4).
    rows, eid = [], 0
    for h in range(10):
        for i in range(2 if h < 5 else 8):
            rows.append(
                (eid, T0 + dt.timedelta(hours=h, minutes=i), 1, "view", 1.0)
            )
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    r = stats.cusum_changepoint(ev).collect()[0]
    assert r["n_buckets"] == 10
    assert r["cp_ts"] == T0 + dt.timedelta(hours=4)
    # |cusum| at the shift = 5 buckets * (5 - 2) = 15.
    assert r["max_abs_cusum"] == pytest.approx(15.0)


def test_knn_classify_majority_and_tie_break(spark):
    # Corpus: 3 vectors near +x labeled 1, 2 near +y labeled 2.
    # Query at +x must vote label 1 (3 of 5 neighbors).
    emb = spark.createDataFrame(
        [
            (10, [1.0, 0.0], 1),
            (11, [0.99, 0.1], 1),
            (12, [0.98, 0.2], 1),
            (13, [0.0, 1.0], 2),
            (14, [0.1, 0.99], 2),
            (0, [1.0, 0.05], 7),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = similarity.knn_classify(
        emb.filter("vec_id >= 10"),
        emb.filter("vec_id < 10"),
        "vec_id",
        "embedding",
        "label",
        k=5,
    ).collect()
    assert len(out) == 1
    assert out[0]["pred_label"] == 1 and out[0]["n_votes"] == 3
    # 2-2 tie (two label-1 and two label-2 neighbors at k=4) must break
    # toward the SMALLEST label.
    out = similarity.knn_classify(
        emb.filter("vec_id in (10, 11, 13, 14)"),
        emb.filter("vec_id < 10"),
        "vec_id",
        "embedding",
        "label",
        k=4,
    ).collect()
    assert out[0]["pred_label"] == 1 and out[0]["n_votes"] == 2


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, c, 1) for a, c in pairs], "a long, c long, support int"
    )


def test_pagerank_mass_and_symmetry(spark):
    # 4-cycle: perfectly symmetric, every rank = 1/4 at any iteration.
    cyc = _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    out = graph.pagerank(cyc, iters=3, k=10).collect()
    assert len(out) == 4
    assert all(r["rank"] == pytest.approx(0.25) for r in out)
    # Star: the hub must outrank every leaf, and total mass stays ~1.
    star = _edges(spark, [(1, 2), (1, 3), (1, 4), (1, 5)])
    out = graph.pagerank(star, iters=3, k=10).collect()
    by_rank = sorted(out, key=lambda r: -r["rank"])
    assert by_rank[0]["node"] == 1
    assert sum(r["rank"] for r in out) == pytest.approx(1.0, abs=1e-4)
    assert [r["rnk"] for r in sorted(out, key=lambda r: r["rnk"])] == [
        1,
        2,
        3,
        4,
        5,
    ]


def test_triangle_stats_counts(spark):
    # Triangle 1-2-3 plus pendant edge 3-4: 1 triangle, 5 wedges
    # (deg 2,2,3,1 -> 1+1+3+0), coeff = 3/5.
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (3, 4)])
    r = graph.triangle_stats(e).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (4, 4, 1)
    assert r["clustering_coeff"] == pytest.approx(0.6)


def test_basket_edges_support_prune(spark):
    df = spark.createDataFrame(
        [(b, i) for b in range(3) for i in (1, 2)] + [(0, 3)],
        "bk long, it long",
    )
    out = graph.basket_edges(df, "bk", "it", min_support=2).collect()
    # (1,2) appears in 3 baskets; (1,3)/(2,3) only once -> pruned.
    assert len(out) == 1
    assert (out[0]["a"], out[0]["c"], out[0]["support"]) == (1, 2, 3)


def _ev_hours(spark, spec):
    """spec: list of (type, hour_index, count) -> events frame with
    `count` events inside hour T0+hour_index."""
    rows, eid = [], 0
    for t, h, n in spec:
        for i in range(n):
            rows.append(
                (eid, T0 + dt.timedelta(hours=h, minutes=i % 60), 1, t, 1.0)
            )
            eid += 1
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_grouped_trend_recovers_line(spark):
    from etl_pipeline_api_spark.operators import stats

    # y = 2 + 3x over x=0..4 -> exact OLS recovery from integer sums.
    ev = _ev_hours(spark, [("a", x, 2 + 3 * x) for x in range(5)])
    r = stats.grouped_trend(ev).collect()[0]
    assert r["n_points"] == 5
    assert r["slope"] == pytest.approx(3.0)
    assert r["intercept"] == pytest.approx(2.0)
    # constant series -> slope 0
    ev = _ev_hours(spark, [("b", x, 7) for x in range(4)])
    r = stats.grouped_trend(ev).collect()[0]
    assert r["slope"] == 0.0 and r["intercept"] == 7.0


def test_seasonality_eta2_extremes(spark):
    from etl_pipeline_api_spark.operators import stats

    # Perfect 24h-periodic profile over 2 days: within-hod variance 0
    # -> eta2 == 1.
    spec = [("a", d * 24 + h, 1 + (h % 3)) for d in range(2) for h in range(24)]
    ev = _ev_hours(spark, spec)
    r = stats.seasonality_strength(ev).collect()[0]
    assert r["n_buckets"] == 48 and r["eta2"] == pytest.approx(1.0)
    # Constant series: SS_total = 0 -> eta2 is NULL, not a divide error.
    ev = _ev_hours(spark, [("b", h, 5) for h in range(48)])
    r = stats.seasonality_strength(ev).collect()[0]
    assert r["eta2"] is None


def test_k_anonymity_profile(spark):
    from etl_pipeline_api_spark.operators import stats

    df = spark.createDataFrame(
        # class (x,1): 3 rows, 2 sensitive values; class (y,2): 1 row.
        [("x", 1, 10), ("x", 1, 10), ("x", 1, 11), ("y", 2, 12)],
        "q1 string, q2 int, s int",
    )
    r = stats.k_anonymity_profile(df, ["q1", "q2"], "s", k_threshold=2).collect()[0]
    assert r["n_rows"] == 4 and r["n_classes"] == 2
    assert r["k_anonymity"] == 1 and r["l_diversity"] == 1
    assert r["n_rows_below_k"] == 1
    assert r["pct_rows_below_k"] == 25.0


def test_bootstrap_ci_deterministic_and_degenerate(spark):
    from etl_pipeline_api_spark.operators import stats

    const = spark.createDataFrame(
        [(i, 42.0) for i in range(200)], "id long, v double"
    )
    r = stats.bootstrap_mean_ci(const, "id", "v", n_replicates=20).collect()[0]
    # every resample of a constant column has mean 42
    assert r["n_replicates"] == 20
    assert r["mean"] == 42.0 and r["ci_lo"] == 42.0 and r["ci_hi"] == 42.0
    mixed = spark.createDataFrame(
        [(i, float(i % 10)) for i in range(500)], "id long, v double"
    )
    a = stats.bootstrap_mean_ci(mixed, "id", "v").collect()[0]
    b = stats.bootstrap_mean_ci(mixed, "id", "v").collect()[0]
    assert a == b  # deterministic resample — rerun-stable
    assert a["ci_lo"] <= a["mean"] <= a["ci_hi"]
    assert a["ci_lo"] < a["ci_hi"]  # real data -> non-degenerate interval


def test_changelog_compact_upsert_delete_reinsert(spark):
    from etl_pipeline_api_spark.operators.dq import changelog_compact

    log = spark.createDataFrame(
        [
            # key 1: insert -> update (survives with latest payload)
            (1, 1, 1, "U", 10.0),
            (1, 2, 2, "U", 20.0),
            # key 2: insert -> delete (gone)
            (2, 1, 3, "U", 30.0),
            (2, 2, 4, "D", None),
            # key 3: delete -> reinsert (survives — latest wins)
            (3, 1, 5, "D", None),
            (3, 2, 6, "U", 60.0),
            # key 4: same v0, higher v1 wins
            (4, 7, 7, "U", 70.0),
            (4, 7, 8, "U", 71.0),
        ],
        "k long, v0 long, v1 long, op string, amt double",
    )
    out = {
        r["k"]: r["amt"]
        for r in changelog_compact(
            log, ["k"], ["v0", "v1"], "op", ["amt"]
        ).collect()
    }
    assert out == {1: 20.0, 3: 60.0, 4: 71.0}


def test_dedup_payloads_groups(spark):
    from etl_pipeline_api_spark.operators import multimodal

    df = spark.createDataFrame(
        [(1, b"aaa"), (2, b"aaa"), (3, b"bbb"), (4, b"aaa"), (5, b"ccc")],
        "id long, payload binary",
    )
    out = multimodal.dedup_payloads(df, "id", "payload").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_bytes"], r["n_copies"], r["keeper_id"]) == (3, 3, 1)


def test_winsorized_stats_clips_outlier(spark):
    from etl_pipeline_api_spark.operators import stats

    # 99 values of 1.0 + one 1000.0: the winsorized mean must collapse
    # toward 1 while the raw mean is dragged to ~11.
    rows = [("a", 1.0)] * 99 + [("a", 1000.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = stats.winsorized_stats(df, "g", "v", lo=0.01, hi=0.99).collect()[0]
    assert r["n"] == 100
    assert r["mean"] == pytest.approx(10.99, abs=0.01)
    assert r["wins_mean"] < 2.0
    assert r["p_lo"] == 1.0


def test_psi_drift_stable_vs_shifted(spark):
    from etl_pipeline_api_spark.operators import stats

    # Group "stable": identical value distribution in both halves -> PSI ~ 0.
    # Group "shift": values jump by +100 in the second half -> PSI large.
    rows, eid = [], 0
    for half in range(2):
        for i in range(200):
            t = T0 + dt.timedelta(hours=half * 100 + i % 50)
            rows.append((eid, t, 1, "stable", float(i % 20))); eid += 1
            rows.append(
                (eid, t, 1, "shift", float(i % 20 + (100 if half else 0)))
            ); eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = {r["event_type"]: r["psi"] for r in
           stats.psi_drift(ev, "event_type", "value").collect()}
    assert out["stable"] < 0.05
    assert out["shift"] > 1.0


def test_dp_counts_noise_bounded_and_deterministic(spark):
    from etl_pipeline_api_spark.operators import stats

    df = spark.createDataFrame(
        [("a",)] * 100 + [("b",)] * 50, "g string"
    )
    a = stats.dp_noisy_counts(df, "g", epsilon=1.0).collect()
    b = stats.dp_noisy_counts(df, "g", epsilon=1.0).collect()
    assert sorted(a) == sorted(b)  # deterministic release
    got = {r["g"]: r["n_noisy"] for r in a}
    # Laplace(1) noise is within ~23 with prob 1-1e-10; mainly: it's
    # CLOSE to the true count but not exactly it (noise was added).
    assert abs(got["a"] - 100) < 25 and got["a"] != 100.0
    assert abs(got["b"] - 50) < 25 and got["b"] != 50.0
    # tighter epsilon -> larger scale; looser -> smaller noise
    loose = {r["g"]: r["n_noisy"]
             for r in stats.dp_noisy_counts(df, "g", epsilon=10.0).collect()}
    assert abs(loose["a"] - 100) < abs(got["a"] - 100) + 1e-9


def test_random_project_jl_distance_preservation(spark):
    import math
    import random

    from etl_pipeline_api_spark.operators import similarity

    rng = random.Random(7)
    vecs = [(i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(30)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    proj = {
        r["vec_id"]: r["proj"]
        for r in similarity.random_project(
            df, "vec_id", "embedding", out_dim=16
        ).collect()
    }
    assert all(len(p) == 16 for p in proj.values())
    # JL: pairwise distance ratios concentrate around 1 — check the
    # MEAN ratio (individual pairs can deviate at k=16).
    cast = {r["vec_id"]: r["embedding"] for r in df.collect()}
    ratios = []
    ids = sorted(proj)
    for i in range(0, 20, 2):
        a, b = ids[i], ids[i + 1]
        d_orig = math.dist(cast[a], cast[b])
        d_proj = math.dist(proj[a], proj[b])
        ratios.append(d_proj / d_orig)
    mean = sum(ratios) / len(ratios)
    assert 0.7 < mean < 1.3
    # deterministic: same input -> same projection
    again = {
        r["vec_id"]: r["proj"]
        for r in similarity.random_project(
            df, "vec_id", "embedding", out_dim=16
        ).collect()
    }
    assert again == proj
    # empty corpus raises the documented loud error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty"):
        similarity.random_project(
            df.limit(0), "vec_id", "embedding", out_dim=16
        )


def _python_bpe(texts, n_merges):
    """Pure-Python Sennrich BPE reference: word-frequency table, best
    adjacent pair per round (count desc, pair lexicographic), greedy
    left-to-right merge."""
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in t.strip().lower().split():
            if w:
                words[w] += 1
    vocab = {tuple(list(w) + ["</w>"]): n for w, n in words.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for sym, n in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < 2:
            break
        merges.append((a, b, cnt))
        new_vocab = {}
        for sym, n in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def test_bpe_train_matches_python_reference(spark):
    from etl_pipeline_api_spark.operators.text import bpe_train

    texts = [
        "low lower lowest newer new news",
        "low low lowest newest newer",
        "the newest news is new",
    ]
    want = _python_bpe(texts, 6)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r["left"], r["right"], r["n"])
        for r in bpe_train(df, "text", n_merges=6).orderBy("rnk").collect()
    ]
    assert got == want


def test_bpe_train_greedy_within_round(spark):
    from etl_pipeline_api_spark.operators.text import bpe_train

    # 'aaaa' + '</w>': round 1 merges (a,a) greedily -> aa aa </w>;
    # round 2 then merges (aa,aa). Counts: word repeated 3x.
    df = spark.createDataFrame([("aaaa aaaa aaaa",)], "text string")
    out = [
        (r["left"], r["right"], r["n"])
        for r in bpe_train(df, "text", n_merges=2).orderBy("rnk").collect()
    ]
    # round 1: (a,a) adjacency count is 3 per word (9 total); greedy
    # application yields [aa, aa, </w>]. Round 2 is a 3-3 tie between
    # (aa, aa) and (aa, </w>) — lexicographic tie-break picks
    # (aa, </w>) because '<' sorts before 'a'.
    assert out[0] == ("a", "a", 9)
    assert out[1] == ("aa", "</w>", 3)


def test_bpe_encode_matches_python(spark):
    from etl_pipeline_api_spark.operators.text import bpe_encode

    merges = [("l", "o"), ("lo", "w"), ("e", "r"), ("er", "</w>")]

    def enc_word(w):
        sym = list(w) + ["</w>"]
        for a, b in merges:
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b); i += 2
                else:
                    out.append(sym[i]); i += 1
            sym = out
        return sym

    texts = {1: "low lower", 2: "newer news", 3: "slow glow"}
    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    # exercise BOTH row-local paths: the Arrow-batched memoized loop
    # (default for >2 merges) and the JVM Catalyst fold — byte-identical
    # semantics is the bpe_encode contract
    for max_jvm in (2, 99):
        got = {
            r["doc_id"]: (r["n_chars_tok"], r["n_bpe_tok"])
            for r in bpe_encode(
                df, "doc_id", "text", merges, max_jvm_merges=max_jvm
            ).collect()
        }
        for k, t in texts.items():
            words = t.split()
            want_chars = sum(len(w) + 1 for w in words)
            want_bpe = sum(len(enc_word(w)) for w in words)
            assert got[k] == (want_chars, want_bpe), (max_jvm, k)


def test_welch_t_closed_form_and_guard(spark):
    from etl_pipeline_api_spark.operators import stats

    # variant 0 (users 0,2): values 1,3 per user -> n=4, mean 2, s2=4/3
    # variant 1 (users 1,3): values 5,9 per user -> n=4, mean 7, s2=16/3
    rows, eid = [], 0
    for u in range(4):
        for v in ([1.0, 3.0] if u % 2 == 0 else [5.0, 9.0]):
            rows.append((eid, T0, u, "purchase", v)); eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    r = stats.welch_t_test(ev).collect()[0]
    assert (r["n_a"], r["n_b"]) == (4, 4)
    assert (r["mean_a"], r["mean_b"]) == (2.0, 7.0)
    se = math.sqrt((4 / 3) / 4 + (16 / 3) / 4)
    assert r["t"] == pytest.approx(5.0 / se, abs=1e-3)
    # one-sided-empty input -> NULL t, not a divide error
    only_a = ev.filter("user_id % 2 = 0")
    r = stats.welch_t_test(only_a).collect()[0]
    assert r["t"] is None and r["n_b"] is None


def test_cuped_perfect_and_zero_correlation(spark):
    from etl_pipeline_api_spark.operators import stats

    # Y perfectly predicted by X (post = 2x pre): variance reduction ~100%.
    rows, eid = [], 0
    for u in range(20):
        pre = float(1 + u)
        rows.append((eid, T0, u, "purchase", pre)); eid += 1
        rows.append(
            (eid, T0 + dt.timedelta(hours=10), u, "purchase", 2 * pre)
        ); eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    r = stats.cuped_adjustment(ev).collect()[0]
    assert r["n_users"] == 20
    assert r["theta"] == pytest.approx(2.0)
    assert r["reduction_pct"] == pytest.approx(100.0)
    # Constant pre-period (var_x = 0): theta NULL, no divide error,
    # var unchanged.
    rows2 = []
    eid = 0
    for u in range(10):
        rows2.append((eid, T0, u, "purchase", 5.0)); eid += 1
        rows2.append(
            (eid, T0 + dt.timedelta(hours=10), u, "purchase", float(u))
        ); eid += 1
    ev2 = spark.createDataFrame(
        rows2,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    r = stats.cuped_adjustment(ev2).collect()[0]
    assert r["theta"] is None
    assert r["var_yadj"] == r["var_y"]


def test_classification_report_hand_confusion(spark):
    from etl_pipeline_api_spark.operators import stats

    # true a: 3 (2 pred a, 1 pred b); true b: 2 (both pred b);
    # true c: 1 (pred b) — c never predicted -> precision/f1 NULL.
    df = spark.createDataFrame(
        [("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"),
         ("c", "b")],
        "y string, p string",
    )
    out = {r["label"]: r for r in
           stats.classification_report(df, "y", "p").collect()}
    a, b, c = out["a"], out["b"], out["c"]
    assert (a["n_true"], a["n_pred"], a["tp"]) == (3, 2, 2)
    assert a["precision"] == 1.0 and a["recall"] == pytest.approx(0.6667)
    # b predicted 4 times (2 tp + 1 from a + 1 from c)
    assert (b["n_true"], b["n_pred"], b["tp"]) == (2, 4, 2)
    assert b["precision"] == 0.5 and b["recall"] == 1.0
    assert (c["n_true"], c["n_pred"], c["tp"]) == (1, 0, 0)
    assert c["precision"] is None and c["f1"] is None and c["recall"] == 0.0


def test_bfs_distances_path_and_depth_bound(spark):
    # path 1-2-3-4-5 plus shortcut 1-4: dist(4)=1 via shortcut, dist(5)=2.
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4)])
    out = {r["node"]: r["dist"] for r in
           graph.bfs_distances(e, source=1, max_depth=4).collect()}
    assert out == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2}
    # depth bound respected: from 5 with max_depth=1 only 4 is reached
    out = {r["node"]: r["dist"] for r in
           graph.bfs_distances(e, source=5, max_depth=1).collect()}
    assert out == {5: 0, 4: 1}
    # disconnected node never appears
    e2 = _edges(spark, [(1, 2), (8, 9)])
    out = {r["node"] for r in
           graph.bfs_distances(e2, source=1, max_depth=4).collect()}
    assert out == {1, 2}


def test_lpa_two_cliques_and_degree_stats(spark):
    # two 4-cliques joined by one bridge edge: LPA must separate them
    # into two communities (each labeled by its smallest member).
    clique = lambda base: [
        (base + i, base + j) for i in range(4) for j in range(i + 1, 4)
    ]
    e = _edges(spark, clique(1) + clique(10) + [(4, 10)])
    out = {r["node"]: r["community"] for r in
           graph.lpa_communities(e, iters=5).collect()}
    assert {out[n] for n in (1, 2, 3, 4)} == {1}
    assert {out[n] for n in (10, 11, 12, 13)} == {10}
    # degree stats on a star: hub degree 4, leaves 1; alpha finite
    star = _edges(spark, [(1, 2), (1, 3), (1, 4), (1, 5)])
    r = graph.degree_stats(star).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["max_degree"]) == (5, 4, 4)
    assert r["avg_degree"] == pytest.approx(1.6)
    assert r["alpha_mle"] > 1.0


def test_personalized_pagerank_localizes_mass(spark):
    # barbell: clique {1,2,3} - bridge 3-10 - clique {10,11,12}.
    # PPR from 1 must score its own clique above the far clique, and
    # exclude the source from the output.
    e = _edges(
        spark,
        [(1, 2), (1, 3), (2, 3), (3, 10), (10, 11), (10, 12), (11, 12)],
    )
    out = {r["node"]: r["score"] for r in
           graph.personalized_pagerank(e, source=1, iters=4, k=10).collect()}
    assert 1 not in out
    assert out[2] > out[11] and out[3] > out[12]
    # determinism
    again = {r["node"]: r["score"] for r in
             graph.personalized_pagerank(e, source=1, iters=4, k=10).collect()}
    assert again == out


def test_personalized_pagerank_mass_invariants(spark):
    # the op-ppr-mass-gate invariants on the barbell fixture: total mass
    # conserved at 1, source keeps at least the (1-d) teleport mass
    e = _edges(
        spark,
        [(1, 2), (1, 3), (2, 3), (3, 10), (10, 11), (10, 12), (11, 12)],
    )
    full = {r["node"]: r["rank"] for r in
            graph.personalized_pagerank(
                e, source=1, iters=4, k=10, full_ranks=True
            ).collect()}
    assert sum(full.values()) == pytest.approx(1.0, abs=1e-9)
    assert full[1] >= 0.15 - 1e-12


def test_join_advisor_rules(spark):
    from etl_pipeline_api_spark.operators.diagnostics import join_advisor

    big_uniform = spark.createDataFrame(
        [(i % 1000, i) for i in range(5000)], "k long, x long"
    )
    tiny = spark.createDataFrame([(i, i) for i in range(10)], "k long, y long")
    r = join_advisor(big_uniform, tiny, "k").collect()[0]
    assert r["strategy"] == "broadcast" and r["build_side"] == "right"
    # both big (limit lowered), probe side skewed -> salted
    hot = spark.createDataFrame(
        [(0, i) for i in range(900)] + [(i, i) for i in range(1, 101)],
        "k long, x long",
    )
    uniform = spark.createDataFrame(
        [(i % 100, i) for i in range(1000)], "k long, y long"
    )
    r = join_advisor(hot, uniform, "k", broadcast_row_limit=100).collect()[0]
    assert r["strategy"] == "salted"
    assert r["left_skew"] > 8.0
    # both big, both uniform -> plain shuffle
    r = join_advisor(
        big_uniform, uniform, "k", broadcast_row_limit=100
    ).collect()[0]
    assert r["strategy"] == "shuffle"
