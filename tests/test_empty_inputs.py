"""Empty-input robustness: a production pipeline meets empty partitions
(fresh day, filtered-out tenant, empty backfill window) constantly. Every
core query must PLAN AND EXECUTE on zero-row tables — no first()-crash, no
div-by-zero, no window over nothing blowing up. (Ops documented to need
data — e.g. cosine_pairs_lsh's dim inference — are excluded and raise a
clear error by contract instead.)"""

from __future__ import annotations

import pytest

SRC = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# batch queries only: the file-stream source needs its events.parquet as a
# flat file (driver layout), which the schema-preserving empty rewrite
# can't reproduce (Spark writes directories)
SUBSET = [
    "op-groupby-sum", "op-count", "op-count-distinct", "op-eda-report",
    "op-dedup-exact", "op-dedup-fuzzy", "op-tpch-q1", "op-tpch-q5",
    "op-tpch-q21", "op-text-analysis", "op-text-quality",
    "op-sample-stratified", "op-shard-assign", "op-seq-pack",
    "op-window-funcs", "op-window-topk", "op-asof-join", "op-range-join",
    "op-pii-redact", "op-skew-report", "op-map-funcs", "op-lateral-topk",
    "op-grouped-zscore", "op-gapfill-locf", "op-scd2", "op-upsert",
    # embedding ops: empty corpus short-circuits to schema-correct zero rows
    "op-dedup-embedding", "op-dedup-embedding-lsh", "op-sim-search-lsh",
    "op-sim-search-ivf", "op-kmeans", "op-semdedup",
    # zero-row partitioned ORC write reads back via declared schema
    "op-orc-roundtrip",
    # round-5 event-sequence / retrieval ops
    "op-sessionize", "op-funnel", "op-retention", "op-transitions",
    "op-rolling-window", "op-active-users", "op-ohlc-downsample",
    "op-attribution", "op-anomaly-mad", "op-bm25", "op-span-dup-stats",
    "op-sample-weighted",
    # batch-11 stats / graph ops: empty facts must yield schema-correct
    # zero-or-null outputs, never a first()-crash or divide error
    "op-corr-matrix", "op-entropy-profile", "op-mutual-info", "op-ab-test",
    "op-revenue-concentration", "op-benford", "op-cusum-changepoint",
    "op-knn-classify", "op-pagerank", "op-graph-triangles",
    # batch-12 interval ops (the stream op is excluded like the other
    # stream queries: it writes its own source files, which an empty
    # frame can't produce a schema-inferable directory for)
    "op-interval-overlap", "op-peak-concurrency",
    # batch-13 stats ops
    "op-grouped-trend", "op-seasonality", "op-k-anonymity",
    "op-bootstrap-ci", "op-ab-welch", "op-cuped",
    # batch-14 ops
    "op-changelog-compact", "op-binary-dedup", "op-winsorize",
    # batch-15 ops (op-random-project excluded: dim inference raises the
    # documented loud error on an empty corpus, like the LSH ops)
    "op-psi-drift", "op-dp-counts", "op-bpe-train", "op-bpe-encode",
    "op-hll-intersect", "op-langid-eval",
    # batch-16 versioned-table ops (commits record schema, so empty
    # tables stay readable)
    "op-table-versioned", "op-time-travel-diff", "op-table-merge",
    "op-graph-bfs", "op-degree-stats", "op-lpa-communities",
    "op-ppr-recommend", "op-join-advisor", "op-lsh-tuning",
    "op-ivf-tuning", "op-lsh-planes-tuning",
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        (
            spark.read.parquet(f"{SRC}/{t}.parquet")
            .limit(0)
            .coalesce(1)
            .write.parquet(str(d / f"{t}.parquet"))
        )
    return str(d)


@pytest.mark.parametrize("name", SUBSET)
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __spark_entry__ as m

    rows = m.queries()[name](spark, empty_sf_dir).collect()
    # global aggregates legitimately return one all-zero/null row;
    # everything else returns no rows — either way, no exception.
    assert isinstance(rows, list)
