"""Engine facade — the one-object entry point a reference user switches to.

The reference (``/root/reference/proj-eng-dados/main.py``) exposes four
module-level stage functions over global path constants. The engine exposes
the same lifecycle (extract → bronze → silver → gold) plus the full operator
surface as methods over an owned SparkSession:

    from etl_pipeline_api_spark.engine import Engine

    eng = Engine()                              # builds the tuned session
    df = eng.read_parquet("/data/bronze")       # hive-aware scan
    df = eng.sql("SELECT ...")                  # SQL passthrough
    report = eng.dq(df, checks=[...])           # one-pass DQ gate
    eng.write_partitioned(df, "/data/silver")   # snappy, dynamic overwrite
    eng.run_pipeline(stages)                    # medallion runner

Everything is a thin delegation to the operator modules — the facade adds
discoverability, not behavior (each target documents its own scale shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .operators.dq import DQCheck, DQSuite
from .session import get_spark


class Engine:
    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark or get_spark()

    # -- sources / sinks ------------------------------------------------
    def read_parquet(self, path: str) -> DataFrame:
        from .sources.parquet_source import scan_parquet

        return scan_parquet(self.spark, path)

    def read_json_pages(self, path: str, record_schema) -> DataFrame:
        """Dual-envelope JSON scan with corrupt-record isolation (§2.1).
        ``record_schema`` is the explicit record StructType — declared, not
        inferred, for deterministic typing at scale (SURVEY §1.3)."""
        from .sources.json_source import scan_json_pages

        return scan_json_pages(self.spark, path, record_schema)

    def write_partitioned(
        self, df: DataFrame, path: str, partition_cols: list[str] = ("ano", "mes")
    ) -> None:
        from .sources.parquet_source import write_partitioned

        write_partitioned(df, path, list(partition_cols))

    # -- query surfaces -------------------------------------------------
    def sql(self, text: str) -> DataFrame:
        return self.spark.sql(text)

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    # -- quality --------------------------------------------------------
    def dq(
        self,
        df: DataFrame,
        checks: list[DQCheck],
        required_columns: list[str] | None = None,
    ) -> DataFrame:
        """One-pass violation counts (does not gate; see DQSuite.gate)."""
        return DQSuite(
            required_columns=list(required_columns or []), checks=checks
        ).violations_df(df)

    def dq_gate(
        self,
        df: DataFrame,
        checks: list[DQCheck],
        required_columns: list[str] | None = None,
    ) -> None:
        """Abort-before-write gate (the reference's silver gate semantics,
        main.py:234-239, hardened to raise instead of print-and-continue)."""
        DQSuite(
            required_columns=list(required_columns or []), checks=checks
        ).gate(df)

    # -- orchestration --------------------------------------------------
    def run_pipeline(self, pipeline) -> dict[str, DataFrame]:
        return pipeline.run(self.spark)

    # -- formats beyond parquet/JSON ------------------------------------
    def read_orc(self, path: str) -> DataFrame:
        from .sources.orc_source import read_orc

        return read_orc(self.spark, path)

    def write_orc(
        self, df: DataFrame, path: str, partition_by: list[str] | None = None
    ) -> None:
        from .sources.orc_source import write_orc

        write_orc(df, path, partition_by=partition_by)

    # -- dedup / similarity (LLM corpus toolkit, §2.9) -------------------
    def dedup_exact(
        self, df: DataFrame, key_cols: list[str], id_col: str
    ) -> DataFrame:
        """Keep the min-id row per duplicate key group (one window shuffle)."""
        from .operators.dedup import exact_dedup

        return exact_dedup(df, key_cols, id_col)

    def dedup_minhash(
        self, df: DataFrame, id_col: str, text_col: str,
        threshold: float = 0.5, max_bucket: int | None = None,
    ) -> DataFrame:
        """Near-dup candidate pairs at scale (MinHash LSH band join +
        exact-Jaccard verify; max_bucket = hot-bucket skew guard)."""
        from .operators.dedup import minhash_lsh_pairs

        return minhash_lsh_pairs(
            df, id_col, text_col, threshold=threshold, max_bucket=max_bucket
        )

    def similar_topk(
        self, corpus: DataFrame, queries: DataFrame,
        id_col: str, vec_col: str, k: int = 5,
    ) -> DataFrame:
        from .operators.similarity import cosine_topk

        return cosine_topk(corpus, queries, id_col, vec_col, k=k)

    def curate(self, docs: DataFrame, **kwargs) -> DataFrame:
        """Full corpus curation (lang → quality → dedup chain); see
        plans.corpus.curate for every knob."""
        from .plans.corpus import curate

        return curate(docs, **kwargs)

    # -- sampling / sharding ---------------------------------------------
    def stratified_sample(
        self, df: DataFrame, strata_cols: list[str], id_col: str, n_per: int
    ) -> DataFrame:
        from .operators.sampling import stratified_sample

        return stratified_sample(df, strata_cols, id_col, n_per)

    def write_shards(
        self, df: DataFrame, path: str, id_col: str, n_shards: int
    ) -> None:
        from .operators.sampling import write_shards

        write_shards(df, path, id_col, n_shards)

    # -- diagnostics -----------------------------------------------------
    def skew_report(self, df: DataFrame, key_col: str) -> DataFrame:
        """Pre-join key-distribution probe (broadcast vs salt vs shuffle)."""
        from .operators.diagnostics import skew_report

        return skew_report(df, key_col)

    # -- event-sequence analytics (round 5) ------------------------------
    def sessionize(self, events: DataFrame, **kwargs) -> DataFrame:
        """Inactivity-gap sessions (behavioral.sessionize)."""
        from .operators.behavioral import sessionize

        return sessionize(events, **kwargs)

    def funnel(self, events: DataFrame, steps: list[str], **kwargs) -> DataFrame:
        """Strict-order conversion funnel (behavioral.funnel)."""
        from .operators.behavioral import funnel

        return funnel(events, steps, **kwargs)

    def retention(self, events: DataFrame, **kwargs) -> DataFrame:
        from .operators.behavioral import retention

        return retention(events, **kwargs)

    def attribution(self, events: DataFrame, **kwargs) -> DataFrame:
        from .operators.behavioral import last_touch_attribution

        return last_touch_attribution(events, **kwargs)

    def ohlc(self, events: DataFrame, **kwargs) -> DataFrame:
        from .operators.behavioral import ohlc_downsample

        return ohlc_downsample(events, **kwargs)

    def mad_outliers(
        self, df: DataFrame, key_col: str, value_col: str, **kwargs
    ) -> DataFrame:
        from .operators.diagnostics import mad_outliers

        return mad_outliers(df, key_col, value_col, **kwargs)

    def bm25(
        self, docs: DataFrame, id_col: str, text_col: str, terms: list[str], **kw
    ) -> DataFrame:
        from .operators.text import bm25_scores

        return bm25_scores(docs, id_col, text_col, terms, **kw)

    def weighted_sample(
        self, df: DataFrame, id_col: str, weight_col: str, k: int
    ) -> DataFrame:
        from .operators.sampling import weighted_sample

        return weighted_sample(df, id_col, weight_col, k)

    def span_dup_stats(
        self, docs: DataFrame, id_col: str, text_col: str, n: int = 8
    ) -> DataFrame:
        from .operators.dedup import span_dup_stats

        return span_dup_stats(docs, id_col, text_col, n)

    # ---- statistical profiling / inference (operators.stats) ----

    def corr_matrix(self, df: DataFrame, cols: list[str]) -> DataFrame:
        from .operators.stats import corr_matrix

        return corr_matrix(df, cols)

    def entropy_profile(self, df: DataFrame, cols: list[str]) -> DataFrame:
        from .operators.stats import entropy_profile

        return entropy_profile(df, cols)

    def mutual_info(
        self, df: DataFrame, col_x: str, col_y: str
    ) -> DataFrame:
        from .operators.stats import mutual_info

        return mutual_info(df, col_x, col_y)

    def ab_test(self, events: DataFrame, **kwargs) -> DataFrame:
        from .operators.stats import ab_test

        return ab_test(events, **kwargs)

    def revenue_concentration(
        self, orders: DataFrame, **kwargs
    ) -> DataFrame:
        from .operators.stats import revenue_concentration

        return revenue_concentration(orders, **kwargs)

    def benford(self, df: DataFrame, amount_col: str) -> DataFrame:
        from .operators.stats import benford_profile

        return benford_profile(df, amount_col)

    def changepoints(self, events: DataFrame, **kwargs) -> DataFrame:
        from .operators.stats import cusum_changepoint

        return cusum_changepoint(events, **kwargs)

    # ---- graph analytics (operators.graph) ----

    def basket_edges(
        self, df: DataFrame, basket_col: str, item_col: str, **kwargs
    ) -> DataFrame:
        from .operators.graph import basket_edges

        return basket_edges(df, basket_col, item_col, **kwargs)

    def pagerank(self, edges: DataFrame, **kwargs) -> DataFrame:
        from .operators.graph import pagerank

        return pagerank(edges, **kwargs)

    def triangle_stats(self, edges: DataFrame) -> DataFrame:
        from .operators.graph import triangle_stats

        return triangle_stats(edges)

    # ---- interval analytics / classification ----

    def interval_overlaps(
        self, intervals: DataFrame, id_col: str, start_col: str,
        end_col: str, **kwargs,
    ) -> DataFrame:
        from .operators.joins import interval_overlap_pairs

        return interval_overlap_pairs(
            intervals, id_col, start_col, end_col, **kwargs
        )

    def peak_concurrency(
        self, intervals: DataFrame, start_col: str, end_col: str, **kwargs
    ) -> DataFrame:
        from .operators.behavioral import peak_concurrency

        return peak_concurrency(intervals, start_col, end_col, **kwargs)

    def knn_classify(
        self, corpus: DataFrame, queries: DataFrame, id_col: str,
        vec_col: str, label_col: str, k: int = 5,
    ) -> DataFrame:
        from .operators.similarity import knn_classify

        return knn_classify(corpus, queries, id_col, vec_col, label_col, k)

    def grouped_trend(self, events: DataFrame, **kwargs) -> DataFrame:
        from .operators.stats import grouped_trend

        return grouped_trend(events, **kwargs)

    def seasonality(self, events: DataFrame, **kwargs) -> DataFrame:
        from .operators.stats import seasonality_strength

        return seasonality_strength(events, **kwargs)

    def k_anonymity(
        self, df: DataFrame, quasi_cols: list[str], sensitive_col: str,
        k_threshold: int = 5,
    ) -> DataFrame:
        from .operators.stats import k_anonymity_profile

        return k_anonymity_profile(df, quasi_cols, sensitive_col, k_threshold)

    def bootstrap_ci(
        self, df: DataFrame, id_col: str, value_col: str, **kwargs
    ) -> DataFrame:
        from .operators.stats import bootstrap_mean_ci

        return bootstrap_mean_ci(df, id_col, value_col, **kwargs)

    def psi_drift(
        self, df: DataFrame, group_col: str, value_col: str, **kwargs
    ) -> DataFrame:
        from .operators.stats import psi_drift

        return psi_drift(df, group_col, value_col, **kwargs)

    def dp_counts(
        self, df: DataFrame, group_col: str, epsilon: float = 1.0
    ) -> DataFrame:
        from .operators.stats import dp_noisy_counts

        return dp_noisy_counts(df, group_col, epsilon)

    def random_project(
        self, df: DataFrame, id_col: str, vec_col: str, out_dim: int = 16
    ) -> DataFrame:
        from .operators.similarity import random_project

        return random_project(df, id_col, vec_col, out_dim)

    def bpe_train(
        self, df: DataFrame, text_col: str, n_merges: int = 8
    ) -> DataFrame:
        from .operators.text import bpe_train

        return bpe_train(df, text_col, n_merges)

    def bpe_encode(
        self, df: DataFrame, id_col: str, text_col: str,
        merges: list[tuple[str, str]],
    ) -> DataFrame:
        from .operators.text import bpe_encode

        return bpe_encode(df, id_col, text_col, merges)

    def changelog_compact(self, changelog: DataFrame, **kwargs) -> DataFrame:
        from .operators.dq import changelog_compact

        return changelog_compact(changelog, **kwargs)

    def dedup_payloads(
        self, df: DataFrame, id_col: str, payload_col: str
    ) -> DataFrame:
        from .operators.multimodal import dedup_payloads

        return dedup_payloads(df, id_col, payload_col)

    def winsorize(
        self, df: DataFrame, group_col: str, value_col: str, **kwargs
    ) -> DataFrame:
        from .operators.stats import winsorized_stats

        return winsorized_stats(df, group_col, value_col, **kwargs)

    def welch_t_test(self, events: DataFrame, **kwargs) -> DataFrame:
        from .operators.stats import welch_t_test

        return welch_t_test(events, **kwargs)

    def cuped(self, events: DataFrame, **kwargs) -> DataFrame:
        from .operators.stats import cuped_adjustment

        return cuped_adjustment(events, **kwargs)

    def classification_report(
        self, df: DataFrame, label_col: str, pred_col: str
    ) -> DataFrame:
        from .operators.stats import classification_report

        return classification_report(df, label_col, pred_col)

    def versioned_table(self, root: str):
        from .sources.versioned_table import VersionedTable

        return VersionedTable(root)

    # ---- graph traversal / recommendations / planning ----

    def bfs(self, edges: DataFrame, source: int, **kwargs) -> DataFrame:
        from .operators.graph import bfs_distances

        return bfs_distances(edges, source, **kwargs)

    def communities(self, edges: DataFrame, **kwargs) -> DataFrame:
        from .operators.graph import lpa_communities

        return lpa_communities(edges, **kwargs)

    def degree_stats(self, edges: DataFrame) -> DataFrame:
        from .operators.graph import degree_stats

        return degree_stats(edges)

    def related_items(
        self, edges: DataFrame, source: int, **kwargs
    ) -> DataFrame:
        from .operators.graph import personalized_pagerank

        return personalized_pagerank(edges, source, **kwargs)

    def join_advisor(
        self, left: DataFrame, right: DataFrame, key_col: str, **kwargs
    ) -> DataFrame:
        from .operators.diagnostics import join_advisor

        return join_advisor(left, right, key_col, **kwargs)
