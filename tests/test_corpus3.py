"""Corpus-layout batch 3 (chunking, sequence packing, tf-idf) and
relational batch 3 (TPC-H Q10/Q14/Q19): semantics + plan-shape tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_api_spark.operators import chunking, text

from test_plans import plan_of, tree_of

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


# ---------------------------------------------------------------------
# chunk_docs
# ---------------------------------------------------------------------

def test_chunks_cover_document_exactly(spark):
    """Stitching chunks back (dropping each chunk's leading overlap)
    reproduces the tokenized document exactly — no token lost, none
    duplicated beyond the declared overlap."""
    docs = _docs(spark).limit(50)
    out = chunking.chunk_docs(docs, "doc_id", "text", size=64, overlap=16)
    rebuilt = (
        out.withColumn("toks", F.split("chunk_text", " "))
        .withColumn(
            "tail",
            F.when(F.col("chunk_id") == 0, F.col("toks")).otherwise(
                F.expr("slice(toks, 17, size(toks) - 16)")
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct("chunk_id", "tail"))
                ).getField("tail")
            ).alias("rebuilt")
        )
    )
    orig = docs.select(
        "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("orig")
    )
    joined = rebuilt.join(orig, "doc_id")
    assert joined.filter(F.col("rebuilt") != F.col("orig")).count() == 0


def test_chunk_sizes_and_overlap(spark):
    docs = _docs(spark).limit(50)
    out = chunking.chunk_docs(docs, "doc_id", "text", size=64, overlap=16)
    rows = out.select("doc_id", "chunk_id", "chunk_text", "n_chunk_tokens").collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r.chunk_id)
        for i, r in enumerate(chunks):
            toks = r.chunk_text.split(" ")
            assert len(toks) == r.n_chunk_tokens <= 64
            if i + 1 < len(chunks):  # non-final chunks are full-size
                assert r.n_chunk_tokens == 64
                # consecutive chunks share exactly the 16-token overlap
                nxt = chunks[i + 1].chunk_text.split(" ")
                assert toks[48:] == nxt[:16]


def test_chunk_plan_is_shuffle_free(spark):
    # the only exchange is fan_out()'s round-robin small-input spread —
    # no hash shuffle is inherent to the operator
    plan = plan_of(spark, "op-doc-chunk")
    assert plan.count("Arguments: hashpartitioning") == 0
    assert plan.split("\n\n(")[0].count("Generate") == 1


# ---------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------

def test_packing_is_gapless_and_exclusive(spark):
    docs = _docs(spark)
    counts = docs.select(
        "doc_id", F.size(F.split(F.lower(F.trim("text")), r"\s+")).alias("n")
    )
    out = chunking.pack_sequences(counts, "doc_id", "n", seq_len=128, n_shards=8)
    rows = sorted(out.collect(), key=lambda r: r.offset)
    pos = 0
    for r in rows:
        assert r.offset == pos, "packing must be gapless and exclusive"
        assert r.seq_first == r.offset // 128
        assert r.seq_last == (r.offset + r.n_tokens - 1) // 128
        assert r.pos_in_seq == r.offset % 128
        pos += r.n_tokens


def test_packing_deterministic_across_partitionings(spark):
    docs = _docs(spark)
    counts = docs.select(
        "doc_id", F.size(F.split(F.lower(F.trim("text")), r"\s+")).alias("n")
    )
    a = chunking.pack_sequences(counts, "doc_id", "n", seq_len=256, n_shards=8)
    b = chunking.pack_sequences(
        counts.repartition(13), "doc_id", "n", seq_len=256, n_shards=8
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pack_offsets_broadcast_not_collected(spark):
    # the shard-offset frame joins via broadcast: no driver collect in the
    # operator, and the only data-sized exchange is the shard hash shuffle.
    tree = tree_of(spark, "op-seq-pack")
    assert "BroadcastHashJoin" in tree


# ---------------------------------------------------------------------
# tfidf_keywords
# ---------------------------------------------------------------------

def test_tfidf_ranks_are_dense_and_bounded(spark):
    docs = _docs(spark).limit(100)
    out = text.tfidf_keywords(docs, "doc_id", "text", k=5).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for rows in by_doc.values():
        ranks = sorted(r.rnk for r in rows)
        assert ranks == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5
        rows.sort(key=lambda r: r.rnk)
        for a, b in zip(rows, rows[1:]):
            assert (a.tf, -a.df_docs, b.token) >= (b.tf, -b.df_docs, a.token), (
                "ordering must be (tf desc, df asc, token asc)"
            )


def test_tfidf_tf_counts_exact(spark):
    docs = _docs(spark).limit(20)
    out = text.tfidf_keywords(docs, "doc_id", "text", k=3).collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    for r in out:
        toks = texts[r.doc_id].strip().lower().split()
        assert r.tf == sum(1 for t in toks if t == r.token)


# ---------------------------------------------------------------------
# TPC-H batch 3 plan shapes
# ---------------------------------------------------------------------

def test_q10_broadcasts_dims_pushes_filters(spark):
    plan = plan_of(spark, "op-tpch-q10")
    tree = plan.split("\n\n(")[0]
    # customer + nation always broadcast; the size-pruned half-year orders
    # side may broadcast too at tiny SF — never a sort-merge join
    assert tree.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in tree
    assert "EqualTo(l_returnflag,R)" in plan  # pushed to the lineitem scan
    assert "o_orderdate" in plan and "PushedFilters" in plan


def test_q14_single_broadcast_no_data_shuffle(spark):
    plan = plan_of(spark, "op-tpch-q14")
    tree = plan.split("\n\n(")[0]
    assert tree.count("BroadcastHashJoin") == 1
    # single-row aggregate: partial -> exchange of 1-row partials -> final;
    # no hashpartitioning of data-sized input
    assert plan.count("Arguments: hashpartitioning") == 0


def test_q19_disjunction_is_join_filter_not_union(spark):
    tree = tree_of(spark, "op-tpch-q19")
    assert tree.count("BroadcastHashJoin") == 1
    assert "Union" not in tree  # Catalyst must not explode the OR clauses
