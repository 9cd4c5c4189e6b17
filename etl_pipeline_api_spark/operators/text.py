"""Text-analysis operators for training-data pipelines (SURVEY.md §2.9).

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM,
whole-stage codegen) — no Python UDFs anywhere: at 100 TB these run as a
single scan-and-project over the documents table, no shuffle at all.

- token_stats:       whitespace tokens + BPE-ish subword count (regex token
                     classes) + char/len stats.
- quality_score:     heuristic [0,1] score from length / stopword ratio /
                     punctuation ratio / mean token length (the standard
                     cheap pre-filter before model-based quality).
- langid:            marker-stopword n-gram heuristic (deterministic; for
                     real corpora swap the marker table per language).
- fingerprint:       polynomial rolling hash (base 131 mod 1e9+7) over the
                     normalized text — deterministic doc fingerprint, exact
                     dedup key that survives whitespace normalization.
                     Expressed as fold(aggregate) over the char codes so the
                     same arithmetic is SQL-expressible in the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import tokens_expr

# BPE-ish token classes: letter runs, digit runs, single other-symbols
BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "for", "on", "with"]

LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "los", "de"],
    "fr": ["le", "les", "des", "une"],
    "de": ["der", "die", "und", "das"],
    "zh": ["的", "是", "了"],
}


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """op-text-tokens: per-doc token statistics in one projection pass."""
    from ..session import fan_out

    toks = tokens_expr(text_col)
    return fan_out(df).select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH), 0)).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(
            F.length(F.regexp_replace(F.col(text_col), r"\s+", ""))
            / F.greatest(F.size(toks), F.lit(1)),
            4,
        ).alias("mean_token_len"),
    )


def _stopword_ratio(text_col: str, toks: Column | None = None) -> Column:
    toks = tokens_expr(text_col) if toks is None else toks
    hits = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS))
    )
    return hits / F.greatest(F.size(toks), F.lit(1))


def _punct_ratio(text_col: str) -> Column:
    punct = F.length(F.regexp_replace(F.col(text_col), r"[A-Za-z0-9\s]", ""))
    return punct / F.greatest(F.length(F.col(text_col)), F.lit(1))


def quality_col(text_col: str, toks: Column | None = None) -> Column:
    """The quality score as a composable Column expression (row-local, so
    pipelines like plans/corpus.py compute it inline in ONE projection
    instead of scan+join per metric).

    `toks`: pass an already-MATERIALIZED token-array column to share one
    tokenization with sibling metrics (langid_cols) — inline split()
    expressions get copied into every lambda reference by CollapseProject,
    and the copies are what blew the capstone's driver-side plan-build up
    (see plans/corpus.py)."""
    length_ok = F.least(F.length(F.col(text_col)) / F.lit(200.0), F.lit(1.0))
    stop_ok = F.least(_stopword_ratio(text_col, toks) / F.lit(0.08), F.lit(1.0))
    return F.round(
        F.lit(0.4) * length_ok + F.lit(0.3) * stop_ok
        + F.lit(0.3) * (F.lit(1.0) - _punct_ratio(text_col)), 4
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """op-text-quality: cheap heuristic quality in [0,1].

    score = 0.4*length_ok + 0.3*stopword_ok + 0.3*(1 - punct_ratio), where
    length_ok saturates at 200 chars and stopword_ok at an 8% stopword rate
    (natural prose sits above it; keyword spam below).
    """
    from ..session import fan_out

    return fan_out(df).select(F.col(id_col), quality_col(text_col).alias("quality"))


def langid(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """op-text-langid: argmax of per-language marker-token rates.

    Deterministic tie-break: language order as listed (en before es ...).
    On the synthetic corpus every doc shares one vocabulary, so this mostly
    answers 'en' — the operator contract is the deterministic computation,
    not model-grade accuracy (swap markers/char-ngrams for production).
    """
    from ..session import fan_out

    best, best_score = langid_cols(text_col)
    return fan_out(df).select(F.col(id_col), best.alias("lang_guess"),
                              F.round(best_score, 4).alias("marker_rate"))


def langid_cols(text_col: str, toks: Column | None = None) -> tuple[Column, Column]:
    """(lang_guess, marker_rate) as composable Column expressions — see
    quality_col for why these exist separately from the df-level op (and
    for the shared-`toks` parameter).

    Selection is ONE lexicographic array_max over (score, priority)
    structs, NOT a chained when(cond, score).otherwise(prev) fold: the
    fold embeds the previous best-score tree ~3x per language (cond +
    otherwise), so 5 languages copied every token-filter lambda ~3^5
    times and Catalyst ANALYSIS of any plan containing the expression
    cost ~13 s on the driver before a single row moved (the curate()
    filter-phase build). The struct form is linear in languages; the
    priority field (+1 for the unknown sentinel, -index per language)
    reproduces the fold's exact tie semantics: a language displaces only
    on a strictly greater score, earlier languages win ties, and a
    corpus with no marker hits stays 'unknown'."""
    toks = tokens_expr(text_col) if toks is None else toks
    n = F.greatest(F.size(toks), F.lit(1))
    entries = [
        F.struct(
            (F.size(F.filter(toks, lambda t: t.isin(*markers))) / n).alias("score"),
            F.lit(-idx).alias("prio"),
            F.lit(lang).alias("lang"),
        )
        for idx, (lang, markers) in enumerate(LANG_MARKERS.items())
    ]
    sentinel = F.struct(
        F.lit(0.0).alias("score"), F.lit(1).alias("prio"), F.lit("unknown").alias("lang")
    )
    best = F.array_max(F.array(sentinel, *entries))
    return best.getField("lang"), best.getField("score")


FP_BASE = 131
FP_MOD = 1_000_000_007


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """op-text-fingerprint: rolling polynomial hash of the normalized text.

    h = fold(chars, acc -> (acc*131 + code) % 1e9+7), chars = unicode points
    of lower(trim(text)) with whitespace runs collapsed. The same fold is
    expressible in DuckDB (list_reduce), so this op is oracle-checked.
    """
    from ..session import fan_out

    return fan_out(df).select(F.col(id_col), fingerprint_col(text_col).alias("fingerprint"))


def fingerprint_col(text_col: str) -> Column:
    """The rolling-hash fingerprint as a composable Column expression."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return F.aggregate(
        # slice to exactly length(norm) chars — split("", …) can emit a
        # trailing empty element whose ascii()=0 would corrupt the fold
        F.slice(F.split(norm, ""), 1, F.length(norm)),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * FP_BASE + F.ascii(ch)) % FP_MOD,
    )


# PII patterns — kept to syntax RE2 (DuckDB) and java.util.regex (Spark)
# interpret identically, so the op is oracle-checkable.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+\d[\d-]{7,}\d"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_clean_col(text_col: str) -> Column:
    """The redacted text as a composable Column expression (see quality_col
    for the *_col pattern rationale — pipelines fold this into an existing
    projection instead of paying a separate pass)."""
    clean = F.regexp_replace(F.col(text_col), PII_EMAIL, "[EMAIL]")
    clean = F.regexp_replace(clean, PII_PHONE, "[PHONE]")
    return F.regexp_replace(clean, PII_IPV4, "[IP]")


def pii_redact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """op-pii-redact: scrub emails / phone numbers / IPv4 addresses from a
    text column — the standard pre-training privacy pass.

    COUNT SEMANTICS: n_emails / n_phones / n_ips are pattern occurrences on
    the RAW input text, each pattern counted independently. They are NOT
    "replacements performed": the replaces are chained (email → phone → IP),
    so a substring matched by more than one pattern (an IPv4 inside an email
    local-part, digits of a redacted email that also parse as a phone) is
    redacted once but contributes to every count it matches. The counts
    answer "how much PII did the scanner see", which is the audit number a
    privacy pass reports; the DuckDB oracle computes the identical raw-text
    counts.

    Row-local: three regexp_counts + three chained regexp_replaces in ONE
    projection (JVM regex, whole-stage codegen, zero shuffle — at 100 TB
    this runs at scan speed). The patterns are the cheap high-precision
    core; production adds locale-specific recalls behind the same columns.
    Returns (id, clean_text, n_emails, n_phones, n_ips).
    """
    from ..session import fan_out

    t = F.col(text_col)
    return fan_out(df).select(
        F.col(id_col),
        pii_clean_col(text_col).alias("clean_text"),
        F.regexp_count(t, F.lit(PII_EMAIL)).alias("n_emails"),
        F.regexp_count(t, F.lit(PII_PHONE)).alias("n_phones"),
        F.regexp_count(t, F.lit(PII_IPV4)).alias("n_ips"),
    )


def repetition_cols(toks: Column, n: int = 3) -> tuple[Column, Column]:
    """(dup_ngram_ratio, top_token_ratio) as composable Columns — the
    Gopher-style repetition signals: the fraction of word n-grams that are
    repeats of an earlier n-gram in the SAME doc, and the frequency share
    of the single most common token. Both entirely row-local (array ops in
    whole-stage codegen): zero shuffle at any scale. The O(distinct·len)
    per-row token count is bounded by document length, not corpus size.

    Takes a MATERIALIZED token-array column, not a text column: these
    expressions reference the array inside nested lambdas, and an inline
    split() expression would be copied per element (the expression-tree
    duplication trap — O(len²) re-tokenization).

    Returns exact INTEGER counts (n_tokens, n_grams, n_dup_grams,
    top_token_count) rather than rounded ratios: count/count divisions land
    on exact half-digits (1/32 = .03125) where Spark and DuckDB round
    differently — callers derive ratios at whatever precision they need."""
    from .dedup import ngrams_expr

    grams = ngrams_expr(toks, n)
    n_grams = F.size(grams)
    n_dup = n_grams - F.size(F.array_distinct(grams))
    top_token = F.when(
        F.size(toks) > 0,
        F.array_max(
            F.transform(
                F.array_distinct(toks),
                lambda t: F.size(F.filter(toks, lambda x: x == t)),
            )
        ),
    ).otherwise(F.lit(0))
    return F.size(toks), n_grams, n_dup, top_token


def tfidf_keywords(df: DataFrame, id_col: str, text_col: str, k: int = 5) -> DataFrame:
    """op-tfidf: top-k characteristic keywords per document, ranked by
    term frequency descending with document frequency ascending as the
    rarity tie-break (the integer-exact core of tf-idf: idf is monotone
    in df, and keeping the raw integers makes the op oracle-checkable —
    float idf ordering flips ties across engines' libm).

    Returns (id, token, tf, df_docs, rnk), rnk 1..k per doc.

    Scale shape: explode is linear in corpus token count; both groupBys
    are map-side combined; the df join keys on the token (sort-merge,
    linear — vocabulary is data-sized, never broadcast); final per-doc
    ranking windows on the doc id. No step is quadratic, nothing is
    collected.
    """
    from ..session import fan_out

    toks_df = fan_out(df).select(
        F.col(id_col), F.explode_outer(tokens_expr(text_col)).alias("token")
    ).filter(F.col("token").isNotNull())
    tf = toks_df.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    df_docs = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_docs"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("df_docs").asc(), F.col("token").asc()
    )
    return (
        tf.join(df_docs, "token")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(id_col, "token", "tf", "df_docs", "rnk")
    )


def repetition_metrics(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """op-text-repetition: per-doc repetition quality signals (see
    repetition_cols). High dup_ngram_ratio or top_token_ratio marks
    template/spam text the quality filter should drop. Two projections:
    tokens materialize first (see repetition_cols), then the row-local
    counts + derived ratios — still zero shuffle."""
    from ..session import fan_out

    toks_df = fan_out(df).select(
        F.col(id_col), tokens_expr(text_col).alias("__toks")
    )
    n_toks, n_grams, n_dup, top_token = repetition_cols(F.col("__toks"), n)
    return toks_df.select(
        F.col(id_col),
        n_toks.alias("n_tokens"),
        n_grams.alias("n_grams"),
        n_dup.alias("n_dup_grams"),
        top_token.alias("top_token_count"),
        (n_dup / F.greatest(n_grams, F.lit(1))).alias("dup_ngram_ratio"),
        (top_token / F.greatest(n_toks, F.lit(1))).alias("top_token_ratio"),
    )




def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every matching document to a bag-of-words
    query — the exact-keyword retrieval baseline that sits next to the
    embedding ANN path (similarity.py) in any search/RAG stack.

    score(d, q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)   (the monotone variant).

    Returns ``(id, score, n_terms)`` for docs matching ≥1 query term;
    no top-k cut here — rank/limit downstream so the gate compares the
    full scored set (ties in a cut would be engine-order-dependent).

    Scale shape: the corpus is scanned ONCE (tokens materialized, tf via
    a lateral filter on the row-local array — no explode of non-query
    tokens ever leaves the row); corpus stats (N, avgdl) and per-term
    document frequencies are two tiny aggregates cross/broadcast-joined
    back. One groupBy on the doc id; everything else is |terms|- or
    1-row frames.
    """
    from ..session import fan_out

    toks = fan_out(df).select(
        F.col(id_col).alias("__id"), tokens_expr(text_col).alias("__toks")
    )
    terms = F.array(*[F.lit(t) for t in query_terms])
    # per-doc: length + per-query-term tf, all row-local
    per_doc = toks.select(
        "__id",
        F.size("__toks").alias("dl"),
        F.transform(
            terms,
            lambda t: F.size(F.filter("__toks", lambda x: x == t)),
        ).alias("tfs"),
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = per_doc.select(
        "__id",
        "dl",
        F.explode(F.arrays_zip(terms.alias("term"), F.col("tfs").alias("tf"))).alias("z"),
    ).select("__id", "dl", F.col("z.term").alias("term"), F.col("z.tf").alias("tf")
    ).filter(F.col("tf") > 0)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
    scored = (
        tf.crossJoin(F.broadcast(stats))
        .join(F.broadcast(dfreq), "term")
        .select(
            "__id",
            F.lit(1).alias("__one"),
            (
                F.log(
                    (F.col("n_docs") - F.col("df_docs") + 0.5)
                    / (F.col("df_docs") + 0.5)
                    + 1.0
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("__s"),
        )
    )
    return scored.groupBy("__id").agg(
        F.round(F.sum("__s"), 4).alias("score"),
        F.sum("__one").cast("long").alias("n_terms"),
    ).select(F.col("__id").alias(id_col), "score", "n_terms")


_BPE_NUL = "\x00"  # fold sentinel: never a corpus symbol


def _bpe_apply_merge(symbols: Column, a: str, b: str) -> Column:
    """Greedy left-to-right application of one BPE merge (a, b) -> a+b
    over a symbol array, as a single Catalyst fold (no Python in the
    row path). The carry holds the last unmerged symbol; a freshly
    merged token never re-merges in the same round — standard greedy
    BPE semantics (so 'aaa' under (a,a) gives ['aa', 'a'])."""
    la, lb = F.lit(a), F.lit(b)
    nul = F.lit(_BPE_NUL)
    folded = F.aggregate(
        symbols,
        F.struct(
            F.array().cast("array<string>").alias("out"),
            nul.alias("carry"),
        ),
        lambda st, s: F.when(
            st["carry"] == nul,
            F.struct(st["out"].alias("out"), s.alias("carry")),
        )
        .when(
            (st["carry"] == la) & (s == lb),
            F.struct(
                F.concat(st["out"], F.array(F.concat(la, lb))).alias("out"),
                nul.alias("carry"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(st["out"], F.array(st["carry"])).alias("out"),
                s.alias("carry"),
            )
        ),
        lambda st: F.when(st["carry"] == nul, st["out"]).otherwise(
            F.concat(st["out"], F.array(st["carry"]))
        ),
    )
    return folded


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 8,
) -> DataFrame:
    """Train a BPE merge table on the corpus — the full iterative loop
    (op-bpe-pairs is one round of this; here the merges feed back).

    Classic Sennrich shape, distributed:
    1. ONE corpus pass builds the word-frequency table (the Heaps-law
       compression — |vocab| is far smaller than the corpus, so every
       later round iterates over the tiny vocab frame, never the
       corpus again).
    2. Each round: adjacent-pair counts weighted by word frequency
       (explode + one map-combined agg), deterministic argmax
       (count desc, then pair lexicographic) fetched to the driver —
       one 1-row collect per round; the merge TABLE is driver state by
       definition (it is the training output) — then the merge applied
       vocab-wide as a row-local Catalyst fold.
    3. ``localCheckpoint`` per round truncates the fold-over-fold
       lineage so plan-build cost stays O(1) per round (the
       connected-components lesson).

    Returns the merge table: (rnk, left, right, merged, n) — n_merges
    rows, deterministic. Non-SQL-expressible (iterative argmax
    feedback): rows-only driver check; unit tests pin it against a
    pure-Python BPE reference.
    """
    words = (
        df.select(
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "symbols",
            F.concat(
                F.split(F.col("w"), ""),
                F.array(F.lit("</w>")),
            ),
        )
        .select("symbols", "n")
        # eager, deliberately: a lazy checkpoint here (and per round
        # below) was MEASURED SLOWER in the r12 optimization round
        # (isolated 7-run median 2.565 s -> 2.780 s at sf0.1) — folding
        # the materialization into the argmax job beats nothing out of
        # fusing the stages on this shape, and the separate tiny job is
        # cheaper than the fused recompute. Left as the measured winner
        # (guide §1.1: empirical loop over first-principles).
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str, int]] = []
    vocab = words
    for _ in range(n_merges):
        pairs = (
            vocab.select(
                F.explode(
                    F.zip_with(
                        F.slice(F.col("symbols"), 1, F.size("symbols") - 1),
                        F.slice(F.col("symbols"), 2, F.size("symbols") - 1),
                        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                    )
                ).alias("p"),
                "n",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("cnt"))
        )
        top = (
            pairs.orderBy(
                F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc()
            )
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((a, b, cnt))
        if len(merges) == n_merges:
            # merge table complete — the post-final-merge vocab is never
            # read (the return value is the merge table; encoding re-applies
            # the merges from scratch), so skip its fold + eager
            # materialization job outright (r12 optimization round,
            # guide §1.2 step 1: don't compute things you throw away).
            break
        vocab = vocab.select(
            _bpe_apply_merge(F.col("symbols"), a, b).alias("symbols"), "n"
        ).localCheckpoint(eager=True)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(i + 1, a, b, a + b, c) for i, (a, b, c) in enumerate(merges)],
        "rnk int, left string, right string, merged string, n bigint",
    )


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
    max_jvm_merges: int = 2,
) -> DataFrame:
    """Encode documents with a trained BPE merge table — the inference
    half of :func:`bpe_train` (train once, encode the whole corpus;
    at 100 TB the merge table is a few KB shipped with the plan, the
    encode is a single row-local pass, zero shuffle).

    Two row-local execution paths, switched on merge-table size:

    - ``len(merges) <= max_jvm_merges``: each merge as the greedy
      Catalyst fold used during training (JVM-side, codegen'd — but the
      fold chain bakes every merge as a NESTED expression, so plan size
      and eval cost grow with the table: 8 merges measured 23.9 s at
      sf0.1, the slowest batch query of round 6).
    - otherwise: ONE Arrow-batched pandas_udf applying the identical
      greedy left-to-right loop per WORD, memoized per TASK (the memo
      dict lives in the closure, so every Arrow batch of a partition
      shares it) — word token counts are a pure function of the word,
      so each distinct word is encoded once per task and every repeat
      is a dict hit (Zipf does the rest: measured 23.9 s -> ~1 s at
      sf0.1).
      Same zero-shuffle shape; ArrowEvalPython instead of codegen.

    Both paths implement byte-identical semantics (greedy
    non-overlapping merge application in training order — the
    :func:`_bpe_apply_merge` contract), pinned against each other and
    a pure-Python Sennrich reference in tests/test_stats_graph.py.

    Output per doc: (id, n_chars_tok, n_bpe_tok) — character-level vs
    encoded token counts, the compression the tokenizer buys.
    """
    if len(merges) <= max_jvm_merges:
        words = F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda w: w != "",
        )
        sym = F.transform(
            words,
            lambda w: F.concat(F.split(w, ""), F.array(F.lit("</w>"))),
        )
        n_chars = F.aggregate(
            sym, F.lit(0), lambda acc, s: acc + F.size(s)
        )

        def _apply_one(a: str, b: str):
            # closure factory, not default-arg lambdas: PySpark counts
            # the lambda's parameters to bind higher-order-function
            # variables, and default args would make this a 3-arg lambda
            return lambda s: _bpe_apply_merge(s, a, b)

        for a, b in merges:
            sym = F.transform(sym, _apply_one(a, b))
        n_bpe = F.aggregate(sym, F.lit(0), lambda acc, s: acc + F.size(s))
        return df.select(
            F.col(id_col),
            n_chars.alias("n_chars_tok"),
            n_bpe.alias("n_bpe_tok"),
        )

    mg = [(str(a), str(b)) for a, b in merges]
    # memo lives in the ENCLOSING scope so the pickled closure carries ONE
    # dict shared by every Arrow batch the deserialized UDF sees (per task,
    # all batches of a partition) — defined inside _enc it would reset
    # every ~10k-row batch and the Zipf reuse would be mostly lost.
    # CAPPED (r9): Heaps-law vocabulary growth is unbounded in task input
    # size, so an uncapped dict is a memory cliff on 100 TB-scale task
    # splits. First-seen-kept is the right eviction-free policy under
    # Zipf — the head words all appear within the first few thousand
    # rows, and the long tail each task would cache past the cap is the
    # set of words that were never going to repeat anyway. 2^20 entries
    # * ~100 B/entry ≈ 100 MB worst case per task.
    cache: dict[str, tuple[int, int]] = {}
    cache_cap = 1 << 20

    @F.pandas_udf("struct<n_chars_tok:int,n_bpe_tok:int>")
    def _enc(texts):
        import re

        import pandas as pd

        # re.ASCII pins \s to the same ASCII class Java's regex uses
        # (the JVM fold path splits with Java \s+)
        splitter = re.compile(r"\s+", re.ASCII)

        def word_counts(w: str) -> tuple[int, int]:
            hit = cache.get(w)
            if hit is not None:
                return hit
            sym: list[str] = list(w) + ["</w>"]
            nc = len(sym)
            for a, b in mg:
                ab = a + b
                out: list[str] = []
                i, ln = 0, len(sym)
                while i < ln:
                    if sym[i] == a and i + 1 < ln and sym[i + 1] == b:
                        out.append(ab)
                        i += 2
                    else:
                        out.append(sym[i])
                        i += 1
                sym = out
            res = (nc, len(sym))
            if len(cache) < cache_cap:
                cache[w] = res
            return res

        ncs: list[int | None] = []
        nbs: list[int | None] = []
        for t in texts:
            if t is None:
                # JVM path: split(NULL) propagates NULL counts
                ncs.append(None)
                nbs.append(None)
                continue
            nc = nb = 0
            for w in splitter.split(t.lower()):
                if w:
                    c, bpe = word_counts(w)
                    nc += c
                    nb += bpe
            ncs.append(nc)
            nbs.append(nb)
        return pd.DataFrame(
            {
                "n_chars_tok": pd.array(ncs, dtype="Int32"),
                "n_bpe_tok": pd.array(nbs, dtype="Int32"),
            }
        )

    return df.select(
        F.col(id_col), _enc(F.col(text_col)).alias("__e")
    ).select(id_col, "__e.n_chars_tok", "__e.n_bpe_tok")


def pmi_bigrams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 5,
) -> DataFrame:
    """Pointwise-mutual-information phrase mining: adjacent-token pairs
    that co-occur far more than their unigram frequencies predict — the
    classic collocation detector (word2vec-style phrase merging) a
    corpus pipeline runs before vocabulary decisions.

    PMI(w1,w2) = ln( (c12/N2) / ((c1/N1)·(c2/N1)) ) over corpus-total
    counts: c12 = bigram occurrences (N2 their total), c1/c2 = unigram
    occurrences (N1 their total). All five inputs are exact integers
    carried into the output, so the one ln+round is the only float step.

    Scale shape: two map-combined explode→groupBy counts (bigrams,
    unigrams) collapse the corpus to vocabulary-sized frames; unigram
    counts then attach to the bigram frame via two BROADCAST joins
    (vocabulary ≪ corpus — the standard assumption; if the vocab
    outgrows broadcast, drop the hint and the same plan shuffles on the
    word key). ``min_count`` bounds the output to stable collocations.
    """
    from ..session import fan_out

    toks_df = fan_out(df).select(tokens_expr(text_col).alias("__toks"))
    toks_df = toks_df.withColumn(
        "__toks", F.filter("__toks", lambda t: t != F.lit(""))
    )
    uni = (
        toks_df.select(F.explode("__toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_w"))
    )
    m = F.size("__toks") - 1
    pairs = toks_df.select(
        F.explode(
            F.when(
                F.size("__toks") >= 2,
                F.zip_with(
                    F.slice("__toks", 1, m),
                    F.slice("__toks", 2, m),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_12"))
    w_all = Window.partitionBy()
    big = big.withColumn("n_bigrams", F.sum("c_12").over(w_all))
    uni = uni.withColumn("n_unigrams", F.sum("c_w").over(w_all))
    u1 = F.broadcast(uni.select(F.col("w").alias("w1"), F.col("c_w").alias("c_1"),
                                "n_unigrams"))
    u2 = F.broadcast(uni.select(F.col("w").alias("w2"), F.col("c_w").alias("c_2")))
    out = (
        big.filter(F.col("c_12") >= min_count)
        .join(u1, "w1")
        .join(u2, "w2")
    )
    pmi = F.log(
        (F.col("c_12") / F.col("n_bigrams"))
        / (
            (F.col("c_1") / F.col("n_unigrams"))
            * (F.col("c_2") / F.col("n_unigrams"))
        )
    )
    return out.select(
        "w1",
        "w2",
        F.col("c_12").cast("long").alias("c_12"),
        F.col("c_1").cast("long").alias("c_1"),
        F.col("c_2").cast("long").alias("c_2"),
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.col("n_unigrams").cast("long").alias("n_unigrams"),
        # +0.0 canonicalizes IEEE negative zero (round(ln(1-ε),4) → -0.0)
        (F.round(pmi, 4) + F.lit(0.0)).alias("pmi"),
    )
