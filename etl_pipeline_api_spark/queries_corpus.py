"""Training-corpus curation queries, batch 2 (SURVEY.md §2.9): PII
redaction, boilerplate line-dedup, benchmark decontamination, stratified
sampling, shard assignment.

The synthetic documents carry no PII/newlines, so op-pii-redact constructs
deterministic PII inline (same expression in the Spark query and the DuckDB
oracle — the redaction mechanics are what's under test), and line-dedup
chunks tokens into position-aligned 10-token "lines" (the corpus-frequency
machinery is identical to newline-split web text).

All five are oracle-checked: the sampling/sharding ops use the Knuth
multiplicative hash ((id * 2654435761) mod 2^32) precisely because any
int64 engine computes it identically (operators/sampling.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import dedup, sampling, text
from .queries import _t, query

# ---------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------

_PII_SYNTH_SQL = (
    "text || ' reach user' || doc_id || '@mail.example.com or +1-555-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' from 10.' || "
    "CAST(doc_id % 200 AS VARCHAR) || '.0.' || CAST(doc_id % 250 AS VARCHAR)"
)


@query(
    "op-pii-redact",
    oracle=f"""
    WITH synth AS (
      SELECT doc_id, {_PII_SYNTH_SQL} AS t FROM documents)
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(t,
             '{text.PII_EMAIL}', '[EMAIL]', 'g'),
             '{text.PII_PHONE}', '[PHONE]', 'g'),
             '{text.PII_IPV4}', '[IP]', 'g') AS clean_text,
           CAST(len(regexp_extract_all(t, '{text.PII_EMAIL}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{text.PII_PHONE}')) AS INT) AS n_phones,
           CAST(len(regexp_extract_all(t, '{text.PII_IPV4}')) AS INT)  AS n_ips
    FROM synth
    """,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-pii-redact: email/phone/IPv4 scrubbing + removal counts, one
    row-local projection (operators/text.py pii_redact). The synthetic PII
    suffix is built with the same expression on both sides; patterns are
    the RE2-and-Java-compatible subset so the oracle is exact."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" reach user"), F.col("doc_id"),
            F.lit("@mail.example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" from 10."), (F.col("doc_id") % 200).cast("string"),
            F.lit(".0."), (F.col("doc_id") % 250).cast("string"),
        ).alias("t"),
    )
    return text.pii_redact(docs, "doc_id", "t")


# ---------------------------------------------------------------------
# Boilerplate line-level dedup (CCNet/RefinedWeb shape)
# ---------------------------------------------------------------------

@query(
    "op-line-dedup",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents),
    ls AS (
      SELECT doc_id, list_transform(
               generate_series(0, CAST(ceil(len(toks)/10.0) AS INT) - 1),
               i -> array_to_string(toks[i*10+1:i*10+10], ' ')) AS arr
      FROM tok),
    lines AS (
      SELECT doc_id, unnest(arr) AS line,
             unnest(generate_series(0, len(arr)-1)) AS pos
      FROM ls),
    ldf AS (SELECT line, count(DISTINCT doc_id) AS line_docs FROM lines GROUP BY 1),
    kept AS (
      SELECT l.* FROM lines l JOIN ldf USING (line) WHERE line_docs <= 1),
    totals AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY 1)
    SELECT d.doc_id,
           coalesce(string_agg(k.line, ' ' ORDER BY k.pos), '') AS clean_text,
           CAST(count(k.line) AS BIGINT) AS n_kept,
           CAST(coalesce(min(tt.n_lines), 0) AS BIGINT) AS n_lines
    FROM documents d
    LEFT JOIN kept k USING (doc_id)
    LEFT JOIN totals tt USING (doc_id)
    GROUP BY d.doc_id
    """,
)
def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-line-dedup: drop 10-token chunks that occur in more than one
    document (boilerplate removal), preserving order — three linear
    shuffles, 8-byte join keys (operators/dedup.py dedup_lines)."""
    out = dedup.dedup_lines(
        _t(spark, sf_dir, "documents"), "doc_id", "text", chunk=10, max_df=1
    )
    return out.select(
        "doc_id", "clean_text",
        F.col("n_kept").cast("long").alias("n_kept"),
        F.col("n_lines").cast("long").alias("n_lines"),
    )


# ---------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------

@query(
    "op-decontaminate",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(toks)-3, 0)),
               i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3])) AS shingle
      FROM tok),
    ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
    hits AS (
      SELECT DISTINCT sh.doc_id FROM sh JOIN ev USING (shingle)
      WHERE sh.doc_id % 50 != 0)
    SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
    FROM documents d LEFT JOIN hits h USING (doc_id)
    WHERE d.doc_id % 50 != 0
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-decontaminate: flag training docs sharing any word 4-gram with the
    held-out eval slice (doc_id % 50 == 0 stands in for the benchmark
    suite). Eval shingles broadcast; train side is one semi-join probe
    (operators/dedup.py decontaminate)."""
    docs = _t(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    return dedup.decontaminate(train, ev, "doc_id", "text", n=4)


# ---------------------------------------------------------------------
# Deterministic stratified sampling + shard assignment
# ---------------------------------------------------------------------

@query(
    "op-sample-stratified",
    oracle="""
    SELECT doc_id, lang, source FROM documents
    QUALIFY row_number() OVER (
      PARTITION BY lang, source
      ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) <= 5
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-sample-stratified: exactly 5 docs per (lang, source) stratum in
    deterministic Knuth-hash order — one window shuffle, rerun-stable,
    engine-independent (operators/sampling.py stratified_sample)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return sampling.stratified_sample(docs, ["lang", "source"], "doc_id", 5)


@query(
    "op-shard-assign",
    oracle="""
    SELECT CAST((doc_id * 2654435761) % 4294967296 % 16 AS INT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           min(doc_id) AS min_id, max(doc_id) AS max_id
    FROM documents GROUP BY 1
    """,
)
def q_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-shard-assign: hash-scrambled training-shard ids + per-shard
    balance stats (row counts, payload bytes) — the pre-write check before
    write_shards materializes one ordered file per shard."""
    docs = _t(spark, sf_dir, "documents")
    stats = sampling.shard_stats(docs, "n_chars", 16, "doc_id")
    return stats.select(
        "shard",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("total_chars").cast("long").alias("total_chars"),
        "min_id", "max_id",
    )


# The full composition, ORACLE-GATED on the exact-Jaccard path: every
# curation stage re-derived in one DuckDB query — PII scrub, langid,
# quality, line-dedup over the filtered set, fingerprint dedup, exact
# near-dup components (recursive CTE), decontamination against the raw
# eval slice. op-corpus-curate-composed outputs that doc list and
# hash-pins it; op-corpus-curate-full (below) runs the MinHash scale
# path AND this exact path over one shared prefix and gates their
# RELATIONSHIP (subset + extras-bounded-by-missed-pairs), because
# pinning the LSH survivor set equal to the exact set would be the same
# corpus-luck trap as the old simhash 4x-docs bound (LSH recall here
# happens to be 2650/2651 survivors at sf0.1).
# The shared CTE chain (everything up to the final projection) — reused by
# BOTH the composed twin (doc-list output) and the curate-full gate (count
# output). The gate's count must live in the SAME flat CTE chain: wrapping
# the whole recursive query in `SELECT count(*) FROM (...)` defeats
# DuckDB's plan at sf1 (bare chain ~25 s, wrapped >400 s — measured r8).
#
# `_curate_ctes(nd_pred)` injects a predicate at the NEAR-DUP INPUT (after
# the corpus-level prefix stages — line-dedup's line_docs and the
# fingerprint min-survivor are corpus-dependent, so the sample must be
# taken AFTER them, exactly where the Spark side samples). The composed
# twin passes None → the emitted SQL is the r8 chain; the curate-full
# gate passes the md5 sample predicate, which lands in a dedicated
# `gate_docs` filter CTE so the nd_survivors NOT-IN stays a BARE
# single-conjunct predicate. Both constraints are measured, not
# stylistic: an r9 draft that spliced `WHERE TRUE` / `(pred) AND
# doc_id NOT IN` into the chain broke DuckDB's NOT-IN anti-join
# rewrite and the sf1 oracle went ~25 s → >600 s (killed) — the same
# plan-shape cliff as the documented agg-wrapping regression.
#
# AS MATERIALIZED (r9) on every multiply-referenced dataflow CTE:
# DuckDB inlines un-hinted CTEs per reference, so `sh` (3 refs) ran
# the whole tokenize chain three times, and `edges` re-evaluated the
# ENTIRE pair pipeline on EVERY `reach` recursion round — on the
# r8-regenerated sf1 replica (36k near-dup pairs, components up to 20
# → ~19 closure rounds) the composed oracle went from r7's 27 s to
# >600 s. Materialization hints restore one-evaluation semantics:
# 59 s composed / 37 s sampled gate at sf1, identical results (6,470
# survivor rows, r7's committed count). The recursion-adjacent CTEs
# (losers, nd_survivors, contaminated) stay un-hinted — their shape
# is what keeps the NOT-IN anti-join rewrites intact.
def _curate_ctes(nd_pred: str | None = None) -> str:
    nd_src = "gate_docs" if nd_pred else "exact_survivors"
    gate_cte = (
        f"""gate_docs AS (
  SELECT doc_id, text FROM exact_survivors WHERE {nd_pred}),
"""
        if nd_pred
        else ""
    )
    return rf"""train0 AS (
  SELECT doc_id, source, lang,
         regexp_replace(regexp_replace(regexp_replace(text,
           '{text.PII_EMAIL}', '[EMAIL]', 'g'),
           '{text.PII_PHONE}', '[PHONE]', 'g'),
           '{text.PII_IPV4}', '[IP]', 'g') AS text
  FROM documents WHERE doc_id % 50 != 0),
tok0 AS MATERIALIZED (
  SELECT doc_id, text,
         string_split_regex(lower(trim(text)), '\s+') AS tokens
  FROM train0),
rates AS (
  SELECT doc_id,
    len(list_filter(tokens, t -> list_contains(['the','and','of'], t))) * 1.0
      / greatest(len(tokens), 1) AS r_en,
    len(list_filter(tokens, t -> list_contains(['el','la','los','de'], t))) * 1.0
      / greatest(len(tokens), 1) AS r_es,
    len(list_filter(tokens, t -> list_contains(['le','les','des','une'], t))) * 1.0
      / greatest(len(tokens), 1) AS r_fr,
    len(list_filter(tokens, t -> list_contains(['der','die','und','das'], t))) * 1.0
      / greatest(len(tokens), 1) AS r_de,
    len(list_filter(tokens, t -> list_contains(['的','是','了'], t))) * 1.0
      / greatest(len(tokens), 1) AS r_zh
  FROM tok0),
lang_keep AS (
  SELECT doc_id FROM rates
  WHERE greatest(r_en, r_es, r_fr, r_de, r_zh) > 0
    AND r_en = greatest(r_en, r_es, r_fr, r_de, r_zh)),
quality_keep AS (
  SELECT doc_id FROM tok0
  WHERE round(
      0.4 * least(length(text) / 200.0, 1.0)
    + 0.3 * least((len(list_filter(tokens, t -> list_contains(
          ['the','a','of','to','and','in','is','for','on','with'], t)))
          * 1.0 / greatest(len(tokens), 1)) / 0.08, 1.0)
    + 0.3 * (1.0 - length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
          * 1.0 / greatest(length(text), 1)), 4) >= 0.5),
filtered AS MATERIALIZED (
  SELECT t.doc_id, t.tokens FROM tok0 t
  JOIN lang_keep USING (doc_id) JOIN quality_keep USING (doc_id)),
ls AS (
  SELECT doc_id, list_transform(
           generate_series(0, CAST(ceil(len(tokens)/10.0) AS INT) - 1),
           i -> array_to_string(tokens[i*10+1:i*10+10], ' ')) AS arr
  FROM filtered),
lines AS MATERIALIZED (
  SELECT doc_id, unnest(arr) AS line,
         unnest(generate_series(0, len(arr)-1)) AS pos
  FROM ls),
ldf AS MATERIALIZED (SELECT line, count(DISTINCT doc_id) AS line_docs FROM lines GROUP BY 1),
kept AS MATERIALIZED (
  SELECT l.* FROM lines l JOIN ldf USING (line) WHERE line_docs <= 1),
clean AS MATERIALIZED (
  SELECT f.doc_id,
         coalesce(string_agg(k.line, ' ' ORDER BY k.pos), '') AS text
  FROM filtered f LEFT JOIN kept k USING (doc_id)
  GROUP BY f.doc_id),
fp AS MATERIALIZED (
  SELECT doc_id,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(generate_series(1, length(t)),
                            i -> CAST(ascii(substring(t, i, 1)) AS BIGINT))),
           (acc, x) -> (acc * 131 + x) % 1000000007) AS fingerprint
  FROM (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
        FROM clean)),
exact_survivors AS MATERIALIZED (
  SELECT c.doc_id, c.text FROM clean c
  WHERE c.doc_id IN (SELECT min(doc_id) FROM fp GROUP BY fingerprint)),
{gate_cte}tok AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tokens
  FROM {nd_src}),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(tokens)-2, 0)),
                i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])) AS shingle
  FROM tok),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS MATERIALIZED (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS MATERIALIZED (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5),
edges AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs),
reach(node, comp) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.node),
losers AS (
  SELECT node FROM reach GROUP BY node HAVING min(comp) < node),
nd_survivors AS (
  SELECT doc_id, text FROM {nd_src}
  WHERE doc_id NOT IN (SELECT node FROM losers)),
surv4 AS (
  SELECT DISTINCT s.doc_id,
         unnest(list_transform(generate_series(1, greatest(len(toks)-3, 0)),
           i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3])) AS shingle
  FROM (SELECT doc_id,
               string_split_regex(lower(trim(text)), '\s+') AS toks
        FROM nd_survivors) s),
ev4 AS (
  SELECT DISTINCT
         unnest(list_transform(generate_series(1, greatest(len(toks)-3, 0)),
           i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3])) AS shingle
  FROM (SELECT string_split_regex(lower(trim(text)), '\s+') AS toks
        FROM documents WHERE doc_id % 50 = 0)),
contaminated AS (
  SELECT DISTINCT s.doc_id FROM surv4 s JOIN ev4 USING (shingle))
"""

# NB: both oracles keep the survivor projection + NOT-IN decontamination in
# the TOP-LEVEL select. Hoisting it into a `final AS (...)` CTE (or wrapping
# the whole statement in `SELECT count(*) FROM (...)`) flips DuckDB's NOT-IN
# anti-join into a plan that grinds >400 s at sf1 vs ~25 s in this shape
# (measured r8).
_CURATE_COMPOSED_ORACLE = f"""
WITH RECURSIVE {_curate_ctes()}
SELECT d.doc_id, d.source, d.lang
FROM nd_survivors n JOIN documents d USING (doc_id)
WHERE n.doc_id NOT IN (SELECT doc_id FROM contaminated)
"""

# ~31% deterministic doc sample for the curate-full gate (the 7f3cdda
# embedding-LSH pattern): first md5 hex digit of the DECIMAL id string
# <= '4' — 5/16 of ids, identical arithmetic in Spark and DuckDB.
# Hash-keyed, NOT id-modulo: doc_id % k correlates with the synthetic
# corpus's dup/lang strata, md5 does not.
_GATE_SAMPLE_SQL = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '4'"


@query(
    "op-corpus-curate-full",
    oracle=f"""
    WITH RECURSIVE {_curate_ctes(_GATE_SAMPLE_SQL)}
    SELECT d.doc_id,
           TRUE AS composed_subset_ok,
           TRUE AS extras_le_missed
    FROM nd_survivors n JOIN documents d USING (doc_id)
    WHERE n.doc_id NOT IN (SELECT doc_id FROM contaminated)
    """,
)
def q_corpus_curate_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete curation flow a pretraining corpus runs — PII scrub
    (folded into the filter projection, free) → lang/quality filter →
    boilerplate line-dedup → exact dedup → near-dup components →
    benchmark decontamination — run BOTH ways over one shared prefix
    (plans/corpus.py curate_prefix): the MinHash-LSH scale path (the
    100 TB plan) and the exact-Jaccard path, gated on their
    RELATIONSHIP. The production PREFIX (PII → lang/quality →
    line-dedup → exact dedup) runs on the FULL corpus; the gate
    MEASUREMENT — both near-dup pair stages, both tails, the
    subset/extras arithmetic — runs on a ~31% deterministic md5-keyed
    doc sample (r9, the 7f3cdda embedding-LSH-gate treatment: the
    exact-Jaccard tail existed only to pin the LSH path and was most
    of the query's cost; its Θ(Σdf²) pair mass shrinks ~10x under a
    31% doc sample). The oracle samples at the IDENTICAL point: after
    the corpus-level prefix stages (line_docs counts and fingerprint
    min-survivors depend on the whole corpus, so sampling must follow
    them), before the near-dup input.

    - one row per sampled EXACT-PATH survivor doc_id, value-pinned
      against the oracle's full 7-stage CTE re-derivation (the complete
      survivor id set, not just a count — and the shape DuckDB plans
      well: a top-level AGGREGATE over this recursive chain flips the
      NOT-IN anti-join into a plan that grinds >9 min at sf1, measured
      r8, while this row-returning form runs in ~25 s).
    - composed_subset_ok: exact-path survivors ⊆ LSH-path survivors on
      the sampled corpus. THEOREM, not corpus luck, and it survives the
      sampling: a MinHash band collision is PAIRWISE (no max_bucket
      here), so full-corpus LSH pairs restricted to sampled endpoints
      ARE the sampled corpus's LSH pairs; those verify exact Jaccard
      in-plan, so LSH pairs ⊆ exact pairs on the sample, LSH components
      refine exact components, and the min of an exact component is the
      min of whichever LSH sub-component contains it; decontamination
      is per-doc deterministic on identical text.
    - extras_le_missed: |LSH-only survivors| ≤ |exact pairs missed by
      LSH|, both measured on the sample — splitting a component into k
      parts requires ≥ k−1 missing spanning-tree edges, so each extra
      survivor charges at least one missed pair. A broken LSH tail
      (empty pairs, wrong banding) blows extras past the measured
      misses and fails the gate at any SF.

    Full-corpus coverage is not lost: op-corpus-curate-composed pins
    the entire exact path end-to-end on the full corpus, and
    op-dedup-minhash recall-gates the LSH pair stage on the full
    corpus; this query owns the dual-path composition gate."""
    from .operators import dedup
    from .plans import corpus

    docs = _t(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 50 == 0)
    in_sample = (
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) <= "4"
    )
    prefix = corpus.curate_prefix(
        docs.filter(F.col("doc_id") % 50 != 0),
        quality_min=0.5,
        redact_pii=True,
        line_max_df=1,
    )
    # gate-side universe: sampled AFTER the corpus-level prefix stages,
    # EAGERLY materialized — this is the shared base both branches read,
    # and materializing it FIRST is what makes the concurrency below
    # safe (the r8 straggler lesson: shared LAZY subtrees re-execute
    # under concurrent stage materialization — >20 min at sf1; with the
    # base reduced to checkpoint blocks the branches share only
    # materialized data)
    prefix_s = prefix.filter(in_sample).localCheckpoint(eager=True)
    # The two pair stages and then the two tails are INDEPENDENT given
    # prefix_s — each is a chain of small stages whose sf0.1 cost is
    # scheduler latency, not data, so running the branches from two
    # driver threads (Spark schedules concurrent jobs fine) halves the
    # sequential-latency floor. Each branch still EAGERLY checkpoints
    # its result: the pair frames feed a tail AND the missed-pairs
    # gate; the tail frames feed the full_outer gate AND (comp) the
    # returned rows.
    # LSH pairs computed ON the sampled universe: identical to
    # computing them on the full corpus and restricting to sampled
    # endpoints, because a MinHash band collision is PAIRWISE
    # (signatures are per-doc, no max_bucket here) — see docstring
    # theorem. Computing on the sample just skips the 69% of signature
    # work whose pairs the gate would immediately discard.
    from concurrent.futures import ThreadPoolExecutor

    # ONE shared shingle/signature pass for both pair branches (r12
    # optimization round, guide §2.4): the exact pairs derive from the
    # sets frame's hshs arrays (dedup.jaccard_pairs_from_sets — equality
    # with the direct path unit-pinned), the LSH pipeline bands its sig
    # column; previously each branch re-tokenized and re-shingled the
    # sampled corpus inside its own thread. Materialized EAGERLY (count)
    # before the threads fork — the same r8 straggler lesson as prefix_s:
    # a shared LAZY checkpoint would race its materialization under the
    # two concurrent branch jobs and compute the shingle pass twice.
    sig_sets = dedup.minhash_signature_sets(
        prefix_s, "doc_id", "text", n=3, num_hashes=32
    )
    sig_sets.count()

    def _lsh_branch():
        return (
            dedup.minhash_lsh_pairs_from_sets(
                sig_sets, threshold=0.5, num_hashes=32
            )
            .select("id_a", "id_b")
            .localCheckpoint(eager=True)
        )

    def _ex_branch():
        return (
            dedup.jaccard_pairs_from_sets(sig_sets, threshold=0.5)
            .select("id_a", "id_b")
            .localCheckpoint(eager=True)
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_lsh, f_ex = pool.submit(_lsh_branch), pool.submit(_ex_branch)
        pairs_lsh, pairs_ex = f_lsh.result(), f_ex.result()
        f_full = pool.submit(
            lambda: corpus.curate_neardup_tail(
                prefix_s, pairs_lsh, decontam_eval=ev
            ).select("doc_id").localCheckpoint(eager=True)
        )
        f_comp = pool.submit(
            lambda: corpus.curate_neardup_tail(
                prefix_s, pairs_ex, decontam_eval=ev
            ).select("doc_id").localCheckpoint(eager=True)
        )
        full, comp = f_full.result(), f_comp.result()
    both = comp.withColumn("__c", F.lit(1)).join(
        full.withColumn("__f", F.lit(1)), "doc_id", "full_outer"
    )
    surv = both.agg(
        F.count("__c").alias("__n_composed"),
        F.count("__f").alias("__n_full"),
        F.count(
            F.when(F.col("__c").isNotNull() & F.col("__f").isNotNull(), 1)
        ).alias("__n_common"),
    )
    missed = pairs_ex.join(pairs_lsh, ["id_a", "id_b"], "left_anti").agg(
        F.count(F.lit(1)).alias("__n_missed")
    )
    gate = surv.crossJoin(F.broadcast(missed)).select(
        (F.col("__n_common") == F.col("__n_composed")).alias(
            "composed_subset_ok"
        ),
        (
            (F.col("__n_full") - F.col("__n_common")) <= F.col("__n_missed")
        ).alias("extras_le_missed"),
    )
    # one row per exact-path survivor, gate flags riding every row — the
    # oracle pins the id SET and the flags in one hash
    return comp.crossJoin(F.broadcast(gate))


@query("op-corpus-curate-composed", oracle=_CURATE_COMPOSED_ORACLE)
def q_corpus_curate_composed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME full composition as op-corpus-curate-full but on the
    exact-Jaccard near-dup path, so the whole five-stage pipeline — PII
    scrub folded into the filter projection, langid + quality filter,
    boilerplate line-dedup scoped to the filtered set, fingerprint exact
    dedup, connected-component near-dup removal, benchmark
    decontamination — is pinned by ONE DuckDB twin end to end (stage
    interactions included, e.g. line-dedup emptying a doc before
    fingerprinting, or decontamination running over line-deduped text
    against RAW eval text). op-corpus-curate-full keeps the MinHash
    scale path for the bench; its LSH-vs-exact delta is covered by
    op-dedup-minhash's recall gate."""
    from .plans.corpus import curate

    docs = _t(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 50 == 0)
    out = curate(
        docs.filter(F.col("doc_id") % 50 != 0),
        quality_min=0.5,
        scale_path=False,
        redact_pii=True,
        line_max_df=1,
        decontam_eval=ev,
    )
    return out.select("doc_id", "source", "lang")


# ---------------------------------------------------------------------
# Repetition quality signals (Gopher-style) + domain mixture
# ---------------------------------------------------------------------

@query(
    "op-text-repetition",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents),
    g AS (
      SELECT doc_id, toks,
             list_transform(generate_series(1, greatest(len(toks)-2, 0)),
               i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]) AS grams
      FROM tok)
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_tokens,
           CAST(len(grams) AS INT) AS n_grams,
           CAST(len(grams) - len(list_distinct(grams)) AS INT) AS n_dup_grams,
           CAST(coalesce(list_max(list_transform(list_distinct(toks),
             t -> len(list_filter(toks, x -> x = t)))), 0) AS INT) AS top_token_count
    FROM g
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-text-repetition: Gopher-style repetition signals — duplicate
    3-gram count and most-common-token count per doc, entirely row-local
    (operators/text.py repetition_cols). The query returns the exact
    integer counts; ratios are derived downstream (count/count divisions
    round differently across engines at half-digits)."""
    out = text.repetition_metrics(
        _t(spark, sf_dir, "documents"), "doc_id", "text", n=3
    )
    return out.select(
        "doc_id", "n_tokens", "n_grams", "n_dup_grams", "top_token_count"
    )


@query(
    "op-domain-mix",
    oracle="""
    SELECT doc_id, lang, source FROM documents
    WHERE lang IN ('en', 'es', 'fr', 'de')
    QUALIFY row_number() OVER (
      PARTITION BY lang
      ORDER BY (doc_id * 2654435761) % 4294967296, doc_id)
      <= CASE lang WHEN 'en' THEN 40 WHEN 'es' THEN 12
                   WHEN 'fr' THEN 9  WHEN 'de' THEN 7 END
    """,
)
def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op-domain-mix: compose a training mixture by per-domain quota (here
    per-language: 40 en / 12 es / 9 fr / 7 de, zh excluded) in
    deterministic hash order — rerun-stable mixture export, one window
    shuffle (operators/sampling.py weighted_mix)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return sampling.weighted_mix(
        docs, "lang", "doc_id", {"en": 40, "es": 12, "fr": 9, "de": 7}
    )
