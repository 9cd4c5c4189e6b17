"""Registry-wide session-hygiene sweep (r10): every registered query must
leave the shared SparkSession the way it found it.

Production engines serve queries from LONG-LIVED sessions (a query
service, a notebook kernel, a scheduled-pipeline driver that runs for
days). A query that leaks session-global state — a temp view shadowing a
lake-table name, a runtime conf it set and never restored, a streaming
query left running, an unannounced CacheManager entry — corrupts every
LATER query in ways no single-query oracle gate can see. This round's
in-suite flake (31292fc: op-lm-score's self-persist swapped an
InMemoryRelation into a plan another test audited) is exactly this class
escaping containment.

Swept invariants, per query, at sf0.001:

1. **catalog**: the temp-view/table set after the query equals the set
   before it (the memory-sink drain and all six fixed-name
   ``createOrReplaceTempView`` sites were fixed in r10 to drop their
   views post-analysis — spark.sql resolves eagerly, so the returned
   frame survives the drop).
2. **streams**: ``spark.streams.active`` is empty (every drain helper
   awaits termination).
3. **conf**: a pinned set of behavior-bearing SQL confs is unchanged
   (shuffle partitions, AQE, ANSI, timezone, broadcast threshold,
   state-store provider — the ones whose drift silently re-plans or
   re-types every later query).
4. **cache**: the CacheManager is as empty after as before, unless the
   query is in PERSIST_OK with a written rationale (self-persisting
   queries are legitimate — iterative refs inside one plan — but must be
   DECLARED, because a cache entry substitutes InMemoryRelations into
   later, unrelated plans that happen to match).

localCheckpoint blocks are deliberately out of scope: they are RDD-level
(no plan substitution), bounded by the curate-prefix FIFO, and reclaimed
by GC + ContextCleaner — asserting on their async lifecycle would be a
flake generator, not an invariant.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

from conftest import sweep_params

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF = "/root/testdata/sf0.001"

# Behavior-bearing runtime confs: drift in any of these re-plans or
# re-types every later query in the session.
PINNED_CONFS = [
    "spark.sql.shuffle.partitions",
    "spark.sql.adaptive.enabled",
    "spark.sql.ansi.enabled",
    "spark.sql.session.timeZone",
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.streaming.stateStore.providerClass",
    "spark.sql.files.maxPartitionBytes",
    "spark.sql.execution.arrow.pyspark.enabled",
]

# query -> why it may leave CacheManager entries behind. Every entry needs
# the rationale to say what is persisted and why the persist is load-
# bearing for the query's own evaluation (multiple references inside one
# plan). The module-exit fixture clears the cache so the rest of the
# suite still audits pristine plans.
PERSIST_OK: dict[str, str] = {
    # Probed r10: of every .persist() site in the engine, op-lm-score is
    # the ONLY registered query that leaves a CacheManager entry after
    # its action completes — the other sites (LSH candidate pairs,
    # versioned-table knn, curate token counts) either unpersist before
    # returning or belong to unregistered path-* scale harnesses.
    "op-lm-score": (
        "persists the vocab unigram counts: the add-k scorer references "
        "the counts frame twice in one plan (numerator and vocab-size "
        "denominator); without the persist the counts agg runs twice"
    ),
}


# query -> (allowed catalog names, rationale). Unlike temp views, these
# are DECLARED bounded catalog residue: bucket metadata can only live in
# the catalog (a bucketed table IS a catalog object — there is no
# anonymous bucketed DataFrame), and the op drops + recreates the fixed
# names idempotently, so a session that runs it N times holds exactly
# these two entries, not N.
TABLE_OK: dict[str, tuple[set[str], str]] = {
    "op-bucketed-join": (
        {"li_bucketed", "ord_bucketed"},
        "bucketed+sorted join sides: bucket metadata is catalog-resident "
        "by design; fixed names, DROP TABLE IF EXISTS + location cleanup "
        "on re-run keeps the residue at exactly two entries",
    ),
}


def _names():
    import __spark_entry__ as m

    return sorted(m.queries())


def _catalog_names(spark) -> set[str]:
    return {t.name for t in spark.catalog.listTables()}


def _pinned_conf(spark) -> dict[str, str | None]:
    return {k: spark.conf.get(k, None) for k in PINNED_CONFS}


def _cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


@pytest.mark.parametrize("name", sweep_params(_names()))
def test_query_leaves_session_clean(spark, name):
    import __spark_entry__ as m

    tables_before = _catalog_names(spark)
    conf_before = _pinned_conf(spark)
    cache_empty_before = _cache_empty(spark)

    df = m.queries()[name](spark, SF)
    # force end-to-end on executors; no driver materialization needed
    df.write.format("noop").mode("overwrite").save()
    del df

    leaked = _catalog_names(spark) - tables_before
    allowed, _why = TABLE_OK.get(name, (set(), ""))
    assert leaked <= allowed, (
        f"{name}: leaked temp views/tables {sorted(leaked - allowed)}"
    )

    active = [q.name for q in spark.streams.active]
    assert not active, f"{name}: left streaming queries running {active}"

    conf_after = _pinned_conf(spark)
    assert conf_after == conf_before, (
        f"{name}: mutated session conf "
        f"{ {k: (conf_before[k], conf_after[k]) for k in conf_before if conf_before[k] != conf_after[k]} }"
    )

    if cache_empty_before and not _cache_empty(spark):
        # restore the baseline FIRST: if the assertion below fails, a
        # dirty cache would make cache_empty_before False for every later
        # case and silently mask further leaks behind this one failure
        spark.catalog.clearCache()
        assert name in PERSIST_OK, (
            f"{name}: left CacheManager entries behind without a "
            "PERSIST_OK rationale — cached plans substitute into later "
            "queries' plans (the 31292fc flake class)"
        )


def test_hygiene_inventory_pinned():
    """Auto-enrollment: every registered query is swept; PERSIST_OK names
    real queries and carries real rationales."""
    import __spark_entry__ as m

    names = _names()
    assert len(names) >= 228, f"hygiene sweep shrank to {len(names)}"
    registered = set(m.queries())
    for k, why in PERSIST_OK.items():
        assert k in registered, f"PERSIST_OK names unknown query {k}"
        assert len(why) > 60, f"PERSIST_OK[{k}] lacks a real rationale"
    for k, (names_ok, why) in TABLE_OK.items():
        assert k in registered, f"TABLE_OK names unknown query {k}"
        assert names_ok and len(why) > 60, f"TABLE_OK[{k}] lacks substance"


@pytest.fixture(scope="module", autouse=True)
def _cache_hygiene(spark):
    """Registry-wide module: clear cache on exit so later plan-shape
    tests audit pristine plans (same pattern as the other sweeps)."""
    yield
    spark.catalog.clearCache()
