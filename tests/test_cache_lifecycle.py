"""Cache-lifecycle gate (VERDICT r6 ask #4, tightened by r9 ask #3):
no registered query may leave cached relations behind.

Motivation: the bench/driver/oracle harnesses run many queries in ONE
JVM. A query that persists per-iteration state (HITS before the r7
rotation) or its edge/stat relations (the r9 findings:
personalized_pagerank, label_propagation_communities, the graph
family) leaks cache across the whole session; local LRU eviction hides
it at sf0.1, but on a memory-tight 100 TB cluster it becomes eviction
churn and recompute.

Two assertions per query, after its consumer action completes:

1. **CacheManager is empty** — every ``df.persist()`` was released.
   This is the precise persist-without-release detector: DataFrame
   persists register in the session's CacheManager and stay there
   until ``unpersist()``; localCheckpoint RDDs do NOT register, so
   the check cannot be satisfied by accident.
2. **Live cached-RDD delta is bounded** — the only RDD a query may
   leave live is its own eagerly-materialized result checkpoint
   (bounded rows by query design; released by the ContextCleaner once
   the consumer drops the frame — verified empirically: 15 back-to-
   back runs of a scoped query hold live checkpoint RDDs at 4-6, not
   15, so a long-lived driver session reaches a small steady state
   rather than accumulating one per query). Iterative checkpoint-CHAIN queries
   (sssp/k-core/CC/temporal-reachability) keep per-round lineage
   truncations live, bounded by their hop/round constants — each gets
   an explicit bound instead of the default.

Streaming queries are excluded (their state lives in the state store,
audited by tests/test_streaming_plans.py).
"""

from __future__ import annotations

import pytest

from big_datatrader_spark.queries import load_registry

REG = load_registry()

# every batch query that calls .persist()/localCheckpoint anywhere in
# its chain (the r10 scoped-cache sweep), plus the full bench suite
# (the session the original leak complaint was filed on)
_PERSISTING = [
    "corpus_dedup_pipeline",          # qual + surv funnel stages
    "corpus_quality_filter",
    "triangle_count_copurchase",      # oriented edge list
    "local_clustering_coefficient",   # degree + oriented edge list
    "pagerank_copurchase",            # edge+deg list, node list
    "personalized_pagerank",          # edge+deg list, seed set
    "label_propagation_communities",  # edge list
    "gnn_feature_propagation",        # edge list + round features
    "mad_robust_outliers",            # value-domain count, 5 branches
    "quantile_normalization",         # value-domain count, 3 branches
    "bpe_learn_merges",               # initial vocabulary (released)
    "hits_hub_authority",             # rotated half-steps (released)
    "join_cardinality_profile",       # key-grain stats (released r9)
    "max_concurrent_sessions",        # iv + run (released r9)
    "link_prediction_common_neighbors",  # edge list
    "link_prediction_holdout_eval",   # dated edges + train split
    "kmeans_lloyd_refinement",        # exploded (row, dim) relation
    "golden_record_survivorship",     # fingerprinted attr relation
    "edit1_pair_blowup_audit",        # name-multiplicity relation
    "temporal_reachability_copurchase",  # dated edges + hop chain
    "sssp_copurchase",                # frontier checkpoint chain
    "k_core_membership",              # peel checkpoint chain
    "dedup_clusters",                 # CC label checkpoint chain
]
_BENCH = sorted(n for n, q in REG.items() if q.bench
                and not n.startswith("streaming_"))

# allowed live-RDD delta: default 2 (result checkpoint + one batch
# artifact); checkpoint-chain queries keep per-round truncations live,
# bounded by their hop/round constants (edges + nxt/dist per hop for
# sssp; edges + rounds for k-core; edges + converged label rounds for
# CC at this sf; hops + result for temporal reachability)
_ALLOWED = {
    "sssp_copurchase": 12,
    "k_core_membership": 14,
    "dedup_clusters": 30,
    "temporal_reachability_copurchase": 5,
}
# the r10 scoped-cache queries release EVERYTHING except their own
# eager result checkpoint — exactly one live RDD
_SCOPED = {
    "corpus_dedup_pipeline", "triangle_count_copurchase",
    "local_clustering_coefficient", "pagerank_copurchase",
    "personalized_pagerank", "label_propagation_communities",
    "gnn_feature_propagation", "mad_robust_outliers",
    "quantile_normalization", "link_prediction_common_neighbors",
    "link_prediction_holdout_eval", "kmeans_lloyd_refinement",
    "golden_record_survivorship", "edit1_pair_blowup_audit",
}


def _live_cached_rdds(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _cache_manager_empty(spark) -> bool:
    return bool(
        spark._jsparkSession.sharedState().cacheManager().isEmpty())


@pytest.mark.parametrize("name", sorted(set(_PERSISTING) | set(_BENCH)))
def test_query_exits_with_bounded_caches(spark, sf0001, name):
    spark.catalog.clearCache()
    # Delta, not absolute: clearCache does NOT drop localCheckpoint
    # RDDs (chain rounds run by other tests in this session), and the
    # ContextCleaner GCs them nondeterministically — an absolute
    # count is order-dependent across the suite.
    base = _live_cached_rdds(spark)
    df = REG[name].spark_fn(spark, sf0001)
    df.write.format("noop").mode("overwrite").save()  # consumer action
    assert _cache_manager_empty(spark), (
        f"{name} left df.persist() relations registered in the "
        "CacheManager after its action — every persist needs a "
        "release on the materialized-result path (run_scoped or "
        "try/finally; VERDICT r9 ask #3)")
    live = _live_cached_rdds(spark) - base
    budget = _ALLOWED.get(name, 1 if name in _SCOPED else 2)
    assert live <= budget, (
        f"{name} left {live} cached RDDs live after its action "
        f"(allowed {budget}) — only the query's own bounded result "
        "checkpoint (and declared chain rounds) may remain")
    spark.catalog.clearCache()


def test_hits_restores_session_confs(spark, sf0001):
    """hits scopes AQE-off + narrow shuffle width to its iteration
    jobs via try/finally; the session the caller handed in must come
    back untouched (the driver runs 49 more queries on it)."""
    keys = ["spark.sql.shuffle.partitions", "spark.sql.adaptive.enabled"]
    before = {k: spark.conf.get(k) for k in keys}
    REG["hits_hub_authority"].spark_fn(spark, sf0001)
    assert {k: spark.conf.get(k) for k in keys} == before
    spark.catalog.clearCache()
