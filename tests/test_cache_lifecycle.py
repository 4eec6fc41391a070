"""Cache-lifecycle budget (VERDICT r6 ask #4): after a query runs to
completion, at most 2 persisted relations may remain live.

Motivation: the bench/driver/oracle harnesses run many queries in ONE
JVM. A query that persists per-iteration state (HITS before the r7
rotation: 2 node-sized relations per iteration, never released) leaks
cache across the whole session; local LRU eviction hides it at sf0.1,
but on a memory-tight 100 TB cluster it becomes eviction churn and
recompute. The budget of 2 matches the legitimate steady state: a
query may keep a multi-branch intermediate (and its survivor join)
cached for the consumer's action, nothing more. Streaming queries are
excluded (their state lives in the state store, audited by
tests/test_streaming_plans.py); sssp's localCheckpoint rounds register
persistent RDDs by design and are bounded by hop count, so it is
checked with its own bound.
"""

from __future__ import annotations

import pytest

from big_datatrader_spark.queries import load_registry

REG = load_registry()

# every batch query that calls .persist() anywhere in its chain, plus
# the full bench suite (the session the leak complaint was filed on)
_PERSISTING = [
    "corpus_dedup_pipeline",          # qual + surv funnel stages
    "corpus_quality_filter",
    "triangle_count_copurchase",      # oriented edge list
    "local_clustering_coefficient",   # degree + oriented edge list
    "pagerank_copurchase",            # edge+deg list, node list
    "mad_robust_outliers",            # value-domain count, 5 branches
    "quantile_normalization",         # value-domain count, 3 branches
    "bpe_learn_merges",               # initial vocabulary (released)
    "hits_hub_authority",             # rotated half-steps (released)
    "join_cardinality_profile",       # key-grain stats (released r9)
    "max_concurrent_sessions",        # iv + run (released r9)
    "link_prediction_common_neighbors",  # edge list
    "link_prediction_holdout_eval",   # dated edges + train split
    "personalized_pagerank",          # edge+deg list, seed set
]
_BENCH = sorted(n for n, q in REG.items() if q.bench
                and not n.startswith("streaming_"))


def _live_cached_rdds(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


@pytest.mark.parametrize("name", sorted(set(_PERSISTING) | set(_BENCH)))
def test_query_exits_with_bounded_caches(spark, sf0001, name):
    spark.catalog.clearCache()
    # Delta, not absolute: clearCache does NOT drop localCheckpoint
    # RDDs (sssp's rounds, run by other tests in this session), and
    # the ContextCleaner GCs them nondeterministically — an absolute
    # count is order-dependent across the suite.
    base = _live_cached_rdds(spark)
    df = REG[name].spark_fn(spark, sf0001)
    df.write.format("noop").mode("overwrite").save()  # consumer action
    live = _live_cached_rdds(spark) - base
    assert live <= 2, (
        f"{name} left {live} persisted relations live after its "
        "action — iteration caches must rotate (release the previous "
        "half-step when the next materializes) and driver-collected "
        "results must release everything")
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


def test_hits_releases_iteration_caches(spark, sf0001):
    """The named r5/r6 offender: HITS may keep ONLY its reusable edge
    list cached (the pagerank precedent — it makes repeat runs skip
    the self-join build); every per-half-step score relation must be
    released before the function returns, and running it TWICE must
    not grow the cache set (the accumulation the verdict flagged)."""
    spark.catalog.clearCache()
    base = _live_cached_rdds(spark)  # localCheckpoint leftovers, GC'd
    REG["hits_hub_authority"].spark_fn(spark, sf0001)
    first = _live_cached_rdds(spark) - base
    assert first <= 2  # edge list (+ an in-flight async unpersist)
    REG["hits_hub_authority"].spark_fn(spark, sf0001)
    assert _live_cached_rdds(spark) - base <= first
    spark.catalog.clearCache()


def test_hits_stage_budget(spark, sf0001):
    """Regression pin for the iteration-cache rotation: if a half-step
    persist is dropped, every max-collect job re-runs the whole
    upstream chain (edge join + all earlier half-steps) and the stage
    count blows up (the 2^iters recompute the persist exists to
    prevent). Measured healthy baseline: 16 jobs / 44 stages cold at
    sf0.001 (AQE splits the edge build into several jobs); the bound
    leaves ~35% headroom while sitting far under the recompute
    explosion."""
    sc = spark.sparkContext
    spark.catalog.clearCache()
    sc.setJobGroup("hits-stage-audit", "cache-rotation regression pin")
    try:
        REG["hits_hub_authority"].spark_fn(spark, sf0001)
    finally:
        sc.setJobGroup(None, None)
    tracker = sc.statusTracker()
    ids = tracker.getJobIdsForGroup("hits-stage-audit")
    stages = [s for j in ids for s in tracker.getJobInfo(j).stageIds]
    assert ids, "no jobs captured — job-group plumbing broke"
    assert len(stages) <= 60, (
        f"hits ran {len(stages)} stages (baseline 44): an iteration "
        "persist was probably dropped and half-steps are recomputing "
        "their upstream chains")
    spark.catalog.clearCache()
