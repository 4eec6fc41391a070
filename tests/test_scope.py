"""SharedScope (VERDICT r10 ask #7): cross-query shared relations with
the no-leftover-cache invariant moved to the scope boundary.

The contract, pinned here:
- with NO scope open, every query behaves exactly as before (its own
  cache + release — test_cache_lifecycle.py already asserts the
  empty-CacheManager part; here we pin value equality scoped vs not);
- inside a scope, the graph family's shared edge list is built ONCE
  (the scope memo holds one entry after the family runs);
- at scope exit every leased persist is released;
- scopes do not nest.
"""

from __future__ import annotations

import pytest

from big_datatrader_spark.queries import SharedScope, load_registry

REG = load_registry()

FAMILY = ["pagerank_copurchase", "personalized_pagerank",
          "label_propagation_communities", "hits_hub_authority",
          "link_prediction_common_neighbors",
          "gnn_feature_propagation",
          # ordered / renamed consumers deriving from the same lease
          # (leased_copurchase_edges: ordered == directed filtered to
          # a < b, a projection away)
          "triangle_count_copurchase", "local_clustering_coefficient",
          "modularity_brand_partition", "sssp_copurchase"]


def _cached_rdd_count(spark) -> int:
    jsc = spark.sparkContext._jsc.sc()
    return jsc.getPersistentRDDs().size()


def test_scope_shares_one_edge_build_and_releases_it(spark, sf0001):
    unscoped = {n: sorted(map(tuple,
                              REG[n].spark_fn(spark, sf0001).collect()))
                for n in FAMILY}
    spark.catalog.clearCache()
    with SharedScope() as scope:
        scoped = {n: sorted(map(tuple,
                                REG[n].spark_fn(spark, sf0001)
                                .collect()))
                  for n in FAMILY}
        # exactly TWO shared relations serve the whole family: the
        # directed edge list and its ordered (a < b) derivation —
        # never a per-query rebuild
        assert len(scope._cached) == 2
        assert sorted(scope._cached) == [
            f"copurchase_edges_directed:{sf0001}",
            f"copurchase_edges_ordered:{sf0001}"]
        assert _cached_rdd_count(spark) >= 1
    assert scoped == unscoped
    # scope exit released the lease and cleared the memo
    assert scope._cached == {}
    spark.catalog.clearCache()


def test_scope_does_not_nest():
    with SharedScope():
        with pytest.raises(ValueError, match="nest"):
            SharedScope().__enter__()


def test_scope_releases_even_on_error(spark, sf0001):
    with pytest.raises(RuntimeError, match="boom"):
        with SharedScope() as scope:
            REG["hits_hub_authority"].spark_fn(spark, sf0001).collect()
            assert len(scope._cached) == 1
            raise RuntimeError("boom")
    assert scope._cached == {}
    from big_datatrader_spark.queries import active_scope
    assert active_scope() is None
    spark.catalog.clearCache()
