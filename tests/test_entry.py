"""Driver-contract smoke tests (t1) for __spark_entry__."""

import importlib


def _entry_mod():
    return importlib.import_module("__spark_entry__")


def test_entry_returns_rows(spark):
    df = _entry_mod().entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    cols = set(df.columns)
    assert {"user_id", "final_value", "roi"} <= cols


def test_every_query_has_registry_entry(spark):
    mod = _entry_mod()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert qs, "no queries registered"
    # every oracle key must be a declared query
    assert set(oracles) <= set(qs)


def test_queries_run_at_sf0001(spark, sf0001):
    """Every registered query must at least execute at the smallest
    SF. Pooled (conftest.run_query_pool, guide §2.6): 339 sf0.001
    jobs are stage-latency bound, so overlapping them collapses the
    sweep's wall clock (447s -> ~1/5th on this box); session-global
    queries (conf/scope/catalog mutators) run serially after the
    pool drains."""
    from conftest import pool_unsafe, run_query_pool
    mod = _entry_mod()
    items = list(mod.queries().items())

    def smoke(item):
        name, fn = item
        assert fn(spark, sf0001).limit(1).count() >= 0, name

    errors = run_query_pool(
        [it for it in items if not pool_unsafe(it[0])], smoke)
    assert not errors, errors
    for it in items:
        if pool_unsafe(it[0]):
            smoke(it)


def test_approx_aggregates_error_bounds(spark, sf001):
    """Sketch outputs have no exact oracle; bound the relative error
    against the exact answers instead (HLL++ rsd default 5%;
    percentile_approx at 10k accuracy is near-exact at this SF)."""
    from pyspark.sql import functions as F
    from big_datatrader_spark.queries import load_registry
    from big_datatrader_spark.sources.parquet_source import table

    approx = {r["event_type"]: r for r in
              load_registry()["approx_aggregates"]
              .spark_fn(spark, sf001).collect()}
    exact = {r["event_type"]: r for r in
             table(spark, sf001, "events").groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("users"),
                  F.expr("percentile(value, 0.5)").alias("median"))
             .collect()}
    assert set(approx) == set(exact)
    for et, ex in exact.items():
        ap = approx[et]
        assert abs(ap["approx_users"] - ex["users"]) <= 0.1 * ex["users"]
        assert abs(ap["approx_median_value"] - ex["median"]) \
            <= 0.05 * max(abs(ex["median"]), 1.0)
