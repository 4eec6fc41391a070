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
    """Every registered query must at least execute at the smallest SF."""
    mod = _entry_mod()
    for name, fn in mod.queries().items():
        df = fn(spark, sf0001)
        assert df.limit(1).count() >= 0, name
