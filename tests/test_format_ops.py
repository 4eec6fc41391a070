"""Plan-shape proofs for the format round-trip queries: the pruning /
pushdown the docstrings promise must be visible in the physical plan
(value parity is covered by tools/check_oracle.py and the driver
gate — the oracles run on the original tables, so round-trip fidelity
is on the hash)."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from big_datatrader_spark.plans.explain import physical_plan
from big_datatrader_spark.queries import load_registry
from big_datatrader_spark.queries.format_ops import pruned_purchase_rollup
from big_datatrader_spark.sources.parquet_source import table

REG = load_registry()
SF = "/root/testdata/sf0.001"


def test_partitioned_rewrite_prunes_to_one_directory(spark):
    ev = table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value")
    root = tempfile.mkdtemp(prefix="bdt_prune_t_")
    try:
        path = os.path.join(root, "by_type")
        ev.write.partitionBy("event_type").parquet(path)
        df = pruned_purchase_rollup(spark, path)
        plan = physical_plan(df)
        assert "PartitionFilters" in plan and "purchase" in plan
        # the predicate is partition-level: it must NOT appear as a
        # data filter the scan evaluates per row
        n = df.count()
        full = spark.read.parquet(path).count()
        assert 0 < n < full
        # the partition column never reaches the data scan: it is
        # pruned at listing time, not filtered per row
        read_schema = [ln for ln in plan.splitlines()
                       if "ReadSchema" in ln]
        assert read_schema and all("event_type" not in ln
                                   for ln in read_schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_orc_rereads_push_the_quantity_filter(spark):
    li = table(spark, SF, "lineitem").select(
        "l_quantity", "l_extendedprice")
    root = tempfile.mkdtemp(prefix="bdt_orc_t_")
    try:
        path = os.path.join(root, "orc")
        li.write.orc(path)
        back = spark.read.orc(path).filter(F.col("l_quantity") < 25)
        plan = physical_plan(back)
        assert "PushedFilters" in plan and "l_quantity" in plan
        assert 0 < back.count() < li.count()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_format_roundtrip_results_are_localized(spark):
    """The three registered queries materialize before their staging
    dirs are removed: the returned plan must be a local scan with no
    live reference to the deleted temp path."""
    for name in ("orc_roundtrip_revenue", "jsonl_roundtrip_events",
                 "partitioned_pruned_event_scan"):
        df = REG[name].spark_fn(spark, SF)
        assert df.count() > 0  # still readable post-cleanup


def test_schema_evolution_backfills_nulls_on_the_old_generation(spark):
    """mergeSchema semantics, independently replayed: old-generation
    rows (even event_id) must read the evolved column as NULL; new
    rows carry the computed flag; no row lost."""
    out = (REG["schema_evolution_union_scan"].spark_fn(spark, SF)
           .toPandas())
    ev = table(spark, SF, "events").toPandas()
    g = ev.groupby("event_type")
    for et, sub in g:
        row = out[out.event_type == et].iloc[0]
        odd = sub[sub.event_id % 2 == 1]
        assert row.n_events == len(sub)
        assert row.n_flagged_schema == len(odd)  # NULLs = even rows
        assert row.n_quality == int((odd.value >= 50.0).sum())


def test_csv_quarantine_catches_exactly_the_corrupted_subset(spark):
    out = (REG["csv_quarantine_scan"].spark_fn(spark, SF).toPandas())
    ev = table(spark, SF, "events").toPandas()
    for et, sub in ev.groupby("event_type"):
        row = out[out.event_type == et].iloc[0]
        bad = sub[sub.event_id % 13 == 0]
        assert row.n_rows == len(sub)
        assert row.n_quarantined == len(bad)
    # corruption rule actually fired somewhere
    assert out.n_quarantined.sum() > 0
