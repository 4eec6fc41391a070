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


def _ts_rowgroup_windows(path):
    """Per-row-group (min, max) of the ts column from parquet footers
    — the statistics a pushed time predicate prunes against."""
    import glob

    import pyarrow.parquet as pq

    wins = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name
                 for i in range(md.num_columns)]
        ci = names.index("ts")
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(ci).statistics
            assert st is not None and st.has_min_max
            wins.append((st.min, st.max))
    return wins


def test_range_clustered_layout_makes_time_rowgroups_skippable(spark):
    """VERDICT r8 ask #7 — the SURVEY §1.4 'sorted divisions' claim at
    the LAYOUT level, quantified: on a repartitionByRange(ts) copy the
    3-day BETWEEN window intersects only ~window/range of the row
    groups (footer min/max), while an unsorted rewrite of the SAME
    rows intersects essentially all of them — so the pushed predicate
    (also asserted on the plan) lets the reader skip the rest. This is
    the parquet-reader contract: pushed filter + disjoint stats =>
    row groups never decompressed."""
    import datetime

    from big_datatrader_spark.queries.format_ops import (
        _RPT_HI, _RPT_LO, range_pruned_rollup)
    from big_datatrader_spark.sources.sinks import write_clustered

    ev = table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value")
    root = tempfile.mkdtemp(prefix="bdt_rangep_t_")
    try:
        p_sorted = os.path.join(root, "by_time")
        p_rand = os.path.join(root, "unsorted")
        write_clustered(ev, p_sorted, "ts", n_files=16)
        ev.repartition(16).write.parquet(p_rand)

        # 1) the time predicate reaches the scan
        df = range_pruned_rollup(spark, p_sorted)
        plan = physical_plan(df)
        assert "PushedFilters" in plan and "ts" in plan \
            and "GreaterThanOrEqual" in plan and "LessThan" in plan

        utc = datetime.timezone.utc
        lo = datetime.datetime.fromisoformat(_RPT_LO).replace(tzinfo=utc)
        hi = datetime.datetime.fromisoformat(_RPT_HI).replace(tzinfo=utc)

        def matching(path):
            wins = _ts_rowgroup_windows(path)
            hit = sum(1 for mn, mx in wins if mn < hi and mx >= lo)
            return hit, len(wins)

        s_hit, s_tot = matching(p_sorted)
        r_hit, r_tot = matching(p_rand)
        # 2) the range layout makes the window's footprint narrow:
        # 3 of ~30 days -> at most ~1/4 of row groups even with
        # boundary straddle; the unsorted twin overlaps everywhere
        assert s_tot >= 8 and r_tot >= 8
        assert s_hit <= max(2, s_tot // 4), (s_hit, s_tot)
        assert r_hit == r_tot, (r_hit, r_tot)
        # 3) same answer from both layouts (pruning loses nothing)
        a = df.agg(F.sum("n_events")).collect()[0][0]
        b = (range_pruned_rollup(spark, p_rand)
             .agg(F.sum("n_events")).collect()[0][0])
        assert a == b and a > 0
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
