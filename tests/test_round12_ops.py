"""Round-12 operator tests.

- morton_blocks_for_rect (the 2-D scan pre-flight's planner half,
  VERDICT r11 ask #8): the recursive quadrant decomposition must equal
  the brute-force cell enumeration for every rectangle — an
  under-prediction is the silent-wrong-scan failure mode the whole
  predict-then-prove contract exists to prevent.
- the dated-edge SharedScope lease (VERDICT r11 ask #4): scoped and
  unscoped values identical for both consumers, ONE dated build per
  scope, release at exit.
- graph_family_scoped_audit (VERDICT r11 ask #3): the registered
  scoped-path query's summary must equal the standalone members'
  summaries computed with no scope open.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_datatrader_spark.queries import (SharedScope,
                                          copurchase_edges_dated_key,
                                          load_registry)
from big_datatrader_spark.sources.sinks import morton_blocks_for_rect

REG = load_registry()


def _brute_blocks(x0, x1, y0, y1, bits, shift):
    def z(x, y):
        out = 0
        for i in range(bits):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out
    return sorted({z(x, y) >> shift
                   for x in range(x0, x1 + 1)
                   for y in range(y0, y1 + 1)})


def test_quadrant_decomposition_equals_brute_force():
    """Every rectangle over a 16x16 Morton grid, three block grains
    (cell, 2x2, 4x4): the recursion must produce EXACTLY the blocks
    the cell enumeration touches. Exhaustive over a deterministic
    rectangle sweep — no sampling, no misses."""
    import itertools

    corners = [0, 1, 3, 4, 7, 8, 12, 15]
    for shift in (0, 2, 4):
        for x0, x1 in itertools.combinations_with_replacement(corners, 2):
            for y0, y1 in itertools.combinations_with_replacement(
                    corners, 2):
                got = morton_blocks_for_rect(x0, x1, y0, y1, bits=4,
                                             block_shift=shift)
                want = _brute_blocks(x0, x1, y0, y1, 4, shift)
                assert got == want, (x0, x1, y0, y1, shift)


def test_quadrant_decomposition_rejects_odd_block_shift():
    with pytest.raises(ValueError, match="even"):
        morton_blocks_for_rect(0, 1, 0, 1, bits=4, block_shift=3)


def test_zmp_predicted_blocks_reach_partition_filters(spark, sf0001,
                                                      tmp_path):
    """The pre-flight's whole point: the predicted block set must land
    in the scan's PartitionFilters (pruning decided from metadata, no
    data read outside the prediction), and the pruned file set must BE
    the predicted set exactly."""
    from big_datatrader_spark.plans.explain import physical_plan
    from big_datatrader_spark.queries.format_ops import (
        _ZMP_BITS, _ZMP_BLOCK_SHIFT, _ZMP_DAY0, _ZMP_DAYS_PER_BUCKET,
        _ZMP_US_PER_DAY, _ZMP_USER_DIV, _zmp_predicted_blocks,
        zmp_preflight_audit)
    from big_datatrader_spark.sources.parquet_source import table
    from big_datatrader_spark.sources.sinks import morton_code

    nb = (1 << _ZMP_BITS) - 1
    ev = (table(spark, sf0001, "events")
          .select("ts", "user_id", "value")
          .withColumn("bx", F.expr(
              f"least(greatest((unix_micros(ts) div {_ZMP_US_PER_DAY} "
              f"- {_ZMP_DAY0}) div {_ZMP_DAYS_PER_BUCKET}, 0), {nb})"))
          .withColumn("by", F.expr(
              f"least(user_id div {_ZMP_USER_DIV}, {nb})")))
    ev = (ev.withColumn("zq", F.shiftright(
              morton_code([(F.col("bx"), _ZMP_BITS),
                           (F.col("by"), _ZMP_BITS)]),
              _ZMP_BLOCK_SHIFT))
          .drop("bx", "by"))
    path = str(tmp_path / "events_by_zblock")
    ev.repartition("zq").write.partitionBy("zq").parquet(path)

    audit = zmp_preflight_audit(spark, path)
    plan = physical_plan(audit)
    assert "PartitionFilters" in plan
    # the predicted ids appear in a partition-filter IN-list, so the
    # block bound is enforced from directory metadata
    pf_lines = [l for l in plan.splitlines() if "PartitionFilters" in l
                and "zq" in l]
    assert pf_lines, plan
    blocks = _zmp_predicted_blocks()
    assert any(str(b) in l for b in blocks for l in pf_lines), pf_lines
    # predicted file set == touched file set, proven by the data too
    row = audit.collect()[0]
    present = {r["zq"] for r in
               spark.read.parquet(path).select("zq").distinct()
               .collect()}
    assert row["n_files_read"] == len(set(blocks) & present)
    assert row["n_blocks_read"] == row["n_files_read"]


def test_dated_lease_values_identical_and_built_once(spark, sf0001):
    """The r12 lease extension (VERDICT r11 ask #4): under one scope,
    temporal reachability and the link-prediction holdout must lease
    ONE dated edge build between them and produce values identical to
    their unscoped runs; scope exit releases the lease."""
    members = ["temporal_reachability_copurchase",
               "link_prediction_holdout_eval"]
    unscoped = {n: sorted(map(tuple,
                              REG[n].spark_fn(spark, sf0001).collect()))
                for n in members}
    with SharedScope() as scope:
        scoped = {n: sorted(map(tuple,
                                REG[n].spark_fn(spark,
                                                sf0001).collect()))
                  for n in members}
        assert copurchase_edges_dated_key(sf0001) in scope._cached
        # one dated lease serves both consumers — never a rebuild
        dated_keys = [k for k in scope._cached if "dated" in k]
        assert dated_keys == [copurchase_edges_dated_key(sf0001)]
    assert scoped == unscoped
    assert scope._cached == {}
    spark.catalog.clearCache()


def test_scoped_audit_matches_standalone_summaries(spark, sf0001):
    """graph_family_scoped_audit's rows must equal the summaries of
    the members run STANDALONE (no scope): the scoped path may only
    amortize, never change a value."""
    from big_datatrader_spark.queries.scoped_ops import _GFA_MEMBERS

    audit = {r["member"]: (r["n_rows"], r["key_sum"], r["val_sum"])
             for r in REG["graph_family_scoped_audit"]
             .spark_fn(spark, sf0001).collect()}
    assert sorted(audit) == sorted(n for n, _, _ in _GFA_MEMBERS)
    for name, key, val in _GFA_MEMBERS:
        res = REG[name].spark_fn(spark, sf0001)
        row = res.agg(F.count(F.lit(1)).cast("long").alias("n"),
                      F.sum(F.col(key)).cast("long").alias("k"),
                      F.sum(F.expr(val)).cast("long").alias("v")
                      ).collect()[0]
        assert audit[name] == (row["n"], row["k"], row["v"]), name
    spark.catalog.clearCache()


def test_scope_get_unpersists_on_failed_materialization(spark):
    """ADVICE r11 #1: if the eager count() inside SharedScope.get
    fails, the persist must be rolled back — otherwise the relation is
    never memoized, __exit__ cannot see it, and the cache leaks for
    the session's lifetime."""
    from pyspark.sql.types import LongType, StructField, StructType

    def _boom(x):
        raise RuntimeError("boom")

    rdd = spark.sparkContext.parallelize([1]).map(_boom)
    bad = spark.createDataFrame(
        rdd, StructType([StructField("v", LongType())]))
    before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    with SharedScope() as scope:
        with pytest.raises(Exception):
            scope.get("bad_key", bad)
        assert "bad_key" not in scope._cached
    after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert after <= before
