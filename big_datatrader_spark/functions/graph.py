"""Shared co-purchase graph construction (pagerank / HITS / SSSP /
triangles / LCC / modularity all derive their edge list from "parts
appearing on the same order").

One-scan build: groupBy(l_orderkey) -> collect_set(l_partkey) ->
within-order pair explode -> distinct. The classic self-join build
reads lineitem TWICE and shuffles both copies; at the 100 TB design
point that is a second full corpus scan. This shape does one scan and
one map-side-combinable shuffle (collect_set has partial aggregation),
then the same k^2-per-order fan-out the join produced as a narrow
explode — measured 2x faster cold at sf0.1 (2.9s -> 1.6s) with an
identical 2.39M-edge result set. A hot order with k parts costs k^2
either way; the per-order set is bounded by order line count, so the
collected array is never corpus-scale.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, functions as F

_PAIRS = ("flatten(transform(ps, x -> "
          "transform(ps, y -> struct(x AS a, y AS b))))")


def _parallel_agg_input(li: DataFrame) -> DataFrame:
    """Restore aggregation parallelism when the lineitem scan cannot
    feed the cores (r15, guide §2 "derive partitioning from the
    input" / §2.5 input skew: "one huge unsplittable file — fix at
    the source if you can; otherwise repartition immediately after
    the read").

    A parquet file is parallelizable only down to its row groups,
    and the driver testdata writes each table as ONE row group — so
    the per-order collect_set's PARTIAL aggregate (an
    ObjectHashAggregate that sort-falls-back at 128 distinct keys)
    runs on a single core no matter how many cores the session has.
    When the scan has fewer than half the session's cores worth of
    splits, hash-repartition the raw (l_orderkey, l_partkey) rows by
    the aggregation key first: the exchange count is unchanged (the
    aggregate reuses the repartition's hash partitioning instead of
    inserting its own), the shuffle carries 16-byte rows the scan
    task writes far faster than it can build per-order sets, and the
    set-building runs on every core. Measured (interleaved min-of-3,
    OPTIMIZATION_r15.md): sf0.1 edge build 1.88 -> 1.36s (spreads
    disjoint); sf1 — 32 scan splits, rule does NOT fire — plain
    partial aggregation stays (guide §2.3 "aggregate before you
    shuffle" holds once the map side is actually parallel; forcing
    the repartition there measured a wash). Raising the
    ObjectHashAggregate fallback threshold instead was measured and
    rejected (worse at both scales: the giant per-partition hash map
    of sets pays more in GC than the sort fallback costs)."""
    try:
        n_splits = li.rdd.getNumPartitions()
    except Exception:
        return li
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if 2 * n_splits <= cpus:
        return li.repartition(F.col("l_orderkey"))
    return li


def copurchase_pairs(li: DataFrame, a_name: str, b_name: str,
                     *, ordered: bool = False,
                     attrs: DataFrame | None = None) -> DataFrame:
    """Distinct co-purchase part pairs from a lineitem projection
    (l_orderkey, l_partkey). ``ordered=True`` keeps only a < b
    (undirected edge set); otherwise both directions (a != b).
    The a<b / a!=b filters compare VALUES, so the nondeterministic
    collect_set order never reaches the result.

    ``attrs`` (optional): an order-grain DataFrame with exactly
    ``l_orderkey`` plus ONE attribute column. It is joined AFTER the
    per-order aggregation — against one row per order, not one per
    lineitem — and the result carries the per-edge MIN of that
    attribute instead of plain ``distinct()``. This keeps the dated
    edge build (temporal reachability) on the same single lineitem
    scan as the rest of the graph family."""
    parts = (_parallel_agg_input(li).groupBy("l_orderkey")
             .agg(F.collect_set("l_partkey").alias("ps")))
    cond: Column = (F.col(a_name) < F.col(b_name) if ordered
                    else F.col(a_name) != F.col(b_name))
    if attrs is not None:
        (attr,) = [c for c in attrs.columns if c != "l_orderkey"]
        pairs = (parts.join(attrs, "l_orderkey")
                 .select(F.explode(F.expr(_PAIRS)).alias("p"), attr)
                 .select(F.col("p.a").alias(a_name),
                         F.col("p.b").alias(b_name), attr))
        return (pairs.filter(cond).groupBy(a_name, b_name)
                .agg(F.min(attr).alias(attr)))
    pairs = (parts.select(F.explode(F.expr(_PAIRS)).alias("p"))
             .select(F.col("p.a").alias(a_name),
                     F.col("p.b").alias(b_name)))
    return pairs.filter(cond).distinct()
