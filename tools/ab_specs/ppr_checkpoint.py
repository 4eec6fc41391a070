"""A/B spec (tools/measure_ab.py): personalized_pagerank mid-loop
lineage capping at sf1 (VERDICT r14 ask #3/#4). The registered plan
chains 3 iterations lazily into ONE action: the analyzed tree carries
every iteration (3 frontier joins + 3 edge joins + 3 aggregations +
3 seed joins) and AQE replans across the whole unrolled DAG. Variants
cap the lineage per iteration with node-sized materializations —
same arithmetic, same caches, identical results (run with --check).

Variants:
- current: the registered lazy-unrolled plan (run_scoped as-is)
- ckpt_each: pr localCheckpoint(eager=True) after every iteration
- persist_each: pr persist+count after every iteration (released in
  the same run_scoped finally as the other caches)
"""

from pyspark.sql import functions as F

from big_datatrader_spark.queries import run_scoped
from big_datatrader_spark.queries.training_ops import (
    _PPR_ITERS, _PPR_SEEDS, _ppr_plan)
from big_datatrader_spark.functions import graph as GR
from big_datatrader_spark.queries import copurchase_edges_key as _ek
from big_datatrader_spark.sources.parquet_source import table


def current(spark, sf_dir):
    return run_scoped(spark, sf_dir, _ppr_plan)


def _ppr_capped(spark, sf_dir, cache, mode):
    li = table(spark, sf_dir, "lineitem").select("l_orderkey",
                                                 "l_partkey")
    edges = cache(GR.copurchase_pairs(li, "src", "dst"), eager=True)
    outdeg = cache(edges.groupBy("src")
                   .agg(F.count(F.lit(1)).alias("deg")))
    seeds = cache(edges.select(F.col("src").alias("node")).distinct()
                  .orderBy("node").limit(_PPR_SEEDS)
                  .select("node"))
    restart = F.lit(round(0.15 * 1e9 / _PPR_SEEDS)).cast("bigint")
    pr = seeds.select(
        "node",
        F.lit(round(1e9 / _PPR_SEEDS)).cast("bigint").alias("pr_mu"))
    for _ in range(_PPR_ITERS):
        frontier = (pr.join(outdeg, pr["node"] == outdeg["src"])
                    .select("node",
                            F.expr("pr_mu DIV deg").alias("c")))
        contrib = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select("dst", "c")
            .groupBy("dst").agg(F.sum("c").alias("s")))
        is_seed = F.col("seed_node").isNotNull()
        pr = (
            contrib.join(
                F.broadcast(seeds.select(F.col("node")
                                         .alias("seed_node"))),
                contrib["dst"] == F.col("seed_node"), "left")
            .select(F.col("dst").alias("node"),
                    (F.when(is_seed, restart).otherwise(F.lit(0))
                     + F.expr("(85 * s) DIV 100")).alias("pr_mu")))
        if mode == "ckpt":
            pr = pr.localCheckpoint(eager=True)
        else:
            pr = cache(pr, eager=True)
    return (pr.select(F.col("node").alias("part_key"), "pr_mu")
            .orderBy(F.desc("pr_mu"), "part_key").limit(100))


def ckpt_each(spark, sf_dir):
    return run_scoped(spark, sf_dir,
                      lambda s, d, c: _ppr_capped(s, d, c, "ckpt"))


def persist_each(spark, sf_dir):
    return run_scoped(spark, sf_dir,
                      lambda s, d, c: _ppr_capped(s, d, c, "persist"))


VARIANTS = [("current", current), ("ckpt_each", ckpt_each),
            ("persist_each", persist_each)]
