"""A/B spec (tools/measure_ab.py): hits_hub_authority iteration-loop
confs at sf1 (VERDICT r14 ask #2). The registered plan pins the
half-step jobs to AQE-off / 8 shuffle partitions — measured right at
sf0.1 in r7 (7.7s -> 3.1s), never re-tested at sf1 where hits is the
suite's biggest member (25.6s). At sf1 the half-step joins are
edge-scale (24M cached edge rows scanned per half-step); if the
static planner picks a sort-merge join there, 8 partitions with AQE
off serializes the shuffle onto 8 of 32 cores. Variants differ ONLY
in the conf overrides around the iteration loop — same arithmetic,
same caches, identical results (run with --check).
"""

from pyspark import StorageLevel
from pyspark.sql import functions as F

from big_datatrader_spark.functions import graph as GR
from big_datatrader_spark.sources.parquet_source import table


def _hits(spark, sf_dir, overrides):
    li = table(spark, sf_dir, "lineitem").select("l_orderkey",
                                                 "l_partkey")
    edges = GR.copurchase_pairs(li, "src", "dst").persist(
        StorageLevel.MEMORY_AND_DISK)
    edges.count()
    nodes = edges.select(F.col("src").alias("node")).distinct()
    h = nodes.select("node", F.lit(1000000).cast("bigint").alias("h"))
    live = []

    def linf_norm(raw, col_in, col_out):
        raw = raw.persist()
        m = int(raw.agg(F.max(col_in).alias("m")).collect()[0]["m"])
        while len(live) > 1:
            live.pop(0).unpersist()
        live.append(raw)
        x = F.col(col_in).cast("decimal(38,0)")
        return raw.select(
            "node",
            ((x * 1000000 - (x * 1000000) % F.lit(m))
             / F.lit(m)).cast("bigint").alias(col_out))

    saved = {k: spark.conf.get(k) for k in overrides}
    a = None
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        for _ in range(2):
            a_raw = (h.join(edges, h["node"] == edges["src"])
                     .groupBy("dst")
                     .agg(F.sum("h").alias("a_raw"))
                     .select(F.col("dst").alias("node"), "a_raw"))
            a = linf_norm(a_raw, "a_raw", "a")
            h_raw = (a.join(edges, a["node"] == edges["dst"])
                     .groupBy("src")
                     .agg(F.sum("a").alias("h_raw"))
                     .select(F.col("src").alias("node"), "h_raw"))
            h = linf_norm(h_raw, "h_raw", "h")
        out = (a.join(h, "node")
               .select(F.col("node").alias("part_key"),
                       F.col("a").alias("authority_e6"),
                       F.col("h").alias("hub_e6"))
               .orderBy(F.desc("authority_e6"), F.desc("hub_e6"),
                        "part_key")
               .limit(50))
        rows = out.collect()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
        for df in live:
            df.unpersist()
        edges.unpersist()
    return spark.createDataFrame(
        rows, "part_key long, authority_e6 long, hub_e6 long")


def current(spark, sf_dir):
    return _hits(spark, sf_dir,
                 {"spark.sql.shuffle.partitions": "8",
                  "spark.sql.adaptive.enabled": "false"})


def aqe_on(spark, sf_dir):
    return _hits(spark, sf_dir, {})


def aqe_off_wide(spark, sf_dir):
    import os
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return _hits(spark, sf_dir,
                 {"spark.sql.shuffle.partitions": cpus,
                  "spark.sql.adaptive.enabled": "false"})


VARIANTS = [("current", current), ("aqe_on", aqe_on),
            ("aqe_off_wide", aqe_off_wide)]
