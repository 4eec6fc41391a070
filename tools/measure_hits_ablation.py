"""HITS edge-materialization ablation (VERDICT r10 ask #2).

BENCH_r10 recorded hits_hub_authority at 2.31x its r9 cost (sf0.1
1.83s -> 4.23s; sf1 7.1s -> 13.3s) under loadavg 4.32. The verdict's
presumed mechanism — "r10 added the eager edges.count()" — is wrong on
the history (the count shipped in r8's 50f00cb and r9's 1.83s included
it; r10's only diff was the finally-release of the edge cache), but
the untried levers it names are real and this tool measures them, the
same best-of-N one-session protocol as the three rejected replans in
SCALING.md's "hits floor" table:

  A  shipped     eager count() under session AQE confs (r8-r10 form)
  B  lazy        persist only; first half-step materializes the edge
                 build under the loop's AQE-off / 8-partition confs
  C  serialized  eager count(), MEMORY_AND_DISK_SER storage level —
                 smaller materialization, per-use deserialization
  D  packed      eager count() over a single packed BIGINT column
                 (src << 32 | dst), unpacked once per half-step join

Each variant is checked value-identical to the shipped query before
timing counts. Usage:

    python tools/measure_hits_ablation.py [-n 3] [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from big_datatrader_spark.functions import graph as GR  # noqa: E402
from big_datatrader_spark.queries import training_ops as T  # noqa: E402
from big_datatrader_spark.session import get_spark  # noqa: E402
from big_datatrader_spark.sources.parquet_source import table  # noqa: E402


def hits_variant(spark, sf_dir, *, eager: bool,
                 level=None, packed: bool = False):
    """The registered hits_hub_authority with the edge-materialization
    strategy swapped out; everything downstream identical."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey",
                                                 "l_partkey")
    edges = GR.copurchase_pairs(li, "src", "dst")
    if packed:
        packed_edges = edges.select(
            (F.col("src").cast("bigint") * F.lit(1 << 32)
             + F.col("dst")).alias("e"))
        packed_edges = (packed_edges.persist(level) if level
                        else packed_edges.persist())
        if eager:
            packed_edges.count()
        edges = packed_edges.select(
            F.shiftright("e", 32).alias("src"),
            F.col("e").bitwiseAND(F.lit((1 << 32) - 1)).alias("dst"))
        edge_cache = packed_edges
    else:
        edges = edges.persist(level) if level else edges.persist()
        if eager:
            edges.count()
        edge_cache = edges
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

    overrides = {"spark.sql.shuffle.partitions":
                 str(T._HITS_ITER_PARTITIONS),
                 "spark.sql.adaptive.enabled": "false"}
    saved = {k: spark.conf.get(k) for k in overrides}
    a = None
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        for _ in range(T._HITS_ITERS):
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
        edge_cache.unpersist()
    return rows


VARIANTS = {
    "A_shipped_eager": dict(eager=True),
    "B_lazy": dict(eager=False),
    # PySpark's StorageLevel.MEMORY_AND_DISK has deserialized=False —
    # it IS the serialized level; DataFrame.persist()'s default is
    # MEMORY_AND_DISK_DESER. So C = serialized storage.
    "C_eager_ser": dict(eager=True, level=StorageLevel.MEMORY_AND_DISK),
    "D_packed_eager": dict(eager=True, packed=True),
}


def main() -> int:
    args = sys.argv[1:]
    n = 3
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    sf_dirs = args or ["/root/testdata/sf0.1",
                       os.path.join(os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))),
                           ".benchdata", "sf1")]
    spark = get_spark()
    for sf_dir in sf_dirs:
        baseline = sorted(map(tuple, hits_variant(
            spark, sf_dir, **VARIANTS["A_shipped_eager"])))
        spark.catalog.clearCache()
        for name, kw in VARIANTS.items():
            got = sorted(map(tuple, hits_variant(spark, sf_dir, **kw)))
            assert got == baseline, f"{name} values differ at {sf_dir}"
            spark.catalog.clearCache()
            samples = []
            for _ in range(n):
                t0 = time.perf_counter()
                hits_variant(spark, sf_dir, **kw)
                samples.append(round(time.perf_counter() - t0, 2))
                spark.catalog.clearCache()
            print(json.dumps({
                "sf_dir": os.path.basename(sf_dir), "variant": name,
                "best": min(samples), "samples": samples,
                "loadavg_1m": round(os.getloadavg()[0], 2)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
