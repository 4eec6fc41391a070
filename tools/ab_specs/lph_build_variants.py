"""A/B spec (tools/measure_ab.py): link_prediction_holdout_eval's
DATED EDGE BUILD at sf1 (VERDICT r14 ask #3, redirected by the r15
profile: the wedge join adds ~1s at sf1 while the dedges+train eager
builds cost ~8-10s of the 12.3s total — the build IS the query).

Variants (identical results, run with --check):
- current: registered plan (directed explode a!=b, min(d) agg at
  directed grain, dedges persist + train persist).
- half_mirror: explode ONLY a<b (halves the pair rows through the
  build's big shuffle), min(d) at a<b grain, then mirror-union AFTER
  the agg (min over co-orders is direction-symmetric, so the directed
  relation is exactly reconstructed narrow, no extra exchange).
- no_train_cache: train stays a filter VIEW over the dedges cache
  (train is ~91% of dedges — persisting it re-materializes almost
  the whole cache for a filter consumers can apply per scan).
- both: half_mirror + no_train_cache.
"""

from pyspark.sql import Window, functions as F

from big_datatrader_spark.queries import run_scoped
from big_datatrader_spark.queries.training_ops import (
    _LPH_CUTOFF_DAY, _LPH_QUERIES, _LPH_TOPK, _LNK_RA_SCALE, _lph_plan)
from big_datatrader_spark.sources.parquet_source import table

_PAIRS_LT = ("flatten(transform(ps, x -> transform(filter(ps, "
             "y -> x < y), y -> struct(x AS a, y AS b))))")


def _dated_edges_half_mirror(li, odays):
    parts = (li.groupBy("l_orderkey")
             .agg(F.collect_set("l_partkey").alias("ps")))
    pairs = (parts.join(odays, "l_orderkey")
             .select(F.explode(F.expr(_PAIRS_LT)).alias("p"), "d")
             .select(F.col("p.a").alias("src"),
                     F.col("p.b").alias("dst"), "d"))
    agg = pairs.groupBy("src", "dst").agg(F.min("d").alias("d"))
    return agg.unionByName(agg.select(F.col("dst").alias("src"),
                                      F.col("src").alias("dst"), "d"))


def _lph_variant(spark, sf_dir, cache, half_mirror, train_cache):
    li = table(spark, sf_dir, "lineitem").select("l_orderkey",
                                                 "l_partkey")
    odays = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        (F.unix_micros("o_orderdate") / 86400000000).cast("bigint")
        .alias("d"))
    if half_mirror:
        dedges = cache(_dated_edges_half_mirror(li, odays), eager=True)
    else:
        from big_datatrader_spark.functions import graph as GR
        dedges = cache(GR.copurchase_pairs(li, "src", "dst",
                                           attrs=odays), eager=True)
    train = dedges.filter(F.col("d") < _LPH_CUTOFF_DAY).select(
        "src", "dst")
    if train_cache:
        train = cache(train, eager=True)
    testn = (dedges.filter(F.col("d") >= _LPH_CUTOFF_DAY)
             .select("src", "dst"))
    deg = train.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    q = cache(deg.orderBy(F.desc("deg"), "src").limit(_LPH_QUERIES)
              .select(F.col("src").alias("u")))
    e1 = (train.join(deg, "src")
          .select(F.col("src").alias("w"), F.col("dst").alias("u"),
                  "deg")
          .join(F.broadcast(q), "u"))
    e2 = train.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    cand = (e1.join(e2, "w")
            .filter(F.col("u") != F.col("v"))
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).cast("long").alias("n_common"),
                 F.sum(F.expr(f"{_LNK_RA_SCALE} DIV deg"))
                 .cast("long").alias("ra_score")))
    qsrc = F.broadcast(q.select(F.col("u").alias("src")))
    train_q = train.join(qsrc, "src")
    testn_q = testn.join(qsrc, "src")
    pred = cand.join(
        train_q.select(F.col("src").alias("u"),
                       F.col("dst").alias("v")),
        ["u", "v"], "left_anti")
    wq = Window.partitionBy("u").orderBy(F.desc("ra_score"), "v")
    topk = (pred.withColumn("rn", F.row_number().over(wq))
            .filter(F.col("rn") <= _LPH_TOPK).select("u", "v"))
    hits = (topk.join(
        testn_q.select(F.col("src").alias("u"),
                       F.col("dst").alias("v"),
                       F.lit(1).alias("hit")), ["u", "v"], "left")
        .groupBy("u")
        .agg(F.count(F.lit(1)).cast("long").alias("n_preds"),
             F.sum(F.coalesce(F.col("hit"), F.lit(0)).cast("bigint"))
             .cast("long").alias("n_hits")))
    np_ = (testn_q.groupBy(F.col("src").alias("u"))
           .agg(F.count(F.lit(1)).cast("long").alias("n_new")))
    return (q.join(hits, "u", "left").join(np_, "u", "left")
            .select(F.col("u").alias("part_u"),
                    F.coalesce("n_preds", F.lit(0)).cast("long")
                    .alias("n_preds"),
                    F.coalesce("n_hits", F.lit(0)).cast("long")
                    .alias("n_hits"),
                    F.coalesce("n_new", F.lit(0)).cast("long")
                    .alias("n_new_partners"))
            .orderBy("part_u"))


def current(spark, sf_dir):
    return run_scoped(spark, sf_dir, _lph_plan)


def half_mirror(spark, sf_dir):
    return run_scoped(spark, sf_dir,
                      lambda s, d, c: _lph_variant(s, d, c, True, True))


def no_train_cache(spark, sf_dir):
    return run_scoped(spark, sf_dir,
                      lambda s, d, c: _lph_variant(s, d, c, False,
                                                   False))


def both(spark, sf_dir):
    return run_scoped(spark, sf_dir,
                      lambda s, d, c: _lph_variant(s, d, c, True,
                                                   False))


VARIANTS = [("current", current), ("half_mirror", half_mirror),
            ("no_train_cache", no_train_cache), ("both", both)]
