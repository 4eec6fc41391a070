"""Three-way hot-key join measurement (VERDICT r8 ask #6): when does
AQE's built-in skew-join rescue suffice, and when is manual salting
still needed?

Two 10M-row fact tables (uniform: 1000 equal users; hot: user 0 owns
50% of rows) joined against a 1000-row spend dimension, timed four
ways each:

- plain        — unsalted sort-merge join, AQE skew-join OFF;
- aqe_default  — skewJoin.enabled=true with STOCK thresholds
                 (256 MB absolute floor AND 5x the median — both must
                 hold, so a 30x-skewed partition under 256 MB is
                 ignored on a stock cluster);
- aqe_tuned    — thresholds lowered (1 MB / 2x) so the rescue fires
                 at this data size;
- salted       — the registered skew_salted_join plan shape:
                 replicate the dimension per salt, split the hot key
                 across _SALT_N buckets.

Plan-shape caveat this script also demonstrates (skew_fired flags):
OptimizeSkewedJoin pattern-matches SMJ(Sort(Shuffle), Sort(Shuffle))
— BOTH join children must be raw shuffle stages, because splitting a
skewed partition replays the other side's map outputs. If the
dimension side is computed INLINE (groupBy().agg() feeding the join,
the everyday enrichment shape), the rule never fires at ANY
threshold; the `derived` variant measures that. Salting is
plan-shape-agnostic. The dimension is localCheckpointed for the
`direct` variants so the join children are raw shuffles.

autoBroadcastJoinThreshold is disabled throughout: at this toy size
the 1000-row dimension would broadcast and there would be no shuffle
join to rescue — the measurement models the 100 TB case where both
sides are corpus-scale. Prints one JSON line for SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from big_datatrader_spark.session import get_spark  # noqa: E402

_ROWS = 10_000_000
_USERS = 1_000
_SALT_N = 16


def make_events(spark, hot: bool):
    """10M synthetic events; hot=True routes 50% of rows to user 0.
    The payload column keeps shuffled rows realistically sized (a
    pure-key row lz4-compresses so well the stats undercount skew)."""
    return spark.range(_ROWS).select(
        F.col("id").alias("event_id"),
        (F.when(F.col("id") % 2 == 0, 0)
         .otherwise(F.pmod(F.xxhash64("id"), F.lit(_USERS)))
         if hot else
         F.pmod(F.xxhash64("id"), F.lit(_USERS))).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in
                      ("view", "click", "purchase", "signup", "error")]),
            (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(5)) + 1)
            .cast("int")).alias("event_type"),
        F.xxhash64("id", F.lit(13)).alias("payload"))


def spend_of(ev):
    return (ev.filter(F.col("event_type") == "purchase")
            .groupBy("user_id")
            .agg(F.sum(F.pmod("payload", F.lit(10000)))
                 .alias("spend_cents")))


def rollup(joined):
    return (joined.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("spend_cents").alias("s")))


def plain(ev, dim):
    return rollup(ev.select("user_id", "event_type", "payload")
                  .join(dim, "user_id"))


def salted(ev, dim):
    dim_rep = dim.select(
        "user_id", "spend_cents",
        F.explode(F.sequence(F.lit(0), F.lit(_SALT_N - 1))).alias("salt"))
    fact = ev.select(
        "user_id", "event_type", "payload",
        F.pmod(F.xxhash64("event_id"), F.lit(_SALT_N)).alias("salt"))
    return rollup(fact.join(dim_rep, ["user_id", "salt"]))


def timed(build, reps=3):
    """min wall of reps; runs through the frame's OWN QueryExecution
    (collect, tiny result) so the executed plan can be inspected for
    the skew=true marker afterwards."""
    best, fired = float("inf"), False
    for _ in range(reps):
        df = build()
        t0 = time.perf_counter()
        df.collect()
        best = min(best, time.perf_counter() - t0)
        plan = df._jdf.queryExecution().executedPlan().toString()
        fired = fired or "skew=true" in plan
    return round(best, 3), fired


def main():
    spark = get_spark("skew-rescue")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    thr = "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
    fac = "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
    adv = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    out = {}
    for label, hot in (("uniform", False), ("hot", True)):
        ev = make_events(spark, hot).localCheckpoint(eager=True)
        dim = spend_of(ev).localCheckpoint(eager=True)
        variants = {
            "plain": ("false", "256MB", "5.0", "64MB",
                      lambda: plain(ev, dim)),
            "aqe_default": ("true", "256MB", "5.0", "64MB",
                            lambda: plain(ev, dim)),
            "aqe_tuned": ("true", "1MB", "2.0", "4MB",
                          lambda: plain(ev, dim)),
            # inline-aggregated dimension: the shape AQE cannot match
            "aqe_tuned_derived": ("true", "1MB", "2.0", "4MB",
                                  lambda: plain(ev, spend_of(ev))),
            "salted": ("false", "256MB", "5.0", "64MB",
                       lambda: salted(ev, dim)),
        }
        for name, (sk, t, f, a, build) in variants.items():
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", sk)
            spark.conf.set(thr, t)
            spark.conf.set(fac, f)
            spark.conf.set(adv, a)
            sec, fired = timed(build)
            out[f"{label}_{name}"] = sec
            out[f"{label}_{name}_skew_fired"] = fired
        for df in (dim, ev):
            df.unpersist()
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set(thr, "256MB")
    spark.conf.set(fac, "5.0")
    spark.conf.set(adv, "64MB")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
