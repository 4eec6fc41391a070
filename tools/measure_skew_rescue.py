"""Three-way hot-key join measurement (VERDICT r8 ask #6): when does
AQE's built-in skew-join rescue suffice, and when is manual salting
still needed?

Builds the same 1M-row events tables as the round-8 hot-key audit
(uniform: 1000 equal users; hot: user 0 owns 50% of rows) and times
the spend-enrichment join three ways on each:

1. plain   — unsalted sort-merge join, AQE skew-join OFF (the naive
             plan a 100 TB job degenerates to when nobody looks);
2. aqe     — unsalted SMJ with spark.sql.adaptive.skewJoin.enabled=
             true. Run twice: with DEFAULT thresholds (256 MB /
             factor 5 — what a stock cluster gives you) and with the
             thresholds lowered so the optimization actually fires at
             this data size (what a tuned cluster gives you);
3. salted  — the registered skew_salted_join plan shape: replicate
             the small side per salt, split the hot key across
             _SALT_N buckets.

autoBroadcastJoinThreshold is disabled for ALL variants: at this toy
size the 1000-row spend side would broadcast and there would be no
shuffle join to rescue — the measurement models the 100 TB case where
BOTH sides are corpus-scale. Prints one JSON line for SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from big_datatrader_spark.session import get_spark  # noqa: E402

_ROWS = 1_000_000
_USERS = 1_000
_SALT_N = 16


def make_events(spark, hot: bool):
    """1M synthetic events; hot=True routes 50% of rows to user 0."""
    df = spark.range(_ROWS).select(
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
        (F.pmod(F.xxhash64("id", F.lit(13)), F.lit(10000)) / 100.0)
        .alias("value"))
    return df


def plans(ev):
    spend = (ev.filter(F.col("event_type") == "purchase")
             .groupBy("user_id")
             .agg(F.sum(F.round(F.col("value") * 100).cast("bigint"))
                  .alias("spend_cents")))

    def plain():
        return (ev.select("user_id", "event_type").join(spend, "user_id")
                .groupBy("event_type")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("spend_cents").alias("s")))

    def salted():
        spend_rep = spend.select(
            "user_id", "spend_cents",
            F.explode(F.sequence(F.lit(0), F.lit(_SALT_N - 1)))
            .alias("salt"))
        fact = ev.select(
            "user_id", "event_type",
            F.pmod(F.xxhash64("event_id"), F.lit(_SALT_N)).alias("salt"))
        return (fact.join(spend_rep, ["user_id", "salt"])
                .groupBy("event_type")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("spend_cents").alias("s")))

    return plain, salted


def timed(df, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main():
    spark = get_spark("skew-rescue")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    out = {}
    for label, hot in (("uniform", False), ("hot", True)):
        ev = make_events(spark, hot).localCheckpoint(eager=True)
        plain, salted = plans(ev)
        # 1. naive: AQE skew rescue off
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        out[f"{label}_plain"] = timed(plain())
        # 2a. AQE skew rescue on, stock thresholds
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "256MB")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "5.0")
        out[f"{label}_aqe_default"] = timed(plain())
        # 2b. AQE skew rescue tuned to fire at this size
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "1MB")
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
        out[f"{label}_aqe_tuned"] = timed(plain())
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
        # 3. manual salting (rescue off again: salting must stand alone)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        out[f"{label}_salted"] = timed(salted())
        ev.unpersist()
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
