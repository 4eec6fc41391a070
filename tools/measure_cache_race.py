"""Measure what a multi-branch consumer actually pays over a shared
expensive relation: no cache vs lazy persist vs eager persist
(the experiment behind round 10's run_scoped `eager=True` default for
broadcast-consumed caches — including its NEGATIVE result).

Method: the expensive base relation routes every row through a Python
UDF that bumps a Spark ACCUMULATOR — the accumulator value after the
action is the number of base rows actually COMPUTED, a direct count of
how many times the lineage ran (cache hits bypass the UDF entirely).
The plan joins the base to N broadcast aggregates of itself, each on a
DIFFERENT grouping key (no common subtree for ReuseExchange) and each
consumed in the output (so the optimizer cannot eliminate the 1-row
join sides — the first version of this tool measured 0 lineage runs
for exactly that reason). The UDF is row-at-a-time ON PURPOSE (it
makes the base expensive and the counter exact); product code never
does this.

Measured on this box (Spark 4.1.2, AQE on, local[32], 400k rows x 3
broadcast branches + 1 main consumer, 4 rounds):

    no-persist    lineage_runs = 4.0 every round   (each branch
                  recomputes the base — why the cache exists at all)
    lazy-persist  lineage_runs = 1.0 every round   (the naive
                  "concurrent broadcast jobs race over the
                  unpopulated cache and each recompute" story does
                  NOT reproduce at this shape: AQE materializes query
                  stages in an order that lets the first consumer
                  populate the cache before the rest read it; also
                  re-measured with spark.sql.adaptive.enabled=false —
                  still 1.0 every round, so the serialization is not
                  AQE's doing either)
    eager-persist lineage_runs = 1.0, wall within noise of lazy

So the honest statement for run_scoped's eager mode is NOT
"lazy caches double-compute": it is (a) no-cache multi-branch plans
pay a full lineage run PER BRANCH, and (b) eager population makes the
cache's content, partitioning, and cost deterministic — built once
under a known plan before any consumer's AQE context can interleave
with it — which is what let link_prediction_holdout_eval's sf1 cost
drop from 34.2s (r9, lazy) to 15.0s (r10 bench) while its sf0.1 cost
ROSE ~2s (the fixed serialization price of the eager build). The
at-scale win and the small-scale cost move in opposite directions,
which is how we know the improvement is plan-shaped, not host drift.

Usage: python tools/measure_cache_race.py [n_rows] [n_branches]
Prints one JSON line per (variant, round).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import LongType  # noqa: E402

from big_datatrader_spark.session import get_spark  # noqa: E402


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    n_branches = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("cache-race")
    sc = spark.sparkContext

    def run(variant: str) -> dict:
        acc = sc.accumulator(0)

        @F.udf(LongType())
        def counted(x):
            acc.add(1)
            return x * 2 + 1

        base = (spark.range(n_rows, numPartitions=32)
                .select(counted(F.col("id")).alias("v"),
                        (F.col("id") % 97).alias("k")))
        if variant in ("lazy-persist", "eager-persist"):
            base = base.persist()
        t0 = time.perf_counter()
        if variant == "eager-persist":
            base.count()  # populate the cache BEFORE any consumer
        # one keyed consumer + n_branches broadcast scalar branches,
        # every branch on its own key and consumed in the result
        out = base.groupBy("k").agg(F.sum("v").alias("sv"))
        for b in range(n_branches):
            agg = (base.groupBy((F.col("k") % (b + 2)).alias(f"g{b}"))
                   .agg(F.sum("v").alias(f"s{b}"))
                   .groupBy().agg(F.max(f"s{b}").alias(f"m{b}")))
            out = out.join(F.broadcast(agg))
        total = F.col("sv")
        for b in range(n_branches):
            total = total + F.col(f"m{b}")
        out.select(F.sum(total).alias("t")).collect()
        wall = round(time.perf_counter() - t0, 2)
        base.unpersist()
        return {"variant": variant, "n_rows": n_rows,
                "n_branches": n_branches,
                "rows_computed": acc.value,
                "lineage_runs": round(acc.value / n_rows, 2),
                "wall_s": wall}

    run("eager-persist")  # warm-up (JVM + Python workers)
    for rnd in range(3):
        for v in ("no-persist", "lazy-persist", "eager-persist"):
            print(json.dumps({"round": rnd, **run(v)}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
