"""Per-query sf0.1 -> sf1 scale measurement for queries that are not
on the bench (the SCALING.md per-round tables): best-of-N wall-clock
per (query, sf_dir) with the session cache cleared between runs, the
same method the bench uses, so ratios are comparable across rounds.

Usage:
    python tools/measure_query_scale.py [-n 2] query [query ...]

Prints one JSON line per query:
    {"query": ..., "sf01": sec, "sf1": sec, "ratio": x}

Both runs happen in ONE session on the same box, so host drift
cancels out of the ratio (the assemble_bench_sf1.py discipline).
Requires .benchdata/sf1 (tools/make_sf1.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_datatrader_spark.queries import load_registry  # noqa: E402
from big_datatrader_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".benchdata", "sf1")


def best_of(spark, fn, sf_dir: str, n: int) -> float:
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
    return round(min(samples), 2)


def main() -> int:
    args = sys.argv[1:]
    n = 2
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    if not os.path.isdir(SF1):
        print(f"missing {SF1}: run tools/make_sf1.py first",
              file=sys.stderr)
        return 2
    reg = load_registry()
    unknown = [a for a in args if a not in reg]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    spark = get_spark("measure-scale")
    for name in args:
        fn = reg[name].spark_fn
        # warm-up at the smallest sf so codegen/Python-worker startup
        # doesn't land in the first timed sample
        fn(spark, "/root/testdata/sf0.001").write.format(
            "noop").mode("overwrite").save()
        spark.catalog.clearCache()
        a = best_of(spark, fn, SF01, n)
        b = best_of(spark, fn, SF1, n)
        print(json.dumps({"query": name, "sf01": a, "sf1": b,
                          "ratio": round(b / a, 1) if a else None}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
