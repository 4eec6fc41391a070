"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB at the
given scale factor, then compares row count, column names/types, and the
full sorted value multiset (exact equality — stricter than any sane
hash). Exits nonzero on any mismatch.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from big_datatrader_spark.queries import load_registry  # noqa: E402
from big_datatrader_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) \
        else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))

    reg = load_registry()
    spark = get_spark("check-oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, q in sorted(reg.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.spark_fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = sdf.collect()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if q.oracle is None:
            print(f"ok*   {name}: rows-only ({len(s_rows)} rows, "
                  f"{time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            res = con.execute(q.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue

        sc, sr = norm_rows(s_cols, [tuple(r) for r in s_rows])
        dc, dr = norm_rows(d_cols, d_rows)
        if sc != dc:
            failures.append(name)
            print(f"FAIL  {name}: columns differ spark={sc} duck={dc}")
            continue
        if len(sr) != len(dr):
            failures.append(name)
            print(f"FAIL  {name}: row count spark={len(sr)} duck={len(dr)}")
            continue
        if sr != dr:
            failures.append(name)
            bad = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL  {name}: {sum(1 for a, b in zip(sr, dr) if a != b)}"
                  f"/{len(sr)} rows differ; first: ")
            for a, b in bad:
                print(f"      spark={a}\n      duck ={b}")
            continue
        print(f"OK    {name}: {len(sr)} rows match exactly "
              f"({time.time()-t0:.1f}s)")

    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("\nall queries match")


if __name__ == "__main__":
    main()
