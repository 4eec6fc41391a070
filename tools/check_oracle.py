"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB at the
given scale factor, then compares the results the way the driver does:
both sides as pandas frames (Spark ``toPandas`` vs DuckDB ``fetchdf``),
columns sorted by name, rows sorted by all columns, and per-column
pandas **dtypes compared strictly** before values. This catches the
two failure classes plain ``collect()``/``fetchall()`` comparison is
blind to:

- dtype drift (DuckDB HUGEINT -> float64 while Spark emits int64:
  Python ``5.0 == 5`` hides it, the driver's value hash does not), and
- unhashable cells (raw ndarray list columns break the driver's
  ``sort_values`` canonicalizer — they break ours identically).

Exits nonzero on any mismatch.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

from big_datatrader_spark.queries import load_registry  # noqa: E402
from big_datatrader_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonical form: columns sorted by name, timestamps
    at a common resolution, object nulls normalized, rows sorted by all
    columns (raises TypeError on unhashable cells, exactly as the
    driver's canonicalizer does)."""
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        kind = pdf[c].dtype.kind
        if kind == "M":
            pdf[c] = pdf[c].astype("datetime64[us]")
        elif kind in "iu":
            # driver evidence (q9 r1/r2 green with int32-vs-int64):
            # integer WIDTH is normalized; int-vs-float is not
            pdf[c] = pdf[c].astype("int64")
        elif kind == "f":
            pdf[c] = pdf[c].astype("float64")
        elif pdf[c].dtype == object:
            pdf[c] = pdf[c].where(pd.notna(pdf[c]), None)
    pdf = pdf.sort_values(list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


def main():
    args = list(sys.argv[1:])
    # accept a bare scale factor ("0.1") as shorthand for the testdata dir
    args = [a if os.path.isdir(a) or not os.path.isdir(
        f"/root/testdata/sf{a}") else f"/root/testdata/sf{a}"
        for a in args]
    sf_dir = args[0] if args and os.path.isdir(args[0]) \
        else "/root/testdata/sf0.01"
    only = set(a for a in args if not os.path.isdir(a))

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
        # per-query cache scope: this loop runs the whole registry in
        # one JVM; without the release, query-scoped persists (edge
        # lists, value-domain counts) accumulate across 270 queries
        spark.catalog.clearCache()
        try:
            s_pdf = q.spark_fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if q.oracle is None:
            try:
                s_pdf = canon(s_pdf)
            except TypeError as e:
                failures.append(name)
                print(f"FAIL  {name}: uncanonicalizable output: {e}")
                continue
            print(f"ok*   {name}: rows-only ({len(s_pdf)} rows, "
                  f"{time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            d_pdf = con.execute(q.oracle).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue

        try:
            s_pdf, d_pdf = canon(s_pdf), canon(d_pdf)
        except TypeError as e:
            # the driver's sort_values dies the same way on array cells
            failures.append(name)
            print(f"FAIL  {name}: uncanonicalizable output "
                  f"(driver would error too): {e}")
            continue

        if list(s_pdf.columns) != list(d_pdf.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns differ "
                  f"spark={list(s_pdf.columns)} duck={list(d_pdf.columns)}")
            continue
        s_dt = [str(t) for t in s_pdf.dtypes]
        d_dt = [str(t) for t in d_pdf.dtypes]
        if s_dt != d_dt:
            failures.append(name)
            bad = [(c, a, b) for c, a, b
                   in zip(s_pdf.columns, s_dt, d_dt) if a != b]
            print(f"FAIL  {name}: dtypes differ (driver hash would "
                  f"mismatch): {bad}")
            continue
        if len(s_pdf) != len(d_pdf):
            failures.append(name)
            print(f"FAIL  {name}: row count spark={len(s_pdf)} "
                  f"duck={len(d_pdf)}")
            continue
        if not s_pdf.equals(d_pdf):
            neq = (s_pdf != d_pdf) & ~(s_pdf.isna() & d_pdf.isna())
            bad_rows = neq.any(axis=1)
            failures.append(name)
            print(f"FAIL  {name}: {int(bad_rows.sum())}/{len(s_pdf)} "
                  f"rows differ; first:")
            for i in s_pdf.index[bad_rows][:3]:
                print(f"      spark={tuple(s_pdf.loc[i])}\n"
                      f"      duck ={tuple(d_pdf.loc[i])}")
            continue
        print(f"OK    {name}: {len(s_pdf)} rows match exactly "
              f"({time.time()-t0:.1f}s)")

    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("\nall queries match")


if __name__ == "__main__":
    main()
