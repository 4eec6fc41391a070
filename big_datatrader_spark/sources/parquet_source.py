"""Parquet star-schema source (driver testdata; TESTDATA.md).

Parquet scans get predicate pushdown, column pruning, and partition/row-
group pruning from Catalyst for free — at 100 TB the scan is the dominant
cost, so every query should select only the columns it needs and put
filters as early as possible (Catalyst will push them into the scan).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..session import ensure_confs
from ..schemas import STAR_TABLES

# Columns stored as TIMESTAMP(NANOS) in the driver parquet. Spark reads
# them as int64 ns (legacy.parquet.nanosAsLong); we truncate ns -> us
# exactly like DuckDB does, so oracle comparisons see identical instants.
_NANOS_TS_COLS: dict[str, list[str]] = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in STAR_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {STAR_TABLES}")
    ensure_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in _NANOS_TS_COLS.get(name, []):
        if dict(df.dtypes).get(c) == "bigint":
            # integer DIV keeps full precision (ns epochs overflow double)
            df = df.withColumn(
                c, F.expr(f"timestamp_micros({c} DIV 1000)"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in STAR_TABLES}
