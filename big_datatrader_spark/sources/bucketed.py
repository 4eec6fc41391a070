"""Bucketed tables: pre-shuffled storage for co-located joins.

The reference engine re-partitions per query (SURVEY.md §2.11); at
100 TB the equivalent capability is bucketing — write a fact table
``bucketBy(N, key)`` once, and every subsequent equi-join or
aggregation on that key reads the buckets back with NO exchange: the
shuffle is paid once at write time instead of per query. Two tables
bucketed by the same key with the same bucket count sort-merge-join
with zero Exchange nodes (asserted in tests/test_bucketed.py and
tests/test_plans.py).

Bucket count is a layout decision: at cluster scale pick
``buckets ≈ data_size / target_partition_size`` (e.g. 100 TB at
256 MB -> ~400k buckets is too many files; bucket the JOIN KEY space,
not the byte space — a few thousand buckets keeps file counts sane
while still bounding per-task state).

Bucket metadata rides the session catalog (``saveAsTable``): pass
``path`` to keep the data an ordinary external parquet directory (no
Hive metastore, no warehouse-dir writes — the in-memory catalog of the
running session is enough, and a production deployment points the same
call at its shared catalog). Read back through ``spark.table`` /
``read_bucketed``: a plain ``spark.read.parquet(path)`` loses the
bucket metadata and with it the exchange-free join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str,
                   bucket_cols: Sequence[str], n_buckets: int = 8,
                   sort_cols: Sequence[str] | None = None,
                   mode: str = "overwrite",
                   path: str | None = None) -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally
    sorted within buckets) by ``bucket_cols``. Repartitioning by the
    bucket key first keeps one file per bucket per write, which lets
    the reader skip the sort too when ``sort_cols`` match the query.
    ``path`` makes the table external (data at ``path``, not the
    warehouse dir)."""
    w = (df.repartition(n_buckets, *bucket_cols)
         .write.format("parquet").mode(mode)
         .bucketBy(n_buckets, *bucket_cols))
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table back through the catalog (required for
    the exchange-free join plan)."""
    return spark.table(table_name)


def drop_table(spark: SparkSession, table_name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
