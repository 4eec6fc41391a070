"""Bucketed tables: pre-shuffled storage for co-located joins.

The reference engine re-partitions per query (SURVEY.md §2.11); at
100 TB the equivalent capability is bucketing — write a fact table
``bucketBy(N, key)`` once, and every subsequent equi-join or
aggregation on that key reads the buckets back with NO exchange: the
shuffle is paid once at write time instead of per query. Two tables
bucketed by the same key with the same bucket count sort-merge-join
with zero Exchange nodes (asserted in tests/test_bucketed.py).

Bucket count is a layout decision: at cluster scale pick
``buckets ≈ data_size / target_partition_size`` (e.g. 100 TB at
256 MB -> ~400k buckets is too many files; bucket the JOIN KEY space,
not the byte space — a few thousand buckets keeps file counts sane
while still bounding per-task state).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str,
                   bucket_cols: Sequence[str], n_buckets: int = 8,
                   sort_cols: Sequence[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally
    sorted within buckets) by ``bucket_cols``. Repartitioning by the
    bucket key first keeps one file per bucket per write, which lets
    the reader skip the sort too when ``sort_cols`` match the query."""
    w = (df.repartition(n_buckets, *bucket_cols)
         .write.format("parquet").mode(mode)
         .bucketBy(n_buckets, *bucket_cols))
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def drop_table(spark: SparkSession, table_name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
