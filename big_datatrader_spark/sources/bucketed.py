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

import contextlib
import os
import shutil
import tempfile
import uuid
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


@contextlib.contextmanager
def bucketed_pair_tables(spark: SparkSession, left: DataFrame,
                         right: DataFrame, bucket_cols: Sequence[str],
                         n_buckets: int = 8):
    """Write two relations as same-key/same-count bucketed catalog
    tables with auto-broadcast DISABLED, yield their table names, and
    tear everything down (conf, tables, files) on exit.

    This is the one setup under which the co-located sort-merge join
    is THE tested plan at every scale (broadcast would hide the
    bucket layout at small SFs). Factored here (ADVICE r10 #4) so
    queries/format_ops.bucketed_copartitioned_join and
    tests/test_plans.py's exchange-free assertion drive the IDENTICAL
    layout — two drifting copies could let the plan test audit a
    different layout than the driver query runs."""
    tag = uuid.uuid4().hex[:8]
    t_left, t_right = f"bdt_bl_{tag}", f"bdt_br_{tag}"
    root = tempfile.mkdtemp(prefix="bdt_bucket_")
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        write_bucketed(left, t_left, bucket_cols, n_buckets=n_buckets,
                       path=os.path.join(root, "l"))
        write_bucketed(right, t_right, bucket_cols,
                       n_buckets=n_buckets,
                       path=os.path.join(root, "r"))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        yield t_left, t_right
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        drop_table(spark, t_left)
        drop_table(spark, t_right)
        shutil.rmtree(root, ignore_errors=True)
