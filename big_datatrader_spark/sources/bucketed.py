"""Bucketed parquet tables: pre-shuffled storage for co-located joins.

The 100 TB join story: two fact tables bucketed on the same key with
the same bucket count join WITHOUT a shuffle — each bucket pair is
joined in place (SortMergeJoin with no Exchange on either side). For a
daily-append fact table this moves the shuffle from every query to the
single write, which is the right trade whenever a join key is queried
repeatedly (orders ⋈ lineitem on orderkey, events ⋈ events on user).

Spark's bucketing rides the session catalog (``saveAsTable``): bucket
metadata lives in table properties, and the reader consults it to plan
exchange-free joins. We always pass an explicit ``path`` so the data is
an ordinary external parquet directory — no Hive metastore, no
warehouse-dir writes; the in-memory catalog of the running session is
enough (a production deployment points the same call at its shared
catalog).

Reference scope note: the reference (main.py) has no persistent-layout
concept at all — this is engine capability beyond it, same family as
sources/sinks.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, name: str, *, path: str,
                   buckets: int, bucket_cols: list[str],
                   sort_cols: list[str] | None = None) -> None:
    """Write ``df`` as a bucketed external parquet table ``name``.

    ``sort_cols`` additionally sorts within each bucket file, which lets
    the sort-merge join skip its per-task sort (files stream merge-ready
    from disk).
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    w = (df.write.format("parquet").mode("overwrite")
         .option("path", path)
         .bucketBy(buckets, *bucket_cols))
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table back through the catalog (required: a
    plain ``spark.read.parquet(path)`` loses the bucket metadata and
    with it the exchange-free join)."""
    return spark.table(name)
