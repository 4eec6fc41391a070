"""Bucketed range (interval) join.

Spark has no native band/range join: a plain inequality join degrades to
broadcast-nested-loop (O(n*m) comparisons). The standard scale pattern:
quantize the time axis into buckets the width of the band, equi-join on
(key, bucket) for the bucket and its neighbors, then filter the exact
band predicate. Each row is compared only against rows in adjacent
buckets — the comparison count is proportional to real matches, the join
is a hash join, and the band filter runs codegen-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def range_join(left: DataFrame, right: DataFrame, *, key: str,
               left_ts: str, right_ts: str,
               band_seconds: int) -> DataFrame:
    """Pairs (left row, right row) with same ``key`` and
    |left_ts - right_ts| <= band_seconds. Output: all left columns plus
    right's columns (caller pre-renames to avoid collisions)."""
    band_us = band_seconds * 1_000_000
    # integer DIV: microsecond epochs exceed double's 53-bit mantissa, so
    # float division would mis-bucket rows near boundaries
    lb = F.expr(f"unix_micros({left_ts}) DIV {band_us}")
    rb = F.expr(f"unix_micros({right_ts}) DIV {band_us}")
    l = left.withColumn(
        "__b", F.explode(F.array(lb - 1, lb, lb + 1)))
    r = right.withColumn("__b", rb)
    joined = l.join(r, on=[key, "__b"], how="inner").filter(
        F.abs(F.unix_micros(F.col(left_ts))
              - F.unix_micros(F.col(right_ts))) <= band_us)
    return joined.drop("__b")
