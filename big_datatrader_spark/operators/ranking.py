"""Distributed global ranking: a total row-number without a
single-partition sort.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY collapses to
ONE task in Spark — the classic accidental scale-killer. The standard
two-phase fix implemented here:

1. rank locally inside a coarse bucket that is a PREFIX of the global
   order (so bucket order == global order between buckets), then
2. add per-bucket offsets (the running sum of bucket counts — a few
   hundred rows, computed once and broadcast).

Wall-clock cost at any scale: one hash exchange on the bucket key plus
a broadcast of #buckets rows. The driving use case is the training-data
global shuffle: give every document a reproducible pseudo-random
position (ORDER BY md5(seed || id)) so shards stream in shuffled order
without ever materializing a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def global_rank(df: DataFrame, bucket: Column,
                order_cols: list[Column | str],
                rank_col: str = "rank") -> DataFrame:
    """Append ``rank_col``: the 1-based global row number under the
    total order (bucket ASC, *order_cols ASC).

    ``bucket`` MUST be a coarsening prefix of the intended order (all
    rows of bucket b sort before all rows of bucket b'>b); the caller
    owns that contract — e.g. bucket = substring(hash, 1, 2) when
    ordering by (hash, id).
    """
    b = df.withColumn("__bucket", bucket)
    w_in = Window.partitionBy("__bucket").orderBy(*order_cols)
    local = b.withColumn("__rn", F.row_number().over(w_in))
    w_off = (Window.orderBy("__bucket")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (
        b.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__cnt"))
        # the offsets relation is #buckets rows: the global window over
        # it is a one-task sort of a few hundred rows, then broadcast
        .withColumn("__off", F.coalesce(F.sum("__cnt").over(w_off),
                                        F.lit(0)))
        .select("__bucket", "__off")
    )
    return (
        local.join(F.broadcast(offsets), on="__bucket")
        .withColumn(rank_col, (F.col("__off") + F.col("__rn"))
                    .cast("long"))
        .drop("__bucket", "__rn", "__off")
    )


def ntile_from_rank(r: Column, n: Column, k: int) -> Column:
    """SQL-standard ntile(k) as a closed form of (global rank r, total
    count n): the first n%k tiles hold ceil(n/k) rows, the rest
    floor(n/k). With r from ``global_rank`` this reproduces the
    partition-less ``ntile() OVER (ORDER BY ...)`` bit-for-bit without
    its single-task sort."""
    # Pure integer arithmetic: the double-division formulation
    # (n / k).cast + F.ceil(r / (q + 1)) can mis-bucket once counts
    # approach 2^53 — a real magnitude for a global-rank operator.
    # a DIV b and ceil(a DIV b) = (a + b - 1) DIV b stay exact at any
    # scale (DECIMAL(38,0) intermediate, far past BIGINT).
    def idiv(a: Column, b: Column) -> Column:
        a = a.cast("decimal(38,0)")
        return ((a - a % b) / b).cast("bigint")

    q, rem = idiv(n, F.lit(k)), n % k
    big = rem * (q + 1)  # rows covered by the (q+1)-sized leading tiles
    return (F.when(r <= big, idiv(r + q, q + 1))
            .otherwise(rem + idiv(r - big + q - 1, q)).cast("bigint"))
