"""Tests for the distributed global rank and the integer-exact Gram
matrix kernel."""

import numpy as np

from pyspark.sql import functions as F

from big_datatrader_spark.functions import similarity as SIM
from big_datatrader_spark.operators.ranking import global_rank
from big_datatrader_spark.sources.parquet_source import table


def test_global_rank_equals_single_partition_row_number(spark, sf0001):
    docs = table(spark, sf0001, "documents").select("doc_id")
    h = F.md5(F.concat(F.lit("s:"), F.col("doc_id").cast("string")))
    got = {
        r.doc_id: r.rank
        for r in global_rank(
            docs.withColumn("__h", h),
            bucket=F.substring("__h", 1, 2),
            order_cols=[F.col("__h"), F.col("doc_id")]).collect()
    }
    from pyspark.sql import Window
    naive = {
        r.doc_id: r.rank
        for r in docs.withColumn("__h", h).withColumn(
            "rank", F.row_number().over(
                Window.orderBy(F.col("__h"), F.col("doc_id")))).collect()
    }
    assert got == naive
    assert sorted(got.values()) == list(range(1, len(got) + 1))


def test_global_rank_partition_invariant(spark, sf0001):
    docs = table(spark, sf0001, "documents").select("doc_id")
    outs = []
    for p in (1, 7):
        ranked = global_rank(
            docs.repartition(p).withColumn("__b", F.col("doc_id") % 5),
            bucket=F.col("__b"),
            order_cols=[F.col("doc_id")])
        outs.append(sorted(map(tuple, ranked.collect())))
    assert outs[0] == outs[1]


def test_gram_matrix_matches_numpy_and_partitioning(spark, sf0001):
    emb = table(spark, sf0001, "embeddings")
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    V = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    P = V[:, :, None] * V[:, None, :] * 1e8
    exact = (np.floor(np.abs(P) + 0.5) * np.sign(P)).astype(
        np.int64).sum(axis=0)

    for parts in (1, 13):
        got = {(r.i, r.j): r.sum_scaled
               for r in SIM.gram_matrix_micro(
                   emb.repartition(parts), vec_col="embedding",
                   dim=64).collect()}
        assert len(got) == 64 * 65 // 2
        for (i, j), s in got.items():
            assert s == exact[i, j], (i, j, parts)


def test_ntile_closed_form_matches_spark_ntile_many_shapes(spark):
    """Property check of operators/ranking.ntile_from_rank: for a sweep
    of (n, k) shapes — including n<k, n=k, remainders 1 and k-1 — the
    closed form must reproduce Spark's real ntile() bit for bit."""
    from pyspark.sql import Window, functions as F
    from big_datatrader_spark.operators.ranking import ntile_from_rank

    for n, k in [(1, 10), (5, 10), (10, 10), (11, 10), (19, 10),
                 (20, 10), (150, 10), (7, 3), (8, 3), (9, 3), (100, 7)]:
        df = spark.range(1, n + 1).select(
            F.col("id").alias("r"), F.lit(n).alias("n"))
        w = Window.orderBy("r")
        got = df.select(
            "r", ntile_from_rank(F.col("r"), F.col("n"), k).alias("mine"),
            F.ntile(k).over(w).cast("bigint").alias("real")).collect()
        for row in got:
            assert row.mine == row.real, (n, k, row.r)


def test_ntile_closed_form_exact_past_double_precision(spark):
    """The integer-DIV formulation must place ranks correctly at
    magnitudes where double arithmetic rounds: n near 2^60, ranks at
    tile boundaries that (r / (q+1)) computed in doubles would
    mis-bucket."""
    from pyspark.sql import functions as F
    from big_datatrader_spark.operators.ranking import ntile_from_rank

    n, k = (1 << 60) + 3, 10          # q = n DIV k, rem = 3
    q, rem = n // k, n % k
    cases = []                         # (rank, expected tile)
    for t in range(1, k + 1):
        hi = t * (q + 1) if t <= rem else rem * (q + 1) + (t - rem) * q
        lo = hi - ((q + 1) if t <= rem else q) + 1
        cases += [(lo, t), (hi, t)]
    df = spark.createDataFrame([(r,) for r, _ in cases], "r long")
    got = {row.r: row.tile for row in df.select(
        "r", ntile_from_rank(F.col("r"), F.lit(n), k).alias("tile"))
        .collect()}
    for r, tile in cases:
        assert got[r] == tile, (r, tile, got[r])
