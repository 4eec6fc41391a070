"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast join of the (small)
query set against the corpus, dot products via higher-order functions
(zip_with + aggregate), entirely JVM-side. At 100 TB the corpus side
stays partitioned; only the query vectors move.

Scale path: LSH bucketing via md5-derived random hyperplanes — both the
plane weights and the bucketing are deterministic expressions, so
results are reproducible and (if desired) oracle-checkable. Candidates
are pairs in the same bucket: the cross product collapses to per-bucket
joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .dedup import h60


def as_double(vec: Column) -> Column:
    """float -> double before any arithmetic: both engines then compute
    identical IEEE sums in array order."""
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def brute_force_topk(df: DataFrame, *, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     query_ids: list[int], k: int = 5) -> DataFrame:
    """Exact top-k neighbors (by cosine) for each query id.

    Deterministic ranking: order by rounded cosine desc, then neighbor
    id — float last-ulp noise cannot flip ranks across engines.
    """
    base = df.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"))
    cand = (
        F.broadcast(q).join(
            base.select(F.col(id_col).alias("neighbor_id"), "v"),
            F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_sim", F.round(cosine("qv", "v"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim",
                F.col("rank").cast("long").alias("rank"))
    )


def hyperplane(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane: weights in [-1, 1] derived
    from md5(plane:d) — reproducible on any engine."""
    return F.array(*[
        ((h60(F.lit(f"hp{plane}:{d}")) % 2001) - 1000).cast("double")
        / 1000.0
        for d in range(dim)
    ])


def lsh_bucket(vec: Column, planes: int, dim: int) -> Column:
    """Sign-bit bucket id from ``planes`` hyperplanes."""
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        bit = F.when(dot(vec, hyperplane(p, dim)) > 0,
                     F.lit(1 << p).cast("long")).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def lsh_topk(df: DataFrame, *, id_col: str = "vec_id",
             vec_col: str = "embedding", dim: int,
             query_ids: list[int], k: int = 5,
             planes: int = 4) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket. Recall vs brute force is property-tested, not oracled —
    the approximation is the point."""
    base = df.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("v")
    ).withColumn("bucket", lsh_bucket(F.col("v"), planes, dim))
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"))
    cand = (
        F.broadcast(q).join(
            base.select(F.col(id_col).alias("neighbor_id"), "v", "bucket"),
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("query_id") != F.col("neighbor_id")))
        .withColumn("cosine_sim", F.round(cosine("qv", "v"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim",
                F.col("rank").cast("long").alias("rank"))
    )


def ivf_topk(df: DataFrame, *, id_col: str = "vec_id",
             vec_col: str = "embedding", query_ids: list[int],
             k: int = 5, n_lists: int = 8,
             n_probe: int = 2) -> DataFrame:
    """IVF (inverted-file) approximate top-k.

    Coarse quantizer: the first ``n_lists`` vectors of the corpus serve
    as deterministic centroids (a k-means fit would slot in here — the
    assignment/search structure is identical). Every vector is assigned
    to its nearest centroid; a query probes its ``n_probe`` nearest
    lists. At corpus scale the corpus side is partitioned by list id, so
    a probe touches n_probe/n_lists of the data instead of all of it.
    """
    base = df.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    cents = (base.filter(F.col(id_col) < n_lists)
             .select(F.col(id_col).alias("list_id"),
                     F.col("v").alias("cv")))
    # assign every vector to its nearest centroid (broadcast centroids,
    # one pass, no shuffle of the corpus)
    assigned = (
        base.join(F.broadcast(cents))
        .withColumn("d", F.round(cosine("v", "cv"), 9))
        .withColumn("rk", F.row_number().over(
            Window.partitionBy(id_col).orderBy(F.desc("d"),
                                               F.asc("list_id"))))
    )
    corpus = assigned.filter(F.col("rk") == 1).select(
        F.col(id_col).alias("neighbor_id"), "v", "list_id")
    probes = assigned.filter(
        F.col(id_col).isin(query_ids) & (F.col("rk") <= n_probe)
    ).select(F.col(id_col).alias("query_id"), F.col("v").alias("qv"),
             "list_id")
    cand = (
        F.broadcast(probes).join(corpus, on="list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_sim", F.round(cosine("qv", "v"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim",
                F.col("rank").cast("long").alias("rank"))
    )


def embedding_near_dup_pairs(df: DataFrame, *, id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             block_col: str | None = None,
                             threshold: float = 0.4) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine >= t),
    optionally blocked on a coarse key (label, LSH bucket, ...) so the
    join is per-block instead of all-pairs."""
    base = df.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("v"),
        *([F.col(block_col)] if block_col else []))
    a, b = base.alias("a"), base.alias("b")
    cond = F.col("a." + id_col) < F.col("b." + id_col)
    if block_col:
        cond = cond & (F.col("a." + block_col) == F.col("b." + block_col))
    return (
        a.join(b, cond)
        .withColumn("cosine_sim",
                    F.round(cosine(F.col("a.v"), F.col("b.v")), 6))
        .filter(F.col("cosine_sim") >= threshold)
        .select(F.col("a." + id_col).alias("id_a"),
                F.col("b." + id_col).alias("id_b"),
                *([F.col("a." + block_col).alias(block_col)]
                  if block_col else []),
                "cosine_sim")
    )
