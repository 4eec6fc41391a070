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

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window, functions as F


def as_double(vec: Column) -> Column:
    """float -> double before any arithmetic: both engines then compute
    identical IEEE sums in array order."""
    return F.transform(vec, lambda x: x.cast("double"))


# Shared exact-integer quantization of the embeddings table: one scale
# and ONE (vec_id, i, q) construction for every query that needs exact
# BIGINT distances (kmeans assign/refine, the IVF recall audit), so
# the quantization convention (1e-6 units, half-away rounding, 1-based
# dim index) can never drift between a Spark plan and its oracle.
QUANT_SCALE = 1_000_000

# DuckDB twin: drop into an oracle as `iv AS ({QUANT_IV_SQL})`.
QUANT_IV_SQL = f"""
      SELECT vec_id, i,
             CAST(ROUND(CAST(e AS DOUBLE) * {QUANT_SCALE}) AS BIGINT)
                 AS q
      FROM (SELECT vec_id, unnest(embedding) AS e,
                   unnest(generate_series(1, len(embedding))) AS i
            FROM embeddings)"""


def quantized_components(emb: DataFrame) -> DataFrame:
    """(vec_id, i, q) rows: 1-based dimension index, component in
    exact QUANT_SCALE units (BIGINT)."""
    return (emb.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("p", "e"))
        .select("vec_id", (F.col("p") + 1).alias("i"),
                F.round(F.col("e").cast("double") * QUANT_SCALE)
                .cast("bigint").alias("q")))


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


def _h60_py(s: str) -> int:
    """Python twin of ``dedup.h60`` (first 60 bits of md5) — identical
    values, so plane weights derived here match what the engine-side
    expression would produce."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def hyperplane_weights(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: weights in [-1, 1]
    derived from md5(plane:d) — reproducible anywhere."""
    return [((_h60_py(f"hp{plane}:{d}") % 2001) - 1000) / 1000.0
            for d in range(dim)]


def lsh_buckets_udf(planes: int, dim: int, tables: int):
    """Arrow-batched kernel computing ALL tables' sign-LSH bucket ids
    in one numpy matmul per batch: V(batch x dim) @ W.T(dim x P) ->
    sign bits -> ``tables`` packed bucket ids.

    Why a pandas UDF and not built-ins: the expression alternatives
    either run interpreted per row (zip_with/aggregate lambdas) or blow
    past the codegen size limit when unrolled (32 planes x 64 dims
    disables WholeStageCodegen outright) — measured 10x slower than
    this batched matmul. One projection, no shuffle, linear scans at
    any scale.
    """
    W = np.array([hyperplane_weights(p, dim)
                  for p in range(tables * planes)])  # (P, dim)
    bits = (1 << np.arange(planes, dtype=np.int64))

    @F.pandas_udf("array<long>")
    def buckets(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        V = np.vstack(vs.to_numpy())            # (n, dim)
        S = (V @ W.T) > 0                       # (n, P) sign bits
        B = (S.reshape(len(V), tables, planes) * bits).sum(axis=2)
        return pd.Series(list(B.astype(np.int64)))

    return buckets


def lsh_topk(df: DataFrame, *, id_col: str = "vec_id",
             vec_col: str = "embedding", dim: int,
             query_ids: list[int], k: int = 5,
             planes: int = 4, tables: int = 1) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket(s). Recall vs brute force is property-tested, not oracled —
    the approximation is the point.

    ``tables`` > 1 is the standard multi-table LSH recall lever: each
    table uses an independent set of ``planes`` hyperplanes (table t
    takes plane indices [t*planes, (t+1)*planes)), and a vector is a
    candidate if it collides with the query in ANY table. Recall rises
    roughly as 1-(1-p^planes)^tables while each table's bucket stays
    selective — at corpus scale the candidate set is still a tiny
    per-bucket slice, just unioned ``tables`` times (then deduped
    before scoring, so no pair is scored twice)."""
    bucketer = lsh_buckets_udf(planes, dim, tables)
    base = df.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("v")
    ).select(
        id_col, "v",
        F.posexplode(bucketer(F.col("v"))).alias("tbl", "bucket"))
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"),
        F.col("tbl").alias("qtbl"), F.col("bucket").alias("qbucket"))
    cand = (
        F.broadcast(q).join(
            base.select(F.col(id_col).alias("neighbor_id"), "v",
                        "tbl", "bucket"),
            (F.col("tbl") == F.col("qtbl"))
            & (F.col("bucket") == F.col("qbucket"))
            & (F.col("query_id") != F.col("neighbor_id")))
        .dropDuplicates(["query_id", "neighbor_id"])
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


def ranked_lists_udf(cents: list[list[float]]):
    """Arrow-batched kernel ranking every centroid for each vector:
    cosine against all ``len(cents)`` centroids via one numpy matmul
    per batch, returned as an array of list_ids ordered nearest-first
    (cosine rounded to 1e-9 desc, list_id asc tie-break via stable
    argsort). A per-row argmax with NO join and NO shuffle of the
    corpus — the join+row_number formulation shuffles
    n_lists x corpus rows; this touches each row once. Same
    pandas-UDF-over-built-ins rationale as ``lsh_buckets_udf``."""
    C = np.array(cents)                          # (L, dim)
    Cn = np.sqrt((C * C).sum(axis=1))

    @F.pandas_udf("array<long>")
    def ranked(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        V = np.vstack(vs.to_numpy())             # (n, dim)
        Vn = np.sqrt((V * V).sum(axis=1))
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = (V @ C.T) / (Vn[:, None] * Cn[None, :])
        cos = np.round(np.where(np.isfinite(cos), cos, -np.inf), 9)
        order = np.argsort(-cos, axis=1, kind="stable")  # (n, L)
        return pd.Series(list(order.astype(np.int64)))

    return ranked


def fit_centroids(base: DataFrame, *, id_col: str, n_lists: int,
                  n_iter: int = 3) -> list[list[float]]:
    """Deterministic Lloyd k-means fit for the IVF coarse quantizer.

    Seeds from the first ``n_lists`` vectors (by id), then runs
    ``n_iter`` Lloyd iterations: assign every vector to its
    nearest-by-cosine centroid (constant-unrolled argmax — the corpus
    never shuffles), recompute each centroid as the component mean of
    its list. The only shuffle per iteration is the (list_id, pos)
    partial-aggregate fan-in — n_lists * dim cells, which live on the
    driver between passes as model state (exactly how MLlib's k-means
    iterates at any scale). Components are rounded to 1e-6 so fp
    summation order can never make two fits diverge; a list that loses
    all members keeps its previous centroid (no empty-cluster
    collapse).
    """
    cents = [
        list(r[1])
        for r in (base.filter(F.col(id_col) < n_lists)
                  .select(id_col, "v").orderBy(id_col).collect())
    ]
    for _ in range(n_iter):
        ranker = ranked_lists_udf(cents)
        assigned = base.select(
            F.element_at(ranker(F.col("v")), 1).alias("list_id"), "v")
        means = (
            assigned.select("list_id", F.posexplode("v")
                            .alias("pos", "val"))
            .groupBy("list_id", "pos")
            .agg(F.round(F.avg("val"), 6).alias("m"))
            .groupBy("list_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m")))
                 .alias("entries"))
            .select("list_id",
                    F.transform("entries", lambda e: e["m"]).alias("cv"))
            .collect()
        )
        updated = {int(r.list_id): list(r.cv) for r in means}
        cents = [updated.get(i, v) for i, v in enumerate(cents)]
    return cents


def ivf_topk(df: DataFrame, *, id_col: str = "vec_id",
             vec_col: str = "embedding", query_ids: list[int],
             k: int = 5, n_lists: int = 8,
             n_probe: int = 2, fit_iters: int = 3) -> DataFrame:
    """IVF (inverted-file) approximate top-k.

    Coarse quantizer: centroids from a deterministic Lloyd k-means fit
    (``fit_centroids``; ``fit_iters=0`` keeps the first-``n_lists``
    seed vectors). Every vector is assigned to its nearest centroid via
    a constant-unrolled per-row argmax (one corpus pass, no shuffle); a
    query probes its ``n_probe`` nearest lists. At corpus scale the
    corpus side is partitioned by list id, so a probe touches
    n_probe/n_lists of the data instead of all of it.
    """
    base = df.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    cents = fit_centroids(base, id_col=id_col, n_lists=n_lists,
                          n_iter=fit_iters)
    ranker = ranked_lists_udf(cents)
    ranked = base.select(id_col, "v", ranker(F.col("v")).alias("__lists"))
    corpus = ranked.select(
        F.col(id_col).alias("neighbor_id"), "v",
        F.element_at("__lists", 1).alias("list_id"))
    probes = (
        ranked.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"),
                F.col("v").alias("qv"),
                F.explode(F.slice("__lists", 1, n_probe))
                .alias("list_id"))
    )
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


def gram_matrix_micro(df: DataFrame, *, vec_col: str = "embedding",
                      dim: int, scale: int = 100_000_000) -> DataFrame:
    """Distributed Gram (second-moment) matrix of an embedding column:
    (i, j, sum_scaled) for the upper triangle i <= j, where sum_scaled
    = Σ_rows round(x_i * x_j * scale) as int64.

    The mapInPandas kernel computes per-PARTITION partial integer sums
    (one numpy outer-product pass, chunked to bound memory) and emits
    dim*(dim+1)/2 rows per partition; the only shuffle is the final
    groupBy over those tiny partials — the map-side-combine shape of a
    distributed X^T X (how a covariance/PCA fit touches 100 TB: the
    data never moves, only d^2-sized partials do). Per-product rounding
    to 1/scale units makes the result EXACTLY independent of row order
    and partitioning, hence oracle-checkable bit-for-bit.
    """
    import numpy as np
    import pandas as pd

    iu = np.triu_indices(dim)

    def parts(batches):
        acc = np.zeros((dim, dim), dtype=np.int64)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            V = np.vstack(pdf["__v"].to_numpy()).astype(np.float64)
            for s in range(0, len(V), 256):
                X = V[s:s + 256]
                P = X[:, :, None] * X[:, None, :] * float(scale)
                acc += (np.floor(np.abs(P) + 0.5)
                        * np.sign(P)).astype(np.int64).sum(axis=0)
        if seen:
            yield pd.DataFrame({
                "i": iu[0].astype("int64"), "j": iu[1].astype("int64"),
                "part": acc[iu]})

    partials = df.select(
        as_double(F.col(vec_col)).alias("__v")
    ).mapInPandas(parts, schema="i long, j long, part long")
    return (partials.groupBy("i", "j")
            .agg(F.sum("part").cast("bigint").alias("sum_scaled")))
