"""Similarity-search queries over the embeddings table: brute-force
cosine top-k (exact baseline, full oracle) and the LSH-bucketed variant
(approximate scale path — rows-only check; recall is property-tested in
tests/test_llm_ops.py against the brute-force result).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import similarity as SIM
from ..sources.parquet_source import table
from . import query

QUERY_IDS = [0, 1, 2, 3, 4]
K = 5
DIM = 64
PLANES = 4
TABLES = 8

_COS = ("list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])"
        " / (sqrt(list_dot_product(q.embedding::DOUBLE[],"
        " q.embedding::DOUBLE[]))"
        " * sqrt(list_dot_product(c.embedding::DOUBLE[],"
        " c.embedding::DOUBLE[])))")


@query(
    "ann_bruteforce_topk",
    oracle=f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND({_COS}, 6) AS cosine_sim
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id IN ({", ".join(map(str, QUERY_IDS))})),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine_sim DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, cosine_sim, rank
    FROM ranked WHERE rank <= {K}
    """,
    doc="exact cosine top-k: broadcast query set x partitioned corpus, "
        "dot products via zip_with/aggregate (JVM-side); ranking on "
        "rounded similarity for cross-engine determinism",
    bench=True,
)
def ann_bruteforce_topk(spark, sf_dir):
    return SIM.brute_force_topk(
        table(spark, sf_dir, "embeddings"),
        query_ids=QUERY_IDS, k=K)


@query(
    "ann_lsh_topk",
    oracle=None,
    doc=f"approximate top-k via multi-table random-hyperplane LSH "
        f"({TABLES} tables x {PLANES} planes, md5-derived "
        "deterministic weights); a vector is a candidate if it "
        "collides with the query in ANY table, deduped before "
        "scoring — the corpus-scale path. Recall vs brute force is "
        "property-tested (>=15/25 at sf0.001).",
)
def ann_lsh_topk(spark, sf_dir):
    return SIM.lsh_topk(
        table(spark, sf_dir, "embeddings"),
        dim=DIM, query_ids=QUERY_IDS, k=K, planes=PLANES,
        tables=TABLES)


@query(
    "ann_ivf_topk",
    oracle=None,
    doc="approximate top-k via IVF: coarse centroids from a "
        "deterministic distributed Lloyd k-means fit (3 iterations, "
        "broadcast centroids, one corpus pass each), corpus "
        "partitioned by inverted list, queries probe their 2 nearest "
        "lists — the partition-pruning ANN path at corpus scale. "
        "Recall vs brute force is property-tested (>=15/25).",
)
def ann_ivf_topk(spark, sf_dir):
    return SIM.ivf_topk(
        table(spark, sf_dir, "embeddings"),
        query_ids=QUERY_IDS, k=K, n_lists=8, n_probe=2, fit_iters=3)


@query(
    "embedding_norms",
    oracle="""
    SELECT vec_id, label,
           ROUND(sqrt(list_dot_product(embedding::DOUBLE[],
                                       embedding::DOUBLE[])), 6) AS l2,
           ROUND(list_sum(embedding::DOUBLE[]), 6) AS comp_sum
    FROM embeddings
    """,
    doc="vector-column arithmetic via higher-order functions (norms, "
        "component sums) — the building blocks of similarity ops",
)
def embedding_norms(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    v = SIM.as_double(F.col("embedding"))
    return emb.select(
        "vec_id", "label",
        F.round(SIM.norm(v), 6).alias("l2"),
        F.round(F.aggregate(v, F.lit(0.0), lambda a, x: a + x), 6)
         .alias("comp_sum"),
    )


@query(
    "embedding_gram_matrix",
    oracle="""
    WITH el AS (
      SELECT vec_id, unnest(embedding) AS x,
             unnest(generate_series(1, len(embedding))) AS pos
      FROM embeddings
    ), g AS (
      SELECT a.pos - 1 AS i, b.pos - 1 AS j,
             CAST(sum(CAST(ROUND(CAST(a.x AS DOUBLE)
                  * CAST(b.x AS DOUBLE) * 100000000) AS BIGINT))
                  AS BIGINT) AS sum_scaled
      FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.pos <= b.pos
      GROUP BY 1, 2
    )
    SELECT CAST(g.i AS BIGINT) AS i, CAST(g.j AS BIGINT) AS j,
           g.sum_scaled,
           ROUND(g.sum_scaled / (n.cnt * 100000000.0), 6) AS mean_prod
    FROM g, (SELECT count(*) AS cnt FROM embeddings) n
    ORDER BY i, j
    """,
    doc="distributed Gram / second-moment matrix of the embedding "
        "column (the aggregation inside covariance-PCA / whitening "
        "fits): per-partition integer partial sums via mapInPandas, "
        "one d^2-sized shuffle — the corpus itself never moves. "
        "Per-product micro-rounding makes the matrix bit-exact and "
        "order-independent (hash oracle on 64x65/2 cells)",
)
def embedding_gram_matrix(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    gram = SIM.gram_matrix_micro(emb, vec_col="embedding", dim=DIM)
    cnt = emb.agg(F.count(F.lit(1)).alias("cnt"))
    return (
        gram.join(F.broadcast(cnt))
        .select("i", "j", "sum_scaled",
                F.round(F.col("sum_scaled")
                        / (F.col("cnt") * 100000000.0), 6)
                .alias("mean_prod"))
        .orderBy("i", "j")
    )
