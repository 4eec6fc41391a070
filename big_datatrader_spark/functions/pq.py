"""Product-quantization codebook training (Jégou et al. 2011 §III):
independent Lloyd k-means per subspace, in EXACT integer arithmetic.

Everything here operates on 1e-6-unit quantized components
(``array<bigint>``, the queries/vector_ops convention), so the fit is
bit-reproducible across engines, partitionings, and rounds:

- distances are exact BIGINT L2^2 sums;
- argmin ties break to the lowest codeword id (numpy ``argmin`` takes
  the first occurrence);
- the centroid update rounds the exact rational mean sum/count to the
  nearest integer, half away from zero, via the pure-integer formula
      s >= 0:  (2*s + c) DIV (2*c)
      s <  0: -((2*(-s) + c) DIV (2*c))
  which a SQL oracle can replay verbatim (both operands non-negative,
  so truncating and flooring division agree on every engine);
- a codeword whose cluster goes empty keeps its previous value (no
  empty-cluster collapse), mirroring functions/similarity.fit_centroids.

Scale shape (the MLlib iteration pattern): the corpus NEVER shuffles —
assignment is an Arrow-batched projection against the broadcast
codebook (M*K*sub integer cells, ~KB); the only movement per iteration
is the (m, code, si) -> (sum, count) partial-aggregate fan-in, M*K*sub
rows regardless of corpus size. Driver state between passes is the
codebook itself.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def round_div_half_away(s: int, c: int) -> int:
    """Nearest-integer s/c, half away from zero, exact (c > 0)."""
    if s >= 0:
        return (2 * s + c) // (2 * c)
    return -((2 * (-s) + c) // (2 * c))


def pq_assign_udf(codebooks: list[list[list[int]]]):
    """Arrow-batched kernel: quantized vector -> per-subspace
    ``array<struct<code, dist>>`` (nearest codeword id + its exact
    BIGINT L2^2) against the broadcast codebook. One corpus pass, no
    join, no shuffle — the join+row_number formulation shuffles
    corpus x K rows; this touches each row once."""
    CB = np.asarray(codebooks, dtype=np.int64)        # (M, K, sub)
    M, _K, S = CB.shape

    @F.pandas_udf("array<struct<code: bigint, dist: bigint>>")
    def assign(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        V = np.vstack(vs.to_numpy()).astype(np.int64)  # (n, M*S)
        V = V.reshape(len(vs), M, 1, S)
        diff = V - CB[None, :, :, :]                   # (n, M, K, S)
        d = (diff * diff).sum(axis=-1)                 # (n, M, K)
        codes = d.argmin(axis=-1)                      # ties -> lowest
        dists = np.take_along_axis(d, codes[:, :, None], axis=-1)[:, :, 0]
        return pd.Series([
            [(int(codes[i, m]), int(dists[i, m])) for m in range(M)]
            for i in range(len(vs))
        ])

    return assign


def fit_pq_codebooks(emb_q: DataFrame, *, m: int, sub: int, k: int,
                     n_iter: int) -> list[list[list[int]]]:
    """Deterministic per-subspace Lloyd fit.

    ``emb_q``: (vec_id, qv array<bigint>) with len(qv) == m * sub.
    Seeds subspace ``j``'s codebook from the ``j``-th subvectors of the
    first ``k`` vectors (by vec_id), then runs ``n_iter`` iterations of
    assign (projection, above) + exact integer mean update. Returns the
    nested [m][k][sub] integer codebook.
    """
    seed = (emb_q.filter(F.col("vec_id") < k)
            .select("vec_id", "qv").orderBy("vec_id").collect())
    cbs = [[[int(v) for v in r.qv[j * sub:(j + 1) * sub]] for r in seed]
           for j in range(m)]
    for _ in range(n_iter):
        assign = pq_assign_udf(cbs)
        stats = (
            emb_q.select("vec_id", assign(F.col("qv")).alias("asgn"), "qv")
            .select(F.posexplode("qv").alias("p", "q"), "asgn")
            .select(
                F.expr(f"p DIV {sub}").alias("m"),
                (F.col("p") % sub).alias("si"),
                F.element_at(
                    "asgn",
                    F.expr(f"CAST(p DIV {sub} AS INT) + 1"))["code"]
                .alias("code"),
                "q")
            .groupBy("m", "code", "si")
            .agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("c"))
            .collect())
        upd = {(int(r.m), int(r.code), int(r.si)):
               round_div_half_away(int(r.s), int(r.c)) for r in stats}
        cbs = [[[upd.get((j, code, si), cbs[j][code][si])
                 for si in range(sub)]
                for code in range(k)]
               for j in range(m)]
    return cbs
