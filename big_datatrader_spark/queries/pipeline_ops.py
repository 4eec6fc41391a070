"""Round-2 pipeline operators: incremental (new-batch-vs-store) dedup,
df-capped n-gram Jaccard, skew-safe aggregation — the day-2 operations a
100 TB training-data pipeline runs on every ingest, beyond the one-shot
whole-corpus dedup ladder in ``llm_dedup``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import dedup as DD
from ..sources.parquet_source import table
from . import query
from .llm_dedup import _SHINGLES, _TOKS

NGRAM_MAX_DF = 5


@query(
    "dedup_ngram_jaccard_capped",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh0 AS (SELECT doc_id, unnest({_SHINGLES}) AS s FROM toks),
    sh AS (SELECT doc_id, s FROM (
             SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df_s
             FROM sh0)
           WHERE df_s <= {NGRAM_MAX_DF}),
    counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           ROUND(CAST(n_common AS DOUBLE)
                 / (ca.n_sh + cb.n_sh - n_common), 6) AS jaccard
    FROM pairs
    JOIN counts ca ON doc_a = ca.doc_id
    JOIN counts cb ON doc_b = cb.doc_id
    WHERE CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common)
          >= 0.8
    """,
    doc=f"n-gram Jaccard near-dup pairs with a document-frequency cutoff"
        f" (shingles in > {NGRAM_MAX_DF} docs dropped before the "
        "self-join): bounds the inverted-index join's df(s)^2 blow-up "
        "on boilerplate text — the production-scale guard the uncapped "
        "variant documents",
)
def dedup_ngram_jaccard_capped(spark, sf_dir):
    return DD.ngram_jaccard_pairs(
        table(spark, sf_dir, "documents"), n=3, threshold=0.8,
        max_df=NGRAM_MAX_DF)
