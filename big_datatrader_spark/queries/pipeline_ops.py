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
from .llm_dedup import (BANDS, NUM_HASHES, _SHINGLES, _TOKS,
                        _band_struct_sql, _h60, _minhash_sig_sql)

NGRAM_MAX_DF = 5

# The incoming-batch-vs-corpus split used by the incremental dedup
# queries: every 5th document is "today's ingest", the rest is the
# already-deduped corpus whose signature store is persisted.
_BATCH_SQL = "SELECT * FROM documents WHERE doc_id % 5 = 0"
_STORE_SQL = "SELECT * FROM documents WHERE doc_id % 5 <> 0"


def _split(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return (docs.filter(F.col("doc_id") % 5 == 0),
            docs.filter(F.col("doc_id") % 5 != 0))


@query(
    "incremental_dedup_exact",
    oracle=f"""
    WITH batch AS ({_BATCH_SQL}),
    store AS ({_STORE_SQL}),
    bfp AS (SELECT doc_id, md5(lower(trim(text))) AS fp FROM batch),
    sfp AS (SELECT DISTINCT md5(lower(trim(text))) AS fp FROM store)
    SELECT doc_id,
           CASE WHEN fp IN (SELECT fp FROM sfp) THEN 'drop_store'
                WHEN doc_id > min(doc_id) OVER (PARTITION BY fp)
                  THEN 'drop_batch'
                ELSE 'keep' END AS verdict
    FROM bfp
    """,
    doc="incremental exact dedup: verdict (keep / drop_store / "
        "drop_batch) per incoming document against a persisted "
        "fingerprint store — the daily-ingest shape of a training-data "
        "pipeline; only 16-byte fingerprints shuffle",
)
def incremental_dedup_exact(spark, sf_dir):
    batch, store = _split(spark, sf_dir)
    return DD.incremental_exact_dedup(batch, store)


def _sig_chain_sql(rel: str, prefix: str) -> str:
    """CTE chain rel -> band rows, mirroring minhash_signatures +
    band_rows bit-for-bit (shared h60 + affine-mix arithmetic)."""
    return f"""
    {prefix}toks AS (SELECT doc_id, {_TOKS} AS t FROM {rel}),
    {prefix}shing AS (SELECT doc_id, {_SHINGLES} AS sh FROM {prefix}toks),
    {prefix}hashes AS (SELECT doc_id,
                    list_transform(sh, s -> {_h60('s')} % {DD._MIX_P})
                      AS hs
               FROM {prefix}shing),
    {prefix}sigs AS (SELECT doc_id, {_minhash_sig_sql()} AS sig
                     FROM {prefix}hashes),
    {prefix}bands AS (
      SELECT doc_id, sig, unnest({_band_struct_sql()}, recursive := true)
      FROM {prefix}sigs)"""


@query(
    "incremental_dedup_minhash",
    oracle=f"""
    WITH batch AS ({_BATCH_SQL}),
    store AS ({_STORE_SQL}),
    {_sig_chain_sql('batch', 'b')},
    {_sig_chain_sql('store', 's')},
    cand AS (
      SELECT DISTINCT nb.doc_id AS batch_doc, st.doc_id AS store_doc,
             nb.sig AS sig_b, st.sig AS sig_s
      FROM bbands nb JOIN sbands st
        ON nb.band = st.band AND nb.bucket = st.bucket)
    SELECT batch_doc, store_doc,
           ROUND(CAST(len(list_filter(range(1, {NUM_HASHES + 1}),
                 i -> sig_b[i] = sig_s[i])) AS DOUBLE)
                 / {NUM_HASHES}.0, 6) AS est_jaccard
    FROM cand
    WHERE CAST(len(list_filter(range(1, {NUM_HASHES + 1}),
          i -> sig_b[i] = sig_s[i])) AS DOUBLE) / {NUM_HASHES}.0 >= 0.5
    """,
    doc="incremental MinHash+LSH dedup: incoming batch's band rows "
        "joined against the corpus's persisted signature store on "
        "(band, bucket) — each ingest costs O(batch), never a "
        "whole-corpus self-join",
)
def incremental_dedup_minhash(spark, sf_dir):
    batch, store = _split(spark, sf_dir)
    return DD.incremental_minhash_matches(
        batch, store, num_hashes=NUM_HASHES, bands=BANDS, threshold=0.5)


@query(
    "dedup_ngram_jaccard_capped",
    oracle=f"""
    WITH d0 AS (
      SELECT doc_id, text, md5(text) AS fp FROM documents
      WHERE len({_TOKS}) > 0),
    grp AS (SELECT fp, min(doc_id) AS rid FROM d0 GROUP BY 1),
    toks AS (
      SELECT g.rid AS doc_id, {_TOKS} AS t
      FROM grp g JOIN d0 d ON d.doc_id = g.rid),
    sh0 AS (SELECT doc_id, unnest({_SHINGLES}) AS s FROM toks),
    sh AS (SELECT doc_id, s FROM (
             SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df_s
             FROM sh0)
           WHERE df_s <= {NGRAM_MAX_DF}),
    counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    rpairs AS (
      SELECT doc_a, doc_b,
             ROUND(CAST(n_common AS DOUBLE)
                   / (ca.n_sh + cb.n_sh - n_common), 6) AS jaccard
      FROM pairs
      JOIN counts ca ON doc_a = ca.doc_id
      JOIN counts cb ON doc_b = cb.doc_id
      WHERE CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common)
            >= 0.8),
    diff AS (
      SELECT least(a.doc_id, b.doc_id) AS doc_a,
             greatest(a.doc_id, b.doc_id) AS doc_b, jaccard
      FROM rpairs
      JOIN grp ga ON ga.rid = rpairs.doc_a
      JOIN grp gb ON gb.rid = rpairs.doc_b
      JOIN d0 a ON a.fp = ga.fp
      JOIN d0 b ON b.fp = gb.fp),
    sfp AS (SELECT g.fp FROM grp g
            WHERE g.rid IN (SELECT DISTINCT doc_id FROM sh)),
    same AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(1.0 AS DOUBLE) AS jaccard
      FROM d0 a JOIN d0 b ON a.fp = b.fp AND a.doc_id < b.doc_id
      JOIN sfp ON sfp.fp = a.fp)
    SELECT doc_a, doc_b, jaccard FROM diff
    UNION ALL
    SELECT doc_a, doc_b, jaccard FROM same
    """,
    doc=f"n-gram Jaccard near-dup pairs with a document-frequency "
        f"cutoff (shingles in > {NGRAM_MAX_DF} DISTINCT TEXTS dropped "
        "before the self-join): bounds the inverted-index join's "
        "df(s)^2 blow-up on boilerplate text — the production-scale "
        "guard the uncapped variant documents. Round 9: df now counts "
        "distinct texts via the collapsed build "
        "(ngram_jaccard_pairs_collapsed), so the cap measures genuine "
        "boilerplate instead of copy-count — under the id-grain cap, "
        "sf1's 10 verbatim copies pushed EVERY shingle past the "
        "cutoff and the scale-path twin was measuring an empty "
        "result; same-text members pair at jaccard 1.0 while their "
        "representative keeps a surviving shingle",
    bench=True,
)
def dedup_ngram_jaccard_capped(spark, sf_dir):
    return DD.ngram_jaccard_pairs_collapsed(
        table(spark, sf_dir, "documents"), n=3, threshold=0.8,
        max_df=NGRAM_MAX_DF)
