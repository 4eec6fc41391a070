"""Round-11 operator tests: the ngram pair blow-up audit must PREDICT
the exact-Jaccard posting-list join's cardinality exactly (VERDICT r10
ask #5 — the edit1_pair_blowup_audit discipline applied to the ngram
family).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_datatrader_spark.functions import dedup as DD
from big_datatrader_spark.queries import load_registry
from big_datatrader_spark.sources.parquet_source import table

REG = load_registry()


def test_ngram_blowup_audit_predicts_the_join_exactly(spark, sf0001):
    """join_rows_predicted = sum over shingles of C(df_s, 2) must equal
    the ACTUAL row count the inverted-index self-join materializes
    before the pair groupBy — over the SAME rep/shingle relations the
    scorer (ngram_jaccard_pairs_collapsed) consumes. If the audit ever
    profiled a different candidate set (different rep choice, different
    shingle universe), a boilerplate-driven df^2 blow-up would sail
    past the pre-flight and commit the shuffle it exists to prevent."""
    prof = REG["ngram_pair_blowup_audit"].spark_fn(
        spark, sf0001).collect()[0]
    docs = table(spark, sf0001, "documents")
    _, gr, reps = DD.rep_relations(docs)
    sh = DD._capped_shingles(reps.select("doc_id", "text"),
                             text_col="text", id_col="doc_id",
                             n=3, max_df=None)
    a, b = sh.alias("a"), sh.alias("b")
    actual = a.join(b, (F.col("a.s") == F.col("b.s"))
                    & (F.col("a.doc_id") < F.col("b.doc_id"))).count()
    assert prof["join_rows_predicted"] == actual
    # internal consistency of the profile itself
    assert prof["n_texts"] == gr.count()
    assert prof["n_postings"] == sh.count()
    assert prof["n_shingles"] == sh.select("s").distinct().count()
    assert 1 <= prof["max_df"] <= prof["n_texts"]
    assert prof["top_shingle_rows"] <= prof["join_rows_predicted"]


def test_ngram_blowup_audit_invariant_under_duplication(spark, sf0001):
    """The audit's stats are at distinct-text grain: doubling the
    corpus with verbatim copies (shifted ids so the copies are new
    rows) must leave every column except nothing — identical profile —
    because reps collapse to the same representatives. This is the
    100 TB property: the pre-flight's cost and output do not grow with
    copy-count, only with distinct content."""
    docs = table(spark, sf0001, "documents")
    shift = 10_000_000
    doubled = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + shift))

    def profile(d):
        _, gr, reps = DD.rep_relations(d)
        sh = DD._capped_shingles(reps.select("doc_id", "text"),
                                 text_col="text", id_col="doc_id",
                                 n=3, max_df=None)
        dfs = sh.groupBy("s").agg(
            F.count(F.lit(1)).cast("long").alias("df_s"))
        pair_rows = F.expr("df_s * (df_s - 1) DIV 2")
        return dfs.agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum("df_s").alias("n_postings"),
            F.max("df_s").alias("max_df"),
            F.sum(pair_rows).alias("join_rows_predicted")).collect()[0]

    assert profile(docs) == profile(doubled)
