"""Tests for the corpus-pipeline batch (queries/corpus_ops.py):
semantic invariants against independent pandas/python
reimplementations, plus plan-shape assertions for the scale-critical
queries (oracle parity is covered by tools/check_oracle.py and the
driver gate)."""

import itertools

import pandas as pd

from big_datatrader_spark.queries import load_registry
from big_datatrader_spark.sources.parquet_source import table

REG = load_registry()
SF = "/root/testdata/sf0.001"


def _docs_tokens(spark):
    pdf = table(spark, SF, "documents").select("doc_id", "source",
                                               "text").toPandas()
    pdf["toks"] = pdf.text.str.strip().str.lower().str.split()
    return pdf


def test_quality_filter_reason_consistent_with_kept(spark):
    out = REG["corpus_quality_filter"].spark_fn(spark, SF).toPandas()
    assert len(out) == 500
    assert ((out.reason == "ok") == out.kept).all()
    # every doc classified exactly once; fractions in range
    assert out.doc_id.is_unique
    assert out.top_token_frac.between(0, 1).all()


def test_cross_doc_repetition_bounds_and_self_grams(spark):
    out = REG["cross_doc_repetition"].spark_fn(spark, SF).toPandas()
    assert (out.n_shared <= out.n_grams).all()
    assert out.shared_frac.between(0, 1).all()
    # independent recount for one doc: distinct 5-grams
    pdf = _docs_tokens(spark)
    row = pdf.iloc[0]
    grams = {" ".join(row.toks[i:i + 5])
             for i in range(len(row.toks) - 4)}
    got = out[out.doc_id == row.doc_id].iloc[0]
    assert got.n_grams == len(grams)


def test_chunk_dedup_keeps_first_occurrence(spark):
    out = REG["chunk_dedup_substrings"].spark_fn(spark, SF).toPandas()
    pdf = _docs_tokens(spark).sort_values("doc_id")
    # python reimplementation: global first-occurrence over (doc, pos)
    seen, kept, total = set(), {}, {}
    for _, r in pdf.iterrows():
        toks = r.toks
        n = len(toks) // 8
        total[r.doc_id] = n
        k = 0
        for i in range(n):
            g = " ".join(toks[i * 8:(i + 1) * 8])
            if g not in seen:
                seen.add(g)
                k += 1
        kept[r.doc_id] = k
    got = dict(zip(out.doc_id, out.n_kept))
    assert got == kept
    assert dict(zip(out.doc_id, out.n_chunks)) == total


def test_sequence_packing_preserves_tokens_and_bounds_bins(spark):
    out = REG["sequence_packing_bins"].spark_fn(spark, SF).toPandas()
    pdf = _docs_tokens(spark)
    pdf["n_tok"] = pdf.toks.str.len()
    per_src = pdf.groupby("source").n_tok.sum()
    got = dict(zip(out.source, out.total_tokens))
    assert got == per_src.to_dict()
    # a bin holds at least one doc; fill < budget + max doc length
    max_doc = pdf.n_tok.max()
    assert (out.max_bin_tokens < 256 + max_doc).all()
    assert (out.n_bins >= 1).all()


def test_stratified_sample_rates_and_determinism(spark):
    out1 = REG["stratified_sample_events"].spark_fn(spark, SF).toPandas()
    out2 = REG["stratified_sample_events"].spark_fn(spark, SF).toPandas()
    pd.testing.assert_frame_equal(out1, out2)
    assert (out1.n_sampled <= out1.n_total).all()
    # 200-per-mille stratum samples more than 10-per-mille stratum
    r = dict(zip(out1.event_type, out1.n_sampled / out1.n_total))
    assert r["purchase"] > r["signup"]


def test_lang_mixture_rebalance_levels_counts(spark):
    out = REG["lang_mixture_rebalance"].spark_fn(spark, SF).toPandas()
    min_n = out.n_before.min()
    assert (out.n_after <= out.n_before).all()
    # every language lands near the rarest language's count
    assert (abs(out.n_after - min_n) <= 0.35 * min_n).all()


def test_triangle_count_matches_bruteforce(spark):
    out = REG["triangle_count_copurchase"].spark_fn(spark, SF).toPandas()
    li = table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey").toPandas()
    edges = set()
    for _, grp in li.groupby("l_orderkey"):
        for u, v in itertools.combinations(sorted(set(grp.l_partkey)), 2):
            edges.add((u, v))
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    # each triangle contributes exactly 1 to each corner via its
    # opposite edge, so this counts triangles-per-node
    per_node = {}
    for u, v in edges:
        for w in adj[u] & adj[v]:
            per_node[w] = per_node.get(w, 0) + 1
    top = sorted(per_node.items(), key=lambda t: (-t[1], t[0]))[:20]
    got = list(zip(out.part_key, out.n_triangles))
    assert got == top


def test_kmeans_assign_covers_all_vectors(spark):
    out = REG["embedding_kmeans_assign"].spark_fn(spark, SF).toPandas()
    total = table(spark, SF, "embeddings").count()
    assert out.n_vectors.sum() == total
    assert out.cluster.between(0, 7).all()
    assert (out.avg_sq_dist >= 0).all()


def test_scale_plans_no_cartesian_and_broadcast_mixture(spark):
    mix = REG["lang_mixture_rebalance"].spark_fn(spark, SF)
    plan = mix._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # thresholds broadcast
    tri = REG["triangle_count_copurchase"].spark_fn(spark, SF)
    tplan = tri._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in tplan
    assert "BroadcastNestedLoopJoin" not in tplan


def test_pipeline_funnel_consistent_with_stage_queries(spark):
    row = REG["corpus_dedup_pipeline"].spark_fn(spark, SF).collect()[0]
    assert (row.n_input >= row.n_quality >= row.n_exact
            >= row.n_final > 0)
    # stage 1 must equal the standalone quality filter's kept count
    qf = REG["corpus_quality_filter"].spark_fn(spark, SF).toPandas()
    assert row.n_quality == int(qf.kept.sum())
    assert row.n_input == len(qf)


def test_salted_agg_equals_plain_groupby(spark):
    from big_datatrader_spark.sources.parquet_source import table
    from pyspark.sql import functions as F
    got = {r.event_type: (r.n_events, r.sum_value) for r in
           REG["salted_hot_key_agg"].spark_fn(spark, SF).collect()}
    plain = {r.event_type: (r.n, r.s) for r in
             table(spark, SF, "events")
             .groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.sum(F.round(F.col("value") * 100)
                                .cast("bigint")).cast("double")
                          / 100.0, 6).alias("s"))
             .collect()}
    assert got == plain


def test_reservoir_exactly_k_per_group_and_stable(spark):
    out1 = REG["per_group_reservoir"].spark_fn(spark, SF).toPandas()
    out2 = REG["per_group_reservoir"].spark_fn(spark, SF).toPandas()
    pd.testing.assert_frame_equal(out1, out2)
    sizes = out1.groupby("lang").size()
    assert (sizes == 5).all()
    assert (out1.groupby("lang")["rank"].apply(
        lambda s: sorted(s) == [1, 2, 3, 4, 5])).all()


def test_streaming_topk_matches_batch_rank(spark):
    from big_datatrader_spark.sources.parquet_source import table
    from pyspark.sql import functions as F
    out = REG["streaming_topk_trending"].spark_fn(spark, SF).toPandas()
    assert out.rnk.between(1, 3).all()
    batch = (table(spark, SF, "events")
             .groupBy(F.date_trunc("hour", "ts").alias("bucket"),
                      "event_type")
             .agg(F.count(F.lit(1)).alias("n_events")).toPandas())
    batch["rnk"] = (batch.sort_values(
        ["n_events", "event_type"], ascending=[False, True])
        .groupby("bucket").cumcount() + 1)
    top = batch[batch.rnk <= 3]
    merged = out.merge(top, on=["bucket", "event_type"],
                       suffixes=("", "_b"))
    assert len(merged) == len(out) == len(top)
    assert (merged.n_events == merged.n_events_b).all()
    assert (merged.rnk == merged.rnk_b).all()


def test_temperature_mixture_upweights_small_strata(spark):
    out = REG["temperature_mixture_sample"].spark_fn(spark, SF).toPandas()
    from pyspark.sql import functions as F
    sz = (table(spark, SF, "events").groupBy("event_type").count()
          .toPandas().set_index("event_type")["count"])
    got = out.groupby("event_type").size()
    # quota ~ n^0.5 normalized to 500; check exact quotas
    w = sz.pow(0.5)
    expect = (500 * w / w.sum()).round().astype(int)
    assert (got == expect[got.index]).all()
    # sampling rate of the smallest stratum exceeds the largest's
    rates = got / sz[got.index]
    assert rates[sz.idxmin()] > rates[sz.idxmax()]
    # ranks are a 1..quota prefix per stratum (deterministic hash order)
    assert (out.groupby("event_type").rk.max() == got).all()


def test_boilerplate_removal_matches_python_rebuild(spark):
    """Chunking + df-threshold + reassembly recomputed in plain
    python over the same corpus."""
    import hashlib
    from collections import Counter
    out = (REG["boilerplate_chunk_removal"].spark_fn(spark, SF)
           .toPandas().set_index("doc_id"))
    pdf = table(spark, SF, "documents").select("doc_id",
                                               "text").toPandas()
    chunks = {}
    for _, r in pdf.iterrows():
        toks = r.text.strip().lower().split()
        if not toks:
            continue
        chunks[r.doc_id] = [
            " ".join(toks[s:s + 8]) for s in range(0, len(toks), 8)]
    df = Counter()
    for cs in chunks.values():
        for c in set(cs):
            df[c] += 1
    assert set(out.index) == set(chunks)
    for did, cs in chunks.items():
        kept = [c for c in cs if df[c] < 4]
        row = out.loc[did]
        assert row.n_chunks == len(cs)
        assert row.n_boiler == len(cs) - len(kept)
        assert row.kept_tokens == sum(len(c.split()) for c in kept)
        md5 = hashlib.md5(" ".join(kept).encode()).hexdigest()
        assert row.kept_md5 == md5
    # the corpus genuinely contains boilerplate — the op is not a no-op
    assert out.n_boiler.sum() > 0


def test_domain_cap_bounds_and_conserves(spark):
    out = REG["domain_cap_sample"].spark_fn(spark, SF).toPandas()
    docs = table(spark, SF, "documents").toPandas()
    per = docs.groupby("source").size()
    assert dict(zip(out.source, out.total_docs)) == per.to_dict()
    assert (out.kept_docs <= 8).all()
    assert (out.kept_docs == out.total_docs.clip(upper=8)).all()
    assert (out.kept_chars <= docs.groupby("source")
            .n_chars.sum().reindex(out.source).to_numpy()).all()


def test_containment_dominates_jaccard_and_is_bounded(spark):
    out = (REG["ngram_containment_pairs"].spark_fn(spark, SF)
           .toPandas())
    assert ((out.cont_a > 0) & (out.cont_a <= 1.0)).all()
    assert ((out.cont_b > 0) & (out.cont_b <= 1.0)).all()
    # containment >= jaccard on the same gram sets, always
    jac = out.inter / (out.n_a + out.n_b - out.inter)
    assert (out[["cont_a", "cont_b"]].max(axis=1) + 1e-9 >= jac).all()
    # the keep rule: max containment >= 0.5 in exact integers
    assert (2 * out.inter >= out[["n_a", "n_b"]].min(axis=1)).all()


def test_audio_frame_features_match_full_clip_energy(spark):
    out = (REG["audio_frame_features"].spark_fn(spark, SF)
           .toPandas())
    clip = (REG["multimodal_wav_decode"].spark_fn(spark, SF)
            .toPandas())
    # frame energies partition the clip energy exactly
    per_doc = out.groupby("doc_id").sum_sq.sum()
    assert per_doc.to_dict() == dict(zip(clip.doc_id, clip.sum_sq))
    # 64 samples / 16-sample frames -> 4 frames per doc
    assert (out.groupby("doc_id").size() == 4).all()
    assert out.zero_crossings.between(0, 15).all()
    # the centered signal genuinely oscillates somewhere
    assert out.zero_crossings.sum() > 0
