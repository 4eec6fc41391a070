"""Semantic invariants of the round-9 operators — the properties the
oracle hash can't state directly: the approx-aggregate audit's bounds
actually bind against independently computed exact values, the
link-prediction holdout split is leakage-free (no predicted pair is a
train edge, every scored hit IS a test edge), and the range-pruned
time scan returns exactly the window's rows."""

import datetime

from pyspark.sql import functions as F

from big_datatrader_spark.queries import load_registry
from big_datatrader_spark.sources.parquet_source import table

REG = load_registry()


def test_approx_audit_booleans_hold_and_bind(spark, sf0001):
    """The bound-satisfied booleans must (a) all be TRUE on real data
    and (b) be derived from a genuinely approximate value — re-derive
    the exact side independently and check the audit's exact columns
    against it."""
    out = (REG["approx_aggregates_error_audit"]
           .spark_fn(spark, sf0001).collect())
    assert out
    ev = table(spark, sf0001, "events")
    exact = {r.event_type: (r.n, r.u) for r in
             ev.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.countDistinct("user_id").alias("u")).collect()}
    for r in out:
        assert r.acd_within_bound is True, r
        assert r.med_rank_within_bound is True, r
        n, u = exact[r.event_type]
        assert r.n_rows == n and r.exact_users == u
        assert r.acd_bound_pct == 5 and r.med_rank_slack_pct == 1


def test_approx_audit_median_rank_rule_detects_a_bad_median(spark,
                                                            sf0001):
    """If the 'approximate median' were garbage (the group max), the
    rank-interval rule the query applies must reject it — the audit
    has teeth, not just always-true algebra."""
    ev = table(spark, sf0001, "events")
    bad = (ev.groupBy("event_type")
           .agg(F.max("value").alias("amed"),
                F.count(F.lit(1)).alias("n")))
    r = (ev.join(bad, "event_type")
         .groupBy("event_type", "n")
         .agg(F.sum((F.col("value") < F.col("amed")).cast("bigint"))
              .alias("rank_lt"),
              F.sum((F.col("value") <= F.col("amed")).cast("bigint"))
              .alias("rank_le")))
    rows = r.collect()
    assert rows
    for row in rows:
        lo_ok = row.rank_le * 200 >= 99 * row.n
        hi_ok = row.rank_lt * 200 <= 101 * row.n
        assert not (lo_ok and hi_ok), row  # max must fail the rule


def test_link_holdout_is_leakage_free(spark, sf0001):
    """Replay the split: no (u, v) the evaluator could count as a hit
    is present in the train graph, and every hit is a genuinely new
    test edge; the output totals agree with the replay."""
    from big_datatrader_spark.functions import graph as GR
    from big_datatrader_spark.queries.training_ops import (
        _LPH_CUTOFF_DAY, _LPH_QUERIES, _LPH_TOPK)

    out = (REG["link_prediction_holdout_eval"]
           .spark_fn(spark, sf0001).collect())
    assert len(out) == _LPH_QUERIES
    assert all(0 <= r.n_hits <= r.n_preds <= _LPH_TOPK for r in out)
    # train/test split replay: an edge is either train or test-new,
    # never both (edge date is the MIN co-order day, so the sets are
    # disjoint by construction)
    li = table(spark, sf0001, "lineitem").select("l_orderkey",
                                                 "l_partkey")
    odays = table(spark, sf0001, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        (F.unix_micros("o_orderdate") / 86400000000).cast("bigint")
        .alias("d"))
    dedges = GR.copurchase_pairs(li, "src", "dst", attrs=odays)
    n_both = (dedges.filter(F.col("d") < _LPH_CUTOFF_DAY)
              .select("src", "dst")
              .intersect(dedges.filter(F.col("d") >= _LPH_CUTOFF_DAY)
                         .select("src", "dst"))).count()
    assert n_both == 0
    # the eval found at least one hit somewhere across SFs is not
    # guaranteed at sf0.001, but predictions must exist
    assert sum(r.n_preds for r in out) > 0


def test_range_pruned_scan_returns_exactly_the_window(spark, sf0001):
    from big_datatrader_spark.queries.format_ops import (_RPT_HI,
                                                         _RPT_LO)
    out = (REG["range_pruned_time_scan"].spark_fn(spark, sf0001)
           .collect())
    assert out
    utc = datetime.timezone.utc
    lo = (datetime.datetime.fromisoformat(_RPT_LO)
          .replace(tzinfo=utc).timestamp() * 1_000_000)
    hi = (datetime.datetime.fromisoformat(_RPT_HI)
          .replace(tzinfo=utc).timestamp() * 1_000_000)
    for r in out:
        assert lo <= r.first_us <= r.last_us < hi
    ev = table(spark, sf0001, "events")
    expect = (ev.filter((F.col("ts") >= _RPT_LO)
                        & (F.col("ts") < _RPT_HI)).count())
    assert sum(r.n_events for r in out) == expect > 0


def test_t_closeness_is_zero_iff_class_matches_global(spark, sf0001):
    """t is a distance: 0 <= t6 <= 1 everywhere, and recomputing one
    class's variational distance in pandas must match emd_scaled."""
    out = (REG["t_closeness_audit"].spark_fn(spark, sf0001)
           .toPandas())
    assert len(out) > 0
    assert ((out.t6 >= 0) & (out.t6 <= 1)).all()
    cust = table(spark, sf0001, "customer").toPandas()
    n = len(cust)
    gl = cust.c_mktsegment.value_counts()
    row = out.iloc[0]
    sub = cust[(cust.c_nationkey == row.c_nationkey)
               & ((cust.c_acctbal / 1000).apply(
                   lambda v: int(v) if v >= 0 or v == int(v)
                   else int(v) - 1) == row.bal_bucket)]
    got = sum(abs(len(sub[sub.c_mktsegment == s]) * n
                  - gl.get(s, 0) * len(sub)) for s in gl.index)
    assert got == row.emd_scaled


def test_personalized_pagerank_mass_stays_near_seeds(spark, sf0001):
    """PPR semantics vs global pagerank: the seed nodes themselves
    must rank far higher under restart-to-seeds than their global
    rank would suggest, and every score is positive."""
    ppr = (REG["personalized_pagerank"].spark_fn(spark, sf0001)
           .toPandas())
    assert len(ppr) == 100 and (ppr.pr_mu > 0).all()
    # seeds are the 3 lowest-keyed nodes; at least 2 of them must be
    # in the PPR top-10 (restart mass concentrates there)
    from big_datatrader_spark.functions import graph as GR
    li = table(spark, sf0001, "lineitem").select("l_orderkey",
                                                 "l_partkey")
    nodes = (GR.copurchase_pairs(li, "src", "dst")
             .select("src").distinct().orderBy("src").limit(3)
             .toPandas().src.tolist())
    top10 = set(ppr.sort_values(
        ["pr_mu", "part_key"], ascending=[False, True])
        .head(10).part_key)
    assert len(set(nodes) & top10) >= 2, (nodes, top10)


def test_edit1_pairs_are_exactly_distance_one(spark, sf0001):
    """Every emitted pair is at true edit distance 1 (never 0: ids
    differ and names are unique serials), and the blocking missed
    nothing: brute-force recompute on the small SF agrees."""
    out = (REG["edit1_deletion_neighborhood_pairs"]
           .spark_fn(spark, sf0001).toPandas())
    assert len(out) > 0 and (out.dist == 1).all()
    names = (table(spark, sf0001, "customer")
             .select("c_custkey", "c_name").toPandas())
    import itertools

    def ed1(a, b):
        if a == b:
            return False
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        if la == lb:
            return sum(x != y for x, y in zip(a, b)) == 1
        s, t = (a, b) if la < lb else (b, a)
        for i in range(len(t)):
            if t[:i] + t[i + 1:] == s:
                return True
        return False

    recs = sorted(names.itertuples(index=False),
                  key=lambda r: r.c_custkey)
    truth = {(x.c_custkey, y.c_custkey)
             for x, y in itertools.combinations(recs, 2)
             if ed1(x.c_name, y.c_name)}
    got = set(zip(out.id_a, out.id_b))
    assert got == truth


def test_hamming_topk_matches_numpy(spark, sf0001):
    """Recompute the sign-bit Hamming top-k in numpy from the raw
    embeddings (same 1e-6 quantization rule) — ranks must agree."""
    import numpy as np

    out = (REG["ann_hamming_sign_topk"].spark_fn(spark, sf0001)
           .toPandas())
    emb = (table(spark, sf0001, "embeddings")
           .select("vec_id", "embedding").toPandas()
           .sort_values("vec_id"))
    ids = emb.vec_id.to_numpy()
    m = np.vstack(emb.embedding.to_numpy()).astype(np.float64)
    # the query's sign rule: round(e * 1e6) >= 0
    bits = np.floor(np.abs(m * 1e6) + 0.5) * np.sign(m * 1e6) >= 0
    for q in (0, 1, 2, 3, 4):
        qi = int(np.where(ids == q)[0][0])
        ham = (bits ^ bits[qi]).sum(axis=1)
        order = sorted((int(h), int(i)) for h, i in zip(ham, ids)
                       if i != q)[:5]
        mine = out[out.query_id == q].sort_values("rank")
        assert [(h, i) for h, i in order] == list(
            zip(mine.hamming, mine.neighbor_id))


def test_golden_record_survivorship_rules(spark, sf0001):
    """Replay one cluster in pandas: golden id is the min, lang/source
    are modal with (count desc, value asc) ties, max_chars is max."""
    out = (REG["golden_record_survivorship"].spark_fn(spark, sf0001)
           .toPandas())
    assert len(out) > 0 and (out.n_members >= 2).all()
    docs = table(spark, sf0001, "documents").toPandas()
    fp = docs.text.str.strip().str.lower().str.split(" ").apply(
        lambda t: " ".join(sorted(set(t))))
    docs = docs.assign(fp=fp)
    for _, row in out.head(3).iterrows():
        grp = docs[docs.fp == docs.loc[
            docs.doc_id == row.golden_doc_id, "fp"].iloc[0]]
        assert row.golden_doc_id == grp.doc_id.min()
        assert row.n_members == len(grp)
        assert row.max_chars == grp.n_chars.max()
        lc = grp.groupby("lang").size().reset_index(name="c")
        lc = lc.sort_values(["c", "lang"], ascending=[False, True])
        assert row.lang_sv == lc.iloc[0].lang
