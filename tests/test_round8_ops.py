"""Semantic invariants of the round-8 operators — the properties the
oracle hash can't state directly: closure of the universe sample under
joins, exact per-stratum split proportions, the join-delta identity
against a Spark-side full recompute, and the structural guarantees of
the graph/k-means outputs."""

from pyspark.sql import functions as F

from big_datatrader_spark.functions.dedup import h60
from big_datatrader_spark.queries import load_registry
from big_datatrader_spark.sources.parquet_source import table

REG = load_registry()


def test_universe_sample_closed_under_joins(spark, sf0001):
    """The scan-local o_custkey predicate selects EXACTLY the orders
    of hash-sampled customers: filtering orders independently equals
    semi-joining orders against the sampled customer set."""
    keep = lambda c: (h60(c.cast("string")) % 100) < 10
    cust = (table(spark, sf0001, "customer")
            .filter(keep(F.col("c_custkey"))).select("c_custkey"))
    ords = table(spark, sf0001, "orders").select("o_orderkey",
                                                 "o_custkey")
    by_pred = ords.filter(keep(F.col("o_custkey")))
    by_join = ords.join(cust, ords["o_custkey"] == cust["c_custkey"],
                        "leftsemi")
    assert by_pred.count() == by_join.count() > 0
    assert by_pred.exceptAll(by_join).count() == 0


def test_universe_sample_scaleup_column(spark, sf0001):
    rows = REG["universe_sample_join"].spark_fn(spark, sf0001).collect()
    assert rows
    for r in rows:
        assert r.est_total_revenue_cp == 10 * r.revenue_cp


def test_stratified_split_exact_proportions(spark, sf0001):
    """Within every stratum: train = floor(0.8n) rounded by the
    cross-multiplication rule, splits partition the stratum, and the
    val slice never exceeds train."""
    out = {(r.lang, r.split): r.n_docs
           for r in REG["stratified_split_exact"]
           .spark_fn(spark, sf0001).collect()}
    totals = {r.lang: r.n for r in
              table(spark, sf0001, "documents")
              .groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    assert totals
    for lang, n in totals.items():
        train = out.get((lang, "train"), 0)
        val = out.get((lang, "val"), 0)
        test = out.get((lang, "test"), 0)
        assert train + val + test == n, lang
        # the rule: r*10 <= 8n -> train, so train = floor(8n/10)
        assert train == (8 * n) // 10, (lang, train, n)
        assert val == (9 * n) // 10 - (8 * n) // 10, (lang, val, n)


def test_incremental_join_delta_equals_full_recompute(spark, sf0001):
    """The two-term delta merge equals the naive Spark full join —
    the same identity the DuckDB oracle states, proven engine-side."""
    got = (REG["incremental_join_maintenance"].spark_fn(spark, sf0001)
           .collect())
    orders = table(spark, sf0001, "orders")
    li = table(spark, sf0001, "lineitem")
    want = {r.o_orderpriority: (r.n, r.rev) for r in
            orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.round(F.col("l_extendedprice") * 100)
                       .cast("bigint")
                       * (100 - F.round(F.col("l_discount") * 100)
                          .cast("bigint"))).alias("rev"))
            .collect()}
    assert {r.o_orderpriority: (r.n_lines, r.revenue_cp)
            for r in got} == want


def test_link_prediction_excludes_edges_and_hits_queries(spark,
                                                         sf0001):
    """No predicted pair is an existing edge, and every pair's u is
    one of the 100 highest-degree query parts."""
    from big_datatrader_spark.functions import graph as GR

    li = table(spark, sf0001, "lineitem").select("l_orderkey",
                                                 "l_partkey")
    edges = GR.copurchase_pairs(li, "src", "dst")
    eset = {(r.src, r.dst) for r in edges.collect()}
    deg = {}
    for a, b in eset:
        deg[a] = deg.get(a, 0) + 1
    qset = {u for u, _ in
            sorted(deg.items(), key=lambda kv: (-kv[1], kv[0]))[:100]}
    rows = (REG["link_prediction_common_neighbors"]
            .spark_fn(spark, sf0001).collect())
    assert rows
    for r in rows:
        assert (r.part_u, r.part_v) not in eset
        assert r.part_u in qset
        assert r.n_common >= 1 and r.ra_score >= 1


def test_gnn_propagation_contracts_range(spark, sf0001):
    """Self-inclusive floor-means never escape [min, max] of the
    previous round (up to the floor's -1), so every round's values
    stay within round 0's envelope."""
    rows = (REG["gnn_feature_propagation"].spark_fn(spark, sf0001)
            .collect())
    assert rows
    lo = min(r.feat0 for r in rows)
    hi = max(r.feat0 for r in rows)
    for r in rows:
        for v in (r.feat1, r.feat2):
            assert lo - 1 <= v <= hi, r


def test_kmeans_refinement_partitions_all_vectors(spark, sf0001):
    out = (REG["kmeans_lloyd_refinement"].spark_fn(spark, sf0001)
           .collect())
    n_vecs = table(spark, sf0001, "embeddings").count()
    assert sum(r.n_vectors for r in out) == n_vecs
    assert all(0 <= r.cluster < 8 for r in out)


def test_l_diversity_flags_only_low_diversity(spark, sf0001):
    """Recompute class diversity straight from the dim table; the
    audit must emit exactly the classes under l=3."""
    cust = table(spark, sf0001, "customer")
    truth = {(r.c_nationkey, r.b): (r.g, r.l) for r in
             cust.groupBy("c_nationkey",
                          F.floor(F.col("c_acctbal") / 1000)
                          .cast("bigint").alias("b"))
             .agg(F.count(F.lit(1)).alias("g"),
                  F.countDistinct("c_mktsegment").alias("l"))
             .collect()}
    got = {(r.c_nationkey, r.bal_bucket): (r.group_n, r.l_div)
           for r in REG["l_diversity_audit"].spark_fn(spark, sf0001)
           .collect()}
    want = {k: v for k, v in truth.items() if v[1] < 3}
    assert got == want and got
