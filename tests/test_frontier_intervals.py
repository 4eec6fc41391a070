"""Semantic tests for the round-4 analytics batch (oracle parity is
covered by tools/check_oracle.py): skyline vs a brute-force domination
scan, interval-overlap bounds, k-anonymity group arithmetic."""

from big_datatrader_spark.queries import load_registry
from big_datatrader_spark.sources.parquet_source import table

REG = load_registry()
SF = "/root/testdata/sf0.001"


def test_skyline_equals_bruteforce_domination(spark):
    pdf = table(spark, SF, "part").select(
        "p_partkey", "p_brand", "p_retailprice", "p_size").toPandas()
    expect = set()
    for b, grp in pdf.groupby("p_brand"):
        rows = list(grp.itertuples())
        for p in rows:
            dominated = any(
                q.p_retailprice <= p.p_retailprice
                and q.p_size >= p.p_size
                and (q.p_retailprice < p.p_retailprice
                     or q.p_size > p.p_size)
                for q in rows)
            if not dominated:
                expect.add(p.p_partkey)
    out = REG["skyline_parts_per_brand"].spark_fn(spark, SF).toPandas()
    assert set(out.p_partkey) == expect
    # frontier per brand is strictly increasing in size as price rises
    for b, grp in out.groupby("p_brand"):
        g = grp.sort_values("price")
        sizes = g["size"].tolist()
        prices = g["price"].tolist()
        for i in range(1, len(g)):
            if prices[i] > prices[i - 1]:
                assert sizes[i] > sizes[i - 1]


def test_interval_overlap_is_positive_and_bounded(spark):
    out = REG["interval_overlap_join"].spark_fn(spark, SF).toPandas()
    assert len(out) > 0
    assert (out.overlap_secs >= 1).all()
    assert (out.overlap_secs <= 3600).all()
    # the hot-hour side is capped at 24 distinct hours by construction
    assert out.hot_hour_start.nunique() <= 24


def test_k_anonymity_groups_are_small_and_disjoint(spark):
    out = REG["k_anonymity_audit"].spark_fn(spark, SF).toPandas()
    assert (out.group_n < 5).all() and (out.group_n >= 1).all()
    key = ["c_nationkey", "c_mktsegment", "bal_bucket"]
    assert not out.duplicated(subset=key).any()
    # every reported class really has that many members
    import math
    cust = table(spark, SF, "customer").toPandas()
    cust["bal_bucket"] = cust.c_acctbal.apply(
        lambda x: math.floor(x / 1000))
    sizes = cust.groupby(["c_nationkey", "c_mktsegment",
                          "bal_bucket"]).size()
    for _, r in out.iterrows():
        assert sizes[(r.c_nationkey, r.c_mktsegment,
                      r.bal_bucket)] == r.group_n


def test_weighted_sample_prefers_heavy_docs(spark):
    """ES sampling must skew toward high weights: the mean weight of
    the sample should exceed the corpus mean (overwhelmingly likely
    for k=20 of 500 under weighted inclusion), and the keys must be
    reproducible from the doc ids alone."""
    import math
    out = REG["weighted_sample_es"].spark_fn(spark, SF).toPandas()
    docs = table(spark, SF, "documents").select(
        "doc_id", "n_chars").toPandas()
    docs = docs[docs.n_chars > 0]
    assert out.weight.mean() > docs.n_chars.mean()
    assert len(out) == 20 and out.doc_id.is_unique
    # deterministic replay of one key
    import hashlib
    r = out.iloc[0]
    h = int(hashlib.md5(f"es:{int(r.doc_id)}".encode())
            .hexdigest()[:15], 16)
    u = (h + 1) / ((1 << 60) + 1)
    assert round(math.log(u) / int(r.weight), 9) == r.es_key


def test_feature_standardize_moments(spark):
    """Per class: z-scores average ~0 with unit variance (exact up to
    the 1e-6 output rounding)."""
    out = REG["feature_standardize"].spark_fn(spark, SF).toPandas()
    for t, g in out.groupby("event_type"):
        if g.zscore.abs().max() == 0:
            continue  # degenerate class
        assert abs(g.zscore.mean()) < 1e-4
        assert abs(g.zscore.var(ddof=0) - 1.0) < 1e-3


def test_market_basket_lift_definition(spark):
    out = REG["market_basket_lift"].spark_fn(spark, SF).toPandas()
    assert len(out) > 0 and (out.n_ab >= 3).all()
    assert (out.confidence <= 1.0).all() and (out.confidence > 0).all()
    # spot-verify one pair against a pandas recompute
    import pandas as pd
    li = table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey").toPandas()
    part = table(spark, SF, "part").select(
        "p_partkey", "p_brand").toPandas()
    ob = (li.merge(part, left_on="l_partkey", right_on="p_partkey")
          [["l_orderkey", "p_brand"]].drop_duplicates())
    n_orders = ob.l_orderkey.nunique()
    r = out.iloc[0]
    sets = ob.groupby("p_brand").l_orderkey.apply(set)
    n_ab = len(sets[r.brand_a] & sets[r.brand_b])
    assert n_ab == r.n_ab
    lift = round(n_ab * n_orders
                 / (len(sets[r.brand_a]) * len(sets[r.brand_b])), 6)
    assert abs(lift - r.lift) < 2e-6


def test_cusum_equals_sequential_recursion(spark):
    """The window formulation must equal the textbook sequential
    S_t = max(0, S_{t-1} + d_t) fold exactly."""
    out = REG["cusum_change_detection"].spark_fn(spark, SF).toPandas()
    ev = table(spark, SF, "events").select(
        "user_id", "ts", "event_id", "value").toPandas()
    ev["day"] = ev.ts.dt.floor("D")
    bars = (ev.sort_values(["ts", "event_id"])
            .groupby(["user_id", "day"]).last().reset_index())
    bars["x"] = (bars.value * 100).round().astype("int64")
    for uid, g in bars.groupby("user_id"):
        g = g.sort_values("day")
        n, s = len(g), int(g.x.sum())
        S, expect = 0, []
        for x in g.x:
            S = max(0, S + (n * int(x) - s))
            expect.append(S)
        got = out[out.user_id == uid].sort_values("day")
        assert got.cusum_scaled.tolist() == expect, uid
        assert (got.alarm == [e > n * 500 for e in expect]).all()
