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
