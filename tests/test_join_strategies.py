"""Salted join: result-identical to the plain join, salt spreads keys."""

from pyspark.sql import functions as F

from big_datatrader_spark.operators.join_strategies import salted_join
from big_datatrader_spark.sources.parquet_source import table


def test_salted_join_matches_plain_join(spark, sf0001):
    ev = table(spark, sf0001, "events").select("event_id", "user_id",
                                               "value")
    dim = (table(spark, sf0001, "events")
           .groupBy("user_id").agg(F.avg("value").alias("user_avg")))
    plain = ev.join(dim, "user_id").select("event_id", "user_avg")
    salted = salted_join(ev, dim, "user_id", salt_buckets=8) \
        .select("event_id", "user_avg")
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b


def test_salted_left_join_keeps_unmatched(spark):
    fact = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "zz")], "k long, v string")
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "k long, d string")
    out = salted_join(fact, dim, "k", salt_buckets=4, how="left")
    rows = {r.k: r.d for r in out.collect()}
    assert rows == {1: "x", 2: "y", 3: None}
