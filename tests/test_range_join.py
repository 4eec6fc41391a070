"""Bucketed range join: boundary exactness vs a brute-force reference."""

from pyspark.sql import functions as F

from big_datatrader_spark.operators.range_join import range_join


def test_range_join_boundaries(spark):
    # pairs exactly AT the band edge must be included (<=), one
    # microsecond beyond must not
    left = spark.createDataFrame(
        [(1, 1, "2024-01-01 12:00:00")],
        "id long, k long, t string").select(
        "id", "k", F.col("t").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(10, 1, "2024-01-01 12:10:00"),          # exactly +600s: in
         (11, 1, "2024-01-01 12:10:00.000001"),   # +600s + 1us: out
         (12, 1, "2024-01-01 11:50:00"),          # exactly -600s: in
         (13, 2, "2024-01-01 12:00:00")],         # wrong key: out
        "rid long, k long, t string").select(
        "rid", "k", F.col("t").cast("timestamp").alias("rts"))
    got = sorted(r.rid for r in range_join(
        left, right, key="k", left_ts="ts", right_ts="rts",
        band_seconds=600).collect())
    assert got == [10, 12]


def test_range_join_matches_bruteforce(spark, sf0001):
    from big_datatrader_spark.sources.parquet_source import table
    ev = table(spark, sf0001, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("cts"))
    fast = range_join(p, c, key="user_id", left_ts="ts",
                      right_ts="cts", band_seconds=600)
    brute = p.join(c, on="user_id").filter(
        F.abs(F.unix_micros("ts") - F.unix_micros("cts"))
        <= 600 * 1_000_000)
    a = sorted(map(tuple, fast.select("event_id", "cts").collect()))
    b = sorted(map(tuple, brute.select("event_id", "cts").collect()))
    assert a == b and len(a) > 0
