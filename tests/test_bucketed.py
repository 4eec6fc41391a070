"""Bucketed-table co-located joins: the shuffle is paid once at write
time; reads join with zero Exchange nodes (sources/bucketed.py)."""

import uuid

from pyspark.sql import functions as F

from big_datatrader_spark.sources.bucketed import drop_table, write_bucketed
from big_datatrader_spark.sources.parquet_source import table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark):
    tag = uuid.uuid4().hex[:8]
    ticks_t, stats_t = f"ticks_{tag}", f"stats_{tag}"
    ev = table(spark, SF, "events").select("user_id", "ts", "value")
    stats = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("total"))
    try:
        write_bucketed(ev, ticks_t, ["user_id"], n_buckets=4)
        write_bucketed(stats, stats_t, ["user_id"], n_buckets=4)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table(ticks_t).join(
                spark.table(stats_t), "user_id")
            plan = (joined._jdf.queryExecution().executedPlan()
                    .toString())
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan  # co-located: no shuffle
            # and the result matches the shuffled join
            plain = ev.join(stats, "user_id")
            assert joined.count() == plain.count()
            got = sorted(map(tuple, joined.collect()))
            want = sorted(map(tuple, plain.collect()))
            assert got == want
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        drop_table(spark, ticks_t)
        drop_table(spark, stats_t)


def test_bucketed_aggregation_skips_exchange(spark):
    tag = uuid.uuid4().hex[:8]
    ticks_t = f"ticks_{tag}"
    ev = table(spark, SF, "events").select("user_id", "ts", "value")
    try:
        write_bucketed(ev, ticks_t, ["user_id"], n_buckets=4)
        agg = (spark.table(ticks_t).groupBy("user_id")
               .agg(F.count(F.lit(1)).alias("n")))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        got = {r.user_id: r.n for r in agg.collect()}
        want = {r.user_id: r.n for r in
                ev.groupBy("user_id").agg(
                    F.count(F.lit(1)).alias("n")).collect()}
        assert got == want
    finally:
        drop_table(spark, ticks_t)


def test_date_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-style partitioned layout: a date filter must prune at the
    directory level (PartitionFilters in the scan), not post-scan."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "events_by_day")
    ev = (table(spark, SF, "events")
          .withColumn("day", F.to_date("ts"))
          .select("event_id", "user_id", "value", "day"))
    ev.write.partitionBy("day").mode("overwrite").parquet(out)

    back = spark.read.parquet(out).filter(
        F.col("day") == "2024-01-02")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the filter must appear among partition filters, not data filters
    part_section = plan.split("PartitionFilters")[1].split(
        "PushedFilters")[0]
    assert "day" in part_section
    want = ev.filter(F.col("day") == "2024-01-02").count()
    assert back.count() == want and want > 0
