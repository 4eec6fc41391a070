"""Distribution-strategy operators (queries/scale_ops.py): the
runtime-filter pre-join, the salt-replicated skew join, and the
curriculum interleave. Each test pins the property that makes the
pattern worth having at 100 TB, not just the output values (those are
oracle-checked by tools/check_oracle.py / the driver gate)."""

from pyspark.sql import functions as F

from big_datatrader_spark.plans.explain import num_exchanges, physical_plan
from big_datatrader_spark.queries import load_registry
from big_datatrader_spark.sources.parquet_source import table

REG = load_registry()


def test_runtime_filter_prefilters_fact_before_join(spark, sf0001):
    """The fact table is scanned ONCE and hits a LeftSemi against the
    broadcast bucket bitmap BEFORE the exact join — that ordering is
    the entire point (shuffle/join input shrinks at the scan)."""
    df = REG["runtime_filter_semi_join"].spark_fn(spark, sf0001)
    plan = physical_plan(df)
    assert plan.count("lineitem.parquet") == 1
    semi = plan.index("LeftSemi")
    inner = plan.index("BroadcastHashJoin Inner")
    # physical plans print top-down: the semi sits BELOW (after) the
    # inner join line but must be its child, i.e. appear in the tree —
    # assert both exist and the fact scan feeds the semi side
    assert semi > 0 and inner > 0 and inner < semi
    assert num_exchanges(df) <= 3  # bucket distinct, group agg, sort


def test_runtime_filter_bitmap_is_bounded(spark, sf0001):
    """The broadcast relation is the distinct occupied-bucket set:
    never larger than _RF_BUCKETS rows regardless of dim size."""
    from big_datatrader_spark.queries.scale_ops import _RF_BUCKETS
    dim = (
        table(spark, sf0001, "part")
        .select(F.pmod(F.xxhash64("p_partkey"), F.lit(_RF_BUCKETS))
                .alias("b")).distinct()
    )
    assert dim.count() <= _RF_BUCKETS


def test_skew_salted_join_matches_plain_join(spark, sf0001):
    """Salting is a physical rewrite only: (key, salt) join results
    must be bit-identical to the plain key join."""
    got = (REG["skew_salted_join"].spark_fn(spark, sf0001)
           .toPandas().set_index("event_type"))
    ev = table(spark, sf0001, "events")
    spend = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(F.round(F.col("value") * 100).cast("bigint"))
             .alias("spend_cents")))
    want = (
        ev.select("user_id", "event_type").join(spend, "user_id")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("spend_cents").cast("double") / 100.0, 6)
             .alias("sum_user_spend"))
        .toPandas().set_index("event_type"))
    assert got.sort_index().equals(want.sort_index())


def test_skew_salted_join_replicates_small_side(spark, sf0001):
    """Every dim row appears once per salt value pre-join, so any
    single fact key fans out over _SALT_N reducers."""
    from big_datatrader_spark.queries.scale_ops import _SALT_N
    ev = table(spark, sf0001, "events")
    n_users = (ev.filter(F.col("event_type") == "purchase")
               .select("user_id").distinct().count())
    rep = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        .select("user_id",
                F.explode(F.sequence(F.lit(0), F.lit(_SALT_N - 1)))
                .alias("salt")))
    assert rep.count() == n_users * _SALT_N
    assert rep.select("user_id", "salt").distinct().count() == rep.count()


def test_curriculum_interleave_shape(spark, sf0001):
    """Slots are unique and strictly increasing; the first #langs
    slots carry each language's rank-1 document; top-k plans as
    TakeOrderedAndProject (no global sort materialization)."""
    df = REG["curriculum_interleave"].spark_fn(spark, sf0001)
    assert "TakeOrderedAndProject" in physical_plan(df)
    rows = df.collect()
    slots = [r.slot for r in rows]
    assert slots == sorted(slots) and len(set(slots)) == len(slots)
    langs = sorted({r.lang for r in rows})
    head = rows[:len(langs)]
    assert [r.lang for r in head] == langs
    assert all(r.lang_rank == 1 for r in head)
    # within a language, quality proxy is non-increasing down the slots
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for seq in by_lang.values():
        assert all(a.n_chars >= b.n_chars for a, b in zip(seq, seq[1:]))
    # per-lang rank window + the langs-sized distinct/window/broadcast
    # chain (rows = #langs) + TakeOrdered; all key- or langs-sized
    assert num_exchanges(df) <= 6
