"""F1/F3 filter semantics (SURVEY.md §2.2)."""

import pytest

from big_datatrader_spark.operators.filters import (
    apply_json_filter, compile_predicate, time_range)


def test_empty_spec_is_noop():
    assert compile_predicate({}) is None
    assert compile_predicate("") is None
    assert compile_predicate("  ") is None


def test_bad_op_raises():
    with pytest.raises(ValueError):
        compile_predicate({"x": {"ge": 1}})


def test_json_filter_conjunction(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "a"), (3, 30.0, "b")],
        "id long, v double, k string")
    out = apply_json_filter(
        df, '{"v": {"gt": 5, "lt": 25}, "k": {"eq": "a"}}')
    assert sorted(r.id for r in out.collect()) == [1, 2]


def test_time_range_inclusive_both_ends(spark):
    # pandas .loc[start:end] is inclusive-inclusive (main.py:318-320);
    # between must match.
    df = spark.createDataFrame(
        [("2024-01-01",), ("2024-01-05",), ("2024-01-09",)],
        "d string").selectExpr("cast(d as timestamp) ts")
    out = time_range(df, "2024-01-01 00:00:00", "2024-01-05 00:00:00")
    assert out.count() == 2


def test_filter_pushdown_reaches_scan(spark, sf001):
    """The compiled predicate must appear as PushedFilters in the
    parquet scan — at 100 TB this is row-group skipping vs full read."""
    from big_datatrader_spark.sources.parquet_source import table
    ev = table(spark, sf001, "events")
    plan = apply_json_filter(
        ev, '{"value": {"gt": 5.0}}')._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "GreaterThan(value,5.0)" in plan
