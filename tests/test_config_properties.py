"""S5 config loader + hypothesis property tests for the pure helpers."""

import json

import pytest
from hypothesis import given, settings, strategies as st

from big_datatrader_spark.operators.config import SimParams
from big_datatrader_spark.operators.filters import compile_predicate


def test_params_defaults():
    p = SimParams.from_json(json.dumps({}))
    assert p.initial_budget == 10_000.0
    assert p.investment_per_trade == 1_000.0
    assert p.max_trades is None
    assert p.effective_max_trades == 10


def test_params_empty_max_trades_derives():
    # reference main.py:374-375: "" -> budget // per_trade
    p = SimParams.from_json(json.dumps({
        "initial_budget": 5000, "investment_per_trade": 500,
        "max_trades": ""}))
    assert p.effective_max_trades == 10


def test_params_explicit_max_trades():
    p = SimParams.from_json(json.dumps({"max_trades": "3"}))
    assert p.max_trades == 3


def test_params_from_file(tmp_path):
    f = tmp_path / "t.json"
    f.write_text(json.dumps({"initial_budget": 100}))
    assert SimParams.from_json(str(f)).initial_budget == 100.0


def test_params_rejects_non_object():
    with pytest.raises(ValueError):
        SimParams.from_json(json.dumps([1, 2]))


# --- property tests (pure spec level; no SparkSession needed) ------------

@given(st.dictionaries(
    st.sampled_from(["a", "b", "c"]),
    st.dictionaries(st.sampled_from(["gt", "lt", "eq"]),
                    st.floats(allow_nan=False, allow_infinity=False),
                    min_size=1, max_size=3),
    max_size=3))
@settings(max_examples=50, deadline=None)
def test_compile_predicate_total_on_valid_specs(spark, spec):
    # spark fixture: Column construction needs an active SparkContext
    pred = compile_predicate(spec)
    n_conds = sum(len(v) for v in spec.values())
    assert (pred is None) == (n_conds == 0)


@given(st.integers(min_value=1, max_value=10_000),
       st.integers(min_value=1, max_value=100))
@settings(max_examples=100, deadline=None)
def test_stride_step_formula(n_rows, max_trades):
    """step = max(n // max_trades, 1) yields between 1 and ~max_trades+1
    buys at positions 0, step, ... (reference main.py:354-360)."""
    step = max(n_rows // max_trades, 1)
    n_buys = (n_rows + step - 1) // step
    assert step >= 1
    assert n_buys >= 1
    if n_rows >= max_trades:
        # never more than 2x the requested trades (integer-floor slack)
        assert n_buys <= 2 * max_trades
