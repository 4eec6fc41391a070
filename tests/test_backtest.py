"""Backtest semantics: golden values vs an independent pandas
re-implementation of the reference (main.py:349-486), plus the
partition-invariance property the reference's benchmark tab implies
(main.py:590-618)."""

import pandas as pd
import pytest

from big_datatrader_spark.operators.backtest import (
    evenly_spaced_backtest, ma_crossover_backtest)
from big_datatrader_spark.sources.parquet_source import table

BUDGET, PER_TRADE = 10_000.0, 1_000.0


# --- independent golden implementations (straight from the reference
# semantics; deliberately loop-based, not shared with the engine code) ---

def golden_evenly_spaced(pdf: pd.DataFrame, budget, per_trade,
                         max_trades=None):
    pdf = pdf.sort_values("ts").reset_index(drop=True)
    n = len(pdf)
    if max_trades is not None:
        step = max(n // max_trades, 1)
        eff = max_trades
    else:
        step = 10
        eff = int(budget // per_trade)
    buys = pdf.iloc[::step]
    if buys.empty:
        return budget, 0.0
    k = min(len(buys), eff, int(budget // per_trade))
    shares = (per_trade / buys["value"]).head(k).sum()
    final_price = pdf["value"].iloc[-1]
    final_value = (budget - k * per_trade) + shares * final_price
    roi = (final_value - budget) / budget * 100
    return final_value, roi


def golden_ma_crossover(pdf: pd.DataFrame, budget, per_trade,
                        max_trades=None):
    pdf = pdf.sort_values("ts").reset_index(drop=True)
    close = pdf["value"]
    s = close.rolling(5, min_periods=1).mean()
    l = close.rolling(20, min_periods=1).mean()
    cash, in_pos, entry, trades = budget, False, 0.0, 0
    n_positions = 0
    for i in range(1, len(pdf)):
        if max_trades is not None and trades >= max_trades:
            break
        if (not in_pos and s.iloc[i-1] <= l.iloc[i-1]
                and s.iloc[i] > l.iloc[i]):
            if cash >= per_trade:
                in_pos, entry = True, close.iloc[i]
                trades += 1
                n_positions += 1
                cash -= per_trade
        elif (in_pos and s.iloc[i-1] >= l.iloc[i-1]
                and s.iloc[i] < l.iloc[i]):
            in_pos = False
            cash += per_trade / entry * close.iloc[i]
    if in_pos:
        cash += per_trade / entry * close.iloc[-1]
    return cash, (cash - budget) / budget * 100, n_positions


@pytest.fixture(scope="module")
def ticks(spark, sf0001):
    return table(spark, sf0001, "events").select("user_id", "ts", "value")


@pytest.fixture(scope="module")
def ticks_pdf(ticks):
    return ticks.toPandas()


def test_evenly_spaced_matches_golden(ticks, ticks_pdf):
    got = {r["user_id"]: (r["final_value"], r["roi"])
           for r in evenly_spaced_backtest(
               ticks, symbol_col="user_id", order_col="ts",
               price_col="value", budget=BUDGET,
               per_trade=PER_TRADE).collect()}
    for uid, g in ticks_pdf.groupby("user_id"):
        fv, roi = golden_evenly_spaced(g, BUDGET, PER_TRADE)
        assert got[uid][0] == pytest.approx(fv, rel=1e-12), uid
        assert got[uid][1] == pytest.approx(roi, rel=1e-12), uid


def test_evenly_spaced_max_trades_matches_golden(ticks, ticks_pdf):
    got = {r["user_id"]: r["final_value"]
           for r in evenly_spaced_backtest(
               ticks, symbol_col="user_id", order_col="ts",
               price_col="value", budget=BUDGET, per_trade=PER_TRADE,
               max_trades=5).collect()}
    for uid, g in ticks_pdf.groupby("user_id"):
        fv, _ = golden_evenly_spaced(g, BUDGET, PER_TRADE, max_trades=5)
        assert got[uid] == pytest.approx(fv, rel=1e-12), uid


def test_ma_crossover_compressed_equals_full(ticks):
    """The event-compressed path (JVM cross detection, Python fold over
    events only) must reproduce the full-series kernel exactly."""
    kw = dict(symbol_col="user_id", order_col="ts", price_col="value",
              budget=BUDGET, per_trade=PER_TRADE)
    full = sorted(map(tuple, ma_crossover_backtest(
        ticks, mode="full", **kw).collect()))
    comp = sorted(map(tuple, ma_crossover_backtest(
        ticks, mode="compressed", **kw).collect()))
    assert full == comp
    # positions too, incl. forced final close rows
    fullp = sorted(map(tuple, ma_crossover_backtest(
        ticks, mode="full", emit="positions", **kw).collect()))
    compp = sorted(map(tuple, ma_crossover_backtest(
        ticks, mode="compressed", emit="positions", **kw).collect()))
    assert fullp == compp


def test_ma_crossover_compressed_max_trades(ticks):
    kw = dict(symbol_col="user_id", order_col="ts", price_col="value",
              budget=BUDGET, per_trade=PER_TRADE, max_trades=2)
    full = sorted(map(tuple, ma_crossover_backtest(
        ticks, mode="full", **kw).collect()))
    comp = sorted(map(tuple, ma_crossover_backtest(
        ticks, mode="compressed", **kw).collect()))
    assert full == comp


def test_ma_crossover_matches_golden(ticks, ticks_pdf):
    got = {r["user_id"]: (r["final_value"], r["roi"], r["n_trades"])
           for r in ma_crossover_backtest(
               ticks, symbol_col="user_id", order_col="ts",
               price_col="value", budget=BUDGET,
               per_trade=PER_TRADE).collect()}
    assert len(got) == ticks_pdf["user_id"].nunique()
    for uid, g in ticks_pdf.groupby("user_id"):
        fv, roi, n = golden_ma_crossover(g, BUDGET, PER_TRADE)
        assert got[uid][0] == pytest.approx(fv, rel=1e-12), uid
        assert got[uid][2] == n, uid


def test_ma_crossover_positions_close_out(ticks):
    pos = ma_crossover_backtest(
        ticks, symbol_col="user_id", order_col="ts", price_col="value",
        budget=BUDGET, per_trade=PER_TRADE, emit="positions").collect()
    assert len(pos) > 0
    # forced final close (main.py:432-439): every position has an exit
    for r in pos:
        assert r["exit_date"] is not None and r["exit_price"] is not None
        assert r["entry_price"] > 0


def test_backtest_over_ohlcv_csv(spark, tmp_path):
    """Reference-native path end to end: OHLCV CSV (epoch-ms) -> declared
    -schema scan -> single-symbol evenly-spaced backtest (the reference's
    exact shape: one instrument, step 10, defaults)."""
    import os
    path = os.path.join(str(tmp_path), "btcusd.csv")
    with open(path, "w") as f:
        f.write("time,open,high,low,close,volume\n")
        t0 = 1704067200000
        for i in range(100):
            px = 100.0 + i  # monotone price
            f.write(f"{t0 + 60000*i},{px},{px+1},{px-1},{px},10\n")
    from big_datatrader_spark.sources.csv_source import read_ohlcv_csv
    from pyspark.sql import functions as F
    ohlcv = read_ohlcv_csv(spark, path).withColumn("symbol", F.lit("BTC"))
    res = evenly_spaced_backtest(
        ohlcv, symbol_col="symbol", order_col="time", price_col="close",
        budget=BUDGET, per_trade=PER_TRADE).collect()
    assert len(res) == 1
    r = res[0]
    # buys at closes 100,110,...,190 (10 buys); final price 199
    shares = sum(1000.0 / (100.0 + 10 * j) for j in range(10))
    expected = (BUDGET - 10 * PER_TRADE) + shares * 199.0
    assert r["final_value"] == pytest.approx(expected, rel=1e-12)
    assert r["trades_executed"] == 10


def test_partition_invariance(ticks):
    """Reference benchmark oracle (main.py:600-618): identical results
    for partition counts 1,2,4,8,16."""
    expected = None
    for p in (1, 2, 4, 8, 16):
        rows = sorted(
            (r["user_id"], round(r["final_value"], 9))
            for r in evenly_spaced_backtest(
                ticks.repartition(p), symbol_col="user_id",
                order_col="ts", price_col="value", budget=BUDGET,
                per_trade=PER_TRADE).collect())
        if expected is None:
            expected = rows
        else:
            assert rows == expected, f"partitions={p}"
