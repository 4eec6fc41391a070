"""Window indicators: rolling means and lag-based crossovers.

Reference behavior re-expressed (SURVEY.md §2.5):
- W1/W2 trailing rolling mean with min_periods=1
  (``close.rolling(5|20, min_periods=1).mean()``, reference
  main.py:403-404). Spark's ``rowsBetween(-(n-1), 0)`` frame averages only
  the rows present at the head of the series, so min_periods=1 semantics
  match exactly.
- W3 previous-row (lag) crossover detection (reference main.py:409-423):
  golden cross  = prev_short <= prev_long AND short > long
  death cross   = prev_short >= prev_long AND short < long

Scale note (SURVEY.md §7.4): the reference has ONE series so its implied
window is global — pathological at 100 TB (single-task sort). Every
function here REQUIRES partition columns; a truly single-series caller
passes a constant-key column and accepts the cost knowingly.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def _w(partition_by: Sequence[str], order_by: Sequence[str]):
    return Window.partitionBy(*partition_by).orderBy(*order_by)


def with_rolling_mean(df: DataFrame, value_col: str, n: int,
                      partition_by: Sequence[str],
                      order_by: Sequence[str],
                      out_col: str) -> DataFrame:
    """Trailing n-row mean, min_periods=1 semantics (W1/W2)."""
    frame = _w(partition_by, order_by).rowsBetween(-(n - 1), 0)
    return df.withColumn(out_col, F.avg(value_col).over(frame))


def with_crossover_signals(df: DataFrame, short_col: str, long_col: str,
                           partition_by: Sequence[str],
                           order_by: Sequence[str],
                           golden_col: str = "golden_cross",
                           death_col: str = "death_cross") -> DataFrame:
    """Lag-based cross events (W3). First row of each series has no lag
    and produces false for both signals (the reference loop starts at
    i=1, main.py:406)."""
    w = _w(partition_by, order_by)
    prev_s = F.lag(short_col, 1).over(w)
    prev_l = F.lag(long_col, 1).over(w)
    s, l = F.col(short_col), F.col(long_col)
    golden = (prev_s <= prev_l) & (s > l)
    death = (prev_s >= prev_l) & (s < l)
    return (
        df.withColumn(golden_col, F.coalesce(golden, F.lit(False)))
        .withColumn(death_col, F.coalesce(death, F.lit(False)))
    )
