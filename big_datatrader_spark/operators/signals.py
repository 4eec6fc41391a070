"""Stride (evenly spaced) buy signals.

Reference behavior re-expressed (W4, reference main.py:349-360):
``buy_signals.iloc[::step] = True`` with
``step = max(total_rows // max_trades, 1)`` (main.py:357) or the default
step of 10 (main.py:359). Positions 0, step, 2*step, ... of the
time-ordered series are marked.

Spark expression: per-series ``count`` and ``row_number`` windows, then
``buy_signal = (rn - 1) % step == 0``. Both windows share one
partition/order so Catalyst evaluates them in a single Window exchange.
Per-key (not global) windows keep this scalable (SURVEY.md §7.4).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def with_stride_signals(df: DataFrame,
                        partition_by: Sequence[str],
                        order_by: Sequence[str],
                        max_trades: int | None = None,
                        default_step: int = 10,
                        out_col: str = "buy_signal") -> DataFrame:
    """Adds (rn, step, out_col). rn is 1-based within each series."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    # count over the whole partition (unbounded frame), not the running
    # count that a plain orderBy window would give.
    w_all = (Window.partitionBy(*partition_by)
             .orderBy(*order_by)
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    df = df.withColumn("rn", F.row_number().over(w))
    if max_trades is None:
        step = F.lit(default_step)
    else:
        step = F.greatest(
            F.floor(F.count(F.lit(1)).over(w_all) / F.lit(max_trades)),
            F.lit(1),
        )
    return (
        df.withColumn("step", step.cast("long"))
        .withColumn(out_col, ((F.col("rn") - 1) % F.col("step")) == 0)
    )
