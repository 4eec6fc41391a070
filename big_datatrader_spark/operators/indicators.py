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


def with_ewma(df: DataFrame, value_col: str,
              partition_by: Sequence[str],
              order_by: Sequence[str],
              out_col: str = "ewma",
              alpha: float = 0.2,
              num_partitions: int | None = None) -> DataFrame:
    """Exponential moving average, ``s_0 = x_0;
    s_i = (1-alpha)*s_{i-1} + alpha*x_i``.

    The recursion is inherently sequential per series — not expressible
    as a Spark window function (the pow-rescaled cumulative-sum trick
    overflows on long series). So: hash-repartition by the series key,
    sort within partitions, and run an Arrow-batched mapInPandas kernel
    that folds each group with the exact recursion (plain float ops, no
    pandas ewm internals — the arithmetic is the spec, shared with the
    recursive-CTE oracle). One exchange + one sort, whole partitions per
    Python call — the same batched layout as the crossover backtest.
    """
    import pandas as pd

    cols = list(df.columns)
    keys = list(partition_by)
    part = (df.repartition(num_partitions, *keys) if num_partitions
            else df.repartition(*keys))
    arranged = part.sortWithinPartitions(*keys, *order_by)
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema
    ) + f", `{out_col}` double"

    def kernel(batches):
        frames = [b for b in batches if len(b)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        out = [0.0] * len(pdf)
        x = pdf[value_col].to_numpy()
        gids = pdf.groupby(keys, sort=False).ngroup().to_numpy()
        prev_gid, s = None, 0.0
        for i in range(len(pdf)):
            xi = float(x[i])
            if gids[i] != prev_gid:
                s = xi
                prev_gid = gids[i]
            else:
                s = (1.0 - alpha) * s + alpha * xi
            out[i] = s
        pdf[out_col] = out
        yield pdf[cols + [out_col]]

    return arranged.mapInPandas(kernel, schema=schema)


def with_holt(df: DataFrame, value_col: str,
              partition_by: Sequence[str],
              order_by: Sequence[str],
              level_col: str = "level", trend_col: str = "trend",
              alpha: float = 0.2, beta: float = 0.1) -> DataFrame:
    """Holt's linear-trend (double exponential) smoothing:
    ``l_0 = x_0, b_0 = 0;
    l_i = alpha*x_i + (1-alpha)*(l_{i-1} + b_{i-1});
    b_i = beta*(l_i - l_{i-1}) + (1-beta)*b_{i-1}``.

    Same partition-aligned fold layout as ``with_ewma`` (one exchange,
    one partition sort, one Arrow transfer per partition); the two-state
    recursion is written as the exact float expressions the DuckDB
    recursive-CTE oracle evaluates, so the sequences are bit-identical
    cross-engine."""
    import pandas as pd

    cols = list(df.columns)
    keys = list(partition_by)
    arranged = (df.repartition(*keys)
                .sortWithinPartitions(*keys, *order_by))
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema
    ) + f", `{level_col}` double, `{trend_col}` double"
    a, b_ = float(alpha), float(beta)

    def kernel(batches):
        frames = [fr for fr in batches if len(fr)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        n = len(pdf)
        lv, tr = [0.0] * n, [0.0] * n
        x = pdf[value_col].to_numpy()
        gids = pdf.groupby(keys, sort=False).ngroup().to_numpy()
        prev_gid, l, t = None, 0.0, 0.0
        for i in range(n):
            xi = float(x[i])
            if gids[i] != prev_gid:
                l, t = xi, 0.0
                prev_gid = gids[i]
            else:
                l_new = a * xi + (1.0 - a) * (l + t)
                t = b_ * (l_new - l) + (1.0 - b_) * t
                l = l_new
            lv[i], tr[i] = l, t
        pdf[level_col], pdf[trend_col] = lv, tr
        yield pdf[cols + [level_col, trend_col]]

    return arranged.mapInPandas(kernel, schema=schema)


def with_macd(df: DataFrame, value_col: str,
              partition_by: Sequence[str],
              order_by: Sequence[str],
              fast: int = 12, slow: int = 26, signal: int = 9,
              macd_col: str = "macd",
              signal_col: str = "macd_signal") -> DataFrame:
    """MACD (Appel): ``macd_i = ema_fast_i - ema_slow_i`` and
    ``signal_i = ema(macd, signal)``, all three EMA states advanced in
    ONE sequential pass (``alpha_n = 2/(n+1)``; each EMA seeds on the
    series' first element, the signal EMA on the first macd value).

    Three recursions would normally cost three fold passes; carrying
    (s_fast, s_slow, s_sig) as one state tuple keeps it at ONE
    exchange + ONE partition sort + ONE Arrow transfer — the same
    partition-aligned mapInPandas layout as ``with_ewma``. The float
    expressions are written exactly as the DuckDB recursive-CTE oracle
    evaluates them (``(1 - 2.0/(n+1.0))*s + (2.0/(n+1.0))*x``), so the
    sequences are bit-identical cross-engine.
    """
    import pandas as pd

    cols = list(df.columns)
    keys = list(partition_by)
    arranged = (df.repartition(*keys)
                .sortWithinPartitions(*keys, *order_by))
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema
    ) + f", `{macd_col}` double, `{signal_col}` double"
    af = 2.0 / (fast + 1.0)
    asl = 2.0 / (slow + 1.0)
    asg = 2.0 / (signal + 1.0)

    def kernel(batches):
        frames = [fr for fr in batches if len(fr)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        n = len(pdf)
        mo, so = [0.0] * n, [0.0] * n
        x = pdf[value_col].to_numpy()
        gids = pdf.groupby(keys, sort=False).ngroup().to_numpy()
        prev_gid, sf, ss, sg = None, 0.0, 0.0, 0.0
        for i in range(n):
            xi = float(x[i])
            if gids[i] != prev_gid:
                sf, ss = xi, xi
                sg = 0.0  # first macd = sf - ss = 0.0 seeds the signal
                prev_gid = gids[i]
            else:
                sf = (1.0 - af) * sf + af * xi
                ss = (1.0 - asl) * ss + asl * xi
                m = sf - ss
                sg = (1.0 - asg) * sg + asg * m
            mo[i], so[i] = sf - ss, sg
        pdf[macd_col], pdf[signal_col] = mo, so
        yield pdf[cols + [macd_col, signal_col]]

    return arranged.mapInPandas(kernel, schema=schema)


def with_holt_winters(df: DataFrame, value_col: str,
                      partition_by: Sequence[str],
                      order_by: Sequence[str],
                      period: int = 7,
                      alpha: float = 0.25, beta: float = 0.125,
                      gamma: float = 0.25,
                      level_col: str = "level",
                      trend_col: str = "trend",
                      seasonal_col: str = "seasonal") -> DataFrame:
    """Holt-Winters additive triple exponential smoothing:
    ``l_i = alpha*(x_i - s_{i-m}) + (1-alpha)*(l_{i-1} + b_{i-1});
    b_i = beta*(l_i - l_{i-1}) + (1-beta)*b_{i-1};
    s_i = gamma*(x_i - l_i) + (1-gamma)*s_{i-m}``
    with the deterministic cold start ``l_0 = x_0, b_0 = 0`` and a
    zero seasonal ring (``s_j = 0`` for the first m lags).

    The state is (level, trend, m-slot seasonal ring) — the deepest
    recursion in the fold family, still ONE exchange + ONE partition
    sort + ONE Arrow transfer. Alphas default to dyadic rationals so
    ``1 - a`` is exact; every expression is written as the DuckDB
    recursive-CTE oracle (list-typed seasonal ring) evaluates it.
    """
    import pandas as pd

    cols = list(df.columns)
    keys = list(partition_by)
    arranged = (df.repartition(*keys)
                .sortWithinPartitions(*keys, *order_by))
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema
    ) + (f", `{level_col}` double, `{trend_col}` double,"
         f" `{seasonal_col}` double")
    a, b_, g_ = float(alpha), float(beta), float(gamma)

    def kernel(batches):
        frames = [fr for fr in batches if len(fr)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        n = len(pdf)
        lv, tr, sv = [0.0] * n, [0.0] * n, [0.0] * n
        x = pdf[value_col].to_numpy()
        gids = pdf.groupby(keys, sort=False).ngroup().to_numpy()
        prev_gid, l, t, ring = None, 0.0, 0.0, []
        for i in range(n):
            xi = float(x[i])
            if gids[i] != prev_gid:
                l, t = xi, 0.0
                ring = [0.0] * period
                s_new = g_ * (xi - l) + (1.0 - g_) * ring[0]
                ring = ring[1:] + [s_new]
                prev_gid = gids[i]
            else:
                s_old = ring[0]
                l_new = a * (xi - s_old) + (1.0 - a) * (l + t)
                t = b_ * (l_new - l) + (1.0 - b_) * t
                l = l_new
                s_new = g_ * (xi - l) + (1.0 - g_) * s_old
                ring = ring[1:] + [s_new]
            lv[i], tr[i], sv[i] = l, t, ring[-1]
        pdf[level_col], pdf[trend_col], pdf[seasonal_col] = lv, tr, sv
        yield pdf[cols + [level_col, trend_col, seasonal_col]]

    return arranged.mapInPandas(kernel, schema=schema)


def with_time_decay_ewma(df: DataFrame, value_col: str, time_col: str,
                         partition_by: Sequence[str],
                         order_by: Sequence[str],
                         tau_sec: float = 3600.0,
                         out_col: str = "tdewma") -> DataFrame:
    """Time-decay EMA for IRREGULARLY-spaced series: the decay weight
    is a function of the actual gap, ``w_i = exp(-dt_i / tau)``,
    ``s_i = w_i * s_{i-1} + (1 - w_i) * x_i`` (``s_0 = x_0``) — the
    fixed-alpha EWMA silently assumes equal spacing; this one does not.

    ``time_col`` must be epoch MICROSECONDS (exact integers). The
    weight is snapped to 1e-9 — ``floor(exp(..)*1e9 + 0.5)/1e9`` —
    before use, so the only transcendental both engines must agree on
    is libm ``exp`` at 1e-9 granularity (kernel runs in CPython and
    the oracle in DuckDB: the same C library on this platform). Same
    one-exchange fold layout as ``with_ewma``.
    """
    import math

    import pandas as pd

    cols = list(df.columns)
    keys = list(partition_by)
    arranged = (df.repartition(*keys)
                .sortWithinPartitions(*keys, *order_by))
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema
    ) + f", `{out_col}` double"
    tau = float(tau_sec)

    def kernel(batches):
        frames = [fr for fr in batches if len(fr)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        n = len(pdf)
        out = [0.0] * n
        x = pdf[value_col].to_numpy()
        t = pdf[time_col].to_numpy()
        gids = pdf.groupby(keys, sort=False).ngroup().to_numpy()
        prev_gid, s, last_t = None, 0.0, 0
        for i in range(n):
            xi = float(x[i])
            ti = int(t[i])
            if gids[i] != prev_gid:
                s = xi
                prev_gid = gids[i]
            else:
                dt = (ti - last_t) / 1000000.0
                w = math.floor(math.exp(-dt / tau) * 1e9 + 0.5) / 1e9
                s = w * s + (1.0 - w) * xi
            last_t = ti
            out[i] = s
        pdf[out_col] = out
        yield pdf[cols + [out_col]]

    return arranged.mapInPandas(kernel, schema=schema)
