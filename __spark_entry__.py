"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``big_datatrader_spark``; queries register
themselves in ``big_datatrader_spark.queries.REGISTRY`` with their Spark
callable and DuckDB oracle side by side.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_datatrader_spark.queries import load_registry  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Per-symbol evenly-spaced-buys backtest (SURVEY.md §2.12 pipeline 1):
    scan -> per-key stride-signal windows -> ordered limit -> share
    expression -> aggregates -> portfolio math, one row per symbol.
    """
    reg = load_registry()
    return reg["evenly_spaced_backtest"].spark_fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark_fn for name, q in load_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for the few
    genuinely non-SQL-expressible ops -> driver's rows-only check)."""
    return {name: q.oracle for name, q in load_registry().items()
            if q.oracle is not None}
