"""S6: structured run-audit sink (reference main.py:17-25 logs to
trading_sim.log; the engine writes an appendable parquet audit table —
queryable, partition-friendly, and safe for concurrent appenders)."""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession


def log_run(spark: SparkSession, path: str, *, query_name: str,
            rows: int, seconds: float, sf: str = "",
            status: str = "ok") -> None:
    """Append one audit row. Parquet append mode: each call writes a new
    part file, no read-modify-write, safe under concurrency."""
    row = [(float(time.time()), query_name, int(rows), float(seconds),
            sf, status)]
    df = spark.createDataFrame(
        row, "ts double, query_name string, rows long, seconds double, "
             "sf string, status string")
    df.coalesce(1).write.mode("append").parquet(path)


def read_audit(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def observed(df, name: str, exprs: dict):
    """Attach single-pass observation metrics to a DataFrame: the named
    aggregate expressions are computed DURING whatever action later
    materializes ``df`` — no second scan, no separate metrics job. At
    100 TB this is how a pipeline publishes row counts / null rates /
    value bounds for free alongside every write. Returns
    (instrumented_df, Observation); read ``obs.get`` AFTER an action."""
    from pyspark.sql import Observation, functions as F

    obs = Observation(name)
    cols = [v.alias(k) for k, v in exprs.items()]
    return df.observe(obs, cols[0], *cols[1:]), obs
