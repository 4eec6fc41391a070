"""Sinks. Reference S4: CSV results export (main.py:515-534).

The reference writes one CSV with the pandas index as a column. Spark
writes a directory of part files — correct at scale (1000 executors write
in parallel); ``single_file=True`` coalesces to one partition for
small exports only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv(df: DataFrame, path: str, *, single_file: bool = False,
              mode: str = "overwrite") -> None:
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", "true").csv(path)
