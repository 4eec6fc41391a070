"""Explicit schemas. The reference declares its one schema at scan time
(dtype dict, main.py:299-306); we do the same with StructTypes and never
``inferSchema`` (a schema-inference pass is a full extra read at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Reference-native OHLCV input: time is epoch *milliseconds* at rest
# (README.md:21, main.py:309) and becomes a proper timestamp at scan.
OHLCV_RAW_SCHEMA = T.StructType([
    T.StructField("time", T.LongType(), False),
    T.StructField("open", T.DoubleType(), True),
    T.StructField("high", T.DoubleType(), True),
    T.StructField("low", T.DoubleType(), True),
    T.StructField("close", T.DoubleType(), True),
    T.StructField("volume", T.DoubleType(), True),
])

OHLCV_COLUMNS = ["time", "open", "high", "low", "close", "volume"]

# Driver star schema (TESTDATA.md / FIXTURES.md §B). Parquet is
# self-describing so these are for validation + documentation; scans
# still prune columns via select().
STAR_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("user_id", T.LongType(), True),
    T.StructField("event_type", T.StringType(), True),
    T.StructField("value", T.DoubleType(), True),
    T.StructField("props", T.StringType(), True),
])

# Positions table produced by the MA-crossover backtest
# (reference main.py:419-420, 428-429, 437-438).
POSITIONS_SCHEMA = T.StructType([
    T.StructField("symbol", T.LongType(), True),
    T.StructField("entry_date", T.TimestampType(), True),
    T.StructField("entry_price", T.DoubleType(), True),
    T.StructField("exit_date", T.TimestampType(), True),
    T.StructField("exit_price", T.DoubleType(), True),
])

# Per-symbol backtest summary (both strategies).
BACKTEST_SUMMARY_SCHEMA = T.StructType([
    T.StructField("symbol", T.LongType(), True),
    T.StructField("final_value", T.DoubleType(), True),
    T.StructField("roi", T.DoubleType(), True),
])
