"""OHLCV CSV scan + file discovery.

Reference behavior being re-expressed (SURVEY.md §2.1):
- S1  CSV scan with declared schema, header row, 6-column projection
      (reference main.py:296-308) — here a declared StructType; Catalyst
      prunes the projection into the scan.
- epoch-ms -> timestamp conversion (reference main.py:309) —
      ``F.timestamp_millis``.
- S2  recursive ./data discovery (reference main.py:202-212) — a glob
      handled by the scan itself (distributed listing), plus
      ``F.input_file_name()`` when provenance is needed.
- S3  case-insensitive filename substring filter (reference
      main.py:214-221).

At scale: one ``spark.read.csv`` over a glob reads thousands of files in
parallel; never os.walk on the driver.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import OHLCV_RAW_SCHEMA
from ..session import ensure_confs


def read_ohlcv_csv(spark: SparkSession, path_or_glob: str,
                   filename_contains: str | None = None) -> DataFrame:
    """Declared-schema CSV scan -> typed OHLCV frame with TIMESTAMP time.

    Returns columns (time TIMESTAMP, open..volume DOUBLE, src_file STRING).
    An empty scan is the caller's error to surface, matching the
    reference's non-empty assertion (main.py:312-313) — use
    ``df.isEmpty()`` at the call site, not here (keep sources lazy).
    """
    ensure_confs(spark)
    df = (
        spark.read.schema(OHLCV_RAW_SCHEMA)
        .option("header", "true")
        .option("mode", "DROPMALFORMED")
        .csv(path_or_glob)
        .withColumn("src_file", F.input_file_name())
    )
    if filename_contains:
        df = df.filter(
            F.lower(F.col("src_file")).contains(filename_contains.lower()))
    return (
        df.withColumn("time", F.timestamp_millis(F.col("time")))
        .select("time", "open", "high", "low", "close", "volume", "src_file")
    )


def discover_csv_files(spark: SparkSession, root_glob: str,
                       name_contains: str | None = None) -> DataFrame:
    """Distributed file discovery: one row per file (path, bytes).

    Uses Spark's binaryFile source for listing only (content column is
    dropped before any action, so files are never read).
    """
    ensure_confs(spark)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.csv")
        .load(root_glob)
        .select(F.col("path"), F.col("length").alias("bytes"))
    )
    if name_contains:
        files = files.filter(
            F.lower(F.col("path")).contains(name_contains.lower()))
    return files


class AuditedScan(NamedTuple):
    """(typed_rows, quarantine, unpersist). The two frames share one
    cached scan; ``unpersist()`` releases it — the cache belongs to the
    caller, and a long-lived session running repeated ingests would
    otherwise accumulate cached blocks."""
    good: DataFrame
    bad: DataFrame
    unpersist: "Callable[[], None]"


def read_ohlcv_csv_audited(spark: SparkSession, path_or_glob: str
                           ) -> AuditedScan:
    """Quarantining variant of the S1 scan: PERMISSIVE mode keeps
    malformed lines in a ``_corrupt_record`` column instead of silently
    dropping them (DROPMALFORMED loses data with no audit trail — fine
    for the reference's curated files, not for a 100 TB ingest where
    0.001% bad lines is still millions of rows someone must account
    for). Returns (typed_rows, quarantine, unpersist) — the quarantine
    carries the raw line + source file for replay/alerting. Both frames
    share ONE cached scan subtree (Spark requires the corrupt column to
    be cached or re-read, SPARK-21610); call ``unpersist()`` once both
    sides are consumed."""
    from pyspark.sql import types as T

    schema = T.StructType(
        list(OHLCV_RAW_SCHEMA.fields)
        + [T.StructField("_corrupt_record", T.StringType(), True)])
    raw = (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path_or_glob)
        .withColumn("src_file", F.input_file_name())
        .cache()  # required for _corrupt_record column access (SPARK-21610)
    )
    good = (
        raw.filter(F.col("_corrupt_record").isNull())
        .withColumn("time", F.timestamp_millis(F.col("time")))
        .select("time", "open", "high", "low", "close", "volume",
                "src_file"))
    bad = (raw.filter(F.col("_corrupt_record").isNotNull())
           .select(F.col("_corrupt_record").alias("raw_line"), "src_file"))
    return AuditedScan(good, bad, lambda: raw.unpersist())
