"""Round-2 pipeline operators: incremental (new-batch-vs-store) dedup,
df-capped n-gram Jaccard, skew-safe aggregation — the day-2 operations a
100 TB training-data pipeline runs on every ingest, beyond the one-shot
whole-corpus dedup ladder in ``llm_dedup``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.parquet_source import table
from . import query
