"""Structured Streaming query: the hourly rollup executed as a
watermarked tumbling-window stream (availableNow) — results are
identical to the batch rollup, which is exactly what the oracle checks.
"""

from __future__ import annotations

from ..streaming.pipeline import (
    events_stream, hourly_rollup_stream, run_stream_to_memory)
from . import query


@query(
    "streaming_hourly_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS bucket, event_type,
           count(*) AS n_events,
           ROUND(CAST(sum(value) AS DOUBLE), 6) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="tumbling 1h window + 2h watermark over the events file stream "
        "(availableNow drain) — streaming result == batch rollup",
)
def streaming_hourly_rollup(spark, sf_dir):
    stream = events_stream(spark, sf_dir)
    return run_stream_to_memory(hourly_rollup_stream(stream), spark)
