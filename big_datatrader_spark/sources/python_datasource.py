"""Custom connector via Spark 4's Python Data Source API (V2).

The reference ingests ticks from CSV files (main.py:296-311); this is
the OTHER end of the source surface — a programmatic connector that
plugs third-party/generated feeds into the same DataFrame pipeline
with real partition-parallel reads (one ``InputPartition`` per
symbol, so a 1000-executor cluster reads 1000 symbols concurrently;
Arrow-batched rows flow straight into whole-stage codegen downstream).

The generated feed is DETERMINISTIC — price = md5-h60("sym:i") mod
10000 — so unlike most synthetic sources it has an exact cross-engine
oracle (DuckDB reproduces the identical stream from generate_series +
md5), keeping the connector inside the repo's hash-exact gate.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition,
                                    SimpleDataSourceStreamReader)

FORMAT_NAME = "synthetic_ticks"


def price_cents(sym: int, i: int) -> int:
    """h60(sym:i) mod 10000 — the whole contract of the feed."""
    h = int(hashlib.md5(f"{sym}:{i}".encode()).hexdigest()[:15], 16)
    return h % 10000


class _TickReader(DataSourceReader):
    def __init__(self, options):
        self.n_syms = int(options.get("syms", "8"))
        self.n_ticks = int(options.get("ticks", "500"))

    def partitions(self):
        # one partition per symbol: the unit of read parallelism
        return [InputPartition(s) for s in range(self.n_syms)]

    def read(self, partition):
        s = partition.value
        for i in range(self.n_ticks):
            yield (s, i, price_cents(s, i))


class TickDataSource(DataSource):
    """``spark.read.format("synthetic_ticks")`` after registration."""

    @classmethod
    def name(cls):
        return FORMAT_NAME

    def schema(self):
        return "sym INT, i INT, price_cents BIGINT"

    def reader(self, schema):
        return _TickReader(self.options)


def register(spark) -> None:
    """Idempotent format registration (re-register overwrites)."""
    spark.dataSource.register(TickDataSource)


class _TickStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked micro-batch reader for the same deterministic
    feed: offset = next tick index, each ``read`` advances by
    ``batch`` ticks until ``ticks`` have been emitted, and
    ``readBetweenOffsets`` replays any committed range exactly —
    the replayability contract exactly-once sinks rely on.

    Note: Spark's Python micro-batch wrapper does not support
    Trigger.AvailableNow (it falls back to a SINGLE batch), so a
    one-shot drain sees only the first ``read`` — callers wanting
    the whole feed in one drain set batch >= ticks. Multi-batch
    offset progression IS exercised through a real StreamingQuery
    with a processingTime trigger (tests/test_sources_streaming.py::
    test_python_stream_source_multibatch_drain); committed-range
    replay is covered by the direct-reader test.
    """

    def __init__(self, options):
        self.total = int(options.get("ticks", "500"))
        self.batch = int(options.get("batch", "500"))
        self.sym = int(options.get("sym", "0"))

    def initialOffset(self):
        return {"i": 0}

    def _rows(self, start: int, end: int):
        return [(i, price_cents(self.sym, i)) for i in range(start, end)]

    def read(self, start):
        s = start["i"]
        e = min(s + self.batch, self.total)
        return iter(self._rows(s, e)), {"i": e}

    def readBetweenOffsets(self, start, end):
        return iter(self._rows(start["i"], end["i"]))


class TickStreamDataSource(DataSource):
    """``spark.readStream.format("synthetic_tick_stream")``."""

    @classmethod
    def name(cls):
        return "synthetic_tick_stream"

    def schema(self):
        return "i INT, price_cents BIGINT"

    def simpleStreamReader(self, schema):
        return _TickStreamReader(self.options)


def register_stream(spark) -> None:
    spark.dataSource.register(TickStreamDataSource)
