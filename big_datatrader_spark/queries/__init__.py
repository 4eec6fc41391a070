"""Query registry: every operator from SURVEY.md §2 (plus the LLM-data
extensions) is exposed as a named query with (a) a Spark callable
``(spark, sf_dir) -> DataFrame`` and (b) an equivalent ANSI-SQL oracle
string DuckDB can run over the same parquet tables — the driver's
correctness gate (`__spark_entry__.py` contract).

Conventions (SURVEY.md §7.4):
- every computed column is aliased identically in Spark and SQL;
- floating-point aggregates are rounded on BOTH sides (fp noise from
  differing summation order must not flip the value hash);
- any LIMIT sits under an explicit deterministic ORDER BY;
- session time zone is UTC.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => driver runs the weaker rows-only check
    doc: str = ""
    bench: bool = False  # included in bench.py headline suite
    tags: tuple = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None, *, doc: str = "",
          bench: bool = False, tags: tuple = ()):  # decorator
    def wrap(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name, fn, oracle, doc=doc, bench=bench,
                               tags=tags)
        return fn
    return wrap


def load_registry() -> dict[str, Query]:
    """Import all query modules (registration happens at import)."""
    from . import reference_ops  # noqa: F401
    from . import analytics  # noqa: F401
    from . import tpch_extra  # noqa: F401
    from . import scalar_surface  # noqa: F401
    from . import llm_text  # noqa: F401
    from . import llm_dedup  # noqa: F401
    from . import llm_similarity  # noqa: F401
    from . import multimodal_ops  # noqa: F401
    from . import streaming_ops  # noqa: F401
    return REGISTRY
