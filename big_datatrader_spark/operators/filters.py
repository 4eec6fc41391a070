"""Filters and the JSON->predicate compiler.

Reference behavior re-expressed (SURVEY.md §2.2):
- F1 date-range filter, inclusive both ends (``df.loc[start:end]``,
  reference main.py:318-320). Spark's ``between`` is also
  inclusive-inclusive — exact semantic match.
- F3 dynamic JSON filter spec ``{col: {op: value}}``, ops gt/lt/eq,
  conjoined with AND (reference main.py:265-289). The reference compiles
  to a pandas-eval string; we compile to a Catalyst ``Column`` AST so the
  predicate is pushed into the parquet scan (visible as PushedFilters in
  ``.explain``) — at 100 TB this is the difference between scanning a
  row group and skipping it.

The base DataFrame stays immutable: the reference destructively replaces
``self.df`` (main.py:285); lazy DataFrames make every filter a view.
"""

from __future__ import annotations

import json
from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

_OPS = {
    "gt": lambda c, v: F.col(c) > F.lit(v),
    "lt": lambda c, v: F.col(c) < F.lit(v),
    "eq": lambda c, v: F.col(c) == F.lit(v),
}


def time_range(df: DataFrame, start, end, col: str = "ts") -> DataFrame:
    """Inclusive-both-ends time-range filter (F1)."""
    return df.filter(F.col(col).between(F.lit(start), F.lit(end)))


def compile_predicate(spec: dict | str) -> Column | None:
    """Compile ``{col: {op: value}}`` (ops gt/lt/eq) into one conjunctive
    Column predicate. Returns None for an empty spec (reference treats it
    as a no-op, main.py:268-269)."""
    if isinstance(spec, str):
        spec = json.loads(spec) if spec.strip() else {}
    preds: list[Column] = []
    for col, conds in spec.items():
        if not isinstance(conds, dict):
            raise ValueError(f"filter spec for {col!r} must be an object")
        for op, value in conds.items():
            if op not in _OPS:
                raise ValueError(
                    f"unsupported op {op!r} (expected one of {sorted(_OPS)})")
            preds.append(_OPS[op](col, value))
    if not preds:
        return None
    return reduce(lambda a, b: a & b, preds)


def apply_json_filter(df: DataFrame, spec: dict | str) -> DataFrame:
    pred = compile_predicate(spec)
    return df if pred is None else df.filter(pred)
