"""Physical-plan inspection helpers: the 100 TB design rules as
assertable properties (SURVEY.md §4).

Rules encoded here and enforced by tests/test_plans.py:
- filters on scans must be PUSHED (row-group skipping at scale);
- scans must read only referenced columns (ReadSchema pruning);
- dim joins must be broadcast (no shuffle of the fact side for them);
- ordered limits must compile to TakeOrderedAndProject (distributed
  top-k, never a global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Full formatted physical plan (executedPlan().toString() truncates
    long field lists, which breaks ReadSchema parsing)."""
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    plan = physical_plan(df)
    return any(fragment in line for line in plan.splitlines()
               if "PushedFilters" in line)


def scan_read_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of every ReadSchema in the plan (one per scan)."""
    import re
    plan = physical_plan(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",")
                if c.strip()]
        out.append(cols)
    return out


def count_op(df: DataFrame, op: str) -> int:
    return physical_plan(df).count(op)


def uses_broadcast_join(df: DataFrame) -> bool:
    return count_op(df, "BroadcastHashJoin") > 0


def uses_top_k(df: DataFrame) -> bool:
    return count_op(df, "TakeOrderedAndProject") > 0


def num_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (not broadcast exchanges).
    Counts the '(N) Exchange' operator headers of the formatted plan."""
    import re
    plan = physical_plan(df)
    return len(re.findall(r"^\(\d+\) Exchange\s*$", plan, re.M))
