"""Physical-plan inspection helpers — make Catalyst behavior assertable.

The engine's performance contract is mostly "let Catalyst do it, then
verify it did": filters reach the scan, small dimensions broadcast,
expressions stay inside whole-stage codegen. These helpers read the
executed plan so tests (tests/test_plans.py) lock those properties the
same way unit tests lock semantics.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter predicates that reached the data source scan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame) -> set[str]:
    """Columns actually read from the scan (column pruning check)."""
    plan = formatted_plan(df)
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df) or "BroadcastNestedLoopJoin" in executed_plan(df)


def shuffle_exchange_count(df: DataFrame) -> int:
    return executed_plan(df).count("Exchange hashpartitioning") + executed_plan(
        df
    ).count("Exchange rangepartitioning")


def wholestage_codegen_ids(df: DataFrame) -> int:
    """Number of whole-stage codegen spans (wider/fewer is better)."""
    return len(set(re.findall(r"\*\((\d+)\)", executed_plan(df))))


def has_take_ordered(df: DataFrame) -> bool:
    """ORDER BY + LIMIT should compile to TakeOrderedAndProject, not a
    global sort."""
    return "TakeOrderedAndProject" in executed_plan(df)
