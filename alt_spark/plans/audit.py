"""Physical-plan audit: parse `explain(formatted)` output into facts.

Used by tests to enforce the engine's scale conventions (SURVEY.md §4):
predicate pushdown reaches parquet scans, projection prunes ReadSchema,
small dims broadcast, and nothing degenerates into a cartesian product.
String-parsing the formatted plan is deliberate — it audits exactly what
an operator would read when debugging a slow job.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "physical_plan",
    "shuffle_count",
    "broadcast_join_count",
    "has_cartesian_product",
    "pushed_filters",
    "read_schemas",
]


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges).

    Formatted plans name nodes as `(n) Exchange` with the partitioning in
    a separate Arguments section, so count node headers.
    """
    plan = physical_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def broadcast_join_count(df: DataFrame) -> int:
    plan = physical_plan(df)
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan))


def has_cartesian_product(df: DataFrame) -> bool:
    return "CartesianProduct" in physical_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """All non-empty PushedFilters entries across the plan's scans."""
    plan = physical_plan(df)
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.append(m.group(1).strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings for every parquet scan in the plan."""
    plan = physical_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", plan)]
