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
    "optimized_plan",
    "physical_plan",
    "shuffle_count",
    "broadcast_join_count",
    "has_cartesian_product",
    "pushed_filters",
    "read_schemas",
    "single_partition_data_exchanges",
]


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def optimized_plan(df: DataFrame) -> str:
    """The optimized logical plan as a string — the right layer for
    expression-duplication audits (projection collapse and predicate
    pushdown have run; codegen hasn't rewritten expressions yet)."""
    return df._jdf.queryExecution().optimizedPlan().toString()  # type: ignore[attr-defined]


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


_AGG_NODES = {"HashAggregate", "SortAggregate", "ObjectHashAggregate"}


def single_partition_data_exchanges(df: DataFrame) -> list[str]:
    """Names of children feeding a SinglePartition exchange with raw
    (non-aggregated) data — the global-window / global-sort collapse.

    A SinglePartition exchange is benign when its child is a partial
    aggregate (the 1-row final-agg hop: inputs are already combiner-
    reduced to one row per upstream task). Anything else — a scan,
    project, join, sort — means full-width rows are being funneled into
    one task, which is the plan shape that dies at scale.
    """
    plan = physical_plan(df)
    # Map node id -> name from the detail sections "(13) Exchange".
    names = dict(re.findall(r"^\((\d+)\) ([A-Za-z]\w*)", plan, re.M))
    # Ids whose Arguments declare SinglePartition.
    sp_ids = set()
    for m in re.finditer(r"^\((\d+)\) Exchange\n((?:.+\n)*?)\n", plan, re.M):
        if "SinglePartition" in m.group(2):
            sp_ids.add(m.group(1))
    # Parent->child from the indented tree: a node's child is the next
    # tree line with greater indentation.
    tree = []
    for line in plan.splitlines():
        m = re.match(r"^([\s:+\-*]*)([A-Za-z]\w*).*\((\d+)\)\s*$", line)
        if m:
            tree.append((len(m.group(1)), m.group(3)))
    offenders = []
    for i, (indent, node_id) in enumerate(tree):
        if node_id not in sp_ids:
            continue
        for child_indent, child_id in tree[i + 1 :]:
            if child_indent > indent:
                child_name = names.get(child_id, "?")
                if child_name not in _AGG_NODES:
                    offenders.append(child_name)
                break
            if child_indent <= indent:
                break
    return offenders
