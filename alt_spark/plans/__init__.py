"""Plan inspection & audit helpers (SURVEY.md §4).

The reference delegates physical design to Postgres/ClickHouse planners;
on Spark the engine's contract is that Catalyst produces the plans we
expect — filters pushed to scans, columns pruned, dims broadcast, no
cartesian products. ``audit`` turns those expectations into assertions
so they are test-enforced (tests/test_plans.py), not hoped-for.
"""

from alt_spark.plans.audit import (  # noqa: F401
    broadcast_join_count,
    has_cartesian_product,
    physical_plan,
    pushed_filters,
    read_schemas,
    shuffle_count,
)
