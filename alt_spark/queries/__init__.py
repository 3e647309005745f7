"""Declared query registry (SURVEY.md §2.Q — the correctness contract).

Each query registers a Spark callable ``(spark, sf_dir) -> DataFrame`` and
(where SQL-expressible) an equivalent DuckDB oracle SQL string. The driver
runs both at sf0.01 and hash-compares canonicalized output; column names
must match exactly (alias discipline), aggregates must be exact, floats
rounded identically on both sides.

Queries that are genuinely non-SQL-expressible (LSH candidate generation,
streaming folds) register without an oracle — the driver then records a
weaker rows-only check, and tests/ cover them with property-based checks
instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query, optionally with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle.strip()
        return fn

    return deco


def _load_all_modules() -> None:
    # Import side-effect: modules register their queries.
    from alt_spark.queries import coverage_q  # noqa: F401
    from alt_spark.queries import events_q  # noqa: F401
    from alt_spark.queries import pipeline_ops  # noqa: F401
    from alt_spark.queries import relational  # noqa: F401
    from alt_spark.queries import relational_ext  # noqa: F401
    from alt_spark.queries import text  # noqa: F401
    from alt_spark.queries import vectors  # noqa: F401


_loaded = False


def all_queries() -> dict[str, QueryFn]:
    global _loaded
    if not _loaded:
        _load_all_modules()
        _loaded = True
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    all_queries()
    return dict(ORACLE)
