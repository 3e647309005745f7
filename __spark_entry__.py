"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over alt_spark: the query registry lives in
alt_spark/queries/ (one module per SURVEY.md §2 phase); this file just
exposes it in the driver's expected shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from alt_spark.queries import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's 1-minute SLI error-rate MV
    (clickhouse/migrations/009_create_sli_metrics.sql), re-expressed as a
    Spark aggregation (SURVEY.md §2.Q Q02). Runs at the driver's scale
    directory ($SPARK_GRAFT_SF_DIR, default sf0.001 for the smoke check)."""
    from alt_spark.catalog import sf_dir

    return all_queries()["q02_sli_error_rate"](spark, sf_dir("/root/testdata/sf0.001"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; keys without an entry get the
    driver's weaker rows-only check (non-SQL-expressible ops)."""
    return all_oracles()
