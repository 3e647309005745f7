"""Bucketed-table layout for co-located joins (SURVEY.md §4, BASELINE
scale conventions).

At 100 TB, fact-fact joins on a shared key (orders ⋈ lineitem on
orderkey; q06's lineitem self-join) dominate shuffle traffic. Bucketing
both tables by the join key at write time pre-shuffles them once:
every subsequent join/groupBy on that key reads co-located buckets and
Catalyst drops the Exchange entirely (verified by
tests/test_bucketing.py via the plan audit).

Spark bucketing rides the session catalog (saveAsTable) — the warehouse
location comes from spark.sql.warehouse.dir; callers point it at
engine-owned storage. Sort columns within buckets mirror the
reference's ClickHouse ORDER BY clustering (004:56).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_table"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist `df` as a bucketed (and bucket-sorted) catalog table.

    Idempotent across sessions: the in-memory catalog forgets managed
    tables on restart but their warehouse directories survive, which
    makes a bare saveAsTable fail with LOCATION_ALREADY_EXISTS — drop
    both first.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    import shutil
    from urllib.parse import urlparse

    loc = urlparse(warehouse).path or warehouse
    shutil.rmtree(f"{loc.rstrip('/')}/{table.lower()}", ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
