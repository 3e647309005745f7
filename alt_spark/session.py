"""SparkSession builder with the engine's tuned configuration profile.

The reference delegates physical design to Postgres/ClickHouse planners
(SURVEY.md §4); on Spark the equivalent lever is a session config profile:
AQE on (runtime re-plan, skew-join splitting, partition coalescing), Arrow
on (vectorized pandas-UDF transfer), UTC session timezone (parity with the
DuckDB oracle's naive timestamps), and a shuffle-partition count sized for
the target data, not the default 200.

At 100 TB the same profile applies with `shuffle_partitions` scaled to
~2-3x total executor cores and `maxPartitionBytes` kept at 128-256 MB so
scan tasks stay balanced; nothing here is local-mode-specific.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_session", "ENGINE_CONF"]

# Engine-level defaults. Anything the caller passes via `extra` wins.
ENGINE_CONF: dict[str, str] = {
    # Determinism / oracle parity ------------------------------------
    # DuckDB timestamps are naive; Spark interprets parquet TIMESTAMP in
    # the session timezone. UTC makes date_trunc/extract agree.
    "spark.sql.session.timeZone": "UTC",
    # ANSI off: we want permissive casts like the reference's *OrZero
    # helpers (SURVEY.md §2.B5) — nulls, not errors, then coalesce.
    "spark.sql.ansi.enabled": "false",
    # events.parquet stores TIMESTAMP(NANOS); Spark's reader has no ns
    # TimestampType — read as long, catalog.load_table truncates to µs
    # (same floor DuckDB applies).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Runtime optimization --------------------------------------------
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Broadcast small dims aggressively (region/nation/supplier are tiny;
    # the reference's "projection version" dim join, SURVEY.md §2.C11).
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # Arrow for every pandas UDF / toPandas hop.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Scan sizing: 128 MB splits keep task counts sane at any SF.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Parquet: pushdown + vectorized reader are on by default; pin them
    # so a cluster-side override can't silently regress plans.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    # Shuffle compression default (lz4) is fine; keep output small.
    "spark.sql.shuffle.partitions": "32",
    # JVM-launch option: only takes effect when this builder launches a
    # fresh in-process local JVM; ignored on getOrCreate reuse and under
    # spark-submit (set it in the launch config there).
    "spark.driver.memory": "8g",
    "spark.ui.enabled": "false",
}


def get_session(
    app_name: str = "alt_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    when no cluster master is configured — on a real cluster, leave it
    unset and spark-submit decides.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(ENGINE_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra:
        conf.update(extra)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
