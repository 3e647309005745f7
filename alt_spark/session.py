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
    # Default shuffle-partition count; get_session derives the real
    # value from the allotted core count (scale-adaptive, see below).
    "spark.sql.shuffle.partitions": "32",
    # Whole-stage-codegen class cache: the default 100 entries thrashes
    # for any long-lived session serving many distinct query shapes
    # (this engine registers 150+; a production analytics service
    # compiles a comparable shape population). Eviction costs a full
    # janino recompile + C2 re-tier on the next run of the shape
    # (~0.5-1 s per heavy aggregate, measured on the q48 parse chain) —
    # cached generated classes are a few hundred KB of metaspace each,
    # so a 4096-entry cache trades <1 GB of metaspace for never paying
    # recompilation twice per shape. Scale-independent: the cache is
    # keyed on generated source, not data size.
    "spark.sql.codegen.cache.maxEntries": "4096",
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
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None and "SPARK_MASTER" not in os.environ:
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(ENGINE_CONF)
    # Scale-adaptive shuffle sizing (optimization guide §2.2): one
    # shuffle partition per allotted core, floored at 8 so tiny-core
    # runs keep AQE coalescing headroom — NOT a constant tuned to one
    # box. On a cluster, SPARK_GRAFT_SHUFFLE_PARTITIONS (or the
    # explicit argument) overrides with 2-3x total executor cores;
    # partitions should land in the 100 MB-1 GB range there.
    env_sp = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    elif env_sp:
        conf["spark.sql.shuffle.partitions"] = env_sp
    else:
        try:
            conf["spark.sql.shuffle.partitions"] = str(max(int(cpus), 8))
        except ValueError:
            pass  # keep the ENGINE_CONF default
    if extra:
        conf.update(extra)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
