"""Incremental materialized views as Structured Streaming queries.

The reference folds inserts into derived tables with insert-time MVs
(clickhouse/migrations/009_create_sli_metrics.sql:21-44 — 1-minute SLI
error rate and log throughput; 003_create_http_logs_mv.sql — http_logs).
Each MV here is the *same SELECT* as its batch query, applied to a
streaming DataFrame: Spark keeps the aggregation state, so every
micro-batch incrementally folds new rows — exactly the ClickHouse MV
contract (D9), with watermarking making late-data handling explicit
(K9, absent in the reference, which folds whatever arrives).

At scale: a streaming groupBy(window) shuffles only per-batch deltas;
state is partitioned by group key across executors. Complete-mode output
is appropriate for bounded-cardinality MV targets (minute buckets);
unbounded targets use update mode + foreachBatch MERGE (see projector).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from alt_spark.catalog import events_read_schema, events_ts_unit

__all__ = ["MV_REGISTRY", "read_events_stream", "run_mv"]


def sli_error_rate(df: DataFrame) -> DataFrame:
    """1-minute SLI error rate — the streaming form of Q02.

    Reference: 009_create_sli_metrics.sql:21-31. Same SELECT as
    alt_spark.queries.relational.q02; parity is test-enforced
    (tests/test_streaming.py::test_mv_parity_with_batch).
    """
    errors = F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
    return (
        df.withWatermark("ts", "10 minutes")
        .groupBy(F.date_trunc("minute", "ts").alias("bucket"))
        .agg(
            F.count("*").alias("total"),
            errors.alias("errors"),
            F.round(errors.cast("double") / F.count("*"), 4).alias("error_rate"),
        )
    )


def sli_throughput(df: DataFrame) -> DataFrame:
    """1-minute event throughput (009_create_sli_metrics.sql:33-44)."""
    return (
        df.withWatermark("ts", "10 minutes")
        .groupBy(F.date_trunc("minute", "ts").alias("bucket"))
        .agg(F.count("*").alias("rows_per_min"))
    )


def sli_sliding_throughput(df: DataFrame) -> DataFrame:
    """5-minute event throughput sliding every minute (K8 ⊕ — the
    overlapping-window member of the window family, next to the
    tumbling MVs above and the session windows below; generalizes
    009_create_sli_metrics.sql's fixed minute buckets to a smoothed
    rate). Each event lands in window_len/slide = 5 overlapping
    windows; Spark's streaming state is keyed by window start, so the
    per-batch shuffle carries 5 updates per event — constant factor,
    same scale shape as the tumbling MV. Identical expression works on
    a batch frame; parity is test-enforced
    (tests/test_streaming.py::test_sliding_window_mv_parity).
    """
    return (
        df.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes", "1 minute").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


MV_REGISTRY: dict[str, Callable[[DataFrame], DataFrame]] = {
    "sli_error_rate": sli_error_rate,
    "sli_throughput": sli_throughput,
    "sli_sliding_throughput": sli_sliding_throughput,
}


def read_events_stream(
    spark: SparkSession, landing_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source replay of the events table (A2-shaped source).

    Reads parquet chunk files landed in ``landing_dir`` as a stream, one
    file per micro-batch by default, probing the footer for the physical
    ts layout (same branch as the batch catalog) so stream and batch
    plans see identical rows regardless of how the files were written.
    """
    unit = events_ts_unit(landing_dir)
    if unit == "ns":
        # Same pin as catalog.load_table: Spark rejects INT64
        # TIMESTAMP(NANOS) parquet outright without the legacy conf, so
        # the streaming read must set it too — the batch-side pin does
        # not help a session that only ever streams (ADVICE r4).
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass  # static-conf on some builds; the engine profile sets it
    raw = (
        spark.readStream.schema(events_read_schema(unit))
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_dir)
    )
    if unit == "ns":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def run_mv(
    spark: SparkSession,
    name: str,
    source: DataFrame,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Run a registered MV against a streaming source into a memory sink.

    Complete output mode: the in-memory table always holds the full MV,
    like the ClickHouse derived table the collectors query. On a cluster
    the sink would be `foreachBatch` MERGE into the derived table.
    """
    mv = MV_REGISTRY[name](source)
    return (
        mv.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def user_sessions(df: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session-window aggregation (K8 ⊕ — no session windows exist in the
    reference; this is the north-star extension SURVEY §2 E8/K8 declares).

    Works identically over a batch or streaming frame; the streaming form
    additionally needs withWatermark so closed sessions finalize. Parity
    with the lag+cumsum batch sessionization (Q22) is test-enforced —
    the two formulations define the same sessions except on exact-gap
    boundaries (lag's `> gap` keeps an exact-gap event in-session;
    session_window closes it), which cannot occur in µs-resolution data.
    """
    return (
        df.groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
