"""Stream-stream interval join (K-family ⊕ — correlation across two
live streams).

The reference correlates log streams only after they land in ClickHouse
(rask-log-aggregator writes, the SLI collectors join the stored tables);
a Spark-native engine can do it in flight: Structured Streaming's
stream-stream inner join with watermarks on BOTH sides and an event-time
bound in the join condition, so each side's buffered state is evicted
once the watermark passes the interval — bounded memory at any scale.

Scale shape: the join is an equi-join on the correlation key (user_id
here) plus the time-interval predicate; Spark partitions both streams'
state by the equi-key, so a 1000-executor cluster holds each key's
recent window locally and the interval check never leaves the executor.
The batch twin of the same expression is the parity oracle
(tests/test_streaming.py::test_stream_stream_interval_join_parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["clicks_near_errors"]


def clicks_near_errors(
    events: DataFrame,
    tolerance_seconds: int = 60,
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Pairs each error with same-user clicks within ±tolerance (the
    streaming twin of Q05's self-join / Q43's range-join family).

    Works identically on a batch or streaming events frame: the split
    into two filtered sides and the interval equi-join are the same
    expressions; on a streaming frame the per-side watermarks plus the
    two-sided event-time bound make the join's buffered state provably
    evictable (Spark rejects unbounded stream-stream joins outright).
    Returns (user_id, error_id, click_id, error_ts, click_ts, lag_us).

    ``how="left"`` keeps unmatched errors (click columns null) — the
    harder streaming case: a null-padded row can only be emitted once
    the watermark proves no matching click can still arrive, so results
    trail the data by the watermark delay, and draining a bounded replay
    needs a watermark-advancing sentinel event after the last real one
    (see the parity test).
    """
    # Watermark the SOURCE, before the per-side filters: both sides then
    # track event time over the whole stream, so any event advances the
    # shared watermark. Watermarking after the filter pins each side's
    # watermark to its own last matching event — a quiet side (e.g. no
    # errors arriving) would then hold back every pending outer result
    # on the other side forever. The watermark tag follows the ts column
    # through the per-side aliases.
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("user_id"),
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    tol = F.expr(f"interval {tolerance_seconds} seconds")
    joined = errors.join(
        clicks,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") >= F.col("error_ts") - tol)
        & (F.col("click_ts") <= F.col("error_ts") + tol),
        how,
    )
    return joined.select(
        "user_id",
        "error_id",
        "click_id",
        "error_ts",
        "click_ts",
        (
            F.unix_micros("click_ts") - F.unix_micros("error_ts")
        ).cast("double").alias("lag_us"),
    )
