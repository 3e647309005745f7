"""Hypertable-style rollup cascade (⊕ north-star time-series operator).

TimescaleDB continuous aggregates / ClickHouse AggregatingMergeTree
cascades re-aggregate each coarser granularity FROM THE PREVIOUS
level's partials, never from raw data — an hour bucket merges 60
minute-rows instead of re-scanning millions of raw rows. The reference
runs the same idea as its 1-minute SLI MV + retention ladder
(clickhouse/migrations/009_create_sli_metrics.sql:21-44, 90-day
rollups); this operator generalizes it to an N-level cascade.

The metric vocabulary is the mergeable-partial set: count / sum / min /
max re-aggregate losslessly (``sum of sums``, ``min of mins``); avg is
derived at read time as sum/count. That restriction is what makes every
level exact — the same algebra that makes the streaming projector's
fold ≡ the batch aggregate (streaming/projector.py).

At 100 TB each level is a materialized table partitioned by its bucket;
the cascade recomputes only buckets whose children changed, and level
N's scan cost is level N-1's row count, not the raw table's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["rollup_cascade", "MERGEABLE"]

MERGEABLE = ("count", "sum", "min", "max")


def _first_level(df: DataFrame, ts_col: str, keys: list[str], value_col: str, level: str) -> DataFrame:
    return df.groupBy(
        F.date_trunc(level, F.col(ts_col)).alias("bucket"), *keys
    ).agg(
        F.count("*").alias("n"),
        F.sum(value_col).alias("sum_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def _merge_level(prev: DataFrame, keys: list[str], level: str) -> DataFrame:
    return prev.groupBy(
        F.date_trunc(level, F.col("bucket")).alias("bucket"), *keys
    ).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def rollup_cascade(
    df: DataFrame,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    value_col: str = "value",
    levels: tuple[str, ...] = ("minute", "hour", "day"),
) -> dict[str, DataFrame]:
    """Build the cascade: ``levels[0]`` aggregates the raw rows; every
    later level re-aggregates the previous level's partials. Returns
    {level: DataFrame(bucket, *keys, n, sum_v, min_v, max_v)} — exact at
    every level by the mergeable-partial algebra.
    """
    keys = keys or []
    out: dict[str, DataFrame] = {}
    cur = _first_level(df, ts_col, keys, value_col, levels[0])
    out[levels[0]] = cur
    for level in levels[1:]:
        cur = _merge_level(cur, keys, level)
        out[level] = cur
    return out
