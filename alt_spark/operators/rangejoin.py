"""Bucketed range join (⊕ north-star time-series operator).

``l JOIN r ON abs(l.ts - r.ts) <= tolerance`` with no equi-key gives
Spark only a nested-loop plan — quadratic corpus comparisons. The
scalable formulation quantizes time into tolerance-width buckets:
a row in bucket b can only match rows in buckets {b-1, b, b+1}, so
exploding ONE side to its three candidate buckets turns the range
predicate into an equi-join on the bucket id plus a cheap post-filter.
3x row duplication on one side buys a hash-partitioned, skew-resistant
plan — the standard interval-bucketing trick DuckDB's IEJoin and
range-join optimizers automate.

Bucket ids are epoch-microseconds ÷ width: timestamps must be
post-epoch (the engine-wide assumption, see catalog.load_table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join"]


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_s: float = 60.0,
    extra_key: str | list[str] | None = None,
) -> DataFrame:
    """All (left, right) pairs with ``|left_ts - right_ts| <= tolerance``.

    ``extra_key`` adds equi-join columns (same-name on both sides) on
    top of the bucket key — use it when a natural key exists and the
    range is a refinement; omit it for corpus-wide proximity joins.
    Output: every left column, every right column suffixed ``_r``, plus
    ``dt_s`` (signed seconds, left minus right).
    """
    tol_us = int(tolerance_s * 1_000_000)
    keys = (
        [extra_key] if isinstance(extra_key, str) else list(extra_key or [])
    )

    def bucket(c: Column) -> Column:
        return F.floor(F.unix_micros(c) / tol_us).cast("long")

    l_ = left.withColumn("__b", bucket(F.col(left_ts)))
    r = right.select(
        *[F.col(k) for k in keys],
        *[
            F.col(c).alias(f"{c}_r")
            for c in right.columns
            if c not in keys
        ],
    ).withColumn(
        "__b",
        F.explode(
            F.array(
                bucket(F.col(f"{right_ts}_r")) - 1,
                bucket(F.col(f"{right_ts}_r")),
                bucket(F.col(f"{right_ts}_r")) + 1,
            )
        ),
    )
    dt_us = F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col(f"{right_ts}_r"))
    return (
        l_.join(r, ["__b", *keys])
        .filter(F.abs(dt_us) <= tol_us)
        .withColumn("dt_s", dt_us / 1e6)
        .drop("__b")
    )
