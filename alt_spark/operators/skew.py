"""Skew mitigation helpers (SURVEY.md §4 — salting for Zipfian keys).

The reference partitions logs by (service_group, service_name)
(clickhouse/migrations/001:13) — service_name is Zipfian in real fleets,
so at 100 TB a raw hash shuffle on it makes one straggler task per hot
service. AQE's skew-join splitting (on in the engine profile,
session.py) handles the join case at runtime; these helpers encode the
*static* patterns for aggregations and joins when the hot keys are
known or unknowable-but-bounded.

- ``salted_agg``: two-phase aggregation — groupBy (key, salt) computes
  bounded partials, then the tiny per-key re-aggregation merges them.
  Correct for any commutative-monoid aggregate (count/sum/min/max).
- ``salted_join``: replicate the small side per salt value; the big
  side routes rows by a deterministic salt so one hot key spreads over
  N tasks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["with_salt", "salted_agg", "salted_join"]


def with_salt(df: DataFrame, n: int, cols: list[str] | None = None) -> DataFrame:
    """Deterministic salt in [0, n): hash of the full row's listed columns
    (defaults to all) — reproducible across runs, unlike rand()."""
    cols = cols or df.columns
    return df.withColumn("__salt", F.pmod(F.xxhash64(*cols), F.lit(n)).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partials: dict[str, tuple[Callable[[str], Column], Callable[[str], Column]]],
    n: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    `partials` maps output column -> (phase1 agg over input col expr,
    phase2 merge over the partial col). Example::

        salted_agg(ev, ["event_type"], {
            "cnt":   (lambda c: F.count("*"),      F.sum),
            "total": (lambda c: F.sum("value"),    F.sum),
            "mx":    (lambda c: F.max("value"),    F.max),
        })
    """
    salted = with_salt(df, n)
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[fn1(name).alias(f"__p_{name}") for name, (fn1, _) in partials.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[fn2(f"__p_{name}").alias(name) for name, (_, fn2) in partials.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the small side replicates n×, the big side's
    hot key rows scatter across n salt partitions. Use when one join key
    dominates and the small side is too large to broadcast outright."""
    salted_big = with_salt(big, n)
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    )
    out = salted_big.join(replicated, [key, "__salt"], how)
    return out.drop("__salt")
