"""Distributed as-of join (⊕ north-star time-series operator).

Spark has no ASOF JOIN; the naive emulation — join all (left, right)
pairs with ``l.ts >= r.ts`` then keep the max-ts right row per left row
— explodes quadratically per key. This is the scalable formulation:

1. tag left rows side=1, right rows side=0, union them,
2. one window per key ordered by (ts, side): ``last(..., ignorenulls)``
   over the unbounded-preceding frame carries the most recent right-row
   values forward onto each left row,
3. keep the left rows.

One hash shuffle on the key, per-key sort bounded by that key's row
count, zero pair materialization — the same shape ClickHouse's ASOF
JOIN and kdb's aj execute. At equal timestamps the side ordering makes
the match inclusive (``l.ts >= r.ts``) or strict (``l.ts > r.ts``).

DuckDB has a native ASOF JOIN, so queries built on this operator are
fully oracle-checkable (queries/events_q.py q42).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    strict: bool = False,
    how: str = "left",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` at-or-before (``strict=False``) or strictly-before
    (``strict=True``) the left row's ``left_ts``, per key.

    Right columns arrive prefixed ``asof_``, plus ``asof_matched_ts``
    (null when nothing precedes the left row; ``how="inner"`` drops
    those rows). If several right rows share a key and timestamp, the
    match among them is not deterministic — dedupe the right side first
    (one row per (key, ts)) when exact hash parity matters. The whole
    matched right row is carried as ONE struct through a single
    ``last(ignorenulls)``, so a NULL column in the matched row stays
    NULL in the output (DuckDB ASOF JOIN semantics) instead of falling
    through to an older row's value.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in {*keys, right_ts}]

    r = right.select(
        *keys,
        F.col(right_ts).alias("__asof_ts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    ).withColumn("__side", F.lit(0))
    l_ = left.withColumn("__asof_ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    u = l_.unionByName(r, allowMissingColumns=True)

    # Equal-ts rule via side order: right-before-left => inclusive match;
    # left-before-right => the left row can only see strictly-older rights.
    side_order = F.col("__side").desc() if strict else F.col("__side").asc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__asof_ts").asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # One struct per right row, one last(ignorenulls) per output row: the
    # struct is non-null exactly on right rows, so the window carries the
    # WHOLE matched row forward — a NULL field inside the matched row is
    # preserved (it never falls through to an older row), and the window
    # evaluates once instead of once per right column.
    right_struct = F.when(
        F.col("__side") == 0,
        F.struct(
            F.col("__asof_ts").alias("ts"),
            *[F.col(f"__r_{c}").alias(c) for c in right_cols],
        ),
    )
    u = u.withColumn("__asof_match", F.last(right_struct, ignorenulls=True).over(w))
    u = u.withColumn("asof_matched_ts", F.col("__asof_match.ts"))
    for c in right_cols:
        u = u.withColumn(f"asof_{c}", F.col(f"__asof_match.{c}"))

    out = u.filter(F.col("__side") == 1).drop(
        "__asof_ts", "__side", "__asof_match", *[f"__r_{c}" for c in right_cols]
    )
    if how == "inner":
        out = out.filter(F.col("asof_matched_ts").isNotNull())
    elif how != "left":
        raise ValueError(f"asof_join supports how='left'|'inner', got {how!r}")
    return out
