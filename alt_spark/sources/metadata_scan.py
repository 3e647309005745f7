"""Footer-statistics scans: corpus-level COUNT/MIN/MAX answered from
parquet metadata instead of data pages (SURVEY.md §2.A ⊕ scan path).

At 100 TB, "how many rows / what id range does this corpus have?" must
not cost a corpus read: parquet footers already carry row counts and
per-column min/max, and Spark's DSv2 parquet scan can answer plain
un-filtered COUNT/MIN/MAX aggregates from them alone
(``PushedAggregation`` in the scan — zero data pages read). The engine
keeps the v1 parquet path as its default (plan-audit strings,
`PushedFilters` conventions, nanosAsLong interplay), so this module
scopes the v2 switch to the one statement that benefits and restores
the session conf afterwards.

The reference's analog is ClickHouse's part-level count/minmax
indices (system.parts metadata answering trivial aggregates without
scanning marks).
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

__all__ = ["footer_stats"]

_V1_KEY = "spark.sql.sources.useV1SourceList"
_AGG_KEY = "spark.sql.parquet.aggregatePushdown"

# Session conf is process-visible state: without a guard, nested or
# concurrent scopes would capture each other's modified values as the
# "old" conf and leave the session permanently on v2 parquet (r7
# review). The RLock serializes scopes (metadata queries are
# driver-side and cheap — serialization is free), and the PER-SESSION
# depth counter makes nesting restore only at that session's outermost
# exit (r7 follow-up review: a process-global depth skipped conf setup
# for a SECOND session nested inside the first's scope and restored
# only the first). Plans built by OTHER threads of the same session
# during a scope still see the v2 conf — inherent to session-level
# conf; the engine's own paths never build plans concurrently with a
# footer_stats call.
_SCOPE_LOCK = threading.RLock()
_SCOPE_DEPTH: dict[int, int] = {}
_SCOPE_SAVED: dict[int, tuple[str, str]] = {}


@contextmanager
def _v2_parquet_agg_pushdown(spark: SparkSession):
    """Temporarily plan parquet through DSv2 with aggregate pushdown.
    Conf is restored even on error; only plans BUILT AND EXECUTED
    inside the scope are affected (the utility collects inside).
    Reentrant per session across threads.

    Locking (r8, after r7 ADVICE): the lock guards only the enter/exit
    conf BOOKKEEPING, not the body — the bodies of concurrent scopes
    run in parallel, so one slow call (a require_pushdown=False
    fallback paying a real data scan) no longer blocks every other
    thread's footer_stats for the scan's duration. The depth counter
    makes overlapping scopes of one session restore exactly once, at
    the LAST exit; the r7 capture race (a scope saving another scope's
    modified values as the "old" conf) cannot recur because save/set
    and restore are each atomic under the lock and only the
    depth-0->1 enter saves."""
    sid = id(spark)
    with _SCOPE_LOCK:
        if _SCOPE_DEPTH.get(sid, 0) == 0:
            old_v1 = spark.conf.get(_V1_KEY)
            old_agg = spark.conf.get(_AGG_KEY)
            _SCOPE_SAVED[sid] = (old_v1, old_agg)
            v1_rest = ",".join(
                s
                for s in old_v1.split(",")
                if s.strip() and s.strip() != "parquet"
            )
            spark.conf.set(_V1_KEY, v1_rest)
            spark.conf.set(_AGG_KEY, "true")
        _SCOPE_DEPTH[sid] = _SCOPE_DEPTH.get(sid, 0) + 1
    try:
        yield
    finally:
        with _SCOPE_LOCK:
            _SCOPE_DEPTH[sid] -= 1
            if _SCOPE_DEPTH[sid] == 0:
                del _SCOPE_DEPTH[sid]
                saved = _SCOPE_SAVED.pop(sid, None)
                if saved is not None:
                    spark.conf.set(_V1_KEY, saved[0])
                    spark.conf.set(_AGG_KEY, saved[1])


def footer_stats(
    spark: SparkSession,
    path: str,
    minmax_cols: tuple[str, ...] = (),
    require_pushdown: bool = True,
) -> dict:
    """``{"n_rows": N, "min": {col: v}, "max": {col: v}, "pushed": b}``
    for a parquet dataset, answered from footer statistics.

    With ``require_pushdown`` (default), raises RuntimeError if the
    planner could NOT push the aggregate (e.g. a column type without
    min/max pushdown support) — the caller asked for a metadata-cost
    query and silently paying a full corpus scan instead is the failure
    mode this flag exists to surface. With ``require_pushdown=False``
    the same values are returned either way (Spark falls back to a
    normal scan; correct, just not metadata-cheap) and ``pushed``
    reports what actually happened.

    Concurrency: calls from multiple threads run their queries in
    parallel (the conf-scope lock guards only enter/exit bookkeeping —
    r8). Session conf is process-visible, so while ANY footer_stats
    call is in flight, other threads of the same session plan parquet
    through DSv2 with aggregate pushdown on — harmless for reads but
    visible in plans; don't interleave plan-shape assertions with a
    concurrent footer_stats.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in minmax_cols:
        aggs.append(F.min(c).alias(f"__min_{c}"))
        aggs.append(F.max(c).alias(f"__max_{c}"))
    with _v2_parquet_agg_pushdown(spark):
        agg = spark.read.parquet(path).agg(*aggs)
        plan = agg._jdf.queryExecution().executedPlan().toString()
        pushed = "PushedAggregation: [COUNT" in plan
        if require_pushdown and not pushed:
            raise RuntimeError(
                "aggregate was not pushed to the parquet footer "
                f"(columns {minmax_cols!r} may not support statistics "
                "pushdown); pass require_pushdown=False to accept a "
                f"data scan. Plan:\n{plan}"
            )
        row = agg.first()
    return {
        "n_rows": row["__n"],
        "min": {c: row[f"__min_{c}"] for c in minmax_cols},
        "max": {c: row[f"__max_{c}"] for c in minmax_cols},
        "pushed": pushed,
    }
