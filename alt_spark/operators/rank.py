"""Scale-safe global ranking (SURVEY.md §2.E1, the 100 TB form).

``rank() OVER (ORDER BY ...)`` with no PARTITION BY is correct Spark but
collapses the whole input into one task (a SinglePartition exchange) —
fine for dim-sized inputs (see queries/relational.py q10, documented
there), fatal for "rank all documents" at scale. The reference leans on
Postgres/ClickHouse to stream such sorts (e.g. the ranked arms of
rag-orchestrator/internal/adapter/repository/hybrid_search_repo.go:71-110);
the distributed equivalent is the classic two-pass scheme:

1. range-repartition by the sort keys (equal keys are never split across
   range-partition boundaries, so ties stay co-located),
2. rank locally inside each range partition,
3. shift each partition's local ranks by the total row count of all
   partitions before it — a partition-count-sized cumulative offset,
   broadcast back.

Every stage is balanced: two data shuffles (range + pid-hash), one
aggregate of #partitions rows, no single-partition exchange of the data
and no driver collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["global_row_number", "global_rank"]

_PID = "__gr_pid"
_LOCAL = "__gr_local"
_OFFSET = "__gr_offset"


def _range_partitioned(df: DataFrame, order_by: list[Column]) -> DataFrame:
    """The pre-materialization stage: range-repartition on the sort keys
    (equal keys co-located) and stamp each row's partition id. Split out
    so tests can audit that the data-bearing exchange is a
    rangepartitioning, which the checkpointed final plan no longer shows.
    """
    parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    return df.repartitionByRange(parts, *order_by).withColumn(
        _PID, F.spark_partition_id()
    )


def _with_offsets(df: DataFrame, order_by: list[Column], rank_fn) -> DataFrame:
    # repartitionByRange SAMPLES its bounds per evaluation: the local-rank
    # branch and the counts branch below would otherwise each re-evaluate
    # the exchange and see DIFFERENT partitionings (offsets computed
    # against one layout, ranks against another — silently wrong ranks).
    # An eager localCheckpoint pins one layout for both branches (same
    # materialization sortByKey/zipWithIndex-style ranking performs) and,
    # unlike persist(), its blocks are released by the ContextCleaner when
    # the result DataFrame is dropped — no session-lifetime cache leak.
    ranged = _range_partitioned(df, order_by).localCheckpoint(eager=True)
    local = rank_fn().over(Window.partitionBy(_PID).orderBy(*order_by))
    with_local = ranged.withColumn(_LOCAL, local)
    # Cumulative row counts per range partition: #partitions rows, so the
    # single-partition window here is over a partition-count-sized input,
    # not the data.
    counts = ranged.groupBy(_PID).agg(F.count("*").alias("__gr_n"))
    offsets = counts.select(
        _PID,
        (
            F.coalesce(
                F.sum("__gr_n").over(
                    Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
        ).alias(_OFFSET),
    )
    return with_local.join(F.broadcast(offsets), _PID)


def global_row_number(
    df: DataFrame, order_by: list[Column], out_col: str = "row_number"
) -> DataFrame:
    """``row_number() OVER (ORDER BY ...)`` without a single-partition sort.

    ``order_by`` are sort-ordered Columns (e.g. ``[F.desc("score")]``);
    append a unique tiebreak column for a deterministic numbering.
    """
    joined = _with_offsets(df, order_by, F.row_number)
    return joined.withColumn(out_col, (F.col(_OFFSET) + F.col(_LOCAL))).drop(
        _PID, _LOCAL, _OFFSET
    )


def global_rank(df: DataFrame, order_by: list[Column], out_col: str = "rank") -> DataFrame:
    """``rank() OVER (ORDER BY ...)``, distributed.

    Correct because the range partitioner co-locates equal sort keys:
    a tie group lives entirely in one partition, so its local rank plus
    that partition's offset equals the global rank.
    """
    joined = _with_offsets(df, order_by, F.rank)
    return joined.withColumn(out_col, (F.col(_OFFSET) + F.col(_LOCAL))).drop(
        _PID, _LOCAL, _OFFSET
    )
