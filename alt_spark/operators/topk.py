"""Scale-safe per-group top-k: partition-salted two-stage selection.

The naive per-group top-k (``row_number() OVER (PARTITION BY group)``,
the q36/F4 device) is correct whenever per-group cardinality is
bounded — but when ONE group's candidate set is corpus-sized (each
eval anchor scores against every corpus vector in q117), the window
shuffle sends that group to a single reducer: the q10 anti-pattern at
its worst. This operator is the salted form:

  stage 1  groupBy(group, spark_partition_id) -> per-salt top-k via
           one in-row sort+slice of the salt-local rows. The salt is
           the INPUT partition id, so every group's rows spread across
           all reducers evenly no matter how skewed the group sizes
           are, and each aggregation state is bounded by one input
           partition's row count (the mapInPandas-MG boundedness
           argument, expressed in built-ins).
  stage 2  groupBy(group) over the salt winners only — at most
           (input partitions x k) rows per group — then a final
           in-row sort+slice and a rank explode.

Equivalence to the window form is total-order exact: both stages sort
by the same key tuple, and top-k selection is associative under a
total order (top-k of unioned per-salt top-ks == global top-k, the
TakeOrdered argument). Pinned against row_number under 1 and 16
partitions in tests/test_ml_ops.py.

Orders are expressed as a SORT-KEY STRUCT the caller builds (ascending
struct comparison — descending fields ride in negated, the integer
device): structs compare field-by-field in both stages and in any
oracle's row_number ORDER BY, so rank boundaries replay exactly when
the caller rounds floats before keying (the q36 doctrine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["grouped_top_k"]


def grouped_top_k(
    df: DataFrame,
    group_cols: list[str],
    sort_key: Column,
    payload: Column,
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Top-``k`` rows per group under ascending ``sort_key`` order.

    Returns one row per kept candidate: the group columns, ``rank_col``
    (1-based within the group, sort_key order) and the fields of
    ``payload`` (a struct column) flattened back out.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    row = F.struct(sort_key.alias("__key"), payload.alias("__p"))
    # Sort with an explicit comparator on __key ONLY: the default
    # struct ordering would let the PAYLOAD participate (deciding rank
    # on sort-key ties, and failing analysis outright for map-bearing
    # payloads, which are not orderable). sort_key must still be a
    # TOTAL order — include a unique tiebreak field — or tie ranks are
    # partition-order-dependent. (Review finding, r9.)
    cmp = lambda l, r: (  # noqa: E731
        F.when(l["__key"] < r["__key"], -1)
        .when(l["__key"] > r["__key"], 1)
        .otherwise(0)
    )
    topk = lambda c: F.slice(F.array_sort(c, cmp), 1, k)  # noqa: E731
    stage1 = (
        df.withColumn("__salt", F.spark_partition_id())
        .groupBy(*group_cols, "__salt")
        .agg(topk(F.collect_list(row)).alias("__rows"))
    )
    stage2 = (
        stage1.select(*group_cols, F.explode("__rows").alias("__r"))
        .groupBy(*group_cols)
        .agg(topk(F.collect_list("__r")).alias("__rows"))
    )
    return stage2.select(
        *group_cols, F.posexplode("__rows").alias("__pos", "__r")
    ).select(
        *group_cols,
        (F.col("__pos") + 1).cast("long").alias(rank_col),
        F.col("__r.__p.*"),
    )
