"""Bounded-memory EXACT quantiles: two-pass histogram refinement.

q04's ``percentile_cont`` (and DuckDB's ``quantile_cont``) buffers every
group's values in one aggregation state — exact, but memory grows with
the group, which is the plan shape that dies when a group holds 10^9
rows at 100 TB. The classical distributed answer (Blum et al.'s
selection by partition, as shipped in every MPP engine's exact-median
path) refines through a histogram instead:

  pass A  per-group count/min/max                  (one map-side agg)
  pass B  per-group fixed-width histogram          (one bounded agg —
          at most ``n_buckets`` rows per group leave the exchange)
  locate  cumulative bucket counts find the bucket holding rank k and
          the residual rank inside it               (bucket-table-sized)
  pass C  sort ONLY the needed buckets, per (group, quantile) — the
          final window touches ~n/n_buckets rows per group, never the
          group itself

Memory per task is therefore O(n_buckets + n/n_buckets), independent of
group size for any value distribution short of a single repeated value
(a bucket of identical values can't be split — but then every element
IS the answer, so the sort is of one distinct value). A further
recursion level would bound even adversarial piles; at n_buckets=512
one level already cuts 10^9-row groups to ~2M-row refinement sorts.

All arithmetic is integer (value must be a long; money goes through the
q57 integer-cents device), so DuckDB replays the DEFINITION — the k-th
smallest element, k = ceil(q·n/1000) — and the two engines agree bit
for bit (see q123).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["exact_group_quantiles"]


def exact_group_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    probs_permille: Sequence[int],
    n_buckets: int = 512,
) -> DataFrame:
    """Exact type-1 order statistics per group: for each q (permille),
    the k-th smallest ``value_col`` where k = max(ceil(q·n/1000), 1).

    Returns ``(group_col, q_permille, rank_k, value)`` — one row per
    (group, quantile). ``value_col`` must be integral (long); ties are
    harmless (the k-th smallest of a multiset is well-defined whatever
    order equal values sort in). NULL values are excluded up front —
    the SQL quantile convention (percentile_cont / quantile_disc both
    ignore NULLs), and necessary for cross-engine exactness: counting
    them would let rank k exceed the sortable rows, and Spark windows
    default NULLS FIRST where DuckDB defaults NULLS LAST, so any NULL
    reaching the refinement sort would diverge silently.
    """
    probs = [int(p) for p in probs_permille]
    if not probs or any(
        p != raw or not (0 < p <= 1000)
        for p, raw in zip(probs, probs_permille)
    ):
        raise ValueError("probs_permille must be integers within (0, 1000]")
    if n_buckets < 4:
        # Keeps width = range/B + 1 inside int64 even for the full long
        # domain (see the DECIMAL note below).
        raise ValueError("n_buckets must be >= 4")
    if len(set(probs)) != len(probs):
        # A duplicated prob would duplicate its (group, bucket) row in
        # the needed-bucket join, fan every refinement row out twice,
        # and make row_number land on the WRONG element — a silently
        # wrong 'exact' quantile, not a cosmetic redundancy.
        raise ValueError("probs_permille must be distinct")
    probs_permille = tuple(probs)
    grp, val = group_col, value_col
    v = df.select(F.col(grp), F.col(val).cast("long").alias("_c")).filter(
        F.col("_c").isNotNull()
    )

    # Pass A: group frame (count, min, max) -> integer bucket width.
    # width = (max-min) div B + 1 guarantees bucket ids in [0, B).
    # The range subtraction and the per-row offset run in DECIMAL(38,0):
    # a group spanning most of the long domain makes (_mx - _mn) exceed
    # int64, and with ANSI off the wrap would send bucket ids out of
    # order — a silently wrong 'exact' quantile. The WIDTH itself fits
    # long for any n_buckets >= 4 (range/B + 1 <= 2^64/4), and the
    # bucket id fits int by construction, so only the two differences
    # need the wide type.
    stats = (
        v.groupBy(grp)
        .agg(
            F.count("*").alias("_n"),
            F.min("_c").alias("_mn"),
            F.max("_c").alias("_mx"),
        )
        .withColumn(
            "_width",
            F.expr(
                "CAST((CAST(_mx AS DECIMAL(38,0)) - CAST(_mn AS DECIMAL(38,0)))"
                f" div {int(n_buckets)} + 1 AS BIGINT)"
            ),
        )
    )

    # Pass B: bounded histogram — at most n_buckets rows per group.
    # stats/needed join without forced broadcast hints: they are
    # group-table-sized, tiny for analytic group columns, but a hard
    # F.broadcast would OOM on a high-cardinality group_col — let the
    # planner's size threshold decide (it still broadcasts small ones).
    bucketed = v.join(stats, grp).withColumn(
        "_bucket",
        F.expr(
            "CAST((CAST(_c AS DECIMAL(38,0)) - CAST(_mn AS DECIMAL(38,0)))"
            " div _width AS BIGINT)"
        ),
    )
    hist = bucketed.groupBy(grp, "_bucket").agg(F.count("*").alias("_cnt"))
    wcum = (
        Window.partitionBy(grp)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hist = hist.withColumn(
        "_cum_before", F.coalesce(F.sum("_cnt").over(wcum), F.lit(0))
    )

    # Locate: which bucket holds rank k, and the residual rank inside it.
    targets = stats.select(
        grp,
        "_n",
        F.explode(
            F.array(*[F.lit(int(p)) for p in probs_permille])
        ).alias("q_permille"),
    ).withColumn(
        "rank_k",
        F.expr("greatest((q_permille * _n + 999) div 1000, CAST(1 AS BIGINT))"),
    )
    needed = (
        targets.join(hist, grp)
        .filter(
            (F.col("_cum_before") < F.col("rank_k"))
            & (F.col("rank_k") <= F.col("_cum_before") + F.col("_cnt"))
        )
        .select(
            grp,
            "q_permille",
            "rank_k",
            "_bucket",
            (F.col("rank_k") - F.col("_cum_before")).alias("_rank_in_bucket"),
        )
    )

    # Pass C: refine only the needed buckets. The inner join fans a row
    # out once per quantile that landed in its bucket; the window then
    # sorts ~n/n_buckets rows per (group, quantile) — never the group.
    refined = bucketed.select(grp, "_c", "_bucket").join(
        needed, [grp, "_bucket"]
    )
    wv = Window.partitionBy(grp, "q_permille").orderBy("_c")
    return (
        refined.withColumn("_rn", F.row_number().over(wv))
        .filter(F.col("_rn") == F.col("_rank_in_bucket"))
        .select(
            grp,
            F.col("q_permille").cast("long").alias("q_permille"),
            F.col("rank_k").cast("long").alias("rank_k"),
            F.col("_c").alias("value"),
        )
    )
