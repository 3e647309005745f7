"""Extra checks for the coverage queries that declare no SQL oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from alt_spark.catalog import load_table
from alt_spark.queries import all_queries

SF = "/root/testdata/sf0.01"


def test_approx_distinct_within_rsd(spark):
    """q37's HLL++ sketch stays within ~3x the default 5% rsd of exact."""
    approx = {
        r.event_type: r.approx_users
        for r in all_queries()["q37_approx_distinct_users"](spark, SF).collect()
    }
    exact = {
        r.event_type: r.exact
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for t in exact:
        rel_err = abs(approx[t] - exact[t]) / exact[t]
        assert rel_err <= 0.15, (t, approx[t], exact[t])
