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


def test_hll_sketches_merge_losslessly(spark):
    """D13 at the 100 TB shape: a Datasketches HLL built per day and
    merged with hll_union_agg must estimate exactly what one global
    sketch estimates (HLL union at equal lgk is lossless), and land
    within the configured error of the exact distinct count. This is
    the pattern a cluster runs — sketch in the scan stage, union the
    tiny sketches — so the shuffle carries bytes-per-partition, not
    user ids."""
    from pyspark.sql import functions as F

    from alt_spark.catalog import load_table

    ev = load_table(spark, SF, "events")
    per_day = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id", 14).alias("sk")
    )
    merged = per_day.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).first()["est"]
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", 14)).alias("est")
    ).first()["est"]
    exact = ev.select("user_id").distinct().count()
    assert merged == direct, "HLL union at equal lgk must be lossless"
    assert abs(merged - exact) / exact < 0.05
