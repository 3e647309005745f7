"""asof_join semantics against a brute-force reference implementation."""

from __future__ import annotations

from pyspark.sql import functions as F

from alt_spark.operators.asof import asof_join

_LEFT = [
    # (key, ts, tag)
    (1, 10, "a"),
    (1, 20, "b"),
    (1, 5, "c"),   # before any right row for key 1
    (2, 7, "d"),
    (3, 50, "e"),  # key with no right rows at all
]
_RIGHT = [
    # (key, ts, val)
    (1, 10, "r10"),  # equal-ts with left (1,10): inclusive vs strict
    (1, 15, "r15"),
    (2, 3, "r3"),
    (2, 7, "r7"),
]


def _brute(strict: bool) -> dict[tuple[int, int], str | None]:
    out = {}
    for key, lts, _tag in _LEFT:
        cands = [
            (rts, val)
            for rkey, rts, val in _RIGHT
            if rkey == key and (rts < lts if strict else rts <= lts)
        ]
        out[(key, lts)] = max(cands)[1] if cands else None
    return out


def _run(spark, strict: bool, how: str = "left"):
    left = spark.createDataFrame(_LEFT, "key int, ts int, tag string")
    right = spark.createDataFrame(_RIGHT, "key int, ts int, val string")
    got = asof_join(left, right, on="key", strict=strict, how=how)
    return {(r["key"], r["ts"]): r["asof_val"] for r in got.collect()}, got


def test_asof_inclusive_matches_brute_force(spark):
    got, _ = _run(spark, strict=False)
    assert got == _brute(strict=False)
    # the equal-ts row must match inclusively
    assert got[(1, 10)] == "r10"


def test_asof_strict_excludes_equal_ts(spark):
    got, _ = _run(spark, strict=True)
    assert got == _brute(strict=True)
    assert got[(1, 10)] is None  # r10 is equal-ts, r15 is later: no match


def test_asof_inner_drops_unmatched(spark):
    got, df = _run(spark, strict=False, how="inner")
    assert (3, 50) not in got and (1, 5) not in got
    assert df.filter(F.col("asof_matched_ts").isNull()).count() == 0


def test_asof_single_shuffle_no_pair_join(spark):
    """The plan must be window-over-union: no join node at all."""
    from alt_spark.plans.audit import physical_plan, shuffle_count

    left = spark.createDataFrame(_LEFT, "key int, ts int, tag string")
    right = spark.createDataFrame(_RIGHT, "key int, ts int, val string")
    df = asof_join(left, right, on="key")
    plan = physical_plan(df)
    assert "Join" not in plan
    assert shuffle_count(df) == 1


# ---------------------------------------------------------------------------
# range_join (operators/rangejoin.py)

def test_range_join_matches_brute_force_and_uses_equi_plan(spark):
    """Bucketed range join == brute-force theta join, planned as an
    equi-join on the bucket id (never a nested loop)."""
    import itertools

    from alt_spark.plans.audit import physical_plan
    from alt_spark.operators.rangejoin import range_join

    lrows = [(i, 1_000_000 * t) for i, t in enumerate([0, 59, 60, 61, 150, 500])]
    rrows = [(100 + i, 1_000_000 * t) for i, t in enumerate([1, 58, 120, 121, 440])]
    left = spark.createDataFrame(
        [(i, t) for i, t in lrows], "lid long, us long"
    ).select("lid", F.timestamp_micros("us").alias("ts"))
    right = spark.createDataFrame(
        [(i, t) for i, t in rrows], "rid long, us long"
    ).select("rid", F.timestamp_micros("us").alias("ts"))

    got = {
        (r["lid"], r["rid_r"])
        for r in range_join(left, right, tolerance_s=60.0).collect()
    }
    want = {
        (li, ri)
        for (li, lt), (ri, rt) in itertools.product(lrows, rrows)
        if abs(lt - rt) <= 60_000_000
    }
    assert got == want

    plan = physical_plan(range_join(left, right, tolerance_s=60.0))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# rollup_cascade (operators/rollup.py)

def test_rollup_cascade_levels_are_exact(spark):
    """Every cascaded level equals direct aggregation from raw rows:
    count/min/max exactly, sums to float tolerance (the mergeable-
    partial algebra is lossless; only addition order differs)."""
    from alt_spark.catalog import load_table
    from alt_spark.operators.rollup import rollup_cascade

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    cascade = rollup_cascade(ev, keys=["event_type"])
    for level in ("minute", "hour", "day"):
        direct = ev.groupBy(
            F.date_trunc(level, "ts").alias("bucket"), "event_type"
        ).agg(
            F.count("*").alias("n"),
            F.sum("value").alias("sum_v"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
        got = {
            (r["bucket"], r["event_type"]): r
            for r in cascade[level].collect()
        }
        want = {(r["bucket"], r["event_type"]): r for r in direct.collect()}
        assert got.keys() == want.keys(), level
        for k, w in want.items():
            g = got[k]
            assert (g["n"], g["min_v"], g["max_v"]) == (w["n"], w["min_v"], w["max_v"]), (level, k)
            assert abs(g["sum_v"] - w["sum_v"]) < 1e-6, (level, k)
