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


def test_approx_percentiles_within_rank_error_of_exact(spark):
    """q71 (percentile_approx, the D4 scale path) vs q04 (exact): every
    approximate quantile must be an actual data value whose rank is
    within the sketch's guarantee of the target rank. At accuracy=10000
    and sf0.01 group sizes the permitted rank slack is small; max_value
    must be exact."""
    from alt_spark.queries import all_queries

    sf = "/root/testdata/sf0.01"
    exact = {r["event_type"]: r for r in all_queries()["q04_latency_quantiles"](spark, sf).collect()}
    approx = {r["event_type"]: r for r in all_queries()["q71_latency_quantiles_approx"](spark, sf).collect()}
    assert set(exact) == set(approx)
    from alt_spark.catalog import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf, "events").select("event_type", "value")
    for et, a in approx.items():
        assert a["max_value"] == exact[et]["max_value"]
        vals = sorted(
            r["value"] for r in ev.filter(F.col("event_type") == et).collect()
        )
        n = len(vals)
        for q, col in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            # rank error <= n/accuracy (+1 slack for the round(…,4))
            import bisect
            lo = bisect.bisect_left([round(v, 4) for v in vals], a[col])
            hi = bisect.bisect_right([round(v, 4) for v in vals], a[col])
            target = q * n
            slack = n / 10000.0 + 2
            assert lo - slack <= target <= hi + slack, (et, col, a[col], lo, hi, target)


# ---------------------------------------------------------------------------
def test_q107_cohort_matrix_invariants(spark):
    """Week-0 retention is exactly 10000 permyriad per cohort, offsets
    are non-negative, no cell exceeds its cohort's week-0 size, and the
    week-0 cohort sizes sum to the distinct-user count."""
    from alt_spark.catalog import load_table
    from alt_spark.queries.events_q import q107
    from tests.conftest import SF_ORACLE

    rows = q107(spark, SF_ORACLE).collect()
    assert rows
    base = {}
    for r in rows:
        assert r["week_offset"] >= 0
        if r["week_offset"] == 0:
            assert r["retained_permyriad"] == 10000
            base[r["cohort_wk"]] = r["n_active"]
    for r in rows:
        assert r["n_active"] <= base[r["cohort_wk"]]
        assert 0 <= r["retained_permyriad"] <= 10000
    users = (
        load_table(spark, SF_ORACLE, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(base.values()) == users


def test_q108_funnel_is_monotone_and_ordered(spark):
    """Stage counts can only shrink, entry conversion is 10000, and a
    hand-checked user path confirms the ORDERED semantics (a click
    before the signup must not count)."""
    from pyspark.sql import Row
    from alt_spark.queries.events_q import q108
    from tests.conftest import SF_ORACLE

    rows = {r["stage"]: r for r in q108(spark, SF_ORACLE).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n_users"] >= rows[2]["n_users"] >= rows[3]["n_users"]
    assert rows[1]["conv_from_prev_pm"] == 10000
    assert rows[2]["conv_from_prev_pm"] == rows[2]["conv_from_start_pm"]

    # Ordered semantics on a synthetic log: user 1 clicks BEFORE the
    # signup (must not convert); user 2 completes the chain in order;
    # user 3 clicks 8 days after signup (outside the window).
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)

    def ev(uid, typ, days):
        return Row(
            event_id=uid * 100 + int(days * 10),
            ts=t0 + dt.timedelta(days=days),
            user_id=uid,
            event_type=typ,
            value=0.0,
            props="{}",
        )

    log = spark.createDataFrame(
        [
            ev(1, "click", 0.0), ev(1, "signup", 1.0),
            ev(2, "signup", 0.0), ev(2, "click", 1.0), ev(2, "purchase", 2.0),
            ev(3, "signup", 0.0), ev(3, "click", 8.0),
        ]
    )
    import alt_spark.queries.events_q as eq
    from unittest import mock

    with mock.patch.object(eq, "load_table", lambda *_a, **_k: log):
        got = {r["stage"]: r["n_users"] for r in eq.q108(spark, "ignored").collect()}
    assert got == {1: 3, 2: 1, 3: 1}


def test_q109_integer_flag_equals_float_zscore(spark):
    """The squared integer decision must equal the plain-float 3-sigma
    test wherever the float form is numerically unambiguous, and a
    planted spike must flag exactly its bucket."""
    import math

    from pyspark.sql import Row
    from alt_spark.queries.events_q import q109
    from tests.conftest import SF_ORACLE

    rows = q109(spark, SF_ORACLE).collect()
    assert rows and any(r["is_spike"] == 1 for r in rows)
    # Reconstruct per-series history to recompute sumsq independently.
    hist: dict[str, list[int]] = {}
    for r in sorted(rows, key=lambda r: (r["event_type"], r["bucket"])):
        xs = hist.setdefault(r["event_type"], [])
        window = xs[-60:]
        k = len(window)
        assert r["win_k"] == k and r["win_sum"] == sum(window)
        if k >= 2:
            mean = sum(window) / k
            var = (k * sum(x * x for x in window) - sum(window) ** 2) / (
                k * (k - 1)
            )
            z = (r["n"] - mean) / math.sqrt(var) if var > 0 else float("inf") if r["n"] > mean else 0.0
            want = 1 if (k >= 30 and r["n"] > mean and z >= 3.0) else 0
            if var == 0 or abs(z - 3.0) > 1e-9:
                assert r["is_spike"] == want, (r, z)
        else:
            assert r["is_spike"] == 0
        xs.append(r["n"])

    # Planted spike: flat series of 1s, one bucket at 10.
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    data = []
    eid = 0
    for m in range(50):
        reps = 10 if m == 45 else 1
        for _ in range(reps):
            data.append(
                Row(
                    event_id=eid,
                    ts=t0 + dt.timedelta(minutes=m),
                    user_id=1,
                    event_type="error",
                    value=0.0,
                    props="{}",
                )
            )
            eid += 1
    log = spark.createDataFrame(data)
    import alt_spark.queries.events_q as eq
    from unittest import mock

    with mock.patch.object(eq, "load_table", lambda *_a, **_k: log):
        flags = {
            r["bucket"].minute + 60 * r["bucket"].hour: r["is_spike"]
            for r in eq.q109(spark, "ignored").collect()
        }
    assert flags[45] == 1
    assert sum(flags.values()) == 1


def test_q109_decimal_arithmetic_survives_large_counts(spark):
    """Regression for the ADVICE r8 medium finding: with all-LONG
    arithmetic, 9k*(k*sumsq) crosses 2^63 at per-minute counts of only
    ~2.2e6 (k=60) and WRAPS silently under ANSI off — the flag went
    silently wrong exactly where an operator most needs it. The
    DECIMAL(38,0) form must match an exact Python big-int replay in
    that regime (n ~ 2.5e6, where the old form provably wrapped)."""
    import datetime as dt

    from pyspark.sql import Row

    from alt_spark.queries.events_q import anomaly_flags

    t0 = dt.datetime(2024, 1, 1)
    ns = [5_000_000 + (i * 7919) % 1_000 for i in range(70)]
    ns[65] += 100_000  # unambiguous spike vs the +-1000 jitter
    # The binding RHS term at this magnitude exceeds 2^63: the old long
    # form wrapped here (sanity-pin the premise, not just the fix).
    k, window = 60, ns[5:65]
    assert 9 * k * (k * sum(x * x for x in window)) > 2**63
    buckets = spark.createDataFrame(
        [
            Row(event_type="big", bucket=t0 + dt.timedelta(minutes=i), n=n)
            for i, n in enumerate(ns)
        ]
    )
    got = {
        r["bucket"].minute + 60 * r["bucket"].hour: r["is_spike"]
        for r in anomaly_flags(buckets).collect()
    }
    # Exact Python replay of the integer decision with unbounded ints.
    hist: list[int] = []
    for i, n in enumerate(ns):
        w = hist[-60:]
        kk, s, sq = len(w), sum(w), sum(x * x for x in w)
        d = kk * n - s
        want = int(kk >= 30 and d > 0 and d * d * (kk - 1) >= 9 * kk * (kk * sq - s * s))
        assert got[i] == want, (i, n, got[i], want)
        hist.append(n)
    assert got[65] == 1 and sum(got.values()) == 1


def test_q109_sumsq_envelope_guard_raises_loudly(spark):
    """The r10 A/B moved the sumsq accumulation back to LONG for speed
    (the sliding decimal SUM was the whole r9 q109 regression), which
    reintroduces a wrap hazard at n > ~3.9e8 per minute-bucket — so
    the operator must RAISE there, never wrap silently (the q110
    strict-guard doctrine; silent wrap is exactly the r8 defect
    class). Counts at the guard boundary still flag correctly."""
    import datetime as dt

    import pytest as _pytest
    from pyspark.sql import Row

    from alt_spark.queries.events_q import _ANOM_N_MAX, anomaly_flags

    t0 = dt.datetime(2024, 1, 1)
    over = spark.createDataFrame(
        [
            Row(event_type="x", bucket=t0 + dt.timedelta(minutes=i), n=n)
            for i, n in enumerate([_ANOM_N_MAX + 1] * 35)
        ]
    )
    with _pytest.raises(Exception, match="envelope"):
        anomaly_flags(over).collect()
    # At exactly the envelope the math is exact: 60 * _ANOM_N_MAX^2 < 2^63.
    assert 60 * _ANOM_N_MAX * _ANOM_N_MAX < 2**63
    ns = [_ANOM_N_MAX - 1_000 + (i * 7919) % 500 for i in range(70)]
    ns[65] = _ANOM_N_MAX  # spike inside the envelope
    at_cap = spark.createDataFrame(
        [
            Row(event_type="x", bucket=t0 + dt.timedelta(minutes=i), n=n)
            for i, n in enumerate(ns)
        ]
    )
    got = {
        r["bucket"].minute + 60 * r["bucket"].hour: r["is_spike"]
        for r in anomaly_flags(at_cap).collect()
    }
    hist: list[int] = []
    for i, n in enumerate(ns):
        w = hist[-60:]
        kk, s, sq = len(w), sum(w), sum(x * x for x in w)
        d = kk * n - s
        want = int(
            kk >= 30 and d > 0 and d * d * (kk - 1) >= 9 * kk * (kk * sq - s * s)
        )
        assert got[i] == want, (i, n, got[i], want)
        hist.append(n)
    assert got[65] == 1


# -------------------------------------------------------------- q123 quantile
def test_exact_quantiles_match_python_sort_on_random_groups(spark):
    """The two-pass histogram refinement must return the TRUE order
    statistic (k-th smallest, k = ceil(q·n/1000)) on adversarial-ish
    data: skewed magnitudes, duplicates, a singleton group, and an
    all-equal group."""
    import random

    from alt_spark.operators.quantile import exact_group_quantiles

    rng = random.Random(123)
    rows = []
    rows += [("skew", int(rng.paretovariate(1.1) * 1000)) for _ in range(5000)]
    rows += [("dups", rng.choice([7, 7, 7, 42, 99])) for _ in range(3000)]
    rows += [("one", 12345)]
    rows += [("flat", 5)] * 500
    df = spark.createDataFrame(rows, "grp string, v long")
    probs = (1, 500, 900, 990, 1000)
    got = {
        (r["grp"], r["q_permille"]): (r["rank_k"], r["value"])
        for r in exact_group_quantiles(df, "v", "grp", probs, n_buckets=64).collect()
    }
    by_grp: dict[str, list[int]] = {}
    for g, v in rows:
        by_grp.setdefault(g, []).append(v)
    for g, vals in by_grp.items():
        vals.sort()
        n = len(vals)
        for p in probs:
            k = max((p * n + 999) // 1000, 1)
            assert got[(g, p)] == (k, vals[k - 1]), (g, p, n)


def test_exact_quantiles_refinement_stays_bucket_bounded(spark):
    """The scale claim itself: the final per-(group, quantile) sort must
    see ~n/n_buckets rows, never the group. Pin it by counting the rows
    that reach the refinement join on a 200k-row group."""
    from alt_spark.operators.quantile import exact_group_quantiles

    df = spark.range(200_000).select(
        F.lit("g").alias("grp"),
        (F.xxhash64("id") % 1_000_000).alias("v"),
    )
    n_buckets = 256
    # Reconstruct the needed-bucket histogram the operator derives and
    # assert every chosen bucket is small relative to the group.
    stats = df.groupBy("grp").agg(
        F.count("*").alias("n"), F.min("v").alias("mn"), F.max("v").alias("mx")
    )
    width = stats.select(
        F.expr(f"(mx - mn) div {n_buckets} + 1").alias("w"), "mn", "n"
    ).collect()[0]
    hist = (
        df.withColumn("b", F.expr(f"(v - {width['mn']}) div {width['w']}"))
        .groupBy("b")
        .count()
        .collect()
    )
    max_bucket = max(r["count"] for r in hist)
    assert max_bucket <= 4 * (width["n"] // n_buckets), (
        "histogram did not spread the group"
    )
    out = exact_group_quantiles(df, "v", "grp", (500, 990), n_buckets=n_buckets)
    rows = {(r["q_permille"]): r for r in out.collect()}
    # Cross-check one rank against a full sort.
    n = width["n"]
    k = max((990 * n + 999) // 1000, 1)
    truth = (
        df.select("v").orderBy("v").limit(k).orderBy(F.desc("v")).limit(1).collect()
    )[0]["v"]
    assert rows[990]["value"] == truth


def test_q123_quantiles_have_no_single_partition_exchange(spark):
    """q04's percentile_cont is exact-but-buffered; q123 exists so the
    exact answer survives 10^9-row groups — its plan must not collapse
    data into one partition anywhere."""
    from alt_spark.plans import audit
    from alt_spark.queries import all_queries

    df = all_queries()["q123_exact_price_quantiles"](
        spark, "/root/testdata/sf0.001"
    )
    assert not audit.single_partition_data_exchanges(df), audit.physical_plan(df)


def test_exact_quantiles_hypothesis_sweep(spark):
    """Randomized adversary for the histogram-refinement operator:
    arbitrary long lists (including negatives and heavy ties) and
    arbitrary probability sets must always return the true k-th
    smallest. One Spark job per example is too slow for hypothesis's
    default budget, so examples batch into one multi-group frame."""
    import random

    from alt_spark.operators.quantile import exact_group_quantiles

    rng = random.Random(20260816)
    groups = {}
    for gi in range(25):
        n = rng.randint(1, 400)
        lo = rng.choice([-(10**12), -5, 0, 3])
        hi = lo + rng.choice([0, 1, 17, 10**6, 10**13])
        groups[f"g{gi}"] = [rng.randint(lo, hi) for _ in range(n)]
    rows = [(g, v) for g, vals in groups.items() for v in vals]
    df = spark.createDataFrame(rows, "grp string, v long").repartition(16)
    probs = (1, 137, 500, 999, 1000)
    got = {
        (r["grp"], r["q_permille"]): (r["rank_k"], r["value"])
        for r in exact_group_quantiles(df, "v", "grp", probs, n_buckets=32).collect()
    }
    assert len(got) == len(groups) * len(probs)
    for g, vals in groups.items():
        vals.sort()
        n = len(vals)
        for p in probs:
            k = max((p * n + 999) // 1000, 1)
            assert got[(g, p)] == (k, vals[k - 1]), (g, p, n)


def test_exact_quantiles_ignore_nulls(spark):
    """NULL values must be excluded before counting (the SQL quantile
    convention) — counting them would let rank k exceed the sortable
    rows, and the engines disagree on NULL sort position (Spark NULLS
    FIRST vs DuckDB NULLS LAST), so this is a silent-divergence class,
    not a cosmetic choice."""
    from alt_spark.operators.quantile import exact_group_quantiles

    rows = [("g", v) for v in [10, None, 20, None, 30, 40, None]]
    df = spark.createDataFrame(rows, "grp string, v long")
    got = {
        r["q_permille"]: (r["rank_k"], r["value"])
        for r in exact_group_quantiles(df, "v", "grp", (500, 1000)).collect()
    }
    # 4 non-null values: k(500) = 2 -> 20, k(1000) = 4 -> 40.
    assert got == {500: (2, 20), 1000: (4, 40)}


def test_exact_quantiles_reject_degenerate_probs(spark):
    """Duplicate probs would fan refinement rows out twice and make
    row_number select the WRONG element; float probs would silently
    truncate. Both must raise, not return plausible numbers."""
    import pytest as _pytest

    from alt_spark.operators.quantile import exact_group_quantiles

    df = spark.createDataFrame([("g", 1)], "grp string, v long")
    with _pytest.raises(ValueError, match="distinct"):
        exact_group_quantiles(df, "v", "grp", (1000, 1000))
    with _pytest.raises(ValueError, match="integers"):
        exact_group_quantiles(df, "v", "grp", (0.5,))
    with _pytest.raises(ValueError, match="n_buckets"):
        exact_group_quantiles(df, "v", "grp", (500,), n_buckets=2)


def test_exact_quantiles_survive_full_long_range(spark):
    """A group spanning most of the int64 domain: (max - min) exceeds
    long, so the width/bucket arithmetic must run in DECIMAL — with the
    wrapped-subtraction form this returned out-of-order bucket ids and
    a silently wrong order statistic."""
    from alt_spark.operators.quantile import exact_group_quantiles

    lo, hi = -(2**62) - 7, 2**62 + 9
    vals = [lo, -55, -1, 0, 3, 1017, hi]
    df = spark.createDataFrame([("g", v) for v in vals], "grp string, v long")
    got = {
        r["q_permille"]: (r["rank_k"], r["value"])
        for r in exact_group_quantiles(df, "v", "grp", (1, 500, 1000)).collect()
    }
    s = sorted(vals)
    assert got == {1: (1, s[0]), 500: (4, s[3]), 1000: (7, s[6])}


# ------------------------------------------------------------- q130 paths
def test_q130_session_boundaries_break_paths(spark, monkeypatch):
    """Path mining must honor the q22 session semantics: a 3-step path
    never spans a 30-minute gap, sub-3-event sessions contribute
    nothing, and counts replay a hand-computed log exactly."""
    import datetime as dt

    from pyspark.sql import Row

    from alt_spark.queries import events_q as eq

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, uid, etype, minutes):
        return Row(
            event_id=eid,
            ts=t0 + dt.timedelta(minutes=minutes),
            user_id=uid,
            event_type=etype,
            value=0.0,
            props="{}",
        )

    rows = [
        # user 1, session 1: A B C D -> paths A>B>C, B>C>D
        ev(1, 1, "A", 0),
        ev(2, 1, "B", 1),
        ev(3, 1, "C", 2),
        ev(4, 1, "D", 3),
        # 31-minute gap -> session 2: C D E -> path C>D>E (the would-be
        # D>C>D across the gap must NOT appear)
        ev(5, 1, "C", 34),
        ev(6, 1, "D", 35),
        ev(7, 1, "E", 36),
        # user 2: two events only -> no 3-step path
        ev(8, 2, "A", 0),
        ev(9, 2, "B", 1),
        # user 3: same-minute ties -> ordered by event_id: A B C
        ev(12, 3, "C", 5),
        ev(10, 3, "A", 5),
        ev(11, 3, "B", 5),
    ]
    df = spark.createDataFrame(rows)
    monkeypatch.setattr(eq, "load_table", lambda s, sf, name: df)
    got = {(r["path"], r["n"]) for r in eq.q130(spark, "ignored").collect()}
    assert got == {
        ("A>B>C", 2),  # user 1 session 1 + user 3 tie-ordered
        ("B>C>D", 1),
        ("C>D>E", 1),
    }
