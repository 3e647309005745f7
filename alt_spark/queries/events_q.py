"""Q20/Q21/Q22: event-fold / projection queries (SURVEY.md §2.K/E8, Phase 4).

Batch forms of the reference's CQRS projector folds. The streaming forms
(checkpointed replay, foreachBatch MERGE) live in alt_spark.streaming;
tests assert batch/stream parity (SURVEY §5 item 5). The declared batch
contract restricts the fold to its commutative subset (max / sum /
last-by-seq), so fold ≡ groupBy-agg and order of arrival is irrelevant —
exactly why it scales: one hash shuffle on user_id, partial aggregation
map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from alt_spark.catalog import load_table
from alt_spark.queries import query


# ---------------------------------------------------------------------------
@query(
    "q20_event_fold",
    oracle="""
SELECT user_id,
       max_by(ts, event_id) AS last_ts,
       max(value) AS max_value,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors,
       count(*) AS n_events
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def q20(spark: SparkSession, sf: str) -> DataFrame:
    """Event-log fold into a per-user projection (batch form).

    Reference: knowledge-sovereign/app/usecase/knowledge_home_projector/
    projector.go:446-509 (K2) with merge-safe ops per sql_fragments.go:13-20
    (D12): `last_ts` is last-by-sequence (max_by over event_id — the
    BIGSERIAL analog), `max_value` is the GREATEST-merge, counters are
    additive. All ops are commutative monoids, so the fold equals one
    groupBy — the streaming projector (alt_spark.streaming.projector)
    applies the same ops incrementally per micro-batch.
    """
    ev = load_table(spark, sf, "events")

    def cnt(t: str) -> F.Column:
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).cast("long")

    return (
        ev.groupBy("user_id")
        .agg(
            F.max_by("ts", "event_id").alias("last_ts"),
            F.max("value").alias("max_value"),
            cnt("click").alias("clicks"),
            cnt("view").alias("views"),
            cnt("error").alias("errors"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
@query(
    "q21_digest_counters",
    oracle="""
SELECT user_id,
       CAST(date_trunc('day', ts) AS DATE) AS day,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signups,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
       count(*) AS n_events
FROM events
GROUP BY 1, 2
ORDER BY user_id, day
""",
)
def q21(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user per-day digest counters (upsert-add semantics, batch form).

    Reference: projector.go:498-509 (D11) — today_digest counters folded
    additively per (user, day). Additive counters mean the streaming form
    is an idempotent MERGE-add; batch form is a plain two-key groupBy.
    """
    ev = load_table(spark, sf, "events")

    def cnt(t: str) -> F.Column:
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).cast("long")

    return (
        ev.groupBy("user_id", F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .agg(
            cnt("signup").alias("signups"),
            cnt("purchase").alias("purchases"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id", "day")
    )


# ---------------------------------------------------------------------------
@query(
    "q22_sessionization",
    oracle="""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus FROM events
), flagged AS (
  SELECT user_id,
         CASE WHEN tus - lag(tus) OVER w > 1800000000 OR lag(tus) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
)
SELECT user_id,
       CAST(sum(new_session) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM flagged
GROUP BY user_id
ORDER BY user_id
""",
)
def q22(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) — sessions per user.

    Reference shape: SURVEY §2 E8 (⊕ north-star op over `events`; the
    reference's analog is the projector's per-user activity stream).
    lag() over (user, ts) marks session starts; microsecond epoch on both
    engines so the 30-min threshold compares identically. The window is
    partitioned by user_id — per-user data is bounded, no global sort.
    The streaming twin is session_window(ts, '30 minutes') in
    alt_spark.streaming (K8).
    """
    ev = load_table(spark, sf, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("tus")
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.col("tus") - F.lag("tus").over(w) > 1_800_000_000, 1
        ).when(F.lag("tus").over(w).isNull(), 1).otherwise(0),
    )
    return (
        flagged.groupBy("user_id")
        .agg(
            F.sum("new_session").cast("long").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
@query(
    "q42_asof_prior_action",
    oracle="""
WITH prev AS (
  SELECT user_id, ts, event_type FROM (
    SELECT user_id, ts::TIMESTAMP AS ts, event_type,
           row_number() OVER (PARTITION BY user_id, ts::TIMESTAMP
                              ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type <> 'error'
  ) WHERE rn = 1
), err AS (
  SELECT user_id, ts::TIMESTAMP AS ts FROM events WHERE event_type = 'error'
)
SELECT p.event_type AS prior_type,
       count(*) AS n,
       round(avg((epoch_us(e.ts) - epoch_us(p.ts)) / 1e6), 3) AS avg_gap_s
FROM err e ASOF JOIN prev p
  ON e.user_id = p.user_id AND e.ts >= p.ts
GROUP BY 1
ORDER BY 1
""",
)
def q42(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: what was each user doing when an error hit?

    Every error event is matched to the same user's most recent
    at-or-before non-error event via operators/asof.py (⊕ north-star
    time-series op; the distributed union+window formulation — one hash
    shuffle on user_id, no pair materialization). DuckDB's native ASOF
    JOIN is the oracle. The right side is deduplicated to one row per
    (user, µs timestamp) — and both engines compare at µs — so the
    match is deterministic.
    """
    from alt_spark.operators.asof import asof_join

    ev = load_table(spark, sf, "events")
    err = ev.filter(F.col("event_type") == "error").select("user_id", "ts")
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    prev = (
        ev.filter(F.col("event_type") != "error")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "event_type")
    )
    j = asof_join(err, prev, on="user_id", how="inner")
    gap_s = (F.unix_micros("ts") - F.unix_micros("asof_matched_ts")) / 1e6
    return (
        j.groupBy(F.col("asof_event_type").alias("prior_type"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(gap_s), 3).alias("avg_gap_s"),
        )
        .orderBy("prior_type")
    )


# ---------------------------------------------------------------------------
@query(
    "q43_range_join_proximity",
    oracle="""
WITH err AS (
  SELECT event_id, ts::TIMESTAMP AS ts FROM events WHERE event_type = 'error'
), clk AS (
  SELECT ts::TIMESTAMP AS ts FROM events WHERE event_type = 'click'
)
SELECT e.event_id AS event_id,
       count(*) AS n_clicks_1h,
       round(avg(abs(epoch_us(e.ts) - epoch_us(c.ts)) / 1e6), 3) AS avg_abs_dt_s
FROM err e JOIN clk c
  ON abs(epoch_us(e.ts) - epoch_us(c.ts)) <= 3600000000
GROUP BY 1
ORDER BY 1
""",
)
def q43(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-wide proximity range join: clicks within ±1 h of each
    error event (no equi-key — the shape Spark alone would plan as a
    nested loop).

    operators/rangejoin.py buckets time into tolerance-width cells and
    equi-joins on the cell id (right side exploded to its 3 candidate
    cells), so the plan is hash-partitioned with a cheap post-filter;
    the oracle is DuckDB's native inequality join. Errors with no
    nearby click drop out (inner semantics) on both engines.
    """
    from alt_spark.operators.rangejoin import range_join

    ev = load_table(spark, sf, "events")
    err = ev.filter(F.col("event_type") == "error").select("event_id", "ts")
    clk = ev.filter(F.col("event_type") == "click").select("ts")
    j = range_join(err, clk, tolerance_s=3600.0)
    return (
        j.groupBy("event_id")
        .agg(
            F.count("*").alias("n_clicks_1h"),
            F.round(F.avg(F.abs(F.col("dt_s"))), 3).alias("avg_abs_dt_s"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
@query(
    "q44_rollup_cascade",
    oracle="""
WITH e AS (
  SELECT ts, event_type, CAST(round(value * 1000000) AS BIGINT) AS v_u
  FROM events
)
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
       event_type,
       count(*) AS n,
       round(sum(v_u) / 1000000.0, 4) AS sum_v,
       round(min(v_u) / 1000000.0, 4) AS min_v,
       round(max(v_u) / 1000000.0, 4) AS max_v,
       round((sum(v_u) / 1000000.0) / count(*), 4) AS avg_v
FROM e
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def q44(spark: SparkSession, sf: str) -> DataFrame:
    """Hypertable rollup cascade: the DAY level computed minute → hour →
    day from mergeable partials (operators/rollup.py), never re-scanning
    raw rows past the first level — the reference's SLI-MV + retention
    ladder generalized (009_create_sli_metrics.sql:21-44).

    The metric is declared over integer micro-units (round(value*1e6) as
    bigint): integer addition is associative, so cascaded sum-of-sums is
    EXACTLY the direct sum — no ordering-dependent double drift, no
    knife-edge rounding flake. Both engines divide the same integers at
    read time; min/max commute with the monotone scaling.
    """
    from alt_spark.operators.rollup import rollup_cascade

    ev = load_table(spark, sf, "events").withColumn(
        "v_u", F.round(F.col("value") * 1000000, 0).cast("long")
    )
    day = rollup_cascade(ev, keys=["event_type"], value_col="v_u")["day"]
    u = lambda c: F.col(c) / F.lit(1000000.0)  # noqa: E731
    return day.select(
        "bucket",
        "event_type",
        "n",
        F.round(u("sum_v"), 4).alias("sum_v"),
        F.round(u("min_v"), 4).alias("min_v"),
        F.round(u("max_v"), 4).alias("max_v"),
        F.round(u("sum_v") / F.col("n"), 4).alias("avg_v"),
    ).orderBy("bucket", "event_type")


def cohort_matrix(user_weeks: DataFrame) -> DataFrame:
    """The cohort-retention derivation shared by batch q107 and the
    streaming projection parity test (one implementation — review
    finding, r8): from a (user_id, wk) activity frame (duplicates
    fine; collect_set dedupes) to the ordered cohort matrix."""
    per_user = user_weeks.groupBy("user_id").agg(
        F.min("wk").alias("cohort_wk"), F.collect_set("wk").alias("wks")
    )
    cell = (
        per_user.select("user_id", "cohort_wk", F.explode("wks").alias("wk"))
        .groupBy(
            "cohort_wk",
            F.expr("datediff(wk, cohort_wk) div 7").cast("long").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
    base = F.max(
        F.when(F.col("week_offset") == 0, F.col("n_active"))
    ).over(Window.partitionBy("cohort_wk"))
    return (
        cell.withColumn("base", base)
        .withColumn(
            "retained_permyriad",
            F.expr("(10000 * n_active) div base").cast("long"),
        )
        .drop("base")
        .orderBy("cohort_wk", "week_offset")
    )


# ---------------------------------------------------------------------------
@query(
    "q107_cohort_retention",
    oracle="""
WITH act AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events
), cohort AS (
  SELECT user_id, min(wk) AS cohort_wk FROM act GROUP BY user_id
), cell AS (
  SELECT c.cohort_wk,
         CAST(date_diff('day', c.cohort_wk, a.wk) // 7 AS BIGINT) AS week_offset,
         count(DISTINCT a.user_id) AS n_active
  FROM act a JOIN cohort c ON a.user_id = c.user_id
  GROUP BY 1, 2
)
SELECT cohort_wk, week_offset, n_active,
       CAST((10000 * n_active) // max(CASE WHEN week_offset = 0 THEN n_active END)
            OVER (PARTITION BY cohort_wk) AS BIGINT) AS retained_permyriad
FROM cell
ORDER BY cohort_wk, week_offset
""",
)
def q107(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly cohort-retention matrix: users grouped by first-seen
    week, each cell the count still active N weeks later plus exact
    permyriad retention vs the cohort's week-0 size — the dashboard
    read model behind every product-analytics retention chart (the
    reference's trend-stats family, D8/C3, extended to the derived-
    cohort shape it lacks).

    Plan (100 TB shape): ONE corpus-wide exchange — per-user groupBy
    collecting the bounded distinct-week set and its min (weeks per
    user are calendar-bounded, the collect_set cannot blow up) — then
    an in-row explode of that bounded set and a |cohorts x offsets|-
    bounded aggregate; the permyriad column is a window over the
    bounded matrix. No corpus-scale join, no second shuffle of raw
    events. date_trunc('week') is ISO-Monday in BOTH engines.
    """
    ev = load_table(spark, sf, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    )
    return cohort_matrix(ev)


# ---------------------------------------------------------------------------
@query(
    "q108_conversion_funnel",
    oracle="""
WITH s1 AS (
  SELECT user_id, min(ts) AS s FROM events WHERE event_type = 'signup' GROUP BY 1
), s2 AS (
  SELECT e.user_id, min(e.ts) AS c
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.s AND e.ts <= s1.s + INTERVAL 7 DAY
  GROUP BY 1
), s3 AS (
  SELECT e.user_id, min(e.ts) AS p
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.c AND e.ts <= s2.c + INTERVAL 7 DAY
  GROUP BY 1
), n AS (
  SELECT (SELECT count(*) FROM s1) AS n1,
         (SELECT count(*) FROM s2) AS n2,
         (SELECT count(*) FROM s3) AS n3
)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS stage, 'signup' AS step, n1 AS n_users,
         CAST(10000 AS BIGINT) AS conv_from_prev_pm,
         CAST(10000 AS BIGINT) AS conv_from_start_pm FROM n
  UNION ALL
  SELECT 2, 'click', n2,
         CAST((10000 * n2) // greatest(n1, 1) AS BIGINT),
         CAST((10000 * n2) // greatest(n1, 1) AS BIGINT) FROM n
  UNION ALL
  SELECT 3, 'purchase', n3,
         CAST((10000 * n3) // greatest(n2, 1) AS BIGINT),
         CAST((10000 * n3) // greatest(n1, 1) AS BIGINT) FROM n
) ORDER BY stage
""",
)
def q108(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered conversion funnel (signup -> first click within 7 days
    -> first purchase within 7 days of that click): per stage, users
    surviving plus exact permyriad conversion vs the previous stage
    and vs funnel entry — the ORDERED-sequence analytics shape q92's
    gate funnel (flags on one row) cannot express, because each stage's
    deadline depends on WHEN the previous stage happened.

    Plan (100 TB shape): ONE corpus-wide exchange — per-user groupBy
    collecting the three bounded per-type timestamp lists — then the
    whole stage chain is an in-row fold (array_min over interval-
    filtered lists; a user's own events bound the state), one 1-row
    aggregate, and a 3-row explode. The oracle takes the relational
    route (three correlated stage CTEs) — same semantics, independent
    formulation.
    """
    ev = load_table(spark, sf, "events").filter(
        F.col("event_type").isin("signup", "click", "purchase")
    )

    def ts_list(t: str):
        return F.collect_list(
            F.when(F.col("event_type") == t, F.col("ts"))
        ).alias(t + "s")

    per_user = ev.groupBy("user_id").agg(
        ts_list("signup"), ts_list("click"), ts_list("purchase")
    )
    week = F.expr("INTERVAL 7 DAYS")
    s = F.array_min("signups")
    staged = per_user.withColumn("s", s)
    c = F.array_min(
        F.filter(
            F.col("clicks"),
            lambda x: (x > F.col("s")) & (x <= F.col("s") + week),
        )
    )
    staged = staged.withColumn("c", c)
    p = F.array_min(
        F.filter(
            F.col("purchases"),
            lambda x: (x > F.col("c")) & (x <= F.col("c") + week),
        )
    )
    staged = staged.withColumn("p", p)
    n = staged.agg(
        F.count("s").alias("n1"), F.count("c").alias("n2"), F.count("p").alias("n3")
    )
    row = F.array(
        F.struct(
            F.lit(1).cast("long").alias("stage"),
            F.lit("signup").alias("step"),
            F.col("n1").alias("n_users"),
            F.lit(10000).cast("long").alias("conv_from_prev_pm"),
            F.lit(10000).cast("long").alias("conv_from_start_pm"),
        ),
        F.struct(
            F.lit(2).cast("long").alias("stage"),
            F.lit("click").alias("step"),
            F.col("n2").alias("n_users"),
            F.expr("(10000 * n2) div greatest(n1, 1)").cast("long").alias(
                "conv_from_prev_pm"
            ),
            F.expr("(10000 * n2) div greatest(n1, 1)").cast("long").alias(
                "conv_from_start_pm"
            ),
        ),
        F.struct(
            F.lit(3).cast("long").alias("stage"),
            F.lit("purchase").alias("step"),
            F.col("n3").alias("n_users"),
            F.expr("(10000 * n3) div greatest(n2, 1)").cast("long").alias(
                "conv_from_prev_pm"
            ),
            F.expr("(10000 * n3) div greatest(n1, 1)").cast("long").alias(
                "conv_from_start_pm"
            ),
        ),
    )
    return (
        n.select(F.explode(row).alias("r"))
        .select("r.*")
        .orderBy("stage")
    )


# Loud envelope for the LONG sumsq accumulation below: a 60-bucket sum
# of n^2 stays under 2^63 iff every bucket count n <= sqrt(2^63/60)
# ~ 3.92e8. 3.9e8 events per minute for ONE series key (~6.5M/s
# sustained) is ~6x the reference's entire-ingest target, so the guard
# is headroom, not a constraint — and crossing it RAISES rather than
# wrapping silently (the q110 strict-guard doctrine; silent wrap is
# exactly the r8 defect class).
_ANOM_N_MAX = 390_000_000


def anomaly_flags(buckets: DataFrame) -> DataFrame:
    """The integer 3-sigma flag derivation shared by batch q109 and the
    streaming projection parity test (one implementation — review
    finding, r8): from a pre-aggregated (event_type, bucket, n) series
    to the ordered flagged frame."""
    win = Window.partitionBy("event_type").orderBy("bucket").rowsBetween(-60, -1)
    # The squared-COMPARISON operands live in DECIMAL(38,0), not LONG
    # (the q74 device): with ANSI off a LONG multiply WRAPS silently,
    # so the old all-long form was silently wrong (and diverged from
    # the oracle, which errors) once (k*n-s)^2*(k-1) crossed 2^63 —
    # per-minute-per-key counts of only ~2e6 with k=60, 20x below the
    # envelope the r8 docstring claimed (ADVICE r8, medium).
    #
    # The sumsq ACCUMULATION, by contrast, runs in LONG under a LOUD
    # per-row guard (n <= _ANOM_N_MAX keeps the 60-bucket sum of n^2
    # under 2^63; past it the assert raises — never a silent wrap).
    # VERDICT r9 item 4's A/B (sf0.1, interleaved best-of-3, identical
    # oracle hash): decimal-accumulated 2.36-2.94 s vs long-accumulated
    # 1.20-1.39 s — the sliding decimal SUM was the whole q109
    # regression, so the decimal arithmetic is confined to the
    # window-aggregate OUTPUTS where exactness actually needs it.
    # Beyond the guard the decimal comparison itself is good to
    # n < ~2e15 before any operand leaves 38 digits; the HUGEINT
    # oracle stays exact to ~1.7e38 — documented residual, far outside
    # any real series.
    dec = "decimal(38,0)"
    guarded_sq = F.when(
        F.assert_true(
            F.col("n") <= F.lit(_ANOM_N_MAX),
            F.lit(
                "anomaly_flags: per-bucket count exceeds the long sumsq"
                f" envelope ({_ANOM_N_MAX})"
            ),
        ).isNull(),
        F.col("n") * F.col("n"),
    )
    w = (
        buckets.withColumn("win_k", F.count("*").over(win).cast("long"))
        .withColumn("win_sum", F.coalesce(F.sum("n").over(win), F.lit(0)).cast("long"))
        .withColumn(
            "win_sumsq",
            F.coalesce(F.sum(guarded_sq).over(win), F.lit(0)).cast("long"),
        )
    )
    d = F.col("win_k").cast(dec) * F.col("n") - F.col("win_sum")
    spike = (
        (F.col("win_k") >= 30)
        & (d > 0)
        & (
            d * d * (F.col("win_k") - 1).cast(dec)
            >= F.lit(9).cast(dec)
            * F.col("win_k")
            * (
                F.col("win_k").cast(dec) * F.col("win_sumsq").cast(dec)
                - F.col("win_sum").cast(dec) * F.col("win_sum")
            )
        )
    )
    return w.select(
        "event_type",
        "bucket",
        "n",
        "win_k",
        "win_sum",
        F.when(spike, 1).otherwise(0).cast("long").alias("is_spike"),
    ).orderBy("event_type", "bucket")



# ---------------------------------------------------------------------------
@query(
    "q109_sli_anomaly_flags",
    oracle="""
WITH b AS (
  SELECT event_type, date_trunc('minute', ts) AS bucket, count(*) AS n
  FROM events GROUP BY 1, 2
), w AS (
  SELECT event_type, bucket, n,
         CAST(count(*) OVER win AS BIGINT) AS win_k,
         CAST(coalesce(sum(n) OVER win, 0) AS BIGINT) AS win_sum,
         CAST(coalesce(sum(CAST(n AS HUGEINT) * n) OVER win, 0) AS HUGEINT) AS win_sumsq
  FROM b
  WINDOW win AS (PARTITION BY event_type ORDER BY bucket
                 ROWS BETWEEN 60 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, bucket, n, win_k, win_sum,
       CAST(CASE WHEN win_k >= 30 AND (CAST(win_k AS HUGEINT) * n - win_sum) > 0
                  AND (CAST(win_k AS HUGEINT) * n - win_sum)
                      * (CAST(win_k AS HUGEINT) * n - win_sum) * (win_k - 1)
                      >= 9 * win_k * (win_k * win_sumsq
                                      - CAST(win_sum AS HUGEINT) * win_sum)
            THEN 1 ELSE 0 END AS BIGINT) AS is_spike
FROM w
ORDER BY event_type, bucket
""",
)
def q109(spark: SparkSession, sf: str) -> DataFrame:
    """SLI anomaly flags: per (event_type, minute) throughput with a
    3-sigma spike flag against the trailing 60 observed buckets — the
    alerting read model on top of the q02 SLI series (the reference's
    primary log-analytics category; its dashboards read sli_metrics,
    clickhouse/migrations/009, and alerting on that series is the
    canonical consumer).

    The spike DECISION is exact integer arithmetic — the z >= 3 test
    is squared into (k*n - s)^2 * (k-1) >= 9k * (k*sumsq - s^2), so no
    float ever crosses the oracle boundary and bucket flags replay
    bit-for-bit (the q75/q94 doctrine applied to variance). The squared
    COMPARISON operands are DECIMAL(38,0) on the Spark side and HUGEINT
    in the oracle (the q74 device — ADVICE r8 corrected the old
    all-LONG form, whose true safe envelope was only ~2e6
    per-minute-per-key before a silent 2^63 wrap). The sumsq
    ACCUMULATION is LONG under a loud per-row guard (n <= 3.9e8 per
    minute-bucket, ~6x the reference's entire-ingest rate for ONE
    series key; crossing it raises, never wraps) — VERDICT r9 item 4's
    A/B showed the sliding decimal SUM was the whole r9 q109
    regression (sf0.1: 2.36-2.94 s decimal-accumulated vs 1.20-1.39 s
    long-accumulated, identical oracle hash), so decimal is confined
    to the window-aggregate outputs. Warm-up (fewer than 30 trailing
    buckets) never flags. The exact-arithmetic derivation lives in
    :func:`anomaly_flags`, shared with the streaming parity test.

    Plan (100 TB shape): the q02 pre-aggregation is the ONLY
    corpus-scale exchange; the window runs per event_type over the
    minute-grain series — bounded by calendar x key cardinality, never
    by corpus size (and the production key is (service, event_type),
    finer still). No global sort: the window is hash-partitioned on
    the series key.
    """
    ev = load_table(spark, sf, "events")
    b = ev.groupBy(
        "event_type", F.date_trunc("minute", F.col("ts")).alias("bucket")
    ).agg(F.count("*").alias("n"))
    return anomaly_flags(b)


# ---------------------------------------------------------------------------
# q130: session path mining — the DISCOVERY sibling of q108's fixed
# funnel: instead of checking one declared view→cart→purchase path,
# surface the top recurring 3-step event-type paths actually taken
# inside sessions (q22's exact 30-minute-gap session semantics, shared
# verbatim so the families compose). This is the product-analytics read
# model behind "most common journeys" dashboards.
_PATH_TOP = 20


@query(
    "q130_session_paths",
    oracle="""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus FROM events
), flagged AS (
  SELECT user_id, event_id, event_type, tus,
         CASE WHEN tus - lag(tus) OVER w > 1800000000 OR lag(tus) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
), sess AS (
  SELECT user_id, event_id, event_type, tus,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM flagged
), steps AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER s AS e2,
         lead(event_type, 2) OVER s AS e3
  FROM sess
  WINDOW s AS (PARTITION BY user_id, session_id ORDER BY tus, event_id)
)
SELECT e1 || '>' || e2 || '>' || e3 AS path, count(*) AS n
FROM steps WHERE e3 IS NOT NULL
GROUP BY 1
ORDER BY n DESC, path
LIMIT 20
""",
)
def q130(spark: SparkSession, sf: str) -> DataFrame:
    """Top recurring 3-step session paths: sessionize exactly as q22
    (30-minute inactivity gap, (ts, event_id) total order), slide a
    3-event window inside each session with lead(), and count each
    event-type path — funnel DISCOVERY next to q108's fixed-funnel
    check. Counts are exact integers; the top cut is total-ordered by
    (n desc, path).

    Plan (100 TB shape): both windows are partitioned by user (then
    (user, session)) — per-user history is bounded, no global sort of
    events; the path count is ONE map-side-combinable aggregate whose
    key space is |event_type|^3 (bounded by content); the final cut is
    TakeOrdered. The session assembly reuses q22's exact semantics so
    the E8 family cannot drift apart.
    """
    ev = load_table(spark, sf, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("tus")
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(F.col("tus") - F.lag("tus").over(w) > 1_800_000_000, 1)
        .when(F.lag("tus").over(w).isNull(), 1)
        .otherwise(0),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    s = Window.partitionBy("user_id", "session_id").orderBy("tus", "event_id")
    steps = sess.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(s).alias("e2"),
        F.lead("event_type", 2).over(s).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    # NULL semantics must match the oracle's `e1 || '>' || e2 || '>' ||
    # e3`, which NULLs the whole path — concat_ws would silently SKIP a
    # NULL element instead (latent cross-engine divergence if
    # events.event_type is ever NULL; the schema permits it). e3 is
    # already filtered NOT NULL above; lead() windows mean e1 NULL ⇒
    # e2/e3 NULL too, so filtering e3 covers the chain for non-NULL
    # event_type data — the NULL-propagating concat() makes the
    # agreement unconditional.
    return (
        steps.groupBy(
            F.concat("e1", F.lit(">"), "e2", F.lit(">"), "e3").alias("path")
        )
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(_PATH_TOP)
    )
