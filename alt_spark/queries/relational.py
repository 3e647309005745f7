"""Q01–Q16: relational core (SURVEY.md §2.Q, Phase 1).

Each query instantiates one reference query shape on the driver's
testdata; reference citations are in each docstring. Spark side is pure
DataFrame API (Catalyst handles pushdown/pruning/join selection); oracle
side is ANSI SQL for DuckDB. Both round floats identically and end in a
fully deterministic ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from alt_spark.catalog import load_table
from alt_spark.queries import query


# ---------------------------------------------------------------------------
@query(
    "q01_endpoint_stats",
    oracle="""
SELECT event_type,
       count(*) AS request_count,
       round(avg(value), 2) AS avg_value,
       CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS high_value_count,
       round(CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS DOUBLE) * 100.0 / count(*), 2) AS high_ratio_pct
FROM events
GROUP BY event_type
ORDER BY request_count DESC, event_type
""",
)
def q01(spark: SparkSession, sf: str) -> DataFrame:
    """HTTP endpoint stats: grouped count/avg + countIf + ratio-of-aggregates.

    Reference: metrics/src/alt_metrics/collectors/http.py:31-47 (B2+D1+D2+D3+F1).
    """
    ev = load_table(spark, sf, "events")
    high = F.sum(F.when(F.col("value") > 100, 1).otherwise(0))
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("request_count"),
            F.round(F.avg("value"), 2).alias("avg_value"),
            high.alias("high_value_count"),
            F.round(high.cast("double") * 100.0 / F.count("*"), 2).alias("high_ratio_pct"),
        )
        .orderBy(F.desc("request_count"), "event_type")
    )


# ---------------------------------------------------------------------------
@query(
    "q02_sli_error_rate",
    oracle="""
SELECT date_trunc('minute', ts) AS bucket,
       count(*) AS total,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors,
       round(CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS error_rate
FROM events
GROUP BY 1
ORDER BY 1
""",
)
def q02(spark: SparkSession, sf: str) -> DataFrame:
    """1-minute SLI error rate — the reference's flagship incremental MV.

    Reference: clickhouse/migrations/009_create_sli_metrics.sql:21-31 (D8+D9).
    Batch form here; alt_spark.streaming.mv runs the same SELECT as a
    Structured Streaming query.
    """
    ev = load_table(spark, sf, "events")
    errors = F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
    return (
        ev.groupBy(F.date_trunc("minute", "ts").alias("bucket"))
        .agg(
            F.count("*").alias("total"),
            errors.alias("errors"),
            F.round(errors.cast("double") / F.count("*"), 4).alias("error_rate"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
@query(
    "q03_trend_buckets_full_outer",
    oracle="""
WITH o AS (
  SELECT date_trunc('day', o_orderdate) AS bucket, count(*) AS order_cnt
  FROM orders GROUP BY 1
), e AS (
  SELECT date_trunc('day', ts) AS bucket, count(*) AS event_cnt
  FROM events GROUP BY 1
)
SELECT coalesce(o.bucket, e.bucket) AS bucket,
       coalesce(o.order_cnt, 0) AS order_cnt,
       coalesce(e.event_cnt, 0) AS event_cnt
FROM o FULL OUTER JOIN e ON o.bucket = e.bucket
ORDER BY bucket
""",
)
def q03(spark: SparkSession, sf: str) -> DataFrame:
    """Daily trend buckets aligned by FULL OUTER JOIN + COALESCE.

    Reference: alt-backend/app/shared/driver/alt_db/fetch_trend_stats_driver.go:141-178
    (D8 + C3). Both sides aggregate before the join, so the outer join
    shuffles tiny bucket-level rows, not raw facts.
    """
    o = (
        load_table(spark, sf, "orders")
        .groupBy(F.to_date("o_orderdate").alias("bucket"))
        .agg(F.count("*").alias("order_cnt"))
    )
    e = (
        load_table(spark, sf, "events")
        .groupBy(F.to_date("ts").alias("bucket"))
        .agg(F.count("*").alias("event_cnt"))
    )
    return (
        o.join(e, "bucket", "full_outer")
        .select(
            F.col("bucket"),
            F.coalesce("order_cnt", F.lit(0)).alias("order_cnt"),
            F.coalesce("event_cnt", F.lit(0)).alias("event_cnt"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
@query(
    "q04_latency_quantiles",
    oracle="""
SELECT event_type,
       round(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 4) AS p50,
       round(percentile_cont(0.95) WITHIN GROUP (ORDER BY value), 4) AS p95,
       round(percentile_cont(0.99) WITHIN GROUP (ORDER BY value), 4) AS p99,
       round(max(value), 4) AS max_value
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def q04(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated quantiles per group.

    Reference: metrics/src/alt_metrics/collectors/traces.py:42-45 (D4).
    Declared as exact percentile_cont for oracle parity; at 100 TB the
    fast path swaps in percentile_approx (see bench notes).
    """
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
            F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
@query(
    "q05_event_type_pairs",
    oracle="""
SELECT e1.event_type AS type_a, e2.event_type AS type_b, count(*) AS pair_cnt
FROM events e1
JOIN events e2
  ON e1.user_id = e2.user_id
 AND date_trunc('day', e1.ts) = date_trunc('day', e2.ts)
 AND e1.event_id < e2.event_id
 AND e1.event_type <> e2.event_type
GROUP BY 1, 2
ORDER BY pair_cnt DESC, type_a, type_b
LIMIT 20
""",
)
def q05(spark: SparkSession, sf: str) -> DataFrame:
    """Self-join dependency-graph shape (parent/child span pairs).

    Reference: metrics/src/alt_metrics/collectors/traces.py:207-222 (C5).
    The reference joins within a *trace* (naturally bounded); the declared
    analog joins within (user, day), so per-key fanout is bounded by one
    user's daily activity instead of their lifetime history — a Zipfian
    power user cannot produce a quadratic straggler task at 100×. The
    composite (user_id, day) equi-key is the shuffle key; the inequality
    predicates are residual filters.
    """
    ev = load_table(spark, sf, "events").select(
        "user_id", "event_id", "event_type", F.to_date("ts").alias("day")
    )
    e1 = ev.alias("e1")
    e2 = ev.alias("e2")
    return (
        e1.join(
            e2,
            (F.col("e1.user_id") == F.col("e2.user_id"))
            & (F.col("e1.day") == F.col("e2.day"))
            & (F.col("e1.event_id") < F.col("e2.event_id"))
            & (F.col("e1.event_type") != F.col("e2.event_type")),
        )
        .groupBy(
            F.col("e1.event_type").alias("type_a"),
            F.col("e2.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("pair_cnt"))
        .orderBy(F.desc("pair_cnt"), "type_a", "type_b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
@query(
    "q06_part_cooccurrence",
    oracle="""
SELECT l1.l_partkey AS part_a, l2.l_partkey AS part_b,
       count(DISTINCT l1.l_orderkey) AS cooccur_cnt
FROM lineitem l1
JOIN lineitem l2
  ON l1.l_orderkey = l2.l_orderkey
 AND l1.l_partkey < l2.l_partkey
GROUP BY 1, 2
HAVING count(DISTINCT l1.l_orderkey) >= 2
ORDER BY cooccur_cnt DESC, part_a, part_b
LIMIT 50
""",
)
def q06(spark: SparkSession, sf: str) -> DataFrame:
    """Theta self-join co-occurrence (tag pairs on shared articles).

    Reference: alt-backend/.../fetch_tag_cooccurrence_driver.go:19-34 (C4)
    — note the reference CTE-prefilters before its self-join; the Spark
    analog pre-distincts (order, part) so the join input shrinks and the
    expensive COUNT(DISTINCT) degenerates to COUNT(*): pairs are unique
    per order by construction. Same result, one cheaper aggregate and a
    smaller quadratic term per order.
    """
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey").distinct()
    l1 = li.alias("l1")
    l2 = li.alias("l2")
    return (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_partkey") < F.col("l2.l_partkey")),
        )
        .groupBy(
            F.col("l1.l_partkey").alias("part_a"),
            F.col("l2.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("cooccur_cnt"))
        .filter(F.col("cooccur_cnt") >= 2)
        .orderBy(F.desc("cooccur_cnt"), "part_a", "part_b")
        .limit(50)
    )


# ---------------------------------------------------------------------------
@query(
    "q07_orders_item_counts",
    oracle="""
SELECT o.o_orderkey, count(l.l_orderkey) AS item_cnt
FROM orders o
LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderkey
ORDER BY o.o_orderkey
""",
)
def q07(spark: SparkSession, sf: str) -> DataFrame:
    """Left join + aggregate, keeping unmatched left rows (count = 0).

    Reference: alt-backend/.../fetch_recent_articles_driver.go:35-49 (C2).
    """
    o = load_table(spark, sf, "orders").select("o_orderkey")
    li = load_table(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("li_orderkey")
    )
    return (
        o.join(li, o.o_orderkey == li.li_orderkey, "left")
        .groupBy("o_orderkey")
        .agg(F.count("li_orderkey").alias("item_cnt"))
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
@query(
    "q08_customers_without_orders",
    oracle="""
SELECT count(*) AS cnt
FROM customer c
LEFT JOIN (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1997-01-01'
) o ON c.c_custkey = o.o_custkey
WHERE o.o_custkey IS NULL
""",
)
def q08(spark: SparkSession, sf: str) -> DataFrame:
    """Anti-join: customers with no orders in a window.

    Reference: alt-backend/.../fetch_today_unread_articles_count_driver.go:26-31 (C6).
    Spark side uses a true left_anti join (no null-filter trick needed).
    """
    c = load_table(spark, sf, "customer").select("c_custkey")
    o = (
        load_table(spark, sf, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("o_custkey")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(
        F.count("*").alias("cnt")
    )


# ---------------------------------------------------------------------------
@query(
    "q09_building_orders_per_day",
    oracle="""
SELECT date_trunc('day', o_orderdate) AS bucket, count(*) AS order_cnt
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
GROUP BY 1
ORDER BY 1
""",
)
def q09(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-join (IN-subquery) + daily buckets.

    Reference: alt-backend/.../fetch_trend_stats_driver.go:163-165 (C7).
    Customer side is small → Catalyst broadcasts the semi-join build side.
    """
    o = load_table(spark, sf, "orders").select("o_custkey", "o_orderdate")
    c = (
        load_table(spark, sf, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_semi")
        .groupBy(F.to_date("o_orderdate").alias("bucket"))
        .agg(F.count("*").alias("order_cnt"))
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
@query(
    "q10_rrf_suppliers",
    oracle="""
WITH by_bal AS (
  SELECT s_suppkey, rank() OVER (ORDER BY s_acctbal DESC) AS r FROM supplier
), counts AS (
  SELECT l_suppkey AS s_suppkey, count(*) AS cnt FROM lineitem GROUP BY 1
), by_cnt AS (
  SELECT s_suppkey, rank() OVER (ORDER BY cnt DESC) AS r FROM counts
), unioned AS (
  SELECT s_suppkey, r FROM by_bal
  UNION ALL
  SELECT s_suppkey, r FROM by_cnt
)
SELECT s_suppkey, round(sum(CAST(1.0 AS DOUBLE) / (r + 60)), 6) AS rrf_score
FROM unioned
GROUP BY s_suppkey
ORDER BY rrf_score DESC, s_suppkey
LIMIT 10
""",
)
def q10(spark: SparkSession, sf: str) -> DataFrame:
    """Hybrid RRF fusion: two rankings → rank() → UNION ALL → Σ 1/(rank+60).

    Reference: rag-orchestrator/internal/adapter/repository/hybrid_search_repo.go:71-110
    (E1+G1+J9, k=60 at :46-49). rank() (not row_number) keeps ties
    deterministic across engines.
    """
    sup = load_table(spark, sf, "supplier")
    li = load_table(spark, sf, "lineitem")
    by_bal = sup.select(
        "s_suppkey", F.rank().over(Window.orderBy(F.desc("s_acctbal"))).alias("r")
    )
    counts = li.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        F.count("*").alias("cnt")
    )
    by_cnt = counts.select(
        "s_suppkey", F.rank().over(Window.orderBy(F.desc("cnt"))).alias("r")
    )
    return (
        by_bal.unionByName(by_cnt)
        .groupBy("s_suppkey")
        .agg(F.round(F.sum(F.lit(1.0) / (F.col("r") + 60)), 6).alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), "s_suppkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
@query(
    "q11_latest_order_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
)
WHERE rn = 1
ORDER BY o_custkey
""",
)
def q11(spark: SparkSession, sf: str) -> DataFrame:
    """Top-1 per group (LATERAL ... LIMIT 1 / DISTINCT ON shape).

    Reference: knowledge-sovereign/app/driver/sovereign_db/read_lens.go:57-63 (C8/E3/E4).
    """
    o = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        o.select("o_custkey", "o_orderkey", "o_orderdate", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
_Q12_ANCHOR = "2001-09-01"

@query(
    "q12_decay_ranking",
    oracle=f"""
SELECT o_orderkey,
       round(o_totalprice / (1 + greatest(
         CAST(date_diff('second', o_orderdate, TIMESTAMP '{_Q12_ANCHOR}') AS DOUBLE) / 86400.0,
         CAST(0 AS DOUBLE))), 4) AS decayed_score
FROM orders
ORDER BY decayed_score DESC, o_orderkey
LIMIT 100
""",
)
def q12(spark: SparkSession, sf: str) -> DataFrame:
    """Read-time decay ranking with a pagination-stable as-of anchor.

    Reference: knowledge-sovereign/.../sql_fragments.go:38-40 (E5):
    score / (1 + GREATEST(epoch(asOf - published_at)/86400, 0)). The
    anchor is a bound literal, never now() — reference rule
    sql_fragments.go:22-31.
    """
    o = load_table(spark, sf, "orders")
    age_days = (
        F.unix_timestamp(F.lit(_Q12_ANCHOR).cast("timestamp"))
        - F.unix_timestamp("o_orderdate")
    ).cast("double") / F.lit(86400.0)
    score = F.round(
        F.col("o_totalprice") / (F.lit(1) + F.greatest(age_days, F.lit(0.0))), 4
    )
    return (
        o.select("o_orderkey", score.alias("decayed_score"))
        .orderBy(F.desc("decayed_score"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
@query(
    "q13_keyset_pagination",
    oracle="""
WITH cursor AS (
  SELECT o_orderdate AS cd, o_orderkey AS ck
  FROM (
    SELECT o_orderdate, o_orderkey FROM orders
    ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 20
  )
  ORDER BY o_orderdate ASC, o_orderkey ASC LIMIT 1
)
SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice
FROM orders o, cursor
WHERE o.o_orderdate < cursor.cd
   OR (o.o_orderdate = cursor.cd AND o.o_orderkey < cursor.ck)
ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
LIMIT 20
""",
)
def q13(spark: SparkSession, sf: str) -> DataFrame:
    """Keyset (cursor) pagination: tuple-compare predicate, page 2.

    Reference: knowledge-sovereign/.../read_projections.go:185-192, simple
    form alt-backend/.../fetch_articles_cursor_driver.go:96-102 (E6).
    The cursor is derived deterministically as the last row of page 1;
    at scale the tuple predicate prunes instead of OFFSET-scanning.
    """
    o = load_table(spark, sf, "orders")
    page1 = o.select("o_orderdate", "o_orderkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    ).limit(20)
    cursor = page1.orderBy("o_orderdate", "o_orderkey").limit(1).select(
        F.col("o_orderdate").alias("cd"), F.col("o_orderkey").alias("ck")
    )
    return (
        o.crossJoin(F.broadcast(cursor))
        .filter(
            (F.col("o_orderdate") < F.col("cd"))
            | ((F.col("o_orderdate") == F.col("cd")) & (F.col("o_orderkey") < F.col("ck")))
        )
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
@query(
    "q14_paged_window_count",
    oracle="""
SELECT l_orderkey, l_linenumber, l_shipdate, total_cnt
FROM (
  SELECT l_orderkey, l_linenumber, l_shipdate, count(*) OVER () AS total_cnt
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-02-01'
)
ORDER BY l_shipdate, l_orderkey, l_linenumber
OFFSET 10 LIMIT 10
""",
)
def q14(spark: SparkSession, sf: str) -> DataFrame:
    """Total count alongside an OFFSET/LIMIT page.

    Reference: alt-backend/.../recap_articles_driver.go:18-30 (E2+F3).
    Spark side computes the total as a 1-row aggregate broadcast-joined
    back instead of `count(*) OVER ()` — same semantics, but avoids
    collapsing the scan into a single window partition at 100 TB.
    """
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_shipdate")
    total = li.agg(F.count("*").alias("total_cnt"))
    return (
        li.crossJoin(F.broadcast(total))
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .offset(10)
        .limit(10)
    )


# ---------------------------------------------------------------------------
@query(
    "q15_brand_order_counts",
    oracle="""
SELECT p_brand, count(DISTINCT l_orderkey) AS order_cnt
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
GROUP BY p_brand
HAVING count(DISTINCT l_orderkey) > 0
ORDER BY order_cnt DESC, p_brand
LIMIT 25
""",
)
def q15(spark: SparkSession, sf: str) -> DataFrame:
    """Tag-cloud shape: COUNT(DISTINCT) + HAVING + top-k.

    Reference: alt-backend/.../fetch_tag_cloud_driver.go:13-20 (D5+D7).
    part is a dim → broadcast; the distinct-count shuffles once on brand.
    """
    p = load_table(spark, sf, "part").select("p_partkey", "p_brand")
    li = load_table(spark, sf, "lineitem").select("l_partkey", "l_orderkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.countDistinct("l_orderkey").alias("order_cnt"))
        .filter(F.col("order_cnt") > 0)
        .orderBy(F.desc("order_cnt"), "p_brand")
        .limit(25)
    )


# ---------------------------------------------------------------------------
@query(
    "q16_conditional_extraction",
    oracle="""
SELECT event_type,
       CAST(sum(k) AS BIGINT) AS k_sum,
       round(avg(CASE WHEN event_type IN ('click', 'view') THEN k ELSE 0 END), 2) AS browse_k_avg
FROM (
  SELECT event_type,
         coalesce(CAST(nullif(regexp_extract(props, '"k": (\\d+)', 1), '') AS INTEGER), 0) AS k
  FROM events
)
GROUP BY event_type
ORDER BY event_type
""",
)
def q16(spark: SparkSession, sf: str) -> DataFrame:
    """Conditional per-producer extraction with OrZero-style safe casts.

    Reference: clickhouse/migrations/003_create_http_logs_mv.sql:55-65 (B4+B5):
    if(service_name='nginx', fields['http_method'], fields['method']) and
    toUInt16OrZero — here regexp extraction from the JSON props column,
    coalesce(cast, 0), branch on event_type.
    """
    ev = load_table(spark, sf, "events")
    k = F.coalesce(
        F.nullif(F.regexp_extract("props", r'"k": (\d+)', 1), F.lit("")).cast("int"),
        F.lit(0),
    )
    rows = ev.select("event_type", k.alias("k"))
    return (
        rows.groupBy("event_type")
        .agg(
            F.sum("k").alias("k_sum"),
            F.round(
                F.avg(
                    F.when(F.col("event_type").isin("click", "view"), F.col("k")).otherwise(0)
                ),
                2,
            ).alias("browse_k_avg"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
@query("q71_latency_quantiles_approx")
def q71(spark: SparkSession, sf: str) -> DataFrame:
    """The D4 scale twin: ``percentile_approx`` (Greenwald-Khanna
    sketch) over the same groups as q04's exact form. Rows-only by
    design — the sketch is engine-specific, so exactness is pinned by
    the error-bound test against q04 instead of a cross-engine hash
    (tests/test_relational_ext.py; the q37 HLL pattern).

    This IS the 100 TB path: the sketch is mergeable map-side (bounded
    state per task, one row per group moves in the exchange), where the
    exact percentile must shuffle and sort every value. accuracy=10000
    bounds rank error at 1/10000 of the group size.
    """
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.percentile_approx("value", 0.5, 10000), 4).alias("p50"),
            F.round(F.percentile_approx("value", 0.95, 10000), 4).alias("p95"),
            F.round(F.percentile_approx("value", 0.99, 10000), 4).alias("p99"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
        .orderBy("event_type")
    )
