"""Q45-Q52: oracle rows for operators previously covered only by pytest.

Each query drives a real operator module end-to-end on the driver's
tables with a DuckDB oracle replaying the declared semantics — closing
the "every §2 operator has a passing queries() entry" gap for:

- q45 graph label propagation (J4), q46 ROUGE-1 (I15),
- q47 syndication canonical-URL dedup (I11), q48 nginx log parse (A3),
- q49 streaming MV replay == batch fold (D9/K1),
- q50 HTML clean + sentence split (I1/I4), q51 NFKC normalize (I2),
- q52 RSS/Atom feed parse with URL guard (A1/B9).

Where an input column the operator needs does not exist in the testdata
(URLs for I11, raw log lines for A3), both engines derive it from the
same deterministic formula over the table columns; the oracle then
states the EXPECTED post-parse value directly, so the Spark side's
regex/normalization chain is genuinely exercised against an independent
statement of what it must produce.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from alt_spark.catalog import load_table
from alt_spark.operators import dedup
from alt_spark.queries import query

_DDB_TOKENS = "list_filter(string_split_regex(lower(text), '\\W+'), x -> x <> '')"


# ---------------------------------------------------------------------------
@query(
    "q45_label_propagation",
    oracle="""
WITH co AS (
  SELECT l1.l_partkey AS src, l2.l_partkey AS dst,
         CAST(count(*) AS DOUBLE) AS weight
  FROM lineitem l1
  JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
  WHERE l1.l_partkey < 200 AND l2.l_partkey < 200
  GROUP BY 1, 2
), und AS (
  SELECT src, dst, weight FROM co
  UNION ALL
  SELECT dst AS src, src AS dst, weight FROM co
), seeds AS (
  SELECT p_partkey AS id, p_brand AS label FROM part WHERE p_partkey < 50
), l0 AS (
  SELECT id, label, 1.0 AS confidence FROM seeds
), v1 AS (
  SELECT und.dst AS nid, l0.label, sum(und.weight * l0.confidence) AS vote
  FROM und JOIN l0 ON und.src = l0.id
  GROUP BY 1, 2
), b1 AS (
  SELECT nid AS id, label, least(vote, 1.0) AS confidence,
         row_number() OVER (PARTITION BY nid ORDER BY vote DESC, label) AS rn
  FROM v1
), l1 AS (
  SELECT id, label, 1.0 AS confidence FROM seeds
  UNION ALL
  SELECT id, label, confidence FROM b1
  WHERE rn = 1 AND id NOT IN (SELECT id FROM seeds)
), v2 AS (
  SELECT und.dst AS nid, l1.label, sum(und.weight * l1.confidence) AS vote
  FROM und JOIN l1 ON und.src = l1.id
  GROUP BY 1, 2
), b2 AS (
  SELECT nid AS id, label, least(vote, 1.0) AS confidence,
         row_number() OVER (PARTITION BY nid ORDER BY vote DESC, label) AS rn
  FROM v2
), l2 AS (
  SELECT id, label, 1.0 AS confidence FROM seeds
  UNION ALL
  SELECT id, label, confidence FROM b2
  WHERE rn = 1 AND id NOT IN (SELECT id FROM seeds)
)
SELECT id, label FROM l2 ORDER BY id
""",
)
def q45(spark: SparkSession, sf: str) -> DataFrame:
    """Graph label propagation (J4, operators/graph.py — the reference's
    neighbor propagation, recap-worker classifier/graph.rs:180-211).

    Graph: part co-occurrence edges from lineitem (partkeys < 200 so the
    graph is dim-sized), weight = co-order count; seeds = p_brand for
    partkeys < 50; two synchronous iterations, seeds authoritative.
    Exactness: weights are integer counts and every confidence is capped
    at 1.0, so votes stay integer-valued doubles — the argmax (tie-broken
    by label) is order-independent and the oracle's unrolled two-round
    CTE matches bit-for-bit.
    """
    from alt_spark.operators.graph import propagate_labels

    li = load_table(spark, sf, "lineitem").filter(F.col("l_partkey") < 200)
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(F.count("*").cast("double").alias("weight"))
    )
    seeds = (
        load_table(spark, sf, "part")
        .filter(F.col("p_partkey") < 50)
        .select(F.col("p_partkey").alias("id"), F.col("p_brand").alias("label"))
    )
    out = propagate_labels(edges, seeds, iters=2)
    return out.select("id", "label").orderBy("id")


# ---------------------------------------------------------------------------
@query(
    "q46_rouge1_pairs",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, {_DDB_TOKENS} AS toks FROM documents WHERE doc_id < 31
), pairs AS (
  SELECT c.doc_id AS id, c.toks AS cand, r.toks AS ref
  FROM tok c JOIN tok r ON r.doc_id = c.doc_id + 1
  WHERE c.doc_id < 30
), cf AS (
  SELECT id, t AS tok, count(*) AS n
  FROM (SELECT id, unnest(cand) AS t FROM pairs) GROUP BY 1, 2
), rf AS (
  SELECT id, t AS tok, count(*) AS n
  FROM (SELECT id, unnest(ref) AS t FROM pairs) GROUP BY 1, 2
), ov AS (
  SELECT cf.id, sum(least(cf.n, rf.n)) AS overlap
  FROM cf JOIN rf ON cf.id = rf.id AND cf.tok = rf.tok
  GROUP BY 1
), m AS (
  SELECT p.id,
         CAST(coalesce(ov.overlap, 0) AS DOUBLE) / greatest(len(p.cand), 1) AS pr,
         CAST(coalesce(ov.overlap, 0) AS DOUBLE) / greatest(len(p.ref), 1) AS rc
  FROM pairs p LEFT JOIN ov ON ov.id = p.id
)
SELECT id AS doc_id,
       round(pr, 6) AS rouge_p,
       round(rc, 6) AS rouge_r,
       round(CASE WHEN pr + rc > 0 THEN 2 * pr * rc / (pr + rc) ELSE 0.0 END, 6)
         AS rouge_f1
FROM m
ORDER BY doc_id
""",
)
def q46(spark: SparkSession, sf: str) -> DataFrame:
    """ROUGE-1 evaluation (I15, functions/rouge.py — the reference's
    candidate-vs-reference scoring, recap-worker evaluation/rouge.rs:20-120).

    Candidate = doc d, reference = doc d+1 (deterministic pairing over
    the first 30 docs); precision/recall/F1 from the clipped unigram
    overlap. Per-row arithmetic on integer overlap/lengths, so both
    engines compute identical doubles.
    """
    from alt_spark.functions.rouge import rouge_1

    docs = load_table(spark, sf, "documents")
    tok = docs.filter(F.col("doc_id") < 31).select(
        "doc_id", dedup.tokens_col("text").alias("toks")
    )
    c, r = tok.alias("c"), tok.alias("r")
    pairs = (
        c.join(r, F.col("r.doc_id") == F.col("c.doc_id") + 1)
        .filter(F.col("c.doc_id") < 30)
        .select(
            F.col("c.doc_id").alias("doc_id"),
            F.col("c.toks").alias("cand"),
            F.col("r.toks").alias("ref"),
        )
    )
    sc = pairs.select("doc_id", rouge_1(F.col("cand"), F.col("ref")).alias("r1"))
    return sc.select(
        "doc_id",
        F.round(F.col("r1.precision"), 6).alias("rouge_p"),
        F.round(F.col("r1.recall"), 6).alias("rouge_r"),
        F.round(F.col("r1.f1"), 6).alias("rouge_f1"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
@query(
    "q47_syndication_dedup",
    oracle="""
WITH arts AS (
  SELECT doc_id, source,
         'https://' || source || '.example.com/a/' || CAST(doc_id % 15 AS VARCHAR)
           AS canonical
  FROM documents
), ranked AS (
  SELECT source,
         row_number() OVER (PARTITION BY canonical ORDER BY doc_id) AS rn
  FROM arts
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM ranked
GROUP BY 1
ORDER BY 1
""",
)
def q47(spark: SparkSession, sf: str) -> DataFrame:
    """Syndication canonical-URL dedup (I11, operators/syndication.py —
    the reference's normalize-before-compare collapse, recap-worker
    pipeline/pulse/syndication.rs:185-326).

    Both engines derive each doc's URL from the same formula — uppercase
    scheme/host, www., :443, tracking params (utm/ref/fbclid) and a
    fragment all present — but the ORACLE states the expected canonical
    form directly, so the Spark regexp-normalization chain is checked
    against an independent statement of its required output, not replayed.
    """
    from alt_spark.operators.syndication import remove_syndication

    docs = load_table(spark, sf, "documents").select(
        F.col("doc_id").alias("article_id"),
        "source",
        F.concat(
            F.lit("HTTPS://WWW."),
            F.col("source"),
            F.lit(".Example.com:443/a/"),
            (F.col("doc_id") % 15).cast("string"),
            F.lit("?utm_source=rss&ref=reader&fbclid="),
            F.col("doc_id").cast("string"),
            F.lit("#frag"),
        ).alias("link"),
    )
    kept = remove_syndication(
        docs, url_col="link", id_col="article_id", collapse_titles=False
    )
    n_docs = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    n_kept = kept.groupBy("source").agg(F.count("*").cast("long").alias("n_kept"))
    return (
        n_docs.join(n_kept, "source")
        .select("source", "n_docs", "n_kept")
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
def _q48_log_line() -> Column:
    """The synthesized combined-log line expression (unbound F.col
    references — split out of q48 so the envelope pin test can reuse
    it; it takes no frame because the expression is not frame-specific
    — review finding, r8)."""
    status = (
        F.when(F.col("event_type") == "error", 500)
        .when(F.col("event_type") == "view", 404)
        .otherwise(200)
    )
    size_str = F.when(F.col("event_type") == "click", F.lit("-")).otherwise(
        (F.col("event_id") % 1000).cast("string")
    )
    return F.concat(
        F.lit("10.0.0."),
        (F.col("user_id") % 256).cast("string"),
        F.lit(" - - ["),
        F.date_format("ts", "dd/MMM/yyyy:HH:mm:ss"),
        F.lit(' +0000] "GET /'),
        F.col("event_type"),
        F.lit("/"),
        (F.col("event_id") % 50).cast("string"),
        F.lit(' HTTP/1.1" '),
        status.cast("string"),
        F.lit(" "),
        size_str,
        F.lit(' "-" "alt-bench"'),
    )


def _q48_envelope(line: Column, container: str = "/nginx") -> Column:
    """The hand-concatenated Docker NDJSON envelope around a log line.

    Escapes backslashes FIRST, then quotes (r8, after r7 ADVICE: the
    quote-only replace was byte-identical to to_json for the current
    literal-only line, but a future field containing a backslash or a
    control character would silently produce divergent JSON). With
    both escapes the form matches ``to_json`` for any line free of
    control characters — equality is pinned permanently in
    tests/test_ndjson_logs.py::test_q48_envelope_matches_to_json,
    including a planted backslash+quote row. The ESC byte (the one
    control character the meilisearch lines carry) is \\u001b-escaped
    AFTER the backslash pass, exactly what Docker's json-file driver
    does to control bytes — raw ESC inside a JSON string would make
    Jackson reject the whole envelope."""
    esc = F.replace(
        F.replace(
            F.replace(line, F.lit("\\"), F.lit("\\\\")),
            F.lit('"'),
            F.lit('\\"'),
        ),
        F.lit("\x1b"),
        F.lit("\\u001b"),
    )
    return F.concat(
        F.lit('{"time":"'),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
        F.lit(f'","stream":"stdout","container_name":"{container}","log":"'),
        esc,
        F.lit('"}'),
    )


def _q48_postgres_line() -> Column:
    """Planted postgres text-format lines (unbound column refs over
    events): level residue r=(event_id div 10)%6 walks the vocabulary
    LOG/ERROR/WARNING/DEBUG3/FATAL plus the greedy-regex pin
    `LOG:  statement: select N` (the reference's own test line shape,
    tests/parser/test_service_parsers.rs:52-63 — the pattern's greedy
    `.+` binds the LAST `word:`, so level word = "statement" → info and
    message = "select N"); rows with user_id%13==0 swap in a line with
    NO leading timestamp, exercising the no-match fallback
    (info + raw message, postgres.rs:110-127)."""
    r = F.expr("event_id div 10") % 6
    prefix = F.concat(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
        F.lit(" UTC ["),
        (F.col("event_id") % 32768).cast("string"),
        F.lit("] "),
    )
    body = (
        F.when(
            r == 0,
            F.concat(
                F.lit("LOG:  checkpoint complete wal="),
                (F.col("event_id") % 97).cast("string"),
            ),
        )
        .when(
            r == 1,
            F.concat(
                F.lit("ERROR:  deadlock detected on relation r"),
                (F.col("event_id") % 13).cast("string"),
            ),
        )
        .when(
            r == 2,
            F.concat(
                F.lit("WARNING:  long transaction t"),
                (F.col("event_id") % 7).cast("string"),
            ),
        )
        .when(
            r == 3,
            F.concat(
                F.lit("DEBUG3:  rewriting block b"),
                (F.col("event_id") % 11).cast("string"),
            ),
        )
        .when(
            r == 4,
            F.concat(
                F.lit("FATAL:  connection limit reached c"),
                (F.col("event_id") % 5).cast("string"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("LOG:  statement: select "),
                (F.col("event_id") % 23).cast("string"),
            )
        )
    )
    fallback = F.concat(
        F.lit("could not receive data from client: connection reset e"),
        (F.col("event_id") % 9).cast("string"),
    )
    return F.when(F.col("user_id") % 13 == 0, fallback).otherwise(
        F.concat(prefix, body)
    )


def _q48_meili_line() -> Column:
    """Planted meilisearch lines with REAL ANSI escape sequences (dim
    timestamp, reset, green target — the tracing-subscriber palette the
    reference strips, meilisearch.rs:23-45). Level residue
    m=(event_id div 10)%4 walks INFO/WARN/ERROR/DEBUG as ` WORD `
    tokens on the cleaned line."""
    m = F.expr("event_id div 10") % 4
    word = (
        F.when(m == 1, F.lit("WARN"))
        .when(m == 2, F.lit("ERROR"))
        .when(m == 3, F.lit("DEBUG"))
        .otherwise(F.lit("INFO"))
    )
    return F.concat(
        F.lit("\x1b[2m"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        F.lit("\x1b[0m  "),
        word,
        F.lit(" \x1b[32mactix_web\x1b[0m: HTTP request served path=/indexes/i"),
        (F.col("event_id") % 9).cast("string"),
    )



@query(
    "q48_nginx_log_parse",
    oracle="""
WITH src AS (
  SELECT event_id, event_type,
         CASE WHEN event_type = 'error' THEN 500
              WHEN event_type = 'view' THEN 404
              ELSE 200 END AS status,
         CASE WHEN event_type = 'click' THEN 0
              ELSE event_id % 1000 END AS bytes,
         '/' || event_type || '/' || CAST(event_id % 50 AS VARCHAR) AS path
  FROM events
), http AS (
  SELECT 'http:' || CAST(status AS VARCHAR) AS k,
         count(*) AS n,
         CAST(sum(bytes) AS BIGINT) AS total_bytes,
         count(DISTINCT path) AS n_paths,
         CAST(NULL AS VARCHAR) AS lo_msg,
         CAST(NULL AS VARCHAR) AS hi_msg
  FROM src
  GROUP BY 1
), pg AS (
  SELECT CASE WHEN user_id % 13 = 0 THEN 'info'
              WHEN (event_id // 10) % 6 = 1 THEN 'error'
              WHEN (event_id // 10) % 6 = 2 THEN 'warn'
              WHEN (event_id // 10) % 6 = 3 THEN 'debug'
              WHEN (event_id // 10) % 6 = 4 THEN 'fatal'
              ELSE 'info' END AS level,
         CASE WHEN user_id % 13 = 0
                THEN 'could not receive data from client: connection reset e'
                     || CAST(event_id % 9 AS VARCHAR)
              WHEN (event_id // 10) % 6 = 0
                THEN 'checkpoint complete wal=' || CAST(event_id % 97 AS VARCHAR)
              WHEN (event_id // 10) % 6 = 1
                THEN 'deadlock detected on relation r' || CAST(event_id % 13 AS VARCHAR)
              WHEN (event_id // 10) % 6 = 2
                THEN 'long transaction t' || CAST(event_id % 7 AS VARCHAR)
              WHEN (event_id // 10) % 6 = 3
                THEN 'rewriting block b' || CAST(event_id % 11 AS VARCHAR)
              WHEN (event_id // 10) % 6 = 4
                THEN 'connection limit reached c' || CAST(event_id % 5 AS VARCHAR)
              ELSE 'select ' || CAST(event_id % 23 AS VARCHAR) END AS message
  FROM events WHERE event_id % 10 = 0
), meili AS (
  SELECT CASE (event_id // 10) % 4 WHEN 1 THEN 'warn' WHEN 2 THEN 'error'
              WHEN 3 THEN 'debug' ELSE 'info' END AS level,
         strftime(ts, '%Y-%m-%dT%H:%M:%SZ') || '  ' ||
         CASE (event_id // 10) % 4 WHEN 1 THEN 'WARN' WHEN 2 THEN 'ERROR'
              WHEN 3 THEN 'DEBUG' ELSE 'INFO' END ||
         ' actix_web: HTTP request served path=/indexes/i'
         || CAST(event_id % 9 AS VARCHAR) AS message
  FROM events WHERE event_id % 10 = 5
), svc AS (
  SELECT 'postgres:' || level AS k, count(*) AS n,
         CAST(NULL AS BIGINT) AS total_bytes, CAST(NULL AS BIGINT) AS n_paths,
         min(message) AS lo_msg, max(message) AS hi_msg
  FROM pg GROUP BY 1
  UNION ALL
  SELECT 'meilisearch:' || level, count(*),
         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), min(message), max(message)
  FROM meili GROUP BY 1
)
SELECT * FROM http
UNION ALL
SELECT * FROM svc
ORDER BY k
""",
)
def q48(spark: SparkSession, sf: str) -> DataFrame:
    """Per-service log parse → http_logs projection + level extraction
    (A3/B3-B5, sources/ndjson_logs.py — the reference's per-service
    parsers: nginx access regex rask-log-forwarder
    src/parser/services/nginx.rs:27-110, postgres text format
    postgres.rs:22-70 with the DEBUG1-5/LOG/NOTICE/WARNING/ERROR/FATAL/
    PANIC vocabulary, meilisearch ANSI-escape stripping
    meilisearch.rs:23-45 — and the MV projection
    003_create_http_logs_mv.sql:45-82).

    Every event renders a combined-log line inside a Docker NDJSON
    envelope (clicks get size '-' to exercise the OrZero cast); every
    10th event ADDITIONALLY lands a postgres text line (level residues
    walk the whole vocabulary, one residue plants the greedy-regex
    `statement:` pin, and user_id%13 rows plant the no-timestamp
    fallback) and every 10th+5 a meilisearch line wrapped in REAL ANSI
    escape sequences. The Spark side runs the one shared
    parse_logs → http_logs chain over the union; the oracle states the
    expected extracted values straight from the generating formulas —
    regex extraction, the level vocabulary, ANSI stripping (min/max of
    the CLEANED messages), map-key guards, and casts are all on trial.
    The planted lines also pin non-qualification: none of them may leak
    into the http aggregate, whose rows must stay value-identical to
    the pre-extension q48 (r1-r7 driver history).
    """
    from alt_spark.sources.ndjson_logs import http_logs, parse_logs

    ev = load_table(spark, sf, "events")
    # Line SYNTHESIS (the harness side of this query) is ~40% of its
    # end-to-end cost at sf0.1 (r7 profile: synth 0.53 s of 1.32 s /
    # 100k rows), so it gets the same measured treatment as the parse:
    # the ' Z' offset renders ' +0000' in this UTC session (equality
    # asserted over the full corpus in the r7 experiment), so it is a
    # literal, and the envelope is a concat'd JSON string instead of
    # to_json(struct(...)) — byte-identical (pinned permanently by
    # test_q48_envelope_matches_to_json since r8) and 0.04 s/100k
    # cheaper.
    # All three producers synthesize in ONE pass over events: each row
    # emits its nginx line plus (by residue) a postgres or meilisearch
    # line as an in-row array -> array_compact -> explode. A 3-frame
    # union instead costs three events scans AND clones the downstream
    # parse layer into each union child (3 codegen'd JIT instances —
    # measured ~2 s of cold wall at sf0.1).
    lines = ev.select(
        F.explode(
            F.array_compact(
                F.array(
                    _q48_envelope(_q48_log_line()),
                    F.when(
                        F.col("event_id") % 10 == 0,
                        _q48_envelope(_q48_postgres_line(), "/postgres"),
                    ),
                    F.when(
                        F.col("event_id") % 10 == 5,
                        _q48_envelope(_q48_meili_line(), "/meilisearch"),
                    ),
                )
            )
        ).alias("value")
    )
    # ONE parse pass over the 3-producer union, materialized, feeding
    # BOTH aggregates — at 100 TB this IS the A5 shape (the parsed
    # `logs` table is written once; the http MV and the level rollup
    # both read it), and locally it halves the codegen'd parse
    # instances (measured: cold 8.0 s -> ~5 s, warm 3.9 -> ~2.6 s at
    # sf0.1). The http side sees all three producers, so the planted
    # pg/meili lines' NON-qualification is on trial in the http
    # aggregate. With the hermetic switch off (plan audits), fall back
    # to two single-consumer parse passes — parse_logs is deterministic
    # per line, so the shapes are value-identical; the checkpoint also
    # cuts lineage so the svc filter below cannot push INTO the parse
    # (the documented substitution hazard).
    from alt_spark.plans import dfcache as _dfcache

    logs = parse_logs(lines)
    if _dfcache.MATERIALIZE:
        # Checkpoint cuts lineage, so the service filter below reads
        # materialized rows — it CANNOT push into the parse and
        # substitute the service definition (the documented hazard).
        logs = logs.localCheckpoint(eager=False)
        svc_logs = logs.filter(
            F.col("service_name").isin("postgres", "meilisearch")
        )
    else:
        # Audit mode (no materialization): give the level/message
        # aggregate its own parse over only the pg+meili envelopes so
        # no filter exists to push into the parse — value-identical
        # (parse_logs is deterministic per line).
        svc_logs = parse_logs(
            ev.filter(F.col("event_id") % 10 == 0)
            .select(_q48_envelope(_q48_postgres_line(), "/postgres").alias("value"))
            .unionAll(
                ev.filter(F.col("event_id") % 10 == 5).select(
                    _q48_envelope(_q48_meili_line(), "/meilisearch").alias("value")
                )
            )
        )
    hl = http_logs(logs)
    http_agg = hl.groupBy("status_code").agg(
        F.count("*").alias("n"),
        F.sum("response_size").alias("total_bytes"),
        F.countDistinct("path").alias("n_paths"),
    )
    http_rows = http_agg.select(
        F.concat(F.lit("http:"), F.col("status_code").cast("string")).alias(
            "k"
        ),
        "n",
        "total_bytes",
        "n_paths",
        F.lit(None).cast("string").alias("lo_msg"),
        F.lit(None).cast("string").alias("hi_msg"),
    )
    # svc_logs is either the checkpointed union filtered to pg/meili
    # (lineage cut — the filter CANNOT substitute the parse) or, in
    # audit mode, a parse over only the pg+meili envelopes (no filter
    # needed, so nothing can push into the parse there either).
    svc_rows = (
        svc_logs.groupBy("service_name", "level")
        .agg(
            F.count("*").alias("n"),
            F.min("message").alias("lo_msg"),
            F.max("message").alias("hi_msg"),
        )
        .select(
            F.concat_ws(":", "service_name", "level").alias("k"),
            "n",
            F.lit(None).cast("long").alias("total_bytes"),
            F.lit(None).cast("long").alias("n_paths"),
            "lo_msg",
            "hi_msg",
        )
    )
    return http_rows.unionAll(svc_rows).orderBy("k")


# ---------------------------------------------------------------------------
@query(
    "q49_streaming_mv_replay",
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
def q49(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming MV replay == batch oracle (D9/K1, streaming/mv.py — the
    reference's insert-time SLI MV, 009_create_sli_metrics.sql:21-31).

    The events table is re-landed as four chunk files and replayed
    through a REAL Structured Streaming query (file source, one file per
    micro-batch, availableNow trigger, checkpointed complete-mode memory
    sink); the folded state after the final micro-batch must hash-match
    the same oracle as batch q02 — the stream==batch contract the
    ClickHouse MV relies on, proven inside the driver's own metric.
    """
    import pyarrow.parquet as pq

    from alt_spark.streaming.mv import MV_REGISTRY, read_events_stream

    # Pin the session confs load_table would pin (the driver may hand us
    # a plain session): UTC bucketing. The physical ts layout is probed
    # per-file by read_events_stream — never hard-coded here.
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    root = tempfile.mkdtemp(prefix="q49_replay_")
    landing = os.path.join(root, "landing")
    os.makedirs(landing)
    try:
        t = pq.read_table(os.path.join(sf, "events.parquet"))
        n = t.num_rows
        step = max(1, (n + 3) // 4)
        for i, off in enumerate(range(0, n, step)):
            pq.write_table(
                t.slice(off, step), os.path.join(landing, f"chunk{i:02d}.parquet")
            )
        name = "q49_mv_" + uuid.uuid4().hex[:8]
        src = read_events_stream(spark, landing, max_files_per_trigger=1)
        mv = MV_REGISTRY["sli_error_rate"](src)
        # State-store partitioning is fixed at first start from the
        # checkpoint: the MV groups ~9k minute-buckets, so 32 session
        # shuffle partitions would mean 32 state stores × 4 micro-batches
        # of per-task open/commit overhead for no parallelism gain. Pin a
        # small count for THIS fresh-checkpoint replay and restore the
        # session conf after start (aggregation results are partition-
        # count-invariant; a production MV sizes this to its key space).
        from alt_spark.streaming.landing import replay_shuffle_partitions

        with replay_shuffle_partitions(spark):
            sq = (
                mv.writeStream.outputMode("complete")
                .format("memory")
                .queryName(name)
                .option("checkpointLocation", os.path.join(root, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            # The first micro-batch snapshots the conf asynchronously
            # after start(), so only restore once the replay is done.
            # On timeout, stop the query BEFORE the landing/checkpoint
            # dirs are removed (a zombie stream over deleted dirs would
            # poison the shared session); explicit raise, not assert,
            # so python -O can't turn a timeout into a silent partial
            # fold.
            if not sq.awaitTermination(300):
                sq.stop()
                raise RuntimeError("q49 streaming replay timed out")
        # Materialize the folded state before the landing dir disappears.
        out = spark.createDataFrame(
            spark.table(name).collect(), spark.table(name).schema
        )
        return out.orderBy("bucket")
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
@query(
    "q50_html_clean_sentences",
    oracle="""
SELECT doc_id,
       trim(regexp_replace(text, '\\s+', ' ', 'g')) || ' & more' AS cleaned,
       CASE WHEN doc_id % 2 = 0 THEN 4 ELSE 3 END AS n_sent,
       'First part about ' || source || '.' AS first_sent
FROM documents
WHERE doc_id < 40
ORDER BY doc_id
""",
)
def q50(spark: SparkSession, sf: str) -> DataFrame:
    """HTML cleaning + sentence split (I1/I4, functions/cleaning.py —
    the reference's strip-tags path, recap-worker preprocess.rs:355-404,
    and sentence boundary split, util/text.rs:19).

    Each document is wrapped in a full HTML page (script and style
    bodies, a comment, an &amp; entity); html_clean must recover exactly
    the whitespace-collapsed text plus the decoded suffix — the oracle
    states that expectation directly. Sentence counts come from a
    controlled synthetic paragraph (period, bang, and a parity-dependent
    question mark), so the expected count and first sentence are exact.
    """
    from alt_spark.functions.cleaning import html_clean, sentence_split

    docs = load_table(spark, sf, "documents").filter(F.col("doc_id") < 40)
    html = F.concat(
        F.lit("<html><head><style>p {color:red}</style></head><body><p>"),
        F.col("text"),
        F.lit("</p><script>var x = 1;</script><!-- note --> &amp; more</body></html>"),
    )
    stext = F.concat(
        F.lit("First part about "),
        F.col("source"),
        F.lit(". Second bit num "),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("! Third question maybe"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("? extra tail")).otherwise(F.lit("")),
    )
    sents = sentence_split(stext)
    return docs.select(
        "doc_id",
        html_clean(html).alias("cleaned"),
        F.size(sents).alias("n_sent"),
        F.element_at(sents, 1).alias("first_sent"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
_ASCII_SRC = "abcdefghijklmnopqrstuvwxyz "
_FULLWIDTH = "".join(chr(0xFF41 + i) for i in range(26)) + "　"


@query(
    "q51_nfkc_normalize",
    oracle="""
SELECT doc_id, substr(text, 1, 20) AS normalized
FROM documents
WHERE doc_id < 60
ORDER BY doc_id
""",
)
def q51(spark: SparkSession, sf: str) -> DataFrame:
    """Unicode NFKC normalization (I2, functions/cleaning.py — the
    reference's width normalization, preprocess.rs:345-353 and the
    NFC-normalizing sanitizer property tests).

    Both engines agree the input text is ASCII; the Spark side first
    maps it to fullwidth forms (ａ-ｚ and the ideographic space) with
    translate, then the NFKC pandas UDF must fold it back — the oracle
    simply states the original substring. Exercises the Arrow-batched
    UDF surface with an independently-stated expected output.
    """
    from alt_spark.functions.cleaning import normalize_text

    docs = load_table(spark, sf, "documents").filter(F.col("doc_id") < 60)
    widened = F.translate(
        F.substring("text", 1, 20), _ASCII_SRC, _FULLWIDTH
    )
    return docs.select(
        "doc_id", normalize_text(widened).alias("normalized")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
@query(
    "q52_rss_atom_parse",
    oracle="""
WITH s AS (
  SELECT s_suppkey, s_name, s_nationkey
  FROM supplier
  WHERE s_suppkey % 97 <> 0
)
SELECT 'https://feeds.example.com/' || lower(n_name) AS feed_url,
       count(*) AS n_articles,
       min(s_name) AS first_title,
       count(DISTINCT s_suppkey) AS n_links
FROM s JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1
ORDER BY 1
""",
)
def q52(spark: SparkSession, sf: str) -> DataFrame:
    """RSS/Atom feed parsing (A1/B9, sources/rss.py — the reference's
    feed ingestion, pre-processor article_driver.go / recap-worker
    pipeline/fetch.rs, with the projector's URL allowlist guard,
    knowledge-sovereign projector.go:511-529).

    One feed per nation is rendered as real XML — RSS 2.0 for even
    nation keys, Atom for odd (both from_xml branches on trial) — with
    suppliers as items. Every 97th supplier gets a javascript: link the
    B9 guard must drop. The oracle counts the expected surviving
    articles straight from the relational tables.
    """
    from alt_spark.sources.rss import parse_feeds

    sup = load_table(spark, sf, "supplier")
    nat = load_table(spark, sf, "nation")
    is_bad = (F.col("s_suppkey") % 97) == 0
    link = F.when(is_bad, F.lit("javascript:alert(1)")).otherwise(
        F.concat(F.lit("https://supplier.example.com/"), F.col("s_suppkey").cast("string"))
    )
    rss_item = F.concat(
        F.lit("<item><title>"), F.col("s_name"),
        F.lit("</title><link>"), link,
        F.lit("</link><pubDate>2024-01-01</pubDate><description>supplier "),
        F.col("s_suppkey").cast("string"),
        F.lit("</description></item>"),
    )
    atom_entry = F.concat(
        F.lit("<entry><title>"), F.col("s_name"),
        F.lit('</title><link href="'), link,
        F.lit('"/><updated>2024-01-01</updated><summary>supplier '),
        F.col("s_suppkey").cast("string"),
        F.lit("</summary></entry>"),
    )
    per_sup = sup.select(
        "s_nationkey", "s_suppkey", rss_item.alias("ri"), atom_entry.alias("ae")
    )
    grouped = per_sup.groupBy("s_nationkey").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("s_suppkey", F.col("ri").alias("x")))),
                lambda s: s["x"],
            ),
            "",
        ).alias("items"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("s_suppkey", F.col("ae").alias("x")))),
                lambda s: s["x"],
            ),
            "",
        ).alias("entries"),
    )
    feeds = grouped.join(
        F.broadcast(nat), grouped["s_nationkey"] == nat["n_nationkey"]
    ).select(
        F.concat(F.lit("https://feeds.example.com/"), F.lower("n_name")).alias(
            "feed_url"
        ),
        F.when(
            F.col("n_nationkey") % 2 == 0,
            F.concat(
                F.lit("<rss><channel><title>"), F.col("n_name"),
                F.lit("</title>"), F.col("items"), F.lit("</channel></rss>"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("<feed><title>"), F.col("n_name"),
                F.lit("</title>"), F.col("entries"), F.lit("</feed>"),
            )
        )
        .alias("xml"),
    )
    arts = parse_feeds(feeds)
    return (
        arts.groupBy("feed_url")
        .agg(
            F.count("*").alias("n_articles"),
            F.min("title").alias("first_title"),
            F.countDistinct("link").alias("n_links"),
        )
        .orderBy("feed_url")
    )


# ---------------------------------------------------------------------------
# q139: streaming session windows, driver-hash-checked (K8's session
# grain on the q49 replay footing). The batch q22/q130 family pins the
# lag+cumsum formulation; `streaming/mv.py:user_sessions` pins
# session_window == lag in pytest; this query runs the REAL streaming
# session_window — append mode, watermark-driven finalization — and
# hash-checks the folded result against the lag replay in DuckDB.
#
# The flush device: append mode only emits sessions the WATERMARK has
# closed (event time past end+gap), so a replay's trailing sessions
# would never leave the state store. A sentinel row (user_id = -1) far
# past max(ts) lands as the second-to-last micro-batch to advance the
# event-time watermark, and one final EMPTY chunk file forces the batch
# in which that advanced watermark evicts + emits every real session.
# The sentinel's own session stays open forever — excluded by
# construction (nothing ever advances the watermark past it) and
# filtered besides.
_SSW_GAP_US = 1_800_000_000  # 30 minutes, the q22 gap


@query(
    "q139_streaming_session_windows",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus FROM events
), flagged AS (
  SELECT user_id, event_id, tus,
         CASE WHEN tus - lag(tus) OVER w > {_SSW_GAP_US}
                   OR lag(tus) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
), sess AS (
  SELECT user_id, tus,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
), agg AS (
  SELECT user_id, sid, count(*) AS n_events,
         (max(tus) + {_SSW_GAP_US} - min(tus)) // 1000 AS duration_ms
  FROM sess GROUP BY 1, 2
)
SELECT n_events, count(*) AS n_sessions,
       CAST(sum(duration_ms) AS BIGINT) AS total_duration_ms
FROM agg
GROUP BY 1
ORDER BY 1
""",
)
def q139(spark: SparkSession, sf: str) -> DataFrame:
    """Session-size histogram from a REAL Structured-Streaming
    session_window fold: events re-land as four ts-ordered chunk files
    plus the watermark sentinel and the flush chunk, the stream groups
    by (user_id, session_window(ts, 30 min)) in append mode, and the
    finalized sessions aggregate to (n_events, n_sessions,
    total_duration_ms) — duration is session_window's OWN definition
    (last event + gap − first event, exact µs → floor ms). The oracle
    replays the equivalent lag+cumsum sessionization (q22's device;
    the two formulations differ only on exact-gap boundaries, absent
    in µs-resolution data — the standing user_sessions contract).

    Scale shape: session_window streaming state is per-(user, open
    session) and watermark-evicted — the unbounded-corpus form of E8's
    batch window; the histogram is one combinable aggregate over the
    emitted sessions.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    from alt_spark.streaming.mv import read_events_stream, user_sessions

    # session.py already pins UTC session-wide; pin it here too for a
    # caller running under a different zone (session_window bucketing
    # is zone-sensitive), but save/restore so the setting never leaks
    # past this query — same discipline as shuffle.partitions below.
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    root = tempfile.mkdtemp(prefix="q139_ssw_")
    landing = os.path.join(root, "landing")
    os.makedirs(landing)
    try:
        t = pq.read_table(os.path.join(sf, "events.parquet"))
        order = pa.compute.sort_indices(
            t, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        t = t.take(order)
        n = t.num_rows
        step = max(1, (n + 3) // 4)
        for i, off in enumerate(range(0, n, step)):
            pq.write_table(
                t.slice(off, step),
                os.path.join(landing, f"chunk{i:02d}.parquet"),
            )
        # Sentinel: one real row re-stamped far past max(ts) under the
        # reserved user, then the empty flush chunk (a new file IS a
        # new micro-batch even with zero rows — the offset advances and
        # the previous batch's watermark evicts the closed sessions).
        sent = t.slice(0, 1)
        max_ts = pa.compute.max(t.column("ts")).as_py()
        import datetime as _dt

        # The physical ts layout is NOT stable across rounds (the r3
        # canary incident: TIMESTAMP(NANOS) lands as int64 through this
        # raw pyarrow read, while read_events_stream probes and
        # branches) — handle both representations when stamping the
        # sentinel 40 days past max(ts).
        if isinstance(max_ts, int):
            far = max_ts + 40 * 24 * 3600 * 1_000_000_000
        else:
            far = max_ts + _dt.timedelta(days=40)
        sent = sent.set_column(
            sent.schema.get_field_index("ts"),
            "ts",
            pa.array([far], sent.schema.field("ts").type),
        )
        sent = sent.set_column(
            sent.schema.get_field_index("user_id"),
            "user_id",
            pa.array([-1], sent.schema.field("user_id").type),
        )
        pq.write_table(sent, os.path.join(landing, "chunk98_sentinel.parquet"))
        pq.write_table(
            t.slice(0, 0), os.path.join(landing, "chunk99_flush.parquet")
        )
        name = "q139_ssw_" + uuid.uuid4().hex[:8]
        src = read_events_stream(
            spark, landing, max_files_per_trigger=1
        ).withWatermark("ts", "0 seconds")
        sessions = user_sessions(src)
        from alt_spark.streaming.landing import replay_shuffle_partitions

        with replay_shuffle_partitions(spark):
            sq = (
                sessions.writeStream.outputMode("append")
                .format("memory")
                .queryName(name)
                .option("checkpointLocation", os.path.join(root, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            if not sq.awaitTermination(300):
                sq.stop()
                raise RuntimeError("q139 streaming replay timed out")
        emitted = spark.table(name).filter(F.col("user_id") >= 0)
        out = (
            emitted.groupBy("n_events")
            .agg(
                F.count("*").alias("n_sessions"),
                F.sum(
                    F.expr(
                        "(unix_micros(session_end) - unix_micros(session_start))"
                        " div 1000"
                    )
                )
                .cast("long")
                .alias("total_duration_ms"),
            )
            .orderBy("n_events")
        )
        # Materialize before the landing/checkpoint dirs disappear.
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# q140: OTLP trace ingest, driver-hash-checked (A4 — previously
# pytest-only). Every event renders a REAL OTLP/JSON trace export
# envelope (resourceSpans → scopeSpans → spans nesting, 64-bit nano
# timestamps as JSON strings per the OTLP/JSON encoding, service.name
# as a resource attribute), every 3rd event adds a CHILD span under the
# root; the Spark side runs the real `parse_otlp_traces` chain
# (converter.rs shape) and aggregates per (service, kind); the oracle
# states the expected extracted values straight from the generating
# formulas — the three-level explode, the attribute-list → map fold,
# the ns arithmetic, and root/child attribution are all on trial.
# Durations are whole milliseconds, so (end−start)/1e6 is an
# integer-valued double and the ms sums are exact in both engines.


def _q140_otlp_line() -> Column:
    eid = F.col("event_id")
    svc = F.concat(F.lit("svc-"), (F.col("user_id") % 5).cast("string"))
    start_ns = F.expr("unix_micros(ts) * 1000")
    root_end = start_ns + (eid % 5000) * 1_000_000
    child_end = start_ns + (eid % 700) * 1_000_000

    def span(span_id: Column, parent: Column, name: str, kind: Column, end_ns) -> Column:
        return F.concat(
            F.lit('{"traceId":"t'),
            eid.cast("string"),
            F.lit('","spanId":"'),
            span_id,
            F.lit('","parentSpanId":"'),
            parent,
            F.lit(f'","name":"{name}","kind":'),
            kind.cast("string"),
            F.lit(',"startTimeUnixNano":"'),
            start_ns.cast("string"),
            F.lit('","endTimeUnixNano":"'),
            end_ns.cast("string"),
            F.lit('","attributes":[{"key":"http.route","value":{"stringValue":"/'),
            F.col("event_type"),
            F.lit('"}}]}'),
        )

    root = span(
        F.concat(F.lit("s"), eid.cast("string")),
        F.lit(""),
        "handle",
        F.lit(1) + (eid % 2).cast("int"),
        root_end,
    )
    child = span(
        F.concat(F.lit("c"), eid.cast("string")),
        F.concat(F.lit("s"), eid.cast("string")),
        "db.query",
        F.lit(3),
        child_end,
    )
    spans = F.when(
        eid % 3 == 0, F.concat(root, F.lit(","), child)
    ).otherwise(root)
    return F.concat(
        F.lit('{"resourceSpans":[{"resource":{"attributes":[{"key":"service.name","value":{"stringValue":"'),
        svc,
        F.lit('"}}]},"scopeSpans":[{"spans":['),
        spans,
        F.lit("]}]}]}"),
    )


@query(
    "q140_otlp_span_stats",
    oracle="""
WITH src AS (
  SELECT event_id, user_id,
         'svc-' || CAST(user_id % 5 AS VARCHAR) AS service,
         CAST(1 + event_id % 2 AS INTEGER) AS root_kind,
         event_id % 5000 AS root_ms,
         event_id % 700 AS child_ms
  FROM events
), spans AS (
  SELECT service, root_kind AS kind, root_ms AS dur_ms, 1 AS is_root, event_id
  FROM src
  UNION ALL
  SELECT service, CAST(3 AS INTEGER) AS kind, child_ms, 0, event_id
  FROM src WHERE event_id % 3 = 0
)
SELECT service AS service_name, kind,
       count(*) AS n_spans,
       count(DISTINCT event_id) AS n_traces,
       CAST(sum(dur_ms) AS BIGINT) AS total_ms,
       CAST(sum(is_root) AS BIGINT) AS n_root
FROM spans
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def q140(spark: SparkSession, sf: str) -> DataFrame:
    """Per-(service, span-kind) trace statistics through the REAL OTLP
    ingest chain: span counts, distinct traces, exact total duration
    ms, and root-span attribution (parentSpanId == '').

    Plan (100 TB shape): the envelope parse + three-level explode run
    inside the scan projection (one from_json per line, lateral
    explodes are pipeline-local); the only exchange is the final
    map-side-combinable (service, kind) aggregate — the A4 converter's
    economics (converter.rs flattens per received batch; the
    aggregation grain is ClickHouse's otel_traces rollup).
    """
    from alt_spark.sources.otlp import parse_otlp_traces

    ev = load_table(spark, sf, "events")
    lines = ev.select(_q140_otlp_line().alias("value"))
    spans = parse_otlp_traces(lines)
    return (
        spans.groupBy("service_name", "kind")
        .agg(
            F.count("*").alias("n_spans"),
            F.countDistinct("trace_id").alias("n_traces"),
            F.sum("duration_ms").cast("long").alias("total_ms"),
            F.sum(
                F.when(F.col("parent_span_id") == "", 1).otherwise(0)
            )
            .cast("long")
            .alias("n_root"),
        )
        .orderBy("service_name", "kind")
    )


# ---------------------------------------------------------------------------
# q142: cross-encoder rerank stage, driver-hash-checked (VERDICT r11
# item 3 — the last substantive retrieval operator with model-backed
# pytest evidence only). The REAL `rerank_topk` chain runs end to end
# — per-id dedupe keeping the best incoming row, the max_candidates
# server cap ordered (score DESC, id), per-candidate char truncation,
# model scoring through the Arrow-batched reranker UDF, final top-k by
# (score DESC, id) — with a deterministic INTEGER scorer in the model
# slot (permyriad token-set Jaccard between query and truncated
# candidate, the q137 integer-twin doctrine), so the oracle can replay
# every stage in SQL and the hash pins dedupe arbitration, cap order,
# truncation boundary and ranking at once. The planted candidate set
# puts each stage on trial: every doc arrives with a derandomized
# integer incoming score, every 9th doc ALSO arrives as a same-id
# variant with a strictly higher score (dedupe must keep the variant),
# and the 120-char truncation genuinely cuts (n_chars ~ up to 4000).
# Reference: rag-orchestrator internal/usecase/retrieval/rerank.go:
# 22-96 (dedupe → cap → score → sort → TopK) + rerank_server.py's
# MAX_CANDIDATES / length-truncation service caps; the CrossEncoder
# itself stays behind functions/llm.py (model-backed pytest).
_RR_QUERY = "dup vector stream quality data"
_RR_MULT = 2654435761  # Knuth multiplicative hash (public constant)
_RR_MOD = 997
_RR_DUP_MOD = 9
_RR_BOOST = 37
_RR_CAP = 64
_RR_CHARS = 120
_RR_K = 10


def _rr_scorer(pairs: list[tuple[str, str]]) -> list[float]:
    """Permyriad token-set Jaccard, truncated toward zero — integers
    end to end, so the float return is exactly representable and the
    DuckDB replay agrees bit-for-bit. Tokenization mirrors the engine
    contract (lower + \\W+ split, empties dropped) with re.ASCII so
    Python's \\W matches Java's and RE2's ASCII word class."""
    import re

    qt = {
        t
        for t in re.split(r"\W+", _RR_QUERY.lower(), flags=re.ASCII)
        if t
    }
    out = []
    for _q, c in pairs:
        ct = {
            t
            for t in re.split(r"\W+", (c or "").lower(), flags=re.ASCII)
            if t
        }
        union = len(qt | ct)
        out.append(float((10000 * len(qt & ct)) // union) if union else 0.0)
    return out


def _rr_ddb_tokens(expr: str) -> str:
    return (
        f"list_distinct(list_filter(string_split_regex(lower({expr}),"
        " '\\W+'), x -> x <> ''))"
    )


def _q142_oracle() -> str:
    qlist = (
        "list_distinct(list_filter(string_split_regex("
        f"lower('{_RR_QUERY}'), '\\W+'), x -> x <> ''))"
    )
    return f"""
WITH base AS (
  SELECT doc_id AS id, text,
         (doc_id * {_RR_MULT}) % {_RR_MOD} AS score
  FROM documents
  UNION ALL
  SELECT doc_id, text || ' rerank dup variant',
         (doc_id * {_RR_MULT}) % {_RR_MOD} + {_RR_BOOST}
  FROM documents WHERE doc_id % {_RR_DUP_MOD} = 0
), dedup AS (
  SELECT id, text, score FROM (
    SELECT id, text, score,
           row_number() OVER (PARTITION BY id
                              ORDER BY score DESC, text) AS rn
    FROM base
  ) WHERE rn = 1
), cap AS (
  SELECT id, substring(text, 1, {_RR_CHARS}) AS t
  FROM dedup ORDER BY score DESC, id LIMIT {_RR_CAP}
), toks AS (
  SELECT id, {_rr_ddb_tokens('t')} AS ts FROM cap
), scored AS (
  SELECT id,
         CAST((10000 * len(list_intersect(ts, {qlist})))
              // len(list_distinct(list_concat(ts, {qlist})))
              AS DOUBLE) AS rerank_score
  FROM toks
)
SELECT id, rerank_score FROM scored
ORDER BY rerank_score DESC, id
LIMIT {_RR_K}
"""


@query("q142_rerank_integer", oracle=_q142_oracle())
def q142(spark: SparkSession, sf: str) -> DataFrame:
    """Retrieval Stage-4 rerank through the real operator chain with a
    deterministic integer scorer in the model slot — dedupe, cap,
    truncation and top-k are all on trial (see the header comment).

    Scale shape: a rerank set is retrieval-sized by CONTRACT
    (<= max_candidates per query); the dedupe window partitions by id
    (bounded fan-in), the cap is one bounded global top-k, and the
    scorer rides the same Arrow-batched UDF production uses — swapping
    the CrossEncoder endpoint back in changes no plan shape.
    """
    from alt_spark.operators.search import rerank_topk

    docs = load_table(spark, sf, "documents")
    score = (F.col("doc_id") * _RR_MULT) % _RR_MOD
    base = docs.select(
        F.col("doc_id"), F.col("text"), score.alias("score")
    )
    dup = docs.filter(F.col("doc_id") % _RR_DUP_MOD == 0).select(
        F.col("doc_id"),
        F.concat(F.col("text"), F.lit(" rerank dup variant")).alias(
            "text"
        ),
        (score + _RR_BOOST).alias("score"),
    )
    return rerank_topk(
        base.unionByName(dup),
        query=_RR_QUERY,
        model=_rr_scorer,
        k=_RR_K,
        max_candidates=_RR_CAP,
        max_candidate_chars=_RR_CHARS,
    )


# ---------------------------------------------------------------------------
# q144: export-manifest audit, driver-hash-checked (VERDICT r11 item 5
# — the training-export sink was the last sink with roundtrip-pytest
# evidence only). The REAL two-phase export runs end to end inside the
# query (stage partitioned parquet → manifest aggregated FROM the
# staged bytes → atomic version publish — the index_articles.go:69-94
# publish contract), then the query independently re-derives every
# shard's row count, token sum and order-insensitive content
# fingerprint from the COMMITTED version's data files through the
# reader path (`read_export`, manifest-pinned schema) and compares
# against the manifest table. The oracle states the expected audited
# values straight from the generating formulas over `documents` plus
# `true` for both match flags — a lost row, a truncated part file, a
# partition-column dtype drift, or a manifest that lies all flip a
# flag or a count and break the hash. The fingerprint itself is
# xxhash64 (not DuckDB-expressible — the q53-q55 economics), so what
# the oracle pins is the MATCH of the two independent Spark-side
# derivations plus the SQL-derivable counts; fingerprint sensitivity
# to row loss/mutation is pinned separately in tests/test_training.py.
_EXA_SHARDS = 8


@query(
    "q144_export_manifest_audit",
    oracle=f"""
SELECT doc_id % {_EXA_SHARDS} AS shard,
       count(*) AS n_rows,
       CAST(sum(n_chars) AS BIGINT) AS token_sum,
       true AS rows_match,
       true AS hash_match
FROM documents
GROUP BY 1
ORDER BY 1
""",
)
def q144(spark: SparkSession, sf: str) -> DataFrame:
    """Audit a freshly committed corpus export: per shard, the
    manifest's certified row count and token sum, plus whether an
    independent re-derivation from the committed data files agrees on
    count AND content fingerprint (see the header comment).

    Scale shape: the audit is one column-pruned pass over the exported
    parquet with a per-shard combinable aggregate — the same bounded
    economics as `verify_export`; the export itself is executor-
    written partitioned parquet (never a driver funnel), and the
    manifest join is shard-cardinality (broadcast-sized).
    """
    from alt_spark.sources.training_export import (
        export_packed_corpus,
        read_export,
    )

    docs = load_table(spark, sf, "documents").select(
        "doc_id",
        "text",
        "lang",
        "source",
        "n_chars",
        (F.col("doc_id") % _EXA_SHARDS).alias("shard"),
    )
    root = tempfile.mkdtemp(prefix="q144_export_")
    try:
        manifest = export_packed_corpus(
            docs, root, shard_col="shard", token_col="n_chars"
        )
        # Content columns come from the manifest's OWN certified schema
        # (what _shard_stats hashed at export time), not a hand-kept
        # list — a future change to the export's column set or order
        # cannot silently flip hash_match (review finding, r12). The
        # aggregation below stays an independent re-derivation.
        from pyspark.sql.types import StructType

        mschema = StructType.fromJson(manifest["schema"])
        content_cols = [
            f.name
            for f in mschema.fields
            if f.name != manifest["shard_col"]
        ]
        mdf = spark.createDataFrame(
            [
                (
                    int(e["shard"]),
                    int(e["n_rows"]),
                    int(e["token_sum"]),
                    int(e["content_hash"]),
                )
                for e in manifest["shards"]
            ],
            "shard long, n_rows long, token_sum long, content_hash long",
        )
        derived = (
            read_export(spark, root)
            .groupBy("shard")
            .agg(
                F.count("*").cast("long").alias("d_rows"),
                F.sum(F.xxhash64(*content_cols)).alias("d_hash"),
            )
        )
        out = (
            mdf.join(derived, "shard", "full")
            .select(
                "shard",
                "n_rows",
                "token_sum",
                F.coalesce(
                    F.col("n_rows") == F.col("d_rows"), F.lit(False)
                ).alias("rows_match"),
                F.coalesce(
                    F.col("content_hash") == F.col("d_hash"), F.lit(False)
                ).alias("hash_match"),
            )
            .orderBy("shard")
        )
        # Materialize before the export dir disappears.
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# q145: checkpointed projector replay with a DLQ, driver-hash-checked
# (K1/K2/K5/D12 as ONE query — the projector chain and the DLQ carried
# pytest-only evidence; q20 pinned the batch fold shape but rotated out
# in r8 and never exercised the streaming merge or the poison path).
# The q131 replay footing: events re-land as 3 residue-keyed
# mtime-staggered micro-batches, every 11th-residue-7 event ALSO ships
# a poison twin (new id, value = -1 — fails the projector's validation
# predicate) in its base row's batch, and the REAL run_projector fold
# runs: per micro-batch, poison rows append to the DLQ side table with
# the batch id (K5 — never silently skipped), valid rows fold into
# per-user partial state (commutative monoid ops) and merge into the
# versioned projection (D12 greatest/sum/last-by-seq; K1 versioned
# state write). Output = the final projection (one row per user) plus
# one DLQ summary row per batch under reserved negative user ids; the
# oracle replays the fold as a plain GROUP BY (stream-fold ≡ batch
# groupBy — the monoid property the streaming tests pin) and the DLQ
# accounting from the planting formulas. Cross-batch dedupe (K3) stays
# q131's trial — this replay runs dedupe=False so no watermark
# eviction nondeterminism can touch the hash.
# Reference: knowledge_home_projector/projector.go:138-192 (replay
# loop), :199-230 (dispatch), :446-509 (fold ops); sql_fragments.go:
# 13-20 (merge-op vocabulary).
_PRJ_BATCHES = 3
_PRJ_POISON_MOD = 11
_PRJ_POISON_RES = 7
_PRJ_POISON_BASE = 3_000_000_000


def _q145_oracle() -> str:
    return f"""
WITH raw AS (
  SELECT event_id % {_PRJ_BATCHES} AS batch, event_id, ts, user_id,
         event_type, value
  FROM events
  UNION ALL
  SELECT event_id % {_PRJ_BATCHES}, {_PRJ_POISON_BASE} + event_id, ts,
         user_id, event_type, -1.0
  FROM events
  WHERE event_id % {_PRJ_POISON_MOD} = {_PRJ_POISON_RES}
), proj AS (
  SELECT user_id,
         max(event_id) AS last_event_id,
         epoch_us(arg_max(ts, event_id)) AS last_ts_us,
         max(value) AS max_value,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
           AS clicks,
         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
           AS views,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
           AS errors,
         count(*) AS n_events
  FROM raw WHERE value >= 0 GROUP BY user_id
), dlq AS (
  SELECT -(batch + 1) AS user_id,
         CAST(sum(event_id) AS BIGINT) AS last_event_id,
         CAST(0 AS BIGINT) AS last_ts_us,
         -1.0 AS max_value,
         CAST(0 AS BIGINT) AS clicks, CAST(0 AS BIGINT) AS views,
         CAST(0 AS BIGINT) AS errors,
         count(*) AS n_events
  FROM raw WHERE value < 0 GROUP BY batch
)
SELECT * FROM proj
UNION ALL
SELECT * FROM dlq
ORDER BY user_id
"""


@query("q145_projector_dlq_replay", oracle=_q145_oracle())
def q145(spark: SparkSession, sf: str) -> DataFrame:
    """Checkpointed event-fold projector with poison-row DLQ through a
    REAL Structured-Streaming replay: final per-user projection state
    (last event by seq, max value, per-type counters) plus per-batch
    DLQ accounting under reserved negative user ids (see the header
    comment for what the hash pins).

    Scale shape: per micro-batch the fold is one map-side-combinable
    groupBy(user) over the batch only; the merge joins the batch delta
    against user-cardinality state (the D12 MERGE INTO analog); DLQ
    writes are append-only provenance. The re-landing is harness
    economics (the q49/q131 device) — production points run_projector
    at the live event log.
    """
    import time

    from alt_spark.streaming.landing import (
        land_residue_chunks,
        replay_shuffle_partitions,
    )
    from alt_spark.streaming.projector import (
        read_projection,
        run_projector,
    )

    ev = load_table(spark, sf, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    # Precondition guard (the q147 doctrine): the projector DLQs any
    # NULL in the validated columns, but the oracle's value>=0 /
    # value<0 split drops NULL rows from BOTH legs — a regenerated
    # fixture with one NULL would surface as an opaque hash diff, so
    # fail loudly here instead.
    n_null = ev.filter(
        F.col("user_id").isNull()
        | F.col("event_id").isNull()
        | F.col("event_type").isNull()
        | F.col("value").isNull()
    ).count()
    if n_null:
        raise RuntimeError(
            f"q145 precondition broken: {n_null} events rows carry "
            "NULL in a validated column; the union-split oracle and "
            "the projector's DLQ predicate diverge on NULLs"
        )
    raw = ev.select(
        (F.col("event_id") % _PRJ_BATCHES).alias("batch"),
        "event_id",
        "ts",
        "user_id",
        "event_type",
        "value",
    ).unionByName(
        ev.filter(
            F.col("event_id") % _PRJ_POISON_MOD == _PRJ_POISON_RES
        ).select(
            (F.col("event_id") % _PRJ_BATCHES).alias("batch"),
            (F.lit(_PRJ_POISON_BASE) + F.col("event_id")).alias(
                "event_id"
            ),
            "ts",
            "user_id",
            "event_type",
            F.lit(-1.0).alias("value"),
        )
    )

    root = tempfile.mkdtemp(prefix="q145_prj_")
    landing = os.path.join(root, "landing")
    state_dir = os.path.join(root, "state")
    os.makedirs(landing)
    try:
        # The shared single-write-job landing device.
        land_residue_chunks(
            raw,
            "batch",
            _PRJ_BATCHES,
            landing,
            os.path.join(root, "stage"),
            time.time(),
        )
        src = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long,"
                " event_type string, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        # Replay-scale shuffle sizing (the shared discipline).
        with replay_shuffle_partitions(spark):
            q = run_projector(
                spark,
                src,
                state_dir,
                os.path.join(root, "ckpt"),
                dedupe=False,
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        proj = read_projection(spark, state_dir)
        out = proj.select(
            "user_id",
            "last_event_id",
            F.unix_micros("last_ts").alias("last_ts_us"),
            "max_value",
            "clicks",
            "views",
            "errors",
            "n_events",
        )
        dlq = spark.read.parquet(os.path.join(state_dir, "dlq"))
        dlq_sum = dlq.groupBy("batch_id").agg(
            F.sum("event_id").alias("last_event_id"),
            F.count("*").alias("n_events"),
        ).select(
            (-(F.col("batch_id") + 1)).cast("long").alias("user_id"),
            "last_event_id",
            F.lit(0).cast("long").alias("last_ts_us"),
            F.lit(-1.0).alias("max_value"),
            F.lit(0).cast("long").alias("clicks"),
            F.lit(0).cast("long").alias("views"),
            F.lit(0).cast("long").alias("errors"),
            "n_events",
        )
        res = out.unionByName(dlq_sum).orderBy("user_id")
        # Materialize before the temp dirs disappear.
        return spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# q147: search-index sink audit, driver-hash-checked (A8/K4 — the
# two-phase `format("searchindex")` batch writer carried pytest-only
# evidence; the q144 audit doctrine applied to the other versioned
# sink). TWO real write jobs run in-query: batch 1 upserts every
# document under 40 colliding keys (last-writer-wins by op_seq inside
# the commit), batch 2 — all op_seqs strictly higher — merges
# corrections over the published v0 snapshot (every 5th doc, every
# 10th a DELETE of its key). The query then reads the committed v1
# snapshot back through the reader path and returns it; the oracle
# replays the op stream's arg-max-by-seq semantics straight from the
# generating formulas, so staging→commit→LWW-merge→delete→atomic
# republish are all on the hash (batch-2 seqs dominate batch-1 seqs,
# which makes apply-over-snapshot equal the union replay — the device
# that keeps the oracle one GROUP BY).
# Reference: search-indexer app/usecase/index_articles.go:69-94 (the
# two-phase publish contract; delete+upsert vocabulary).
_SIX_KEYS = 40
_SIX_CORR_MOD = 5
_SIX_DEL_MOD = 10
_SIX_SEQ_BASE = 100_000


def _q147_oracle() -> str:
    return f"""
WITH ops AS (
  SELECT doc_id AS op_seq,
         'd' || CAST(doc_id % {_SIX_KEYS} AS VARCHAR) AS doc_key,
         't' || CAST(doc_id AS VARCHAR) AS title,
         false AS is_delete
  FROM documents
  UNION ALL
  SELECT {_SIX_SEQ_BASE} + doc_id,
         'd' || CAST(doc_id % {_SIX_KEYS} AS VARCHAR),
         'u' || CAST(doc_id AS VARCHAR),
         doc_id % {_SIX_DEL_MOD} = 0
  FROM documents WHERE doc_id % {_SIX_CORR_MOD} = 0
), last AS (
  SELECT doc_key,
         arg_max(title, op_seq) AS title,
         arg_max(is_delete, op_seq) AS is_delete
  FROM ops GROUP BY doc_key
)
SELECT doc_key, title FROM last WHERE NOT is_delete ORDER BY doc_key
"""


@query("q147_index_sink_audit", oracle=_q147_oracle())
def q147(spark: SparkSession, sf: str) -> DataFrame:
    """Two-phase search-index sink, audited end to end: two real write
    jobs (initial load, then a correction batch with deletes merged
    over the committed snapshot), snapshot read back through the
    reader path (see the header comment for what the hash pins).

    Scale shape: executors stage their partitions durably before any
    acknowledgment (K4), the driver-side LWW merge is index-cardinality
    (the Meilisearch-client analog — the distributed merge for huge
    indexes is the foreachBatch sink, `streaming/index_sink.py`), and
    the atomic version rename keeps concurrent readers consistent.
    """
    from alt_spark.sources.index_writer import (
        SearchIndexDataSource,
        read_index_snapshot,
    )

    spark.dataSource.register(SearchIndexDataSource)
    docs = load_table(spark, sf, "documents")
    key = F.concat(
        F.lit("d"), (F.col("doc_id") % _SIX_KEYS).cast("string")
    )
    batch1 = docs.select(
        F.col("doc_id").alias("op_seq"),
        key.alias("doc_key"),
        F.concat(F.lit("t"), F.col("doc_id").cast("string")).alias(
            "title"
        ),
        F.lit(False).alias("is_delete"),
    )
    batch2 = docs.filter(F.col("doc_id") % _SIX_CORR_MOD == 0).select(
        (F.lit(_SIX_SEQ_BASE) + F.col("doc_id")).alias("op_seq"),
        key.alias("doc_key"),
        F.concat(F.lit("u"), F.col("doc_id").cast("string")).alias(
            "title"
        ),
        (F.col("doc_id") % _SIX_DEL_MOD == 0).alias("is_delete"),
    )
    # The oracle replays arg-max-by-seq over the UNION of both batches;
    # the sink applies batch 2 over the v0 snapshot unconditionally
    # (the snapshot stores no seq). The two agree ONLY because every
    # batch-2 seq exceeds every batch-1 seq — guard it so a fixture
    # scale-up past _SIX_SEQ_BASE fails loudly instead of as an opaque
    # driver-hash diff (the q141 expected-batches doctrine).
    max_id = docs.agg(F.max("doc_id")).first()[0]
    if max_id is not None and max_id >= _SIX_SEQ_BASE:
        raise RuntimeError(
            f"q147 precondition broken: max doc_id {max_id} >= "
            f"_SIX_SEQ_BASE {_SIX_SEQ_BASE}; batch-2 seqs no longer "
            "dominate batch-1 and the union-LWW oracle diverges from "
            "apply-over-snapshot"
        )
    root = tempfile.mkdtemp(prefix="q147_index_")
    idx = os.path.join(root, "index")
    try:
        batch1.write.format("searchindex").option("path", idx).mode(
            "append"
        ).save()
        batch2.write.format("searchindex").option("path", idx).mode(
            "append"
        ).save()
        snap = read_index_snapshot(idx)
        rows = (
            list(
                zip(
                    snap["doc_key"].to_pylist(),
                    snap["title"].to_pylist(),
                )
            )
            if snap is not None
            else []
        )
        return spark.createDataFrame(
            rows, "doc_key string, title string"
        ).orderBy("doc_key")
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# q148: producer → consumer-group replay, driver-hash-checked (A6/A7 —
# the topic producer and consumer-group semantics carried pytest-only
# evidence). The full delivery chain runs in-query: events re-land as
# 3 residue-keyed chunks; the producer STREAM-publishes chunks 0-1 to
# the topic (file-sink manifest = exactly-once flushes), stops, then
# RESUMES from its own checkpoint after chunk 2 lands — only the new
# chunk publishes (producer offsets). Consumer group B tails the topic
# across the same boundary with ITS checkpoint: run 1 sees phases 0-1,
# the resumed run 2 sees ONLY the new publishes (consumer offsets);
# consumer group A attaches fresh at the end and replays everything
# (independent groups). Output = per (group, phase, event_type) counts
# + milli-quantized value sums; the oracle states them from the
# residue formulas — a duplicated flush, a lost offset, or cross-group
# state leakage all break the hash.
# Reference: rask-log-forwarder / mq-hub batch-publish contract
# (docs/services/rask-logging-architecture.md:173-175) + per-group
# consumer offsets.
_TPC_BATCHES = 3
_TPC_PHASE1 = 2  # chunks published before the producer restart


def _q148_oracle() -> str:
    return f"""
WITH src AS (
  SELECT event_id % {_TPC_BATCHES} AS r, event_type,
         CAST(floor(value * 1000) AS BIGINT) AS vm
  FROM events
)
SELECT 'A' AS grp, 'all' AS phase, event_type,
       count(*) AS n, CAST(sum(vm) AS BIGINT) AS value_milli
FROM src GROUP BY event_type
UNION ALL
SELECT 'B', 'phase1', event_type, count(*), CAST(sum(vm) AS BIGINT)
FROM src WHERE r < {_TPC_PHASE1} GROUP BY event_type
UNION ALL
SELECT 'B', 'phase2', event_type, count(*), CAST(sum(vm) AS BIGINT)
FROM src WHERE r >= {_TPC_PHASE1} GROUP BY event_type
ORDER BY grp, phase, event_type
"""


@query("q148_producer_consumer_groups", oracle=_q148_oracle())
def q148(spark: SparkSession, sf: str) -> DataFrame:
    """Topic publish/subscribe with two consumer groups across a
    producer restart — exactly-once flushes, producer offset resume,
    per-group consumer offsets (see the header comment).

    Scale shape: the topic is the append-only event store (date/hour
    partitioning at volume); every fold here is one map-side-combinable
    groupBy(event_type) per micro-batch, and group state is the
    checkpoint directory — nothing corpus-sized lives on the driver.
    """
    import time
    from collections import defaultdict

    from alt_spark.streaming.landing import (
        move_staged_chunk,
        replay_shuffle_partitions,
        stage_residue_chunks,
    )
    from alt_spark.streaming.producer import publish_stream, subscribe

    ev = load_table(spark, sf, "events").select(
        "event_id", "event_type", "value"
    )
    raw = ev.select(
        (F.col("event_id") % _TPC_BATCHES).alias("r"),
        "event_id",
        "event_type",
        "value",
    )

    root = tempfile.mkdtemp(prefix="q148_topic_")
    landing = os.path.join(root, "landing")
    topic = os.path.join(root, "topic")
    ck_pub = os.path.join(root, "ck_pub")
    ck_b = os.path.join(root, "ck_b")
    os.makedirs(landing)
    schema = "event_id long, event_type string, value double"

    # One write job stages every chunk upfront (the shared landing
    # device); the phase boundary is WHEN a chunk moves into the
    # landing dir, so the producer-restart semantics are untouched.
    stage = os.path.join(root, "stage")
    stage_residue_chunks(raw, "r", _TPC_BATCHES, stage)

    def land(b: int, at: float) -> None:
        move_staged_chunk(stage, "r", b, landing, at)

    def run_publish() -> None:
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        q = publish_stream(src, topic, ck_pub)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    acc: dict[tuple[str, str, str], list[int]] = defaultdict(
        lambda: [0, 0]
    )

    def drain(group: str, phase: str, checkpoint: str) -> None:
        def step(bdf: DataFrame, _bid: int) -> None:
            rows = (
                bdf.groupBy("event_type")
                .agg(
                    F.count("*").alias("n"),
                    F.sum(F.floor(F.col("value") * 1000).cast("long"))
                    .alias("vm"),
                )
                .collect()
            )
            for r in rows:
                cell = acc[(group, phase, r["event_type"])]
                cell[0] += int(r["n"])
                cell[1] += int(r["vm"])

        q = (
            subscribe(spark, topic, schema)
            .writeStream.foreachBatch(step)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        try:
            if not q.awaitTermination(300):
                q.stop()
                raise RuntimeError("q148 consumer drain timed out")
        finally:
            if q.isActive:
                q.stop()

    try:
        now = time.time()
        # Replay-scale shuffle sizing (the shared discipline).
        with replay_shuffle_partitions(spark):
            for b in range(_TPC_PHASE1):
                land(b, now + b)
            run_publish()  # phase-1 flushes (manifest exactly-once)
            drain("B", "phase1", ck_b)
            for b in range(_TPC_PHASE1, _TPC_BATCHES):
                land(b, now + 10 + b)
            run_publish()  # resumed producer: only the new chunk
            drain("B", "phase2", ck_b)  # resumed B: only new flushes
            drain("A", "all", os.path.join(root, "ck_a"))  # fresh group
        rows = [
            (g, p, t, c[0], c[1]) for (g, p, t), c in sorted(acc.items())
        ]
        return spark.createDataFrame(
            rows,
            "grp string, phase string, event_type string,"
            " n long, value_milli long",
        ).orderBy("grp", "phase", "event_type")
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# q149: stream-stream interval join, driver-hash-checked (the K-family
# ⊕ correlation operator — `streaming/joins.py:clicks_near_errors` had
# stream==batch pytest parity only). The q139 replay footing: events
# re-land as 4 ts-ORDERED chunks (the tailed append-only log; ordered
# chunking is what makes the inner interval join exact under state
# eviction — any pair spanning a chunk boundary is by construction
# within tolerance of the boundary, where the watermark cannot yet
# have evicted the earlier side), then the REAL watermarked
# stream-stream join runs in append mode: per user, each error pairs
# with same-user clicks within ±_SSJ_TOL_S seconds, join state
# partitioned by the equi-key and evicted by the two-sided event-time
# bound. Output = per-user pair counts + lag/id checksums; the oracle
# is the identical interval join as one batch SQL statement.
_SSJ_TOL_S = 3600
_SSJ_CHUNKS = 4


def _q149_oracle() -> str:
    tol_us = f"CAST({_SSJ_TOL_S} AS BIGINT) * 1000000"
    return f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus
  FROM events WHERE event_type = 'error'
), c AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus
  FROM events WHERE event_type = 'click'
), p AS (
  SELECT e.user_id, e.event_id AS eid, c.event_id AS cid,
         c.tus - e.tus AS lag_us
  FROM e JOIN c ON c.user_id = e.user_id
   AND c.tus BETWEEN e.tus - {tol_us} AND e.tus + {tol_us}
)
SELECT user_id, count(*) AS n_pairs,
       CAST(sum(lag_us) AS BIGINT) AS lag_us_sum,
       CAST(sum(eid) AS BIGINT) AS err_id_sum,
       CAST(sum(cid) AS BIGINT) AS click_id_sum
FROM p GROUP BY user_id ORDER BY user_id
"""


@query("q149_stream_interval_join", oracle=_q149_oracle())
def q149(spark: SparkSession, sf: str) -> DataFrame:
    """Errors × same-user clicks within ±{_SSJ_TOL_S} s through a REAL
    watermarked stream-stream interval join, aggregated per user (see
    the header comment for the exactness argument).

    Scale shape: both streams' buffered state partitions by the
    equi-key (user) and the two-sided event-time bound makes it
    provably evictable — bounded memory at any volume; a
    1000-executor cluster holds each key's recent window locally and
    the interval check never leaves the executor. The re-landing is
    harness economics (q49/q139 device).
    """
    import time
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from alt_spark.streaming.joins import clicks_near_errors
    from alt_spark.streaming.landing import replay_shuffle_partitions
    from alt_spark.streaming.mv import read_events_stream

    root = tempfile.mkdtemp(prefix="q149_ssj_")
    landing = os.path.join(root, "landing")
    os.makedirs(landing)
    name = "q149_ssj_" + uuid.uuid4().hex[:8]
    try:
        t = pq.read_table(os.path.join(sf, "events.parquet"))
        order = pa.compute.sort_indices(
            t, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        t = t.take(order)
        n = t.num_rows
        now = time.time()
        for i in range(_SSJ_CHUNKS):
            lo, hi = i * n // _SSJ_CHUNKS, (i + 1) * n // _SSJ_CHUNKS
            path = os.path.join(landing, f"chunk_{i:03d}.parquet")
            pq.write_table(t.slice(lo, hi - lo), path)
            os.utime(path, (now + i, now + i))
        src = read_events_stream(spark, landing, max_files_per_trigger=1)
        joined = clicks_near_errors(src, tolerance_seconds=_SSJ_TOL_S)
        # Stream-stream join state shuffles BOTH sides per micro-batch;
        # at replay scale 32 state partitions are pure per-task
        # overhead (measured 22 s -> ~5 s at sf0.01 with 4) — the
        # shared replay discipline.
        with replay_shuffle_partitions(spark):
            q = (
                joined.writeStream.outputMode("append")
                .format("memory")
                .queryName(name)
                .option("checkpointLocation", os.path.join(root, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            try:
                if not q.awaitTermination(300):
                    q.stop()
                    raise RuntimeError("q149 streaming replay timed out")
            finally:
                if q.isActive:
                    q.stop()
        out = (
            spark.table(name)
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n_pairs"),
                F.sum(F.col("lag_us").cast("long")).alias("lag_us_sum"),
                F.sum("error_id").alias("err_id_sum"),
                F.sum("click_id").alias("click_id_sum"),
            )
            .orderBy("user_id")
        )
        # Materialize before the sink/landing dirs go away.
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        try:
            spark.catalog.dropTempView(name)
        except Exception:
            pass


# ---------------------------------------------------------------------------
# q150: partition-aligned retention lifecycle, driver-hash-checked
# (K6 + K7 as one query — `streaming/retention.py` carried pytest-only
# evidence since q101's rotation; this drives BOTH mechanisms on a
# freshly partitioned table). Events write partitionBy(p_date); the
# TTL pass drops whole date partitions older than the keep horizon
# (the ttl_only_drop_parts rule — a filesystem metadata op, never a
# row rewrite), then the size trim drops oldest-first whole partitions
# until the retained footer-counted rows fit the budget (the XTRIM
# MAXLEN ~ analog: node-granularity overshoot, newest partition never
# trimmed). The query returns the RETAINED per-date counts and id
# checksums read back from the table — what survived is the whole
# trial; the oracle replays horizon filter + suffix-sum trim in SQL
# (retained = partitions whose newest-first running total fits the
# budget, plus always the newest).
# Reference: clickhouse/migrations/001_create_logs_table.sql:15-16 +
# 007_update_ttl_1day.sql:15-22 (partition-aligned TTL);
# mq-hub redis_driver.go capped stream (approximate MAXLEN).
_RET_KEEP_DAYS = 20
_RET_BUDGET_DIV = 3  # max_rows = total_rows div 3


def _q150_oracle() -> str:
    return f"""
WITH d AS (
  SELECT CAST(ts AS DATE) AS p_date, event_id FROM events
), agg AS (
  SELECT p_date, count(*) AS n, sum(event_id) AS ck FROM d GROUP BY 1
), mx AS (
  SELECT max(p_date) AS md, CAST(sum(n) AS BIGINT) AS tot FROM agg
), kept1 AS (
  SELECT a.* FROM agg a, mx m
  WHERE a.p_date >= m.md - INTERVAL {_RET_KEEP_DAYS} DAY
), sfx AS (
  SELECT p_date, n, ck,
         sum(n) OVER (ORDER BY p_date DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS s
  FROM kept1
)
SELECT CAST(sfx.p_date AS VARCHAR) AS p_date,
       sfx.n AS n_rows,
       CAST(sfx.ck AS BIGINT) AS id_checksum
FROM sfx, mx
WHERE sfx.s <= mx.tot // {_RET_BUDGET_DIV}
   OR sfx.p_date = (SELECT max(p_date) FROM kept1)
ORDER BY 1
"""


@query("q150_retention_lifecycle", oracle=_q150_oracle())
def q150(spark: SparkSession, sf: str) -> DataFrame:
    """TTL + size-trim retention over a date-partitioned event table,
    returning what SURVIVED both passes (see the header comment).

    Scale shape: both mechanisms are partition-directory deletes —
    O(partitions) metadata ops with zero data scan or rewrite (row
    counts come from parquet footers), the only viable retention shape
    at 100 TB; the audit read-back is one partition-pruned combinable
    aggregate.
    """
    from alt_spark.streaming.retention import (
        drop_expired_partitions,
        trim_to_max_rows,
    )

    ev = load_table(spark, sf, "events").select(
        "event_id", F.col("ts").cast("date").alias("p_date")
    )
    root = tempfile.mkdtemp(prefix="q150_ret_")
    tbl = os.path.join(root, "table")
    try:
        ev.write.partitionBy("p_date").parquet(tbl)
        # One combined aggregate for both retention parameters (a
        # second scan for count alone would be wasted work — review
        # finding r12).
        stats = ev.agg(
            F.max("p_date").alias("mx"), F.count("*").alias("n")
        ).first()
        as_of, total = stats["mx"], stats["n"]
        drop_expired_partitions(tbl, _RET_KEEP_DAYS, as_of=as_of)
        trim_to_max_rows(tbl, total // _RET_BUDGET_DIV)
        out = (
            spark.read.parquet(tbl)
            .groupBy(F.col("p_date").cast("string").alias("p_date"))
            .agg(
                F.count("*").alias("n_rows"),
                F.sum("event_id").alias("id_checksum"),
            )
            .orderBy("p_date")
        )
        # Materialize before the table dir disappears.
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# q151: footer-statistics catalog audit, driver-hash-checked (the §2.A
# ⊕ metadata-only scan path — `sources/metadata_scan.py` carried
# plan-pin pytest only). For five tables the query answers
# COUNT/MIN/MAX from parquet FOOTERS through the scoped DSv2
# aggregate-pushdown path with require_pushdown=True — if the planner
# ever fell back to a data scan the query would RAISE, so a green hash
# row certifies both the values and that they were metadata-cost; the
# oracle states the same stats via plain SQL over the same files.
# Reference analog: ClickHouse part-level count/minmax indices
# (system.parts answering trivial aggregates without scanning marks).
_FS_TABLES = (
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
    ("events", "event_id"),
    ("lineitem", "l_orderkey"),
    ("orders", "o_orderkey"),
)


def _q151_oracle() -> str:
    parts = [
        f"""SELECT '{t}' AS tbl, count(*) AS n_rows,
       CAST(min({c}) AS BIGINT) AS min_id,
       CAST(max({c}) AS BIGINT) AS max_id,
       true AS pushed
FROM {t}"""
        for t, c in _FS_TABLES
    ]
    return "\nUNION ALL\n".join(parts) + "\nORDER BY tbl"


@query("q151_footer_stats_catalog", oracle=_q151_oracle())
def q151(spark: SparkSession, sf: str) -> DataFrame:
    """COUNT/MIN/MAX for five tables answered from parquet footer
    statistics (PushedAggregation — zero data pages read), hashed
    against plain SQL over the same files.

    Scale shape: this is the 100 TB "how big is this corpus" query at
    metadata cost — O(files) footer reads, no scan; require_pushdown
    makes a silent fallback to a corpus read a loud failure instead of
    a quiet regression.
    """
    from alt_spark.sources.metadata_scan import footer_stats

    rows = []
    for tbl, idc in _FS_TABLES:
        st = footer_stats(
            spark,
            os.path.join(sf, f"{tbl}.parquet"),
            minmax_cols=(idc,),
            require_pushdown=True,
        )
        rows.append(
            (
                tbl,
                int(st["n_rows"]),
                int(st["min"][idc]),
                int(st["max"][idc]),
                bool(st["pushed"]),
            )
        )
    return spark.createDataFrame(
        rows,
        "tbl string, n_rows long, min_id long, max_id long,"
        " pushed boolean",
    ).orderBy("tbl")


# ---------------------------------------------------------------------------
# q152: the SQL entry point, driver-hash-checked (`catalog.sql` —
# previously pytest-only: SQL==DataFrame rows + plan-shape pins in
# test_catalog_canary.py). ONE shared ANSI statement is executed by
# BOTH engines — Spark runs it through the real facade
# (register_views memo + staleness probe + spark.sql), DuckDB runs the
# byte-identical text as the oracle — so the fact that a reference
# user can point existing SQL at this engine is itself on the hash.
# Exactness: quantities cast to BIGINT (integer-valued doubles),
# revenue floor-quantized to cents BEFORE summing (the _KM_Q device —
# float sums never ride the hash raw).
_Q152_SQL = """
SELECT o.o_orderpriority AS priority,
       l.l_returnflag AS returnflag,
       count(*) AS n_items,
       count(DISTINCT l.l_orderkey) AS n_orders,
       CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_discount > 0.02
GROUP BY o.o_orderpriority, l.l_returnflag
HAVING count(*) > 5
ORDER BY priority, returnflag
"""


@query("q152_sql_facade_pricing", oracle=_Q152_SQL)
def q152(spark: SparkSession, sf: str) -> DataFrame:
    """A pricing rollup issued as plain SQL through the engine's SQL
    facade — join, aggregate, COUNT DISTINCT, HAVING and ORDER BY all
    planned by Catalyst from the same text DuckDB replays verbatim
    (see the header comment).

    Scale shape: identical to the DataFrame form — the facade's views
    go through `load_table` (pinned schemas, ts-layout probe, column
    pruning), so pushdown/pruning/AQE hold for SQL consumers too; the
    join shuffles on the order key and the aggregate combines
    map-side.
    """
    from alt_spark.catalog import sql as engine_sql

    return engine_sql(spark, sf, _Q152_SQL)


# ---------------------------------------------------------------------------
# q153: LLM summarize → judge → gate chain, driver-hash-checked (I14 —
# the external-model UDF surface carried batching-contract pytest
# only; the q142 integer-twin doctrine applied to the OTHER two model
# slots). The REAL chain runs end to end — `make_llm_udf` wraps the
# deterministic summarizer endpoint (first 8 whitespace tokens, the
# declared fake), `quality_gate` wraps the deterministic judge
# (min(10, 1 + distinct_tokens // 2) as a string score, cast + the
# threshold-7 filter from quality_judger.go) — and per-source totals,
# pass counts, passed score sums and passed-summary char sums go on
# the hash; the oracle replays both endpoint formulas in SQL. NO model
# ships (this container has none): what the hash certifies is the
# Arrow-batched UDF plumbing, the string→int score contract, the gate
# semantics and the summarizer text math — swap the HTTP endpoints in
# and no plan changes.
# Reference: news-creator Ollama summarization; pre-processor
# quality_judger.go:27,120-166 (1-10 score, accept >= 7).
_QJ_THRESHOLD = 7


def _q153_oracle() -> str:
    toks = "list_filter(string_split_regex({col}, '\\s+'), x -> x <> '')"
    summary = (
        "array_to_string(list_slice("
        + toks.format(col="text")
        + ", 1, 8), ' ')"
    )
    quality = (
        "least(10, 1 + len(list_distinct("
        + toks.format(col="text")
        + ")) // 2)"
    )
    return f"""
WITH s AS (
  SELECT doc_id, source,
         {summary} AS summary,
         {quality} AS quality
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN quality >= {_QJ_THRESHOLD} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_passed,
       CAST(sum(CASE WHEN quality >= {_QJ_THRESHOLD} THEN quality ELSE 0 END)
            AS BIGINT) AS score_sum,
       CAST(sum(CASE WHEN quality >= {_QJ_THRESHOLD} THEN length(summary)
                ELSE 0 END) AS BIGINT) AS summary_chars
FROM s GROUP BY source ORDER BY source
"""


@query("q153_llm_judge_gate", oracle=_q153_oracle())
def q153(spark: SparkSession, sf: str) -> DataFrame:
    """Summarize + judge + threshold-gate through the real Arrow-
    batched external-model UDF surface, per-source audit totals on the
    hash (see the header comment).

    Scale shape: both model slots are batched pandas UDFs — the Arrow
    batch is the unit of endpoint calls, maxRecordsPerBatch bounds
    request fan-in (how a 100 TB scan amortizes per-request overhead);
    the gate is a scan-local filter and the audit one combinable
    aggregate.
    """
    from alt_spark.functions.llm import (
        fake_judge,
        fake_summarizer,
        make_llm_udf,
        quality_gate,
    )

    docs = load_table(spark, sf, "documents").select(
        "doc_id", "source", "text"
    )
    with_summary = docs.withColumn(
        "summary", make_llm_udf(fake_summarizer)(F.col("text"))
    )
    passed = quality_gate(
        with_summary,
        text_col="text",
        judge=fake_judge,
        threshold=_QJ_THRESHOLD,
    )
    totals = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    gated = passed.groupBy("source").agg(
        F.count("*").alias("n_passed"),
        F.sum("quality").cast("long").alias("score_sum"),
        F.sum(F.length("summary")).cast("long").alias("summary_chars"),
    )
    return (
        totals.join(gated, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_passed", F.lit(0)).cast("long").alias(
                "n_passed"
            ),
            F.coalesce("score_sum", F.lit(0).cast("long")).alias(
                "score_sum"
            ),
            F.coalesce("summary_chars", F.lit(0).cast("long")).alias(
                "summary_chars"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q154: OTLP LOGS ingest, driver-hash-checked (A4's second signal —
# q140 pinned the traces leg; the reference converts OTLP logs too,
# converter.rs → 004_create_otel_logs.sql). Every event renders a REAL
# OTLP/JSON logs export envelope (resourceLogs → scopeLogs →
# logRecords nesting, 64-bit nano timestamps as JSON strings,
# service.name as a resource attribute, severityNumber + severityText,
# Body as stringValue, one record attribute); every 3rd event adds a
# SECOND aux record in the same envelope (record-level explode on
# trial); the real `parse_otlp_logs` chain flattens it and per
# (service, severity, attr-type) counts / µs time bounds / body-id
# checksums hash against the generating formulas — the three-level
# explode, the attribute fold, body extraction and the ns→µs
# truncation are all on trial.
_OL_AUX_MOD = 3


def _q154_log_line() -> Column:
    eid = F.col("event_id")
    svc = F.concat(F.lit("svc-"), (F.col("user_id") % 5).cast("string"))
    tns = F.expr("CAST(unix_micros(ts) * 1000 AS STRING)")
    sev_num = (
        F.when(F.col("event_type") == "click", F.lit(9))
        .when(F.col("event_type") == "view", F.lit(5))
        .when(F.col("event_type") == "error", F.lit(17))
        .otherwise(F.lit(13))
    )
    sev_txt = (
        F.when(F.col("event_type") == "click", F.lit("INFO"))
        .when(F.col("event_type") == "view", F.lit("DEBUG"))
        .when(F.col("event_type") == "error", F.lit("ERROR"))
        .otherwise(F.lit("WARN"))
    )

    def record(num, txt, body_prefix: str, attr_val) -> Column:
        return F.concat(
            F.lit('{"timeUnixNano":"'),
            tns,
            F.lit('","severityNumber":'),
            num.cast("string"),
            F.lit(',"severityText":"'),
            txt,
            F.lit('","body":{"stringValue":"'),
            F.lit(body_prefix),
            eid.cast("string"),
            F.lit('"},"attributes":[{"key":"evt.type","value":{"stringValue":"'),
            attr_val,
            F.lit('"}}]}'),
        )

    records = F.concat(
        record(sev_num, sev_txt, "evt-", F.col("event_type")),
        F.when(
            eid % _OL_AUX_MOD == 0,
            F.concat(
                F.lit(","),
                record(F.lit(5), F.lit("DEBUG"), "aux-", F.lit("aux")),
            ),
        ).otherwise(F.lit("")),
    )
    return F.concat(
        F.lit(
            '{"resourceLogs":[{"resource":{"attributes":[{"key":'
            '"service.name","value":{"stringValue":"'
        ),
        svc,
        F.lit('"}}]},"scopeLogs":[{"scope":{"name":"ingest"},'
              '"logRecords":['),
        records,
        F.lit("]}]}]}"),
    )


def _q154_oracle() -> str:
    sev = """CASE event_type WHEN 'click' THEN 'INFO'
              WHEN 'view' THEN 'DEBUG'
              WHEN 'error' THEN 'ERROR' ELSE 'WARN' END"""
    return f"""
WITH base AS (
  SELECT 'svc-' || CAST(user_id % 5 AS VARCHAR) AS service_name,
         {sev} AS severity_text,
         event_type AS attr_type,
         epoch_us(ts) AS tus, event_id
  FROM events
  UNION ALL
  SELECT 'svc-' || CAST(user_id % 5 AS VARCHAR), 'DEBUG', 'aux',
         epoch_us(ts), event_id
  FROM events WHERE event_id % {_OL_AUX_MOD} = 0
)
SELECT service_name, severity_text, attr_type,
       count(*) AS n_records,
       CAST(min(tus) AS BIGINT) AS min_ts_us,
       CAST(max(tus) AS BIGINT) AS max_ts_us,
       CAST(sum(event_id) AS BIGINT) AS body_id_sum
FROM base
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


@query("q154_otlp_log_stats", oracle=_q154_oracle())
def q154(spark: SparkSession, sf: str) -> DataFrame:
    """OTLP/JSON logs envelopes rendered from events, flattened by the
    real `parse_otlp_logs` chain, audited per (service, severity,
    attr-type) — see the header comment for what the hash pins.

    Scale shape: one from_json + three pipeline-local lateral explodes
    inside the scan, then one combinable aggregate — the q140/q48
    synthesis economics.
    """
    from alt_spark.sources.otlp import parse_otlp_logs

    ev = load_table(spark, sf, "events")
    lines = ev.select(_q154_log_line().alias("value"))
    recs = parse_otlp_logs(lines)
    return (
        recs.select(
            "service_name",
            "severity_text",
            F.element_at("attributes", "evt.type").alias("attr_type"),
            F.unix_micros("ts").alias("tus"),
            F.expr("CAST(substring(body, 5) AS BIGINT)").alias("bid"),
        )
        .groupBy("service_name", "severity_text", "attr_type")
        .agg(
            F.count("*").alias("n_records"),
            F.min("tus").alias("min_ts_us"),
            F.max("tus").alias("max_ts_us"),
            F.sum("bid").alias("body_id_sum"),
        )
        .orderBy("service_name", "severity_text", "attr_type")
    )
