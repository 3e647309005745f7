"""NDJSON log source vs DuckDB oracle (SURVEY.md §2.A2/A3, B3-B5).

A seeded generator emits Docker-envelope NDJSON for four producers
(nginx access+error, plecto-proxy structured JSON, a JSON app service,
free-text fallback lines, and guard-violating rows). Spark parses with
the declarative plan in alt_spark.sources.ndjson_logs; DuckDB re-parses
the same file in SQL; aggregates must match exactly.
"""

from __future__ import annotations

import json
import os
import random
import shutil

import duckdb
import pytest

from alt_spark.sources.ndjson_logs import http_logs, read_ndjson_logs, stream_ndjson_logs

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")

_NGINX_ACCESS_SQL = (
    r'^(\S+) \S+ \S+ \[([^\]]+)\] "(\S+) (\S+)[^"]*" (\d{3}) (\d+|-) "([^"]*)" "([^"]*)"'
)
# DuckDB's RE2 shares leftmost-first greedy submatch semantics with the
# reference's Rust regex crate AND Java's engine, so the greedy `.+` in
# the postgres pattern binds the same last `word:` in all three.
_POSTGRES_SQL = r"^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}) .+ (\w+):\s+(.+)"
_ANSI_SQL = r"\x1b(\[[^A-Za-z]*[A-Za-z]?)?"


def _gen_lines(n: int = 2000, seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    methods = ["GET", "GET", "GET", "POST", "PUT", "DELETE"]
    paths = ["/api/feeds", "/api/articles", "/v1/search", "/healthz", "/v1/recap"]
    lines = []
    for i in range(n):
        t = f"2024-01-{1 + i % 28:02d}T{i % 24:02d}:{i % 60:02d}:{(i * 7) % 60:02d}.000Z"
        kind = rng.random()
        if kind < 0.40:  # nginx access
            log = (
                f"{rng.randrange(1, 255)}.0.0.{rng.randrange(1, 255)} - - "
                f"[01/Jan/2024:00:00:00 +0000] "
                f'"{rng.choice(methods)} {rng.choice(paths)} HTTP/1.1" '
                f"{rng.choice([200, 200, 200, 301, 404, 500])} {rng.randrange(100, 50_000)} "
                f'"-" "Mozilla/5.0"'
            )
            name = "/nginx"
        elif kind < 0.48:  # nginx error
            log = (
                f"2024/01/01 00:00:00 [{rng.choice(['error', 'warn', 'crit'])}] "
                f"77#0: *{i} upstream timed out"
            )
            name = "/nginx"
        elif kind < 0.66:  # plecto-proxy structured JSON
            payload = {
                "level": rng.choice(["info", "info", "warn"]),
                "method": rng.choice(methods),
                "path": rng.choice(paths),
                "status": str(rng.choice([200, 201, 204, 502])),
                "client": f"10.0.0.{rng.randrange(1, 255)}",
                "duration_ms": f"{rng.uniform(0.5, 250):.2f}",
                "msg": "handled",
            }
            if rng.random() < 0.1:
                del payload["status"]  # guard-violating row (B3): must not reach http_logs
            log = json.dumps(payload)
            name = "/plecto-proxy"
        elif kind < 0.76:  # app service structured JSON (no http keys)
            log = json.dumps(
                {"level": rng.choice(["info", "warn", "error"]), "msg": "tick", "n": str(i)}
            )
            name = "/alt-backend"
        elif kind < 0.86:  # postgres text format (A3 branch, r11)
            word = rng.choice(
                ["LOG", "INFO", "NOTICE", "WARNING", "ERROR", "FATAL",
                 "PANIC", "DEBUG2", "DEBUG5", "STATEMENT"]
            )
            if rng.random() < 0.15:  # no-match fallback (no leading ts)
                log = f"server process exited abnormally code {i % 7}"
            else:
                log = (
                    f"2024-01-{1 + i % 28:02d} 12:00:{i % 60:02d} UTC "
                    f"[{i % 9999}] {word}:  backend message {i % 41}"
                )
            name = "/postgres"
        elif kind < 0.95:  # meilisearch with ANSI escapes (A3 branch, r11)
            word = rng.choice(["INFO", "WARN", "ERROR", "DEBUG"])
            log = (
                f"\x1b[2m2024-01-01T00:00:{i % 60:02d}Z\x1b[0m  {word} "
                f"\x1b[32mmilli::update\x1b[0m: processed batch {i % 23}"
            )
            name = "/meilisearch"
        else:  # free text fallback
            log = rng.choice(
                ["plain text line", "something [warn] odd", "failed hard [error] here"]
            )
            name = "/alt-backend"
        lines.append(
            json.dumps({"time": t, "stream": "stdout", "container_name": name, "log": log})
        )
    return lines


@pytest.fixture(scope="module")
def ndjson_dir():
    d = os.path.join(SCRATCH, "ndjson_logs")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    lines = _gen_lines()
    half = len(lines) // 2
    for name, chunk in (("a.ndjson", lines[:half]), ("b.ndjson", lines[half:])):
        with open(os.path.join(d, name), "w") as fh:
            fh.write("\n".join(chunk) + "\n")
    return d


@pytest.fixture(scope="module")
def oracle(ndjson_dir):
    con = duckdb.connect()
    con.execute(
        f"""
        CREATE VIEW raw AS
        SELECT * FROM read_ndjson('{ndjson_dir}/*.ndjson',
            columns={{time: 'VARCHAR', stream: 'VARCHAR',
                      container_name: 'VARCHAR', log: 'VARCHAR'}})
        """
    )
    con.execute(
        f"""
        CREATE VIEW parsed AS
        SELECT replace(container_name, '/', '') AS service_name, log,
               regexp_matches(log, $${_NGINX_ACCESS_SQL}$$) AS is_access,
               regexp_matches(log, '^\\d{{4}}/\\d{{2}}/\\d{{2}} \\d{{2}}:\\d{{2}}:\\d{{2}} \\[(\\w+)\\]') AS is_err,
               regexp_matches(log, $${_POSTGRES_SQL}$$) AS is_pg,
               regexp_extract(log, $${_POSTGRES_SQL}$$, 2) AS pg_word,
               regexp_replace(log, $${_ANSI_SQL}$$, '', 'g') AS cleaned,
               log LIKE '{{%' AS is_json
        FROM raw
        """
    )
    yield con
    con.close()


def test_http_logs_parity_with_oracle(spark, ndjson_dir, oracle):
    logs = read_ndjson_logs(spark, ndjson_dir)
    got = {
        tuple(r)
        for r in http_logs(logs)
        .groupBy("service_name", "method", "status_code")
        .agg({"response_size": "sum", "response_time_ms": "avg", "*": "count"})
        .withColumnRenamed("sum(response_size)", "total_size")
        .withColumnRenamed("avg(response_time_ms)", "avg_ms")
        .withColumnRenamed("count(1)", "cnt")
        .selectExpr("service_name", "method", "status_code", "cnt", "total_size", "round(avg_ms, 2) AS avg_ms")
        .collect()
    }
    want = {
        tuple(r)
        for r in oracle.execute(
            f"""
            WITH nginx AS (
              SELECT service_name,
                     regexp_extract(log, $${_NGINX_ACCESS_SQL}$$, 3) AS method,
                     CAST(regexp_extract(log, $${_NGINX_ACCESS_SQL}$$, 5) AS INT) AS status_code,
                     CAST(regexp_extract(log, $${_NGINX_ACCESS_SQL}$$, 6) AS BIGINT) AS size,
                     0.0 AS dur
              FROM parsed WHERE service_name = 'nginx' AND is_access
            ), proxy AS (
              SELECT service_name,
                     json_extract_string(log, '$.method') AS method,
                     CAST(coalesce(json_extract_string(log, '$.status'), '0') AS INT) AS status_code,
                     CAST(0 AS BIGINT) AS size,
                     CAST(json_extract_string(log, '$.duration_ms') AS DOUBLE) AS dur
              FROM parsed
              WHERE service_name = 'plecto-proxy' AND is_json
                AND json_extract_string(log, '$.method') IS NOT NULL
                AND json_extract_string(log, '$.path') IS NOT NULL
                AND json_extract_string(log, '$.status') IS NOT NULL
                AND json_extract_string(log, '$.method') != ''
            )
            SELECT service_name, method, status_code, count(*) AS cnt,
                   sum(size) AS total_size, round(avg(dur), 2) AS avg_ms
            FROM (SELECT * FROM nginx UNION ALL SELECT * FROM proxy)
            GROUP BY 1, 2, 3
            """
        ).fetchall()
    }
    assert got == want


def test_level_histogram_parity(spark, ndjson_dir, oracle):
    logs = read_ndjson_logs(spark, ndjson_dir)
    got = {
        tuple(r)
        for r in logs.groupBy("service_name", "level").count().collect()
    }
    want = {
        tuple(r)
        for r in oracle.execute(
            """
            SELECT service_name,
                   CASE
                     WHEN service_name = 'nginx' AND is_access THEN 'info'
                     WHEN service_name = 'nginx' AND is_err
                       THEN lower(regexp_extract(log, '\\[(\\w+)\\]', 1))
                     WHEN service_name = 'postgres' AND is_pg THEN
                       CASE WHEN pg_word IN ('DEBUG','DEBUG1','DEBUG2','DEBUG3','DEBUG4','DEBUG5') THEN 'debug'
                            WHEN pg_word IN ('LOG','INFO') THEN 'info'
                            WHEN pg_word IN ('NOTICE','WARNING') THEN 'warn'
                            WHEN pg_word = 'ERROR' THEN 'error'
                            WHEN pg_word IN ('FATAL','PANIC') THEN 'fatal'
                            ELSE 'info' END
                     WHEN service_name = 'postgres' THEN 'info'
                     WHEN service_name = 'meilisearch' THEN
                       CASE WHEN cleaned LIKE '% ERROR %' OR cleaned LIKE '%[ERROR]%' THEN 'error'
                            WHEN cleaned LIKE '% WARN %' OR cleaned LIKE '%[WARN]%' THEN 'warn'
                            WHEN cleaned LIKE '% DEBUG %' OR cleaned LIKE '%[DEBUG]%' THEN 'debug'
                            ELSE 'info' END
                     WHEN is_json THEN lower(coalesce(json_extract_string(log, '$.level'), 'info'))
                     WHEN log LIKE '%[error]%' THEN 'error'
                     WHEN log LIKE '%[warn]%' THEN 'warn'
                     ELSE 'info'
                   END AS level,
                   count(*) AS count
            FROM parsed
            GROUP BY 1, 2
            """
        ).fetchall()
    }
    assert got == want


def test_service_message_rewrite_parity(spark, ndjson_dir, oracle):
    """The postgres branch rewrites `message` to the regex's message
    group (raw line on no-match); meilisearch rewrites to the
    ANSI-STRIPPED line. Exact min/max/distinct parity per service over
    the generated corpus."""
    from pyspark.sql import functions as F

    got = {
        tuple(r)
        for r in read_ndjson_logs(spark, ndjson_dir)
        .filter("service_name IN ('postgres', 'meilisearch')")
        .groupBy("service_name")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("message").alias("nd"),
            F.min("message").alias("lo"),
            F.max("message").alias("hi"),
        )
        .collect()
    }
    want = {
        tuple(r)
        for r in oracle.execute(
            f"""
            SELECT service_name, count(*) AS n,
                   count(DISTINCT m) AS nd, min(m) AS lo, max(m) AS hi
            FROM (
              SELECT service_name,
                     CASE WHEN service_name = 'postgres' AND is_pg
                            THEN regexp_extract(log, $${_POSTGRES_SQL}$$, 3)
                          WHEN service_name = 'meilisearch' THEN cleaned
                          ELSE log END AS m
              FROM parsed
              WHERE service_name IN ('postgres', 'meilisearch')
            )
            GROUP BY 1
            """
        ).fetchall()
    }
    assert got == want


def _envelope(container: str, log: str) -> str:
    return json.dumps(
        {
            "time": "2024-01-01 00:00:00",
            "stream": "stdout",
            "container_name": container,
            "log": log,
        }
    )


def test_postgres_branch_planted_semantics(spark):
    """The reference's postgres parser contract on planted lines
    (postgres.rs:22-70 + the final fallback 110-127): the full level
    vocabulary, the GREEDY-regex `statement:` case (the reference's own
    test line shape — level word binds to the LAST `word:`, falling to
    info, and the message is what follows it), and the no-timestamp
    fallback (info + raw line)."""
    from alt_spark.sources.ndjson_logs import parse_logs

    cases = [
        ("2024-01-01 12:00:00 UTC [1] LOG:  checkpoint done", "info", "checkpoint done"),
        ("2024-01-01 12:00:00 UTC [1] INFO:  hello", "info", "hello"),
        ("2024-01-01 12:00:00 UTC [1] NOTICE:  notice me", "warn", "notice me"),
        ("2024-01-01 12:00:00 UTC [1] WARNING:  careful", "warn", "careful"),
        ("2024-01-01 12:00:00 UTC [1] ERROR:  deadlock", "error", "deadlock"),
        ("2024-01-01 12:00:00 UTC [1] FATAL:  oom", "fatal", "oom"),
        ("2024-01-01 12:00:00 UTC [1] PANIC:  corrupt", "fatal", "corrupt"),
        ("2024-01-01 12:00:00 UTC [1] DEBUG1:  d1", "debug", "d1"),
        ("2024-01-01 12:00:00 UTC [1] DEBUG5:  d5", "debug", "d5"),
        # Greedy pin: level word = "statement" (unknown -> info).
        (
            "2024-01-01 12:00:00 UTC [123] LOG:  statement: SELECT * FROM users WHERE id = $1",
            "info",
            "SELECT * FROM users WHERE id = $1",
        ),
        # The reference's own test line carries FRACTIONAL seconds —
        # which the validated pattern's `ts<space>` tail rejects, so it
        # rides the fallback (its asserts pass either way; ours pins
        # which path actually fires).
        (
            "2024-01-01 12:00:00.123 UTC [123] LOG:  statement: SELECT 1",
            "info",
            "2024-01-01 12:00:00.123 UTC [123] LOG:  statement: SELECT 1",
        ),
        # Unknown level word -> info.
        ("2024-01-01 12:00:00 UTC [1] HINT:  try harder", "info", "try harder"),
        # No-match fallback: info + RAW message.
        ("no timestamp here ERROR: not a match", "info", "no timestamp here ERROR: not a match"),
    ]
    df = parse_logs(
        spark.createDataFrame(
            [(_envelope("/postgres", log),) for log, _, _ in cases],
            "value string",
        )
    )
    got = [(r["level"], r["message"]) for r in df.select("level", "message").collect()]
    want = [(lv, msg) for _, lv, msg in cases]
    assert got == want


def _strip_ansi_reference(s: str) -> str:
    """Line-by-line port of the reference's strip loop
    (meilisearch.rs:23-45): ESC+'[' consumes through the first ascii
    letter inclusive (or to end of string); a bare ESC is dropped."""
    out = []
    it = iter(range(len(s)))
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\x1b":
            i += 1
            if i < len(s) and s[i] == "[":
                i += 1
                while i < len(s):
                    ch = s[i]
                    i += 1
                    if ch.isascii() and ch.isalpha():
                        break
        else:
            out.append(c)
            i += 1
    return "".join(out)


def test_meilisearch_strip_matches_reference_loop(spark):
    """Property: the Spark-side ANSI strip + level probe must agree
    with a Python port of the reference loop on adversarial random
    strings (bare ESC, unterminated ESC[, nested sequences, bracketed
    level tokens), evaluated in ONE Spark job."""
    from alt_spark.sources.ndjson_logs import parse_logs

    rng = random.Random(42)
    alphabet = list("\x1b[];0123456789m ABCDEFwxyz") + ["[ERROR]", " WARN ", "\x1b[31m"]
    lines = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
        for _ in range(300)
    ]
    # The canonical shapes too, verbatim.
    lines += [
        "\x1b[2m2024-01-01T00:00:00Z\x1b[0m  ERROR \x1b[32mx\x1b[0m: boom",
        "plain [WARN] with unterminated \x1b[12;",
        "bare \x1bescape kept",
        "\x1b",
        "\x1b[",
    ]

    def want_level(clean: str) -> str:
        if " ERROR " in clean or "[ERROR]" in clean:
            return "error"
        if " WARN " in clean or "[WARN]" in clean:
            return "warn"
        if " DEBUG " in clean or "[DEBUG]" in clean:
            return "debug"
        return "info"

    df = parse_logs(
        spark.createDataFrame(
            [(_envelope("/meilisearch", ln),) for ln in lines], "value string"
        )
    )
    got = [(r["level"], r["message"]) for r in df.select("level", "message").collect()]
    want = [
        (want_level(_strip_ansi_reference(ln)), _strip_ansi_reference(ln))
        for ln in lines
    ]
    assert got == want


def test_streaming_parse_matches_batch(spark, ndjson_dir):
    """A2: the same parse plan over readStream lands identical rows."""
    batch_cnt = http_logs(read_ndjson_logs(spark, ndjson_dir)).count()
    ckpt = os.path.join(SCRATCH, "ndjson_ckpt")
    shutil.rmtree(ckpt, ignore_errors=True)
    q = (
        http_logs(stream_ndjson_logs(spark, ndjson_dir))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("http_logs_stream")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    stream_cnt = spark.sql("SELECT count(*) FROM http_logs_stream").first()[0]
    assert stream_cnt == batch_cnt > 0


def test_q48_envelope_matches_to_json(spark):
    """Permanent pin of the r7 hand-built-envelope experiment (r7
    ADVICE asked for it to outlive the experiment): q48's concat'd
    Docker NDJSON envelope must stay byte-identical to
    to_json(struct(...)) — over the real sf0.01 events corpus AND over
    planted rows whose event_type carries backslashes and quotes (the
    bytes the r8 double-escape exists for). Contract boundary: lines
    with CONTROL characters are out of scope (to_json \\uXXXX-escapes
    them; the synthesized combined-log line cannot contain them)."""
    from pyspark.sql import functions as F

    from alt_spark.catalog import load_table
    from alt_spark.queries.coverage_q import _q48_envelope, _q48_log_line

    ev = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    planted = spark.createDataFrame(
        [
            (9001, 7, "2024-01-02 03:04:05", 'path\\with"both'),
            (9002, 8, "2024-01-02 03:04:06", "\\\\lead\\\\"),
            (9003, 9, "2024-01-02 03:04:07", '"""'),
        ],
        "event_id long, user_id long, ts string, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    for frame in (ev, planted):
        line = _q48_log_line()
        hand = _q48_envelope(line)
        twin = F.to_json(
            F.struct(
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("time"),
                F.lit("stdout").alias("stream"),
                F.lit("/nginx").alias("container_name"),
                line.alias("log"),
            )
        )
        bad = frame.select(
            hand.alias("h"), twin.alias("t")
        ).filter("h IS DISTINCT FROM t")
        assert bad.count() == 0, bad.first()
        # And every envelope is real JSON whose log field round-trips.
        n_hand = frame.select(
            F.get_json_object(hand, "$.log").alias("g")
        ).filter("g IS NOT NULL").count()
        assert n_hand == frame.count()


def test_structured_json_dialect_semantics(spark):
    """The three structured-JSON dialects, detected content-based in
    the reference's priority order (rust-tracing > python-structlog >
    go slog): per-dialect message extraction (nested $.fields.message /
    "event" / msg|message, '' when absent) and the exact level
    vocabularies (CRITICAL→fatal only for structlog, PANIC→fatal only
    for go, listed case variants only — 'Debug' falls to info)."""
    from alt_spark.sources.ndjson_logs import parse_logs

    cases = [
        # rust tracing: nested message, uppercase level, WARNING ok.
        (
            '{"timestamp":"t1","level":"INFO","fields":{"message":"job done","alt.job.id":"42"},"target":"alt::w"}',
            "info",
            "job done",
        ),
        (
            '{"timestamp":"t1","level":"WARNING","fields":{"message":"slow"},"target":"x"}',
            "warn",
            "slow",
        ),
        (
            '{"timestamp":"t1","level":"CRITICAL","fields":{"message":"m"},"target":"x"}',
            "info",  # tracing vocab has NO critical -> default info
            "m",
        ),
        (
            '{"timestamp":"t1","level":"ERROR","fields":{"no_message":"x"}}',
            "error",
            "",  # absent fields.message -> '' like unwrap_or("")
        ),
        # python structlog: message = event, CRITICAL -> fatal.
        ('{"event":"started","level":"info","timestamp":"t"}', "info", "started"),
        ('{"event":"bad","level":"CRITICAL","timestamp":"t"}', "fatal", "bad"),
        ('{"event":"odd","level":"Debug","timestamp":"t"}', "info", "odd"),
        # go slog: msg|message, PANIC -> fatal, warning normalizes.
        ('{"level":"PANIC","msg":"dying"}', "fatal", "dying"),
        ('{"level":"warning","message":"careful"}', "warn", "careful"),
        ('{"level":"info"}', "info", ""),  # no msg/message -> ''
        # "msg" present forces go even with an "event" key (priority).
        ('{"event":"e","msg":"m","level":"error"}', "error", "m"),
    ]
    df = parse_logs(
        spark.createDataFrame(
            [(_envelope("/alt-backend", log),) for log, _, _ in cases],
            "value string",
        )
    )
    got = [(r["level"], r["message"]) for r in df.select("level", "message").collect()]
    assert got == [(lv, m) for _, lv, m in cases]
