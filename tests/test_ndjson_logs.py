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


def _gen_lines(n: int = 2000, seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    methods = ["GET", "GET", "GET", "POST", "PUT", "DELETE"]
    paths = ["/api/feeds", "/api/articles", "/v1/search", "/healthz", "/v1/recap"]
    lines = []
    for i in range(n):
        t = f"2024-01-{1 + i % 28:02d}T{i % 24:02d}:{i % 60:02d}:{(i * 7) % 60:02d}.000Z"
        kind = rng.random()
        if kind < 0.45:  # nginx access
            log = (
                f"{rng.randrange(1, 255)}.0.0.{rng.randrange(1, 255)} - - "
                f"[01/Jan/2024:00:00:00 +0000] "
                f'"{rng.choice(methods)} {rng.choice(paths)} HTTP/1.1" '
                f"{rng.choice([200, 200, 200, 301, 404, 500])} {rng.randrange(100, 50_000)} "
                f'"-" "Mozilla/5.0"'
            )
            name = "/nginx"
        elif kind < 0.55:  # nginx error
            log = (
                f"2024/01/01 00:00:00 [{rng.choice(['error', 'warn', 'crit'])}] "
                f"77#0: *{i} upstream timed out"
            )
            name = "/nginx"
        elif kind < 0.80:  # plecto-proxy structured JSON
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
        elif kind < 0.93:  # app service structured JSON (no http keys)
            log = json.dumps(
                {"level": rng.choice(["info", "warn", "error"]), "msg": "tick", "n": str(i)}
            )
            name = "/alt-backend"
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
