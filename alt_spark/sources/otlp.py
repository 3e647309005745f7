"""OTLP JSON export → trace/log rows (SURVEY.md §2.A4).

Reference: rask-log-aggregator receives OTLP and converts resource/
scope/span nesting into flat ClickHouse rows (app/src/otlp/converter.rs,
receiver.rs; target DDL clickhouse/migrations/004_create_otel_logs.sql,
005_create_otel_traces.sql — ns timestamps, FixedString ids,
Map attributes).

Spark shape: `from_json` with the pinned OTLP envelope schema, then a
three-level lateral explode (resourceSpans → scopeSpans → spans) and
attribute lists folded into map<string,string> — the `LogAttributes`/
`ResourceAttributes` analog. ns timestamps become µs TimestampType
(documented truncation, SURVEY §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["SPAN_SCHEMA", "LOG_SCHEMA", "parse_otlp_traces", "parse_otlp_logs"]

_KV = T.ArrayType(
    T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField(
                "value",
                T.StructType([T.StructField("stringValue", T.StringType())]),
            ),
        ]
    )
)

_OTLP = T.StructType(
    [
        T.StructField(
            "resourceSpans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "resource",
                            T.StructType([T.StructField("attributes", _KV)]),
                        ),
                        T.StructField(
                            "scopeSpans",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField(
                                            "spans",
                                            T.ArrayType(
                                                T.StructType(
                                                    [
                                                        T.StructField("traceId", T.StringType()),
                                                        T.StructField("spanId", T.StringType()),
                                                        T.StructField("parentSpanId", T.StringType()),
                                                        T.StructField("name", T.StringType()),
                                                        T.StructField("kind", T.IntegerType()),
                                                        T.StructField("startTimeUnixNano", T.StringType()),
                                                        T.StructField("endTimeUnixNano", T.StringType()),
                                                        T.StructField("attributes", _KV),
                                                    ]
                                                )
                                            ),
                                        )
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)

SPAN_SCHEMA = T.StructType(
    [
        T.StructField("trace_id", T.StringType()),
        T.StructField("span_id", T.StringType()),
        T.StructField("parent_span_id", T.StringType()),
        T.StructField("service_name", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("kind", T.IntegerType()),
        T.StructField("start_ts", T.TimestampType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("attributes", T.MapType(T.StringType(), T.StringType())),
    ]
)


def _kv_to_map(col: F.Column) -> F.Column:
    """OTLP attribute list → map<string,string> (the Map(…) column analog)."""
    return F.map_from_entries(
        F.transform(col, lambda e: F.struct(e["key"], e["value"]["stringValue"]))
    )


def parse_otlp_traces(df: DataFrame, json_col: str = "value") -> DataFrame:
    """OTLP/JSON trace export lines → one row per span (converter.rs shape)."""
    parsed = df.select(F.from_json(F.col(json_col), _OTLP).alias("o"))
    rs = parsed.select(F.explode("o.resourceSpans").alias("rs"))
    spans = (
        rs.select(
            _kv_to_map(F.col("rs.resource.attributes")).alias("rattrs"),
            F.explode("rs.scopeSpans").alias("ss"),
        )
        .select("rattrs", F.explode("ss.spans").alias("sp"))
    )
    start_ns = F.col("sp.startTimeUnixNano").cast("long")
    end_ns = F.col("sp.endTimeUnixNano").cast("long")
    return spans.select(
        F.col("sp.traceId").alias("trace_id"),
        F.col("sp.spanId").alias("span_id"),
        F.col("sp.parentSpanId").alias("parent_span_id"),
        F.element_at(F.col("rattrs"), "service.name").alias("service_name"),
        F.col("sp.name").alias("name"),
        F.col("sp.kind").alias("kind"),
        F.timestamp_micros(F.expr("CAST(sp.startTimeUnixNano AS LONG) div 1000")).alias("start_ts"),
        ((end_ns - start_ns) / 1_000_000.0).alias("duration_ms"),
        _kv_to_map(F.col("sp.attributes")).alias("attributes"),
    )


_OTLP_LOGS = T.StructType(
    [
        T.StructField(
            "resourceLogs",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "resource",
                            T.StructType([T.StructField("attributes", _KV)]),
                        ),
                        T.StructField(
                            "scopeLogs",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField(
                                            "scope",
                                            T.StructType(
                                                [T.StructField("name", T.StringType())]
                                            ),
                                        ),
                                        T.StructField(
                                            "logRecords",
                                            T.ArrayType(
                                                T.StructType(
                                                    [
                                                        T.StructField("timeUnixNano", T.StringType()),
                                                        T.StructField("severityNumber", T.IntegerType()),
                                                        T.StructField("severityText", T.StringType()),
                                                        T.StructField(
                                                            "body",
                                                            T.StructType(
                                                                [T.StructField("stringValue", T.StringType())]
                                                            ),
                                                        ),
                                                        T.StructField("attributes", _KV),
                                                    ]
                                                )
                                            ),
                                        ),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)

LOG_SCHEMA = T.StructType(
    [
        T.StructField("service_name", T.StringType()),
        T.StructField("scope_name", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("severity_number", T.IntegerType()),
        T.StructField("severity_text", T.StringType()),
        T.StructField("body", T.StringType()),
        T.StructField("attributes", T.MapType(T.StringType(), T.StringType())),
    ]
)


def parse_otlp_logs(df: DataFrame, json_col: str = "value") -> DataFrame:
    """OTLP/JSON logs export lines → one row per logRecord (the
    converter.rs logs leg; target DDL 004_create_otel_logs.sql — ns
    timestamps truncated to µs TimestampType, severity number + text,
    Body string, attribute lists folded to the Map column analog).
    Same three-level lateral-explode shape as `parse_otlp_traces`:
    resourceLogs → scopeLogs → logRecords, all pipeline-local inside
    the scan."""
    parsed = df.select(F.from_json(F.col(json_col), _OTLP_LOGS).alias("o"))
    rl = parsed.select(F.explode("o.resourceLogs").alias("rl"))
    recs = (
        rl.select(
            _kv_to_map(F.col("rl.resource.attributes")).alias("rattrs"),
            F.explode("rl.scopeLogs").alias("sl"),
        )
        .select(
            "rattrs",
            F.col("sl.scope.name").alias("scope_name"),
            F.explode("sl.logRecords").alias("lr"),
        )
    )
    return recs.select(
        F.element_at(F.col("rattrs"), "service.name").alias("service_name"),
        "scope_name",
        F.timestamp_micros(
            F.expr("CAST(lr.timeUnixNano AS LONG) div 1000")
        ).alias("ts"),
        F.col("lr.severityNumber").alias("severity_number"),
        F.col("lr.severityText").alias("severity_text"),
        F.col("lr.body.stringValue").alias("body"),
        _kv_to_map(F.col("lr.attributes")).alias("attributes"),
    )
