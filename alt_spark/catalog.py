"""Explicit schemas + loaders for the engine's tables.

The reference's schema system is fully fixed/migrated (Atlas migrations,
Go structs — SURVEY.md §1.2): no `inferSchema` in production paths. We
mirror that: every table has a pinned StructType, and loads go through
`load_table` so reads always carry the declared schema (column pruning
still applies — Spark prunes to the columns the plan selects).

Test tables are the driver's TPC-H-ish parquet set (TESTDATA.md); the
log-domain schemas (logs/http_logs/sli_metrics) mirror the reference's
ClickHouse tables (clickhouse/migrations/001,003,009) for the streaming
layer.
"""

from __future__ import annotations

import functools
import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = [
    "SCHEMAS",
    "LOG_SCHEMAS",
    "TABLES",
    "load_table",
    "load_all",
    "sf_dir",
    "register_views",
    "sql",
]

_S = T.StructType
_F = T.StructField


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return _F(name, dtype, nullable)


SCHEMAS: dict[str, T.StructType] = {
    "region": _S([_f("r_regionkey", T.IntegerType()), _f("r_name", T.StringType())]),
    "nation": _S([
        _f("n_nationkey", T.IntegerType()),
        _f("n_name", T.StringType()),
        _f("n_regionkey", T.IntegerType()),
    ]),
    "customer": _S([
        _f("c_custkey", T.LongType()),
        _f("c_name", T.StringType()),
        _f("c_nationkey", T.IntegerType()),
        _f("c_acctbal", T.DoubleType()),
        _f("c_mktsegment", T.StringType()),
    ]),
    "supplier": _S([
        _f("s_suppkey", T.LongType()),
        _f("s_name", T.StringType()),
        _f("s_nationkey", T.IntegerType()),
        _f("s_acctbal", T.DoubleType()),
    ]),
    "part": _S([
        _f("p_partkey", T.LongType()),
        _f("p_name", T.StringType()),
        _f("p_brand", T.StringType()),
        _f("p_type", T.StringType()),
        _f("p_size", T.IntegerType()),
        _f("p_retailprice", T.DoubleType()),
    ]),
    "orders": _S([
        _f("o_orderkey", T.LongType()),
        _f("o_custkey", T.LongType()),
        _f("o_orderstatus", T.StringType()),
        _f("o_totalprice", T.DoubleType()),
        _f("o_orderdate", T.TimestampType()),
        _f("o_orderpriority", T.StringType()),
    ]),
    "lineitem": _S([
        _f("l_orderkey", T.LongType()),
        _f("l_partkey", T.LongType()),
        _f("l_suppkey", T.LongType()),
        _f("l_linenumber", T.IntegerType()),
        _f("l_quantity", T.DoubleType()),
        _f("l_extendedprice", T.DoubleType()),
        _f("l_discount", T.DoubleType()),
        _f("l_tax", T.DoubleType()),
        _f("l_returnflag", T.StringType()),
        _f("l_linestatus", T.StringType()),
        _f("l_shipdate", T.TimestampType()),
    ]),
    "events": _S([
        _f("event_id", T.LongType()),
        # Logical type is always µs TimestampType. The PHYSICAL layout of
        # events.parquet is probed from the footer at load time (see
        # events_ts_unit): timestamp[us/ms/s] reads natively; a
        # TIMESTAMP(NANOS) file reads as long + ns→µs truncation.
        _f("ts", T.TimestampType()),
        _f("user_id", T.LongType()),
        _f("event_type", T.StringType()),
        _f("value", T.DoubleType()),
        _f("props", T.StringType()),
    ]),
    "documents": _S([
        _f("doc_id", T.LongType()),
        _f("text", T.StringType()),
        _f("lang", T.StringType()),
        _f("source", T.StringType()),
        _f("n_chars", T.LongType()),
    ]),
    "embeddings": _S([
        _f("vec_id", T.LongType()),
        _f("embedding", T.ArrayType(T.FloatType())),
        _f("label", T.IntegerType()),
    ]),
}

# Log-domain schemas, mirroring the reference's ClickHouse DDL
# (clickhouse/migrations/001_create_logs_table.sql:1-16 for `logs`,
# 003_create_http_logs_mv.sql for `http_logs`, 009_create_sli_metrics.sql
# for `sli_metrics`). Used by alt_spark.sources and alt_spark.streaming.
LOG_SCHEMAS: dict[str, T.StructType] = {
    "logs": _S([
        _f("service_name", T.StringType()),
        _f("service_group", T.StringType()),
        _f("level", T.StringType()),
        _f("message", T.StringType()),
        _f("timestamp", T.TimestampType()),
        _f("container_id", T.StringType()),
        _f("fields", T.MapType(T.StringType(), T.StringType())),
    ]),
    "http_logs": _S([
        _f("timestamp", T.TimestampType()),
        _f("service_name", T.StringType()),
        _f("method", T.StringType()),
        _f("path", T.StringType()),
        _f("status_code", T.IntegerType()),
        _f("response_size", T.LongType()),
        _f("response_time_ms", T.DoubleType()),
    ]),
    "sli_metrics": _S([
        _f("bucket", T.TimestampType()),
        _f("service_name", T.StringType()),
        _f("metric_name", T.StringType()),
        _f("value", T.DoubleType()),
        _f("labels", T.MapType(T.StringType(), T.StringType())),
    ]),
}

TABLES = tuple(SCHEMAS)


def sf_dir(default: str = "/root/testdata/sf0.01") -> str:
    """Scale-factor directory; the bench driver overrides via env."""
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def events_ts_unit(path: str) -> str:
    """Probe the parquet footer for the physical time unit of ``ts``.

    The engine does not own events.parquet (the driver regenerates it
    between rounds and has already switched layouts once: TIMESTAMP(NANOS)
    int64 → timestamp[us]), so the loader must never hard-code the
    physical layout — read the footer and branch. Returns pyarrow's unit
    string ('s'|'ms'|'us'|'ns'); a raw int64 column is treated as the
    generator's TIMESTAMP(NANOS) layout.

    The memo is keyed on (probe file, mtime_ns, size): a path-only cache
    would serve a stale verdict after the driver regenerates the file
    in-process — a stale 'ns' on a new µs file re-applies the ÷1000 and
    silently shifts every event to 1970, the exact failure the canary
    exists to catch (ADVICE r4). The footer read itself is cheap; the
    memo only spares repeated stat+open in tight per-query loops.
    """
    probe = path
    if os.path.isdir(path):
        parts = sorted(p for p in os.listdir(path) if p.endswith(".parquet"))
        if parts:
            probe = os.path.join(path, parts[0])
    st = os.stat(probe)
    return _events_ts_unit_memo(probe, st.st_mtime_ns, st.st_size)


@functools.lru_cache(maxsize=64)
def _events_ts_unit_memo(probe: str, mtime_ns: int, size: int) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    meta = pq.read_metadata(probe)
    pq_schema = meta.schema
    for i in range(len(pq_schema)):
        col = pq_schema.column(i)
        if col.name == "ts" and col.physical_type == "INT96":
            # Spark's default parquet timestamp layout (e.g. a landing
            # dir written by a plain-session `df.write.parquet`). Arrow
            # reports INT96 as timestamp[ns], but Spark reads it
            # natively as TimestampType — it must NOT take the
            # INT64-nanos branch (LongType read would fail outright).
            return "us"
    t = pq_schema.to_arrow_schema().field("ts").type
    if pa.types.is_timestamp(t):
        return t.unit
    return "ns"


def events_read_schema(unit: str) -> T.StructType:
    """Physical read schema for events given the footer's ts unit.

    Spark maps parquet timestamp[us/ms/s] straight to TimestampType; a
    ns column needs nanosAsLong (read as int64) + explicit truncation.
    """
    ts_type: T.DataType = T.LongType() if unit == "ns" else T.TimestampType()
    return _S([
        _f("event_id", T.LongType()),
        _f("ts", ts_type),
        _f("user_id", T.LongType()),
        _f("event_type", T.StringType()),
        _f("value", T.DoubleType()),
        _f("props", T.StringType()),
    ])


def load_table(spark: SparkSession, sf: str, name: str) -> DataFrame:
    """Read one test table with its pinned schema (no inference)."""
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {sorted(SCHEMAS)}")
    # The driver may hand us a session built without the engine profile;
    # pin the runtime-settable confs the declared semantics depend on at
    # the load boundary: UTC (date_trunc/bucket parity with the oracle)
    # and ANSI off (the engine's declared permissive-cast/wrapping-
    # arithmetic semantics — B5 OrZero casts and the hash rings in
    # operators.dedup rely on silent wrap; Spark 4 defaults ANSI on).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    path = f"{sf}/{name}.parquet"
    if name == "events":
        unit = events_ts_unit(path)
        if unit == "ns":
            try:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            except Exception:
                pass  # static-conf on some builds; the engine profile sets it
            from pyspark.sql import functions as F

            # ns → µs truncation. `div` truncates toward zero, which
            # equals floor only for ts >= 0 — post-epoch event time is an
            # engine invariant; pre-epoch rows would diverge from
            # DuckDB's floor by 1µs.
            return (
                spark.read.schema(events_read_schema("ns"))
                .parquet(path)
                .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            )
        return spark.read.schema(events_read_schema(unit)).parquet(path)
    return spark.read.schema(SCHEMAS[name]).parquet(path)


def load_all(spark: SparkSession, sf: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf, name) for name in SCHEMAS}


def register_views(spark: SparkSession, sf: str, suffix: str = "") -> None:
    """Register every engine table as a temp view so users can issue
    plain ``spark.sql`` — the reference's primary query surface is SQL
    (ClickHouse over HTTP; alt-backend builds SQL strings), so API
    parity includes "point your SQL at it", not only the DataFrame
    callables. Views go through :func:`load_table`, so the pinned
    schemas, the events timestamp-layout probe, and column pruning all
    apply identically to SQL and DataFrame consumers.

    ``suffix`` namespaces the views (``orders_a`` / ``orders_b``) for
    cross-SF comparisons in one session.
    """
    for name in SCHEMAS:
        load_table(spark, sf, name).createOrReplaceTempView(name + suffix)
    _REGISTERED.setdefault(spark, {})[suffix] = sf


# session -> {suffix: registered sf}. A WeakKeyDictionary keyed on the
# PYTHON SparkSession: identity of a live key object cannot collide, and
# a stopped session's entry vanishes when its wrapper is collected — the
# id(jvm-proxy) scheme this replaces could see a new session reuse a
# garbage-collected proxy's CPython address and falsely skip
# registration (TABLE_OR_VIEW_NOT_FOUND instead of a re-register).
_REGISTERED: "weakref.WeakKeyDictionary[SparkSession, dict[str, str]]" = (
    weakref.WeakKeyDictionary()
)


def sql(spark: SparkSession, sf: str, query: str) -> DataFrame:
    """One-call SQL entry point: register the sf's views (memoized per
    session — re-registering every call would re-probe the events
    parquet footer and churn the temp catalog once per statement), run
    the statement. Catalyst sees the same logical plans the DataFrame
    API builds — SURVEY §4's optimizer guarantees (pushdown, pruning,
    AQE) hold for both surfaces; tests pin plan equality on
    representative §2 shapes. Switching ``sf`` re-registers. A cheap
    catalog probe backs the memo: if ANY of the views were dropped out
    from under it (clearCache, or a caller's dropTempView of a single
    view — a partial drop must re-register too, not just a full one),
    re-register instead of failing the statement. One listTables call
    covers all names — not a per-view tableExists loop."""
    if _REGISTERED.get(spark, {}).get("") != sf or not set(SCHEMAS).issubset(
        {t.name for t in spark.catalog.listTables()}
    ):
        register_views(spark, sf)
    return spark.sql(query)
