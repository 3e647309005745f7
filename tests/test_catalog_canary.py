"""Schema-drift canary (VERDICT r3 item 1).

The driver regenerates /root/testdata between rounds and has already
changed events.parquet's physical ts layout once (TIMESTAMP(NANOS)
int64 → timestamp[us]), which silently shifted every event to 1970 for
a full round. The loader now probes the parquet footer
(catalog.events_ts_unit) instead of assuming a layout; this canary
makes the NEXT drift fail loudly: the engine's loaded ts range must
equal DuckDB's independent read of the same file, for every scale
factor present.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from alt_spark.catalog import events_ts_unit, load_table

SFS = [d for d in ("sf0.001", "sf0.01", "sf0.1") if os.path.isdir(f"/root/testdata/{d}")]


@pytest.mark.parametrize("sf", SFS)
def test_events_ts_range_matches_independent_reader(spark, sf):
    path = f"/root/testdata/{sf}"
    ev = load_table(spark, path, "events")
    got = ev.selectExpr(
        "min(ts) AS lo", "max(ts) AS hi", "count(*) AS n"
    ).first()
    want = duckdb.sql(
        f"SELECT min(ts) AS lo, max(ts) AS hi, count(*) AS n "
        f"FROM '{path}/events.parquet'"
    ).fetchone()
    assert (got.lo, got.hi, got.n) == want, (
        f"events ts drifted at {sf}: engine reads [{got.lo}, {got.hi}] but the "
        f"file contains [{want[0]}, {want[1]}] — physical layout is "
        f"{events_ts_unit(path + '/events.parquet')!r}; check catalog.load_table"
    )


def test_events_logical_type_is_timestamp(spark):
    ev = load_table(spark, f"/root/testdata/{SFS[0]}", "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"


def test_ns_layout_branch_reads_identically(spark, tmp_path):
    """The TIMESTAMP(NANOS) loader branch must stay alive even while the
    current testdata is timestamp[us]: rewrite the events table in the
    ns physical layout and assert the catalog probe picks the ns path
    and yields exactly the rows the us file yields (µs truncation is
    lossless here — the source values are µs-precision)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = f"/root/testdata/{SFS[0]}"
    t = pq.read_table(f"{src}/events.parquet")
    ts_ns = t.set_column(
        t.schema.get_field_index("ts"),
        "ts",
        t["ts"].cast(pa.timestamp("ns")),
    )
    ns_dir = tmp_path / "events_ns"
    ns_dir.mkdir()
    # version >= 2.6 is what permits physical TIMESTAMP(NANOS).
    pq.write_table(ts_ns, str(ns_dir / "events.parquet"), version="2.6")
    assert events_ts_unit(str(ns_dir / "events.parquet")) == "ns"

    us_rows = {tuple(r) for r in load_table(spark, src, "events").collect()}
    ns_rows = {tuple(r) for r in load_table(spark, str(ns_dir), "events").collect()}
    assert ns_rows == us_rows

    # The STREAMING reader takes the same branch and must pin the same
    # legacy conf itself (ADVICE r4: a session that only ever streams
    # never runs load_table, and Spark rejects INT64 TIMESTAMP(NANOS)
    # without the conf). Replay the ns-layout dir through
    # read_events_stream and require the identical row set.
    from alt_spark.streaming.mv import read_events_stream

    stream = read_events_stream(spark, str(ns_dir), max_files_per_trigger=1)
    q = (
        stream.writeStream.format("memory")
        .queryName("ns_canary_replay")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "ns-layout replay did not drain in 120s"
    streamed = {
        tuple(r) for r in spark.table("ns_canary_replay").collect()
    }
    assert streamed == us_rows


@pytest.mark.parametrize("sf", SFS)
def test_all_table_row_counts_match_independent_reader(spark, sf):
    """Row-count canary at EVERY scale factor for every table the
    oracles read (VERDICT r4 item 8): the value-identity canary below
    runs at smoke scale only; this cheap count(*) cross-check fails
    loudly if a regeneration changes cardinality anywhere else."""
    from alt_spark.catalog import TABLES

    path = f"/root/testdata/{sf}"
    con = duckdb.connect()
    for name in TABLES:
        got = load_table(spark, path, name).count()
        want = con.sql(
            f"SELECT count(*) FROM '{path}/{name}.parquet'"
        ).fetchone()[0]
        assert got == want, f"{name}@{sf}: engine {got} rows != file {want}"
    con.close()


def test_every_table_loads_value_identical_to_independent_reader(spark):
    """Full-table drift canary at smoke scale: every pinned-schema load
    must be row-for-row identical to DuckDB's independent read of the
    same parquet (values stringified, row order ignored). Catches any
    future generator-side physical-type change — not just the events ts
    one that already happened — before it can silently skew results."""
    from alt_spark.catalog import TABLES

    path = f"/root/testdata/{SFS[0]}"
    con = duckdb.connect()
    for name in TABLES:
        df = load_table(spark, path, name)
        got = sorted(
            tuple(str(v) for v in row) for row in df.collect()
        )
        rel = con.sql(f"SELECT * FROM '{path}/{name}.parquet'")
        # Align DuckDB column order to the engine's pinned schema order.
        rel = rel.select(*df.columns)
        want = sorted(tuple(str(v) for v in row) for row in rel.fetchall())
        assert len(got) == len(want), f"{name}: row count drift"
        if got != want:
            diffs = [i for i, (a, b) in enumerate(zip(got, want)) if a != b][:3]
            raise AssertionError(
                f"{name}: value drift, e.g. rows {diffs}: "
                + "; ".join(f"{got[i]} != {want[i]}" for i in diffs)
            )
    con.close()


# ------------------------------------------------------------------ SQL facade
def test_sql_facade_matches_dataframe_results_and_plans(spark):
    """catalog.sql is the reference-parity surface (ClickHouse users
    issue SQL): a representative §2 join+agg shape must return the
    SAME rows AND compile to the same physical plan as its DataFrame
    twin — proof the facade adds no plan divergence, so every
    optimizer pin in test_plans transfers to SQL consumers."""
    from pyspark.sql import functions as F

    from alt_spark import catalog
    from alt_spark.plans import audit

    sf = "/root/testdata/sf0.001"
    got = catalog.sql(
        spark,
        sf,
        """
        SELECT c.c_mktsegment AS seg, count(*) AS n_orders,
               CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1 ORDER BY 1
        """,
    )
    orders = catalog.load_table(spark, sf, "orders")
    cust = catalog.load_table(spark, sf, "customer")
    twin = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        .orderBy("seg")
    )
    assert got.collect() == twin.collect()
    # Same optimized shape: scans broadcast-join, no extra exchanges.
    assert audit.broadcast_join_count(got) == audit.broadcast_join_count(twin)
    assert audit.shuffle_count(got) == audit.shuffle_count(twin)


def test_sql_facade_events_view_carries_ts_probe(spark):
    """SQL consumers must inherit the events timestamp-layout probe:
    a 1970 timestamp through the view means the footer branch was
    bypassed (the r3 regression, SQL-surface edition)."""
    from alt_spark import catalog

    row = catalog.sql(
        spark,
        "/root/testdata/sf0.001",
        "SELECT min(ts) AS lo, max(ts) AS hi FROM events",
    ).collect()[0]
    assert row["lo"].year > 1990, row


def test_sql_facade_survives_partial_view_drop(spark):
    """ADVICE r10: the staleness probe behind catalog.sql's memo used a
    single-canary tableExists('region') — dropping any OTHER registered
    view while region survived left the memo claiming registered and the
    statement failing with TABLE_OR_VIEW_NOT_FOUND. The probe now checks
    the full SCHEMAS name set (one listTables call), so a partial drop
    re-registers just like a full one."""
    from alt_spark import catalog

    sf = "/root/testdata/sf0.001"
    catalog.sql(spark, sf, "SELECT count(*) AS n FROM documents").collect()
    spark.catalog.dropTempView("documents")  # region still exists
    n = catalog.sql(spark, sf, "SELECT count(*) AS n FROM documents").collect()[0]["n"]
    assert n > 0


def test_sql_facade_suffix_namespaces_cross_sf(spark):
    from alt_spark import catalog

    catalog.register_views(spark, "/root/testdata/sf0.001", suffix="_a")
    catalog.register_views(spark, "/root/testdata/sf0.01", suffix="_b")
    n = spark.sql(
        "SELECT (SELECT count(*) FROM orders_a) AS a,"
        " (SELECT count(*) FROM orders_b) AS b"
    ).collect()[0]
    assert 0 < n["a"] < n["b"]


# The §2.Q queries whose DuckDB oracle text is ALSO valid Spark SQL and
# returns value-identical rows through the facade (probed r10; the rest
# use DuckDB-dialect devices — HUGEINT casts, `//` floor division,
# list_* functions, recursive CTEs — and are covered by the DataFrame
# path + DuckDB parity instead). The sweep keeps the SQL surface honest
# on every relational family: aggregates (q01/q02), percentiles (q04),
# self/theta joins (q05/q06), left+agg (q07), anti-join (q08), RRF
# (q10), lateral top-1 (q11), keyset pagination (q13), multi-way join
# (q15), dedup (q17), fold (q20), digests (q21), prefix search (q35),
# top-k windows (q36), label prop (q45), MV replay shape (q49),
# normalization (q51), RSS parse (q52), ROLLUP (q56), INTERSECT/EXCEPT
# (q58).
_SQL_PORTABLE = (
    "q01_endpoint_stats",
    "q02_sli_error_rate",
    "q04_latency_quantiles",
    "q05_event_type_pairs",
    "q06_part_cooccurrence",
    "q07_orders_item_counts",
    "q08_customers_without_orders",
    "q10_rrf_suppliers",
    "q11_latest_order_per_customer",
    "q13_keyset_pagination",
    "q15_brand_order_counts",
    "q17_exact_dedup",
    "q20_event_fold",
    "q21_digest_counters",
    "q35_prefix_search_sample",
    "q36_per_group_topk",
    "q45_label_propagation",
    "q49_streaming_mv_replay",
    "q51_nfkc_normalize",
    "q52_rss_atom_parse",
    "q56_grouping_sets_rollup",
    "q58_intersect_except",
)


@pytest.mark.parametrize("name", _SQL_PORTABLE)
def test_sql_facade_parity_sweep(spark, name):
    """VERDICT r9 item 6: the reference's users issue SQL, so the SQL
    entry point must not rot behind the DataFrame callables. For every
    query whose oracle text is engine-portable, `catalog.sql(oracle)`
    must return the same multiset of rows as the DataFrame form — two
    independent plan constructions of the same §2 semantics inside one
    engine (the DuckDB oracle separately validates both cross-engine)."""
    from alt_spark import catalog
    from alt_spark.queries import all_oracles, all_queries

    sf = "/root/testdata/sf0.001"
    qs, oracles = all_queries(), all_oracles()
    got = [tuple(r) for r in catalog.sql(spark, sf, oracles[name]).collect()]
    want = [tuple(r) for r in qs[name](spark, sf).collect()]
    assert len(got) == len(want)
    assert sorted(map(repr, got)) == sorted(map(repr, want))
