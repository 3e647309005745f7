"""Shared fixtures: one SparkSession per test run, a DuckDB connection
with the testdata tables registered as views (mirroring the driver's
oracle setup), and the comparison helper used by test_oracle."""

from __future__ import annotations

import math

import duckdb
import pytest

from alt_spark.catalog import TABLES
from alt_spark.session import get_session

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_session("alt_spark-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'"
        )
    yield con
    con.close()


# The driver canonicalizes oracle output through pandas/Arrow, where
# DuckDB HUGEINT (the result type of sum(BIGINT)) arrives as float64 and
# renders "6325.0" while Spark's long renders "6325" — a hash mismatch
# with zero value difference (the q59/q61 r5 incident). fetchall() hides
# this (HUGEINT -> Python int), so type agreement is asserted separately
# from values, via DESCRIBE (binding-only, no execution).
#
# Map: Spark simpleString -> DuckDB type names that canonicalize the
# same way through pandas. HUGEINT is deliberately NOT allowed for
# integral Spark columns: pandas renders it float64.
_DDB_OK_FOR_SPARK = {
    "long": {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"},
    "int": {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
            "UTINYINT", "USMALLINT", "UINTEGER"},
    "short": {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"},
    "double": {"DOUBLE", "FLOAT"},
    "float": {"DOUBLE", "FLOAT"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
}


def oracle_schema(ddb, sql):
    """Column -> DuckDB type name for an oracle query, without running it."""
    rows = ddb.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: r[1] for r in rows}


def assert_dtype_agreement(sdf, ddb, sql, name=""):
    """Fail when an oracle column would canonicalize differently from the
    Spark column through the driver's pandas path (e.g. HUGEINT vs long)."""
    otypes = oracle_schema(ddb, sql)
    stypes = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    assert sorted(otypes) == sorted(stypes), (
        f"{name}: columns differ: {sorted(stypes)} vs {sorted(otypes)}"
    )
    bad = []
    for col, stype in stypes.items():
        otype = otypes[col].upper()
        base = otype.split("(")[0].strip()
        allowed = _DDB_OK_FOR_SPARK.get(stype)
        if allowed is None:
            # timestamp/decimal/array/struct: representation-compatible
            # families; the value comparison still covers them.
            continue
        if base not in allowed:
            bad.append(f"{col}: spark={stype} oracle={otype}")
    assert not bad, (
        f"{name}: oracle column types would canonicalize differently from "
        f"Spark through the driver's pandas path (CAST the oracle side): {bad}"
    )


def canon(rows, colnames):
    """Canonicalize a result set the way the driver does: columns sorted
    by name, rows sorted, floats normalized."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            # 12 significant digits: queries already round explicitly;
            # this only flattens representation noise (e.g. -0.0).
            return f"{v + 0.0:.12g}"
        return str(v)

    canon_rows = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return [tuple(sorted(colnames))] + canon_rows


def compare_query(spark, ddb, qfn, sql, sf=SF_ORACLE):
    sdf = qfn(spark, sf)
    assert_dtype_agreement(sdf, ddb, sql)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    rel = ddb.execute(sql)
    orows = rel.fetchall()
    ocols = [d[0] for d in rel.description]
    assert sorted(scols) == sorted(ocols), f"columns differ: {scols} vs {ocols}"
    assert len(srows) == len(orows), f"row count differs: {len(srows)} vs {len(orows)}"
    s_can, o_can = canon(srows, scols), canon(orows, ocols)
    mismatches = [
        (a, b) for a, b in zip(s_can[1:], o_can[1:], strict=True) if a != b
    ]
    assert not mismatches, f"{len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
