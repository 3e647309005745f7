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
