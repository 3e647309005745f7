"""t2 oracle parity: every declared query with an oracle runs on Spark and
DuckDB at sf0.01; canonicalized outputs must match exactly (SURVEY.md §5).
Queries without an oracle get a smoke check (runs, stable schema, rows>=0)
at sf0.001 — their semantics are covered by property tests instead."""

from __future__ import annotations

import pytest

from alt_spark.queries import all_oracles, all_queries
from tests.conftest import SF_SMOKE, compare_query


def _oracle_params():
    qs, os_ = all_queries(), all_oracles()
    return [pytest.param(qs[n], os_[n], id=n) for n in sorted(os_)]


def _smoke_params():
    qs, os_ = all_queries(), all_oracles()
    return [pytest.param(qs[n], id=n) for n in sorted(qs)]


@pytest.mark.parametrize("qfn,sql", _oracle_params())
def test_oracle_parity(spark, ddb, qfn, sql):
    compare_query(spark, ddb, qfn, sql)


@pytest.mark.parametrize("qfn", _smoke_params())
def test_smoke_sf0001(spark, qfn):
    df = qfn(spark, SF_SMOKE)
    assert df.columns, "query must project named columns"
    # Matches the driver's entry check: a declared query that returns
    # zero rows even at smoke scale is a silent no-op, not a pass.
    assert df.count() > 0
