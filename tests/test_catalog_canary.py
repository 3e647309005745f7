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
