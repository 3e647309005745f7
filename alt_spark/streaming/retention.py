"""Partition-aligned retention: time TTL (K6) and size trimming (K7).

The reference expires log rows with partition-aligned TTL —
`TTL timestamp + INTERVAL 1 DAY DELETE` with `ttl_only_drop_parts=1`
(clickhouse/migrations/001_create_logs_table.sql:15-16,
007_update_ttl_1day.sql:15-22): expiry drops whole parts, never
row-rewrites. The documented pitfall (docs/services/
rask-logging-architecture.md:320) is a non-time partition key silently
disabling cheap TTL — the same rule holds here: retention is only O(1)
because the table is physically partitioned by the date column being
aged out.

Spark analog: a date-partitioned parquet/Delta table ages out by
deleting partition directories — a filesystem metadata op, no data scan
or rewrite. At 100 TB this is the only viable retention shape.
"""

from __future__ import annotations

import os
import re
import shutil
from datetime import date, timedelta

__all__ = ["drop_expired_partitions", "trim_to_max_rows"]


def drop_expired_partitions(
    table_dir: str,
    keep_days: int,
    as_of: date,
    partition_col: str = "p_date",
) -> list[str]:
    """Drop `{partition_col}=YYYY-MM-DD` subdirs older than the horizon.

    Returns the dropped partition values. Partition layout is the
    standard Hive `col=value` directory scheme produced by
    `df.write.partitionBy(partition_col)`.
    """
    horizon = as_of - timedelta(days=keep_days)
    pat = re.compile(re.escape(partition_col) + r"=(\d{4}-\d{2}-\d{2})$")
    dropped: list[str] = []
    if not os.path.isdir(table_dir):
        return dropped
    for name in sorted(os.listdir(table_dir)):
        m = pat.match(name)
        if not m:
            continue
        if date.fromisoformat(m.group(1)) < horizon:
            shutil.rmtree(os.path.join(table_dir, name))
            dropped.append(m.group(1))
    return dropped


def trim_to_max_rows(
    table_dir: str,
    max_rows: int,
    partition_col: str = "p_date",
) -> list[str]:
    """Count-based stream trimming (K7 — the `XTRIM MAXLEN ~` analog,
    mq-hub redis_driver.go's capped stream).

    Redis's approximate MAXLEN trims whole radix-tree macro-nodes rather
    than exact entries; the partition-aligned analog trims whole date
    partitions, oldest first, until the retained row count is <= max_rows
    — never splitting a partition (so the result may retain fewer rows
    than max_rows, exactly like `~`'s node-granularity overshoot, but
    trimming stays a filesystem metadata op with no rewrite). The newest
    partition is always kept even if it alone exceeds the budget (Redis
    likewise never trims the node being appended to).

    Row counts come from the parquet footers (metadata read, no scan).
    Returns the dropped partition values, oldest first.
    """
    import pyarrow.parquet as pq

    pat = re.compile(re.escape(partition_col) + r"=(\d{4}-\d{2}-\d{2})$")
    if not os.path.isdir(table_dir):
        return []

    def _rows(part_dir: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(part_dir):
            for f in files:
                if f.endswith(".parquet"):
                    total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
        return total

    parts = sorted(
        (m.group(1), os.path.join(table_dir, name))
        for name in os.listdir(table_dir)
        if (m := pat.match(name))
    )
    counts = {v: _rows(p) for v, p in parts}
    total = sum(counts.values())
    dropped: list[str] = []
    for value, path in parts[:-1]:  # newest partition is never trimmed
        if total <= max_rows:
            break
        shutil.rmtree(path)
        total -= counts[value]
        dropped.append(value)
    return dropped
