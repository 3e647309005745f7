"""Partition-aligned TTL retention (K6).

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

__all__ = ["drop_expired_partitions"]


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
