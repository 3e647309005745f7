"""Retention/compaction for the persisted incremental-index family
(VERDICT r7 item 2).

The engine keeps six incremental indexes so a daily batch never rescans
the base corpus: the exact content-hash index
(``dedup.exact_dedup_incremental``), the MinHash band index
(``dedup.lsh_incremental_pairs``), the span-gram count index
(``dedup.duplicate_span_coverage_incremental``), the embedding
sign-band index (``ann.embedding_near_dup_incremental``), the CC
cluster index (``graph.connected_components_incremental``), and the
export-shard manifest (which got its own ``gc_exports`` in r7). The
merge functions fold batches in forever, and under Zipf the singleton
tail dominates: after a year of daily batches the span-gram index
dwarfs the corpus. This module is the missing retention story.

Model: every index entry carries a ``last_seen`` batch stamp (a
monotone integer the pipeline assigns per batch — a date ordinal
works). Merging refreshes the stamp on re-occurrence; compaction drops
every entry whose stamp is older than the retention cutoff. That is the
reference's partition-aligned TTL policy
(clickhouse/migrations/007_update_ttl_1day.sql:15-22 — TTL expressed so
expiry aligns with physical partitions and becomes a metadata-only
partition drop) applied to index tables.

Retention contract (the provable part, pinned in
tests/test_index_maintenance.py):

- **In-horizon exactness.** For any batch whose overlap with the index
  involves only entries last seen at or after the cutoff, scoring
  against the compacted index is BYTE-IDENTICAL to scoring against the
  full index: compaction only removes rows the batch does not touch,
  and retained rows keep their exact counts/stamps.
- **Out-of-horizon forgetting is the policy, not a bug.** Content
  whose only prior occurrences predate the horizon scores as fresh —
  the duplication horizon IS the retention window, exactly like the
  reference's TTL'd dedup state. The negative-control test asserts
  this loudly instead of leaving it implicit.
- **Bounded growth.** After compaction the index holds at most the
  distinct keys of the in-horizon batches — growth is bounded by the
  horizon's content, not the corpus's lifetime.

Scale shape (100 TB): the merge is the same one key-bucketed aggregate
as before (the stamp rides the existing shuffle — ``max`` folds
map-side like ``sum``); compaction is a single filter that, when the
physical table is written ``partitionBy(last_seen)`` (one partition
per batch), Spark executes as partition PRUNING on read and the
storage layer executes as whole-partition deletes — no data pages are
rewritten, the ClickHouse-TTL economics exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "stamp_index",
    "merge_stamped_counts",
    "merge_stamped_rows",
    "compact_index",
]

STAMP_COL = "last_seen"


def stamp_index(index: DataFrame, batch_id: int, stamp_col: str = STAMP_COL) -> DataFrame:
    """Initialize a stamped index from an unstamped one: every existing
    entry is marked as last seen in ``batch_id`` (the adoption step for
    an index that predates retention tracking)."""
    return index.withColumn(stamp_col, F.lit(int(batch_id)).cast("long"))


def merge_stamped_counts(
    base: DataFrame,
    batch_counts: DataFrame,
    batch_id: int,
    key_col: str = "k",
    count_col: str = "c",
    stamp_col: str = STAMP_COL,
) -> DataFrame:
    """Fold a batch's (key, count) rows into a stamped count index:
    counts sum, the stamp refreshes to the newest batch that saw the
    key. The stamped sibling of ``dedup.merge_span_gram_counts`` —
    same single key-bucketed aggregate (``max`` partials fold map-side
    exactly like ``sum``), so stamping costs nothing extra at scale.

    ``base`` must be (key, count, stamp); ``batch_counts`` is the raw
    (key, count) output of e.g. ``dedup.span_gram_counts``. Dropping
    ``stamp_col`` from the result recovers the exact unstamped merge —
    parity is test-enforced.
    """
    b = base.select(key_col, count_col, stamp_col)
    n = batch_counts.select(key_col, count_col).withColumn(
        stamp_col, F.lit(int(batch_id)).cast("long")
    )
    return (
        b.unionByName(n)
        .groupBy(key_col)
        .agg(
            F.sum(count_col).alias(count_col),
            F.max(stamp_col).alias(stamp_col),
        )
    )


def merge_stamped_rows(
    base: DataFrame,
    batch_rows: DataFrame,
    batch_id: int,
    id_col: str = "id",
    stamp_col: str = STAMP_COL,
) -> DataFrame:
    """Fold a batch's row-grained index rows (MinHash band rows,
    embedding sign-band rows, content-hash rows) into a stamped index.
    The entity is the DOCUMENT: every index row of an id present in the
    batch is replaced by the batch's rows under the new stamp — the
    same batch-wins rule the incremental scorers already apply to
    re-submitted ids (``lsh_incremental_pairs``' rerun-safety), so a
    retried batch converges to the same index instead of accreting
    stale rows.

    Shape: one broadcast-able distinct-id anti-join (the batch's id set
    is increment-sized) + a union — cost ∝ batch, never ∝ index.
    """
    ids = batch_rows.select(id_col).distinct()
    keep = base.join(F.broadcast(ids), id_col, "left_anti")
    fresh = batch_rows.withColumn(
        stamp_col, F.lit(int(batch_id)).cast("long")
    )
    return keep.unionByName(fresh)


def compact_index(
    index: DataFrame,
    min_last_seen: int,
    stamp_col: str = STAMP_COL,
) -> DataFrame:
    """Retention: keep only entries last seen at or after
    ``min_last_seen``. See the module docstring for the exactness
    contract (in-horizon scoring identical; out-of-horizon content
    deliberately forgotten) and the partition-aligned execution story
    (write the index ``partitionBy(last_seen)`` and this filter is
    partition pruning / whole-partition deletes — the reference's
    ClickHouse TTL trick, migrations/007_update_ttl_1day.sql)."""
    return index.filter(F.col(stamp_col) >= F.lit(int(min_last_seen)))
