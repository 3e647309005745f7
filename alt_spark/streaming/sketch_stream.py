"""Streaming heavy-hitters (VERDICT r8 item 4): the Misra-Gries sketch
driven per micro-batch — the reference's trending-tags consumer shape
(alt-backend/app/shared/driver/alt_db/trending_tags_driver.go:16-23 is
the batch query; the tag stream that feeds it is inherently windowed).

MG summaries are MERGEABLE (Agarwal et al. 2012): summing counters
across summaries and evicting back to k preserves the N/(k+1)
undercount bound over the union of everything the inputs saw. So the
streaming form is exactly the batch operator folded over micro-batches:

  per micro-batch   mg_summaries(batch, with_total=True)
                    (partition-bounded candidates + row-count sentinel)
  state merge       merge_mg_summaries(prev_state ∪ batch_summaries, k)
                    — k-bounded survivors + ONE sentinel carrying the
                    cumulative N
  state write       versioned parquet v{batch_id}, idempotent under
                    crash-replay (the projector's K1 contract: a
                    replayed batch folds against v{batch_id-1}, never
                    against its own output)

The state is metadata-sized (k+1 rows), so every merge is a bounded
computation regardless of stream volume; the per-batch corpus work is
one narrow mapInPandas scan — the same 100 TB shape as batch pass 1.

Consuming the state: candidates = the non-null keys of any committed
version; EXACT top-N over the stream-so-far = exact-verify those
candidates against the accumulated data (the batch operator's pass 2),
with the SAME strict guarantee guard fed by the sentinel's cumulative
N. Stream==batch parity at every checkpoint is pytest-pinned
(tests/test_streaming.py::test_streaming_heavy_hitters_parity).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from alt_spark.operators.sketch import (
    exact_verified_top_n,
    merge_mg_summaries,
    mg_summaries,
)
from alt_spark.plans import dfcache
from alt_spark.streaming.projector import _latest_version

__all__ = [
    "run_streaming_sketch",
    "read_sketch_state",
    "windowed_sketch_state",
    "verified_top_n",
]


def run_streaming_sketch(
    spark: SparkSession,
    source: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    key_col: str,
    k: int = 4096,
    keep_per_batch: bool = False,
    available_now: bool = False,
) -> StreamingQuery:
    """Fold a streaming source into versioned MG sketch state:
    ``state_dir/v{batch_id}`` holds the merged k-bounded summary (plus
    the cumulative-N sentinel) after that micro-batch.

    With ``keep_per_batch=True`` each micro-batch ALSO persists its own
    merged per-batch summary under ``state_dir/pb{batch_id}`` — the
    building block for SLIDING-window trending (the reference's
    trending-tags consumer is inherently windowed): mergeability lets
    :func:`windowed_sketch_state` reconstruct the exact sketch of ANY batch
    range by merging the range's per-batch summaries (each k+1 rows),
    and retention is a partition-aligned drop of out-of-window batch
    directories — the index_maintenance TTL economics applied to
    sketch state."""

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        summ = mg_summaries(batch, key_col, k, with_total=True)
        if dfcache.MATERIALIZE:
            # Two consumers when keep_per_batch (per-batch file + the
            # rolling merge) — compute the batch scan once.
            summ = summ.localCheckpoint(eager=False)
        if keep_per_batch:
            merge_mg_summaries(summ, k).write.mode("overwrite").parquet(
                os.path.join(state_dir, f"pb{batch_id}")
            )
        prev_version, prev_path = _latest_version(state_dir)
        if prev_path is not None and prev_version >= batch_id:
            # Crash-replay of a committed batch: merge against the
            # state BEFORE this batch so the rewrite is idempotent.
            prev_path = (
                os.path.join(state_dir, f"v{batch_id - 1}")
                if batch_id > 0
                else None
            )
        if prev_path is not None and os.path.isdir(prev_path):
            summ = summ.unionByName(spark.read.parquet(prev_path))
        merged = merge_mg_summaries(summ, k)
        merged.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v{batch_id}")
        )

    writer = source.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        # Bounded replay mode: the query TERMINATES after draining, so
        # a caller can put a real timeout on awaitTermination (a bare
        # processAllAvailable blocks unboundedly if a batch wedges —
        # review finding, r9).
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_sketch_state(
    spark: SparkSession, state_dir: str, batch_ids: list[int], k: int
) -> DataFrame:
    """The merged sketch of an arbitrary batch RANGE, reconstructed
    from per-batch summaries (requires ``keep_per_batch=True`` at
    write time): mergeability makes this exactly the sketch a single
    pass over those batches' rows would have produced, bound-wise —
    the sliding-window trending primitive. Cost: |batch_ids| x (k+1)
    rows merged, independent of stream volume."""
    if not batch_ids:
        raise ValueError("batch_ids must be non-empty")
    parts = []
    for b in batch_ids:
        path = os.path.join(state_dir, f"pb{b}")
        if not os.path.isdir(path):
            raise FileNotFoundError(f"no per-batch summary at {path}")
        parts.append(spark.read.parquet(path))
    summ = parts[0]
    for p in parts[1:]:
        summ = summ.unionByName(p)
    return merge_mg_summaries(summ, k)


def read_sketch_state(
    spark: SparkSession, state_dir: str, version: int | None = None
) -> DataFrame:
    """A committed sketch state (latest when ``version`` is None)."""
    if version is None:
        _, path = _latest_version(state_dir)
    else:
        path = os.path.join(state_dir, f"v{version}")
    if path is None or not os.path.isdir(path):
        raise FileNotFoundError(f"no sketch state at {state_dir} v={version}")
    return spark.read.parquet(path)


def verified_top_n(
    state: DataFrame, data: DataFrame, key_col: str, top_n: int, k: int
) -> DataFrame:
    """EXACT top-``top_n`` over ``data`` using the sketch state's
    candidates — literally the batch operator's pass 2
    (operators/sketch.exact_verified_top_n, ONE implementation so a
    guard or join fix can never silently diverge the two consumers —
    review finding, r9) against streamed-up candidates, with the
    strict exclusion guard fed by the state's cumulative-N sentinel.
    ``data`` must be the accumulated rows the state has seen (the
    stream-so-far, or the window's rows for a windowed state); ``k``
    must be the k the state was built with."""
    return exact_verified_top_n(
        data, key_col, state, top_n, k, guard_name="streaming heavy_hitters"
    )
