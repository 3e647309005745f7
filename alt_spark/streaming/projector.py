"""Checkpointed event-fold projector (K1/K2/K3/K5/D12).

The reference's CQRS backbone: knowledge-sovereign's projector reads the
append-only event log strictly after its checkpoint, folds each event
into read-model rows with merge-safe ops, and advances the checkpoint
only after the fold is durable (knowledge_home_projector/projector.go:
138-192 replay loop, :199-230 dispatch, :446-509 fold ops; merge-op
vocabulary sql_fragments.go:13-20 — `max`, `set`, additive).

Spark mapping:

- ordered replay + checkpoint  → Structured Streaming file source +
  checkpointLocation; a micro-batch is re-delivered after a crash and
  the versioned state write makes reprocessing idempotent (K1).
- dedupe_key UNIQUE            → withWatermark + dropDuplicates on the
  key: cross-batch stateful dedup bounded by the watermark (K3/K9).
- poison events → DLQ          → validation filter; rejected rows are
  appended to a `dlq/` side table with the batch id (K5).
- fold → upsert projection     → foreachBatch: aggregate the batch with
  the commutative fold ops, then merge into the projection state with
  `greatest`/sum/last-by-seq (D12). State is written as
  `state/v{batch_id}` parquet — re-running batch N rewrites v{N}
  (ACK-after-durable-write analog); on Delta this merge is a MERGE INTO.

The fold ops form commutative monoids, so stream-fold ≡ batch groupBy —
property-tested against Q20 (tests/test_streaming.py).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

__all__ = [
    "fold_batch",
    "merge_projection",
    "run_projector",
    "read_projection",
    "reproject",
]

# Projection state columns (mirrors Q20's output plus the merge key
# `last_event_id` that makes last-by-seq mergeable across batches).
_COUNTERS = ("clicks", "views", "errors", "n_events")


def fold_batch(batch: DataFrame) -> DataFrame:
    """Fold one micro-batch into per-user partial state (commutative ops)."""

    def cnt(t: str):
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).cast("long")

    return batch.groupBy("user_id").agg(
        F.max("event_id").alias("last_event_id"),
        F.max_by("ts", "event_id").alias("last_ts"),
        F.max("value").alias("max_value"),
        cnt("click").alias("clicks"),
        cnt("view").alias("views"),
        cnt("error").alias("errors"),
        F.count("*").alias("n_events"),
    )


def merge_projection(state: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge-safe upsert: old state ⊕ batch delta, per merge-op vocabulary.

    last_* = by greatest event_id (last-by-seq), max_value = greatest,
    counters = additive. Equivalent to `MERGE INTO state USING delta` with
    greatest()/sum() update expressions on Delta (D12).
    """
    s = state.select(
        "user_id",
        *[F.col(c).alias(f"s_{c}") for c in ("last_event_id", "last_ts", "max_value", *_COUNTERS)],
    )
    d = delta.select(
        "user_id",
        *[F.col(c).alias(f"d_{c}") for c in ("last_event_id", "last_ts", "max_value", *_COUNTERS)],
    )
    j = s.join(d, "user_id", "full_outer")
    take_new = F.col("d_last_event_id") > F.coalesce(
        F.col("s_last_event_id"), F.lit(-1)
    )
    merged = j.select(
        "user_id",
        F.greatest(
            F.coalesce("s_last_event_id", F.lit(-1)), F.coalesce("d_last_event_id", F.lit(-1))
        ).alias("last_event_id"),
        F.when(take_new, F.col("d_last_ts")).otherwise(F.col("s_last_ts")).alias("last_ts"),
        F.greatest(
            F.coalesce("s_max_value", F.lit(float("-inf"))),
            F.coalesce("d_max_value", F.lit(float("-inf"))),
        ).alias("max_value"),
        *[
            (F.coalesce(f"s_{c}", F.lit(0)) + F.coalesce(f"d_{c}", F.lit(0))).alias(c)
            for c in _COUNTERS
        ],
    )
    return merged


def _latest_version(state_dir: str) -> tuple[int, str | None]:
    if not os.path.isdir(state_dir):
        return -1, None
    best, path = -1, None
    for name in os.listdir(state_dir):
        m = re.fullmatch(r"v(\d+)", name)
        if m and int(m.group(1)) > best:
            best, path = int(m.group(1)), os.path.join(state_dir, name)
    return best, path


def read_projection(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Current projection = highest committed state version."""
    _, path = _latest_version(state_dir)
    return spark.read.parquet(path) if path else None


def reproject(
    spark: SparkSession, full_log: DataFrame, state_dir: str
) -> DataFrame:
    """K10 backfill: read models are disposable — rebuild the projection
    from the complete event log as one batch fold and commit it as the
    next state version (the reference's versioned reprojection with
    shadow-version cutover, projector.go:60-69 +
    knowledge_reproject_runs). The incremental stream can resume on top:
    fold ≡ groupBy makes replay-over-rebuild convergent.
    """
    version, _ = _latest_version(state_dir)
    rebuilt = fold_batch(full_log)
    rebuilt.write.mode("overwrite").parquet(
        os.path.join(state_dir, f"v{version + 1}")
    )
    return read_projection(spark, state_dir)


def run_projector(
    spark: SparkSession,
    source: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    dedupe: bool = True,
) -> StreamingQuery:
    """Start the checkpointed fold of an events stream into projection state.

    `source` is an events-shaped streaming DataFrame (read_events_stream).
    Rows failing validation go to the DLQ side table instead of the fold;
    duplicate event_ids within the watermark are dropped before folding.
    """
    stream = source
    if dedupe:
        stream = stream.withWatermark("ts", "2 hours").dropDuplicates(["event_id"])

    dlq_dir = os.path.join(state_dir, "dlq")

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        # The batch feeds three consumers (DLQ probe, DLQ write, fold);
        # persist it so the source scans ONCE per micro-batch instead of
        # once per consumer, and release the blocks before returning.
        batch.persist()
        try:
            # K5: poison rows — the projector never skips silently;
            # invalid events are preserved with provenance for
            # replay/inspection.
            valid_pred = (
                F.col("user_id").isNotNull()
                & F.col("event_id").isNotNull()
                & F.col("event_type").isNotNull()
                & (F.coalesce(F.col("value"), F.lit(-1.0)) >= 0)
            )
            bad = batch.filter(~valid_pred)
            if bad.limit(1).count() > 0:
                bad.withColumn("batch_id", F.lit(batch_id)).write.mode(
                    "append"
                ).parquet(dlq_dir)
            good = batch.filter(valid_pred)

            delta = fold_batch(good)
            prev_version, prev_path = _latest_version(state_dir)
            if prev_path is not None and prev_version >= batch_id:
                # Crash-replay of an already-committed batch: fold against
                # the state *before* this batch so the rewrite is
                # idempotent (K1).
                prev_path = (
                    os.path.join(state_dir, f"v{batch_id - 1}")
                    if batch_id > 0
                    else None
                )
            if prev_path is not None and os.path.isdir(prev_path):
                state = spark.read.parquet(prev_path)
                merged = merge_projection(state, delta)
            else:
                merged = delta
            merged.write.mode("overwrite").parquet(
                os.path.join(state_dir, f"v{batch_id}")
            )
        finally:
            batch.unpersist()

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
