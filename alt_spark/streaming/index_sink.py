"""Search-index sink: idempotent keyed upsert with delete propagation
(SURVEY.md §2 A8).

Reference: search-indexer/app/usecase/index_articles.go — keyset-
paginated backfill and incremental upserts into Meilisearch (:69-94,
:106-139), deletes propagated, batch-level synonym registration (:35-42)
— under the consumer rule "ACK after durable write".

Spark shape: `foreachBatch` merges each micro-batch into a versioned
parquet index table (same idempotent v{batch_id} discipline as the
projector — reprocessing a batch rewrites its version). Upsert = full
outer on the document key, batch row wins; rows flagged deleted drop
out. Synonyms are a plain dimension table the search layer joins —
batch-level registration is just an overwrite of that table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from alt_spark.streaming.projector import _latest_version

__all__ = ["upsert_index", "run_index_sink", "read_index"]


def upsert_index(index: DataFrame | None, batch: DataFrame, key: str = "doc_key") -> DataFrame:
    """Apply one batch of upserts/deletes to the index snapshot.

    `batch` rows carry `is_delete`; the latest row per key within the
    batch wins (ordered by `op_seq`), then the batch result overlays the
    existing snapshot.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy(F.desc("op_seq"))
    latest = (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if index is None:
        return latest.filter(~F.col("is_delete")).drop("is_delete", "op_seq")
    survivors = index.join(latest.select(key), key, "left_anti")
    additions = latest.filter(~F.col("is_delete")).drop("is_delete", "op_seq")
    return survivors.unionByName(additions)


def read_index(spark: SparkSession, index_dir: str) -> DataFrame | None:
    _, path = _latest_version(index_dir)
    return spark.read.parquet(path) if path else None


def run_index_sink(
    spark: SparkSession,
    source: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    key: str = "doc_key",
) -> StreamingQuery:
    """Stream of upsert/delete ops → versioned index snapshots.

    ACK-after-durable-write: the checkpoint only advances after the
    batch's snapshot version is fully written (foreachBatch completes),
    so a crash replays the batch into the same version — idempotent.
    """

    def process(batch: DataFrame, batch_id: int) -> None:
        prev_version, prev_path = _latest_version(index_dir)
        if prev_path is not None and prev_version >= batch_id:
            prev_path = (
                os.path.join(index_dir, f"v{batch_id - 1}") if batch_id > 0 else None
            )
        index = (
            spark.read.parquet(prev_path)
            if prev_path and os.path.isdir(prev_path)
            else None
        )
        merged = upsert_index(index, batch, key)
        merged.write.mode("overwrite").parquet(os.path.join(index_dir, f"v{batch_id}"))

    return (
        source.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
