"""Stream producer: publish rows to a file-channel topic (SURVEY §2 A6).

Reference semantics: the forwarder/mq-hub producer batches entries
(10,000 per batch / 500 ms flush / bounded buffer — BASELINE.md rows 3-4,
docs/services/rask-logging-architecture.md:173-175) and publishes to a
broker topic consumers tail with their own offsets.

No broker runs in this container, so the topic is its Spark-native
analog: an append-only parquet directory. The delivery contract is the
interesting part, and it is real:

- **flush interval** → ``trigger(processingTime=...)``; **batch size**
  → ``maxFilesPerTrigger``/``maxBytesPerTrigger`` on the upstream
  source — the producer publishes per micro-batch, exactly the
  batch-or-timeout flush rule of the reference.
- **exactly-once publish** → Spark's file-sink manifest
  (``_spark_metadata``): a re-run of a failed micro-batch overwrites
  its manifest entry instead of double-appending, so consumers reading
  through the manifest never see a partial or duplicated flush.
- **consumer offsets** → each subscriber passes its own
  ``checkpointLocation`` to :func:`subscribe` — independent consumer
  groups, per-group replay, exactly the checkpointed tail the
  projector (A7) implements on top.

At 100 TB the directory becomes a date/hour-partitioned event store and
the manifest discipline is what makes downstream reprocessing safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

__all__ = ["publish_stream", "publish_batch", "subscribe", "read_topic"]


def publish_stream(
    source: DataFrame,
    topic_dir: str,
    checkpoint_dir: str,
    trigger_interval: str | None = None,
) -> StreamingQuery:
    """Publish a streaming DataFrame to a topic directory.

    ``trigger_interval`` is the flush interval (``"500 milliseconds"``
    matches the reference default); None flushes as fast as batches
    arrive.
    """
    writer = (
        source.writeStream.format("parquet")
        .option("path", topic_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_interval is not None:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()


def publish_batch(df: DataFrame, topic_dir: str) -> None:
    """One-shot append of a batch frame to the topic (backfill path).

    Batch appends bypass the streaming manifest. If ``publish_stream``
    has already created ``_spark_metadata`` in this topic, manifest-aware
    readers (``read_topic``/``subscribe``) IGNORE unmanifested files —
    the batch rows would be silently invisible. This function refuses
    that footgun: backfill before subscribers attach, or use
    ``publish_stream`` with availableNow semantics instead.
    """
    import os

    if os.path.isdir(os.path.join(topic_dir, "_spark_metadata")):
        raise ValueError(
            f"topic {topic_dir!r} already has a streaming manifest "
            "(_spark_metadata): batch-appended files would be invisible to "
            "manifest-aware readers. Backfill before the first "
            "publish_stream, or publish through the stream path."
        )
    df.write.mode("append").parquet(topic_dir)


def subscribe(
    spark: SparkSession,
    topic_dir: str,
    schema: StructType,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """A consumer-group tail of the topic: a streaming read whose
    position is owned by whatever ``checkpointLocation`` the subscriber
    attaches downstream — two subscribers with different checkpoints
    are two consumer groups."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(topic_dir)
    )


def read_topic(spark: SparkSession, topic_dir: str) -> DataFrame:
    """Batch read of everything published so far (through the manifest
    when present, so in-flight flushes are invisible)."""
    return spark.read.parquet(topic_dir)
