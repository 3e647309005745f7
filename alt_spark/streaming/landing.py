"""Residue-keyed micro-batch landing — the shared replay-harness device
(q131's footing, single-write-job form).

The streaming replay queries (q141 mini-batch k-means, q145 projector
DLQ, q148 producer/consumer groups) re-land a table as N chunk files
whose file-source order IS a residue of a key column: ONE
``repartition(n, key).write.partitionBy(key)`` job stages every chunk
(hash-repartitioning on the key puts each residue in exactly one task,
so each partition dir holds exactly one part file), then mtime-staggered
renames fix the micro-batch order (``maxFilesPerTrigger=1`` file
sources pick files by modification time). Factored here so a fix to
the device — the one-part-per-dir assumption, mtime granularity —
lands once, not per query.
"""

from __future__ import annotations

import glob
import os
from contextlib import contextmanager

from pyspark.sql import DataFrame

__all__ = [
    "stage_residue_chunks",
    "move_staged_chunk",
    "land_residue_chunks",
    "replay_shuffle_partitions",
]


def stage_residue_chunks(
    df: DataFrame, key: str, n: int, stage_dir: str
) -> None:
    """ONE write job: every residue of ``key`` lands as exactly one
    part file under ``{key}={b}/`` (the data files carry every column
    EXCEPT the partition key — pass a frame whose other columns are
    the stream schema)."""
    df.repartition(n, key).write.partitionBy(key).parquet(stage_dir)


def move_staged_chunk(
    stage_dir: str, key: str, b: int, landing_dir: str, mtime: float
) -> str:
    """Move residue ``b``'s staged file into the landing dir as
    ``chunk_{b:03d}.parquet`` with the given mtime; returns the path.
    Exactly one part file must exist (the stage_residue_chunks
    contract) — a multi-file dir raises rather than silently dropping
    rows from the replay."""
    parts = glob.glob(
        os.path.join(stage_dir, f"{key}={b}", "part-*.parquet")
    )
    if not parts:
        raise RuntimeError(
            f"residue {key}={b} landed no staged file — the residue "
            "class is empty in the input (the replay queries key on "
            "dense residues by construction; a sparse key needs an "
            "explicit empty-chunk write, not this device)"
        )
    if len(parts) > 1:
        raise RuntimeError(
            f"expected exactly one staged part for {key}={b}, "
            f"found {len(parts)} — the one-task-per-residue landing "
            "contract is broken"
        )
    path = os.path.join(landing_dir, f"chunk_{b:03d}.parquet")
    os.rename(parts[0], path)
    os.utime(path, (mtime, mtime))
    return path


def land_residue_chunks(
    df: DataFrame,
    key: str,
    n: int,
    landing_dir: str,
    stage_dir: str,
    start_mtime: float,
) -> None:
    """Stage + move all ``n`` residues, mtimes ``start_mtime + b``."""
    stage_residue_chunks(df, key, n, stage_dir)
    for b in range(n):
        move_staged_chunk(stage_dir, key, b, landing_dir, start_mtime + b)


@contextmanager
def replay_shuffle_partitions(spark, n: int = 4):
    """Save/set/restore ``spark.sql.shuffle.partitions`` around a
    bounded streaming replay — the q139/q149 discipline: stateful
    micro-batch shuffles at harness scale pay pure per-task overhead
    at the session's 32 partitions (q149 measured 22 s -> ~5 s at
    sf0.01 with 4). Production sizes this to the cluster, not the
    harness; the conf is restored even on error."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
