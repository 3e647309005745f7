"""Context-window chunking and sequence packing (north-star pillar).

The two structural ops every LLM training pipeline runs between "clean
corpus" and "token batches":

- ``chunk_tokens``: split each document's token stream into overlapping
  windows of at most ``max_tokens`` (stride < max_tokens overlaps
  adjacent chunks). Built entirely in-row — ``sequence`` for the chunk
  starts, ``slice`` per start, one ``posexplode`` — so the plan is a
  single narrow projection: no shuffle, no UDF, scan-parallel at any
  scale. The DuckDB twin (generate_series + list_slice) makes chunk
  CONTENT oracle-checkable, not just counts.

- ``pack_contiguous``: assign chunks/docs to training bins of ~``budget``
  tokens by running token count within a shard: bin = floor(exclusive-
  cumsum / budget). One window per shard — shards (e.g. hash buckets,
  language, date) bound the window partitions, so there is no global
  sort and no single-partition exchange. Bins can overflow by at most
  one document (the classic streaming-pack bound); exact SQL semantics,
  fully oracle-checkable.

- ``pack_ffd``: first-fit-decreasing bin packing per shard via
  applyInPandas — the tighter packing used when bins must NOT overflow.
  Oversize docs (> budget alone) get singleton bins. Grouped-map over
  the shard key: each shard packs independently in one task, the
  pandas frame holds (id, n_tokens) pairs only — bounded by shard
  design, never the corpus.

Scale note: contiguous packing is the default at 100 TB (pure window
arithmetic, mergeable across shards); FFD is for the final per-shard
pass where utilization matters more than a second shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

__all__ = ["chunk_tokens", "pack_contiguous", "pack_ffd", "shuffle_shards"]


def chunk_tokens(
    df: DataFrame,
    tokens: Column,
    id_col: str = "doc_id",
    max_tokens: int = 512,
    stride: int = 384,
) -> DataFrame:
    """(id, chunk_idx, n_tok, chunk_text) — overlapping token windows.

    Chunk starts are 0, stride, 2·stride, ... while start < len(tokens);
    every chunk is non-empty and at most ``max_tokens`` long; empty
    documents yield no chunks. stride == max_tokens gives an exact
    disjoint cover of the token stream (tested).
    """
    if not (0 < stride <= max_tokens):
        raise ValueError("require 0 < stride <= max_tokens")
    n = F.size(tokens)
    starts = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        starts, lambda s: F.slice(tokens, (s + 1).cast("int"), max_tokens)
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(chunks).alias("chunk_idx", "chunk"),
    ).select(
        "id",
        "chunk_idx",
        F.size("chunk").alias("n_tok"),
        F.concat_ws(" ", "chunk").alias("chunk_text"),
    )


def pack_contiguous(
    df: DataFrame,
    n_tokens_col: str,
    budget: int,
    shard_col: str,
    order_col: str,
) -> DataFrame:
    """Add ``bin`` — contiguous token-budget packing within each shard.

    bin = floor(exclusive_cumsum(n_tokens) / budget) over the shard in
    ``order_col`` order. Deterministic, one hash-partitioned window
    (never a global sort); a bin's token sum exceeds ``budget`` by less
    than its last document's length — the bound FFD trades a second
    pass to remove.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(n_tokens_col).over(w), F.lit(0))
    return df.withColumn(
        "bin", F.floor(cum_before / F.lit(budget)).cast("long")
    )


def pack_ffd(
    df: DataFrame,
    n_tokens_col: str,
    budget: int,
    shard_col: str,
    id_col: str = "id",
) -> DataFrame:
    """(shard, id, n_tokens, bin) — first-fit-decreasing packing per shard.

    Docs sort by (n_tokens desc, id) and each goes to the first bin with
    room; bins never exceed ``budget`` unless a single document alone
    does (singleton bin). Deterministic for a given input set. The
    grouped-map frame carries two columns per doc — shards size the
    memory, and the shard key is the only shuffle.
    """
    schema = StructType(
        [
            StructField("shard", StringType()),
            StructField("id", LongType()),
            StructField("n_tokens", LongType()),
            StructField("bin", LongType()),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        # Null token counts (e.g. null text upstream) surface here as
        # NaN in a float64 column; treat them as 0-token docs rather
        # than failing the task.
        pdf = pdf.assign(n_tokens=pdf["n_tokens"].fillna(0).astype("int64"))
        pdf = pdf.sort_values(["n_tokens", "id"], ascending=[False, True])
        bins: list[int] = []  # remaining capacity per bin
        assigned: list[int] = []
        for t in pdf["n_tokens"]:
            t = max(int(t), 0)
            for i, rem in enumerate(bins):
                # rem > 0 keeps 0-token docs out of exhausted bins —
                # in particular out of oversize singletons, whose
                # capacity clamps to 0 (for t > 0, t <= rem already
                # implies rem > 0, so this changes nothing else).
                if t <= rem and rem > 0:
                    bins[i] = rem - t
                    assigned.append(i)
                    break
            else:
                bins.append(max(budget - t, 0))
                assigned.append(len(bins) - 1)
        return pd.DataFrame(
            {
                "shard": pdf["__shard"].astype(str),
                "id": pdf["id"].astype("int64"),
                "n_tokens": pdf["n_tokens"].astype("int64"),
                "bin": pd.Series(assigned, index=pdf.index, dtype="int64"),
            }
        )

    slim = df.select(
        F.col(shard_col).cast("string").alias("__shard"),
        F.col(id_col).cast("long").alias("id"),
        F.col(n_tokens_col).cast("long").alias("n_tokens"),
    )
    return slim.groupBy("__shard").applyInPandas(pack, schema)


def shuffle_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 16,
    salt: str = "shuffle-v1",
) -> DataFrame:
    """Deterministic global corpus shuffle + sharding for training export.

    Training runs want documents in pseudo-random order, split into
    ``n_shards`` balanced output files, reproducibly (same corpus + same
    ``salt`` → byte-identical shards, so a re-run after failure exports
    the same epoch ordering). Adds:

    - ``shard``   int  — hash-uniform shard assignment
    - ``pos``     long — 0-based position within the shard, ordered by
                         the shuffle key (i.e. pseudo-random)

    Shape for 100 TB: the shuffle key is one md5 per row computed inside
    the scan stage; shard assignment is a mod — rows move in exactly ONE
    hash exchange keyed by shard. Position is a per-shard window: choose
    ``n_shards`` so a shard fits a task (e.g. 10k shards for 100 TB →
    ~10 GB sorts, standard external-sort territory) — there is never a
    global sort or single-partition exchange. The 60-bit portable hash
    (functions/hashing.py) keeps every shard/pos decision replayable by
    the DuckDB oracle.
    """
    from alt_spark.functions.hashing import portable_hash60

    # F.concat (not concat_ws): NULL ids must propagate to a NULL key —
    # exactly what the oracle's `||` does — rather than silently hash
    # the bare salt (the sample_bucket convention, operators/mixing.py).
    key = portable_hash60(
        F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))
    )
    # 60-bit hash is non-negative, so % and pmod agree with DuckDB's %.
    out = df.withColumn("__k", key).withColumn(
        "shard", (F.col("__k") % n_shards).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("__k", id_col)
    return out.withColumn(
        "pos", (F.row_number().over(w) - 1).cast("long")
    ).drop("__k")
