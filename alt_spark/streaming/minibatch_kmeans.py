"""Sculley mini-batch k-means as a Structured Streaming fold (SURVEY
§2 J5 — the streaming analog the J5 row declares next to MLlib Lloyd).

Reference: util/kmeans.rs:99-160 — the web-scale mini-batch variant
(Sculley 2010): per mini-batch, assign members to their nearest
centroid, then move each centroid toward the batch's member mean with
a per-centroid learning rate 1/n_c (n_c = members ever assigned). The
reference applies it per sample; this port applies the standard
batch-aggregated form of the same update — one vectorized step per
micro-batch:

    n_c += n_new
    c   += (sum_x - n_new * c) / n_c

which equals the per-sample rule under a constant within-batch
assignment and is order-free inside the batch (a distributed fold must
not depend on row order within a partition).

Engine shape: assignment is IN-ROW over a k-row broadcast centroid
array (the q137/q138 argmin device, float here); the per-batch
statistics are ONE map-side-combinable (cluster, dim) aggregate; the
centroid state is k x dim floats held on the driver between batches —
model state under the same bounded-driver-state budget as the LM model
cache and the IVF centroid table (a few KB, independent of corpus
size). Parity with a sequential numpy replay of the identical
per-batch updates is pinned in tests/test_streaming.py (float sums
shuffle-order-vary, so to ~1e-9, never structurally).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "assign_and_summarize",
    "assign_and_summarize_int",
    "minibatch_update",
    "minibatch_update_int",
    "run_streaming_minibatch_kmeans",
    "run_streaming_minibatch_kmeans_int",
    "tdiv",
]


def _cent_arr_frame(
    spark: SparkSession, cents: list[list], elem_type: str
) -> DataFrame:
    """One-row (cents array<struct<c,cv>>) local relation for the
    in-row argmin. The centroid VALUES ride as data, not as literals:
    a literal-embedded centroid array changes the generated code every
    micro-batch (new constants -> janino recompile + ~500 py4j Column
    constructions per k x dim), where a broadcast local relation keeps
    the plan shape — and its cached codegen — identical across batches
    (measured on q141: ~1.6 s -> ~0.5 s per batch at sf0.1)."""
    rows = [([(i, list(vec)) for i, vec in enumerate(cents)],)]
    return spark.createDataFrame(
        rows, f"cents array<struct<c:int,cv:array<{elem_type}>>>"
    )


def assign_and_summarize(
    batch: DataFrame, cents: list[list[float]]
) -> dict[int, tuple[int, list[float]]]:
    """Assign a (vec_id, embedding) batch to its nearest centroid
    (squared L2, ties to the lowest cluster via strict <) and return
    per-cluster (n_new, per-dim sums). One narrow pass: the centroids
    ride a 1-row broadcast local relation (see _cent_arr_frame); no
    vector ever shuffles — only the k x dim summary comes back."""
    cent_arr = _cent_arr_frame(
        batch.sparkSession, [[float(v) for v in vec] for vec in cents],
        "double",
    )

    def dist_to(x):
        return F.aggregate(
            F.zip_with(
                F.col("v"), x["cv"], lambda a, b: (a - b) * (a - b)
            ),
            F.lit(0.0),
            lambda s, d: s + d,
        )

    big = F.lit(float("inf"))
    # Precompute each centroid distance ONCE (higher-order-function
    # lambdas get no CSE, so folding dist_to(x) directly would pay the
    # distance arithmetic twice per centroid), then argmin-fold over
    # the (d, c) structs. Strict < keeps ties at the lowest cluster and
    # leaves c = -1 when every distance is NaN (Spark orders NaN above
    # all numerics, so NaN < inf is false) — malformed vectors surface
    # as -1 and fail loudly in minibatch_update instead of silently
    # corrupting a centroid.
    assigned = (
        batch.select(
            F.transform("embedding", lambda x: x.cast("double")).alias("v")
        )
        .crossJoin(F.broadcast(cent_arr))
        .select(
            "v",
            F.aggregate(
                F.transform(
                    F.col("cents"),
                    lambda x: F.struct(
                        dist_to(x).alias("d"), x["c"].alias("c")
                    ),
                ),
                F.struct(big.alias("d"), F.lit(-1).alias("c")),
                lambda acc, x: F.when(x["d"] < acc["d"], x).otherwise(acc),
            )["c"].alias("cluster"),
        )
    )
    stats = (
        assigned.select("cluster", F.posexplode("v").alias("i", "x"))
        .groupBy("cluster", "i")
        .agg(F.count("*").alias("n"), F.sum("x").alias("s"))
        .collect()
    )
    out: dict[int, tuple[int, list[float]]] = {}
    dim = len(cents[0])
    for r in stats:
        n, sums = out.get(r["cluster"], (0, [0.0] * dim))
        sums[r["i"]] = r["s"]
        out[r["cluster"]] = (r["n"], sums)
    return out


def minibatch_update(
    cents: list[list[float]],
    counts: list[int],
    stats: dict[int, tuple[int, list[float]]],
) -> None:
    """Apply one batch-aggregated Sculley step in place."""
    for c, (n_new, sums) in stats.items():
        if c < 0 or c >= len(cents):
            raise ValueError(
                f"invalid cluster id {c} in batch stats — a row whose "
                "distances were all NaN (malformed embedding) folds to "
                "-1; refusing to corrupt centroid state"
            )
        if n_new == 0:
            continue
        counts[c] += n_new
        cents[c] = [
            cv + (sv - n_new * cv) / counts[c]
            for cv, sv in zip(cents[c], sums)
        ]


def tdiv(a: int, b: int) -> int:
    """Integer division truncating toward ZERO — the semantics Spark
    `div` and DuckDB `//` share (both verified on negative operands;
    Python's `//` floors instead, so the driver-side fold must not use
    it directly)."""
    q = a // b
    if q < 0 and q * b != a:
        q += 1
    return q


def assign_and_summarize_int(
    batch: DataFrame, cents: list[list[int]]
) -> dict[int, tuple[int, list[int]]]:
    """Integer twin of `assign_and_summarize` for the driver-hashable
    q141 fold: the batch carries pre-quantized `qv array<long>` rows,
    distances are exact integer squared L2, ties go to the lowest
    cluster via strict <, and the returned per-cluster sums are exact
    longs — every number both engines touch is an integer, so the
    DuckDB unrolled replay agrees bit-for-bit. Same single-evaluation
    argmin and same scale shape as the float form: centroids ride a
    1-row broadcast local relation (see _cent_arr_frame), only the
    k x dim summary returns."""
    cent_arr = _cent_arr_frame(
        batch.sparkSession, [[int(v) for v in vec] for vec in cents],
        "bigint",
    )

    def dist_to(x):
        return F.aggregate(
            F.zip_with(
                F.col("v"), x["cv"], lambda a, b: (a - b) * (a - b)
            ),
            F.lit(0).cast("long"),
            lambda s, d: s + d,
        )

    big = F.lit(2**62).cast("long")
    assigned = (
        batch.select(F.col("qv").alias("v"))
        .crossJoin(F.broadcast(cent_arr))
        .select(
            "v",
            F.aggregate(
                F.transform(
                    F.col("cents"),
                    lambda x: F.struct(
                        dist_to(x).alias("d"), x["c"].alias("c")
                    ),
                ),
                F.struct(big.alias("d"), F.lit(-1).alias("c")),
                lambda acc, x: F.when(x["d"] < acc["d"], x).otherwise(acc),
            )["c"].alias("cluster"),
        )
    )
    stats = (
        assigned.select("cluster", F.posexplode("v").alias("i", "x"))
        .groupBy("cluster", "i")
        .agg(F.count("*").alias("n"), F.sum("x").alias("s"))
        .collect()
    )
    out: dict[int, tuple[int, list[int]]] = {}
    dim = len(cents[0])
    for r in stats:
        n, sums = out.get(r["cluster"], (0, [0] * dim))
        sums[r["i"]] = int(r["s"])
        out[r["cluster"]] = (int(r["n"]), sums)
    return out


def minibatch_update_int(
    cents: list[list[int]],
    counts: list[int],
    stats: dict[int, tuple[int, list[int]]],
) -> None:
    """One batch-aggregated Sculley step in TRUNCATED integer
    arithmetic, in place: n_c += n_new; c += (sum_x - n_new*c) div n_c
    per dimension, `div` toward zero (tdiv — the Spark/DuckDB shared
    rule, so the oracle's unrolled stages replay it exactly)."""
    for c, (n_new, sums) in stats.items():
        if c < 0 or c >= len(cents):
            raise ValueError(
                f"invalid cluster id {c} in batch stats — a malformed "
                "row folds to -1; refusing to corrupt centroid state"
            )
        if n_new == 0:
            continue
        counts[c] += n_new
        cents[c] = [
            cv + tdiv(sv - n_new * cv, counts[c])
            for cv, sv in zip(cents[c], sums)
        ]


def run_streaming_minibatch_kmeans_int(
    spark: SparkSession,
    landing: str,
    k: int,
    checkpoint: str,
    schema: str = "vec_id long, qv array<long>",
    max_files_per_trigger: int = 1,
    timeout_s: int = 300,
) -> tuple[list[list[int]], list[int], int]:
    """Integer twin of `run_streaming_minibatch_kmeans`: same seed
    policy (first batch's k lowest vec_ids), one truncated-arithmetic
    Sculley step per micro-batch. Returns (centroids, counts,
    n_batches) — all exact integers, hashable cross-engine."""
    state: dict = {"cents": None, "counts": None, "batches": 0}

    def step(bdf: DataFrame, _bid: int) -> None:
        if bdf.isEmpty():
            return
        if state["cents"] is None:
            # Seed batch feeds TWO actions (seed collect + the summary)
            # — checkpoint so it computes once; later batches run one
            # action and need no materialization.
            bdf = bdf.localCheckpoint(eager=True)
            seeds = (
                bdf.orderBy("vec_id").limit(k).select("qv").collect()
            )
            if len(seeds) < k:
                raise ValueError(
                    f"first batch holds {len(seeds)} < k={k} vectors"
                )
            state["cents"] = [[int(v) for v in r["qv"]] for r in seeds]
            state["counts"] = [0] * k
        stats = assign_and_summarize_int(bdf, state["cents"])
        minibatch_update_int(state["cents"], state["counts"], stats)
        state["batches"] += 1

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing)
        .writeStream.foreachBatch(step)
        .option("checkpointLocation", os.path.join(checkpoint, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_s):
            q.stop()
            raise RuntimeError("mini-batch k-means stream timed out")
    finally:
        if q.isActive:
            q.stop()
    if state["cents"] is None:
        raise ValueError("stream delivered no rows")
    return state["cents"], state["counts"], state["batches"]


def run_streaming_minibatch_kmeans(
    spark: SparkSession,
    landing: str,
    k: int,
    checkpoint: str,
    schema: str = "vec_id long, embedding array<float>",
    max_files_per_trigger: int = 1,
    timeout_s: int = 300,
) -> tuple[list[list[float]], list[int], int]:
    """Fold a parquet landing directory through mini-batch k-means:
    seeds are the FIRST batch's k lowest vec_ids (a pinned seed policy,
    like q137's), every subsequent micro-batch applies one aggregated
    Sculley step. Returns (centroids, per-centroid counts, n_batches).
    """
    state: dict = {"cents": None, "counts": None, "batches": 0}

    def step(bdf: DataFrame, _bid: int) -> None:
        if bdf.isEmpty():
            return
        if state["cents"] is None:
            # Seed batch feeds two actions — checkpoint it; later
            # batches run a single summary action.
            bdf = bdf.localCheckpoint(eager=True)
            seeds = (
                bdf.orderBy("vec_id")
                .limit(k)
                .select(
                    F.transform(
                        "embedding", lambda x: x.cast("double")
                    ).alias("v")
                )
                .collect()
            )
            if len(seeds) < k:
                raise ValueError(
                    f"first batch holds {len(seeds)} < k={k} vectors"
                )
            state["cents"] = [list(r["v"]) for r in seeds]
            state["counts"] = [0] * k
        stats = assign_and_summarize(bdf, state["cents"])
        minibatch_update(state["cents"], state["counts"], stats)
        state["batches"] += 1

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing)
        .writeStream.foreachBatch(step)
        .option("checkpointLocation", os.path.join(checkpoint, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_s):
            q.stop()
            raise RuntimeError("mini-batch k-means stream timed out")
    finally:
        if q.isActive:
            q.stop()
    if state["cents"] is None:
        raise ValueError("stream delivered no rows")
    return state["cents"], state["counts"], state["batches"]
