"""Graph operators as iterative DataFrame joins (SURVEY.md §2 J4).

Reference: recap-worker classifier/graph.rs — kNN similarity graph
(:52-115), neighbor label propagation (:180-211), and random-walk-with-
restart `r = c·e + (1−c)·Aᵀ·r` over a CSR matrix (:258-340).

Spark shape: the adjacency is an edge DataFrame; one power-iteration
step is a join (edges × rank vector) + groupBy(dst).sum — the classic
GraphFrames/Pregel decomposition. The rank vector is tiny relative to
edges, so each step broadcasts it; edges are the stable big side and
can be cached/bucketed by src so iterations reuse the layout instead of
re-shuffling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["normalize_edges", "random_walk_with_restart", "propagate_labels"]


def normalize_edges(edges: DataFrame) -> DataFrame:
    """Row-normalize edge weights so each src's out-weights sum to 1."""
    totals = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    return (
        edges.join(totals, "src")
        .select("src", "dst", (F.col("weight") / F.col("out_w")).alias("weight"))
    )


def random_walk_with_restart(
    edges: DataFrame,
    restart: DataFrame,
    c: float = 0.15,
    iters: int = 10,
) -> DataFrame:
    """r_{t+1} = c·e + (1−c)·Aᵀ·r_t  (graph.rs:258-340).

    `edges` (src, dst, weight) should be row-normalized; `restart`
    (id, e) is the personalization vector. Returns (id, score).
    """
    norm = normalize_edges(edges).cache()
    r = restart.select("id", F.col("e").alias("score"))
    for _ in range(iters):
        spread = (
            norm.join(F.broadcast(r), norm["src"] == r["id"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("weight") * F.col("score")).alias("walked"))
        )
        r = (
            restart.join(spread, "id", "left")
            .select(
                "id",
                (c * F.col("e") + (1 - c) * F.coalesce("walked", F.lit(0.0))).alias("score"),
            )
        )
    return r


def propagate_labels(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 3,
    min_weight: float = 0.0,
) -> DataFrame:
    """Neighbor label propagation (graph.rs:180-211): unlabeled nodes take
    the argmax of neighbor label weight sums; seeds never change.

    `edges` (src, dst, weight) is treated as undirected; `seeds`
    (id, label). Returns (id, label, confidence).
    """
    undirected = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    ).filter(F.col("weight") >= min_weight)
    labels = seeds.select("id", "label", F.lit(1.0).alias("confidence"))
    seed_ids = seeds.select("id")
    for _ in range(iters):
        votes = (
            undirected.join(
                F.broadcast(labels), undirected["src"] == labels["id"]
            )
            .groupBy(F.col("dst").alias("nid"), "label")
            .agg(F.sum(F.col("weight") * F.col("confidence")).alias("vote"))
        )
        from pyspark.sql.window import Window

        w = Window.partitionBy("nid").orderBy(F.desc("vote"), "label")
        best = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                F.col("nid").alias("id"),
                "label",
                F.least(F.col("vote"), F.lit(1.0)).alias("confidence"),
            )
        )
        # Seeds are authoritative; propagated labels fill the rest.
        labels = seeds.select("id", "label", F.lit(1.0).alias("confidence")).unionByName(
            best.join(seed_ids, "id", "left_anti")
        )
    return labels
