"""Centroid classification (SURVEY.md §2 J3).

Reference: recap-worker classifier/workflow.rs:227-360 + classification/
model.rs:133-160 — per-genre centroids trained from a golden dataset,
classification by cosine argmax against the centroids.

Shape: centroids are label-cardinality (tiny) and live exploded as
(label, idx, c) rows broadcast into the member join; scoring is one
hash join + per-(vector,label) aggregation; argmax is a row_number
window partitioned by vector id (bounded by |labels| rows per
partition). Scores are rounded before ranking so the argmax tiebreak is
engine-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["explode_vectors", "train_centroids", "classify"]


def explode_vectors(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, idx, val double) rows — the relational vector decomposition."""
    return df.select(
        F.col(id_col).alias("id"), F.posexplode(vec_col).alias("idx", "fval")
    ).select("id", "idx", F.col("fval").cast("double").alias("val"))


def train_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    id_col: str = "vec_id",
) -> DataFrame:
    """(label, idx, c) mean-vector components per label (Rocchio form)."""
    ex = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(vec_col).alias("idx", "fval"),
    ).select("label", "idx", F.col("fval").cast("double").alias("val"))
    return ex.groupBy("label", "idx").agg(F.avg("val").alias("c"))


def classify(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, predicted, cos_sim): cosine argmax over the centroid set."""
    ex = explode_vectors(df, vec_col, id_col)
    scored = (
        ex.join(F.broadcast(centroids), "idx")
        .groupBy("id", "label")
        .agg(
            (
                F.sum(F.col("val") * F.col("c"))
                / (
                    F.sqrt(F.sum(F.col("val") * F.col("val")))
                    * F.sqrt(F.sum(F.col("c") * F.col("c")))
                )
            ).alias("cos_sim")
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc(F.round("cos_sim", 9)), "label")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id", F.col("label").alias("predicted"), F.round("cos_sim", 6).alias("cos_sim"))
    )
