"""Clustering operators (SURVEY.md §2 J5/J6).

- ``kmeans_assign`` — MLlib KMeans (Lloyd; seeded, deterministic), the
  engine-native path for J5 (reference util/kmeans.rs:22-92 classic EM,
  :99-160 Sculley mini-batch — MLlib's implementation subsumes both).
- ``cluster_islands`` — the J6 pattern: per-group clustering that has no
  Spark-native twin (reference: UMAP→HDBSCAN per genre,
  recap-subworker services/clusterer.py:20-51,122-170). Runs as
  `applyInPandas` — the §2.L grouped-map UDF surface — with a
  deterministic numpy Lloyd kernel standing in for UMAP/HDBSCAN (those
  libs aren't in this container; the reference itself falls back to
  MiniBatchKMeans on timeout, clusterer.py:191-290, so the fallback IS
  a faithful declared semantic, not just a stub).

Grouped-map scale shape: each label-group must fit one executor's
memory — exactly the reference's per-genre islands; the surrounding
partitioning (one Arrow batch per group) is the real contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["kmeans_assign", "cluster_islands"]


def kmeans_assign(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """(id, cluster) via MLlib KMeans over an array<float> column."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.select(id_col, array_to_vector(vec_col).alias("features"))
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feats)
    return model.transform(feats).select(
        df[id_col].alias("id"), "prediction"
    ).withColumnRenamed("prediction", "cluster")


_ISLAND_SCHEMA = T.StructType(
    [
        T.StructField("label", T.IntegerType()),
        T.StructField("vec_id", T.LongType()),
        T.StructField("sub_cluster", T.IntegerType()),
    ]
)


def cluster_islands(
    df: DataFrame,
    k: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    iters: int = 10,
) -> DataFrame:
    """Per-label sub-clustering island (applyInPandas grouped-map).

    Deterministic: init centers are the k lowest-id members; Lloyd for a
    fixed iteration count; ties break toward the lower center index.
    """

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        n = len(pdf)
        kk = min(k, n)
        centers = X[:kk].copy()
        assign = np.zeros(n, dtype=np.int64)
        for _ in range(iters):
            d = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for c in range(kk):
                members = X[assign == c]
                if len(members):
                    centers[c] = members.mean(axis=0)
        return pd.DataFrame(
            {
                "label": pdf[label_col].astype("int32"),
                "vec_id": pdf[id_col],
                "sub_cluster": assign.astype("int32"),
            }
        )

    return df.groupBy(label_col).applyInPandas(kernel, schema=_ISLAND_SCHEMA)
