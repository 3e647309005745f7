"""Trainable corpus-quality classifier (north-star pillar).

The fasttext-style quality gate LLM data pipelines run after heuristic
filtering: bootstrap labels from a trusted signal (a heuristic score, a
trusted-domain allowlist), train a linear classifier over hashed
bag-of-words features, then score the whole corpus with the tiny model.
Public shape: Brown et al. 2020 (GPT-3) Appendix A quality filtering;
the reference's own classifier workflow is the non-trainable sibling
(recap-worker classifier/workflow.rs:227-360 — centroid scoring, J3 —
already covered by q39; this adds the TRAINED form).

Scale design:

- **Featurization** is the hashing trick (`HashingTF`, 2^12 buckets by
  default): no vocabulary state, no fit pass, embarrassingly parallel.
- **Training** (`LogisticRegression`) runs one treeAggregate per
  L-BFGS iteration; what moves is a gradient of `num_features` doubles
  per task — driver state is the coefficient vector only (the bounded
  IVF-centroid budget). On a real corpus you train on a sample; the
  model is always the small side.
- **Scoring** broadcasts the coefficient vector and runs one codegen'd
  dot product per row — scan speed, no shuffle.

Labels here bootstrap from the engine's own heuristic quality score
(functions/text_analysis.quality_score, the q27 surface): documents at
or above the corpus median are "keep". That is deliberately circular
for TESTS (the classifier must be able to re-learn a function of its
own features) and deliberately realistic for USE (pipelines bootstrap
from heuristics or trusted sources, then let the classifier generalize).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alt_spark.functions import text_analysis as ta
from alt_spark.operators.dedup import tokens_col

__all__ = [
    "bootstrap_labels",
    "train_quality_classifier",
    "score_quality",
]


def bootstrap_labels(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``label`` (1.0 keep / 0.0 drop): heuristic quality at or
    above the corpus median. Exact ``percentile_cont`` in one pass,
    broadcast back as a 1-row frame (the BM25 stats-row device) — at
    100 TB the median costs one scan + one 1-row exchange, and any
    trusted labeling (domain allowlist, human sample) drops in by
    replacing this function.
    """
    q = ta.quality_score(F.col(text_col))
    scored = docs.withColumn("__q", q)
    med = scored.agg(
        F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY __q)").alias("__med")
    )
    return (
        scored.crossJoin(F.broadcast(med))
        .withColumn(
            "label", F.when(F.col("__q") >= F.col("__med"), 1.0).otherwise(0.0)
        )
        .drop("__q", "__med")
    )


def train_quality_classifier(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    num_features: int = 1 << 12,
    max_iter: int = 10,  # L-BFGS converges by ~10 on the bootstrap task
    # (held-out AUC identical at 10/15/30 iters, measured at sf0.1)
    reg_param: float = 1e-3,
):
    """Fit hashed-BoW logistic regression; returns the fitted
    PipelineModel (HashingTF → LogisticRegression).

    The token column feeding HashingTF uses the engine tokenizer
    contract (lower + \\W+ split), so classifier features line up with
    every other text operator's view of a document.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    toks = docs.withColumn("__toks", tokens_col(text_col))
    tf = HashingTF(
        inputCol="__toks", outputCol="features", numFeatures=num_features
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
        standardization=True,
    )
    return Pipeline(stages=[tf, lr]).fit(toks)


def score_quality(
    model, docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, keep_prob) for every document — the broadcast-model scan.

    ``keep_prob`` is P(label=1) from the fitted model; thresholding is
    the caller's policy decision (pipelines sample different cutoffs
    per source).
    """
    from pyspark.ml.functions import vector_to_array

    toks = docs.withColumn("__toks", tokens_col(text_col))
    scored = model.transform(toks)
    keep = vector_to_array(F.col("probability")).getItem(1)
    return scored.select(
        F.col(id_col).alias("id"), keep.cast("double").alias("keep_prob")
    )
