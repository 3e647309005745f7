"""External-model UDF surface (SURVEY.md §2 I14 / §2.L).

Reference: news-creator Ollama summarization and the quality judge
(pre-processor/app/quality-checker/quality_judger.go:27,120-166 — a
prompt scoring summaries 1-10, acceptance threshold 7).

The engine surface is a *batched* pandas UDF whose endpoint is
injected: production passes a callable that POSTs a batch of prompts to
the model server; tests (and this container, which has no model) pass a
deterministic fake. The Arrow batch is the unit of endpoint calls —
maxRecordsPerBatch bounds request fan-in, exactly how a 100 TB scan
must amortize per-request overhead. NO model ships here: the declared
component is the batching/typing contract, never inference quality.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "make_llm_udf",
    "make_embedder_udf",
    "fake_summarizer",
    "fake_judge",
    "fake_embedder",
    "quality_gate",
    "fake_reranker",
    "make_reranker_udf",
]

Endpoint = Callable[[list[str]], list[str]]
EmbedModel = Callable[[list[str]], list[list[float]]]


def fake_summarizer(prompts: list[str]) -> list[str]:
    """Deterministic stand-in: first 8 whitespace tokens. REAL MODEL NOT
    CALLED — swap with an HTTP-batch callable in production."""
    return [" ".join((p or "").split()[:8]) for p in prompts]


def fake_judge(prompts: list[str]) -> list[str]:
    """Deterministic 1-10 score: longer, mixed-vocabulary summaries score
    higher (a monotone proxy so threshold tests are meaningful)."""
    out = []
    for p in prompts:
        toks = (p or "").split()
        score = min(10, 1 + len(set(toks)) // 2)
        out.append(str(score))
    return out


def make_llm_udf(endpoint: Endpoint, return_type: str = "string"):
    """Wrap a batch endpoint as an Arrow-batched column function.

    One endpoint call per Arrow batch (pandas Series) — the I14 surface.
    """

    def impl(s: pd.Series) -> pd.Series:
        return pd.Series(endpoint(list(s.fillna(""))), index=s.index)

    def apply(col: Column) -> Column:
        return pandas_udf(impl, return_type)(col)

    return apply


def fake_embedder(dim: int = 8) -> EmbedModel:
    """Deterministic stand-in embedder: md5-hashed bag-of-words into dim
    buckets, L2-normalized. REAL MODEL NOT CALLED — same call signature
    as a sentence-transformers batch encode, so swapping in the real
    model changes only this callable."""
    import hashlib
    import math

    def model(texts: list[str]) -> list[list[float]]:
        out = []
        for t in texts:
            v = [0.0] * dim
            for tok in (t or "").lower().split():
                h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:4], "big")
                v[h % dim] += 1.0
            norm = math.sqrt(sum(x * x for x in v)) or 1.0
            out.append([x / norm for x in v])
        return out

    return model


def make_embedder_udf(model: EmbedModel, dim: int):
    """The st_embedder contract (recap-subworker/recap_subworker/gateway/
    st_embedder.py shape): a batch of texts → one float vector of fixed
    dimensionality each, as an Arrow-batched ``array<float>`` column.

    The contract is enforced AT the UDF boundary — a model returning the
    wrong dimensionality or row count fails the batch immediately, so a
    real-model swap cannot silently churn the schema downstream (the
    golden test in tests/test_cleaning_llm.py pins this).
    """

    def impl(s: pd.Series) -> pd.Series:
        vecs = model(list(s.fillna("")))
        if len(vecs) != len(s):
            raise ValueError(
                f"embedder returned {len(vecs)} vectors for {len(s)} texts"
            )
        for v in vecs:
            if len(v) != dim:
                raise ValueError(
                    f"embedder returned dim {len(v)}, contract is {dim}"
                )
        return pd.Series(vecs, index=s.index)

    def apply(col: Column) -> Column:
        return pandas_udf(impl, "array<float>")(col)

    return apply


def quality_gate(
    df,
    text_col: str = "summary",
    judge: Endpoint = fake_judge,
    threshold: int = 7,
):
    """quality_judger.go semantics: judge each row 1-10, keep >= threshold.

    Returns the input with `quality` appended and rows below the gate
    dropped; the score column survives for audit (the reference logs it).
    """
    judge_col = make_llm_udf(judge, "string")
    scored = df.withColumn(
        "quality",
        F.coalesce(judge_col(F.col(text_col)).cast("int"), F.lit(0)),
    )
    return scored.filter(F.col("quality") >= threshold)


RerankModel = Callable[[list[tuple[str, str]]], list[float]]


def fake_reranker(pairs: list[tuple[str, str]]) -> list[float]:
    """Deterministic cross-encoder stand-in: fraction of the query's
    tokens present in the candidate (monotone in true relevance for
    overlap-shaped corpora, so ordering tests are meaningful). REAL
    MODEL NOT CALLED — production passes a callable that POSTs the
    batch to the rerank endpoint (reference: rerank_server.py, a
    CrossEncoder behind REST with batch-size and candidate caps)."""
    out = []
    for q, c in pairs:
        qt = [t for t in (q or "").lower().split() if t]
        ct = set((c or "").lower().split())
        out.append(round(sum(1 for t in qt if t in ct) / max(len(qt), 1), 6))
    return out


def make_reranker_udf(model: RerankModel):
    """Arrow-batched (query, candidate) → relevance double.

    The pandas batch is the unit of endpoint calls — the same
    amortization contract as make_llm_udf; maxRecordsPerBatch bounds
    request fan-in to the rerank service.
    """

    @pandas_udf("double")
    def impl(q: pd.Series, c: pd.Series) -> pd.Series:
        scores = model(list(zip(q.fillna("").tolist(), c.fillna("").tolist())))
        return pd.Series(scores, index=q.index, dtype="float64")

    def apply(query: Column, cand: Column) -> Column:
        return impl(query, cand)

    return apply
