"""Full-text search scoring (SURVEY.md §2 J2/J10/I13).

Reference: BM25 features recap-worker/src/classification/features.rs:
327-344 (k1=1.2, b=0.75 from model.rs:171-181); full-text relevance
ranking rag-orchestrator hybrid_search_repo.go:21-35,78 (ts_rank_cd —
declared here as multi-term BM25, the engine's tsvector-free semantic);
keyword extraction tag-generator extract.py:23,207-274 (KeyBERT —
declared proxy: top-k TF-IDF per document, per SURVEY §2 I13).

Shapes: corpus statistics (doclen, avgdl, df) are token-level
aggregations computed once and broadcast; multi-term scoring filters
the token stream to query terms FIRST (df-bounded rows), then joins
stats — the scan never widens. Keyword extraction is a per-doc
row_number window over (doc, token) tf-idf rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from alt_spark.operators.dedup import tokens_col

__all__ = ["bm25_rank", "tfidf_keywords", "rerank_topk"]

# Default for rerank_topk's incoming_score_col. The UNSET object lets
# the function tell "caller relied on the default" (the column may
# legitimately be absent — silent no-score fallback) apart from
# "caller NAMED a score column that isn't there" (a wiring bug: the
# cap would silently switch to id-ascending and drop the best
# candidates) — the latter raises. A string sentinel could not make
# that distinction for a caller explicitly passing "score".
DEFAULT_SCORE_COL = "score"
_UNSET_SCORE_COL = object()


def _token_rows(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"), F.explode(tokens_col(text_col)).alias("token")
    )


def bm25_rank(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    limit: int = 10,
) -> DataFrame:
    """Top-`limit` documents by summed Okapi BM25 over the query terms.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5)) per term; per-term scores sum
    (bag-of-terms query, the ts_rank_cd-style multi-term semantic).
    """
    tok = _token_rows(df, text_col, id_col)
    doclen = tok.groupBy("id").agg(F.count("*").alias("dl"))
    stats = doclen.agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl"))

    matched = tok.filter(F.col("token").isin(query_terms))
    tf = matched.groupBy("id", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    idf = F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    per_term = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .join(doclen, "id")
        .select(
            "id",
            (
                idf
                * F.col("tf")
                * (k1 + 1)
                / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
            ).alias("term_score"),
        )
    )
    return (
        per_term.groupBy("id")
        .agg(F.round(F.sum("term_score"), 6).alias("score"))
        .orderBy(F.desc("score"), "id")
        .limit(limit)
    )


def tfidf_keywords(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k TF-IDF tokens per document (I13 keyword-extraction proxy).

    idf = ln(N/df) over the corpus; rank = row_number per doc over
    (tfidf desc, token) — bounded window partitions (vocabulary-sized).
    Returns (id, token, rank, tfidf).
    """
    tok = _token_rows(df, text_col, id_col)
    tf = tok.groupBy("id", "token").agg(F.count("*").alias("tf"))
    dfreq = tok.groupBy("token").agg(F.countDistinct("id").alias("df"))
    n = df.agg(F.count("*").alias("n"))
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n))
        .select(
            "id",
            "token",
            F.round(
                F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("tfidf"), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", "token", "rank", "tfidf")
    )


def rerank_topk(
    candidates: DataFrame,
    query: str,
    model,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    max_candidates: int = 200,
    max_candidate_chars: int = 4000,
    incoming_score_col: object = _UNSET_SCORE_COL,
) -> DataFrame:
    """Cross-encoder reranking of a retrieval candidate set (the
    reference's retrieval Stage 4: rag-orchestrator
    internal/usecase/retrieval/rerank.go:22-96 — dedupe candidates,
    score every (query, content) pair, sort, cut TopK; service caps
    from rerank_server.py: MAX_CANDIDATES and per-candidate length
    truncation).

    ``model`` is a RAW scoring callable, ``list[(query, content)] ->
    list[float]`` (functions/llm.py:RerankModel — e.g.
    ``fake_reranker``, or a callable that POSTs the batch to the rerank
    endpoint). This function wraps it in the Arrow-batched UDF itself
    (``make_reranker_udf``); do NOT pre-wrap.

    Returns (id, rerank_score) — top k by (score desc, id asc), the
    deterministic tie-break.

    Scale note: a rerank set is retrieval-sized (<= max_candidates per
    query) by CONTRACT, not by data volume — the limit enforcing the
    cap is a bounded global top-k (the same budget as every other
    top-k cut in the retrieval family), and the model call is the cost
    center, not the exchange.
    """
    from alt_spark.functions.llm import make_reranker_udf

    # Deterministic per-id dedupe: a hybrid merge can carry the same id
    # with different incoming scores/texts, and dropDuplicates would
    # keep an arbitrary one (run-to-run nondeterminism). Keep the
    # best-scored row per id, text as the final tiebreak.
    explicit = incoming_score_col is not _UNSET_SCORE_COL
    score_col = (
        DEFAULT_SCORE_COL if not explicit else incoming_score_col
    )
    if explicit and score_col is not None and score_col not in candidates.columns:
        raise ValueError(
            f"incoming_score_col {score_col!r} is not a column of the "
            f"candidate frame ({candidates.columns}); the score-based "
            "max_candidates cap cannot run. Pass incoming_score_col=None to "
            "opt into the id-ordered fallback explicitly."
        )
    incoming_score_col = score_col
    has_score = bool(incoming_score_col) and incoming_score_col in candidates.columns
    order = (
        [F.desc(incoming_score_col), F.col(text_col)]
        if has_score
        else [F.col(text_col)]
    )
    w = Window.partitionBy(id_col).orderBy(*order)
    cand = (
        candidates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if has_score:
        # Server-side cap: only the best incoming candidates are sent
        # to the model (score desc, id asc — deterministic).
        cand = cand.orderBy(
            F.desc(incoming_score_col), F.col(id_col)
        ).limit(max_candidates)
    else:
        cand = cand.orderBy(F.col(id_col)).limit(max_candidates)
    scored = cand.select(
        F.col(id_col).alias("id"),
        make_reranker_udf(model)(
            F.lit(query), F.substring(F.col(text_col), 1, max_candidate_chars)
        ).alias("rerank_score"),
    )
    return scored.orderBy(F.desc("rerank_score"), "id").limit(k)
