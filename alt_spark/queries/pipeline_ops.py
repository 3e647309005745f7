"""Q27-Q33: LLM-data-pipeline declared queries (north-star pillar).

Built on the operator library (alt_spark.operators.dedup / ann,
alt_spark.functions.text_analysis). Oracle-backed where the semantics
are SQL-expressible; the MinHash/SimHash/winnowing queries are declared
without oracles (hash functions have no cross-engine twin) and are
instead property-tested against exact ground truth in
tests/test_pipeline_ops.py — the driver records their weaker rows-only
check, as SURVEY §2.Q declares for LSH candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alt_spark.catalog import load_table
from alt_spark.functions import text_analysis as ta
from alt_spark.operators import dedup
from alt_spark.queries import query

_DDB_TOKENS = "list_filter(string_split_regex(lower(text), '\\W+'), x -> x <> '')"
_EN = "('the','and','of','to','is','in','that','with')"


# ---------------------------------------------------------------------------
@query(
    "q27_quality_scores",
    oracle=f"""
WITH scored AS (
  SELECT source,
         length(text) AS n_chars,
         len({_DDB_TOKENS}) AS tok,
         len(list_filter({_DDB_TOKENS}, x -> x IN {_EN})) AS stop_hits,
         length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS alpha_chars
  FROM documents
), comp AS (
  SELECT source,
         0.3 * least(n_chars / 500.0, 1.0)
         + 0.2 * least(tok / 100.0, 1.0)
         + 0.2 * least(CAST(stop_hits AS DOUBLE) / greatest(tok, 1) * 4.0, 1.0)
         + 0.3 * (CAST(alpha_chars AS DOUBLE) / greatest(n_chars, 1)) AS quality,
         CAST(stop_hits AS DOUBLE) / greatest(tok, 1) AS stop_ratio
  FROM scored
)
SELECT source,
       count(*) AS n_docs,
       round(avg(quality), 4) AS avg_quality,
       round(avg(stop_ratio), 4) AS avg_stop_ratio
FROM comp
GROUP BY source
ORDER BY source
""",
)
def q27(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source document quality profile (north-star text analysis).

    Mirrors the reference's bounded weighted-component scoring
    (recap-worker select/scoring.rs:8-42) and validity signals
    (preprocess.rs:406-457) as one codegen'd expression — the shape a
    100 TB quality gate must have: a single scan, no Python.
    """
    docs = load_table(spark, sf, "documents")
    text = F.col("text")
    scored = docs.select(
        "source",
        ta.quality_score(text).alias("quality"),
        ta.stopword_ratio(text).alias("stop_ratio"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
            F.round(F.avg("stop_ratio"), 4).alias("avg_stop_ratio"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
@query(
    "q28_token_stats",
    oracle=f"""
WITH t AS (
  SELECT source,
         len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS ws_tok,
         len({_DDB_TOKENS}) AS word_tok,
         CAST(list_sum(list_transform({_DDB_TOKENS}, x -> length(x))) AS DOUBLE)
           / greatest(len({_DDB_TOKENS}), 1) AS avg_len
  FROM documents
)
SELECT source,
       CAST(sum(ws_tok) AS BIGINT) AS ws_tokens,
       CAST(sum(word_tok) AS BIGINT) AS word_tokens,
       round(avg(avg_len), 4) AS avg_token_len
FROM t
GROUP BY source
ORDER BY source
""",
)
def q28(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting per source: whitespace count vs tokenizer count
    plus mean token length (north-star token accounting; preprocess.rs
    :286-344 token stats)."""
    docs = load_table(spark, sf, "documents")
    text = F.col("text")
    per_doc = docs.select(
        "source",
        ta.whitespace_token_count(text).alias("ws_tok"),
        ta.word_token_count(text).alias("word_tok"),
        ta.avg_token_len(text).alias("avg_len"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.sum("ws_tok").cast("long").alias("ws_tokens"),
            F.sum("word_tok").cast("long").alias("word_tokens"),
            F.round(F.avg("avg_len"), 4).alias("avg_token_len"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
@query(
    "q29_lang_id",
    oracle=f"""
WITH votes AS (
  SELECT doc_id,
         len({_DDB_TOKENS}) AS n_tok,
         len(list_filter({_DDB_TOKENS}, x -> x IN {_EN})) AS v_en,
         len(list_filter({_DDB_TOKENS}, x -> x IN ('der','die','das','und','ist','nicht','mit','ein'))) AS v_de,
         len(list_filter({_DDB_TOKENS}, x -> x IN ('le','la','les','et','est','dans','que','une'))) AS v_fr,
         len(list_filter({_DDB_TOKENS}, x -> x IN ('el','la','los','que','es','en','una','por'))) AS v_es
  FROM documents
), pred AS (
  SELECT CASE
           WHEN n_tok < 3 OR greatest(v_en, v_de, v_fr, v_es) = 0 THEN NULL
           WHEN v_es > greatest(v_en, v_de, v_fr) THEN 'es'
           WHEN v_fr > greatest(v_en, v_de) THEN 'fr'
           WHEN v_de > v_en THEN 'de'
           ELSE 'en'
         END AS predicted
  FROM votes
)
SELECT coalesce(predicted, 'und') AS predicted, count(*) AS n_docs
FROM pred
GROUP BY 1
ORDER BY 1
""",
)
def q29(spark: SparkSession, sf: str) -> DataFrame:
    """Marker-vote language ID histogram with abstain gate (I3 analog,
    language_detection.rs:5-65 min-chars/min-confidence). The sequential
    argmax (later language wins only on strictly more votes) is encoded
    identically in both engines. Note the synthetic corpus is English-
    vocabulary for every `lang` label, so the histogram collapses to
    en/und — the operator contract, not the data, is what's declared.
    """
    docs = load_table(spark, sf, "documents")
    return (
        docs.select(F.coalesce(ta.lang_id(F.col("text")), F.lit("und")).alias("predicted"))
        .groupBy("predicted")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("predicted")
    )


# ---------------------------------------------------------------------------
@query("q30_minhash_neardup")  # no oracle: xxhash64 has no DuckDB twin (rows-only check)
def q30(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash+LSH near-duplicate pairs (I10/I12), est. Jaccard >= 0.7.

    128-perm signatures, 16 bands × 8 rows (threshold ≈ 0.5 per the
    reference's tuning, minhash.rs:83-124); pairs surface only through
    band-bucket equi-joins. Exactness is property-tested against the
    true shingle Jaccard (tests/test_pipeline_ops.py): every planted
    >=0.9 pair is found, estimates within ±0.15.
    """
    docs = load_table(spark, sf, "documents")
    pairs = dedup.minhash_near_dup(docs, threshold=0.7)
    return pairs.select(
        "id1", "id2", F.round("est_jaccard", 4).alias("est_jaccard")
    ).orderBy(F.desc("est_jaccard"), "id1", "id2")


# ---------------------------------------------------------------------------
@query("q31_simhash_neardup")  # no oracle: xxhash64-based fingerprint (rows-only check)
def q31(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming <= 3 of 64 bits) via pigeonhole
    block join — the token-weight fingerprint complement to MinHash
    (north-star dedup family; I8/I9 generalization)."""
    docs = load_table(spark, sf, "documents")
    return dedup.simhash_near_dup(docs).orderBy("hamming", "id1", "id2")


# ---------------------------------------------------------------------------
@query(
    "q32_embedding_neardup",
    oracle="""
WITH ex AS (
  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS val,
         generate_subscripts(embedding, 1) AS idx FROM embeddings
), pairs AS (
  SELECT a.vec_id AS id1, b.vec_id AS id2, a.label AS label,
         sum(a.val * b.val) / (sqrt(sum(a.val * a.val)) * sqrt(sum(b.val * b.val))) AS cos_sim
  FROM ex a JOIN ex b ON a.idx = b.idx AND a.label = b.label AND a.vec_id < b.vec_id
  GROUP BY 1, 2, 3
)
SELECT id1, id2, label, round(cos_sim, 6) AS cos_sim
FROM pairs
WHERE round(cos_sim, 6) >= 0.4
ORDER BY cos_sim DESC, id1, id2
LIMIT 20
""",
)
def q32(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by label (⊕ J11).

    Same-label blocking is the semantic analog of LSH bucketing: the
    quadratic join runs per block, never across the corpus — the 100 TB
    form replaces `label` with SRP buckets (operators.ann). Exact cosine
    via the relational decomposition, threshold compared on rounded
    values on both engines.
    """
    emb = load_table(spark, sf, "embeddings")
    ex = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("idx", "fval")
    ).select("vec_id", "label", "idx", F.col("fval").cast("double").alias("val"))
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.idx") == F.col("b.idx"))
            & (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .groupBy(
            F.col("a.vec_id").alias("id1"),
            F.col("b.vec_id").alias("id2"),
            F.col("a.label").alias("label"),
        )
        .agg(
            (
                F.sum(F.col("a.val") * F.col("b.val"))
                / (
                    F.sqrt(F.sum(F.col("a.val") * F.col("a.val")))
                    * F.sqrt(F.sum(F.col("b.val") * F.col("b.val")))
                )
            ).alias("cos_sim")
        )
    )
    return (
        pairs.select("id1", "id2", "label", F.round("cos_sim", 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.4)
        .orderBy(F.desc("cos_sim"), "id1", "id2")
        .limit(20)
    )


# ---------------------------------------------------------------------------
@query("q33_winnowing_fingerprints")  # no oracle: xxhash64 rolling hash (rows-only check)
def q33(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing fingerprint density per source (north-star document
    fingerprinting): k=5 char-grams, window 4 — shared substrings of
    length >= 8 guarantee shared fingerprints (property-tested)."""
    docs = load_table(spark, sf, "documents")
    fp = ta.winnowing_fingerprints(docs).join(
        docs.select(F.col("doc_id").alias("id"), "source"), "id"
    )
    return (
        fp.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size("fingerprints")).cast("long").alias("fingerprints"),
        )
        .orderBy("source")
    )
