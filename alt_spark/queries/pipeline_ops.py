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
from alt_spark.functions.hashing import DDB_H60 as _h60
from alt_spark.functions.hashing import DDB_U64 as _u64
from alt_spark.functions.text_analysis import DDB_TOKENS as _DDB_TOKENS
from alt_spark.operators import dedup
from alt_spark.plans import dfcache as _dfcache
from alt_spark.queries import query
from alt_spark.queries.planted import values_sql as _values_sql
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
         {ta.ddb_bpe_pretoken_count('text')} AS bpe_tok,
         CAST(list_sum(list_transform({_DDB_TOKENS}, x -> length(x))) AS DOUBLE)
           / greatest(len({_DDB_TOKENS}), 1) AS avg_len
  FROM documents
)
SELECT source,
       CAST(sum(ws_tok) AS BIGINT) AS ws_tokens,
       CAST(sum(word_tok) AS BIGINT) AS word_tokens,
       CAST(sum(bpe_tok) AS BIGINT) AS bpe_tokens,
       round(avg(avg_len), 4) AS avg_token_len
FROM t
GROUP BY source
ORDER BY source
""",
)
def q28(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting per source: whitespace count, tokenizer count and
    GPT-2-style BPE pre-token count, plus mean token length (north-star
    token accounting; preprocess.rs:286-344 token stats). The BPE column
    is the model-token budgeting proxy — identical regex both engines."""
    docs = load_table(spark, sf, "documents")
    text = F.col("text")
    per_doc = docs.select(
        "source",
        ta.whitespace_token_count(text).alias("ws_tok"),
        ta.word_token_count(text).alias("word_tok"),
        ta.bpe_pretoken_count(text).alias("bpe_tok"),
        ta.avg_token_len(text).alias("avg_len"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.sum("ws_tok").cast("long").alias("ws_tokens"),
            F.sum("word_tok").cast("long").alias("word_tokens"),
            F.sum("bpe_tok").cast("long").alias("bpe_tokens"),
            F.round(F.avg("avg_len"), 4).alias("avg_token_len"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q29's JA/ZH probe rows: the synthetic corpus is ASCII-only, so CJK
# script voting is exercised by a deterministic literal extension of the
# corpus, identical in both engines (VALUES there, createDataFrame here).
# NEGATIVE ids — fixed positive ids would collide with generated
# doc_ids once the corpus grows past them (the q75/r6-ADVICE hazard
# class); the canary test_q75_planted_ids_cannot_collide pins generated
# ids non-negative.
_Q29_EXTRA: tuple[tuple[int, str], ...] = (
    (-11, "これはテストです。日本語の文章を書いています。とても楽しいです。"),
    (-12, "スパークで大規模なデータを処理します。速い処理が必要です。"),
    (-13, "这是一个测试文档只有汉字没有假名所以是中文。"),
    (-14, "ok"),
)


def _q29_oracle() -> str:
    """Generate the oracle from the SAME lang_data tables the engine
    votes with — markers, script ranges and vote order have one source."""
    from alt_spark.functions.lang_data import MARKERS, SCRIPTS

    def marker_votes(lang: str) -> str:
        lst = ",".join(f"'{m}'" for m in MARKERS[lang])
        return f"len(list_filter({_DDB_TOKENS}, x -> x IN ({lst}))) AS v_{lang}"

    def script_chars(lang: str) -> str:
        cls = "".join(
            f"\\x{{{a:04x}}}-\\x{{{b:04x}}}" for a, b in SCRIPTS[lang]["ranges"]
        )
        return (
            f"length(text) - length(regexp_replace(text, '[{cls}]', '', 'g'))"
            f" AS c_{lang}"
        )

    def effective(lang: str) -> str:
        v = f"c_{lang}"
        for other in SCRIPTS[lang]["unless"]:
            v = f"(CASE WHEN c_{other} = 0 THEN {v} ELSE 0 END)"
        return v

    marker_cols = ",\n         ".join(marker_votes(x) for x in MARKERS)
    script_cols = ",\n         ".join(script_chars(x) for x in SCRIPTS)
    # Sequential argmax, unrolled back-to-front: a language wins only on
    # strictly more votes than every earlier language (VOTE_ORDER).
    order = [(f"v_{x}" if x in MARKERS else effective(x)) for x in (*MARKERS, *SCRIPTS)]
    names = [*MARKERS, *SCRIPTS]
    branches = []
    for i in range(len(order) - 1, 0, -1):
        earlier = ", ".join(order[:i])
        branches.append(f"WHEN {order[i]} > greatest({earlier}) THEN '{names[i]}'")
    branch_sql = "\n           ".join(branches)
    all_votes = ", ".join(order)
    script_total = " + ".join(f"c_{x}" for x in SCRIPTS)
    values = ",\n    ".join(f"({i}, '{t}')" for i, t in _Q29_EXTRA)
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT * FROM (VALUES
    {values}
  ) t(doc_id, text)
), votes AS (
  SELECT doc_id,
         len({_DDB_TOKENS}) AS n_tok,
         {marker_cols},
         {script_cols}
  FROM corpus
), pred AS (
  SELECT CASE
           WHEN (n_tok < 3 AND {script_total} < 3)
             OR greatest({all_votes}) = 0 THEN NULL
           {branch_sql}
           ELSE '{names[0]}'
         END AS predicted
  FROM votes
)
SELECT coalesce(predicted, 'und') AS predicted, count(*) AS n_docs
FROM pred
GROUP BY 1
ORDER BY 1
"""


@query("q29_lang_id", oracle=_q29_oracle())
def q29(spark: SparkSession, sf: str) -> DataFrame:
    """Language-ID histogram with abstain gate (I3,
    language_detection.rs:5-65 min-chars/min-confidence): token-level
    marker votes for space-delimited languages plus character-level
    script votes for CJK — kana chars vote ja, han votes zh only without
    kana, matching the reference's EN/JA-first gate. The sequential
    argmax (later language wins only on strictly more votes) and the
    vote tables themselves (functions/lang_data.py) feed both engines
    from one source.
    """
    from alt_spark.functions.text_analysis import lang_id

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    extra = spark.createDataFrame(list(_Q29_EXTRA), "doc_id long, text string")
    corpus = docs.unionByName(extra)
    # Per-row lang_id() expression, NOT the explode+groupBy aggregation
    # shape: measured at sf0.1, the narrow per-row form (a few tokenizer
    # re-evaluations inside whole-stage codegen, zero shuffles) runs the
    # vote scan in ~0.9 s where the exploded token rows + hash aggregate
    # cost ~3.2 s — the shuffle of one row per token dominates everything
    # else. Script counts use regexp_count (single scan, no replaced-
    # string allocation). The round-3 comment claiming the opposite
    # measured only projection-collapse re-evaluation, not the explode
    # shuffle it bought instead.
    pred = corpus.select(
        F.coalesce(lang_id(F.col("text")), F.lit("und")).alias("predicted")
    )
    return pred.groupBy("predicted").agg(F.count("*").alias("n_docs")).orderBy("predicted")


# ---------------------------------------------------------------------------
def _minhash_pair_ctes() -> str:
    """The MinHash+LSH pipeline as a reusable CTE chain (through `est`):
    md5-based base hash, Spark's wrapping ``h*a_i + b_i`` affine
    permutations done exactly in HUGEINT (functions/hashing.py:
    ddb_affine_signed), min per permutation as SIGNED 64-bit (matching
    Spark long ordering), band keys as comma-joined signature slices,
    candidate pairs from the band equi-join, and the agreement-fraction
    Jaccard estimate. Shared by q30 (pair surface) and q73 (cluster
    surface on top of the same pairs)."""
    from alt_spark.functions.hashing import ddb_affine_signed
    from alt_spark.operators.dedup import _PERM_A, _PERM_B

    min_cols = ",\n         ".join(
        f"min({ddb_affine_signed('h', _PERM_A[i], _PERM_B[i])}) AS m{i}"
        for i in range(128)
    )
    sig_list = ", ".join(f"m{i}" for i in range(128))
    band_keys = ", ".join(
        f"array_to_string(sig[{b * 8 + 1}:{b * 8 + 8}], ',')" for b in range(16)
    )
    return f"""toks AS (
  SELECT doc_id AS id, {_DDB_TOKENS} AS t FROM documents
), sh AS (
  SELECT DISTINCT id, t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS sh
  FROM toks, unnest(range(len(t)-2)) u(i)
  WHERE len(t) >= 3
), hashed AS (
  SELECT id, {_h60('sh')} AS h FROM sh
), mins AS (
  SELECT id,
         {min_cols}
  FROM hashed GROUP BY id
), sig AS (
  SELECT id, [{sig_list}] AS sig FROM mins
), banded AS (
  SELECT id, b AS band, ([{band_keys}])[b + 1] AS key
  FROM sig, unnest(range(16)) r(b)
), cand AS (
  SELECT DISTINCT a.id AS id1, b.id AS id2
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.id < b.id
), est AS (
  SELECT id1, id2,
         list_sum(list_transform(range(1, 129),
                  i -> CASE WHEN s1.sig[i] = s2.sig[i] THEN 1 ELSE 0 END))
           / 128.0 AS est_jaccard
  FROM cand
  JOIN sig s1 ON s1.id = cand.id1
  JOIN sig s2 ON s2.id = cand.id2
)"""


def _q30_oracle() -> str:
    return f"""
WITH {_minhash_pair_ctes()}
SELECT id1, id2, round(est_jaccard, 4) AS est_jaccard
FROM est
WHERE est_jaccard >= 0.7
ORDER BY est_jaccard DESC, id1, id2
"""


@query("q30_minhash_neardup", oracle=_q30_oracle())
def q30(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash+LSH near-duplicate pairs (I10/I12), est. Jaccard >= 0.7.

    128-perm signatures, 16 bands × 8 rows (threshold ≈ 0.5 per the
    reference's tuning, minhash.rs:83-124); pairs surface only through
    band-bucket equi-joins. Exactness is property-tested against the
    true shingle Jaccard (tests/test_pipeline_ops.py): every planted
    >=0.9 pair is found, estimates within ±0.15. Declared with the
    portable md5 base hash + plain-string band keys so every stage
    hash-matches the DuckDB oracle; the xxhash64 production default
    stays the scale path (narrower shuffle keys).
    """
    docs = load_table(spark, sf, "documents")
    pairs = dedup.minhash_near_dup(docs, threshold=0.7, portable=True)
    return pairs.select(
        "id1", "id2", F.round("est_jaccard", 4).alias("est_jaccard")
    ).orderBy(F.desc("est_jaccard"), "id1", "id2")


# ---------------------------------------------------------------------------
def _simhash_pair_ctes() -> str:
    """SimHash replayed in DuckDB SQL, as a composable WITH-body
    fragment (CTE names ``s_``-prefixed so it unions cleanly with the
    MinHash chain in the q118 ensemble oracle). Bit i of the token hash
    comes off the UNSIGNED md5 value with a logical shift (identical to
    Spark's arithmetic shiftright + &1 on the signed twin); the
    fingerprint is assembled from inlined 2^i literals (HUGEINT <<
    overflows in DuckDB) and re-signed for the XOR/bit_count Hamming
    check. Ends at ``s_cand(id1, id2, h1, h2)``."""
    fp_terms = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN {1 << i}::HUGEINT ELSE 0::HUGEINT END)"
        for i in range(64)
    )
    bit_cols = ",\n         ".join(
        f"sum(CASE WHEN (u >> {i}) & 1 = 1 THEN tf ELSE -tf END) AS b{i}"
        for i in range(64)
    )
    block_vals = ", ".join(f"(ufp >> {b * 16}) & 65535" for b in range(4))
    return f"""s_tok AS (
  SELECT doc_id AS id, unnest({_DDB_TOKENS}) AS tok FROM documents
), s_tf AS (
  SELECT id, tok, count(*) AS tf FROM s_tok GROUP BY 1, 2
), s_h AS (
  SELECT id, tf, {_u64('tok')} AS u FROM s_tf
), s_bitsums AS (
  SELECT id,
         {bit_cols}
  FROM s_h GROUP BY id
), s_fp AS (
  SELECT id,
         ({fp_terms}) AS hfp
  FROM s_bitsums
), s_signed_fp AS (
  SELECT id,
         hfp::UBIGINT AS ufp,
         (CASE WHEN hfp >= 9223372036854775808::HUGEINT
               THEN (hfp - 18446744073709551616::HUGEINT)::BIGINT
               ELSE hfp::BIGINT END) AS sfp
  FROM s_fp
), s_blocks AS (
  SELECT id, sfp, b AS block, ([{block_vals}])[b + 1] AS bval
  FROM s_signed_fp, unnest(range(4)) r(b)
), s_cand AS (
  SELECT DISTINCT a.id AS id1, b.id AS id2, a.sfp AS h1, b.sfp AS h2
  FROM s_blocks a JOIN s_blocks b
    ON a.block = b.block AND a.bval = b.bval AND a.id < b.id
)"""


def _q31_oracle() -> str:
    return f"""
WITH {_simhash_pair_ctes()}
SELECT id1, id2, bit_count(xor(h1, h2)) AS hamming
FROM s_cand
WHERE bit_count(xor(h1, h2)) <= 3
ORDER BY hamming, id1, id2
"""


@query("q31_simhash_neardup", oracle=_q31_oracle())
def q31(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming <= 3 of 64 bits) via pigeonhole
    block join — the token-weight fingerprint complement to MinHash
    (north-star dedup family; I8/I9 generalization). Declared with the
    portable md5 token hash so the full pipeline — weighted bit sums,
    fingerprint assembly, block join, Hamming verify — hash-matches the
    DuckDB oracle; production default stays xxhash64."""
    docs = load_table(spark, sf, "documents")
    return dedup.simhash_near_dup(docs, portable=True).orderBy("hamming", "id1", "id2")


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
    # Vector-level pair join: the label equi-join makes one row per
    # candidate pair and the cosine is a single codegen'd fold over the
    # two arrays. The relational alternative (posexplode to dim rows,
    # join on idx, re-group per pair) shuffles pairs x dims rows — 64x
    # more — for the same answer; the oracle keeps that decomposition
    # because DuckDB lacks a float-array fold with matching semantics.
    dot = lambda u, w: F.aggregate(  # noqa: E731
        F.zip_with(u, w, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    # Norms are per-vector, so compute them once before the pair join —
    # the join then does ONE fold per pair instead of three.
    vec = emb.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v"))))
    a, b = vec.alias("a"), vec.alias("b")
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("id1"),
        F.col("b.vec_id").alias("id2"),
        F.col("a.label").alias("label"),
        (dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))).alias(
            "cos_sim"
        ),
    )
    return (
        pairs.select("id1", "id2", "label", F.round("cos_sim", 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.4)
        .orderBy(F.desc("cos_sim"), "id1", "id2")
        .limit(20)
    )


# ---------------------------------------------------------------------------
@query(
    "q33_winnowing_fingerprints",
    oracle=f"""
WITH g AS (
  SELECT doc_id AS id, i - 1 AS pos, {_h60("substr(text, i, 5)")} AS h
  FROM documents, unnest(range(1, greatest(length(text) - 3, 1))) u(i)
  WHERE length(text) >= 5
), w AS (
  SELECT id, pos,
         min(h) OVER (PARTITION BY id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wm,
         count(*) OVER (PARTITION BY id) AS n_grams
  FROM g
), fp AS (
  SELECT id, count(DISTINCT wm) AS n_fp
  FROM w WHERE pos <= n_grams - 4
  GROUP BY id
)
SELECT d.source AS source,
       count(*) AS n_docs,
       CAST(coalesce(sum(coalesce(fp.n_fp, 0)), 0) AS BIGINT) AS fingerprints
FROM documents d LEFT JOIN fp ON fp.id = d.doc_id
GROUP BY 1
ORDER BY 1
""",
)
def q33(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing fingerprint density per source (north-star document
    fingerprinting): k=5 char-grams, window 4 — shared substrings of
    length >= 8 guarantee shared fingerprints (property-tested).

    Declared with the portable md5 gram hash so DuckDB replays the exact
    pipeline (hash → sliding min → distinct count); production default
    stays xxhash64 (functions/hashing.py docstring has the trade-off).
    """
    docs = load_table(spark, sf, "documents")
    # LEFT join from documents so docs too short to fingerprint (<5 chars,
    # or <4 grams) still count toward n_docs with 0 fingerprints — the
    # oracle's LEFT JOIN + coalesce(0) contract. An inner join here would
    # silently drop short docs (and whole sources of short docs) the
    # moment the data contains any.
    # portable_hex: q33 only COUNTS fingerprints (size of the in-row
    # distinct array), so the 15-hex-char representation — numeric-
    # order-equivalent by fixed-width bijection — skips the conv parse
    # (~12% of the pass, see winnowing_fingerprints docstring).
    fp = ta.winnowing_fingerprints(docs, portable=True, portable_hex=True)
    joined = docs.select(F.col("doc_id").alias("id"), "source").join(fp, "id", "left")
    return (
        joined.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.coalesce(F.sum(F.coalesce(F.size("fingerprints"), F.lit(0))), F.lit(0))
            .cast("long")
            .alias("fingerprints"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
@query(
    "q40_bm25_multiterm",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({_DDB_TOKENS}) AS token FROM documents
), doclen AS (
  SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1
), stats AS (
  SELECT count(*) AS n, avg(dl) AS avgdl FROM doclen
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tok
  WHERE token IN ('dup', 'vector', 'stream') GROUP BY 1, 2
), dfreq AS (
  SELECT token, count(*) AS df FROM tf GROUP BY 1
), per_term AS (
  SELECT tf.doc_id,
         ln(1.0 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * tf.tf * 2.2
           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * doclen.dl / stats.avgdl)) AS term_score
  FROM tf
  JOIN dfreq ON tf.token = dfreq.token
  JOIN doclen ON tf.doc_id = doclen.doc_id
  CROSS JOIN stats
)
SELECT doc_id AS id, round(sum(term_score), 6) AS score
FROM per_term
GROUP BY 1
ORDER BY score DESC, id
LIMIT 10
""",
)
def q40(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-term BM25 ranking — the tsvector-free full-text relevance
    semantic (J2 features.rs:327-344 + J10 hybrid_search_repo.go:78's
    ts_rank_cd slot). Per-term Okapi scores sum over the bag-of-terms
    query; matching rows are df-bounded before any join."""
    from alt_spark.operators.search import bm25_rank

    docs = load_table(spark, sf, "documents")
    return bm25_rank(docs, ["dup", "vector", "stream"])


# ---------------------------------------------------------------------------
@query(
    "q41_keyword_extraction",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({_DDB_TOKENS}) AS token FROM documents
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2
), dfreq AS (
  SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1
), n AS (
  SELECT count(*) AS n FROM documents
), scored AS (
  SELECT tf.doc_id AS id, tf.token,
         round(tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df), 6) AS tfidf
  FROM tf JOIN dfreq ON tf.token = dfreq.token CROSS JOIN n
), ranked AS (
  SELECT id, token, tfidf,
         row_number() OVER (PARTITION BY id ORDER BY tfidf DESC, token) AS rank
  FROM scored
)
SELECT id, token, rank, tfidf
FROM ranked
WHERE rank <= 3 AND id < 10
ORDER BY id, rank
""",
)
def q41(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document, first 10 docs (I13 —
    tag-generator extract.py:207-274's KeyBERT extraction, declared as
    the TF-IDF proxy per SURVEY §2). Per-doc row_number windows are
    vocabulary-bounded."""
    from alt_spark.operators.search import tfidf_keywords

    docs = load_table(spark, sf, "documents")
    return (
        tfidf_keywords(docs, k=3)
        .filter(F.col("id") < 10)
        .orderBy("id", "rank")
    )


# ---------------------------------------------------------------------------
# Production-hash twins of q30/q31/q33 (VERDICT r2 item 4): the oracle
# rows above pay an honest md5/plain-band-key parity tax; these run the
# xxhash64 defaults that actually ship, as rows-only declarations (no
# cross-engine twin exists for xxhash64), so BENCH records the number
# the production path gets. Correctness of the production path itself
# is pytest-enforced (tests/test_hash_equivalence.py): identical
# MinHash pair sets across hash families, SimHash blocking == all-pairs
# Hamming ground truth per family, winnowing empty-set parity.
@query("q53_minhash_production")
def q53(spark: SparkSession, sf: str) -> DataFrame:
    """q30's MinHash+LSH near-dup with the production hash family:
    xxhash64 base hash and hashed band keys (~20× narrower shuffle rows
    than the portable plain-string keys — operators/dedup.py:193)."""
    docs = load_table(spark, sf, "documents")
    pairs = dedup.minhash_near_dup(docs, threshold=0.7, portable=False)
    return pairs.select(
        "id1", "id2", F.round("est_jaccard", 4).alias("est_jaccard")
    ).orderBy(F.desc("est_jaccard"), "id1", "id2")


@query("q54_simhash_production")
def q54(spark: SparkSession, sf: str) -> DataFrame:
    """q31's SimHash near-dup with the production xxhash64 token hash."""
    docs = load_table(spark, sf, "documents")
    return dedup.simhash_near_dup(docs, portable=False).orderBy(
        "hamming", "id1", "id2"
    )


@query("q55_winnowing_production")
def q55(spark: SparkSession, sf: str) -> DataFrame:
    """q33's winnowing fingerprint density with the production xxhash64
    gram hash (~2× cheaper than the portable md5 chain)."""
    docs = load_table(spark, sf, "documents")
    fp = ta.winnowing_fingerprints(docs, portable=False)
    joined = docs.select(F.col("doc_id").alias("id"), "source").join(fp, "id", "left")
    return (
        joined.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.coalesce(F.sum(F.coalesce(F.size("fingerprints"), F.lit(0))), F.lit(0))
            .cast("long")
            .alias("fingerprints"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
def _cc_closure_ctes(
    pairs_sql: str = "SELECT id1, id2 FROM est WHERE est_jaccard >= 0.7",
) -> str:
    """The connected-components closure over a pair set (pairs ->
    undirected edges -> recursive reach -> comp = min-label) — shared
    verbatim by the q73 and q77 oracles so a threshold or closure fix
    cannot silently diverge their cluster membership; q118 passes the
    ensemble union as ``pairs_sql``."""
    return f"""pairs AS (
  {pairs_sql}
), und AS (
  SELECT id1 AS a, id2 AS b FROM pairs
  UNION ALL
  SELECT id2 AS a, id1 AS b FROM pairs
), reach AS (
  SELECT a AS id, a AS r FROM und
  UNION
  SELECT u.b AS id, reach.r FROM reach JOIN und u ON u.a = reach.id
), comp AS (
  SELECT id, min(r) AS comp FROM reach GROUP BY id
)"""


def _q73_oracle() -> str:
    """q30's pair chain + recursive min-label closure: reach(id, r)
    enumerates every (node, node-that-reaches-it) over the undirected
    pair graph (UNION dedups, so recursion terminates), and min(r) per
    node is the component's canonical id — the same representative the
    Spark side's min-label propagation converges to."""
    return f"""
WITH RECURSIVE {_minhash_pair_ctes()},
{_cc_closure_ctes()}
SELECT comp AS cluster_id,
       count(*) AS n_docs,
       CAST(sum(id) AS BIGINT) AS id_checksum,
       count(*) - 1 AS n_dropped
FROM comp
GROUP BY comp
ORDER BY cluster_id
"""


@query("q73_neardup_clusters", oracle=_q73_oracle())
def q73(spark: SparkSession, sf: str) -> DataFrame:
    """Near-duplicate CLUSTER canonicalization: connected components
    over the q30 MinHash pair graph, reported per cluster (canonical =
    min doc_id, member checksum, drop count). Pairs are not a
    keep-decision — transitive groups are: A~B and B~C must yield ONE
    survivor for {A,B,C}, which pair-level output cannot express. The
    reference stops at pair similarity (minhash.rs); this is the
    production step above it (operators/graph.connected_components —
    alternating min-propagation + pointer jumping, O(log n) rounds).

    The id_checksum pins exact cluster MEMBERSHIP cross-engine (the
    oracle replays the closure with a recursive CTE), so a missed
    transitive merge or an over-merge fails the hash even when cluster
    counts happen to agree.

    Plan note: cluster formation is iterative (one keyed join + min
    aggregation per round, lineage truncated each round) — the loop
    runs actions during construction, so this query is excluded from
    the plan-only audit fixture alongside q69.
    """
    from alt_spark.operators.graph import connected_components

    docs = load_table(spark, sf, "documents")
    pairs = dedup.minhash_near_dup(docs, threshold=0.7, portable=True)
    cc = connected_components(pairs)
    return (
        cc.groupBy(F.col("comp").alias("cluster_id"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("id").alias("id_checksum"),
            (F.count("*") - F.lit(1)).alias("n_dropped"),
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
_SPLIT_SALT = "split-v1"


def _q77_oracle() -> str:
    from alt_spark.operators.mixing import ddb_split_assignment

    return f"""
WITH RECURSIVE {_minhash_pair_ctes()},
{_cc_closure_ctes()}, grp AS (
  SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS gid
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
), assigned AS (
  SELECT doc_id, gid, {ddb_split_assignment('gid', _SPLIT_SALT)} AS split
  FROM grp
)
SELECT split,
       count(*) AS n_docs,
       count(DISTINCT gid) AS n_groups,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM assigned
GROUP BY split
ORDER BY split
"""


@query("q77_leakage_free_splits", oracle=_q77_oracle())
def q77(spark: SparkSession, sf: str) -> DataFrame:
    """Leakage-free train/val/test assignment: split by near-dup
    CLUSTER, not by document. Splitting on raw doc ids leaks — a
    training doc's near-duplicate lands in the eval set and the
    benchmark is partially memorized (the within-corpus sibling of
    q62's benchmark decontamination). Here every document carries its
    q73 connected-component label (its own id when unclustered), and
    the salted-hash split (operators/mixing.split_assignment, 90/5/5)
    is a function of the GROUP id — members of a cluster can never
    straddle splits, pytest-enforced as a property over the actual
    pair set.

    The id_checksum pins exact split MEMBERSHIP cross-engine: the
    oracle replays the closure (recursive CTE) and the md5 split
    decision per group, so a wrong cluster merge or a doc-keyed (leaky)
    split fails the hash even when split sizes look right.

    Scale shape: pair generation and clustering are q73's (banded
    equi-joins, O(log n) CC rounds); the split itself is one md5 per
    row at scan speed, deterministic under retries, and the base-corpus
    form composes with the incremental index
    (graph.connected_components_incremental) so a daily batch re-splits
    only touched components. Plan note: excluded from the plan-only
    audit fixture alongside q73 — constructing the frame runs the CC
    convergence loop.
    """
    from alt_spark.operators.graph import connected_components
    from alt_spark.operators.mixing import split_assignment

    docs = load_table(spark, sf, "documents")
    pairs = dedup.minhash_near_dup(docs, threshold=0.7, portable=True)
    cc = connected_components(pairs)
    grp = (
        docs.select("doc_id")
        .join(cc.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select("doc_id", F.coalesce("comp", "doc_id").alias("gid"))
    )
    assigned = grp.select(
        "doc_id", "gid", split_assignment("gid", _SPLIT_SALT).alias("split")
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("gid").alias("n_groups"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
def _q81_oracle() -> str:
    return f"""
WITH RECURSIVE {_minhash_pair_ctes()},
{_cc_closure_ctes()}, sized AS (
  SELECT doc_id, len({_DDB_TOKENS}) AS n_tok FROM documents
), member AS (
  SELECT c.comp AS cluster_id, c.id AS doc_id, s.n_tok
  FROM comp c JOIN sized s ON s.doc_id = c.id
), ranked AS (
  SELECT cluster_id, doc_id, n_tok,
         row_number() OVER (
           PARTITION BY cluster_id ORDER BY n_tok DESC, doc_id
         ) AS rn
  FROM member
)
SELECT cluster_id,
       count(*) AS n_docs,
       CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS rep_id,
       CAST(max(CASE WHEN rn = 1 THEN n_tok END) AS BIGINT) AS rep_tok,
       CAST(sum(CASE WHEN rn > 1 THEN n_tok ELSE 0 END) AS BIGINT)
         AS dropped_tok
FROM ranked
GROUP BY cluster_id
ORDER BY cluster_id
"""


@query("q81_cluster_representatives", oracle=_q81_oracle())
def q81(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-aware cluster representative selection: within each
    near-dup cluster (q73's connected components), KEEP the
    highest-content member (most tokens; ties → lowest doc_id) instead
    of the min-id member — the production dedup policy when members
    differ (a syndicated copy may be truncated; min-id keeps whichever
    arrived first, this keeps the fullest text). Reports per cluster
    the representative, member count, and the token mass the drop
    decision discards.

    The oracle replays the full chain — pair graph, recursive-CTE
    closure (shared verbatim with q73/q77), per-cluster argmax with the
    same tie order — so a wrong merge OR a wrong representative fails
    the hash.

    Scale shape: the pair frame and converged labels are the CACHED
    q73 artifacts (operators/dedup._PAIR_CACHE / graph._CC_CACHE — one
    signing + closure per suite run); the selection itself is one
    broadcast-scale join (labels are cluster members only) plus a
    window partitioned by cluster id — clusters are near-dup groups,
    bounded small by construction. Plan note: excluded from the
    plan-only audit fixture alongside q73/q77 — constructing the frame
    runs the CC convergence loop.
    """
    from alt_spark.operators.graph import connected_components
    from pyspark.sql.window import Window

    docs = load_table(spark, sf, "documents")
    pairs = dedup.minhash_near_dup(docs, threshold=0.7, portable=True)
    cc = connected_components(pairs)
    sized = docs.select(
        "doc_id", F.size(dedup.tokens_col("text")).alias("n_tok")
    )
    member = (
        cc.select(
            F.col("comp").alias("cluster_id"), F.col("id").alias("doc_id")
        )
        .join(sized, "doc_id")
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n_tok"), "doc_id")
    ranked = member.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("rep_id"),
            F.max(F.when(F.col("rn") == 1, F.col("n_tok")))
            .cast("long")
            .alias("rep_tok"),
            F.sum(
                F.when(F.col("rn") > 1, F.col("n_tok")).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("dropped_tok"),
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
def _q90_oracle() -> str:
    return f"""
WITH {_minhash_pair_ctes()}, pairs AS (
  SELECT id1, id2 FROM est WHERE est_jaccard >= 0.7
), src AS (
  SELECT doc_id, source FROM documents
)
SELECT least(s1.source, s2.source) AS source_a,
       greatest(s1.source, s2.source) AS source_b,
       count(*)::BIGINT AS n_pairs,
       sum(p.id1 + p.id2)::BIGINT AS pair_id_checksum
FROM pairs p
JOIN src s1 ON s1.doc_id = p.id1
JOIN src s2 ON s2.doc_id = p.id2
GROUP BY source_a, source_b
ORDER BY source_a, source_b
"""


@query("q90_cross_source_dup_matrix", oracle=_q90_oracle())
def q90(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-source duplication matrix: near-duplicate pair counts
    aggregated by canonically-ordered source pair — the corpus
    governance report behind licensing audits ("which feeds syndicate
    which") and mixing decisions (a source pair with massive overlap
    double-counts its weight in q59/q74 plans). The id-sum checksum
    pins the exact pair SET per cell, not just its size.

    Scale shape: rides the SAME MinHash pair frame as q30/q73/q77 —
    the banded equi-join runs once per session (operators/dedup
    _PAIR_CACHE, input-fingerprint keyed) and this query adds only two
    doc_id equi-joins against a two-column source projection plus a
    |sources|^2-bounded aggregate. At 100 TB the matrix is a metadata
    query over the already-materialized pair table.
    """
    docs = load_table(spark, sf, "documents")
    pairs = dedup.minhash_near_dup(docs, threshold=0.7, portable=True).select(
        "id1", "id2"
    )
    src1 = docs.select(
        F.col("doc_id").alias("id1"), F.col("source").alias("s1")
    )
    src2 = docs.select(
        F.col("doc_id").alias("id2"), F.col("source").alias("s2")
    )
    return (
        pairs.join(src1, "id1")
        .join(src2, "id2")
        .select(
            F.least("s1", "s2").alias("source_a"),
            F.greatest("s1", "s2").alias("source_b"),
            (F.col("id1") + F.col("id2")).alias("psum"),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum("psum").cast("long").alias("pair_id_checksum"),
        )
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# q95: substring-grain duplication coverage (Lee et al. 2021). The
# natural corpus carries the generator's planted near-duplicates;
# negative-id rows pin the exact merge shapes: a 12-token run shared
# by two docs (overlapping windows must merge to 12, not 5*8), an
# intra-document repeat (two disjoint islands), a sub-width page, and
# a fully unique page.
_SPAN_W = 8
_SPAN12 = " ".join(f"wq{i}" for i in range(1, 13))
_REP8 = " ".join(f"rp{i}" for i in range(1, 9))
_SPAN_EXTRA: tuple[tuple[int, str], ...] = (
    (-91, f"qq91a qq91b qq91c {_SPAN12} qq91d qq91e"),
    (-92, f"qq92a {_SPAN12} qq92b qq92c qq92d qq92e qq92f"),
    (-93, f"{_REP8} qq93a qq93b {_REP8}"),
    (-94, "sv1 sv2 sv3 sv4 sv5 sv6 sv7"),
    (-95, " ".join(f"uu{i}" for i in range(1, 31))),
)


# One planted-extras frame PER SESSION: two createDataFrame calls over
# identical rows canonicalize to DIFFERENT plans (fresh LocalRelation
# attribute ids), which would split q95's/q97's/q100's corpus plans and
# defeat the shared _SPAN_DUP_CACHE entry. Reusing the same DataFrame
# object keeps the union plans semantically equal, so the
# duplicated-gram-key aggregate runs once per suite. Single-slot on
# purpose (review finding): a dict keyed by id(spark) would pin every
# stopped session's JVM handles for the process lifetime — one live
# slot is all the sharing needs, and a session switch just rebuilds a
# five-row frame.
_SPAN_EXTRA_MEMO: list[tuple[SparkSession, DataFrame]] = []


def _span_extra_df(spark: SparkSession) -> DataFrame:
    if _SPAN_EXTRA_MEMO and _SPAN_EXTRA_MEMO[0][0] is spark:
        return _SPAN_EXTRA_MEMO[0][1]
    df = spark.createDataFrame(list(_SPAN_EXTRA), "doc_id long, text string")
    _SPAN_EXTRA_MEMO[:] = [(spark, df)]
    return df


def _q95_oracle() -> str:
    w = _SPAN_W
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id, text FROM {_values_sql(_SPAN_EXTRA)}
), tok AS (
  SELECT doc_id, {_DDB_TOKENS} AS toks FROM corpus
), starts AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, len(toks) - {w})) AS pos
  FROM tok WHERE len(toks) >= {w}
), grams AS (
  SELECT doc_id, pos,
         array_to_string(list_slice(toks, pos + 1, pos + {w}), ' ') AS g
  FROM starts
), dup AS (
  SELECT g FROM grams GROUP BY g HAVING count(*) >= 2
), cov AS (
  SELECT doc_id,
         pos + {w - 1} - greatest(coalesce(max(pos + {w - 1}) OVER (
             PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1),
             pos - 1) AS m
  FROM grams WHERE g IN (SELECT g FROM dup)
), agg AS (
  SELECT doc_id, count(*) AS nw, sum(m) AS dt FROM cov GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.toks) AS BIGINT) AS n_tok,
       CAST(coalesce(a.nw, 0) AS BIGINT) AS n_dup_windows,
       CAST(coalesce(a.dt, 0) AS BIGINT) AS dup_tokens,
       CAST((10000 * coalesce(a.dt, 0))
            // greatest(len(t.toks), 1) AS BIGINT) AS dup_permyriad
FROM tok t LEFT JOIN agg a USING (doc_id)
ORDER BY t.doc_id
"""


@query("q95_dup_span_coverage", oracle=_q95_oracle())
def q95(spark: SparkSession, sf: str) -> DataFrame:
    """Substring-grain duplication audit (Lee et al. 2021): for every
    document, the EXACT number of tokens lying inside any 8-token
    window whose text occurs >= 2 times anywhere in the corpus —
    overlapping duplicated windows merged to their interval union —
    plus the window count and the permyriad fraction Lee et al.
    threshold to drop or trim documents. The grain document-level
    hashing (q17) and fixed-segment dedup (q67) cannot see: partial
    copying, quotation, and template reuse inside otherwise-unique
    pages.

    Plan (operators/dedup.duplicate_span_coverage): in-row stride-1
    window explosion, one groupBy on the gram key, one semi-join back,
    a per-document running-max window (bounded by document length) for
    the interval-union marginals, one id equi-join for the zero-filled
    complete surface. Never pairwise; every exchange is key-bucketed.
    The oracle replays windows, the duplicate set, and the union merge
    verbatim (string gram keys; the xxhash64-keyed production form is
    equality-pinned in tests).
    """
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    corpus = docs.unionByName(_span_extra_df(spark))
    cov = dedup.duplicate_span_coverage(
        corpus, width=_SPAN_W, hash_grams=False
    )
    return (
        cov.select(
            F.col("id").alias("doc_id"),
            "n_tok",
            "n_dup_windows",
            "dup_tokens",
            F.expr("(10000 * dup_tokens) div greatest(n_tok, 1)")
            .cast("long")
            .alias("dup_permyriad"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
def _span_kept_ctes() -> str:
    """The shared WITH-body of the q97/q100 oracles: corpus (documents
    + planted span shapes) through per-document surviving-token arrays
    ``kt`` after the duplicated-span trim — the SQL twin of
    operators/dedup.trim_duplicate_spans."""
    w = _SPAN_W
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id, text FROM {_values_sql(_SPAN_EXTRA)}
), tok AS (
  SELECT doc_id, {_DDB_TOKENS} AS toks FROM corpus
), starts AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, len(toks) - {w})) AS pos
  FROM tok WHERE len(toks) >= {w}
), grams AS (
  SELECT doc_id, pos,
         array_to_string(list_slice(toks, pos + 1, pos + {w}), ' ') AS g
  FROM starts
), dup AS (
  SELECT g FROM grams GROUP BY g HAVING count(*) >= 2
), hitlists AS (
  SELECT doc_id, list(pos) AS ss
  FROM grams WHERE g IN (SELECT g FROM dup) GROUP BY doc_id
), kept AS (
  SELECT t.doc_id, t.toks,
         CASE WHEN h.ss IS NULL THEN t.toks
              ELSE list_filter(t.toks, (x, i) ->
                   len(list_filter(h.ss, s ->
                       s <= i - 1 AND i - 1 <= s + {w - 1})) = 0)
         END AS kt
  FROM tok t LEFT JOIN hitlists h USING (doc_id)
)"""


def _q97_oracle() -> str:
    return f"""{_span_kept_ctes()}
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tok,
       CAST(len(kt) AS BIGINT) AS kept_tok,
       md5(coalesce(array_to_string(kt, ' '), '')) AS trimmed_md5
FROM kept
ORDER BY doc_id
"""


@query("q97_span_trim", oracle=_q97_oracle())
def q97(spark: SparkSession, sf: str) -> DataFrame:
    """EXECUTES the span-dedup policy q95 audits (Lee et al. 2021):
    drop every token inside a duplicated 8-token window, keep the
    unique remainder in order, and pin the exact surviving TEXT per
    document with an md5 — content, order, and both token counts, not
    just sizes. The trim-not-drop policy keeps the unique half of a
    partially-copied page where document-level dedup would discard or
    keep it whole.

    Plan (operators/dedup.trim_duplicate_spans): the q95 exchange set
    (in-row window explosion, gram-key groupBy, semi-join) plus one
    document-bounded collect_list and an in-row nested-lambda keep
    filter — trimming is audit cost plus a scan-local filter. The
    oracle replays windows, the duplicate set, AND the per-position
    keep decision verbatim (1-based DuckDB lambda index vs 0-based
    Spark, both normalized to token position).
    """
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    corpus = docs.unionByName(_span_extra_df(spark))
    out = dedup.trim_duplicate_spans(corpus, width=_SPAN_W, hash_grams=False)
    return (
        out.select(
            F.col("id").alias("doc_id"),
            "n_tok",
            "kept_tok",
            F.md5("trimmed_text").alias("trimmed_md5"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
_REL_MIN_TOKS, _REL_MIN_CHARS, _REL_EVAL_K, _REL_SALT = 20, 100, 10, "release-v1"


def _q100_oracle() -> str:
    from alt_spark.functions.hashing import DDB_H60

    hkey = DDB_H60(f"('{_REL_SALT}' || ':' || CAST(doc_id AS VARCHAR))")
    return f"""{_span_kept_ctes()}
, langd AS (
  SELECT k.doc_id, d.lang,
         CAST(len(k.kt) AS BIGINT) AS kept_tok,
         length(coalesce(array_to_string(k.kt, ' '), '')) AS n_chars
  FROM kept k JOIN documents d USING (doc_id)
), valid AS (
  SELECT * FROM langd
  WHERE kept_tok >= {_REL_MIN_TOKS} AND n_chars >= {_REL_MIN_CHARS}
), ranked AS (
  SELECT doc_id, lang, kept_tok, n_chars,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY {hkey}, doc_id
         ) AS rn
  FROM valid
)
SELECT lang,
       CASE WHEN rn <= {_REL_EVAL_K} THEN 'eval' ELSE 'train' END AS split,
       count(*) AS n_docs,
       CAST(sum(kept_tok) AS BIGINT) AS tok_sum,
       CAST(sum(n_chars) AS BIGINT) AS char_sum,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM ranked
GROUP BY 1, 2
ORDER BY 1, 2
"""


@query("q100_release_pipeline", oracle=_q100_oracle())
def q100(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-release capstone composing the r7 span family END TO END
    in one plan: trim duplicated spans (q97's policy) → re-gate
    validity on the TRIMMED text (a page can fall under the floors
    only after its copied half is removed — gating before trimming
    would ship boilerplate-only pages) → carve exactly k eval documents
    per language from the survivors (q94's deterministic carve) →
    report per-(lang, split) document/token/char counts with an id
    checksum pinning exact split membership. This is the table a
    corpus release publishes next to its shards: what survived, how
    big, and which rows are held out.

    Plan: rides the SAME _SPAN_DUP_CACHE entry as q95/q97 (identical
    corpus construction via _span_extra_df), one lang equi-join, the
    exact-k carve's broadcast-threshold prefilter + tiny rank window,
    one bounded (lang, split) aggregate. The planted span rows flow
    through the trim and drop at the lang join (they are not documents
    rows) — exercising the trim without touching the release stats.
    """
    from alt_spark.operators.mixing import exact_k_sample

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    corpus = docs.unionByName(_span_extra_df(spark))
    trimmed = dedup.trim_duplicate_spans(corpus, width=_SPAN_W, hash_grams=False)
    langd = (
        trimmed.withColumnRenamed("id", "doc_id")
        .join(
            load_table(spark, sf, "documents").select("doc_id", "lang"),
            "doc_id",
        )
        .select(
            "doc_id",
            "lang",
            F.col("kept_tok"),
            F.length("trimmed_text").cast("long").alias("n_chars"),
        )
    )
    # Materialize the survivor manifest: the carve consumes `valid`
    # through four plan branches (stratum counts, prefilter survivors,
    # the starvation guard, the selected rows) plus the outer join —
    # without a checkpoint each branch replays the whole trim pipeline
    # (measured 3.6 s -> the trim once at sf0.01). A release run writes
    # this manifest (id, lang, token/char counts) next to its shards
    # anyway; the eager localCheckpoint is its in-session stand-in
    # (eager, not lazy: a lazy checkpoint only dedups across JOBS, and
    # the whole carve runs as one job — the _PAIR_CACHE rationale).
    # Hermetically skipped under the plan-audit switch (ADVICE r7:
    # constructing q100 must not run Spark jobs inside plan-only
    # fixtures, and the audits apply to the RAW lineage).
    valid = langd.filter(
        (F.col("kept_tok") >= _REL_MIN_TOKS)
        & (F.col("n_chars") >= _REL_MIN_CHARS)
    )
    if _dfcache.MATERIALIZE:
        valid = valid.localCheckpoint(eager=True)
    carve = exact_k_sample(
        valid, _REL_EVAL_K, "lang", "doc_id", salt=_REL_SALT
    ).select("doc_id", F.lit(True).alias("__eval"))
    return (
        valid.join(F.broadcast(carve), "doc_id", "left")
        .select(
            "lang",
            F.when(F.col("__eval").isNotNull(), F.lit("eval"))
            .otherwise(F.lit("train"))
            .alias("split"),
            "kept_tok",
            "n_chars",
            "doc_id",
        )
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("kept_tok").cast("long").alias("tok_sum"),
            F.sum("n_chars").cast("long").alias("char_sum"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        )
        .orderBy("lang", "split")
    )


# ---------------------------------------------------------------------------
def _q101_oracle() -> str:
    w = _SPAN_W
    return f"""
WITH batched AS (
  SELECT doc_id, text, 1 + doc_id % 3 AS batch FROM documents
), tok AS (
  SELECT doc_id, batch, {_DDB_TOKENS} AS toks FROM batched
), grams AS (
  SELECT batch,
         array_to_string(list_slice(toks, pos + 1, pos + {w}), ' ') AS g
  FROM (
    SELECT doc_id, batch, toks,
           unnest(generate_series(0, len(toks) - {w})) AS pos
    FROM tok WHERE len(toks) >= {w}
  )
), idx AS (
  SELECT g, count(*) AS c, max(batch) AS last_seen
  FROM grams GROUP BY g
), comp AS (
  SELECT g, c FROM idx WHERE last_seen >= 2
), probe AS (
  SELECT doc_id + 1000000 AS doc_id, text FROM documents
  WHERE doc_id % 10 = 0
), ptok AS (
  SELECT doc_id, {_DDB_TOKENS} AS toks FROM probe
), pgrams AS (
  SELECT doc_id, pos,
         array_to_string(list_slice(toks, pos + 1, pos + {w}), ' ') AS g
  FROM (
    SELECT doc_id, toks,
           unnest(generate_series(0, len(toks) - {w})) AS pos
    FROM ptok WHERE len(toks) >= {w}
  )
), pcnt AS (
  SELECT g, count(*) AS cn FROM pgrams GROUP BY g
), dup AS (
  SELECT pcnt.g FROM pcnt LEFT JOIN comp USING (g)
  WHERE pcnt.cn + coalesce(comp.c, 0) >= 2
), cov AS (
  SELECT doc_id,
         pos + {w - 1} - greatest(coalesce(max(pos + {w - 1}) OVER (
             PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1),
             pos - 1) AS m
  FROM pgrams WHERE g IN (SELECT g FROM dup)
), agg AS (
  SELECT doc_id, count(*) AS nw, sum(m) AS dt FROM cov GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.toks) AS BIGINT) AS n_tok,
       CAST(coalesce(a.nw, 0) AS BIGINT) AS n_dup_windows,
       CAST(coalesce(a.dt, 0) AS BIGINT) AS dup_tokens
FROM ptok t LEFT JOIN agg a USING (doc_id)
ORDER BY t.doc_id
"""


@query("q101_index_retention", oracle=_q101_oracle())
def q101(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental-index RETENTION end to end (new r8, VERDICT r7
    item 2; operators/index_maintenance.py; the reference's
    partition-aligned TTL, clickhouse/migrations/007_update_ttl_1day
    .sql:15-22): the corpus arrives as three batches (doc_id mod 3,
    stamps 1-3) whose span-gram counts fold into a stamped index
    (counts sum, last_seen refreshes); compaction drops every gram
    last seen before batch 2; a probe batch of re-labeled copies of
    every 10th document is then scored incrementally against the
    COMPACTED index. Probes sourced from horizon batches score
    near-total duplication (probe window + stored count >= 2); probes
    whose only prior occurrences predate the horizon score as fresh —
    the retention policy as observable output, replayed row by row by
    the oracle (stamped merge == grouped max, the compaction filter,
    and the incremental dup rule are all relational).

    Scale shape: the stamped merge is the same one key-bucketed
    aggregate as the unstamped index fold (max rides the sum's
    shuffle); compaction is one filter (partition pruning when the
    physical index is written partitionBy(last_seen)); probe scoring
    is batch-sized (gram explode in-row, one key-equi LEFT join
    against index counts, per-doc bounded interval-union window) —
    the base corpus is never rescanned.
    """
    from alt_spark.operators.index_maintenance import (
        compact_index,
        merge_stamped_counts,
        stamp_index,
    )

    docs = load_table(spark, sf, "documents").select("doc_id", "text")

    def batch(r: int) -> DataFrame:
        return docs.filter(F.col("doc_id") % 3 == r)

    def counts(b: DataFrame) -> DataFrame:
        return dedup.span_gram_counts(b, width=_SPAN_W, hash_grams=False)

    idx = stamp_index(counts(batch(0)), 1)
    idx = merge_stamped_counts(idx, counts(batch(1)), 2)
    idx = merge_stamped_counts(idx, counts(batch(2)), 3)
    compacted = compact_index(idx, min_last_seen=2)
    probe = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    out = dedup.duplicate_span_coverage_incremental(
        probe,
        compacted.select("k", "c"),
        width=_SPAN_W,
        hash_grams=False,
    )
    return out.select(
        F.col("id").alias("doc_id"),
        F.col("n_tok"),
        F.col("n_dup_windows"),
        F.col("dup_tokens"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
_PR_S = 1_000_000  # total rank mass in micro units
_PR_ITERS = 3  # fixed iteration count (a release artifact, like a vocab)


def _q114_oracle() -> str:
    stages = []
    for t in range(1, _PR_ITERS + 1):
        stages.append(
            f"""r{t} AS MATERIALIZED (
  SELECT d.node, d.deg,
         CAST((15 * {_PR_S}) // (100 * nn.n) AS BIGINT)
         + CAST(coalesce(sum((85 * p.rank) // (100 * p.deg)), 0) AS BIGINT) AS rank
  FROM deg d
  CROSS JOIN nn
  LEFT JOIN sym s ON s.dst = d.node
  LEFT JOIN r{t - 1} p ON p.node = s.src
  GROUP BY d.node, d.deg, nn.n
)"""
        )
    joined = ",\n".join(stages)
    return f"""
WITH pairs AS (
  SELECT l1.l_partkey AS a, l2.l_partkey AS b
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
  GROUP BY 1, 2 HAVING count(DISTINCT l1.l_orderkey) >= 2
), sym AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst FROM pairs
), deg AS MATERIALIZED (
  SELECT src AS node, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY 1
), nn AS (
  SELECT count(*) AS n FROM deg
), r0 AS MATERIALIZED (
  SELECT node, deg, CAST({_PR_S} // nn.n AS BIGINT) AS rank FROM deg, nn
),
{joined}
SELECT node, deg, rank AS rank_micro
FROM r{_PR_ITERS}
ORDER BY rank DESC, node
LIMIT 25
"""


@query("q114_pagerank_integer", oracle=_q114_oracle())
def q114(spark: SparkSession, sf: str) -> DataFrame:
    """Integer-exact PageRank (3 fixed iterations, damping 0.85) over
    the part co-occurrence graph — authority scoring for the graph
    family (J4's random-walk-with-restart is the reference shape,
    `recap-worker/recap-worker/src/classifier/graph.rs:258-340`; this
    is its oracle-checkable twin): every update is floor division in
    micro units — `teleport = 15S div 100n`, `contrib(u) = 85·r(u) div
    (100·deg(u))` — so three engines (Spark, DuckDB, pencil) produce
    the same ranks bit-for-bit. Mass is NOT exactly conserved (floors
    leak); that is the declared contract — a ranking needs a total
    order, not a distribution. Fixed iteration count is a pinned
    config, like a tokenizer vocab.

    Plan (100 TB shape): one corpus-scale theta self-join builds the
    pair graph (the q06 shape, order-key equi-join — never cartesian);
    each iteration is one edge-rank equi-join + one map-side-combinable
    groupBy on dst — the classic O(iters) shuffle schedule with
    lineage kept flat by the fixed small iteration count. Node count
    rides a 1-row broadcast (no driver-side collect).
    """
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count_distinct("a.l_orderkey").alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("pa", "pb")
    )
    sym = pairs.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst")
    ).unionByName(pairs.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
    # Lineage truncation gated on the hermetic switch so plan-only
    # audits still see the raw theta-join graph build (the r7 ADVICE
    # doctrine; an ungated checkpoint would make the cartesian/NLJ
    # audits vacuous below this point — review finding, r8).
    if _dfcache.MATERIALIZE:
        sym = sym.localCheckpoint(eager=False)
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("long").alias("deg")
    )
    nn = deg.agg(F.count("*").alias("n"))
    r = (
        deg.crossJoin(F.broadcast(nn))
        .withColumn("rank", F.expr(f"{_PR_S} div n").cast("long"))
        .select("node", "deg", "rank")
    )
    for _ in range(_PR_ITERS):
        contrib = r.select(
            "node", F.expr("(85 * rank) div (100 * deg)").alias("c")
        )
        recv = (
            sym.join(contrib, sym["src"] == contrib["node"])
            .groupBy(F.col("dst").alias("rnode"))
            .agg(F.sum("c").alias("recv"))
        )
        r = (
            deg.join(recv, deg["node"] == recv["rnode"], "left")
            .crossJoin(F.broadcast(nn))
            .select(
                "node",
                "deg",
                (
                    F.expr(f"(15 * {_PR_S}) div (100 * n)")
                    + F.coalesce(F.col("recv"), F.lit(0))
                )
                .cast("long")
                .alias("rank"),
            )
        )
    return (
        r.select("node", "deg", F.col("rank").alias("rank_micro"))
        .orderBy(F.desc("rank_micro"), "node")
        .limit(25)
    )


# ---------------------------------------------------------------------------
def _q118_oracle() -> str:
    """The ensemble oracle: MinHash pair chain + SimHash pair chain
    (both composable fragments), their UNION as the closure's pair set,
    and per-cluster signal attribution."""
    return f"""
WITH RECURSIVE {_minhash_pair_ctes()},
{_simhash_pair_ctes()},
mh AS (SELECT id1, id2 FROM est WHERE est_jaccard >= 0.7),
shp AS (SELECT id1, id2 FROM s_cand WHERE bit_count(xor(h1, h2)) <= 3),
{_cc_closure_ctes("SELECT id1, id2 FROM mh UNION SELECT id1, id2 FROM shp")},
grp AS (
  SELECT comp AS cluster_id, count(*) AS n_docs,
         CAST(sum(id) AS BIGINT) AS id_checksum
  FROM comp GROUP BY 1
), mh_in AS (
  SELECT c.comp AS cid, count(*) AS n FROM mh JOIN comp c ON c.id = mh.id1
  GROUP BY 1
), sh_in AS (
  SELECT c.comp AS cid, count(*) AS n FROM shp JOIN comp c ON c.id = shp.id1
  GROUP BY 1
)
SELECT g.cluster_id, g.n_docs, g.id_checksum,
       CAST(coalesce(m.n, 0) AS BIGINT) AS n_mh_pairs,
       CAST(coalesce(s.n, 0) AS BIGINT) AS n_sh_pairs
FROM grp g
LEFT JOIN mh_in m ON m.cid = g.cluster_id
LEFT JOIN sh_in s ON s.cid = g.cluster_id
ORDER BY g.cluster_id
"""


@query("q118_ensemble_neardup_clusters", oracle=_q118_oracle())
def q118(spark: SparkSession, sf: str) -> DataFrame:
    """Ensemble near-duplicate clustering: connected components over
    the UNION of the MinHash pair set (q30, shingle-Jaccard grain) and
    the SimHash pair set (q31, token-weight grain) — what production
    dedup actually ships, because the two signals catch different
    duplication (reordered boilerplate vs light token edits) and a
    cluster is real if EITHER says so. Per cluster: size, member id
    checksum (exact membership pin), and how many in-cluster pairs
    each signal contributed — the attribution an operator reads before
    trusting a merge. Monotonicity vs the single-signal q73 clustering
    (every q73 cluster is contained in one ensemble cluster) is
    pytest-pinned.

    Plan (100 TB shape): both pair generators stay banded equi-joins
    (never all-pairs — q30/q31's own contract); the union is
    pair-set-sized; the closure is the O(log n) pointer-jumping CC
    (operators/graph); attribution joins are pair-set x broadcast-able
    label table. Declared portable (md5) so every stage replays in the
    oracle; production default stays xxhash64.
    """
    from alt_spark.operators.graph import connected_components

    docs = load_table(spark, sf, "documents")
    mh = dedup.minhash_near_dup(docs, threshold=0.7, portable=True).select(
        "id1", "id2"
    )
    sh = dedup.simhash_near_dup(docs, portable=True).select("id1", "id2")
    pairs = mh.unionByName(sh).distinct()
    comp = connected_components(pairs)
    grp = comp.groupBy("comp").agg(
        F.count("*").alias("n_docs"),
        F.sum("id").cast("long").alias("id_checksum"),
    )

    def attributed(p: DataFrame, name: str) -> DataFrame:
        return (
            p.join(comp.withColumnRenamed("id", "id1"), "id1")
            .groupBy("comp")
            .agg(F.count("*").alias(name))
        )

    return (
        grp.join(attributed(mh, "n_mh"), "comp", "left")
        .join(attributed(sh, "n_sh"), "comp", "left")
        .select(
            F.col("comp").alias("cluster_id"),
            "n_docs",
            "id_checksum",
            F.coalesce(F.col("n_mh"), F.lit(0)).cast("long").alias("n_mh_pairs"),
            F.coalesce(F.col("n_sh"), F.lit(0)).cast("long").alias("n_sh_pairs"),
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
_ICU_MOD = 4  # doc_id % 4 == 0 plays the daily increment


def _q121_oracle() -> str:
    """Full-recompute twin: the q30 pair chain over the WHOLE corpus,
    the recursive min-label closure, restricted to components touched
    by the increment — by the incremental==full parity the operator
    proves, that is exactly what the star-retrieval update returns."""
    return f"""
WITH RECURSIVE {_minhash_pair_ctes()},
{_cc_closure_ctes()},
touched AS (
  SELECT DISTINCT comp FROM comp WHERE id % {_ICU_MOD} = 0
)
SELECT c.id, c.comp
FROM comp c JOIN touched t ON c.comp = t.comp
ORDER BY c.id
"""


@query("q121_incremental_cluster_update", oracle=_q121_oracle())
def q121(spark: SparkSession, sf: str) -> DataFrame:
    """The daily-batch near-dup index update, end to end, as one
    hash-checkable query: the base corpus (doc_id % 4 != 0) has a
    PERSISTED index — band rows, signature table, CC cluster labels —
    and the day's increment (doc_id % 4 == 0) is signed, banded
    against the stored index (``lsh_incremental_pairs`` — the base is
    never re-shingled), candidate pairs are verified with the shared
    agreement estimate (``signature_est_jaccard``), and
    ``connected_components_incremental`` pulls ONLY the touched
    components' star edges to produce the updated labels. Returns
    (id, comp) for every node of a touched component.

    The oracle is the FULL recompute restricted to touched components
    — the parity the incremental operators prove in pytest, here
    driver-hash-checked end to end on the composed pipeline. Declared
    portable (md5); production default stays xxhash64.

    Scale shape: increment work ∝ increment (sign + band equi-join +
    candidate-bounded verify); base index retrieval is a keyed
    semi-join (touched components only); the closure runs on the
    star-compressed touched subgraph, never the base graph.

    Bench-economics note (VERDICT r9 item 2, revised r12): the recorded
    wall is NOT the operator's production cost — the driver needs a
    self-contained hash-checkable plan, so the base's persisted
    artifacts (signature table, band index, CC labels) are built inside
    the query. Since r12 they are DERIVED from the corpus-level shared
    materializations instead of re-signed from raw text: MinHash
    signatures are per-document (sign-then-filter == filter-then-sign,
    pytest-pinned), so the base/increment signature split is two
    filters over the one cached corpus signature table
    (``minhash_signatures_cached``), and the base pair set is the
    both-ends-in-base restriction of the corpus pair frame q118/q30
    already share (candidate equality and the signature-agreement
    estimate are pairwise, so the restriction is row-identical to
    banding the base alone — the q121 parity test pins this). The
    increment path itself (sign the batch, band against the stored
    index, verify candidates, close touched components) is unchanged
    and still exercises ``lsh_incremental_pairs`` +
    ``connected_components_incremental`` end to end.
    """
    from alt_spark.operators.graph import (
        connected_components,
        connected_components_incremental,
    )

    docs = load_table(spark, sf, "documents")

    # The persisted artifacts a production pipeline reads from storage —
    # base signatures, base band index, base cluster labels — derived
    # from the corpus-level shared tables (the signature cache and the
    # q118/q30 pair frame), exactly as a daily batch reads the written
    # snapshot artifacts rather than re-shingling anything.
    full_sigs = dedup.minhash_signatures_cached(docs, portable=True)
    base_sigs = full_sigs.filter(F.col("id") % _ICU_MOD != 0)
    new_sigs = full_sigs.filter(F.col("id") % _ICU_MOD == 0)
    base_bands = dedup.band_rows(base_sigs, portable=True)
    base_pairs = (
        dedup.minhash_near_dup(docs, threshold=0.7, portable=True)
        .filter(
            (F.col("id1") % _ICU_MOD != 0) & (F.col("id2") % _ICU_MOD != 0)
        )
        .select("id1", "id2")
    )
    base_labels = connected_components(base_pairs)

    cand = dedup.lsh_incremental_pairs(new_sigs, base_bands, portable=True)
    verified = (
        dedup.signature_est_jaccard(
            cand.select(
                F.col("new_id").alias("id1"), F.col("match_id").alias("id2")
            ),
            full_sigs,
        )
        .filter(F.col("est_jaccard") >= 0.7)
        .select("id1", "id2")
    )
    return connected_components_incremental(verified, base_labels).orderBy(
        "id"
    )


# ---------------------------------------------------------------------------
_HITS_S = 1_000_000  # score mass per side, micro units
_HITS_ITERS = 3  # pinned iteration count (a release artifact, like q114's)


def _q124_oracle() -> str:
    stages = [
        f"""h0 AS MATERIALIZED (
  SELECT u, CAST({_HITS_S} // nu.n AS BIGINT) AS h FROM ud, nu
)"""
    ]
    for t in range(1, _HITS_ITERS + 1):
        stages.append(
            f"""a{t}r AS MATERIALIZED (
  SELECT e.t, sum(p.h * e.w) AS a
  FROM edges e JOIN h{t - 1} p ON p.u = e.u GROUP BY 1
), a{t}n AS (SELECT sum(a) AS s FROM a{t}r),
a{t} AS MATERIALIZED (
  SELECT t, CAST(({_HITS_S}::HUGEINT * a) // n.s AS BIGINT) AS a
  FROM a{t}r, a{t}n n
), h{t}r AS MATERIALIZED (
  SELECT e.u, sum(q.a * e.w) AS h
  FROM edges e JOIN a{t} q ON q.t = e.t GROUP BY 1
), h{t}n AS (SELECT sum(h) AS s FROM h{t}r),
h{t} AS MATERIALIZED (
  SELECT u, CAST(({_HITS_S}::HUGEINT * h) // n.s AS BIGINT) AS h
  FROM h{t}r, h{t}n n
)"""
        )
    joined = ",\n".join(stages)
    return f"""
WITH edges AS MATERIALIZED (
  SELECT user_id AS u, event_type AS t, count(*) AS w
  FROM events GROUP BY 1, 2
), ud AS MATERIALIZED (
  SELECT u, CAST(sum(w) AS BIGINT) AS du FROM edges GROUP BY 1
), td AS MATERIALIZED (
  SELECT t, CAST(sum(w) AS BIGINT) AS dt FROM edges GROUP BY 1
), nu AS (SELECT count(*) AS n FROM ud),
{joined}
SELECT * FROM (
  SELECT 'auth' AS side, t AS node, a AS score_micro, dt AS degree
  FROM a{_HITS_ITERS} JOIN td USING (t)
  ORDER BY score_micro DESC, node LIMIT 10
)
UNION ALL
SELECT * FROM (
  SELECT 'hub' AS side, CAST(u AS VARCHAR) AS node, h AS score_micro,
         du AS degree
  FROM h{_HITS_ITERS} JOIN ud USING (u)
  ORDER BY score_micro DESC, node LIMIT 10
)
ORDER BY side, score_micro DESC, node
"""


@query("q124_hits_user_event", oracle=_q124_oracle())
def q124(spark: SparkSession, sf: str) -> DataFrame:
    """Integer-exact WEIGHTED HITS (Kleinberg 1999) on the bipartite
    user → event-type graph, edge weight = interaction count: hubs are
    power users concentrating on hot surfaces, authorities the
    surfaces those users concentrate on — the J4 graph-scoring
    family's second authority measure next to q114's PageRank (a
    damping walk vs two-sided mutual reinforcement; structurally
    different recurrences). Weights matter: the unweighted graph here
    is near-complete-bipartite (every active user touches every event
    type eventually), which collapses HITS to a constant vector —
    interaction counts restore the structure the measure exists for.

    Exactness envelope: per-edge products h·w stay in int64 (h ≤ S =
    10^6 after each renormalization, so any per-(user,type) count
    ≤ 9·10^12 is safe); every corpus-scale SUM accumulates in
    DECIMAL(38,0) (DuckDB: HUGEINT — its sum(BIGINT) already widens),
    and the renormalization ``(S·x) div Σx`` multiplies in the wide
    type before the integral divide returns to int64. Mass leaks to
    floors by contract, as in q114: rankings need a total order, not
    a distribution.

    Plan (100 TB shape): the weighted edge list is ONE map-side-
    combinable groupBy over the event scan; each of the 3 pinned
    iterations is two (edge ⨝ score) equi-joins + two combinable
    groupBys — O(iters) shuffles, lineage flat, node counts and norms
    on 1-row broadcasts (no driver collect). Top-10 cuts are
    TakeOrdered, never a global sort.
    """
    ev = (
        load_table(spark, sf, "events")
        .groupBy(F.col("user_id").alias("u"), F.col("event_type").alias("t"))
        .agg(F.count("*").cast("long").alias("w"))
    )
    if _dfcache.MATERIALIZE:
        ev = ev.localCheckpoint(eager=False)
    ud = ev.groupBy("u").agg(F.sum("w").cast("long").alias("du"))
    td = ev.groupBy("t").agg(F.sum("w").cast("long").alias("dt"))
    nu = ud.agg(F.count("*").alias("n"))
    # Strict guard (the q110 doctrine): once the node count reaches the
    # mass S, h0 = S div n floors to 0, the first norm divides 0 by 0,
    # and NULL cascades through every iteration — both engines replay
    # the same degenerate recurrence, so parity would stay green while
    # the ranking is garbage. Raise instead; a production deployment
    # raises S (micro -> nano units) with the node population.
    h = ud.crossJoin(F.broadcast(nu)).select(
        "u",
        F.when(
            F.assert_true(
                F.col("n") < F.lit(_HITS_S),
                F.lit(f"q124: node count >= S ({_HITS_S}); raise _HITS_S"),
            ).isNull(),
            F.expr(f"CAST({_HITS_S} div n AS BIGINT)"),
        ).alias("h"),
    )
    wide = "decimal(38,0)"
    renorm = f"CAST((CAST({_HITS_S} AS {wide}) * x) div s AS BIGINT)"
    a = None
    for _ in range(_HITS_ITERS):
        ar = (
            ev.join(h, "u")
            .groupBy("t")
            .agg(F.sum((F.col("h") * F.col("w")).cast(wide)).alias("x"))
        )
        # Each raw-sum frame feeds BOTH its norm broadcast and the
        # renormalized scores; ungated, the second consumer re-derives
        # the whole prior-iteration chain and the recomputation
        # compounds ~2x per phase (measured 7 s -> ~1 s at sf0.01).
        # Gated on the hermetic switch (q114 doctrine) so plan audits
        # still see the full iteration lineage.
        if _dfcache.MATERIALIZE:
            ar = ar.localCheckpoint(eager=False)
        an = ar.agg(F.sum("x").cast(wide).alias("s"))
        a = ar.crossJoin(F.broadcast(an)).select(
            "t", F.expr(renorm).alias("a")
        )
        hr = (
            ev.join(a, "t")
            .groupBy("u")
            .agg(F.sum((F.col("a") * F.col("w")).cast(wide)).alias("x"))
        )
        if _dfcache.MATERIALIZE:
            hr = hr.localCheckpoint(eager=False)
        hn = hr.agg(F.sum("x").cast(wide).alias("s"))
        h = hr.crossJoin(F.broadcast(hn)).select(
            "u", F.expr(renorm).alias("h")
        )
    auth = (
        a.join(td, "t")
        .select(
            F.lit("auth").alias("side"),
            F.col("t").alias("node"),
            F.col("a").alias("score_micro"),
            F.col("dt").alias("degree"),
        )
        .orderBy(F.desc("score_micro"), "node")
        .limit(10)
    )
    hub = (
        h.join(ud, "u")
        .select(
            F.lit("hub").alias("side"),
            F.col("u").cast("string").alias("node"),
            F.col("h").alias("score_micro"),
            F.col("du").alias("degree"),
        )
        .orderBy(F.desc("score_micro"), "node")
        .limit(10)
    )
    return auth.unionByName(hub).orderBy(
        "side", F.desc("score_micro"), "node"
    )


# ---------------------------------------------------------------------------
# q126: perceptual image dedup, END TO END through the REAL decode
# kernel (VERDICT r9 item 5). Images are synthesized deterministically
# from doc_id (md5-nibble grey pixels in an 8x8 24-bit BMP), so the
# DuckDB oracle can rebuild the FINGERPRINTS from first principles —
# what the hash row then pins cross-engine is the whole Spark-side
# chain: BMP header walk, BGR luma, orientation canonicalization
# (bottom-up vs top-down storage alternates by doc parity, and each
# planted twin is stored in the OPPOSITE orientation), grid pooling,
# mean threshold, 64-bit pack, pigeonhole block join, popcount verify.
#
# Tie-free by construction: pixels are grey (B=G=R), so each aHash
# block equals its integer pixel value, and the 64th pixel is chosen
# to make the pixel sum ≡ 1 (mod 64) — the thumbnail mean can never
# equal a block value, so the kernel's float-64 threshold and the
# oracle's exact-integer threshold (64*v > Σv) provably agree (gap
# >= 1/64 vs ~1e-12 float error). Brightness-shifted twins (+16 on
# every pixel, no clamp by construction) shift every block AND the
# mean together — the aHash invariance the operator promises, here
# hash-checked: twins must pair at hamming 0.
_IMG_TWIN_MOD = 20  # every 20th doc gets a shifted, re-oriented twin
_IMG_TWIN_BASE = 1_000_000_000
_IMG_SHIFT = 16
# Third member per twin-doc: the SAME canonical pixels brightness-
# shifted again and encoded as a GREYSCALE PNG (zlib, filter-0 rows,
# always top-down) — the cross-CODEC pin: BMP and PNG payloads of one
# image must land in one hamming-0 group, which hash-checks the PNG
# chunk walk + inflate + luma path against the BMP path cross-engine.
_IMG_PNG_BASE = 3_000_000_000
_IMG_PNG_SHIFT = 32


def _img_pixels(doc_id: int, shift: int) -> list[int]:
    """The 64 canonical top-down grey pixel values for a doc's synthetic
    image — 63 md5 nibbles scaled into [64, 184], the last chosen so the
    sum is ≡ 1 (mod 64) (tie-free threshold, see above). Python here,
    md5()+strpos in the oracle: both engines derive identical bytes."""
    import hashlib

    s = f"img|{doc_id}"
    hx = (
        hashlib.md5(f"{s}|p0".encode()).hexdigest()
        + hashlib.md5(f"{s}|p1".encode()).hexdigest()
    )
    v = [64 + 8 * int(c, 16) for c in hx[:63]]
    v.append(64 + (1 - sum(v)) % 64)
    return [x + shift for x in v]


def _img_bmp(vals: list[int], bottom_up: bool) -> bytes:
    """Pack canonical top-down pixels into a REAL 24-bit BMP payload,
    stored bottom-up (positive height) or top-down (negative height) —
    the decode kernel must canonicalize both to the same fingerprint."""
    import struct

    rows = [vals[r * 8 : (r + 1) * 8] for r in range(8)]
    stored = rows[::-1] if bottom_up else rows
    pad = (-(8 * 3)) % 4  # row stride pads to a 4-byte boundary (0 at w=8)
    data = bytearray()
    for row in stored:
        for v in row:
            data += bytes((v, v, v))  # BGR, grey
        data += b"\x00" * pad
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII",
        40, 8, 8 if bottom_up else -8, 1, 24, 0, len(data), 2835, 2835, 0, 0,
    )
    return bytes(hdr + dib + data)


def _img_png(vals: list[int], shift: int = 0) -> bytes:
    """Pack canonical top-down pixels into a REAL greyscale PNG (zlib
    deflate, filter-0 scanlines, correct chunk CRCs) — the cross-codec
    member the decode kernel must reduce to the same fingerprint."""
    import struct
    import zlib

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes(v + shift for v in vals[r * 8 : (r + 1) * 8])
        for r in range(8)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _q126_oracle() -> str:
    pack_bit = (
        "CASE WHEN 64 * v > t.s THEN"
        " CASE WHEN i = 63 THEN -9223372036854775808"
        " ELSE (1::BIGINT << i) END ELSE 0 END"
    )
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, doc_id, 0 AS shift FROM documents
  UNION ALL
  SELECT {_IMG_TWIN_BASE} + doc_id, doc_id, {_IMG_SHIFT} FROM documents
  WHERE doc_id % {_IMG_TWIN_MOD} = 0
  UNION ALL
  SELECT {_IMG_PNG_BASE} + doc_id, doc_id, {_IMG_PNG_SHIFT} FROM documents
  WHERE doc_id % {_IMG_TWIN_MOD} = 0
), hx AS (
  SELECT media_id, shift,
         md5('img|' || doc_id || '|p0') || md5('img|' || doc_id || '|p1') AS hex
  FROM m
), px0 AS (
  SELECT media_id, shift, i,
         64 + 8 * (strpos('0123456789abcdef', substr(hex, i + 1, 1)) - 1) AS v
  FROM hx, (SELECT unnest(generate_series(0, 62)) AS i)
), s63 AS (
  SELECT media_id, any_value(shift) AS shift, sum(v) AS s
  FROM px0 GROUP BY media_id
), px AS (
  SELECT media_id, i, v + shift AS v FROM px0
  UNION ALL
  SELECT media_id, 63, 64 + (((1 - s) % 64) + 64) % 64 + shift FROM s63
), tot AS (
  SELECT media_id, sum(v) AS s FROM px GROUP BY 1
), fp AS (
  SELECT px.media_id, sum({pack_bit}) AS ahash
  FROM px JOIN tot t USING (media_id) GROUP BY 1
)
SELECT a.media_id AS id1, b.media_id AS id2,
       CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming
FROM fp a JOIN fp b ON a.media_id < b.media_id
WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
ORDER BY id1, id2
"""


@query("q126_image_phash_dedup", oracle=_q126_oracle())
def q126(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual image dedup end to end (J11 as a driver-hash-checked
    QUERY, VERDICT r9 item 5): every document carries a synthetic 8x8
    grey 24-bit BMP derived from md5(doc_id); every ``_IMG_TWIN_MOD``-th
    doc additionally ships (a) a brightness-shifted (+16) BMP twin
    stored in the OPPOSITE row orientation and (b) a +32-shifted
    greyscale PNG of the same canonical pixels — the CROSS-CODEC pin:
    all three payloads must land in one hamming-0 group, which
    hash-checks the PNG chunk walk + inflate + luma path against the
    BMP path cross-engine. The REAL stdlib decode kernels
    (``operators/multimodal.image_ahash``: header walk, BGR luma,
    bottom-up/top-down canonicalization, grid pooling, mean threshold)
    fingerprint each payload, and near-dup pairs come from the
    pigeonhole block equi-join + popcount verify shared with the
    SimHash family (``dedup.hamming_blocked_pairs``).

    The oracle rebuilds the fingerprints in exact integer arithmetic
    (tie-free by the sum ≡ 1 mod 64 construction — header comment) and
    brute-forces Hamming <= 3; with bands=4 the pigeonhole guarantee
    makes the blocked join lossless at that radius, so blocked ==
    brute force is part of what the hash pins. Expected pairs: exactly
    the planted twins at hamming 0 (random 64-bit fingerprints at
    Hamming <= 3 have probability ~2^-46 per pair — and the result is
    deterministic either way, so the hash cannot flake).

    Plan (100 TB shape): synthesis + decode are ONE narrow Arrow
    mapInPandas inside the scan stage (payloads never shuffle); the
    pair stage moves 64-bit fingerprints through a 4-way block
    explode + equi-join — never all-pairs, never pixel data.
    """
    from alt_spark.operators.multimodal import image_ahash, media_table

    docs = load_table(spark, sf, "documents").select("doc_id")

    meta_t = (
        "struct<mime:string,width:int,height:int,duration_ms:bigint>"
    )
    out_schema = (
        f"media_id long, payload binary, meta {meta_t}"
    )

    def synth(batches):
        import pandas as _pd

        meta = {
            "mime": "image/bmp",
            "width": 8,
            "height": 8,
            "duration_ms": None,
        }
        png_meta = dict(meta, mime="image/png")
        for pdf in batches:
            ids, payloads, metas = [], [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                base_bu = d % 2 == 0
                ids.append(d)
                payloads.append(_img_bmp(_img_pixels(d, 0), base_bu))
                metas.append(meta)
                if d % _IMG_TWIN_MOD == 0:
                    # Twin: +16 brightness, OPPOSITE stored orientation.
                    ids.append(_IMG_TWIN_BASE + d)
                    payloads.append(
                        _img_bmp(_img_pixels(d, _IMG_SHIFT), not base_bu)
                    )
                    metas.append(meta)
                    # Cross-codec member: +32 brightness as a greyscale
                    # PNG — must join the SAME hamming-0 group.
                    ids.append(_IMG_PNG_BASE + d)
                    payloads.append(
                        _img_png(_img_pixels(d, 0), _IMG_PNG_SHIFT)
                    )
                    metas.append(png_meta)
            yield _pd.DataFrame(
                {
                    "media_id": _pd.array(ids, dtype="Int64"),
                    "payload": payloads,
                    "meta": metas,
                }
            )

    media = media_table(docs.mapInPandas(synth, schema=out_schema))
    fps = image_ahash(media).filter(F.col("ahash").isNotNull())
    pairs = dedup.hamming_blocked_pairs(
        fps, "ahash", "media_id", max_hamming=3, bands=4
    )
    return pairs.select(
        "id1", "id2", F.col("hamming").cast("long").alias("hamming")
    ).orderBy("id1", "id2")


# ---------------------------------------------------------------------------
# q131: streaming exact-dedup replay — the q49/q120 doctrine applied to
# K3's stateful content-hash dedup, which until now carried only pytest
# parity evidence: the corpus re-lands as residue-keyed micro-batches
# (mtime-staggered so batch order == residue order) PLUS a final batch
# of redelivered twins (same text, new ids — must be dropped by state
# that survived earlier batches) and suffixed variants (new text — must
# survive), flows through a REAL Structured-Streaming dropDuplicates on
# the portable content hash, and the per-batch survivor counts +
# id checksums are SQL-reproducible because arrival order is a doc_id
# residue. Each landing batch is pre-deduped batch-internally
# first-wins (min doc_id per hash) — exact_dedup_incremental's
# documented batch semantics — so the only nondeterminism
# dropDuplicates could introduce (arbitrary winner within one
# micro-batch) is defined away; cross-batch arbitration is the
# stream's own state.
_SDR_BATCHES = 3
_SDR_TWIN_MOD = 5  # every 5th doc redelivers its text under a new id
_SDR_VAR_MOD = 7  # every 7th doc ships a ' v2'-suffixed variant
_SDR_TWIN_BASE = 1_000_000_000
_SDR_VAR_BASE = 2_000_000_000


def _q131_oracle() -> str:
    return f"""
WITH raw AS (
  SELECT doc_id % {_SDR_BATCHES} AS batch, doc_id AS id, md5(text) AS h
  FROM documents
  UNION ALL
  SELECT {_SDR_BATCHES}, {_SDR_TWIN_BASE} + doc_id, md5(text)
  FROM documents WHERE doc_id % {_SDR_TWIN_MOD} = 0
  UNION ALL
  SELECT {_SDR_BATCHES}, {_SDR_VAR_BASE} + doc_id, md5(text || ' v2')
  FROM documents WHERE doc_id % {_SDR_VAR_MOD} = 0
), reps AS (
  SELECT batch, h, min(id) AS id FROM raw GROUP BY batch, h
), surv AS (
  SELECT r.batch, r.id FROM reps r
  WHERE NOT EXISTS (
    SELECT 1 FROM raw e WHERE e.h = r.h AND e.batch < r.batch
  )
), n_in AS (
  SELECT batch, count(*) AS n_in FROM raw GROUP BY batch
)
SELECT n.batch, n.n_in,
       CAST(coalesce(count(s.id), 0) AS BIGINT) AS n_out,
       CAST(coalesce(sum(s.id), 0) AS BIGINT) AS id_checksum
FROM n_in n LEFT JOIN surv s ON s.batch = n.batch
GROUP BY n.batch, n.n_in
ORDER BY n.batch
"""


@query("q131_streaming_dedup_replay", oracle=_q131_oracle())
def q131(spark: SparkSession, sf: str) -> DataFrame:
    """Stateful streaming exact-dedup, driver-hash-checked: per
    micro-batch, how many rows arrived and which survived the
    content-hash state as of arrival. Batches 0-2 are the corpus keyed
    by doc_id residue; batch 3 redelivers every ``_SDR_TWIN_MOD``-th
    text under a new id (state must drop it — proof the dedup state
    SURVIVED batch boundaries) and ships a ``' v2'``-suffixed variant
    of every ``_SDR_VAR_MOD``-th doc (new content — must survive).
    The oracle replays first-wins by (batch, then min-id within batch)
    in plain SQL; the landing pre-dedupes each batch internally
    (min doc_id per hash — ``exact_dedup_incremental``'s documented
    batch rule), so the replay is total and the hash cannot flake.

    Scale shape: the stream state is one row per distinct content
    hash (what a production ingest keeps anyway); per-batch work is a
    narrow hash projection + the keyed state lookup. The memory-sink
    materialization and re-landing are harness economics (the q49/q120
    device) — a production pipeline writes survivors to the corpus
    store via foreachBatch.
    """
    import os
    import shutil
    import tempfile
    import time
    import uuid

    from alt_spark.streaming.landing import (
        land_residue_chunks,
        replay_shuffle_partitions,
    )

    docs = load_table(spark, sf, "documents")
    raw = (
        docs.select(
            (F.col("doc_id") % _SDR_BATCHES).alias("batch"),
            F.col("doc_id").alias("id"),
            F.md5("text").alias("h"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % _SDR_TWIN_MOD == 0).select(
                F.lit(_SDR_BATCHES).alias("batch"),
                (F.lit(_SDR_TWIN_BASE) + F.col("doc_id")).alias("id"),
                F.md5("text").alias("h"),
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % _SDR_VAR_MOD == 0).select(
                F.lit(_SDR_BATCHES).alias("batch"),
                (F.lit(_SDR_VAR_BASE) + F.col("doc_id")).alias("id"),
                F.md5(F.concat(F.col("text"), F.lit(" v2"))).alias("h"),
            )
        )
        .localCheckpoint()  # landing writes + n_in both read it
    )
    n_in = raw.groupBy("batch").agg(F.count("*").alias("n_in"))
    # Batch-internal first-wins BEFORE landing (see header comment).
    reps = raw.groupBy("batch", "h").agg(F.min("id").alias("id"))

    root = tempfile.mkdtemp(prefix="q131_dedup_")
    landing = os.path.join(root, "landing")
    os.makedirs(landing)
    sink = "q131_out_" + uuid.uuid4().hex[:8]
    try:
        # The shared single-write-job landing device (q141/q145/q148's
        # footing): ONE repartition(n, batch) + partitionBy write stages
        # all four chunks, replacing four filter-the-aggregate +
        # coalesce(1) jobs that each re-ran the groupBy and funneled
        # through a single task. The partition key is stripped from the
        # data files, so the micro-batch id rides a duplicate `b`
        # column inside the rows (the stream schema below).
        land_residue_chunks(
            reps.select("id", "h", F.col("batch").alias("b"), "batch"),
            "batch",
            _SDR_BATCHES + 1,
            landing,
            os.path.join(root, "stage"),
            time.time(),
        )
        src = (
            spark.readStream.schema("id long, h string, b long")
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        # Replay-scale state sizing (the q49/q141 discipline): the
        # dropDuplicates state is keyed on h — 32 session shuffle
        # partitions would open/commit 32 state stores per micro-batch
        # for pure task overhead; first-wins dedup output is partition-
        # count-invariant. Production sizes this to its key space.
        with replay_shuffle_partitions(spark):
            q = (
                src.dropDuplicates(["h"])
                .writeStream.format("memory")
                .queryName(sink)
                .outputMode("append")
                .option(
                    "checkpointLocation",
                    os.path.join(root, "ckpt" + uuid.uuid4().hex[:8]),
                )
                .trigger(availableNow=True)
                .start()
            )
            try:
                if not q.awaitTermination(300):
                    q.stop()
                    raise RuntimeError("q131 streaming replay timed out")
            finally:
                if q.isActive:
                    q.stop()
        surv = (
            spark.table(sink)
            .groupBy(F.col("b").alias("batch"))
            .agg(
                F.count("*").alias("n_out"),
                F.sum("id").alias("id_checksum"),
            )
        )
        out = (
            n_in.join(surv, "batch", "left")
            .select(
                "batch",
                "n_in",
                F.coalesce("n_out", F.lit(0)).cast("long").alias("n_out"),
                F.coalesce("id_checksum", F.lit(0))
                .cast("long")
                .alias("id_checksum"),
            )
            .orderBy("batch")
        )
        # Materialize before the sink table / temp dirs go away.
        return spark.createDataFrame(out.collect(), out.schema).orderBy(
            "batch"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        # Never mask the real error with a cleanup failure: the sink
        # view may not exist if the stream died before its first batch.
        try:
            spark.catalog.dropTempView(sink)
        except Exception:
            pass


# ---------------------------------------------------------------------------
# q132: containment detection — the ASYMMETRIC sibling of near-dup:
# Jaccard-style symmetric measures miss "document A is quoted inside
# document B" (|A| << |B| drags the union down), but the winnowing
# guarantee (shared substrings of length >= k+w-1 share fingerprints —
# Schleimer 2003, the q33 chain) makes containment(A->B) =
# |fp(A) ∩ fp(B)| / |fp(A)| the standard detector for quotation /
# partial duplication in a training corpus. Integer permyriad, floor
# division, both directions reported.
_CTN_MIN_FP = 20  # ignore docs with too few fingerprints to score stably
_CTN_THRESH_PM = 6000  # report containment >= 60%
_CTN_TOP = 25
# MOSS's over-common-fingerprint exclusion (Schleimer 2003 §5): a
# fingerprint present in more than this permyriad of documents is
# corpus boilerplate and carries NO containment signal, so it is
# excluded from BOTH the intersect and the denominator. This is also
# the scale lever: it caps the wm equi-join's bucket size at
# df <= cap·N (measured: without it, boilerplate substrings shared by
# ~all docs made q132 quadratic on the hot buckets — 124 s at sf0.1;
# with it, ~7 s). The permyriad form keeps the oracle SF-invariant on
# this synthetic small-vocabulary corpus; a production deployment uses
# MOSS's ABSOLUTE df cap (bucket size bounded by a constant,
# independent of N) — same plan, one constant swapped.
_CTN_MAX_DF_PM = 1000  # rare = present in <= 10% of docs
# Quotation grain: k=16 char-grams (window 4) — the winnowing guarantee
# becomes "shared substrings of length >= 19 share a fingerprint",
# which is the phrase/quotation grain containment actually hunts (q33's
# k=5 near-word grain is boilerplate-dominated on a small vocabulary:
# measured 12x more equi-join work for no extra signal).
_CTN_K = 16


@query(
    "q132_containment_topk",
    oracle=f"""
WITH g AS (
  SELECT doc_id AS id, i - 1 AS pos, {_h60(f"substr(text, i, {_CTN_K})")} AS h
  FROM documents,
       unnest(range(1, greatest(length(text) - {_CTN_K - 2}, 1))) u(i)
  WHERE length(text) >= {_CTN_K}
), w AS (
  SELECT id, pos,
         min(h) OVER (PARTITION BY id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wm,
         count(*) OVER (PARTITION BY id) AS n_grams
  FROM g
), allfps AS (
  SELECT DISTINCT id, wm FROM w WHERE pos <= n_grams - 4
), n AS (
  SELECT count(*) AS n_docs FROM documents
), fps AS (
  SELECT id, wm FROM allfps
  WHERE wm IN (
    SELECT wm FROM allfps GROUP BY wm
    HAVING 10000 * count(*) <= {_CTN_MAX_DF_PM} * (SELECT n_docs FROM n)
  )
), sz AS (
  SELECT id, count(*) AS n_fp FROM fps GROUP BY id
), inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
  FROM fps a JOIN fps b ON a.wm = b.wm AND a.id <> b.id
  GROUP BY 1, 2
), scored AS (
  SELECT i.id_a, i.id_b, i.shared,
         sa.n_fp AS n_fp_a,
         CAST((10000 * i.shared) // sa.n_fp AS BIGINT) AS containment_pm
  FROM inter i JOIN sz sa ON sa.id = i.id_a
  WHERE sa.n_fp >= {_CTN_MIN_FP}
)
SELECT id_a, id_b, CAST(shared AS BIGINT) AS shared,
       CAST(n_fp_a AS BIGINT) AS n_fp_a, containment_pm
FROM scored WHERE containment_pm >= {_CTN_THRESH_PM}
ORDER BY containment_pm DESC, shared DESC, id_a, id_b
LIMIT {_CTN_TOP}
""",
)
def q132(spark: SparkSession, sf: str) -> DataFrame:
    """Top containment pairs: per directed pair (A, B), the fraction of
    A's winnowing fingerprints also present in B, in permyriad — the
    quotation / partial-duplication detector symmetric near-dup misses
    (q30's Jaccard punishes |A| << |B|; containment does not). Runs
    q33's fingerprint chain SHAPE at quotation grain (k=``_CTN_K``
    char-grams, window 4, portable md5 — the winnowing guarantee makes
    shared substrings of length >= 19 produce shared fingerprints), so
    the oracle replays hash → sliding min → distinct → intersect
    verbatim.

    Bench-economics note: ~3/4 of the recorded wall is the portable
    md5 fingerprinting of every gram position (the q53-q55 doctrine —
    portable hashes buy the cross-engine oracle; the production
    xxhash64 form of the same chain benches ~3x cheaper in q55), not
    the containment join, which is rarity-capped and bounded.

    The measure runs over RARE fingerprints only (doc frequency <=
    ``_CTN_MAX_DF_PM`` permyriad of the corpus): MOSS's over-common
    exclusion — boilerplate substrings shared by most documents say
    nothing about A being inside B, and dropping them from both sides
    of the ratio keeps the score honest. The same cap is the scale
    lever: it bounds the wm equi-join's bucket size by construction.

    Plan (100 TB shape): the only corpus-scale join is the fingerprint
    equi-join on wm — buckets bounded by the rarity cap (and the
    doc-frequency pre-aggregate that enforces it is map-side
    combinable), never all-pairs; the intersect count is a combinable
    aggregate over shared-fingerprint pairs only; sizes are a
    broadcastable doc-grain table; the cut is TakeOrdered. Low-
    fingerprint docs are gated out BEFORE scoring so the permyriad is
    stable.
    """
    from alt_spark.functions.text_analysis import winnowing_fingerprints

    docs = load_table(spark, sf, "documents")
    fp = winnowing_fingerprints(docs, k=_CTN_K, window=4, portable=True)
    allfps = fp.select("id", F.explode("fingerprints").alias("wm"))
    if _dfcache.MATERIALIZE:
        allfps = allfps.localCheckpoint(eager=False)
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    rare = (
        allfps.groupBy("wm")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(
            F.lit(10000) * F.col("df") <= _CTN_MAX_DF_PM * F.col("n_docs")
        )
        .select("wm")
    )
    fps = allfps.join(rare, "wm", "left_semi")
    if _dfcache.MATERIALIZE:
        fps = fps.localCheckpoint(eager=False)
    sz = fps.groupBy("id").agg(F.count("*").alias("n_fp"))
    a, b = fps.alias("a"), fps.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.wm") == F.col("b.wm")) & (F.col("a.id") != F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .agg(F.count("*").alias("shared"))
    )
    scored = (
        inter.join(
            F.broadcast(
                sz.filter(F.col("n_fp") >= _CTN_MIN_FP).select(
                    F.col("id").alias("id_a"), F.col("n_fp").alias("n_fp_a")
                )
            ),
            "id_a",
        )
        .select(
            "id_a",
            "id_b",
            F.col("shared").cast("long").alias("shared"),
            F.col("n_fp_a").cast("long").alias("n_fp_a"),
            F.expr("CAST((10000 * shared) div n_fp_a AS BIGINT)").alias(
                "containment_pm"
            ),
        )
        .filter(F.col("containment_pm") >= _CTN_THRESH_PM)
    )
    return scored.orderBy(
        F.desc("containment_pm"), F.desc("shared"), "id_a", "id_b"
    ).limit(_CTN_TOP)


# ---------------------------------------------------------------------------
# q134: perceptual AUDIO dedup end to end through the real PCM WAV
# decode kernel — the audio sibling of q126 (which pins the BMP image
# chain). Synthetic 64-sample mono 8-bit WAVs per doc, amplitudes from
# md5 nibbles; every _SND_TWIN_MOD-th doc ships a 2x-GAIN twin (every
# sample amplitude doubled, no clamp by construction) — the energy-
# envelope hash is gain-invariant exactly as aHash is brightness-
# invariant, so twins must pair at hamming 0. EXACT-float by design:
# 8-bit samples give band values a/128 (power-of-two denominator —
# representable), one sample per band makes RMS = |a|/128 exactly, and
# the amplitude sum is forced to 3 (mod 32) so "band >= mean" never
# ties (64*a ≡ 0 mod 32 can never equal a sum ≡ 3 mod 32) — both
# engines' comparisons are exact, not epsilon-lucky.
_SND_TWIN_MOD = 25
_SND_TWIN_BASE = 1_000_000_000
_SND_GAIN = 2


def _snd_amplitudes(doc_id: int, gain: int) -> list[int]:
    """The 64 sample amplitudes (|s - 128|) of a doc's synthetic WAV —
    63 md5 nibbles scaled into [2, 62], the last chosen so the sum is
    ≡ 3 (mod 32) (tie-free threshold, header comment)."""
    import hashlib

    s = f"snd|{doc_id}"
    hx = (
        hashlib.md5(f"{s}|p0".encode()).hexdigest()
        + hashlib.md5(f"{s}|p1".encode()).hexdigest()
    )
    a = [2 + 4 * int(c, 16) for c in hx[:63]]
    a.append(2 + (1 - sum(a)) % 32)
    return [x * gain for x in a]


def _snd_wav(amps: list[int]) -> bytes:
    """Pack amplitudes into a REAL mono 8-bit PCM WAV (44-byte RIFF
    header + unsigned samples centered at 128)."""
    import struct

    data = bytes(128 + a for a in amps)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _q134_oracle() -> str:
    pack_bit = (
        "CASE WHEN 64 * a >= t.s THEN"
        " CASE WHEN i = 63 THEN -9223372036854775808"
        " ELSE (1::BIGINT << i) END ELSE 0 END"
    )
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, doc_id FROM documents
  UNION ALL
  SELECT {_SND_TWIN_BASE} + doc_id, doc_id FROM documents
  WHERE doc_id % {_SND_TWIN_MOD} = 0
), hx AS (
  SELECT media_id,
         md5('snd|' || doc_id || '|p0') || md5('snd|' || doc_id || '|p1') AS hex
  FROM m
), a0 AS (
  SELECT media_id, i,
         2 + 4 * (strpos('0123456789abcdef', substr(hex, i + 1, 1)) - 1) AS a
  FROM hx, (SELECT unnest(generate_series(0, 62)) AS i)
), s63 AS (
  SELECT media_id, sum(a) AS s FROM a0 GROUP BY media_id
), amp AS (
  -- gain cancels in every comparison (64*g*a vs g*sum), so the oracle
  -- computes the UNSCALED amplitudes for twins and originals alike.
  SELECT media_id, i, a FROM a0
  UNION ALL
  SELECT media_id, 63, 2 + (((1 - s) % 32) + 32) % 32 FROM s63
), tot AS (
  SELECT media_id, sum(a) AS s FROM amp GROUP BY 1
), fp AS (
  SELECT amp.media_id, sum({pack_bit}) AS bandhash
  FROM amp JOIN tot t USING (media_id) GROUP BY 1
)
SELECT x.media_id AS id1, y.media_id AS id2,
       CAST(bit_count(xor(x.bandhash, y.bandhash)) AS BIGINT) AS hamming
FROM fp x JOIN fp y ON x.media_id < y.media_id
WHERE bit_count(xor(x.bandhash, y.bandhash)) <= 3
ORDER BY id1, id2
"""


@query("q134_audio_fingerprint_dedup", oracle=_q134_oracle())
def q134(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual audio dedup end to end (J11's WAV kernel as a
    driver-hash-checked QUERY, completing the real-codec trio: q126
    pins the BMP image chain, this pins RIFF walk → PCM parse →
    channel average → band RMS → mean threshold → 64-bit pack →
    pigeonhole block join). Twins are 2x-gain re-encodes — the
    energy-envelope hash must be gain-invariant, and the oracle
    rebuilds the fingerprints from the md5 amplitude formulas in pure
    integer arithmetic (the gain cancels; ties are impossible by the
    sum ≡ 3 mod 32 construction, and every float the kernel touches is
    a/128 — exactly representable — so kernel and oracle provably
    agree bit for bit). Expected pairs: exactly the planted twins at
    hamming 0.

    Plan (100 TB shape): synthesis + decode are ONE narrow Arrow
    mapInPandas inside the scan (payloads never shuffle); pairing
    moves 64-bit fingerprints through the shared 4-block pigeonhole
    equi-join — never all-pairs, never waveform data.
    """
    from alt_spark.operators.multimodal import audio_bandhash, media_table

    docs = load_table(spark, sf, "documents").select("doc_id")
    meta_t = "struct<mime:string,width:int,height:int,duration_ms:bigint>"
    out_schema = f"media_id long, payload binary, meta {meta_t}"

    def synth(batches):
        import pandas as _pd

        meta = {
            "mime": "audio/wav",
            "width": None,
            "height": None,
            "duration_ms": 8,
        }
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ids.append(d)
                payloads.append(_snd_wav(_snd_amplitudes(d, 1)))
                if d % _SND_TWIN_MOD == 0:
                    ids.append(_SND_TWIN_BASE + d)
                    payloads.append(_snd_wav(_snd_amplitudes(d, _SND_GAIN)))
            yield _pd.DataFrame(
                {
                    "media_id": _pd.array(ids, dtype="Int64"),
                    "payload": payloads,
                    "meta": [meta] * len(ids),
                }
            )

    media = media_table(docs.mapInPandas(synth, schema=out_schema))
    fps = audio_bandhash(media).filter(F.col("bandhash").isNotNull())
    pairs = dedup.hamming_blocked_pairs(
        fps, "bandhash", "media_id", max_hamming=3, bands=4
    )
    return pairs.select(
        "id1", "id2", F.col("hamming").cast("long").alias("hamming")
    ).orderBy("id1", "id2")


# ---------------------------------------------------------------------------
@query(
    "q135_dedup_yield_report",
    oracle=f"""
WITH RECURSIVE {_minhash_pair_ctes()},
{_cc_closure_ctes()}, sizes AS (
  SELECT comp, count(*) AS k FROM comp GROUP BY comp
), n AS (
  SELECT count(*) AS n_corpus FROM documents
), hist AS (
  SELECT k AS cluster_size, count(*) AS n_clusters,
         CAST(k * count(*) AS BIGINT) AS n_docs,
         CAST((k - 1) * count(*) AS BIGINT) AS n_removable
  FROM sizes GROUP BY k
  UNION ALL
  SELECT 1, n.n_corpus - coalesce((SELECT sum(k) FROM sizes), 0),
         CAST(n.n_corpus - coalesce((SELECT sum(k) FROM sizes), 0) AS BIGINT),
         CAST(0 AS BIGINT)
  FROM n
)
SELECT cluster_size, n_clusters, n_docs, n_removable,
       CAST((10000 * n_removable) // (SELECT n_corpus FROM n) AS BIGINT)
         AS yield_pm
FROM hist
ORDER BY cluster_size
""",
)
def q135(spark: SparkSession, sf: str) -> DataFrame:
    """Dedup yield report — the go/no-go table an operator reads before
    scheduling the dedup batch: per near-dup cluster size k (q73's CC
    clusters over the q30 pair graph; size 1 = unclustered singletons),
    how many clusters, how many documents they hold, how many are
    REMOVABLE under keep-one-per-cluster (k-1 each), and that mass as a
    permyriad of the corpus. The reference stops at pair similarity;
    q73 adds the clusters; this is the capacity-planning rollup above
    them (what dedup will actually save).

    Plan (100 TB shape): reuses the CACHED MinHash pair frame and the
    converged CC label table (one signing + one closure serve q73/q77/
    q81/q90/q118/q121/q135 — at scale these are WRITTEN tables); above
    them the report is two combinable aggregates over label-table-sized
    input (comp sizes, then the size histogram) plus a 1-row corpus
    count — metadata-sized output, no corpus exchange at all beyond
    what the shared artifacts already paid.
    """
    from alt_spark.operators.graph import connected_components

    docs = load_table(spark, sf, "documents")
    pairs = dedup.minhash_near_dup(docs, threshold=0.7, portable=True)
    cc = connected_components(pairs)
    sizes = cc.groupBy("comp").agg(F.count("*").alias("k"))
    n_corpus = docs.agg(F.count("*").alias("n_corpus"))
    hist = sizes.groupBy(F.col("k").alias("cluster_size")).agg(
        F.count("*").alias("n_clusters"),
        (F.col("k") * F.count("*")).cast("long").alias("n_docs"),
        ((F.col("k") - 1) * F.count("*")).cast("long").alias("n_removable"),
    )
    clustered = sizes.agg(
        F.coalesce(F.sum("k"), F.lit(0)).alias("n_clustered")
    )
    singles = (
        n_corpus.crossJoin(clustered)
        .select(
            F.lit(1).alias("cluster_size"),
            (F.col("n_corpus") - F.col("n_clustered")).alias("n_clusters"),
            (F.col("n_corpus") - F.col("n_clustered"))
            .cast("long")
            .alias("n_docs"),
            F.lit(0).cast("long").alias("n_removable"),
        )
    )
    return (
        hist.unionByName(singles)
        .crossJoin(F.broadcast(n_corpus))
        .select(
            "cluster_size",
            "n_clusters",
            "n_docs",
            "n_removable",
            F.expr("CAST((10000 * n_removable) div n_corpus AS BIGINT)").alias(
                "yield_pm"
            ),
        )
        .orderBy("cluster_size")
    )
