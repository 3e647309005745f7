"""Q59-Q70 + Q72 + Q74/Q75: training-data preparation queries
(north-star pillar; Q71, the percentile twin, lives in relational.py;
Q73, near-dup clustering, in pipeline_ops.py beside its pair chain).

The ops between "clean corpus" and "token batches": deterministic data
mixing (operators/mixing.py), context-window chunking and sequence
packing (operators/packing.py), benchmark decontamination
(operators/dedup.decontaminate), PII scrubbing (functions/cleaning),
Gopher-style repetition filtering (functions/text_analysis.
repetition_metrics), char-n-gram LM corpus scoring (operators/lm), and
the trained quality classifier (operators/quality_clf — q69, rows-only
by design: MLlib L-BFGS), and temperature-balanced mixing
(operators/mixing.temperature_rates — q70, corpus-derived alpha=0.5
rates, integer-exact).
All are SQL-expressible and carry full DuckDB oracles — sampling
decisions, chunk contents (md5), bin assignments, surviving-document
sets, repetition numerators, and LM hit-sets are value-checked
cross-engine, not just counted. They are beyond the reference's own
surface (it has no training-export path); q59-q61 sit in the driver
report window since the r5 rotation, the rest in the documented tail,
and all run in-pytest oracle parity (tests/test_oracle.py) plus the
property suite (tests/test_training.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alt_spark.catalog import load_table
from alt_spark.functions.cleaning import ddb_scrub_pii
from alt_spark.functions.hashing import DDB_H60
from alt_spark.functions.text_analysis import DDB_TOKENS as _DDB_TOKENS
from alt_spark.operators.bloom import ddb_bloom_probe, ddb_bloom_words
from alt_spark.operators.dedup import tokens_col
from alt_spark.plans import dfcache as _dfcache
from alt_spark.operators.mixing import ddb_sample_bucket, stratified_sample
from alt_spark.operators.packing import chunk_tokens, pack_contiguous
from alt_spark.queries import query
from alt_spark.queries.planted import values_sql

# The mixing config under test: permyriad keep-rates per language.
_RATES = {"en": 8000, "de": 5000, "fr": 2500, "es": 2500, "zh": 1000}
_SALT = "mix-v1"


def _tokens_col():
    return tokens_col("text")


def _rate_case() -> str:
    arms = " ".join(f"WHEN '{k}' THEN {v}" for k, v in _RATES.items())
    return f"(CASE lang {arms} ELSE 0 END)"


# ---------------------------------------------------------------------------
@query(
    "q59_stratified_mixing",
    oracle=f"""
WITH kept AS (
  SELECT lang, doc_id
  FROM documents
  WHERE {ddb_sample_bucket('doc_id', _SALT)} < {_rate_case()}
)
SELECT lang,
       count(*) AS n_kept,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM kept
GROUP BY lang
ORDER BY lang
""",
)
def q59(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic per-language mixing sample: survivors and an id
    checksum per stratum (the checksum pins the exact kept SET, so the
    oracle verifies row-level sampling decisions, not counts).

    Plan: narrow filter inside the scan stage (one md5 + integer mod per
    row), then one bounded groupBy — the 100 TB shape of a mixing pass.
    """
    docs = load_table(spark, sf, "documents")
    kept = stratified_sample(docs, _RATES, "lang", "doc_id", salt=_SALT)
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
_CHUNK, _STRIDE = 32, 24


@query(
    "q60_context_chunks",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, {_DDB_TOKENS} AS toks FROM documents
), starts AS (
  SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 1, {_STRIDE})) AS s
  FROM tok WHERE len(toks) > 0
)
SELECT doc_id AS id,
       CAST(s / {_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(least({_CHUNK}, len(toks) - s) AS BIGINT) AS n_tok,
       md5(array_to_string(list_slice(toks, s + 1, least(s + {_CHUNK}, len(toks))), ' ')) AS chunk_md5
FROM starts
""",
)
def q60(spark: SparkSession, sf: str) -> DataFrame:
    """Overlapping context-window chunks (32-token windows, stride 24)
    with per-chunk content digests — the md5 column makes the oracle
    compare chunk CONTENT, so slicing off-by-ones cannot pass.

    Plan: pure in-row projection (sequence/slice/posexplode), zero
    shuffles — chunking 100 TB is exactly as parallel as scanning it.
    """
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    chunks = chunk_tokens(
        docs.withColumn("toks", _tokens_col()),
        F.col("toks"),
        id_col="doc_id",
        max_tokens=_CHUNK,
        stride=_STRIDE,
    )
    return chunks.select(
        "id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("n_tok").cast("long").alias("n_tok"),
        F.md5(F.col("chunk_text")).alias("chunk_md5"),
    )


# ---------------------------------------------------------------------------
_BUDGET = 256


@query(
    "q61_sequence_packing",
    oracle=f"""
WITH t AS (
  SELECT lang, doc_id, len({_DDB_TOKENS}) AS n_tok FROM documents
), binned AS (
  SELECT lang, n_tok,
         CAST(floor(coalesce(sum(n_tok) OVER (
             PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) / {_BUDGET}) AS BIGINT) AS bin
  FROM t
)
SELECT lang, bin,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS tok_sum
FROM binned
GROUP BY lang, bin
ORDER BY lang, bin
""",
)
def q61(spark: SparkSession, sf: str) -> DataFrame:
    """Contiguous sequence packing into ~256-token training bins, per
    language shard: bin roster summary (docs and token sum per bin).

    Plan: one hash-partitioned window per shard (no global sort, no
    single-partition exchange) + one bounded groupBy. The FFD variant
    (operators/packing.pack_ffd) is property-tested in
    tests/test_training.py; this contiguous form is the oracle-exact
    scale default.
    """
    docs = load_table(spark, sf, "documents")
    t = docs.select("lang", "doc_id", F.size(_tokens_col()).cast("long").alias("n_tok"))
    binned = pack_contiguous(t, "n_tok", _BUDGET, shard_col="lang", order_col="doc_id")
    return (
        binned.groupBy("lang", "bin")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("tok_sum"))
        .orderBy("lang", "bin")
    )


# ---------------------------------------------------------------------------
_DECON_N = 5


@query(
    "q62_decontamination",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, lang, {_DDB_TOKENS} AS toks FROM documents
), grams AS (
  SELECT doc_id,
         array_to_string(list_slice(toks, s + 1, s + {_DECON_N}), ' ') AS g
  FROM (
    SELECT doc_id, toks, unnest(generate_series(0, len(toks) - {_DECON_N}, 1)) AS s
    FROM tok WHERE len(toks) >= {_DECON_N}
  )
), bench_g AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0
), contaminated AS (
  SELECT DISTINCT doc_id FROM grams
  WHERE doc_id % 50 <> 0 AND g IN (SELECT g FROM bench_g)
)
SELECT lang,
       count(*) AS n_kept,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM documents
WHERE doc_id % 50 <> 0
  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
GROUP BY lang
ORDER BY lang
""",
)
def q62(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: every 50th document plays the eval
    benchmark; corpus documents sharing any 5-gram with it are removed
    (the n-gram-overlap rule LLM training pipelines apply before
    training). The id checksum pins the exact surviving SET.

    Plan: benchmark grams broadcast (eval-suite-sized); the corpus side
    is scan → shingles → broadcast semi-join → anti-join — the corpus
    is never shuffled by the contamination check. Oracle replays the
    string-gram form; the production xxhash64-gram form is equality-
    tested in tests/test_training.py.
    """
    docs = load_table(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    from alt_spark.operators.dedup import decontaminate

    clean = decontaminate(corpus, bench, n=_DECON_N, hash_grams=False)
    return (
        clean.groupBy("lang")
        .agg(F.count("*").alias("n_kept"), F.sum("doc_id").alias("id_checksum"))
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Planted PII rows: the synthetic corpus is PII-free, so the scrub is
# exercised by a deterministic literal extension identical in both
# engines (same device as q29's CJK probe rows). NEGATIVE ids — fixed
# positive ids would collide with generated doc_ids once the corpus
# grows past them (the q75/r6-ADVICE hazard class); the canary
# test_q75_planted_ids_cannot_collide pins generated ids non-negative.
_PII_EXTRA: tuple[tuple[int, str], ...] = (
    (-21, "contact me at alice@example.com or visit https://example.com/page?q=1 soon"),
    (-22, "server at 192.168.1.10 called +1 (555) 123-4567 yesterday"),
    (-23, "mirror https://a.b/c linked from bob.smith+x@mail.co today"),
    (-24, "no identifiers here just ordinary words"),
)


def _pii_values_sql() -> str:
    return values_sql(_PII_EXTRA)


@query(
    "q63_pii_scrub",
    oracle=f"""
WITH unioned AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id, text FROM {_pii_values_sql()}
), scrubbed AS (
  SELECT doc_id, {ddb_scrub_pii('text')} AS clean
  FROM unioned
)
SELECT doc_id,
       md5(clean) AS scrubbed_md5,
       CAST(len(regexp_extract_all(clean, '\\[(URL|EMAIL|IP|PHONE)\\]')) AS BIGINT) AS n_redacted
FROM scrubbed
""",
)
def q63(spark: SparkSession, sf: str) -> DataFrame:
    """PII redaction over the corpus plus planted identifier rows: the
    md5 of every scrubbed document pins exact replacement behavior
    (pattern order included), and n_redacted counts typed placeholders.

    Plan: a chain of JVM-side regexp_replace in one narrow projection —
    scrubbing 100 TB is scan-speed, no shuffle, no UDF.
    """
    from alt_spark.functions.cleaning import scrub_pii

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    extra = spark.createDataFrame(list(_PII_EXTRA), ["doc_id", "text"])
    unioned = docs.unionByName(extra)
    clean = scrub_pii(F.col("text"))
    return unioned.select(
        "doc_id",
        F.md5(clean).alias("scrubbed_md5"),
        F.regexp_count(clean, F.lit(r"\[(URL|EMAIL|IP|PHONE)\]"))
        .cast("long")
        .alias("n_redacted"),
    )


# ---------------------------------------------------------------------------
# Gopher repetition-filter thresholds (Rae et al. 2021 Table A1 shape),
# in permyriad of document characters: fraction covered by the most
# common word n-gram (n=2,3,4) and by duplicated 5-grams.
_REP_CAPS = {2: 2000, 3: 1800, 4: 1600}
_DUP5_CAP = 1500
_REP_NS = (2, 3, 4, 5)


@query(
    "q64_repetition_filter",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, length(text) AS n_chars, {_DDB_TOKENS} AS toks FROM documents
), g AS (
  SELECT doc_id, n, array_to_string(list_slice(toks, s + 1, s + n), ' ') AS gram
  FROM (
    SELECT doc_id, toks, n, unnest(generate_series(0, len(toks) - n)) AS s
    FROM tok CROSS JOIN (VALUES (2), (3), (4), (5)) ns(n)
    WHERE len(toks) >= n
  )
), cnt AS (
  SELECT doc_id, n, gram, count(*) AS c FROM g GROUP BY doc_id, n, gram
), agg AS (
  SELECT doc_id, n,
         max(c * length(gram)) AS top_cov,
         coalesce(sum(CASE WHEN c > 1 THEN c * length(gram) END), 0) AS dup_chars
  FROM cnt GROUP BY doc_id, n
), piv AS (
  SELECT t.doc_id, t.n_chars,
         coalesce(max(CASE WHEN a.n = 2 THEN a.top_cov END), 0) AS t2,
         coalesce(max(CASE WHEN a.n = 3 THEN a.top_cov END), 0) AS t3,
         coalesce(max(CASE WHEN a.n = 4 THEN a.top_cov END), 0) AS t4,
         coalesce(max(CASE WHEN a.n = 5 THEN a.dup_chars END), 0) AS d5
  FROM tok t LEFT JOIN agg a ON t.doc_id = a.doc_id
  GROUP BY t.doc_id, t.n_chars
)
SELECT doc_id,
       CAST((10000 * t2) // n_chars AS BIGINT) AS top2_permyriad,
       CAST((10000 * t3) // n_chars AS BIGINT) AS top3_permyriad,
       CAST((10000 * t4) // n_chars AS BIGINT) AS top4_permyriad,
       CAST((10000 * d5) // n_chars AS BIGINT) AS dup5_permyriad,
       CAST(CASE WHEN (10000 * t2) // n_chars <= {_REP_CAPS[2]}
                  AND (10000 * t3) // n_chars <= {_REP_CAPS[3]}
                  AND (10000 * t4) // n_chars <= {_REP_CAPS[4]}
                  AND (10000 * d5) // n_chars <= {_DUP5_CAP}
            THEN 1 ELSE 0 END AS BIGINT) AS keep_flag
FROM piv
""",
)
def q64(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition filter: per document, the characters
    covered by the most common word 2/3/4-gram and by duplicated
    5-grams, as permyriad of document length, plus the keep decision.

    Plan: the metrics are computed fully in-row (sorted gram array +
    one aggregate pass — functions/text_analysis.repetition_metrics),
    so the whole query is a single narrow projection with zero
    exchanges: at 100 TB this filter runs at scan speed. The oracle
    replays the semantics through the explode + GROUP BY form, so the
    in-row run-length trick is value-checked against the obvious
    definition, not against itself.
    """
    from alt_spark.functions.text_analysis import repetition_metrics

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        _tokens_col().alias("toks"),
    )
    scored = toks.select(
        "doc_id",
        "n_chars",
        *[
            repetition_metrics(F.col("toks"), n).alias(f"m{n}")
            for n in _REP_NS
        ],
    )
    permyriad = {
        "top2_permyriad": "(10000 * m2.top_cov) div n_chars",
        "top3_permyriad": "(10000 * m3.top_cov) div n_chars",
        "top4_permyriad": "(10000 * m4.top_cov) div n_chars",
        "dup5_permyriad": "(10000 * m5.dup_chars) div n_chars",
    }
    keep = (
        f"CASE WHEN {permyriad['top2_permyriad']} <= {_REP_CAPS[2]}"
        f" AND {permyriad['top3_permyriad']} <= {_REP_CAPS[3]}"
        f" AND {permyriad['top4_permyriad']} <= {_REP_CAPS[4]}"
        f" AND {permyriad['dup5_permyriad']} <= {_DUP5_CAP}"
        " THEN 1 ELSE 0 END"
    )
    return scored.select(
        "doc_id",
        *[F.expr(sql).cast("long").alias(name) for name, sql in permyriad.items()],
        F.expr(keep).cast("long").alias("keep_flag"),
    )


# ---------------------------------------------------------------------------
_LM_N, _LM_MIN_COUNT = 3, 5


def _lm_gram_ctes() -> str:
    """The char-LM gram CTEs (lowered text -> one row per char n-gram)
    shared verbatim by the q65 / q72 / q76 oracles — one definition of
    the vocabulary window, so a guard or n change cannot silently
    diverge the three oracles (the pipeline_ops._minhash_pair_ctes
    pattern)."""
    return f"""low AS (
  SELECT doc_id, lower(text) AS t FROM documents
), grams AS (
  SELECT doc_id, substr(t, s, {_LM_N}) AS g
  FROM (
    SELECT doc_id, t, unnest(generate_series(1, length(t) - {_LM_N - 1})) AS s
    FROM low WHERE length(t) >= {_LM_N}
  )
)"""


def _lm_model_cte() -> str:
    """The full-corpus model CTE (q65/q76; q72 trains on a sampled
    slice and declares its own model over the same gram CTEs)."""
    return f"""model AS (
  SELECT g, count(*) AS cnt FROM grams GROUP BY g
  HAVING count(*) >= {_LM_MIN_COUNT}
)"""


@query(
    "q65_charlm_score",
    oracle=f"""
WITH {_lm_gram_ctes()}, {_lm_model_cte()}, sc AS (
  SELECT gr.doc_id,
         count(*) AS n_grams,
         sum(CASE WHEN m.g IS NULL THEN 1 ELSE 0 END) AS n_oov,
         coalesce(sum(m.cnt), 0) AS fsum
  FROM grams gr LEFT JOIN model m ON gr.g = m.g
  GROUP BY gr.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(sc.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(CASE WHEN coalesce(sc.n_grams, 0) = 0 THEN 0
                 ELSE (10000 * sc.n_oov) // sc.n_grams END AS BIGINT)
         AS oov_permyriad,
       CAST(coalesce(sc.fsum, 0) AS BIGINT) AS freq_checksum
FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
""",
)
def q65(spark: SparkSession, sf: str) -> DataFrame:
    """Char-trigram LM corpus scoring (CCNet/KenLM-style quality gate):
    train the gram table on the corpus itself, then score every doc.
    The oracle surface is integer-only — gram count, OOV permyriad
    (exact integer division), and the sum of matched model counts,
    which pins the exact hit multiset; the float surprisal column the
    operator also provides is tolerance-tested in pytest, never
    hash-compared (operators/lm.py for the 100 TB shape: bounded-
    vocabulary partial aggregation + broadcast model).
    """
    from alt_spark.operators.lm import score_against_lm, train_char_lm

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    model = train_char_lm(docs, n=_LM_N, min_count=_LM_MIN_COUNT)
    return score_against_lm(docs, model, n=_LM_N).drop(
        "avg_surprisal", "model_total"
    )


# ---------------------------------------------------------------------------
_PREP_MIN_CHARS, _PREP_MIN_TOKS = 100, 20


@query(
    "q66_corpus_prep_pipeline",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, lang, text, length(text) AS n_chars, {_DDB_TOKENS} AS toks
  FROM documents
), valid AS (
  SELECT doc_id, lang, text, toks FROM tok
  WHERE n_chars >= {_PREP_MIN_CHARS} AND len(toks) >= {_PREP_MIN_TOKS}
), survivors AS (
  SELECT min(doc_id) AS doc_id FROM valid GROUP BY text
), dedup AS (
  SELECT v.* FROM valid v JOIN survivors s ON v.doc_id = s.doc_id
), grams AS (
  SELECT doc_id, array_to_string(list_slice(toks, s + 1, s + {_DECON_N}), ' ') AS g
  FROM (
    SELECT doc_id, toks, unnest(generate_series(0, len(toks) - {_DECON_N})) AS s
    FROM tok WHERE len(toks) >= {_DECON_N}
  )
), bench_g AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0
), contaminated AS (
  SELECT DISTINCT doc_id FROM grams WHERE g IN (SELECT g FROM bench_g)
), clean AS (
  SELECT d.* FROM dedup d
  WHERE d.doc_id % 50 <> 0
    AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
), mixed AS (
  SELECT doc_id, lang, len(toks) AS n_tok FROM clean
  WHERE {ddb_sample_bucket('doc_id', _SALT)} < {_rate_case()}
), binned AS (
  SELECT lang, doc_id, n_tok,
         CAST(floor(coalesce(sum(n_tok) OVER (
             PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) / {_BUDGET}) AS BIGINT) AS bin
  FROM mixed
)
SELECT lang,
       count(*) AS n_docs,
       CAST(count(DISTINCT bin) AS BIGINT) AS n_bins,
       CAST(sum(n_tok) AS BIGINT) AS tok_sum,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM binned
GROUP BY lang
ORDER BY lang
""",
)
def q66(spark: SparkSession, sf: str) -> DataFrame:
    """The end-to-end corpus-prep pipeline as ONE composed plan:
    validity gate → exact dedup → benchmark decontamination →
    stratified mixing → sequence packing, reported as a per-language
    training manifest (docs, bins, token sum, and an id checksum that
    pins the exact surviving document set through all five stages).

    This is the integration query for the training-data family: each
    stage is the same operator the standalone queries (q17, q59, q61,
    q62) check in isolation, composed here so a cross-stage contract
    break (a dropped column, a stage reordering, a dedup that loses the
    token array) fails the hash even if every unit oracle stays green.

    Plan shape at 100 TB: the validity gate and the mixing predicate
    are narrow filters inside the scan stage; dedup is one
    hash-partitioned window on the content hash; decontamination
    broadcasts the benchmark gram set (corpus never shuffled by it);
    packing is one hash-partitioned window per language shard. No
    global sorts, no all-pairs joins, nothing driver-side.
    """
    from alt_spark.operators.dedup import decontaminate, exact_dedup

    docs = load_table(spark, sf, "documents")
    # Reduce the token ARRAY to its count inside the scan stage: the
    # dedup window exchange then carries (doc_id, lang, text, n_tok)
    # instead of the materialized array (which decontaminate would
    # ignore anyway — shingle_rows re-tokenizes from text), roughly
    # halving the widest shuffle in the plan.
    toks = docs.select(
        "doc_id", "lang", "text", F.size(_tokens_col()).cast("long").alias("n_tok")
    )
    valid = toks.filter(
        (F.length("text") >= _PREP_MIN_CHARS)
        & (F.col("n_tok") >= _PREP_MIN_TOKS)
    )
    dedup = exact_dedup(valid).drop("n_dups")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = dedup.filter(F.col("doc_id") % 50 != 0)
    clean = decontaminate(corpus, bench, n=_DECON_N, hash_grams=False)
    mixed = stratified_sample(clean, _RATES, "lang", "doc_id", salt=_SALT)
    sized = mixed.select("lang", "doc_id", "n_tok")
    binned = pack_contiguous(
        sized, "n_tok", _BUDGET, shard_col="lang", order_col="doc_id"
    )
    return (
        binned.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("bin").cast("long").alias("n_bins"),
            F.sum("n_tok").alias("tok_sum"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
_SEG_W = 4  # token-window width for CCNet-style segment dedup


@query(
    "q67_segment_dedup",
    oracle=f"""
WITH toks AS (
  SELECT doc_id AS id, {_DDB_TOKENS} AS t FROM documents
), lines AS (
  SELECT id, s AS seg_no,
         array_to_string(list_slice(t, s * {_SEG_W} + 1, s * {_SEG_W} + {_SEG_W}), ' ') AS seg
  FROM (
    SELECT id, t,
           unnest(generate_series(0, CAST(ceil(len(t) / {_SEG_W}.0) AS BIGINT) - 1, 1)) AS s
    FROM toks WHERE len(t) > 0
  )
), dup AS (
  SELECT seg FROM lines GROUP BY seg HAVING count(DISTINCT id) >= 2
), per_doc AS (
  SELECT l.id,
         count(*) FILTER (WHERE d.seg IS NULL) AS n_kept,
         count(*) FILTER (WHERE d.seg IS NOT NULL) AS n_removed,
         md5(coalesce(
           string_agg(l.seg, ' ' ORDER BY l.seg_no) FILTER (WHERE d.seg IS NULL),
           '')) AS clean_md5
  FROM lines l LEFT JOIN dup d USING (seg)
  GROUP BY l.id
)
SELECT docs.doc_id,
       coalesce(p.n_kept, 0) AS n_kept,
       coalesce(p.n_removed, 0) AS n_removed,
       coalesce(p.clean_md5, md5('')) AS clean_md5
FROM documents docs LEFT JOIN per_doc p ON p.id = docs.doc_id
ORDER BY doc_id
""",
)
def q67(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style duplicated-segment removal: drop every 4-token
    window whose exact text occurs in >= 2 distinct documents, then
    reassemble each document from its surviving segments in order. The
    per-document md5 of the reassembled text pins segment CONTENT and
    ORDER, not just counts — the oracle verifies the exact surviving
    byte stream.

    Plan: segments explode in-row, the duplicate set is one groupBy on
    the segment key, membership one key-equi join, reassembly one
    per-document collect_list — every exchange is keyed, nothing is
    pairwise. Oracle replays the string-segment form; the production
    xxhash64-keyed form is equality-tested in tests/test_training.py.
    """
    from alt_spark.operators.dedup import segment_dedup

    docs = load_table(spark, sf, "documents")
    clean = segment_dedup(docs, width=_SEG_W, hash_segs=False)
    return clean.select(
        F.col("id").alias("doc_id"),
        "n_kept",
        "n_removed",
        F.md5("clean_text").alias("clean_md5"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
_SHUF_SALT = "shuffle-v1"
_N_SHARDS = 16


@query(
    "q68_shuffle_shards",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id,
         {DDB_H60("'" + _SHUF_SALT + ":' || CAST(doc_id AS VARCHAR)")} AS k
  FROM documents
), ranked AS (
  SELECT doc_id, k % {_N_SHARDS} AS shard,
         row_number() OVER (PARTITION BY k % {_N_SHARDS} ORDER BY k, doc_id) - 1 AS pos
  FROM keyed
)
SELECT shard,
       count(*) AS n_docs,
       CAST(sum((pos + 1) * doc_id) AS BIGINT) AS order_checksum,
       min(CASE WHEN pos = 0 THEN doc_id END) AS head_doc
FROM ranked
GROUP BY shard
ORDER BY shard
""",
)
def q68(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic corpus shuffle + sharding (training export): every
    document gets a salted-hash shuffle key, a shard = key mod 16, and a pseudo-random position within its shard. The
    position-weighted checksum pins the exact ORDER of every shard, and
    head_doc pins each shard's first document — the oracle verifies the
    permutation itself, not just shard sizes.

    Plan: one md5 per row inside the scan stage, one hash exchange
    keyed by shard, one per-shard window sort. n_shards bounds the sort
    (10k shards at 100 TB → ~10 GB external sorts); never a global sort.
    """
    from alt_spark.operators.packing import shuffle_shards

    docs = load_table(spark, sf, "documents").select("doc_id")
    sharded = shuffle_shards(docs, "doc_id", _N_SHARDS, _SHUF_SALT)
    return (
        sharded.groupBy(F.col("shard").cast("long").alias("shard"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("pos") + 1) * F.col("doc_id")).alias("order_checksum"),
            F.min(F.when(F.col("pos") == 0, F.col("doc_id"))).alias("head_doc"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
@query("q69_quality_classifier")
def q69(spark: SparkSession, sf: str) -> DataFrame:
    """Trained quality-gate profile (rows-only by design: L-BFGS
    logistic regression is not SQL-expressible — the learning itself is
    property-tested in tests/test_training.py: held-out AUC, planted
    junk-vs-clean separation, scoring determinism).

    Bootstrap labels from the heuristic quality median, fit the hashed
    bag-of-words logistic regression, score every document, and report
    the per-source gate profile. Plan: featurize+score is a broadcast
    coefficient vector applied at scan speed; training moves one
    2^12-double gradient per task per iteration.
    """
    from alt_spark.operators.quality_clf import (
        bootstrap_labels,
        score_quality,
        train_quality_classifier,
    )

    docs = load_table(spark, sf, "documents").select("doc_id", "source", "text")
    # Train on a 20% deterministic sample, score the whole corpus — the
    # standard production shape (the gate model never needs the full
    # corpus to fit; measured ~2x cheaper at sf0.1 with identical
    # downstream behavior on the bootstrap task). The sample comes from
    # the engine's salted-hash sampler, not an id modulo — unbiased
    # under any id-assignment pattern (operators/mixing.py doctrine).
    from alt_spark.operators.mixing import sample_bucket

    labeled = bootstrap_labels(docs)
    model = train_quality_classifier(
        labeled.filter(sample_bucket("doc_id", "qclf-train-v1") < 2000)
    )
    scored = score_quality(model, docs).withColumnRenamed("id", "doc_id")
    # Order-insensitive reporting surface: keep_prob is deterministic
    # PER ROW (broadcast coefficients dotted with hashed features), but
    # a float AVG sums in partition order — a rounded digit could flip
    # across cluster layouts. Round each row to an integer permyriad
    # FIRST, then aggregate with exact integer arithmetic: the result
    # is identical under any partitioning of the same scored rows.
    return (
        docs.select("doc_id", "source")
        .join(scored, "doc_id")
        .withColumn(
            "keep_permyriad", F.round(F.col("keep_prob") * 10000).cast("long")
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.expr("sum(keep_permyriad) div count(*)").alias(
                "avg_keep_permyriad"
            ),
            F.count(F.when(F.col("keep_prob") >= 0.5, 1)).alias("n_keep"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
_TEMP_SALT = "temp-mix-v1"
_TEMP_BUDGET = 5000  # keep ~half the corpus overall


@query(
    "q70_temperature_mixing",
    oracle=f"""
WITH c AS (
  SELECT lang, count(*) AS n FROM documents GROUP BY lang
), w AS (
  SELECT lang, n, CAST(floor(sqrt(n)) AS BIGINT) AS w FROM c
), t AS (
  SELECT sum(w) AS tw, sum(n) AS tn FROM w
), r AS (
  SELECT lang, n,
         CAST(least(10000,
               (10000 * ((((tn * {_TEMP_BUDGET}) // 10000) * w) // tw)) // n
         ) AS BIGINT) AS rate
  FROM w, t
)
SELECT d.lang,
       r.n AS n_total,
       r.rate AS rate_permyriad,
       count(*) FILTER (WHERE {ddb_sample_bucket('d.doc_id', _TEMP_SALT)} < r.rate) AS n_kept,
       CAST(coalesce(sum(d.doc_id) FILTER (
         WHERE {ddb_sample_bucket('d.doc_id', _TEMP_SALT)} < r.rate), 0) AS BIGINT) AS id_checksum
FROM documents d JOIN r ON d.lang = r.lang
GROUP BY d.lang, r.n, r.rate
ORDER BY d.lang
""",
)
def q70(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-balanced mixing (alpha = 0.5): keep-rates derived
    from the corpus itself so the sampled mixture follows sqrt(n_lang)
    — rare languages get boosted relative to proportional sampling,
    the standard multilingual re-weighting. Compare q59, which applies
    FIXED declared rates; this derives them, then applies the same
    deterministic md5-bucket keep decision. The id checksum pins the
    exact kept SET per stratum, and the integer-only rate chain
    (floor-sqrt weights, integer division) makes each derived rate
    itself oracle-exact.

    Plan: one bounded groupBy for counts, a broadcast rate table, one
    narrow scan-stage keep predicate — at 100 TB the re-weighting adds
    one tiny aggregate to a plain filtered scan.
    """
    from alt_spark.operators.mixing import sample_bucket, temperature_rates

    docs = load_table(spark, sf, "documents")
    rates = temperature_rates(docs, "lang", budget_permyriad=_TEMP_BUDGET)
    keep = sample_bucket("doc_id", _TEMP_SALT) < F.col("rate")
    return (
        docs.join(F.broadcast(rates), "lang")
        .groupBy("lang", F.col("n").alias("n_total"), F.col("rate").alias("rate_permyriad"))
        .agg(
            F.count(F.when(keep, 1)).alias("n_kept"),
            F.coalesce(F.sum(F.when(keep, F.col("doc_id"))), F.lit(0)).alias(
                "id_checksum"
            ),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
_TYP_MIN = 56  # min avg gram probability, permyriad (scale-free typicality)
_LM_TRAIN_SALT = "lm-train-v1"
_LM_TRAIN_RATE = 2000  # permyriad: train the gate model on a 20% trusted slice


@query(
    "q72_quality_gate_pipeline",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, lang, length(text) AS n_chars, {_DDB_TOKENS} AS toks
  FROM documents
), valid AS (
  SELECT doc_id, lang, n_chars, toks FROM tok
  WHERE n_chars >= {_PREP_MIN_CHARS} AND len(toks) >= {_PREP_MIN_TOKS}
), g2 AS (
  SELECT doc_id, array_to_string(list_slice(toks, s + 1, s + 2), ' ') AS gram
  FROM (
    SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 2)) AS s
    FROM valid
  )
), rep AS (
  SELECT doc_id, max(c * length(gram)) AS t2
  FROM (SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY doc_id, gram)
  GROUP BY doc_id
), {_lm_gram_ctes()}, model AS (
  SELECT g, count(*) AS cnt FROM grams
  WHERE doc_id IN (
    SELECT doc_id FROM documents
    WHERE {ddb_sample_bucket('doc_id', _LM_TRAIN_SALT)} < {_LM_TRAIN_RATE}
  )
  GROUP BY g
  HAVING count(*) >= {_LM_MIN_COUNT}
), tot AS (
  SELECT sum(cnt) AS model_total FROM model
), sc AS (
  SELECT gr.doc_id, count(*) AS n_grams, coalesce(sum(m.cnt), 0) AS fsum
  FROM grams gr LEFT JOIN model m ON gr.g = m.g
  GROUP BY gr.doc_id
), kept AS (
  SELECT v.lang, v.doc_id, sc.n_grams
  FROM valid v
  JOIN rep ON rep.doc_id = v.doc_id
  JOIN sc ON sc.doc_id = v.doc_id
  CROSS JOIN tot
  WHERE (10000 * rep.t2) // v.n_chars <= {_REP_CAPS[2]}
    AND ((10000 * sc.fsum) // sc.n_grams) // tot.model_total >= {_TYP_MIN}
)
SELECT lang,
       count(*) AS n_kept,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum,
       CAST(sum(n_grams) AS BIGINT) AS gram_sum
FROM kept
GROUP BY lang
ORDER BY lang
""",
)
def q72(spark: SparkSession, sf: str) -> DataFrame:
    """The QUALITY-gate pipeline as ONE composed plan — the content
    sibling of q66's structural pipeline: validity gate → Gopher
    repetition gate (top-2-gram coverage cap) → char-LM typicality gate
    (average model probability of the doc's grams, in permyriad — the
    scale-free form of the CCNet perplexity cut: counts cancel corpus
    size, so the same threshold holds at any SF) → per-language
    manifest. The id checksum pins the exact surviving set through all
    three gates; gram_sum additionally pins the survivors' LM view.

    Plan shape at 100 TB: ONE fused corpus scan — validity and
    repetition are in-row below the gram explode (q64's plan-pinned
    kernel, computed once per doc in the pre-Generate projection and
    carried through the scorer's partial aggregation), the LM stages
    are the bounded-vocabulary groupBy + broadcast-model join of q65,
    and the per-doc metrics collapse back in the SAME aggregation that
    folds gram rows — no second read of the corpus, no rep-vs-scored
    doc_id re-join (r6: this halved the text decodes and removed one
    shuffle vs the two-path r5 plan). No all-pairs, no global sorts,
    nothing driver-side beyond the cached bounded model.
    """
    from alt_spark.functions.text_analysis import repetition_metrics
    from alt_spark.operators.lm import score_against_lm, train_char_lm
    from alt_spark.operators.mixing import sample_bucket

    docs = load_table(spark, sf, "documents")
    # Layered projections (the q48 lesson): toks is NAMED in its own
    # layer (referenced many times by repetition_metrics), t2/n_chars
    # in the next; both ride the scorer's pre-explode projection.
    toks_layer = docs.select(
        "doc_id",
        "lang",
        "text",
        F.length("text").alias("n_chars"),
        _tokens_col().alias("toks"),
    )
    valid = toks_layer.filter(
        (F.col("n_chars") >= _PREP_MIN_CHARS)
        & (F.size("toks") >= _PREP_MIN_TOKS)
    )
    rep = valid.select(
        "doc_id",
        "lang",
        "text",
        "n_chars",
        repetition_metrics(F.col("toks"), 2)["top_cov"].alias("t2"),
    )
    # CCNet shape: the LM trains on a deterministic trusted SLICE (20%
    # via the salted-hash sampler), scores the whole corpus — the model
    # never needs the full corpus, and the typicality threshold is
    # scale-free so the same cap holds (distribution probed identical
    # under full and sampled models at sf0.001/sf0.01).
    train_slice = docs.filter(
        sample_bucket("doc_id", _LM_TRAIN_SALT) < _LM_TRAIN_RATE
    )
    model = train_char_lm(train_slice, n=_LM_N, min_count=_LM_MIN_COUNT)
    # Fused scoring: validity-gated docs all satisfy the carry contract
    # (n_chars >= 100 >= n), and scoring only valid docs matches the
    # oracle — per-doc scores are independent of other documents, and
    # the gates intersect with validity anyway. model_total comes
    # exposed from the scorer — no second aggregation over the model.
    scored = score_against_lm(
        rep, model, n=_LM_N, carry=("lang", "n_chars", "t2")
    )
    # freq_checksum is corpus-scale (a sum of model gram counts), so the
    # 10000x scaling runs in DECIMAL(38,0): at 100 TB the int64 product
    # would wrap silently (ANSI off) and flip keep decisions, while
    # DuckDB's HUGEINT side stays exact. Spark's `div` (IntegralDivide)
    # accepts decimal operands and returns BIGINT; the first quotient is
    # <= 10000 * max(model cnt) <= 10000 * model_total, which fits long
    # whenever the model itself does — so only the one unbounded
    # intermediate needs the wide type. Value-identical at test SFs
    # (oracle-pinned); exact at any SF. The repetition chain stays int64:
    # t2 <= n-gram chars of ONE document, a per-doc quantity.
    kept = scored.filter(
        (F.expr("(10000 * t2) div n_chars") <= _REP_CAPS[2])
        & (
            F.expr(
                "((10000 * CAST(freq_checksum AS DECIMAL(38,0)))"
                " div n_grams) div model_total"
            )
            >= _TYP_MIN
        )
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("doc_id").alias("id_checksum"),
            F.sum("n_grams").alias("gram_sum"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
_PLAN_BUDGET = 50_000  # training-run token budget for the q74 plan
_PLAN_EPOCH_CAP = 25_000  # permyriad: never draw a stratum more than 2.5x


def _plan_ctes() -> str:
    """The token-budget-plan chain over per-document token counts —
    shared verbatim by the q74 (plan table) and q79 (materialized
    draw) oracles, so a tempering or cap fix cannot silently diverge
    the plan a draw replays. ``planned`` ends with one row per lang
    carrying the full plan including ``planned_tok``."""
    return f"""t AS (
  SELECT doc_id, lang, len({_DDB_TOKENS}) AS n_tok FROM documents
), c AS (
  SELECT lang, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS avail_tok
  FROM t GROUP BY lang
), w AS (
  SELECT lang, n_docs, avail_tok,
         CAST(floor(sqrt(avail_tok)) AS BIGINT) AS weight
  FROM c
), tot AS (
  SELECT sum(weight) AS tw FROM w
), plan AS (
  SELECT lang, n_docs, avail_tok, weight,
         ({_PLAN_BUDGET} * weight) // greatest(tw, 1) AS target_tok
  FROM w, tot
), ep AS (
  SELECT *, least({_PLAN_EPOCH_CAP},
                  (10000 * target_tok) // greatest(avail_tok, 1)) AS epochs_permyriad
  FROM plan
), planned AS (
  SELECT *, (avail_tok * epochs_permyriad) // 10000 AS planned_tok FROM ep
)"""


@query(
    "q74_token_budget_plan",
    oracle=f"""
WITH {_plan_ctes()}
SELECT lang, n_docs, avail_tok, weight,
       CAST(target_tok AS BIGINT) AS target_tok,
       CAST(epochs_permyriad AS BIGINT) AS epochs_permyriad,
       CAST(planned_tok AS BIGINT) AS planned_tok
FROM planned
ORDER BY lang
""",
)
def q74(spark: SparkSession, sf: str) -> DataFrame:
    """Training-run token-budget plan per language: sqrt-tempered
    budget shares with an epoch cap (operators/mixing.
    token_budget_plan) — the curriculum table a run derives before any
    sampling happens (the LLaMA/Gopher data-mixture step). Every column
    is integer-exact, so the oracle pins the full plan: availability,
    tempering weight, budget share, capped epochs, and the tokens the
    run will actually draw.

    Plan: one bounded groupBy + a broadcast 1-row totals frame — the
    output is a stratum-sized table; at 100 TB this is a metadata
    query, not a data pass.
    """
    from alt_spark.operators.mixing import token_budget_plan

    docs = load_table(spark, sf, "documents")
    sized = docs.select("lang", F.size(_tokens_col()).alias("n_tok"))
    return token_budget_plan(
        sized,
        "lang",
        "n_tok",
        budget_tokens=_PLAN_BUDGET,
        epoch_cap_permyriad=_PLAN_EPOCH_CAP,
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# Planted documents exercising each Gopher gate: the synthetic corpus is
# clean prose, so bullet / ellipsis / symbol / stopword failures are
# planted as deterministic literal rows identical in both engines (the
# q29/q63 device). Ids are NEGATIVE so they can never collide with
# generated doc_ids at ANY scale factor (the generator emits
# non-negative ids — canary-pinned by
# tests/test_training.py::test_q75_planted_ids_cannot_collide; the r6
# ADVICE finding: fixed positive ids would silently duplicate keys the
# day the corpus grows past them). Deriving ids from max(doc_id)
# instead would add an aggregate exchange + action at plan-build time,
# breaking q75's zero-exchange plan pin.
_GOPHER_EXTRA: tuple[tuple[int, str], ...] = (
    # healthy: >=50 words, stopwords, no symbols
    (-1, " ".join(["the quick brown fox jumps over that lazy dog with ease"] * 6)),
    # bullet-led: every line starts with a bullet -> bullet gate fails
    (-2, "\n".join(f"- item {i} of the list with that thing" for i in range(10))),
    # ellipsis-heavy: every line trails off -> ellipsis gate fails
    (-3, "\n".join(f"the story number {i} continues..." for i in range(10))),
    # symbol spam: '#' per word ratio blows the symbol gate
    (-4, " ".join(f"#tag{i}" for i in range(60)) + " the of and that with"),
    # too short: under the 50-word floor
    (-5, "the and of that with tiny"),
    # no stopwords: keyword-stuffing shape, stop_hits gate fails
    (-6, " ".join(f"keyword{i}" for i in range(80))),
)


def _gopher_values_sql() -> str:
    return values_sql(_GOPHER_EXTRA)


def _q75_oracle() -> str:
    from alt_spark.functions.text_analysis import GOPHER_WS as _GOPHER_WS
    from alt_spark.functions.text_analysis import ddb_gopher_signals

    sig = ddb_gopher_signals()
    cols = ",\n       ".join(f"{sql} AS {name}" for name, sql in sig.items())
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id, text FROM {_gopher_values_sql()}
), prepped AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '{_GOPHER_WS}+'), x -> x <> '') AS words,
         {_DDB_TOKENS} AS toks
  FROM corpus
)
SELECT doc_id,
       {cols}
FROM prepped
"""


@query("q75_gopher_signals", oracle=_q75_oracle())
def q75(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style per-document quality signals (Rae et al. 2021 Table
    A1, the integer-expressible subset): word count, mean word length,
    letter-bearing word ratio, bullet-led and ellipsis-ended line
    ratios, symbol-per-word ratio, distinct-stopword hits, and the
    composed keep decision — every signal an exact permyriad the
    oracle value-checks per document (planted rows fail each gate
    individually). Complements q64 (repetition) and q27 (aggregate
    quality): together they are the full heuristic gate family a
    training pipeline runs before the learned classifier (q69).

    Plan: one narrow projection over the scan (words/toks named once,
    signals in-row, zero exchanges) — the 100 TB shape; plan-pinned in
    tests/test_plans.py.
    """
    from alt_spark.functions.text_analysis import GOPHER_WS as _GOPHER_WS
    from alt_spark.functions.text_analysis import gopher_signals

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    extra = spark.createDataFrame(list(_GOPHER_EXTRA), "doc_id long, text string")
    corpus = docs.unionByName(extra)
    prepped = corpus.select(
        "doc_id",
        "text",
        # GOPHER_WS, not \s: Java's \s includes \x0B, RE2's does not —
        # the explicit class keeps word boundaries engine-identical on
        # ANY regenerated corpus, not just clean ones.
        F.filter(F.split("text", _GOPHER_WS + "+"), lambda x: x != "").alias(
            "words"
        ),
        _tokens_col().alias("toks"),
    )
    sig = prepped.select(
        "doc_id",
        gopher_signals(F.col("text"), F.col("words"), F.col("toks")).alias("g"),
    )
    return sig.select("doc_id", "g.*")


# ---------------------------------------------------------------------------
@query(
    "q76_ccnet_buckets",
    oracle=f"""
WITH {_lm_gram_ctes()}, {_lm_model_cte()}, sc AS (
  SELECT gr.doc_id,
         count(*) AS n_grams,
         sum(CASE WHEN m.g IS NULL THEN 1 ELSE 0 END) AS n_oov
  FROM grams gr LEFT JOIN model m ON gr.g = m.g
  GROUP BY gr.doc_id
), perdoc AS (
  SELECT d.doc_id, d.source,
         CAST(CASE WHEN coalesce(sc.n_grams, 0) = 0 THEN 0
                   ELSE (10000 * sc.n_oov) // sc.n_grams END AS BIGINT) AS score
  FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
), ranked AS (
  SELECT doc_id, source, score,
         count(*) OVER (ORDER BY score
                        RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS c_lt,
         count(*) OVER () AS n
  FROM perdoc
), bucketed AS (
  SELECT doc_id, source, score,
         CASE (3 * c_lt) // n WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
              ELSE 'tail' END AS bucket
  FROM ranked
)
SELECT source, bucket,
       count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum,
       min(score) AS min_score,
       max(score) AS max_score
FROM bucketed
GROUP BY source, bucket
ORDER BY source, bucket
""",
)
def q76(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet head/middle/tail corpus bucketing (Wenzek et al. 2019
    §3.3): score every document against the corpus char-LM and cut the
    corpus into terciles of the score distribution — head trains first,
    tail is candidate-discard. The score is the OOV permyriad (q65's
    integer perplexity proxy: rare-gram-heavy docs are boilerplate or
    noise), so the whole chain — score, CDF, cut — is integer-exact and
    the oracle replays per-bucket MEMBERSHIP (id checksum), not just
    sizes. Buckets are tie-coherent (operators/mixing.cdf_buckets):
    equal scores share a bucket, so the assignment is deterministic
    under any partitioning, unlike ntile.

    Plan shape at 100 TB: ONE corpus scoring pass collapsed to
    (source, score) partials — score is a permyriad, so the partial
    table is bounded by |sources| x 10001 regardless of corpus size —
    and the CDF window (operators/mixing.cdf_buckets) rides those
    partials directly: its RANGE frame sums counts by score value, so
    sibling sources of a score see the same c_lt and no separate
    histogram pass or join-back exists. The corpus is never globally
    sorted. Gramless (too-short) docs score 0 by q65's convention and
    ride the head bucket — a real pipeline gates them out with q66's
    validity filter first.
    """
    from alt_spark.operators.lm import score_against_lm, train_char_lm
    from alt_spark.operators.mixing import cdf_buckets

    # Score the SAME (doc_id, text) frame q65 scores: the trained
    # model AND the per-doc score frame then plan-match q65's, so the
    # lm caches (_MODEL_CACHE / _SCORE_CACHE) hit across the suite —
    # source joins back afterwards (it was never an input to scoring).
    base = load_table(spark, sf, "documents").select("doc_id", "text")
    model = train_char_lm(base, n=_LM_N, min_count=_LM_MIN_COUNT)
    scored = score_against_lm(base, model, n=_LM_N).select(
        "doc_id", F.col("oov_permyriad").alias("score")
    )
    docs = load_table(spark, sf, "documents").select(
        "doc_id", "source", "text"
    )
    per = scored.join(docs.select("doc_id", "source"), "doc_id")
    # (source, score) partials: the one corpus-width aggregation —
    # everything below runs over |sources| x <=10001 rows. The CDF
    # window rides these partials directly (the RANGE frame makes
    # sibling sources of a score see the same c_lt), so the scoring
    # lineage has exactly one consumer and executes once.
    per_ss = per.groupBy("source", "score").agg(
        F.count("*").alias("cnt"),
        F.sum("doc_id").alias("id_sum"),
    )
    bucketed = cdf_buckets(per_ss, "score", "cnt", k=3).withColumn(
        "bucket",
        F.when(F.col("bucket") == 0, F.lit("head"))
        .when(F.col("bucket") == 1, F.lit("middle"))
        .otherwise(F.lit("tail")),
    )
    return (
        bucketed.groupBy("source", "bucket")
        .agg(
            F.sum("cnt").alias("n_docs"),
            F.sum("id_sum").alias("id_checksum"),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
        )
        .orderBy("source", "bucket")
    )


# ---------------------------------------------------------------------------
_SEL_TARGET_SRC = "src0"  # the trusted target domain for q78
_SEL_VOCAB_K = 100
_SEL_TOP_PER_LANG = 10


@query(
    "q78_target_domain_selection",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, source, lang, {_DDB_TOKENS} AS toks FROM documents
), tv AS (
  SELECT unnest(toks) AS t FROM tok WHERE source = '{_SEL_TARGET_SRC}'
), vocab AS (
  SELECT t, count(*) AS c FROM tv GROUP BY t
  ORDER BY c DESC, t LIMIT {_SEL_VOCAB_K}
), cand AS (
  SELECT doc_id, unnest(toks) AS t FROM tok
  WHERE source <> '{_SEL_TARGET_SRC}'
), sc AS (
  SELECT c.doc_id, count(*) AS score
  FROM cand c JOIN vocab v ON c.t = v.t GROUP BY c.doc_id
), scored AS (
  SELECT k.doc_id, k.lang, coalesce(sc.score, 0) AS score
  FROM (
    SELECT doc_id, lang FROM tok WHERE source <> '{_SEL_TARGET_SRC}'
  ) k LEFT JOIN sc ON k.doc_id = sc.doc_id
), ranked AS (
  SELECT lang, doc_id, score,
         row_number() OVER (
           PARTITION BY lang ORDER BY score DESC, doc_id
         ) AS rn
  FROM scored
)
SELECT lang, doc_id, CAST(score AS BIGINT) AS overlap_score
FROM ranked WHERE rn <= {_SEL_TOP_PER_LANG}
ORDER BY lang, overlap_score DESC, doc_id
""",
)
def q78(spark: SparkSession, sf: str) -> DataFrame:
    """Targeted data selection (the DSIR/importance-sampling family,
    integer-exact proxy): rank the general corpus by vocabulary overlap
    with a trusted TARGET domain and select the top documents per
    language — "give me the web docs that look most like my curated
    source". The score is the count (with multiplicity) of a doc's
    tokens that fall in the target's top-K vocabulary; the vocabulary
    cut and the per-language selection both break ties deterministically
    (count desc, token) / (score desc, doc_id), so the oracle replays
    the exact selected SET, not a lookalike.

    Plan shape at 100 TB: the target vocabulary is a bounded groupBy +
    per-partition top-K merge (TakeOrdered — no global sort, no
    single-partition data exchange), broadcast to the candidate scan;
    scoring is one explode + broadcast-hash join collapsed back to one
    row per doc by partial aggregation; the selection window partitions
    by language (hash exchange, per-partition sort). The corpus is
    scanned once for candidates, once for the (tiny) target slice —
    and a real deployment points the target side at a separate curated
    table.
    """
    docs = load_table(spark, sf, "documents").select(
        "doc_id", "source", "lang", _tokens_col().alias("toks")
    )
    target = docs.filter(F.col("source") == _SEL_TARGET_SRC)
    vocab = (
        target.select(F.explode("toks").alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "t")
        .limit(_SEL_VOCAB_K)
    )
    cand = docs.filter(F.col("source") != _SEL_TARGET_SRC)
    hits = (
        cand.select("doc_id", F.explode("toks").alias("t"))
        .join(F.broadcast(vocab.select("t")), "t")
        .groupBy("doc_id")
        .agg(F.count("*").alias("score"))
    )
    scored = (
        cand.select("doc_id", "lang")
        .join(hits, "doc_id", "left")
        .select(
            "lang", "doc_id", F.coalesce("score", F.lit(0)).cast("long").alias("score")
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("lang").orderBy(F.desc("score"), "doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _SEL_TOP_PER_LANG)
        .select("lang", "doc_id", F.col("score").alias("overlap_score"))
        .orderBy("lang", F.desc("overlap_score"), "doc_id")
    )


# ---------------------------------------------------------------------------
_EPOCH_SALT = "epoch-v1"


def _q79_oracle() -> str:
    b = ddb_sample_bucket("doc_id", _EPOCH_SALT)
    return f"""
WITH {_plan_ctes()}, fr AS (
  SELECT t.lang, t.doc_id, t.n_tok,
         p.epochs_permyriad // 10000 AS n_full,
         p.planned_tok - (p.epochs_permyriad // 10000) * p.avail_tok AS rem,
         {b} AS b
  FROM t JOIN planned p USING (lang)
), full_copies AS (
  SELECT lang, doc_id, n_tok,
         unnest(generate_series(1, CAST(n_full AS BIGINT))) AS copy
  FROM fr
), cum AS (
  SELECT lang, doc_id, n_tok, n_full, rem,
         coalesce(sum(n_tok) OVER (
           PARTITION BY lang ORDER BY b, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM fr
), frac AS (
  SELECT lang, doc_id, n_tok, n_full + 1 AS copy
  FROM cum WHERE before < rem
), drawn AS (
  SELECT lang, doc_id, n_tok, copy FROM full_copies
  UNION ALL
  SELECT lang, doc_id, n_tok, copy FROM frac
)
SELECT lang, CAST(copy AS BIGINT) AS copy,
       count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum,
       CAST(sum(n_tok) AS BIGINT) AS tok_sum
FROM drawn
GROUP BY lang, copy
ORDER BY lang, copy
"""


@query("q79_epoch_expansion", oracle=_q79_oracle())
def q79(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-epoch draw MATERIALIZATION: execute the q74 token-budget
    plan (operators/mixing.epoch_expand) — full epochs as exact copies,
    the fractional remainder as a deterministic token-prefix draw in
    (md5-bucket, id) order, landing within one document of
    ``planned_tok``. This closes the plan→sampler loop r6 left open:
    q74 could prescribe epochs up to 2.5x that nothing could draw.

    The oracle replays the ENTIRE chain — plan (shared CTEs with q74),
    per-copy membership (sum of doc_ids per (lang, copy)), and drawn
    token sums — so a wrong epoch count, a wrong prefix cut, or a
    different tie order fails the hash, not just a size check.

    Scale shape: plan is broadcast; full copies are a scan-local
    explode; the prefix cut rides per-(lang, bucket) token partials
    (bounded by |langs| x 10001) with the row-level cumsum partitioned
    by (lang, bucket) — 10000x finer than a stratum, so no
    single-stratum sort exists at any corpus size (the cdf_buckets
    device applied to sampling).
    """
    from alt_spark.operators.mixing import epoch_expand, token_budget_plan

    docs = load_table(spark, sf, "documents").select(
        "doc_id", "lang", F.size(_tokens_col()).alias("n_tok")
    )
    plan = token_budget_plan(
        docs,
        "lang",
        "n_tok",
        budget_tokens=_PLAN_BUDGET,
        epoch_cap_permyriad=_PLAN_EPOCH_CAP,
    )
    drawn = epoch_expand(
        docs, plan, "lang", "doc_id", "n_tok", salt=_EPOCH_SALT
    )
    return (
        drawn.groupBy("lang", "copy")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("doc_id").alias("id_checksum"),
            F.sum("n_tok").alias("tok_sum"),
        )
        .orderBy("lang", "copy")
    )


# ---------------------------------------------------------------------------
_BPE_TOP_K = 30


@query(
    "q80_bpe_pair_counts",
    oracle=f"""
WITH tok AS (
  SELECT {_DDB_TOKENS} AS toks FROM documents
), pairs AS (
  SELECT toks[i] AS a, toks[i + 1] AS b
  FROM tok, unnest(generate_series(1, len(toks) - 1)) AS g(i)
)
SELECT a, b, count(*) AS n
FROM pairs
GROUP BY a, b
ORDER BY n DESC, a, b
LIMIT {_BPE_TOP_K}
""",
)
def q80(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer-training statistics: adjacent token-pair frequencies —
    one iteration of the BPE/WordPiece merge loop (Sennrich et al.
    2016: the merge candidate IS the argmax adjacent pair; a vocabulary
    trainer runs exactly this count over the corpus every round). Top-K
    pairs with a total deterministic order (count desc, a, b), so the
    oracle pins the exact merge candidates, not a lookalike set.

    Scale shape at 100 TB: pair construction is IN-ROW (arrays_zip of
    two slices of the already-materialized token array — no join, no
    lambda HOF, the gram-rows doctrine), the pair groupBy collapses
    map-side to near-vocabulary² cardinality in practice (natural-text
    adjacency is Zipfian, so partial aggregation absorbs most
    occurrences), and the top-K is a TakeOrdered per-partition merge —
    the corpus is never globally sorted.
    """
    toks = _tokens_col()
    # Layered projection (the q48 lesson): the token array is named
    # once, the two shifted views are named once — arrays_zip then
    # pairs attributes, and the zip inherits their field names. The
    # greatest(…, 0) guard keeps slice lengths legal for 0/1-token
    # docs (they zip to an empty array and explode to nothing).
    lead = F.greatest(F.size("t") - 1, F.lit(0))
    prepped = (
        load_table(spark, sf, "documents")
        .select(toks.alias("t"))
        .select(
            F.slice("t", 1, lead).alias("a1"),
            F.slice("t", 2, lead).alias("a2"),
        )
    )
    pairs = prepped.select(
        F.explode(F.arrays_zip("a1", "a2")).alias("p")
    ).select(F.col("p.a1").alias("a"), F.col("p.a2").alias("b"))
    return (
        pairs.groupBy("a", "b")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "a", "b")
        .limit(_BPE_TOP_K)
    )


# ---------------------------------------------------------------------------
@query(
    "q82_dataset_card",
    oracle=f"""
WITH base AS (
  SELECT lang, source,
         md5(text) AS h,
         len({_DDB_TOKENS}) AS n_tok,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS alpha_chars
  FROM documents
)
SELECT coalesce(lang, 'ALL') AS lang,
       coalesce(source, 'ALL') AS source,
       CAST(grouping(lang) * 2 + grouping(source) AS INT) AS gid,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS tok_sum,
       count(DISTINCT h) AS n_unique,
       CAST((10000 * (count(*) - count(DISTINCT h))) // count(*) AS BIGINT)
         AS dup_permyriad,
       CAST((10000 * sum(alpha_chars)) // greatest(sum(n_chars), 1) AS BIGINT)
         AS alpha_permyriad
FROM base
GROUP BY ROLLUP (lang, source)
ORDER BY gid, lang, source
""",
)
def q82(spark: SparkSession, sf: str) -> DataFrame:
    """Dataset card: the corpus-release statistics table (per (lang,
    source), per lang, and grand total in ONE rollup pass) — doc and
    token counts, exact-duplicate rate from content hashes, and an
    alphanumeric-density signal, every metric an exact integer
    (permyriads via integer division). This is the datasheet a corpus
    version ships with (Gebru et al. 2021, "Datasheets for Datasets");
    composing it as one GROUPING SETS aggregate means one shuffle
    produces all three granularities.

    Scale shape: one scan computing per-doc narrow columns in-row, one
    hash aggregate with rollup expansion (Spark plans all three sets in
    a single pass, q56's device); the distinct-hash count is the only
    wide statistic and rides the same aggregate.
    """
    docs = load_table(spark, sf, "documents")
    base = docs.select(
        "lang",
        "source",
        F.md5("text").alias("h"),
        F.size(_tokens_col()).cast("long").alias("n_tok"),
        F.length("text").alias("n_chars"),
        F.length(F.regexp_replace("text", "[^A-Za-z0-9 ]", "")).alias(
            "alpha_chars"
        ),
    )
    agg = base.rollup("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("tok_sum"),
        F.countDistinct("h").alias("n_unique"),
        F.sum("alpha_chars").alias("__alpha"),
        F.sum("n_chars").alias("__chars"),
        F.grouping_id().cast("int").alias("gid"),
    )
    return (
        agg.select(
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            F.coalesce("source", F.lit("ALL")).alias("source"),
            "gid",
            "n_docs",
            "tok_sum",
            "n_unique",
            F.expr("(10000 * (n_docs - n_unique)) div n_docs").alias(
                "dup_permyriad"
            ),
            F.expr("(10000 * __alpha) div greatest(__chars, 1)").alias(
                "alpha_permyriad"
            ),
        )
        .orderBy("gid", "lang", "source")
    )


# ---------------------------------------------------------------------------
@query(
    "q83_contamination_audit",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, {_DDB_TOKENS} AS toks FROM documents
), grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(toks, s + 1, s + {_DECON_N}), ' ') AS g
  FROM (
    SELECT doc_id, toks,
           unnest(generate_series(0, len(toks) - {_DECON_N}, 1)) AS s
    FROM tok WHERE len(toks) >= {_DECON_N}
  )
), hits AS (
  SELECT b.doc_id AS bench_id,
         count(DISTINCT c.doc_id) AS n_docs_hit,
         count(DISTINCT b.g) AS n_grams_hit
  FROM grams b JOIN grams c ON b.g = c.g
  WHERE b.doc_id % 50 = 0 AND c.doc_id % 50 <> 0
  GROUP BY b.doc_id
)
SELECT d.doc_id AS bench_id,
       CAST(coalesce(h.n_docs_hit, 0) AS BIGINT) AS n_docs_hit,
       CAST(coalesce(h.n_grams_hit, 0) AS BIGINT) AS n_grams_hit
FROM documents d LEFT JOIN hits h ON h.bench_id = d.doc_id
WHERE d.doc_id % 50 = 0
ORDER BY bench_id
""",
)
def q83(spark: SparkSession, sf: str) -> DataFrame:
    """Contamination AUDIT — q62's complementary reporting surface: for
    every benchmark document (the q62 convention: every 50th doc plays
    the eval suite), how many corpus documents share at least one
    {_DECON_N}-gram and how many of the benchmark doc's grams are
    contaminated. q62 removes; this reports — the per-item overlap
    table papers publish next to their decontamination rule, and the
    audit a pipeline runs to decide whether a benchmark is even usable
    against a crawl. Zero-overlap benchmark docs appear with zeros, so
    the surface is complete per item.

    Scale shape: the benchmark gram side is eval-suite-sized and
    BROADCAST into the join against corpus gram rows (the corpus is
    never shuffled by the probe — q62's decontaminate shape, reported
    instead of anti-joined); only the hit rows (bounded by bench grams
    x matching docs) reach the count-distinct aggregate.
    """
    from alt_spark.operators.dedup import shingle_rows

    docs = load_table(spark, sf, "documents")
    grams = shingle_rows(docs, "text", "doc_id", _DECON_N)
    bg = grams.filter(F.col("id") % 50 == 0).select(
        F.col("id").alias("bench_id"), "sh"
    )
    cg = grams.filter(F.col("id") % 50 != 0).select(
        F.col("id").alias("corpus_id"), "sh"
    )
    hits = (
        F.broadcast(bg)
        .join(cg, "sh")
        .groupBy("bench_id")
        .agg(
            F.countDistinct("corpus_id").alias("n_docs_hit"),
            F.countDistinct("sh").alias("n_grams_hit"),
        )
    )
    bench = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("bench_id")
    )
    return (
        bench.join(hits, "bench_id", "left")
        .select(
            "bench_id",
            F.coalesce("n_docs_hit", F.lit(0)).cast("long").alias("n_docs_hit"),
            F.coalesce("n_grams_hit", F.lit(0))
            .cast("long")
            .alias("n_grams_hit"),
        )
        .orderBy("bench_id")
    )


# ---------------------------------------------------------------------------
_BPE_K = 6


@query("q87_bpe_vocab_learning")
def q87(spark: SparkSession, sf: str) -> DataFrame:
    """Full BPE vocabulary TRAINING (operators/bpe.py — Sennrich et al.
    2016): q80 reports one round's pair statistics; this runs the
    actual k-round merge loop and returns the learned merge table
    (step, left, right, pair_count) in merge order.

    Rows-only by design: round i's argmax feeds round i+1's
    tokenization, which no single SQL query (recursive CTEs cannot
    aggregate over the recursive term) can express — the q69/q71
    footing. Exactness is pinned in pytest against a reference Python
    implementation of the published algorithm with the identical
    tie-break (tests/test_ml_ops.py::test_bpe_merges_match_reference).

    Scale shape: the corpus is aggregated ONCE into the Zipf-bounded
    word-type table; all k rounds (weighted pair count, 1-row argmax
    collect, in-row merge fold) iterate on that table with per-round
    lineage truncation — tokenizer training at 100 TB costs one corpus
    shuffle plus k bounded-table passes.
    """
    from alt_spark.operators.bpe import learn_bpe_merges

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    return learn_bpe_merges(docs, k=_BPE_K).orderBy("step")


# ---------------------------------------------------------------------------
@query("q115_unigram_vocab_learning")
def q115(spark: SparkSession, sf: str) -> DataFrame:
    """Unigram-LM vocabulary TRAINING by Viterbi-EM
    (operators/unigram.learn_unigram_vocab — Kudo 2018's training
    step, hard-EM variant): q105 segments under a PINNED vocabulary;
    this learns one — seed substring counts, per-round Viterbi E-step
    (the exact integer DP q105 replays), driver-side M-step
    re-estimation, (count desc, piece asc) pruning. Returns the final
    vocabulary (piece, milli_logp, piece_cnt, is_single) by piece.

    Rows-only by design (the q87/q69 footing): round i's re-estimated
    scores feed round i+1's lattice — not one-query SQL-expressible.
    Exactness is pinned in pytest against a pure-Python replay of the
    whole seed->EM->prune chain with identical arithmetic (logs run
    ONLY driver-side, so equality is exact —
    tests/test_ml_ops.py::test_unigram_em_learning_matches_python_reference).

    Scale shape: one corpus scan into the Zipf-bounded word-type
    table; every EM round is one bounded in-row DP pass plus one
    vocab-sized collect (a tokenizer is a broadcast artifact — the
    adjudicated BPE-argmax class, vocab-sized); the round's scores
    ride back in as a 1-row broadcast map column.
    """
    from alt_spark.operators.unigram import learn_unigram_vocab

    docs = load_table(spark, sf, "documents").select("text")
    return learn_unigram_vocab(
        docs, target_multi=24, rounds=3, max_piece_len=5, seed_multi=96
    ).orderBy("piece")


# ---------------------------------------------------------------------------
def _q88_oracle() -> str:
    from alt_spark.operators.bpe import ddb_segment_symbol_string

    seg = ddb_segment_symbol_string("text")
    return f"""
WITH segd AS (
  SELECT doc_id, {seg} AS s FROM documents
)
SELECT doc_id,
       CAST(length(s) - length(replace(s, chr(1), '')) AS BIGINT)
         AS n_subwords,
       md5(s) AS seg_md5
FROM segd
ORDER BY doc_id
"""


@query("q88_bpe_segmentation", oracle=_q88_oracle())
def q88(spark: SparkSession, sf: str) -> DataFrame:
    """Subword segmentation with the PINNED merge table
    (operators/bpe.PINNED_MERGES — the deploy-side twin of q87's
    learner: a tokenizer is a frozen, versioned artifact). The md5 of
    each document's sentinel symbol string pins the EXACT segmentation
    — symbol boundaries, merge order effects, chained merges — not
    just subword counts; the sentinel-string formulation is what makes
    the oracle possible (one literal replace per merge, identical
    greedy left-to-right semantics in both engines), and pytest pins
    it equivalent to the learner-side array fold
    (tests/test_ml_ops.py::test_pinned_segmentation_matches_fold).

    Plan: in-row — a regex char-wrap per word, an array_join, and k
    literal replaces; the only exchange is the presentation sort.
    Tokenizing 100 TB with a frozen vocabulary is scan-speed.
    """
    from alt_spark.operators.bpe import segment_symbol_string

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    s = segment_symbol_string(F.col("text"))
    return (
        docs.select(
            "doc_id",
            (
                F.length(s)
                - F.length(F.replace(s, F.lit("\x01"), F.lit("")))
            )
            .cast("long")
            .alias("n_subwords"),
            F.md5(s).alias("seg_md5"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
_VOCAB_LADDER = (100, 300, 1000, 3000, 10000)


@query(
    "q89_vocab_coverage",
    oracle=f"""
WITH tok AS (
  SELECT unnest({_DDB_TOKENS}) AS word FROM documents
), wc AS (
  SELECT word, count(*) AS cnt FROM tok GROUP BY word
), total AS (
  SELECT sum(cnt) AS tot FROM wc
), ranked AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, word) AS r FROM wc
), mem AS (
  SELECT k.vocab_size, cnt
  FROM (SELECT * FROM ranked WHERE r <= {max(_VOCAB_LADDER)}) top,
       unnest([{", ".join(str(k) for k in _VOCAB_LADDER)}]) k(vocab_size)
  WHERE k.vocab_size >= top.r
)
SELECT vocab_size,
       count(*)::BIGINT AS n_types,
       sum(cnt)::BIGINT AS covered_occurrences,
       ((SELECT tot FROM total) - sum(cnt))::BIGINT AS oov_occurrences,
       ((10000 * sum(cnt)) // (SELECT tot FROM total))::BIGINT
         AS coverage_permyriad
FROM mem
GROUP BY vocab_size
ORDER BY vocab_size
""",
)
def q89(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary coverage curve: for each candidate vocabulary size K
    (top-K word types by corpus frequency, ties broken by word), the
    exact count of token occurrences covered vs OOV — the curve a
    tokenizer designer reads to pick a vocab size, and the acceptance
    gate on a learned vocabulary (q87) before freezing it (q88). All
    integers; coverage reported in permyriad via integer division.

    Scale shape at 100 TB: ONE explode+groupBy over the corpus
    (Zipf-bounded type table, map-side partials — the word_type_table
    argument, operators/bpe.py:43); the ranking then runs on a frame
    already cut to max(ladder)=10k rows by a TakeOrdered limit, so the
    global row_number window is single-partition over a provably
    bounded input (the PQ-codebook boundedness device, not a corpus
    sort). Ladder membership is an in-row array filter + explode
    (<= |ladder| rows per type, no theta join / NLJ); the 1-row total
    frame broadcasts (the BM25 stats-row device).
    """
    from pyspark.sql.window import Window

    docs = load_table(spark, sf, "documents")
    words = (
        docs.select(F.explode(_tokens_col()).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    total = words.agg(F.sum("cnt").alias("tot"))
    top = words.orderBy(F.desc("cnt"), "word").limit(max(_VOCAB_LADDER))
    ranked = top.select(
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.desc("cnt"), "word"))
        .alias("r"),
    )
    ladder = F.array(*[F.lit(k) for k in _VOCAB_LADDER])
    mem = ranked.select(
        "cnt",
        F.explode(F.filter(ladder, lambda k: k >= F.col("r"))).alias(
            "vocab_size"
        ),
    )
    return (
        mem.groupBy("vocab_size")
        .agg(
            F.count("*").cast("long").alias("n_types"),
            F.sum("cnt").cast("long").alias("covered_occurrences"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "vocab_size",
            "n_types",
            "covered_occurrences",
            (F.col("tot") - F.col("covered_occurrences"))
            .cast("long")
            .alias("oov_occurrences"),
            F.expr("(10000 * covered_occurrences) div tot")
            .cast("long")
            .alias("coverage_permyriad"),
        )
        .orderBy("vocab_size")
    )


# ---------------------------------------------------------------------------
_HOLDOUT_K, _HOLDOUT_SALT = 25, "holdout-v1"


def _ddb_hkey(id_expr: str, salt: str) -> str:
    from alt_spark.functions.hashing import DDB_H60

    return DDB_H60(f"('{salt}' || ':' || CAST({id_expr} AS VARCHAR))")


@query(
    "q94_exact_k_holdout",
    oracle=f"""
WITH b AS (
  SELECT lang, doc_id, {_ddb_hkey('doc_id', _HOLDOUT_SALT)} AS hkey
  FROM documents
), ranked AS (
  SELECT lang, doc_id, hkey,
         row_number() OVER (PARTITION BY lang ORDER BY hkey, doc_id) AS rank
  FROM b
)
SELECT lang,
       CAST(rank AS BIGINT) AS rank,
       doc_id,
       CAST(hkey AS BIGINT) AS hkey
FROM ranked WHERE rank <= {_HOLDOUT_K}
ORDER BY lang, rank
""",
)
def q94(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-k deterministic eval carve: exactly min(k, n) held-out
    documents per language — the k smallest under the (60-bit portable
    hash, doc_id) total order — with their within-stratum rank. A fractional
    mixing rate (q59) cannot promise a fixed-size eval set; this is the
    operator that carves one, reproducibly across runs, retries, and
    cluster sizes, and the oracle pins exact MEMBERSHIP AND ORDER of
    every selected row (the plain-window SQL twin of the pruned path).

    Plan (operators/mixing.exact_k_sample): one bounded per-stratum
    count, a broadcast hash-threshold prefilter inside the scan stage
    (~oversample*k survivors per stratum in the full 60-bit hash space
    — every pruned row provably sorts after every survivor), then the
    exact rank window over the pruned remnant; a per-stratum guard
    raises loudly if the prefilter ever starves a stratum (< e^-k
    probability). Carving a 100 TB corpus costs one scan + one tiny
    window.
    """
    from alt_spark.operators.mixing import exact_k_sample

    docs = load_table(spark, sf, "documents").select("lang", "doc_id")
    sel = exact_k_sample(
        docs, _HOLDOUT_K, "lang", "doc_id", salt=_HOLDOUT_SALT
    )
    return sel.select(
        "lang",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.col("hkey").cast("long").alias("hkey"),
    ).orderBy("lang", "rank")


# ---------------------------------------------------------------------------
def _q96_oracle() -> str:
    from alt_spark.operators.bpe import ddb_segment_symbol_string

    seg = ddb_segment_symbol_string("text")
    return f"""
WITH seg AS (
  SELECT lang,
         len({_DDB_TOKENS}) AS words,
         length(coalesce(array_to_string({_DDB_TOKENS}, ''), '')) AS chars,
         {seg} AS s
  FROM documents
), sym AS (
  SELECT lang, words, chars,
         length(s) - length(replace(s, chr(1), '')) AS symbols
  FROM seg
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(words) AS BIGINT) AS words,
       CAST(sum(chars) AS BIGINT) AS chars,
       CAST(sum(symbols) AS BIGINT) AS symbols,
       CAST((10000 * sum(symbols)) // greatest(sum(words), 1) AS BIGINT)
         AS fertility_permyriad,
       CAST((1000 * sum(chars)) // greatest(sum(symbols), 1) AS BIGINT)
         AS chars_per_symbol_milli
FROM sym
GROUP BY lang
ORDER BY lang
"""


@query("q96_tokenizer_fertility", oracle=_q96_oracle())
def q96(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language tokenizer fertility under the PINNED BPE vocabulary
    (q88's frozen merge table): subword symbols per word (fertility,
    permyriad) and characters per symbol (compression, milli) — the
    acceptance metrics a tokenizer release tracks per language. A
    language with outsized fertility is underserved by the vocabulary
    (its words shatter into characters), which inflates its effective
    sequence lengths and training cost; this query is how that shows up
    BEFORE a training run does. Completes the tokenizer family: q87
    learns, q88 applies, q89 sizes the vocab by coverage, q96 prices it
    per language.

    Plan: segmentation is the q88 in-row sentinel-string form; the
    symbol count is one length difference (no parsing); one bounded
    hash aggregate on lang — pricing a tokenizer on 100 TB costs one
    corpus scan. Exact-integer surfaces end-to-end.
    """
    from alt_spark.operators.bpe import segment_symbol_string

    docs = load_table(spark, sf, "documents").select("lang", "text")
    toks = tokens_col("text")
    seg = docs.select(
        "lang",
        F.size(toks).alias("words"),
        F.length(F.concat_ws("", toks)).alias("chars"),
        segment_symbol_string(F.col("text")).alias("s"),
    )
    sym = seg.select(
        "lang",
        "words",
        "chars",
        (
            F.length("s") - F.length(F.replace(F.col("s"), F.lit("\x01")))
        ).alias("symbols"),
    )
    return (
        sym.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("words").cast("long").alias("words"),
            F.sum("chars").cast("long").alias("chars"),
            F.sum("symbols").cast("long").alias("symbols"),
            F.expr("(10000 * sum(symbols)) div greatest(sum(words), 1)")
            .cast("long")
            .alias("fertility_permyriad"),
            F.expr("(1000 * sum(chars)) div greatest(sum(symbols), 1)")
            .cast("long")
            .alias("chars_per_symbol_milli"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Exogenous target mixture: the declared recipe ("45% en, 18% de, ...").
# 'es' is deliberately UNDECLARED — a mixing config lists exactly what it
# wants, and the rebalance must drop undeclared strata (rate 0), the
# stratified_sample contract. Shares sum to exactly 10000 permyriad.
_TGT_SHARES = {"en": 4500, "de": 1800, "fr": 1800, "zh": 1900}
_TGT_SALT = "mix-target-v1"


def _tgt_values_sql() -> str:
    rows = ", ".join(f"('{k}', {v})" for k, v in _TGT_SHARES.items())
    return f"(VALUES {rows}) tgt(lang, share)"


@query(
    "q103_target_mixture_rebalance",
    oracle=f"""
WITH t AS (
  SELECT lang, doc_id, len({_DDB_TOKENS}) AS n_tok FROM documents
), c AS (
  SELECT lang, CAST(sum(n_tok) AS BIGINT) AS tok FROM t GROUP BY lang
), s AS (
  SELECT c.lang, c.tok, tgt.share
  FROM c LEFT JOIN {_tgt_values_sql()} ON c.lang = tgt.lang
), tt AS (
  SELECT min((tok * 10000) // share) AS t_total FROM s WHERE share IS NOT NULL
), r AS (
  SELECT lang, tok,
         CAST(CASE WHEN share IS NULL THEN 0
              ELSE (share * t_total) // 10000 END AS BIGINT) AS planned_tok,
         CAST(least(10000, (CASE WHEN share IS NULL THEN 0
              ELSE (share * t_total) // 10000 END) * 10000 // greatest(tok, 1)) AS BIGINT) AS rate
  FROM s, tt
)
SELECT t.lang,
       r.tok AS tok_total,
       r.planned_tok,
       r.rate AS rate_permyriad,
       count(*) FILTER (WHERE {ddb_sample_bucket('t.doc_id', _TGT_SALT)} < r.rate) AS n_kept,
       CAST(coalesce(sum(t.n_tok) FILTER (
         WHERE {ddb_sample_bucket('t.doc_id', _TGT_SALT)} < r.rate), 0) AS BIGINT) AS kept_tok,
       CAST(coalesce(sum(t.doc_id) FILTER (
         WHERE {ddb_sample_bucket('t.doc_id', _TGT_SALT)} < r.rate), 0) AS BIGINT) AS id_checksum
FROM t JOIN r ON t.lang = r.lang
GROUP BY t.lang, r.tok, r.planned_tok, r.rate
ORDER BY t.lang
""",
)
def q103(spark: SparkSession, sf: str) -> DataFrame:
    """Target-mixture rebalance: cut the corpus to an EXOGENOUS recipe
    ("45% en, 18% de, 18% fr, 19% zh") at the largest achievable size —
    the bottleneck stratum (least token mass relative to its declared
    share) caps the whole corpus, every other stratum is down-sampled
    to match, and undeclared strata ('es' here) are dropped outright.
    Completes the mixing family: q59 applies FIXED per-stratum rates,
    q70 derives rates FROM the corpus (temperature), q74 plans against
    a token budget — this one reconciles corpus reality with a declared
    recipe, the op a production run executes when the crawl mix
    disagrees with the training mix.

    Integer arithmetic end-to-end (operators/mixing.
    target_mixture_rates): the achievable total, every planned token
    mass, and every permyriad rate replay exactly in the oracle, and
    the md5-bucket keep decision pins the exact kept SET (id checksum)
    per stratum.

    Plan: one bounded groupBy for per-stratum token mass, a 1-row
    broadcast min (the bottleneck), a stratum-sized broadcast rate
    table, and the narrow scan-local keep predicate — at 100 TB the
    rebalance adds two tiny aggregates to a filtered scan.
    """
    from alt_spark.operators.mixing import sample_bucket, target_mixture_rates

    docs = load_table(spark, sf, "documents")
    t = docs.select(
        "lang", "doc_id", F.size(_tokens_col()).cast("long").alias("n_tok")
    )
    rates = target_mixture_rates(t, "lang", _TGT_SHARES, "n_tok")
    keep = sample_bucket("doc_id", _TGT_SALT) < F.col("rate")
    return (
        t.join(F.broadcast(rates), "lang")
        .groupBy(
            "lang",
            F.col("tok").alias("tok_total"),
            F.col("planned_tok"),
            F.col("rate").alias("rate_permyriad"),
        )
        .agg(
            F.count(F.when(keep, 1)).alias("n_kept"),
            F.coalesce(F.sum(F.when(keep, F.col("n_tok"))), F.lit(0))
            .cast("long")
            .alias("kept_tok"),
            F.coalesce(F.sum(F.when(keep, F.col("doc_id"))), F.lit(0))
            .cast("long")
            .alias("id_checksum"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
_PAD_MAX = 256  # max sequence length (training batch width)
_PAD_BOUNDS = (32, 64, 128, 256)  # length-bucket upper bounds


@query(
    "q104_padding_waste_audit",
    oracle=f"""
WITH t AS (
  SELECT doc_id, len({_DDB_TOKENS}) AS n_tok FROM documents
), b AS (
  SELECT doc_id, n_tok,
         least(n_tok, {_PAD_MAX}) AS trunc_tok,
         n_tok - least(n_tok, {_PAD_MAX}) AS overflow_tok,
         CASE WHEN least(n_tok, {_PAD_MAX}) <= 32 THEN 32
              WHEN least(n_tok, {_PAD_MAX}) <= 64 THEN 64
              WHEN least(n_tok, {_PAD_MAX}) <= 128 THEN 128
              ELSE 256 END AS bucket_bound
  FROM t
), g AS (
  SELECT bucket_bound,
         count(*) AS n_docs,
         CAST(sum(trunc_tok) AS BIGINT) AS real_tok,
         CAST(sum(overflow_tok) AS BIGINT) AS overflow_tok,
         CAST(count(*) * bucket_bound AS BIGINT) AS padded_bucketed,
         CAST(count(*) * {_PAD_MAX} AS BIGINT) AS padded_flat
  FROM b GROUP BY bucket_bound
)
SELECT bucket_bound, n_docs, real_tok, overflow_tok,
       padded_bucketed, padded_flat,
       CAST(((padded_bucketed - real_tok) * 10000) // padded_bucketed AS BIGINT)
         AS waste_bucketed_permyriad,
       CAST(((padded_flat - real_tok) * 10000) // padded_flat AS BIGINT)
         AS waste_flat_permyriad
FROM g
ORDER BY bucket_bound
""",
)
def q104(spark: SparkSession, sf: str) -> DataFrame:
    """Padding-waste audit for length-bucketed batching: per length
    bucket (upper bounds 32/64/128/256 at max-seq-len 256), how many
    pad tokens flat padding burns vs bucketed padding — the
    training/serving-efficiency report that justifies (or kills) a
    bucketing strategy before a run. Sequence PACKING (q61) eliminates
    padding entirely but welds documents together; bucketing keeps
    document boundaries and this audit prices the residual waste.
    Overflow tokens (beyond max-seq-len) are reported per bucket too —
    the truncation loss no padding strategy can recover.

    All integer (counts, token sums, permyriad floor division), so
    every cell replays exactly in the oracle. Plan: one in-row bucket
    expression over the scan + ONE bounded hash aggregate (|buckets|
    rows) — a 100 TB audit is a single map-side-combinable pass.
    """
    docs = load_table(spark, sf, "documents")
    t = docs.select(F.size(_tokens_col()).cast("long").alias("n_tok"))
    b = t.select(
        "n_tok",
        F.least(F.col("n_tok"), F.lit(_PAD_MAX)).alias("trunc_tok"),
        (F.col("n_tok") - F.least(F.col("n_tok"), F.lit(_PAD_MAX))).alias(
            "overflow_tok"
        ),
    ).withColumn(
        "bucket_bound",
        F.when(F.col("trunc_tok") <= 32, 32)
        .when(F.col("trunc_tok") <= 64, 64)
        .when(F.col("trunc_tok") <= 128, 128)
        .otherwise(256)
        .cast("int"),
    )
    g = b.groupBy("bucket_bound").agg(
        F.count("*").alias("n_docs"),
        F.sum("trunc_tok").cast("long").alias("real_tok"),
        F.sum("overflow_tok").cast("long").alias("overflow_tok"),
        (F.count("*") * F.col("bucket_bound")).cast("long").alias("padded_bucketed"),
        (F.count("*") * F.lit(_PAD_MAX)).cast("long").alias("padded_flat"),
    )
    return g.select(
        "bucket_bound",
        "n_docs",
        "real_tok",
        "overflow_tok",
        "padded_bucketed",
        "padded_flat",
        F.expr("((padded_bucketed - real_tok) * 10000) div padded_bucketed")
        .cast("long")
        .alias("waste_bucketed_permyriad"),
        F.expr("((padded_flat - real_tok) * 10000) div padded_flat")
        .cast("long")
        .alias("waste_flat_permyriad"),
    ).orderBy("bucket_bound")


# ---------------------------------------------------------------------------
_UNI_MAXW = 12  # declared word-length bound: keeps the oracle's unrolled DP finite
# Planted row (q63's negative-id device): '9' has no vocabulary entry,
# so segmenting "ab9cd" MUST take the UNK single-char fallback — the
# path the natural corpus (pure a-y words) never exercises.
_UNI_EXTRA: tuple[tuple[int, str], ...] = ((-31, "ab9cd line table value"),)


def _uni_words_cte() -> str:
    return f"""
  SELECT word, count(*) AS cnt FROM (
    SELECT unnest({_DDB_TOKENS}) AS word FROM (
      SELECT text FROM documents
      UNION ALL SELECT text FROM {values_sql(_UNI_EXTRA)}
    )
  ) GROUP BY word
"""


def _q105_oracle() -> str:
    from alt_spark.operators.unigram import ddb_viterbi_sql

    return ddb_viterbi_sql(_uni_words_cte(), _UNI_MAXW)


@query("q105_unigram_segmentation", oracle=_q105_oracle())
def q105(spark: SparkSession, sf: str) -> DataFrame:
    """Unigram-LM (SentencePiece-class) subword segmentation under a
    PINNED integer-scored vocabulary (Kudo 2018): per word type, the
    max-likelihood segmentation chosen by Viterbi DP — the second
    production tokenizer family next to BPE (q87 learns merges, q88
    applies them greedily; a unigram tokenizer globally optimizes the
    piece sequence instead, and "li ne" vs "line" genuinely diverge
    between the two algorithm classes). The planted tie ("li"+"ne" ==
    "line" in total score) pins the per-position (score, piece_len,
    piece) DESC tie-break; the planted digit word pins the UNK
    single-char fallback.

    Plan (the 100 TB shape, the BPE doctrine): the corpus collapses
    ONCE to the Zipf-bounded word-type table; the DP is ONE in-row
    fold per word type (<= n x MAX_PIECE_LEN map lookups inside
    codegen — no explode, no join, no shuffle); output is
    word-type-bounded. The oracle replays the DP as an UNROLLED stage
    chain with window argmax — an independent formulation of the same
    recurrence, exact because every score is integer milli-log-prob.
    """
    from alt_spark.operators.unigram import viterbi_segment, word_types

    docs = load_table(spark, sf, "documents").select("text")
    extra = spark.createDataFrame(list(_UNI_EXTRA), ["doc_id", "text"]).select("text")
    w = word_types(docs.unionByName(extra)).filter(F.length("word") <= _UNI_MAXW)
    seg = w.withColumn("r", viterbi_segment(F.col("word")))
    return seg.select(
        "word",
        "cnt",
        F.length("word").cast("long").alias("n_chars"),
        F.size(F.split(F.col("r.seg"), " ")).cast("long").alias("n_pieces"),
        F.col("r.score").alias("score"),
        F.col("r.seg").alias("seg"),
    ).orderBy("word")


# ---------------------------------------------------------------------------
def _q106_oracle() -> str:
    from alt_spark.operators.bpe import ddb_word_symbol_string
    from alt_spark.operators.unigram import ddb_viterbi_ctes

    words_cte = """
  SELECT word, CAST(sum(cnt) AS BIGINT) AS cnt FROM lw GROUP BY word
"""
    sym = ddb_word_symbol_string("word")
    return f"""
WITH lw AS (
  SELECT lang, word, count(*) AS cnt FROM (
    SELECT lang, unnest({_DDB_TOKENS}) AS word FROM documents
  ) GROUP BY 1, 2
),
{ddb_viterbi_ctes(words_cte, _UNI_MAXW)},
uni AS (
  SELECT wl.word, CAST(len(string_split(f.seg, ' ')) AS BIGINT) AS n_pieces
  FROM wl JOIN fin f ON f.word = wl.word AND f.n = wl.n
),
bpe AS (
  SELECT word,
         CAST(length({sym}) - length(replace({sym}, chr(1), '')) AS BIGINT) AS n_sym
  FROM (SELECT DISTINCT word FROM lw WHERE length(word) <= {_UNI_MAXW})
),
j AS (
  SELECT lw.lang, lw.cnt, u.n_pieces, b.n_sym
  FROM lw
  JOIN uni u ON u.word = lw.word
  JOIN bpe b ON b.word = lw.word
  WHERE length(lw.word) <= {_UNI_MAXW}
)
SELECT lang,
       CAST(sum(cnt) AS BIGINT) AS words,
       CAST(sum(cnt * n_sym) AS BIGINT) AS bpe_symbols,
       CAST(sum(cnt * n_pieces) AS BIGINT) AS uni_pieces,
       CAST((10000 * sum(cnt * n_sym)) // sum(cnt) AS BIGINT) AS bpe_fert_permyriad,
       CAST((10000 * sum(cnt * n_pieces)) // sum(cnt) AS BIGINT) AS uni_fert_permyriad,
       CASE WHEN sum(cnt * n_pieces) < sum(cnt * n_sym) THEN 'unigram'
            WHEN sum(cnt * n_sym) < sum(cnt * n_pieces) THEN 'bpe'
            ELSE 'tie' END AS winner
FROM j GROUP BY lang ORDER BY lang
"""


@query("q106_tokenizer_bakeoff", oracle=_q106_oracle())
def q106(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer bake-off: BPE (pinned merges, q88) vs unigram-LM
    (pinned vocab, q105) fertility per language over the SAME word set
    — the table a team reads to pick the production tokenizer before
    committing a vocabulary (outsized fertility = the language shatters
    and trains expensively; q96 prices ONE tokenizer, this ranks two).
    BPE symbol counts carry the end-of-word-marker convention (</w>
    merges into final symbols), the standard caveat when comparing the
    two families' raw counts — both sides are integer-exact, so the
    verdict column is a deterministic integer compare, not a float one.

    Plan (word-type doctrine, twice over): one (lang, word) groupBy is
    the only corpus-wide exchange; BOTH segmenters then run in-row on
    that bounded frame (the BPE sentinel replace chain and the unigram
    Viterbi fold — no join, no explode), followed by one bounded
    per-lang aggregate. At 100 TB the bake-off costs one corpus scan.
    """
    from alt_spark.operators.bpe import word_symbol_string
    from alt_spark.operators.unigram import viterbi_segment

    docs = load_table(spark, sf, "documents")
    lw = (
        docs.select("lang", F.explode(_tokens_col()).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count("*").alias("cnt"))
        .filter(F.length("word") <= _UNI_MAXW)
    )
    s = word_symbol_string(F.col("word"))
    scored = lw.select(
        "lang",
        "cnt",
        F.size(F.split(viterbi_segment(F.col("word"))["seg"], " "))
        .cast("long")
        .alias("n_pieces"),
        (F.length(s) - F.length(F.replace(s, F.lit("\x01"))))
        .cast("long")
        .alias("n_sym"),
    )
    g = scored.groupBy("lang").agg(
        F.sum("cnt").cast("long").alias("words"),
        F.sum(F.col("cnt") * F.col("n_sym")).cast("long").alias("bpe_symbols"),
        F.sum(F.col("cnt") * F.col("n_pieces")).cast("long").alias("uni_pieces"),
    )
    return g.select(
        "lang",
        "words",
        "bpe_symbols",
        "uni_pieces",
        F.expr("(10000 * bpe_symbols) div words")
        .cast("long")
        .alias("bpe_fert_permyriad"),
        F.expr("(10000 * uni_pieces) div words")
        .cast("long")
        .alias("uni_fert_permyriad"),
        F.when(F.col("uni_pieces") < F.col("bpe_symbols"), "unigram")
        .when(F.col("bpe_symbols") < F.col("uni_pieces"), "bpe")
        .otherwise("tie")
        .alias("winner"),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
_WPS_SALT = "wps-v1"
_WPS_K = 100


@query(
    "q111_weighted_priority_sample",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, CAST(len({_DDB_TOKENS}) AS BIGINT) AS w FROM documents
  WHERE len({_DDB_TOKENS}) > 0
), pri AS (
  SELECT doc_id, lang, w,
         CAST(w AS DOUBLE) / CAST({DDB_H60(f"('{_WPS_SALT}' || ':' || CAST(doc_id AS VARCHAR))")} + 1 AS DOUBLE) AS p
  FROM t
)
SELECT doc_id, lang, w
FROM pri
ORDER BY p DESC, doc_id
LIMIT {_WPS_K}
""",
)
def q111(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted priority sampling without replacement (Duffield/Lund/
    Thorup order sampling, hash-derandomized): the k documents with the
    largest priority w/u, where w is the document's token mass and u
    its deterministic md5-uniform — heavier documents enter the sample
    proportionally more often, yet the draw is reproducible across
    runs, retries, and cluster sizes (the q59/q94 doctrine extended to
    WEIGHTED selection; the rate sampler cannot weight, the exact-k
    carve cannot either). Completes the sampling family: q59 fixed
    rates, q70/q103 derived rates, q94 exact-k uniform, q111 exact-k
    weighted.

    Cross-engine float discipline: both engines build the priority
    from the SAME two integers (w and h+1) — IEEE double conversion
    and one division are bit-identical on identical operands, so the
    ORDER is exact and ties break on doc_id. No float is emitted in
    the output (the selection SET is the contract).

    Plan (100 TB shape): priority is a narrow in-scan expression and
    the selection is ONE TakeOrderedAndProject — no shuffle beyond the
    bounded top-k merge, no global sort, no single-partition exchange.
    """
    from alt_spark.functions.hashing import portable_hash60

    docs = load_table(spark, sf, "documents")
    t = docs.select(
        "doc_id", "lang", F.size(_tokens_col()).cast("long").alias("w")
    ).filter(F.col("w") > 0)
    h = portable_hash60(
        F.concat(F.lit(_WPS_SALT), F.lit(":"), F.col("doc_id").cast("string"))
    )
    pri = t.withColumn(
        "p", F.col("w").cast("double") / (h + F.lit(1)).cast("double")
    )
    return (
        pri.orderBy(F.desc("p"), "doc_id")
        .limit(_WPS_K)
        .select("doc_id", "lang", "w")
    )


# ---------------------------------------------------------------------------
# Drift buckets: fixed token-count thresholds (a release gate compares
# SHAPE across versions, so thresholds are pinned config, not corpus
# quantiles — quantiles would move with the very drift being measured).
_DRIFT_LO, _DRIFT_HI = 40, 70


@query(
    "q113_corpus_drift_report",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, len({_DDB_TOKENS}) AS n_tok,
         CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END AS v,
         CASE WHEN len({_DDB_TOKENS}) < {_DRIFT_LO} THEN 0
              WHEN len({_DDB_TOKENS}) < {_DRIFT_HI} THEN 1
              ELSE 2 END AS bucket
  FROM documents
), cell AS (
  SELECT lang, bucket,
         count(*) FILTER (v = 'a') AS n_a,
         count(*) FILTER (v = 'b') AS n_b
  FROM t GROUP BY 1, 2
), shared AS (
  SELECT lang, bucket, n_a, n_b,
         CAST((10000 * n_a) // greatest(sum(n_a) OVER (PARTITION BY lang), 1) AS BIGINT) AS share_a_pm,
         CAST((10000 * n_b) // greatest(sum(n_b) OVER (PARTITION BY lang), 1) AS BIGINT) AS share_b_pm
  FROM cell
)
SELECT lang, CAST(bucket AS BIGINT) AS bucket, n_a, n_b, share_a_pm, share_b_pm,
       share_a_pm - share_b_pm AS delta_pm,
       CAST(sum((share_a_pm - share_b_pm) * (share_a_pm - share_b_pm))
            OVER (PARTITION BY lang) AS BIGINT) AS lang_drift_l2
FROM shared
ORDER BY lang, bucket
""",
)
def q113(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus drift report — the release-to-release gate a corpus
    publisher runs before shipping version B next to version A: per
    (lang, length bucket), document counts in each version, permyriad
    shares WITHIN each version's language slice, the share delta, and
    a per-language integer L2 drift statistic (sum of squared share
    deltas over the bucket histogram — the integer-exact surface of a
    chi-square/PSI-style shift test; PSI's log ratio is deliberately
    NOT computed: libm vs JVM ln differ in the last ulp, and a drift
    GATE must replay exactly). Even/odd doc_id plays the two versions
    (the q62 benchmark device). Bucket thresholds are pinned config —
    corpus quantiles would move with the drift being measured.

    Plan: one in-row version/bucket tag, ONE bounded groupBy
    (|langs| x 3 cells), window shares over the bounded cell frame —
    a 100 TB drift gate is one scan + a metadata-sized report.
    """
    from pyspark.sql.window import Window

    docs = load_table(spark, sf, "documents")
    n_tok = F.size(_tokens_col())
    t = docs.select(
        "lang",
        F.when(F.col("doc_id") % 2 == 0, "a").otherwise("b").alias("v"),
        F.when(n_tok < _DRIFT_LO, 0)
        .when(n_tok < _DRIFT_HI, 1)
        .otherwise(2)
        .alias("bucket"),
    )
    cell = t.groupBy("lang", "bucket").agg(
        F.count(F.when(F.col("v") == "a", 1)).alias("n_a"),
        F.count(F.when(F.col("v") == "b", 1)).alias("n_b"),
    )
    lw = Window.partitionBy("lang")
    shared = cell.select(
        "lang",
        F.col("bucket").cast("long").alias("bucket"),
        "n_a",
        "n_b",
        F.expr(
            "(10000 * n_a) div greatest(sum(n_a) OVER (PARTITION BY lang), 1)"
        )
        .cast("long")
        .alias("share_a_pm"),
        F.expr(
            "(10000 * n_b) div greatest(sum(n_b) OVER (PARTITION BY lang), 1)"
        )
        .cast("long")
        .alias("share_b_pm"),
    )
    return (
        shared.withColumn("delta_pm", F.col("share_a_pm") - F.col("share_b_pm"))
        .withColumn(
            "lang_drift_l2",
            F.sum(F.col("delta_pm") * F.col("delta_pm")).over(lw).cast("long"),
        )
        .orderBy("lang", "bucket")
    )


# ---------------------------------------------------------------------------
# q116: doc-grain release diff. Release A = raw docs passing the old
# token gate; release B = the re-cleaned corpus (stopword-dropping
# cleaning pass) under the new gate. Gates chosen so all four classes
# are non-empty at every generated SF (verified 0.001/0.01/0.1).
_RDIFF_STOP = ("a", "the")
_RDIFF_GATE_A = 30  # release A: raw-token minimum
_RDIFF_GATE_B = 27  # release B: cleaned-token minimum


@query(
    "q116_release_doc_diff",
    oracle=f"""
WITH c AS (
  SELECT doc_id, len({_DDB_TOKENS}) AS n_raw,
         len(list_filter({_DDB_TOKENS},
             t -> t NOT IN ('{"','".join(_RDIFF_STOP)}'))) AS n_clean
  FROM documents
), m AS (
  SELECT doc_id, n_raw, n_clean,
         n_raw >= {_RDIFF_GATE_A} AS in_a,
         n_clean >= {_RDIFF_GATE_B} AS in_b,
         n_raw != n_clean AS ch
  FROM c
)
SELECT CASE WHEN in_a AND in_b AND ch THEN 'changed'
            WHEN in_a AND in_b THEN 'unchanged'
            WHEN in_b THEN 'added' ELSE 'removed' END AS diff_class,
       count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum,
       CAST(sum(CASE WHEN in_a THEN n_raw ELSE 0 END) AS BIGINT) AS tok_a,
       CAST(sum(CASE WHEN in_b THEN n_clean ELSE 0 END) AS BIGINT) AS tok_b
FROM m WHERE in_a OR in_b
GROUP BY 1 ORDER BY 1
""",
)
def q116(spark: SparkSession, sf: str) -> DataFrame:
    """Doc-grain release diff — the changelog a corpus publisher ships
    next to version B: per diff class (added / removed / changed /
    unchanged), document counts, an id checksum pinning the exact
    membership of each class, and both releases' token masses.
    Complements q113 (aggregate drift gate) at document grain: drift
    says the histograms moved; the diff says WHICH documents did.
    Release A = raw docs over the old token gate; release B = the
    stopword-cleaned corpus over the new gate — so 'changed' is a
    provable in-row predicate (the cleaning dropped tokens), never a
    float or content heuristic.

    Plan (100 TB shape): both releases derive from ONE scan (the
    version tag and both token counts are in-row Column exprs — no
    self-join of two release snapshots when B is a deterministic
    function of A, which a re-clean release is), then one 4-group
    aggregate. A diff of two INDEPENDENT snapshots would instead be
    the q03-shape full outer on doc_id — covered there; this query
    pins the cheaper re-release special case.
    """
    toks = _tokens_col()
    clean = F.filter(toks, lambda t: ~t.isin(*_RDIFF_STOP))
    m = load_table(spark, sf, "documents").select(
        "doc_id",
        F.size(toks).alias("n_raw"),
        F.size(clean).alias("n_clean"),
    ).select(
        "doc_id",
        "n_raw",
        "n_clean",
        (F.col("n_raw") >= _RDIFF_GATE_A).alias("in_a"),
        (F.col("n_clean") >= _RDIFF_GATE_B).alias("in_b"),
        (F.col("n_raw") != F.col("n_clean")).alias("ch"),
    )
    cls = (
        F.when(F.col("in_a") & F.col("in_b") & F.col("ch"), "changed")
        .when(F.col("in_a") & F.col("in_b"), "unchanged")
        .when(F.col("in_b"), "added")
        .when(F.col("in_a"), "removed")
    )
    return (
        m.withColumn("diff_class", cls)
        .filter(F.col("diff_class").isNotNull())
        .groupBy("diff_class")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
            F.sum(F.when(F.col("in_a"), F.col("n_raw")).otherwise(0))
            .cast("long")
            .alias("tok_a"),
            F.sum(F.when(F.col("in_b"), F.col("n_clean")).otherwise(0))
            .cast("long")
            .alias("tok_b"),
        )
        .orderBy("diff_class")
    )


# ---------------------------------------------------------------------------
# q122: Bloom-prefiltered decontamination. Same contamination truth as
# q62 (any shared 5-gram with the benchmark split), but the corpus-side
# membership test goes through a fixed-size Bloom bitmap instead of a
# gram-set join: the bitmap is CONSTANT-SIZE however large the holdout
# registry grows, and the probe is an in-row expression at scan speed.
# m = 2^17 bits / K = 2 salts are test-scale constants chosen so the
# false-positive path is actually exercised at sf0.1 (~5e-3 per-gram FP
# under its ~7% load) while staying negligible at sf0.01; a production
# deployment sizes m ≈ 1.44·K·n_grams (10 bits/element for 1% FP).
_BLOOM_M = 1 << 17
_BLOOM_SALTS = ("bf1", "bf2")
_BLOOM_WORDS_CTE = ddb_bloom_words(
    "SELECT g FROM bench_g", _BLOOM_M, _BLOOM_SALTS
)


@query(
    "q122_bloom_decontamination",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, lang, {_DDB_TOKENS} AS toks FROM documents
), grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(toks, s + 1, s + {_DECON_N}), ' ') AS g
  FROM (
    SELECT doc_id, toks, unnest(generate_series(0, len(toks) - {_DECON_N}, 1)) AS s
    FROM tok WHERE len(toks) >= {_DECON_N}
  )
), bench_g AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0
), words AS (
  {_BLOOM_WORDS_CTE}
), cand AS (
  SELECT DISTINCT doc_id FROM grams
  WHERE doc_id % 50 <> 0
    AND {ddb_bloom_probe('g', _BLOOM_M, _BLOOM_SALTS, 'words')}
), cont AS (
  SELECT DISTINCT doc_id FROM grams
  WHERE doc_id % 50 <> 0 AND g IN (SELECT g FROM bench_g)
)
SELECT d.lang,
       count(*) AS n_docs,
       CAST(count(ca.doc_id) AS BIGINT) AS n_candidates,
       CAST(coalesce(sum(CASE WHEN ca.doc_id IS NOT NULL THEN d.doc_id END), 0)
            AS BIGINT) AS cand_checksum,
       CAST(count(co.doc_id) AS BIGINT) AS n_contaminated,
       CAST(coalesce(sum(CASE WHEN co.doc_id IS NOT NULL THEN d.doc_id END), 0)
            AS BIGINT) AS cont_checksum,
       CAST(count(ca.doc_id) - count(co.doc_id) AS BIGINT) AS n_false_positive
FROM documents d
LEFT JOIN cand ca ON ca.doc_id = d.doc_id
LEFT JOIN cont co ON co.doc_id = d.doc_id
WHERE d.doc_id % 50 <> 0
GROUP BY d.lang
ORDER BY d.lang
""",
)
def q122(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-prefiltered benchmark decontamination, with the filter's
    economics made visible: per language, how many corpus docs the
    bitmap flags as candidates (cand_checksum pins the exact candidate
    SET — the Bloom structure itself is hash-verified cross-engine, not
    just the final answer), how many are truly contaminated under the
    q62 gram rule, and the false-positive tail the exact verify pays
    for. No false negatives by construction (every benchmark gram's
    bits are set), so verifying ONLY candidates reproduces the exact
    q62 truth — pytest pins that equality.

    Plan at 100 TB: the bitmap builds from the benchmark side in two
    bounded shuffles and broadcasts as ONE row (~32 KB here; a few
    hundred MB serves billions of holdout grams); candidacy is
    F.exists over the in-row gram array — zero exchanges on the corpus
    scan; only candidate docs explode grams into the exact-verify
    broadcast join. The corpus is never shuffled by the check.
    """
    from alt_spark.operators.bloom import bloom_bitmap, bloom_hit
    from alt_spark.operators.dedup import shingles

    docs = load_table(spark, sf, "documents")
    base = docs.select(
        "doc_id", "lang", shingles(_tokens_col(), _DECON_N).alias("grams")
    )
    bench_g = (
        base.filter(F.col("doc_id") % 50 == 0)
        .select(F.explode("grams").alias("g"))
        .distinct()
    )
    # bench_g feeds the bitmap build AND the exact-verify join; probed
    # feeds the verify branch AND the final aggregate. Gated lazy
    # checkpoints stop each second consumer from re-deriving the gram
    # explode + bitmap chain (hermetic switch off -> plan audits see
    # the full lineage).
    if _dfcache.MATERIALIZE:
        bench_g = bench_g.localCheckpoint(eager=False)
    bitmap = bloom_bitmap(bench_g, "g", _BLOOM_M, _BLOOM_SALTS)
    corpus = base.filter(F.col("doc_id") % 50 != 0)
    # The checkpoint carries only (doc_id, lang, is_cand) — NOT the
    # gram arrays: materializing 50-string arrays per doc writes
    # corpus-scale bytes for rows the verify leg mostly ignores
    # (measured ~4 s of the sf0.1 wall). The verify leg instead
    # recomputes grams AFTER the candidate semi-join, so the expensive
    # projection runs only over the candidate subset.
    probed = corpus.crossJoin(F.broadcast(bitmap)).select(
        "doc_id",
        "lang",
        F.exists(
            "grams", lambda g: bloom_hit(F.col("bloom"), g, _BLOOM_M, _BLOOM_SALTS)
        ).alias("is_cand"),
    )
    if _dfcache.MATERIALIZE:
        probed = probed.localCheckpoint(eager=False)
    cand_docs = docs.select("doc_id", "text").join(
        probed.filter("is_cand").select("doc_id"), "doc_id"
    )
    cont = (
        cand_docs.select(
            "doc_id",
            F.explode(shingles(_tokens_col(), _DECON_N)).alias("g"),
        )
        .join(F.broadcast(bench_g), "g")
        .select("doc_id")
        .distinct()
        .withColumn("is_cont", F.lit(True))
    )
    return (
        probed.join(cont, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("is_cand"), 1).otherwise(0))
            .cast("long")
            .alias("n_candidates"),
            F.sum(F.when(F.col("is_cand"), F.col("doc_id")).otherwise(0))
            .cast("long")
            .alias("cand_checksum"),
            F.sum(F.when(F.col("is_cont"), 1).otherwise(0))
            .cast("long")
            .alias("n_contaminated"),
            F.sum(F.when(F.col("is_cont"), F.col("doc_id")).otherwise(0))
            .cast("long")
            .alias("cont_checksum"),
        )
        .withColumn(
            "n_false_positive", F.col("n_candidates") - F.col("n_contaminated")
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q125: Poisson-bootstrap confidence intervals for a corpus metric.
# Weights are hash-derandomized: replica r draws w(doc, r) from
# Poisson(1) by comparing the doc's 60-bit hash against the cumulative
# pmf scaled to 2^60 (constants computed once in Python; both engines
# replay the identical integer comparisons, so the whole resampling
# chain is oracle-exact). Capped at 6 (P[X>5] ~ 6e-4).
_BOOT_B = 64
_BOOT_CUM = (
    424136118829305344,
    848272237658610688,
    1060340297073263360,
    1131029650211480960,
    1148701988496035328,
    1152236456152946176,
)
# CI ranks are ceil-percentiles of the NON-EMPTY replica count, not of
# B: a replica whose Poisson weights all drew 0 has no mean — mapping
# it to 0 would inject spurious zeros and collapse ci_lo for strata
# small enough that P(sum w = 0) = e^-n is non-negligible (review
# finding). With every stratum non-tiny all 64 replicas survive and
# the ranks are 4/61, the classic 90% interval.


def _boot_w_sql(h: str) -> str:
    arms = " ".join(
        f"WHEN {h} < {c} THEN {k}" for k, c in enumerate(_BOOT_CUM)
    )
    return f"(CASE {arms} ELSE 6 END)"


@query(
    "q125_bootstrap_quality_ci",
    oracle=f"""
WITH d AS (
  SELECT doc_id, lang, len({_DDB_TOKENS}) AS n_tok FROM documents
), rep AS (
  SELECT d.*, r FROM d, (SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS r)
), w AS (
  SELECT lang, r, n_tok,
         {_boot_w_sql(DDB_H60("doc_id || '|' || r || '|bs'"))} AS w
  FROM rep
), rm AS (
  SELECT lang, r,
         CAST((1000 * sum(w * n_tok)) // sum(w) AS BIGINT) AS m
  FROM w GROUP BY lang, r HAVING sum(w) > 0
), ranked AS (
  SELECT lang, m,
         row_number() OVER (PARTITION BY lang ORDER BY m, r) AS rn,
         count(*) OVER (PARTITION BY lang) AS nrep
  FROM rm
), sel AS (
  SELECT lang,
         max(CASE WHEN rn = (5 * nrep + 99) // 100 THEN m END) AS ci_lo_milli,
         max(CASE WHEN rn = (95 * nrep + 99) // 100 THEN m END) AS ci_hi_milli
  FROM ranked GROUP BY lang
), point AS (
  SELECT lang, count(*) AS n_docs,
         CAST((1000 * sum(n_tok)) // count(*) AS BIGINT) AS mean_milli
  FROM d GROUP BY lang
)
SELECT p.lang, p.n_docs, p.mean_milli, s.ci_lo_milli, s.ci_hi_milli
FROM point p JOIN sel s USING (lang)
ORDER BY p.lang
""",
)
def q125(spark: SparkSession, sf: str) -> DataFrame:
    """Bootstrap confidence intervals for a per-language corpus metric
    (mean tokens per document, integer milli units) — the uncertainty
    column a dataset card (q82) or drift gate (q113) needs before a
    release decision is defensible: 'mean length moved 2%' means
    nothing without the resampling spread. The estimator is the
    POISSON bootstrap (Chamandy et al. 2012, "Estimating uncertainty
    for massive data streams" — the production distributed form:
    per-row i.i.d. Poisson(1) weights approximate multinomial
    resampling without ever materializing a resample; Efron 1979 for
    the bootstrap itself), hash-derandomized so both engines draw
    identical weights — no RNG crosses the oracle boundary. CI bounds
    are the ceil(5%)/ceil(95%) smallest of the NON-EMPTY replica means
    — 4th/61st when all 64 survive; a replica whose weights all drew 0
    is excluded rather than forced to mean 0 (ties broken
    by replica id so the rank join is total-ordered).

    Plan (100 TB shape): weights are in-row CASE comparisons on the
    doc hash; the replica explode fans 64x but collapses immediately
    through ONE map-side-combinable groupBy into (lang, 64) partial
    rows — the shuffle carries replica partials, never documents; the
    rank window sorts 64 rows per language. Point estimate rides a
    second bounded aggregate over the same scan.
    """
    from alt_spark.functions.hashing import portable_hash60

    docs = load_table(spark, sf, "documents").select(
        "doc_id", "lang", F.size(_tokens_col()).cast("long").alias("n_tok")
    )
    rep = docs.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("r")
    )
    h = portable_hash60(
        F.concat_ws("|", F.col("doc_id"), F.col("r"), F.lit("bs"))
    )
    w = F.lit(6)
    for k, c in reversed(list(enumerate(_BOOT_CUM))):
        w = F.when(h < c, k).otherwise(w)
    # Empty replicas (every weight drew 0 — P = e^-n per replica) are
    # EXCLUDED, not mapped to 0: a forced 0 would enter the rank order
    # and collapse ci_lo for small strata. CI ranks are ceil-percentiles
    # of the surviving replica count.
    rm = (
        rep.withColumn("w", w)
        .groupBy("lang", "r")
        .agg(
            F.sum("w").alias("_ws"),
            F.expr("sum(w * n_tok)").alias("_wt"),
        )
        .filter(F.col("_ws") > 0)
        .select(
            "lang",
            "r",
            # The 1000x multiply runs in DECIMAL(38,0) (the q124 device;
            # DuckDB's sum(BIGINT) already widens to HUGEINT): a
            # per-(lang, replica) weighted token sum above ~9.2e15 would
            # otherwise wrap silently in int64 with ANSI off — inside
            # the 100 TB envelope once per-language corpora reach ~10^13
            # tokens at mean Poisson weight 1.
            F.expr(
                "CAST((1000 * CAST(_wt AS DECIMAL(38,0))) div _ws AS BIGINT)"
            ).alias("m"),
        )
    )
    from pyspark.sql.window import Window

    rk = Window.partitionBy("lang").orderBy("m", "r")
    ranked = rm.withColumn("rn", F.row_number().over(rk)).withColumn(
        "nrep", F.count("*").over(Window.partitionBy("lang"))
    )
    # Both bounds from ONE pass over the windowed frame (two filtered
    # joins would re-run the 64x explode chain once per leg).
    sel = ranked.groupBy("lang").agg(
        F.max(
            F.when(F.expr("rn = (5 * nrep + 99) div 100"), F.col("m"))
        ).alias("ci_lo_milli"),
        F.max(
            F.when(F.expr("rn = (95 * nrep + 99) div 100"), F.col("m"))
        ).alias("ci_hi_milli"),
    )
    point = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        # Same DECIMAL(38,0) widening as the replica means: the point
        # estimate's token sum is the largest accumulator in the query.
        F.expr(
            "CAST((1000 * CAST(sum(n_tok) AS DECIMAL(38,0))) div count(*)"
            " AS BIGINT)"
        ).alias("mean_milli"),
    )
    return point.join(sel, "lang").orderBy("lang")


# ---------------------------------------------------------------------------
# q127: exact two-sample Kolmogorov-Smirnov drift test between releases.
# Integer-exact: the statistic is computed CROSS-MULTIPLIED —
# Ds = max over values v of |cumA(v)*nB - cumB(v)*nA| — so no division
# happens before the max, and the significance gate squares Ds against
# the classic large-sample critical value c(0.05) = 1.358
# (10^4 * Ds^2 > 18442 * nA*nB*(nA+nB), with c^2 * 10^4 = 18442). Both
# engines replay the identical integer comparisons. Two comparisons are
# built so BOTH verdicts are exercised at every SF: 'resample' (even vs
# odd doc_ids — same generator, must NOT flag) and 'reclean' (raw vs
# stopword-cleaned token counts — a real shift, must flag).
_KS_C2_E4 = 18442  # ceil(1.358^2 * 1e4): alpha = 0.05 critical constant
# Release B's re-clean for the 'reclean' comparison: drop short tokens.
# Deliberately a LARGE shift (the corpus vocabulary is short-token-
# heavy) so the drifted comparison clears the alpha=0.05 bar at every
# generated per-language sample size; q116's gentler stopword re-clean
# shifts counts by ~2 tokens/doc, which an exact KS test at n ~ 10^2
# correctly refuses to call significant.
_KS_MIN_TOKEN_LEN = 4


@query(
    "q127_release_ks_drift",
    oracle=f"""
WITH d AS (
  SELECT doc_id, lang, len({_DDB_TOKENS}) AS n_raw,
         len(list_filter({_DDB_TOKENS},
             t -> length(t) > {_KS_MIN_TOKEN_LEN})) AS n_clean
  FROM documents
), tall AS (
  SELECT 'resample' AS cmp, lang, n_raw AS v,
         CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS a,
         CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END AS b
  FROM d
  UNION ALL
  SELECT 'reclean', lang, n_raw, 1, 0 FROM d
  UNION ALL
  SELECT 'reclean', lang, n_clean, 0, 1 FROM d
), pv AS (
  SELECT cmp, lang, v, sum(a) AS ca, sum(b) AS cb
  FROM tall GROUP BY 1, 2, 3
), cum AS (
  SELECT cmp, lang, v,
         sum(ca) OVER w AS cum_a, sum(cb) OVER w AS cum_b,
         sum(ca) OVER t AS n_a, sum(cb) OVER t AS n_b
  FROM pv
  WINDOW w AS (PARTITION BY cmp, lang ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         t AS (PARTITION BY cmp, lang)
), ks AS (
  SELECT cmp, lang, any_value(n_a) AS n_a, any_value(n_b) AS n_b,
         max(abs(CAST(cum_a AS HUGEINT) * n_b
                 - CAST(cum_b AS HUGEINT) * n_a)) AS ds
  FROM cum GROUP BY 1, 2
)
SELECT cmp, lang, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST((10000 * ds) // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT) AS ks_pm,
       CAST(CASE WHEN 10000 * ds * ds
                      > {_KS_C2_E4} * CAST(n_a AS HUGEINT) * n_b * (n_a + n_b)
                 THEN 1 ELSE 0 END AS BIGINT) AS drift_flag
FROM ks
ORDER BY cmp, lang
""",
)
def q127(spark: SparkSession, sf: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test between releases,
    integer-exact — the SIGNIFICANCE column next to q113's drift
    magnitudes and q125's bootstrap CIs: per (comparison, lang), the
    scaled KS statistic in permyriad and an alpha=0.05 verdict. The
    'resample' comparison (even vs odd doc_ids, same generator) must
    not flag; the 'reclean' comparison (raw vs short-token-stripped
    counts — a release-B re-clean in the q116 mold, sized so the shift
    clears the bar at generated sample sizes) is a real distribution
    shift and must. Cross-multiplied cumulative counts make the statistic
    exact (no float CDF ever crosses the oracle boundary); the gate
    squares the statistic against c(0.05)^2 = 1.8442 scaled to 1e4.

    Exactness envelope (document, don't fake): Ds <= nA*nB, so the
    squared gate operand Ds^2*(nA+nB)*1e4 stays inside DECIMAL(38,0)/
    HUGEINT while nA*nB < ~3e16 — per-stratum release samples up to
    ~1.7e8 docs each. Past that, run the test on a uniform doc_id
    subsample: KS is distribution-free and already absurdly
    overpowered at 1e8 (the flag becomes a practical-significance
    question, not a compute one).

    Plan (100 TB shape): one corpus scan fans into the three tall
    legs IN-ROW (no self-join of releases — the q116 doctrine); the
    per-(cmp, lang, value) pre-aggregate is map-side combinable and
    collapses the corpus to value-histogram grain before the window;
    the cumulative window then orders ~|distinct lengths| rows per
    stratum — bounded by content, not corpus size.
    """
    toks = _tokens_col()
    clean = F.filter(toks, lambda t: F.length(t) > _KS_MIN_TOKEN_LEN)
    d = load_table(spark, sf, "documents").select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_raw"),
        F.size(clean).alias("n_clean"),
    )
    even = (F.col("doc_id") % 2 == 0).cast("long")
    tall = (
        d.select(
            F.lit("resample").alias("cmp"),
            "lang",
            F.col("n_raw").alias("v"),
            even.alias("a"),
            (1 - even).alias("b"),
        )
        .unionByName(
            d.select(
                F.lit("reclean").alias("cmp"),
                "lang",
                F.col("n_raw").alias("v"),
                F.lit(1).alias("a"),
                F.lit(0).alias("b"),
            )
        )
        .unionByName(
            d.select(
                F.lit("reclean").alias("cmp"),
                "lang",
                F.col("n_clean").alias("v"),
                F.lit(0).alias("a"),
                F.lit(1).alias("b"),
            )
        )
    )
    pv = tall.groupBy("cmp", "lang", "v").agg(
        F.sum("a").alias("ca"), F.sum("b").alias("cb")
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("cmp", "lang")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = Window.partitionBy("cmp", "lang")
    dec = "decimal(38,0)"
    cum = pv.select(
        "cmp",
        "lang",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
        F.sum("ca").over(t).alias("n_a"),
        F.sum("cb").over(t).alias("n_b"),
    )
    ks = cum.groupBy("cmp", "lang").agg(
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
        F.max(
            F.abs(
                F.col("cum_a").cast(dec) * F.col("n_b")
                - F.col("cum_b").cast(dec) * F.col("n_a")
            )
        ).alias("ds"),
    )
    return ks.select(
        "cmp",
        "lang",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.expr(
            "CAST((10000 * ds) div (CAST(n_a AS DECIMAL(38,0)) * n_b)"
            " AS BIGINT)"
        ).alias("ks_pm"),
        F.expr(
            f"CAST(CASE WHEN 10000 * ds * ds > {_KS_C2_E4}"
            " * CAST(n_a AS DECIMAL(38,0)) * n_b * (n_a + n_b)"
            " THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("drift_flag"),
    ).orderBy("cmp", "lang")


# ---------------------------------------------------------------------------
# q128: quality-ordered curriculum schedule. The one §2.E1 surface that
# had plan/pytest evidence but no driver hash row: operators/rank.py's
# DISTRIBUTED global row numbering (range-repartition + per-partition
# rank + broadcast offsets — no SinglePartition sort of the data). A
# curriculum batch schedule is its natural consumer: order the corpus
# once by a quality score, cut into fixed-size training steps, report
# each step's language mix — high-quality-first ordering is the
# standard curriculum shape (Bengio 2009) and the global order is
# exactly what a naive `row_number() OVER (ORDER BY ...)` cannot do at
# corpus scale.
_CURR_STEP = 50  # docs per training step (a config knob; fixed for the oracle)


@query(
    "q128_curriculum_schedule",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang,
         (10000 * length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')))
           // greatest(length(text), 1) AS score_pm
  FROM documents
), ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (ORDER BY score_pm DESC, doc_id) AS rn
  FROM scored
)
SELECT (rn - 1) // {_CURR_STEP} AS step, lang,
       count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum,
       CAST(min(rn) AS BIGINT) AS rank_lo,
       CAST(max(rn) AS BIGINT) AS rank_hi
FROM ranked
GROUP BY 1, 2
ORDER BY step, lang
""",
)
def q128(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-ordered curriculum schedule: the corpus is globally
    ordered by an integer quality score (alphanumeric-density
    permyriad, the q27/q82 device — exact, so both engines produce the
    identical total order under the (score desc, doc_id) tiebreak),
    cut into fixed ``_CURR_STEP``-document training steps, and each
    (step, lang) cell reports its count, id checksum (exact membership
    pin), and global rank span. High-quality-first is the standard
    curriculum ordering; the per-step language mix is what an operator
    reads before trusting the schedule.

    The load-bearing device is :func:`alt_spark.operators.rank.
    global_row_number` — E1's 100 TB form: range-repartition on the
    sort keys, rank locally, shift by broadcast per-partition offsets.
    A plain ``row_number() OVER (ORDER BY ...)`` funnels the corpus
    through ONE task; this plan's only data exchanges are the range
    partitioning and the final (step, lang) aggregate (map-side
    combinable). The oracle replays the naive window — same total
    order, so any offset/boundary bug in the distributed form
    hash-mismatches.
    """
    from alt_spark.operators.rank import global_row_number

    scored = load_table(spark, sf, "documents").select(
        "doc_id",
        "lang",
        F.expr(
            "(10000 * length(regexp_replace(text, '[^A-Za-z0-9 ]', '')))"
            " div greatest(length(text), 1)"
        ).alias("score_pm"),
    )
    ranked = global_row_number(
        scored, [F.desc("score_pm"), F.asc("doc_id")], out_col="rn"
    )
    return (
        ranked.groupBy(
            # Integer div, not float-divide-then-cast: ranks are exact
            # int64 and must stay exact past 2^53 docs.
            F.expr(f"(rn - 1) div {_CURR_STEP}").alias("step"),
            "lang",
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
            F.min("rn").cast("long").alias("rank_lo"),
            F.max("rn").cast("long").alias("rank_hi"),
        )
        .orderBy("step", "lang")
    )
