"""Q59-Q62: training-data preparation queries (north-star pillar).

The ops between "clean corpus" and "token batches": deterministic data
mixing (operators/mixing.py), context-window chunking and sequence
packing (operators/packing.py), and benchmark decontamination
(operators/dedup.decontaminate). All four are SQL-expressible and carry
full DuckDB oracles — sampling decisions, chunk contents (md5), bin
assignments, and surviving-document sets are value-checked cross-engine,
not just counted. They are beyond the reference's own surface (it has no
training-export path); q59-q61 sit in the driver report window since the
r5 rotation, q62 in the documented tail, and all four run in-pytest
oracle parity (tests/test_oracle.py) plus the property suite
(tests/test_training.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alt_spark.catalog import load_table
from alt_spark.functions.cleaning import ddb_scrub_pii
from alt_spark.functions.text_analysis import DDB_TOKENS as _DDB_TOKENS
from alt_spark.operators.dedup import tokens_col
from alt_spark.operators.mixing import ddb_sample_bucket, stratified_sample
from alt_spark.operators.packing import chunk_tokens, pack_contiguous
from alt_spark.queries import query

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
       sum(doc_id) AS id_checksum
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
       sum(n_tok) AS tok_sum
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
       sum(doc_id) AS id_checksum
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
# engines (same device as q29's CJK probe rows).
_PII_EXTRA: tuple[tuple[int, str], ...] = (
    (200001, "contact me at alice@example.com or visit https://example.com/page?q=1 soon"),
    (200002, "server at 192.168.1.10 called +1 (555) 123-4567 yesterday"),
    (200003, "mirror https://a.b/c linked from bob.smith+x@mail.co today"),
    (200004, "no identifiers here just ordinary words"),
)


def _pii_values_sql() -> str:
    rows = ", ".join(
        "({}, '{}')".format(i, t.replace("'", "''")) for i, t in _PII_EXTRA
    )
    return f"(VALUES {rows}) AS extra(doc_id, text)"


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
