"""Q84-Q86: heuristic corpus-quality operators (north-star pillar —
the classic web-crawl cleaning rules that run BEFORE the model-based
gates in queries/training.py).

- q84: C4 line/page filtering (Raffel et al. 2020 §2.2) — terminal
  punctuation, min words per line, javascript lines, lorem-ipsum and
  curly-brace pages, min surviving sentences; reassembled kept text
  md5-pinned per document.
- q85: payment-card (PAN) detection with Luhn mod-10 VALIDATION
  (ISO/IEC 7812) — the PII class a bare regex scrub cannot decide;
  reports validated vs lookalike digit runs per document.
- q86: Flesch reading-ease (Flesch 1948) as an exact-integer
  milli-score with per-(source, band) rollups — the readability
  stratification a curriculum or data-mixing stage keys on.

All three are in-row Column expressions (functions/cleaning.py,
functions/text_analysis.py) with DuckDB twins generated from the SAME
constants; the synthetic corpus is single-line, punctuation-free
prose, so each gate is additionally exercised by deterministic planted
rows with NEGATIVE doc_ids (the q29/q63/q75 device — generated ids are
non-negative, canary-pinned by
tests/test_training.py::test_q75_planted_ids_cannot_collide).

Beyond the reference's own surface (it stores cleaned articles but has
no crawl-grade page filter; nearest shapes: the validity gates in
recap-worker/recap-worker/src/pipeline/preprocess.rs:406-457 and the
quality scoring in news-creator's prep path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alt_spark.catalog import load_table
from alt_spark.functions.cleaning import c4_page_stats, ddb_c4_page_stats
from alt_spark.functions.text_analysis import (
    ddb_flesch_milli,
    ddb_luhn_ok,
    ddb_pan_candidates,
    flesch_milli,
    luhn_ok,
    pan_candidates,
)
from alt_spark.queries import query
from alt_spark.queries.planted import values_sql as _values_sql


# ---------------------------------------------------------------------------
# Planted pages exercising each C4 gate (negative ids; see module
# docstring). Multi-line pages — the natural corpus is single-line.
_GOOD_LINES = (
    "This page has five good words today.",
    "Every line here carries enough words to pass.",
    "The filter keeps lines that end with punctuation.",
    "A fourth sentence keeps the page comfortably alive.",
)
_C4_EXTRA: tuple[tuple[int, str], ...] = (
    # all gates pass: 4 good lines, 4 sentences
    (-31, "\n".join(_GOOD_LINES)),
    # line gates: a short line, a no-terminal line, a javascript line —
    # all dropped; the 3 good lines keep the page
    (
        -32,
        "\n".join(
            [
                *_GOOD_LINES[:3],
                "Too short.",
                "no terminal punctuation on this line at all",
                "Please enable JavaScript to continue viewing this.",
            ]
        ),
    ),
    # page gate: lorem ipsum drops the whole page despite good lines
    (
        -33,
        "Lorem ipsum dolor sit amet consectetur adipiscing elit today.\n"
        + "\n".join(_GOOD_LINES[:2]),
    ),
    # page gate: a curly brace (code page) drops the whole page
    (-34, "function f() { return 1; }\n" + "\n".join(_GOOD_LINES[:3])),
    # page gate: only two surviving sentences -> under the 3-sentence floor
    (-35, "\n".join(_GOOD_LINES[:2])),
    # degenerate: empty page
    (-36, ""),
    # CRLF page (the web-crawl norm): must behave exactly like -31 —
    # pins the \r?\n split against the Java-$-before-\r vs RE2 drift
    (-37, "\r\n".join(_GOOD_LINES)),
)


def _q84_oracle() -> str:
    s = ddb_c4_page_stats("text")
    return f"""
WITH unioned AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id, text FROM {_values_sql(_C4_EXTRA, "doc_id, text")}
)
SELECT doc_id,
       {s["n_lines"]} AS n_lines,
       {s["n_kept"]} AS n_kept,
       {s["page_kept"]} AS page_kept,
       md5({s["clean_text"]}) AS clean_md5
FROM unioned
ORDER BY doc_id
"""


@query("q84_c4_filters", oracle=_q84_oracle())
def q84(spark: SparkSession, sf: str) -> DataFrame:
    """C4 page cleaning (Raffel et al. 2020 §2.2): per-line gates
    (terminal punctuation, >= 5 words, no javascript) and page gates
    (no lorem ipsum, no curly brace, >= 3 surviving sentences), with
    the kept text reassembled in order and md5-pinned — the oracle
    verifies the exact surviving byte stream per page, not just counts.

    Plan: one in-row struct per document (split / filter / array_join
    over the line array — functions/cleaning.c4_page_stats); no
    explode, no join, no aggregate. Cleaning 100 TB is scan-speed; the
    only exchange is the presentation sort.
    """
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    extra = spark.createDataFrame(list(_C4_EXTRA), ["doc_id", "text"])
    st = c4_page_stats(F.col("text"))
    return (
        docs.unionByName(extra)
        .select(
            "doc_id",
            st["n_lines"].alias("n_lines"),
            st["n_kept"].alias("n_kept"),
            st["page_kept"].alias("page_kept"),
            F.md5(st["clean_text"]).alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Planted card-shaped rows (negative ids). 4111111111111111 /
# 5555555555554444 / 378282246310005 are the canonical public network
# TEST numbers (not real accounts); ...1112 is a Luhn-failing
# lookalike; the 10-digit phone must NOT become a candidate.
_PAN_EXTRA: tuple[tuple[int, str], ...] = (
    (-41, "pay with 4111111111111111 today please."),
    (-42, "card 4111-1111-1111-1111 on file now."),
    (-43, "number 4111111111111112 fails the check."),
    (-44, "call 5551234567 for details soon."),
    (-45, "amex 378282246310005 works too."),
    (-46, "two cards 4111111111111111 and 5555555555554444 appear here."),
    # ADJACENT cards separated only by a space: the run is 32 digits,
    # so the space-split branch must surface each card individually
    # (the greedy-merge false negative, pinned by review finding 2)
    (-47, "adjacent 4111111111111111 5555555555554444 cards."),
    # internally-spaced single card: the whole 16-digit run is ONE
    # candidate, not four 4-digit fragments
    (-48, "spaced 4111 1111 1111 1111 card."),
)


def _q85_oracle() -> str:
    cands = ddb_pan_candidates("text")
    luhn = ddb_luhn_ok("c")
    return f"""
WITH unioned AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id, text FROM {_values_sql(_PAN_EXTRA, "doc_id, text")}
), scanned AS (
  SELECT doc_id,
         {cands} AS cands,
         list_filter({cands}, c -> {luhn}) AS valid
  FROM unioned
)
SELECT doc_id,
       CAST(len(cands) AS BIGINT) AS n_candidates,
       CAST(len(valid) AS BIGINT) AS n_valid,
       coalesce(array_to_string(list_transform(valid, c -> right(c, 4)), '|'), '')
         AS valid_last4
FROM scanned
WHERE len(cands) > 0
ORDER BY doc_id
"""


@query("q85_pan_luhn_audit", oracle=_q85_oracle())
def q85(spark: SparkSession, sf: str) -> DataFrame:
    """Payment-card audit with Luhn validation: PAN-shaped digit runs
    (13-19 digits, single space/dash separators) are extracted in-row
    and each candidate is CHECKSUM-validated (Luhn mod-10, ISO/IEC
    7812) — a compliance surface the regex-only scrub (q63) cannot
    express: ...1111 validates, the ...1112 lookalike does not, and a
    10-digit phone number is never a candidate. Reports per document
    the candidate count, validated count, and the last-4 digits of
    each validated PAN in match order.

    Plan: one codegen regex extract plus a bounded transform/aggregate
    per candidate (candidates are rare by construction) — in-row,
    no UDF, no join; the only exchange is the presentation sort.
    """
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    extra = spark.createDataFrame(list(_PAN_EXTRA), ["doc_id", "text"])
    cands = pan_candidates(F.col("text"))
    valid = F.filter(cands, luhn_ok)
    return (
        docs.unionByName(extra)
        .select(
            "doc_id",
            F.size(cands).cast("long").alias("n_candidates"),
            F.size(valid).cast("long").alias("n_valid"),
            F.array_join(
                F.transform(valid, lambda c: F.right(c, F.lit(4))), "|"
            ).alias("valid_last4"),
        )
        .filter(F.col("n_candidates") > 0)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Planted readability extremes (negative ids): monosyllabic short
# sentences score near the top of the scale; an unpunctuated run of
# long latinate words scores deeply negative. Both carry source
# 'planted' so the rollup keys stay disjoint from generated sources.
_FLESCH_EXTRA: tuple[tuple[int, str], ...] = (
    (-51, "Go. Run. Sit. Eat. Nap."),
    (-52, "He is my pal. We sit up now. Go on in, do it."),
    (
        -53,
        "Extraordinarily sophisticated considerations necessitate "
        "unambiguously comprehensive organizational accountability",
    ),
)

# Band floors in milli-points (classic Flesch bands, coarsened to 4).
_BANDS: tuple[tuple[int, str], ...] = (
    (90000, "very_easy"),
    (60000, "plain"),
    (30000, "difficult"),
)


def _band_case(score: str) -> str:
    arms = " ".join(
        f"WHEN {score} >= {floor} THEN '{name}'" for floor, name in _BANDS
    )
    return f"CASE {arms} ELSE 'dense' END"


def _q86_oracle() -> str:
    fl = ddb_flesch_milli()
    return f"""
WITH unioned AS (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT doc_id, 'planted' AS source, text
  FROM {_values_sql(_FLESCH_EXTRA, "doc_id, text")}
), scored AS (
  SELECT source,
         {fl["n_words"]} AS n_words,
         {fl["score_milli"]} AS score_milli
  FROM unioned
)
SELECT source,
       {_band_case("score_milli")} AS band,
       count(*) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS word_sum,
       CAST(min(score_milli) AS BIGINT) AS min_score,
       CAST(max(score_milli) AS BIGINT) AS max_score
FROM scored
GROUP BY source, band
ORDER BY source, band
"""


@query("q86_readability_bands", oracle=_q86_oracle())
def q86(spark: SparkSession, sf: str) -> DataFrame:
    """Readability stratification: exact-integer Flesch reading-ease
    (milli-points — 206.835 becomes 206835, ratios via identical floor
    division in both engines) banded into four classes per source —
    the strata a curriculum schedule or readability-balanced mix draws
    from. min/max score per band pin the banding boundaries exactly;
    planted extremes exercise the top band and the deep-negative tail.

    Plan: three codegen regex counts and integer arithmetic in-row,
    then ONE hash aggregate on (source, band) — bounded output
    (|sources| x 4), scan-proportional at 100 TB.
    """
    docs = load_table(spark, sf, "documents").select("doc_id", "source", "text")
    extra = spark.createDataFrame(
        [(i, "planted", t) for i, t in _FLESCH_EXTRA],
        ["doc_id", "source", "text"],
    )
    fl = flesch_milli(F.col("text"))
    score = F.col("score_milli")
    band = F.lit("dense")
    for floor, name in reversed(_BANDS):
        band = F.when(score >= floor, F.lit(name)).otherwise(band)
    return (
        docs.unionByName(extra)
        .select(
            "source",
            fl["n_words"].alias("n_words"),
            fl["score_milli"].alias("score_milli"),
        )
        .groupBy("source", band.alias("band"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("word_sum"),
            F.min("score_milli").alias("min_score"),
            F.max("score_milli").alias("max_score"),
        )
        .orderBy("source", "band")
    )
