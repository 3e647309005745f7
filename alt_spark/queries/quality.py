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
    DDB_TOKENS as _DDB_TOKENS,
)
from alt_spark.functions.text_analysis import (
    GOPHER_WS as _GOPHER_WS,
)
from alt_spark.functions.text_analysis import (
    ddb_flesch_milli,
    ddb_gopher_signals,
    ddb_luhn_ok,
    ddb_pan_candidates,
    flesch_milli,
    gopher_signals,
    luhn_ok,
    pan_candidates,
)
from alt_spark.queries import query
from alt_spark.operators.dedup import tokens_col as _tokens_col
from alt_spark.queries.planted import values_sql as _values_sql
from alt_spark.queries.training import _PREP_MIN_CHARS, _PREP_MIN_TOKS


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


# ---------------------------------------------------------------------------
# q92: gate-attrition funnel. Planted pages (negative ids, source
# 'planted') give the chain full discrimination — the natural corpus
# is single-line punctuation-free prose, so it dies at the C4 stage
# and (mostly) the Gopher stop-hits gate; each planted page fails
# exactly one labelled stage of the chain.
_FUNNEL_LINES = (
    "The pipeline keeps documents that read well and end cleanly.",
    "Each line here carries enough words to pass the filter.",
    "Good corpora have sentences that finish with punctuation marks.",
    "The gates below measure words and symbols with care.",
    "Writers of clean prose pass every heuristic gate easily.",
    "That makes this page a keeper for the training mix.",
    "Another sentence arrives to push the word count higher.",
    "The final line closes the page with a tidy period.",
)
_FUNNEL_EXTRA: tuple[tuple[int, str], ...] = (
    # passes every gate
    (-71, "\n".join(_FUNNEL_LINES)),
    # fails ONLY the PAN gate (Luhn-valid card in otherwise clean prose)
    (
        -72,
        "\n".join(_FUNNEL_LINES)
        + "\nPlease pay with card 4111111111111111 before the deadline.",
    ),
    # fails ONLY the Gopher gate (every line ellipsis-ended; C4 keeps
    # the lines — '...' IS terminal punctuation — but the ellipsis and
    # symbol caps blow)
    (
        -73,
        "\n".join(
            f"The story number {i} continues with more twists today..."
            for i in range(10)
        ),
    ),
    # fails ONLY the C4 gate (healthy Gopher prose, but one line with
    # no terminal punctuation -> zero kept lines)
    (-74, " ".join(["the quick brown fox jumps over that lazy dog with ease"] * 6)),
    # fails the validity gate (and, standalone, gopher + C4 too)
    (-75, "Short note only."),
)


def _q92_oracle() -> str:
    gop = ddb_gopher_signals()["keep_flag"]
    c4 = ddb_c4_page_stats("text")["page_kept"]
    cands = ddb_pan_candidates("text")
    luhn = ddb_luhn_ok("c")
    return f"""
WITH corpus AS (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT doc_id, 'planted' AS source, text
  FROM {_values_sql(_FUNNEL_EXTRA, "doc_id, text")}
), prepped AS (
  SELECT source, text,
         length(text) AS n_chars,
         list_filter(string_split_regex(text, '{_GOPHER_WS}+'), x -> x <> '') AS words,
         {_DDB_TOKENS} AS toks
  FROM corpus
), flags AS (
  SELECT source,
         CAST(len(toks) AS BIGINT) AS n_tok,
         CASE WHEN n_chars >= {_PREP_MIN_CHARS}
               AND len(toks) >= {_PREP_MIN_TOKS} THEN 1 ELSE 0 END AS f_valid,
         {gop} AS f_gopher,
         {c4} AS f_c4,
         CASE WHEN len(list_filter({cands}, c -> {luhn})) = 0
              THEN 1 ELSE 0 END AS f_panfree
  FROM prepped
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS tok_sum,
       CAST(sum(f_valid) AS BIGINT) AS v_docs,
       CAST(sum(f_valid * n_tok) AS BIGINT) AS v_toks,
       CAST(sum(f_valid * f_gopher) AS BIGINT) AS vg_docs,
       CAST(sum(f_valid * f_gopher * n_tok) AS BIGINT) AS vg_toks,
       CAST(sum(f_valid * f_gopher * f_c4) AS BIGINT) AS vgc_docs,
       CAST(sum(f_valid * f_gopher * f_c4 * n_tok) AS BIGINT) AS vgc_toks,
       CAST(sum(f_valid * f_gopher * f_c4 * f_panfree) AS BIGINT) AS kept_docs,
       CAST(sum(f_valid * f_gopher * f_c4 * f_panfree * n_tok) AS BIGINT)
         AS kept_toks,
       CAST(sum(f_gopher) AS BIGINT) AS gopher_pass,
       CAST(sum(f_c4) AS BIGINT) AS c4_pass,
       CAST(sum(f_panfree) AS BIGINT) AS pan_free
FROM flags
GROUP BY source
ORDER BY source
"""


@query("q92_gate_funnel", oracle=_q92_oracle())
def q92(spark: SparkSession, sf: str) -> DataFrame:
    """Gate-attrition funnel: the per-source survival table through the
    ordered heuristic gate chain — validity (length floors) → Gopher
    quality (Rae et al. 2021) → C4 page cleaning (Raffel et al. 2020)
    → PAN/Luhn compliance — reporting BOTH document and token counts
    after each stage plus each content gate's standalone pass count.
    This is the attrition report a corpus release publishes next to
    its filtering rules (the Dolma/RefinedWeb "docs removed per rule"
    table): it decides which rule to retune when a source collapses,
    and the token columns price each rule in training-budget terms.

    Plan: every flag is an in-row Column expression over ONE scan
    (words/toks named once — the layering doctrine), composed by
    integer multiplication into cumulative stage flags; one bounded
    hash aggregate on source. Funnel-auditing 100 TB costs exactly one
    corpus read. Complements q66 (which EXECUTES a pipeline and
    reports only final survivors) — this measures per-stage attrition
    without materializing any stage.
    """
    docs = load_table(spark, sf, "documents").select("doc_id", "source", "text")
    extra = spark.createDataFrame(
        [(i, "planted", t) for i, t in _FUNNEL_EXTRA],
        "doc_id long, source string, text string",
    )
    prepped = (
        docs.unionByName(extra)
        .select(
            "source",
            "text",
            F.length("text").alias("n_chars"),
            F.filter(
                F.split("text", _GOPHER_WS + "+"), lambda x: x != ""
            ).alias("words"),
            _tokens_col().alias("toks"),
        )
    )
    sig = gopher_signals(F.col("text"), F.col("words"), F.col("toks"))
    c4 = c4_page_stats(F.col("text"))
    n_valid_pans = F.size(F.filter(pan_candidates(F.col("text")), luhn_ok))
    flags = prepped.select(
        "source",
        F.size("toks").cast("long").alias("n_tok"),
        (
            (F.col("n_chars") >= _PREP_MIN_CHARS)
            & (F.size("toks") >= _PREP_MIN_TOKS)
        )
        .cast("long")
        .alias("f_valid"),
        sig["keep_flag"].alias("f_gopher"),
        c4["page_kept"].alias("f_c4"),
        (n_valid_pans == 0).cast("long").alias("f_panfree"),
    )
    v, g, c, p = (F.col(x) for x in ("f_valid", "f_gopher", "f_c4", "f_panfree"))
    tok = F.col("n_tok")
    return (
        flags.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(tok).alias("tok_sum"),
            F.sum(v).alias("v_docs"),
            F.sum(v * tok).alias("v_toks"),
            F.sum(v * g).alias("vg_docs"),
            F.sum(v * g * tok).alias("vg_toks"),
            F.sum(v * g * c).alias("vgc_docs"),
            F.sum(v * g * c * tok).alias("vgc_toks"),
            F.sum(v * g * c * p).alias("kept_docs"),
            F.sum(v * g * c * p * tok).alias("kept_toks"),
            F.sum(g).alias("gopher_pass"),
            F.sum(c).alias("c4_pass"),
            F.sum(p).alias("pan_free"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q93: intra-document sentence dedup. Sentences are maximal
# terminal-punctuated runs ('[^.!?]+[.!?]+' — Java-regex/RE2-portable,
# greedy left-to-right, so both engines segment identically); an
# unterminated tail is dropped by construction (the C4 convention).
# The natural corpus carries no punctuation, so the per-document
# paragraph is CONSTRUCTED from the document's own words (the q50/q51
# device) with id-dependent duplicate sentences; planted rows pin the
# degenerate shapes.
_SENT_PATTERN = "[^.!?]+[.!?]+"
_SENT_EXTRA: tuple[tuple[int, str], ...] = (
    # heavy duplication: 3 copies of one sentence around two others
    (
        -81,
        "We go now. We stay here. We go now! We go now. The end is near.",
    ),
    # no duplicates at all
    (-82, "First thought. Second thought! Third thought?"),
    # no terminal punctuation anywhere -> zero sentences
    (-83, "an unterminated run of words with no sentence boundary"),
    # empty page
    (-84, ""),
    # duplicate differs only by terminator -> NOT a duplicate ('We go.'
    # vs 'We go!' are distinct surviving sentences)
    (-85, "We go. We go! We go."),
)


def _q93_oracle() -> str:
    # coalesce on every span: DuckDB array_to_string([]) is NULL (the
    # ddb_c4_page_stats lesson) and a sub-15-word document would
    # otherwise NULL its whole page, where Spark's concat_ws is ''.
    def span(lo: int, hi: int) -> str:
        return (
            "coalesce(array_to_string("
            f"list_slice(string_split(text, ' '), {lo}, {hi}), ' '), '')"
        )

    para = (
        f"{span(1, 5)} || '. ' || {span(6, 10)} || '! ' ||"
        f" CASE WHEN doc_id % 2 = 0 THEN {span(1, 5)} || '. ' ELSE '' END ||"
        f" {span(11, 15)} || '? ' ||"
        f" CASE WHEN doc_id % 3 = 0 THEN {span(6, 10)} || '! ' ELSE '' END ||"
        " 'a trailing tail with no terminal'"
    )
    return f"""
WITH corpus AS (
  SELECT doc_id, {para} AS page FROM documents
  UNION ALL
  SELECT doc_id, text AS page FROM {_values_sql(_SENT_EXTRA, "doc_id, text")}
), segmented AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(page, '{_SENT_PATTERN}'),
                        s -> trim(s)) AS sents
  FROM corpus
), deduped AS (
  SELECT doc_id, sents,
         list_filter(sents, (x, i) -> list_position(sents, x) = i) AS uniq
  FROM segmented
)
SELECT doc_id,
       CAST(len(sents) AS BIGINT) AS n_sent,
       CAST(len(uniq) AS BIGINT) AS n_uniq,
       CAST((10000 * (len(sents) - len(uniq)))
            // greatest(len(sents), 1) AS BIGINT) AS saved_permyriad,
       md5(coalesce(array_to_string(uniq, '|'), '')) AS dedup_md5
FROM deduped
ORDER BY doc_id
"""


@query("q93_sentence_dedup", oracle=_q93_oracle())
def q93(spark: SparkSession, sf: str) -> DataFrame:
    """Intra-document sentence deduplication (the Dolma/CCNet
    paragraph-dedup rule at sentence grain): segment each page into
    terminal-punctuated sentences, keep the FIRST occurrence of every
    repeated sentence in order, and report per document the sentence
    count, surviving count, removal rate (exact permyriad), and an md5
    pinning the exact surviving sequence — order and content, not just
    counts. Boilerplate repetition inside a page (cookie banners,
    navigation crumbs repeated between sections) is the second-most
    common dedup grain after whole-document hashing.

    Plan: segmentation is one codegen ``regexp_extract_all``; the
    first-occurrence keep is an in-row index-aware ``filter`` lambda
    (quadratic only in the per-page sentence count, never across
    rows); no explode, no join, no aggregate — scan-speed at 100 TB
    with the presentation sort as the only exchange.
    """
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    extra = spark.createDataFrame(list(_SENT_EXTRA), "doc_id long, text string")
    w = F.split("text", " ")

    def _span(lo: int, hi: int):
        return F.concat_ws(" ", F.slice(w, lo, hi - lo + 1))

    page = F.concat(
        _span(1, 5),
        F.lit(". "),
        _span(6, 10),
        F.lit("! "),
        F.when(F.col("doc_id") % 2 == 0, F.concat(_span(1, 5), F.lit(". ")))
        .otherwise(F.lit("")),
        _span(11, 15),
        F.lit("? "),
        F.when(F.col("doc_id") % 3 == 0, F.concat(_span(6, 10), F.lit("! ")))
        .otherwise(F.lit("")),
        F.lit("a trailing tail with no terminal"),
    )
    corpus = docs.select("doc_id", page.alias("page")).unionByName(
        extra.select("doc_id", F.col("text").alias("page"))
    )
    segmented = corpus.select(
        "doc_id",
        F.transform(
            F.regexp_extract_all("page", F.lit(_SENT_PATTERN), F.lit(0)),
            lambda s: F.trim(s),
        ).alias("sents"),
    )
    deduped = segmented.select(
        "doc_id",
        "sents",
        F.expr(
            "filter(sents, (x, i) -> array_position(sents, x) = i + 1)"
        ).alias("uniq"),
    )
    n_sent = F.size("sents").cast("long")
    n_uniq = F.size("uniq").cast("long")
    return deduped.select(
        "doc_id",
        n_sent.alias("n_sent"),
        n_uniq.alias("n_uniq"),
        F.expr(
            "(10000 * (size(sents) - size(uniq)))"
            " div greatest(size(sents), 1)"
        )
        .cast("long")
        .alias("saved_permyriad"),
        F.md5(F.array_join("uniq", "|")).alias("dedup_md5"),
    ).orderBy("doc_id")
