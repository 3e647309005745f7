"""Text-analysis columns for the LLM-data pipeline (north star; SURVEY
§2 I3/I6/I7/I13 analogs).

Reference shapes: language gates with min-chars/min-confidence
(recap-worker/recap-worker/src/language_detection.rs:5-65), validity
filters (preprocess.rs:406-457), token stats (preprocess.rs:286-344).
Everything here is a Column expression over built-ins — the hot path of
a 100 TB text scan must stay inside whole-stage codegen, so there is no
Python in any of these.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "whitespace_token_count",
    "word_token_count",
    "avg_token_len",
    "stopword_ratio",
    "alpha_ratio",
    "quality_score",
    "lang_id",
    "script_char_count",
    "winnowing_fingerprints",
    "ngram_strings",
    "repetition_metrics",
    "pan_candidates",
    "luhn_ok",
    "ddb_pan_candidates",
    "ddb_luhn_ok",
    "flesch_milli",
    "ddb_flesch_milli",
]

# Marker/script tables are DATA (functions/lang_data.py): adding a
# language is an edit there, not here. _LANG_MARKERS kept as the
# established alias for the token-vote table.
from alt_spark.functions.lang_data import (  # noqa: E402
    MARKERS as _LANG_MARKERS,
    SCRIPTS as _LANG_SCRIPTS,
    script_char_class,
)


def _tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"\W+"), lambda x: x != "")


# DuckDB twin of the engine tokenizer contract (lower + \W+ split,
# empties dropped; Spark side: operators/dedup.tokens_col and _tokens
# above). Oracle modules import THIS constant rather than re-declaring
# the string, so the cross-engine pair has exactly one definition.
DDB_TOKENS = "list_filter(string_split_regex(lower(text), '\\W+'), x -> x <> '')"


def whitespace_token_count(text: Column) -> Column:
    """Token count by whitespace runs (the cheap pre-tokenizer count)."""
    return F.size(F.filter(F.split(text, r"\s+"), lambda x: x != ""))


def word_token_count(text: Column) -> Column:
    """Token count under the engine tokenizer contract (\\W+ split) — a
    BPE-ish upper bound since punctuation splits words apart."""
    return F.size(_tokens(text))


# GPT-2-style pre-tokenizer (public: openai/gpt-2 encoder.py pattern),
# restricted to lookahead-free branches so the IDENTICAL pattern runs in
# Java regex (Spark) and RE2 (DuckDB — no lookahead support): common
# English contraction suffixes, space-prefixed letter runs, digit runs,
# punctuation runs, then whitespace runs. Whitespace is an EXPLICIT
# class, not \s — Java's \s includes vertical tab, RE2's does not, so
# \s would silently diverge on \x0B. Leftmost-first alternation
# semantics match across both engines. This is the count a BPE encoder
# sees BEFORE merges — the standard cheap proxy for "model tokens" in
# corpus budgeting (real BPE merges only split these pieces further, so
# it lower-bounds nothing and over-counts nothing at the word level).
_BPE_WS = r" \t\r\n\f\x0B"
BPE_PRETOKEN_PATTERN = (
    r"'[sdmt]|'ll|'re|'ve| ?\p{L}+| ?\p{N}+"
    rf"| ?[^{_BPE_WS}\p{{L}}\p{{N}}]+|[{_BPE_WS}]+"
)
_BPE_NON_WS = rf"[^{_BPE_WS}]"


def bpe_pretoken_count(text: Column) -> Column:
    """Count of GPT-2-style pre-tokens, excluding pure-whitespace pieces
    (whitespace branches keep the scan single-pass but don't count)."""
    non_ws = F.filter(
        F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_PATTERN), 0),
        lambda t: t.rlike(_BPE_NON_WS),
    )
    return F.size(non_ws)


def ddb_bpe_pretoken_count(text_expr: str) -> str:
    """DuckDB twin of :func:`bpe_pretoken_count`, generated from the SAME
    pattern constant so the two engines cannot drift (single quotes
    doubled for the SQL literal; backslashes pass through untouched —
    DuckDB single-quoted strings do no escape processing)."""
    pat = BPE_PRETOKEN_PATTERN.replace("'", "''")
    return (
        f"len(list_filter(regexp_extract_all({text_expr}, '{pat}'), "
        f"x -> regexp_matches(x, '{_BPE_NON_WS}')))"
    )


def avg_token_len(text: Column) -> Column:
    toks = _tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are language stopwords (quality signal:
    natural prose has a stable stopword rate; keyword spam does not).
    A language with no marker table (unsegmented scripts) scores 0.0
    rather than failing at plan-build time."""
    marker_words = _LANG_MARKERS.get(lang, ())
    if not marker_words:
        return F.lit(0.0)
    markers = F.array(*[F.lit(m) for m in marker_words])
    toks = _tokens(text)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1))


def alpha_ratio(text: Column) -> Column:
    """Fraction of characters that are alphanumeric or spaces."""
    clean = F.regexp_replace(text, r"[^A-Za-z0-9 ]", "")
    return F.length(clean).cast("double") / F.greatest(F.length(text), F.lit(1))


def quality_score(text: Column, lang: str = "en") -> Column:
    """Composite quality in [0,1]: length, token-shape, stopword and
    alphanumeric signals, weighted like the reference's selection score
    (select/scoring.rs:8-42 composes weighted bounded components)."""
    len_component = F.least(F.length(text).cast("double") / 500.0, F.lit(1.0))
    tok_component = F.least(word_token_count(text).cast("double") / 100.0, F.lit(1.0))
    stop_component = F.least(stopword_ratio(text, lang) * 4.0, F.lit(1.0))
    alpha_component = alpha_ratio(text)
    return (
        0.3 * len_component + 0.2 * tok_component + 0.2 * stop_component + 0.3 * alpha_component
    )


def script_char_count(text: Column, lang: str) -> Column:
    """Characters of `lang`'s script ranges in the row (SCRIPTS table).

    regexp_count scans without building the replaced string — ~1.4×
    cheaper than the length(regexp_replace) form at sf0.1 and
    allocation-free, which matters when every text row pays it.
    """
    cls = script_char_class(lang)
    return F.regexp_count(text, F.lit(cls))


def lang_id(text: Column, min_tokens: int = 3) -> Column:
    """Language ID with an abstain gate (language_detection.rs:5-65
    min-chars/min-confidence analog): null when too short or no votes.

    Two vote sources, combined in one argmax (a later language wins
    only on strictly more votes): token-level stopword markers for
    space-delimited languages, and character-level script votes for
    CJK — the \\W+ tokenizer produces NO tokens for unsegmented text,
    so Japanese is recognized by its kana characters (each kana char =
    one vote; han votes zh only when kana is absent, per the SCRIPTS
    `unless` precedence). The abstain gate accepts either enough tokens
    OR enough script characters.

    Perf shape (measured at sf0.1): every vote is a single-pass
    regexp_count — a token equals a marker iff ``\\b(marker)\\b``
    matches the lowered text, since \\W+ token boundaries ARE \\b word
    boundaries — and the argmax is array_position(votes,
    array_max(votes)), so each vote expression appears a constant
    number of times in the plan. The earlier nested when-chain argmax
    re-embedded every prior vote's expression tree in each comparison
    (tokenizer re-evaluated combinatorially after projection collapse):
    ~11 s at sf0.1 vs ~1 s for this form. First-position max ==
    sequential later-wins-only-on-strictly-more semantics.
    """
    low = F.lower(text)

    def _marker_votes(lang: str) -> Column:
        # re.escape is a no-op for the ^[a-z0-9_]+$ alphabet lang_data
        # asserts at import; it's here so a future non-word marker can
        # never silently become regex syntax (ADVICE r4).
        pat = (
            r"\b(?:"
            + "|".join(re.escape(w) for w in _LANG_MARKERS[lang])
            + r")\b"
        )
        return F.regexp_count(low, F.lit(pat))

    raw_script = {lang: script_char_count(text, lang) for lang in _LANG_SCRIPTS}

    def _script_votes(lang: str) -> Column:
        v = raw_script[lang]
        for other in _LANG_SCRIPTS[lang]["unless"]:
            v = F.when(raw_script[other] == 0, v).otherwise(F.lit(0))
        return v

    names = [*_LANG_MARKERS, *_LANG_SCRIPTS]
    votes = F.array(
        *[_marker_votes(lang) for lang in _LANG_MARKERS],
        *[_script_votes(lang) for lang in _LANG_SCRIPTS],
    )
    best_votes = F.array_max(votes)
    best = F.element_at(
        F.array(*[F.lit(n) for n in names]),
        F.array_position(votes, best_votes).cast("int"),
    )
    n_tok = F.regexp_count(text, F.lit(r"\w+"))
    script_total = None
    for lang in _LANG_SCRIPTS:
        script_total = (
            raw_script[lang]
            if script_total is None
            else script_total + raw_script[lang]
        )
    enough = (n_tok >= min_tokens) | (script_total >= min_tokens)
    return F.when(enough & (best_votes > 0), best).otherwise(
        F.lit(None).cast("string")
    )


def ngram_strings(tokens: Column, n: int) -> Column:
    """Space-joined word n-grams of a token array (NON-distinct — the
    repetition metrics need every occurrence). Rows with fewer than n
    tokens yield an empty array (sequence(1, <=0) would count down)."""
    return F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(tokens, (i + j).cast("int")) for j in range(n)],
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_metrics(tokens: Column, n: int) -> Column:
    """Gopher-style repetition signals for word n-grams, computed fully
    in-row: ``struct(top_cov, dup_chars)`` where

    - ``top_cov``  = max over distinct n-grams of count * length(gram)
      (characters covered by the most repetitive n-gram — the
      "fraction of characters in the most common n-gram" numerator of
      Rae et al. 2021 Table A1, with the count*len max making tie
      handling deterministic without an ordering rule);
    - ``dup_chars`` = sum over n-grams occurring >1 time of
      count * length(gram) (the duplicate-n-gram numerator; overlaps
      counted per occurrence, the standard approximation).

    Shape: sort the gram array in-row, then a single ``aggregate`` pass
    counts run lengths — per-doc O(G log G) with zero exchanges, so the
    filter runs at scan speed on 100 TB (no explode + groupBy(doc,
    gram) shuffle, which at corpus scale would shuffle ~the token
    count). Within a run of equal grams the running count*len is
    monotone, so updating the max at every element equals closing runs.
    """
    grams = F.array_sort(ngram_strings(tokens, n))
    zero = F.lit(0).cast("long")
    init = F.struct(
        F.lit("").alias("prev"),
        zero.alias("run"),
        zero.alias("top"),
        zero.alias("dup"),
    )

    def step(acc: Column, g: Column) -> Column:
        glen = F.length(g).cast("long")
        run = F.when(g == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        dup_add = (
            F.when(run == 2, 2 * glen)
            .when(run > 2, glen)
            .otherwise(F.lit(0).cast("long"))
        )
        return F.struct(
            g.alias("prev"),
            run.alias("run"),
            F.greatest(acc["top"], run * glen).alias("top"),
            (acc["dup"] + dup_add).alias("dup"),
        )

    return F.aggregate(
        grams,
        init,
        step,
        lambda acc: F.struct(
            acc["top"].alias("top_cov"), acc["dup"].alias("dup_chars")
        ),
    )


def winnowing_fingerprints(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
    portable: bool = False,
    portable_hex: bool = False,
):
    """Winnowing document fingerprints (Schleimer et al. 2003): hash all
    k-gram character shingles, keep the min hash of every sliding window.

    Guarantees any shared substring of length >= k+window-1 yields at
    least one shared fingerprint — the rolling-hash dedup/provenance
    primitive. Returns (id, fingerprints sorted distinct — array<long>,
    or array<string> of fixed-width hex under ``portable_hex``, see
    below); rows too short for one full window get an empty set.

    Fully in-row: the gram-hash array and the sliding minima are one
    narrow projection — no explode, no shuffle, no window exec. The
    naive pure-expression form recomputes the gram array per window
    position after Catalyst's projection collapse (~100× blowup); the
    fix is binding the gram array ONCE as a higher-order-function
    lambda variable — ``transform(array(grams), g -> ...)`` — which
    Catalyst cannot inline, so every window position reads the same
    materialized array. Each window min is a ``least`` over `window`
    element_at reads (no per-position slice allocation): measured 1.6×
    faster than the previous explode + rowsBetween-window form at sf0.1,
    and the operator now composes into any plan without adding a
    shuffle (at 100 TB this is a map-only stage).

    ``portable=True`` switches the gram hash from xxhash64 (production
    default) to the md5-based portable_hash60 so the whole pipeline has
    an exact DuckDB twin (see functions/hashing.py — the 60-bit single-
    conv form, since the sliding min only needs a consistent total
    order and the second hex parse was most of the portable-path cost);
    the winnowing guarantee is hash-agnostic.

    ``portable_hex=True`` (portable mode only) additionally skips the
    ``conv`` base-16 parse and keeps the fingerprint as the RAW
    15-hex-char md5 prefix: lexicographic order on fixed-width
    lowercase hex IS the numeric order of the 60-bit value (a
    bijection, so sliding-min, distinct-count and equality all agree
    with the long form — verified by a zero-mismatch per-doc
    distinct-count cross-check at sf0.1). Measured ~12% off the whole
    fingerprint pass (2.61 -> 2.29 s best-of-3 at sf0.1). Use it ONLY
    when the fingerprints stay in-row (q33's size() counting): a
    consumer that explodes and SHUFFLES them (q132's containment join)
    measured slightly WORSE with 15-byte string keys than 8-byte
    longs, so it keeps the numeric form.
    """
    if portable and portable_hex:
        def hash_fn(c):
            return F.substring(F.md5(c), 1, 15)

        empty_t = "array<string>"
    elif portable:
        from alt_spark.functions.hashing import portable_hash60

        hash_fn = portable_hash60
        empty_t = "array<bigint>"
    else:
        hash_fn = F.xxhash64
        empty_t = "array<bigint>"
    text = F.col(text_col)
    n = F.length(text)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: hash_fn(text.substr(i.cast("int"), F.lit(k))),
        ),
    ).otherwise(F.array().cast(empty_t))

    def _wmins(g: Column) -> Column:
        return F.when(
            F.size(g) >= window,
            F.array_sort(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size(g) - (window - 1)),
                        lambda j: F.least(
                            *[
                                F.element_at(g, (j + i).cast("int"))
                                for i in range(window)
                            ]
                        ),
                    )
                )
            ),
        ).otherwise(F.array().cast(empty_t))

    fingerprints = F.element_at(F.transform(F.array(grams), _wmins), 1)
    return df.select(
        F.col(id_col).alias("id"), fingerprints.alias("fingerprints")
    )


# ---------------------------------------------------------------- Gopher gates
# Rae et al. 2021 (Gopher) Table A1 document-quality rules, the subset
# that is exactly integer-expressible cross-engine. Thresholds in
# permyriad where fractional.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_CAPS = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len_permyriad": 30_000,   # mean word length >= 3 chars
    "max_mean_word_len_permyriad": 100_000,  # mean word length <= 10 chars
    "max_symbol_word_permyriad": 1_000,      # '#'/'...' per word <= 0.1
    "max_bullet_lines_permyriad": 9_000,     # <= 90% lines bullet-led
    "max_ellipsis_lines_permyriad": 3_000,   # <= 30% lines '...'-ended
    "min_alpha_word_permyriad": 8_000,       # >= 80% words with a letter
    "min_stop_hits": 2,                      # >= 2 distinct stopwords
}

# One source for the regex fragments both engines compile (Java + RE2
# common subset; no $ anchors — Java's $ matches before a final
# newline, RE2's does not, so line-end checks pair an explicit \n
# pattern with an ends_with on the last line; no \s — Java's includes
# \x0B, RE2's does not, so whitespace is the explicit class below).
GOPHER_WS = r"[ \t\n\f\r]"
_BULLET_MID = r"\n[ \t]*[-*•]"
_BULLET_HEAD = r"^[ \t]*[-*•]"
_ELLIPSIS_MID = r"\.\.\.\n"


def exact_idiv(a: Column, b: Column) -> Column:
    """Exact integer division on non-negative longs: subtract the
    remainder first, so the double division is of two exactly-
    representable operands with an exactly-integral quotient — IEEE
    correct rounding then returns the integer itself. Numerators in
    this module are 10000-ish scalings of per-document counts, bounded
    by ~10000 * 2^31 (JVM string length) << 2^53, so representability
    holds by construction; a naive floor(a / b) could round up across
    the integer boundary for quotients near an integer. The ONE
    integer-division idiom for the module (gopher_signals and
    flesch_milli both route here)."""
    return ((a - a % b) / b).cast("long")


def gopher_signals(text: Column, words: Column, toks: Column) -> Column:
    """Gopher-style per-document quality signals as a struct of exact
    integers (permyriads), plus the composed keep decision.

    ``words`` (whitespace tokens, empties dropped) and ``toks`` (the
    engine tokenizer contract) must be NAMED columns on the input frame
    — the layering doctrine: both are referenced several times here,
    and a named column is evaluated once per row while an inline
    expression would be re-evaluated per reference.

    Fields: ``n_words``, ``mean_word_len_permyriad``,
    ``alpha_word_permyriad``, ``bullet_lines_permyriad``,
    ``ellipsis_lines_permyriad``, ``symbol_word_permyriad``,
    ``stop_hits`` (distinct GOPHER_STOPWORDS present), ``keep_flag``.
    All integer arithmetic; the DuckDB twin (``ddb_gopher_signals``)
    is generated from the same constants, so every signal — not just
    the gate — is oracle-exact. In-row, zero exchanges: the filter
    runs at scan speed on 100 TB (same plan contract as
    repetition_metrics).
    """
    _div = exact_idiv
    long0 = F.lit(0).cast("long")
    n_words = F.size(words).cast("long")
    nw1 = F.greatest(n_words, F.lit(1).cast("long"))
    word_chars = F.length(F.regexp_replace(text, GOPHER_WS, "")).cast("long")
    mean_len = _div(F.lit(10000).cast("long") * word_chars, nw1)
    alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    ).cast("long")
    n_lines = F.size(F.split(text, "\n", -1)).cast("long")
    bullet_lines = (
        F.regexp_count(text, F.lit(_BULLET_MID)).cast("long")
        + F.when(text.rlike(_BULLET_HEAD), 1).otherwise(0).cast("long")
    )
    ellipsis_lines = (
        F.regexp_count(text, F.lit(_ELLIPSIS_MID)).cast("long")
        + F.when(text.endswith("..."), 1).otherwise(0).cast("long")
    )
    hash_count = (F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))).cast("long")
    ellipsis_count = F.regexp_count(text, F.lit(r"\.\.\.")).cast("long")
    stop_hits = sum(
        (F.array_contains(toks, w).cast("long") for w in GOPHER_STOPWORDS),
        long0,
    )
    sig = {
        "n_words": n_words,
        "mean_word_len_permyriad": mean_len,
        "alpha_word_permyriad": _div(F.lit(10000).cast("long") * alpha_words, nw1),
        "bullet_lines_permyriad": _div(F.lit(10000).cast("long") * bullet_lines, n_lines),
        "ellipsis_lines_permyriad": _div(F.lit(10000).cast("long") * ellipsis_lines, n_lines),
        "symbol_word_permyriad": _div(
            F.lit(10000).cast("long") * (hash_count + ellipsis_count), nw1
        ),
        "stop_hits": stop_hits,
    }
    c = GOPHER_CAPS
    keep = (
        (sig["n_words"] >= c["min_words"])
        & (sig["n_words"] <= c["max_words"])
        & (sig["mean_word_len_permyriad"] >= c["min_mean_word_len_permyriad"])
        & (sig["mean_word_len_permyriad"] <= c["max_mean_word_len_permyriad"])
        & (sig["symbol_word_permyriad"] <= c["max_symbol_word_permyriad"])
        & (sig["bullet_lines_permyriad"] <= c["max_bullet_lines_permyriad"])
        & (sig["ellipsis_lines_permyriad"] <= c["max_ellipsis_lines_permyriad"])
        & (sig["alpha_word_permyriad"] >= c["min_alpha_word_permyriad"])
        & (sig["stop_hits"] >= c["min_stop_hits"])
    )
    return F.struct(
        *[v.alias(k) for k, v in sig.items()],
        keep.cast("long").alias("keep_flag"),
    )


def ddb_gopher_signals() -> dict[str, str]:
    """DuckDB twins of :func:`gopher_signals`'s fields, generated from
    the SAME constants. Expects a CTE exposing ``text``, ``words``
    (whitespace tokens, empties dropped) and ``toks`` (tokenizer
    contract) columns; returns {field: SQL} including keep_flag."""
    stop_list = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    nw1 = "greatest(len(words), 1)"
    sig = {
        "n_words": "CAST(len(words) AS BIGINT)",
        "mean_word_len_permyriad": (
            f"(10000 * length(regexp_replace(text, '{GOPHER_WS}', '', 'g'))) // {nw1}"
        ),
        "alpha_word_permyriad": (
            f"(10000 * len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))) // {nw1}"
        ),
        "bullet_lines_permyriad": (
            f"(10000 * (len(regexp_extract_all(text, '{_BULLET_MID}'))"
            f" + CASE WHEN regexp_matches(text, '{_BULLET_HEAD}') THEN 1 ELSE 0 END))"
            f" // len(string_split(text, chr(10)))"
        ),
        "ellipsis_lines_permyriad": (
            f"(10000 * (len(regexp_extract_all(text, '{_ELLIPSIS_MID}'))"
            f" + CASE WHEN ends_with(text, '...') THEN 1 ELSE 0 END))"
            f" // len(string_split(text, chr(10)))"
        ),
        "symbol_word_permyriad": (
            f"(10000 * ((length(text) - length(replace(text, '#', '')))"
            f" + len(regexp_extract_all(text, '\\.\\.\\.')))) // {nw1}"
        ),
        "stop_hits": (
            f"CAST(len(list_filter([{stop_list}], s -> list_contains(toks, s))) AS BIGINT)"
        ),
    }
    c = GOPHER_CAPS
    keep = (
        f"CASE WHEN {sig['n_words']} >= {c['min_words']}"
        f" AND {sig['n_words']} <= {c['max_words']}"
        f" AND {sig['mean_word_len_permyriad']} >= {c['min_mean_word_len_permyriad']}"
        f" AND {sig['mean_word_len_permyriad']} <= {c['max_mean_word_len_permyriad']}"
        f" AND {sig['symbol_word_permyriad']} <= {c['max_symbol_word_permyriad']}"
        f" AND {sig['bullet_lines_permyriad']} <= {c['max_bullet_lines_permyriad']}"
        f" AND {sig['ellipsis_lines_permyriad']} <= {c['max_ellipsis_lines_permyriad']}"
        f" AND {sig['alpha_word_permyriad']} >= {c['min_alpha_word_permyriad']}"
        f" AND {sig['stop_hits']} >= {c['min_stop_hits']}"
        " THEN 1 ELSE 0 END"
    )
    out = {k: f"CAST({v} AS BIGINT)" for k, v in sig.items()}
    out["keep_flag"] = f"CAST({keep} AS BIGINT)"
    return out


# ---------------------------------------------------------------- PAN / Luhn
# Payment-card detection with checksum VALIDATION — the PII class the
# regex scrub (functions/cleaning.PII_PATTERNS) cannot express: a
# 16-digit run is only a card number if it passes the Luhn mod-10 check
# (ISO/IEC 7812), and a compliance audit must distinguish validated
# hits from digit-run lookalikes. Candidate pattern and checksum are
# shared by the Spark expression and the DuckDB twin; the pattern is
# ASCII-class, lookahead-free (Java-regex/RE2-portable).
#
# Candidate generation is two-stage because regex alone cannot decide
# adjacency (no lookaround in RE2): first MAXIMAL separator-joined
# digit runs, then per run either (a) the whole run if its digit count
# is card-shaped (13-19 — handles '4111 1111 1111 1111' as ONE card),
# or (b) a split on spaces with card-shaped segments kept (handles two
# adjacent cards separated by a space, each surfacing individually —
# the greedy-merge false negative a bounded-quantifier pattern has).
# Residual ambiguity, accepted and documented: internally-SPACED cards
# that are ALSO space-adjacent to other digits split into non-card
# fragments and are missed — undecidable without semantic context.
_PAN_RUN = "[0-9](?:[ -]?[0-9])*"  # maximal run, single separators
_PAN_MIN, _PAN_MAX = 13, 19


def pan_candidates(text: Column) -> Column:
    """array<string> of PAN-shaped digit candidates (13-19 digits,
    single space/dash separators allowed), separators stripped, in
    match order — the candidate set :func:`luhn_ok` then validates.
    In-row: one codegen regex scan plus bounded per-run transforms."""

    def _cands(run: Column) -> Column:
        whole = F.replace(
            F.replace(run, F.lit(" "), F.lit("")), F.lit("-"), F.lit("")
        )
        segs = F.filter(
            F.transform(
                F.split(run, " "),
                lambda s: F.replace(s, F.lit("-"), F.lit("")),
            ),
            lambda s: (F.length(s) >= _PAN_MIN) & (F.length(s) <= _PAN_MAX),
        )
        return F.when(
            (F.length(whole) >= _PAN_MIN) & (F.length(whole) <= _PAN_MAX),
            F.array(whole),
        ).otherwise(segs)

    return F.flatten(
        F.transform(
            F.regexp_extract_all(text, F.lit(_PAN_RUN), F.lit(0)), _cands
        )
    )


def luhn_ok(digits: Column) -> Column:
    """Luhn mod-10 checksum over a pure-digit string: from the RIGHT,
    every second digit doubles (minus 9 past 9); the sum must be
    ≡ 0 (mod 10). Pure integer Column expression (no UDF): reverse the
    string once, then one transform/aggregate pass over its digits."""
    rev = F.reverse(digits)
    contrib = F.transform(
        F.sequence(F.lit(1), F.length(rev)),
        lambda i: F.when(
            i % 2 == 1, F.substr(rev, i, F.lit(1)).cast("int")
        ).otherwise(
            2 * F.substr(rev, i, F.lit(1)).cast("int")
            - F.when(F.substr(rev, i, F.lit(1)).cast("int") > 4, 9).otherwise(0)
        ),
    )
    total = F.aggregate(contrib, F.lit(0), lambda acc, x: acc + x)
    return total % 10 == 0


def ddb_pan_candidates(text_expr: str) -> str:
    """DuckDB twin of :func:`pan_candidates` (same constants, same
    two-stage run logic)."""
    whole = "replace(replace(r, ' ', ''), '-', '')"
    segs = (
        "list_filter(list_transform(string_split(r, ' '), "
        "s -> replace(s, '-', '')), "
        f"s -> length(s) BETWEEN {_PAN_MIN} AND {_PAN_MAX})"
    )
    return (
        f"flatten(list_transform(regexp_extract_all({text_expr}, '{_PAN_RUN}'), "
        f"r -> CASE WHEN length({whole}) BETWEEN {_PAN_MIN} AND {_PAN_MAX} "
        f"THEN [{whole}] ELSE {segs} END))"
    )


def ddb_luhn_ok(digits_expr: str) -> str:
    """DuckDB twin of :func:`luhn_ok` over a digit-string expression
    (``d`` must be a bare identifier or simple expression — it is
    spliced several times)."""
    d = digits_expr
    dig = f"CAST({d}[length({d}) - i + 1] AS INTEGER)"
    return (
        f"(list_sum(list_transform(generate_series(1, length({d})), i -> "
        f"CASE WHEN i % 2 = 1 THEN {dig} "
        f"WHEN {dig} > 4 THEN 2 * {dig} - 9 "
        f"ELSE 2 * {dig} END)) % 10 = 0)"
    )


# ------------------------------------------------------------- readability
# Flesch reading-ease (Flesch 1948) as an exact-integer milli-score:
# 206.835 - 1.015*(words/sentences) - 84.6*(syllables/words), all three
# ratios in integer milli arithmetic with identical floor division in
# both engines. Syllables are approximated as vowel GROUPS (the
# standard dictionary-free estimator); sentences as terminal-punct
# runs, floored at 1 so a fragment scores rather than divides by zero.
_FLESCH_WORD = "[a-z0-9]+"
_FLESCH_SENT = "[.!?]+"
_FLESCH_VOWELS = "[aeiouy]+"


def flesch_milli(text: Column) -> Column:
    """struct(n_words, n_sentences, n_syllables, score_milli) — the
    Flesch reading-ease components and score as exact integers
    (milli-points; 206835 = a perfect 206.835). In-row, three codegen
    regex counts and integer arithmetic — scan-speed at 100 TB."""
    low = F.lower(text)
    w = F.greatest(
        F.size(F.regexp_extract_all(low, F.lit(_FLESCH_WORD), F.lit(0))),
        F.lit(1),
    ).cast("long")
    s = F.greatest(
        F.size(F.regexp_extract_all(low, F.lit(_FLESCH_SENT), F.lit(0))),
        F.lit(1),
    ).cast("long")
    y = F.greatest(
        F.size(F.regexp_extract_all(low, F.lit(_FLESCH_VOWELS), F.lit(0))),
        F.lit(1),
    ).cast("long")
    score = (
        F.lit(206835).cast("long")
        - exact_idiv(1015 * w, s)
        - exact_idiv(84600 * y, w)
    )
    return F.struct(
        w.alias("n_words"),
        s.alias("n_sentences"),
        y.alias("n_syllables"),
        score.alias("score_milli"),
    )


def ddb_flesch_milli() -> dict[str, str]:
    """DuckDB twin of :func:`flesch_milli` over the `text` column of
    the current row (same pattern constants, same integer floors)."""
    w = f"greatest(len(regexp_extract_all(lower(text), '{_FLESCH_WORD}')), 1)"
    s = f"greatest(len(regexp_extract_all(lower(text), '{_FLESCH_SENT}')), 1)"
    y = f"greatest(len(regexp_extract_all(lower(text), '{_FLESCH_VOWELS}')), 1)"
    return {
        "n_words": f"CAST({w} AS BIGINT)",
        "n_sentences": f"CAST({s} AS BIGINT)",
        "n_syllables": f"CAST({y} AS BIGINT)",
        "score_milli": (
            f"CAST(206835 - (1015 * {w}) // {s}"
            f" - (84600 * {y}) // {w} AS BIGINT)"
        ),
    }
