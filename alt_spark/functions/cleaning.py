"""Text cleaning operators (SURVEY.md §2 I1/I2/I4/I5).

Reference: recap-worker preprocess.rs — ammonia strip + html2text
fallback (:355-404), width/emoji normalization (:345-353), sentence
split (util/text.rs:19), Lindera JA tokenization (:294-315; Go twin
kagome, search-indexer/app/tokenize/tokenizer.go:10-46).

HTML cleaning and sentence splitting are pure regexp chains (codegen'd,
no Python). Unicode normalization and JA tokenization genuinely need
Python (no JVM builtin) — they run as Arrow-batched pandas UDFs, the
§2.L scalar surface. The JA tokenizer prefers a real morphological
tokenizer when importable (fugashi/sudachi); this container has none,
so the pinned fallback is the dictionary-less word segmenter in
functions/ja_segment.py (char-class transitions + longest-match
function words), matching SURVEY §7 hard-part (1)'s "pinned tokenizer
behind a pandas UDF".
"""

from __future__ import annotations

import unicodedata

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "html_clean",
    "normalize_text",
    "sentence_split",
    "ja_tokenize",
    "scrub_pii",
    "ddb_scrub_pii",
    "PII_PATTERNS",
    "c4_page_stats",
    "ddb_c4_page_stats",
    "C4_MIN_LINE_WORDS",
    "C4_MIN_SENTENCES",
]


def html_clean(text: Column) -> Column:
    """Strip tags/scripts, decode common entities, collapse whitespace.

    The regexp-chain port of the strip-tags path (preprocess.rs:355-404);
    declared contract: script/style bodies removed, block tags become
    spaces, entities &amp; &lt; &gt; &quot; &#39; &nbsp; decode, runs of
    whitespace collapse, result trimmed.
    """
    c = F.regexp_replace(text, r"(?is)<(script|style)[^>]*>.*?</\1>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?s)<[^>]+>", " ")
    for ent, rep in (
        ("&amp;", "&"),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&nbsp;", " "),
    ):
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def sentence_split(text: Column) -> Column:
    """array<string> of sentences: split after .!?。！？ runs (I4)."""
    return F.filter(
        F.transform(
            F.split(text, r"(?<=[.!?。！？])\s+"), lambda s: F.trim(s)
        ),
        lambda s: s != "",
    )


def _normalize_impl(s: pd.Series) -> pd.Series:
    """NFKC fold: full/half-width unification + compatibility forms, with
    variation selectors and zero-width marks stripped (preprocess.rs:
    345-353's width-divergent-selector strip, generalized)."""
    drop = dict.fromkeys(
        list(range(0xFE00, 0xFE10)) + [0x200B, 0x200C, 0x200D, 0xFEFF]
    )
    return s.map(
        lambda x: None
        if x is None
        else unicodedata.normalize("NFKC", x).translate(drop)
    )


def normalize_text(text: Column) -> Column:
    """Unicode NFKC normalization as an Arrow-batched pandas UDF (I2)."""
    return pandas_udf(_normalize_impl, "string")(text)


_HAVE_MORPH = False
try:  # pragma: no cover - not present in this container
    import fugashi  # type: ignore  # noqa: F401

    _HAVE_MORPH = True
except Exception:
    pass


def _ja_tokenize_impl(s: pd.Series) -> pd.Series:
    if _HAVE_MORPH:  # pragma: no cover - exercised only where fugashi exists
        tagger = fugashi.Tagger()

        def tok(x):
            return [] if x is None else [w.surface for w in tagger(x)]

    else:
        from alt_spark.functions.ja_segment import segment as tok

    return s.map(tok)


def ja_tokenize(text: Column) -> Column:
    """JA-aware tokenization (I5): morphological when a tokenizer package
    is importable (fugashi), else the pinned dictionary-less word
    segmenter (functions/ja_segment.py — script-run merging +
    longest-match function-word splitting, TinySegmenter-class).
    Arrow-batched pandas UDF returning array<string>; goldens in
    tests/test_cleaning_llm.py freeze the fallback contract."""
    return pandas_udf(_ja_tokenize_impl, "array<string>")(text)


# ----------------------------------------------------------------- PII scrub
# Redaction patterns for training-data cleaning: lookahead-free,
# ASCII-class-only regexes so the IDENTICAL pattern string runs in Java
# regex (Spark) and RE2 (DuckDB) — same discipline as the BPE
# pre-tokenizer (text_analysis.py). Order matters and is part of the
# contract: URLs scrub before emails (URLs may embed '@'), IPs before
# phones (dotted quads would otherwise half-match the phone shape).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"https?://[^ \t\r\n]+", "[URL]"),
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
    (r"\+?[0-9][0-9 ().-]{7,}[0-9]", "[PHONE]"),
)


def scrub_pii(text: Column) -> Column:
    """Redact URLs, emails, IPs and phone-shaped digit runs to typed
    placeholders — the standard privacy pass before corpus export. A
    chain of JVM-side regexp_replace (one projection, no UDF, no
    shuffle); at 100 TB this is scan-speed."""
    out = text
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def ddb_scrub_pii(text_expr: str) -> str:
    """DuckDB twin of :func:`scrub_pii`, generated from the SAME pattern
    table (so the engines cannot drift) with 'g' for global replace."""
    out = text_expr
    for pat, repl in PII_PATTERNS:
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{repl}', 'g')"
    return out


# ------------------------------------------------------------- C4 heuristics
# The C4 page-cleaning rules (Raffel et al. 2020, "Exploring the Limits
# of Transfer Learning", §2.2) — the line/page gates every web-crawl
# training pipeline applies before heavier quality models. Constants are
# shared by the Spark expression and the DuckDB twin so the engines
# cannot drift; all patterns are ASCII-class, lookahead-free (the
# Java-regex/RE2 portability discipline of PII_PATTERNS).
C4_MIN_LINE_WORDS = 5  # a line survives only with >= 5 words ...
C4_MIN_SENTENCES = 3  # ... and a page only with >= 3 kept sentences
_C4_TERMINAL = '[.!?"] *$'  # line must end in terminal punctuation
_C4_WORD = "[A-Za-z0-9]+"
_C4_SENT = "[.!?]+"
_C4_LINE_BAD = "javascript"  # boilerplate cookie/JS-warning lines
_C4_PAGE_BAD = "lorem ipsum"  # placeholder pages are dropped whole
_C4_BRACE = "{"  # code pages are dropped whole


def c4_page_stats(text: Column) -> Column:
    """C4 line filtering + page gating as ONE in-row struct:
    ``(n_lines, n_kept, page_kept, clean_text)``.

    Line gates (each line of the page): terminal punctuation, at least
    ``C4_MIN_LINE_WORDS`` words, and no 'javascript' (the cookie-warning
    heuristic). Page gates (the whole page): no 'lorem ipsum', no curly
    brace, and at least ``C4_MIN_SENTENCES`` sentences surviving in the
    kept text. ``clean_text`` is the kept lines rejoined in order —
    content and order are both pinned by the q84 oracle's md5.

    Scale shape: entirely in-row (split / filter / array_join over the
    line array — no explode, no shuffle); the HOF lambdas run
    interpreted rather than codegen'd, but per-line regexes on a
    bounded line count beat exploding a 100 TB corpus into a
    line-grain shuffle by construction.

    Lines split on ``\\r?\\n`` in BOTH engines: web-crawl pages are
    routinely CRLF, and a bare-LF split would leave ``\\r`` on every
    line — where Java's ``$`` matches before it but RE2's does not,
    silently diverging the engines (found by review, planted row -37
    pins it).
    """
    lines = F.split(text, r"\r?\n")

    def _keep(line: Column) -> Column:
        return (
            line.rlike(_C4_TERMINAL)
            & (
                F.size(F.regexp_extract_all(line, F.lit(_C4_WORD), F.lit(0)))
                >= C4_MIN_LINE_WORDS
            )
            & (F.instr(F.lower(line), _C4_LINE_BAD) == 0)
        )

    kept = F.filter(lines, _keep)
    clean = F.array_join(kept, "\n")
    page_kept = (
        (F.instr(F.lower(text), _C4_PAGE_BAD) == 0)
        & (F.instr(text, _C4_BRACE) == 0)
        & (
            F.size(F.regexp_extract_all(clean, F.lit(_C4_SENT), F.lit(0)))
            >= C4_MIN_SENTENCES
        )
    )
    return F.struct(
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        page_kept.cast("long").alias("page_kept"),
        clean.alias("clean_text"),
    )


def ddb_c4_page_stats(text_expr: str) -> dict[str, str]:
    """DuckDB twin of :func:`c4_page_stats`: expression strings for
    each struct field, generated from the SAME constants."""
    lines = f"string_split_regex({text_expr}, '\\r?\\n')"
    keep = (
        f"regexp_matches(l, '{_C4_TERMINAL}') AND "
        f"len(regexp_extract_all(l, '{_C4_WORD}')) >= {C4_MIN_LINE_WORDS} AND "
        f"NOT contains(lower(l), '{_C4_LINE_BAD}')"
    )
    kept = f"list_filter({lines}, l -> {keep})"
    # coalesce: DuckDB array_to_string([]) is NULL where Spark
    # array_join([]) is '' — without it every fully-filtered page
    # NULLs its md5 and page gate (measured, not hypothetical).
    clean = f"coalesce(array_to_string({kept}, chr(10)), '')"
    page = (
        f"(NOT contains(lower({text_expr}), '{_C4_PAGE_BAD}') AND "
        f"NOT contains({text_expr}, '{_C4_BRACE}') AND "
        f"len(regexp_extract_all({clean}, '{_C4_SENT}')) >= {C4_MIN_SENTENCES})"
    )
    return {
        "n_lines": f"CAST(len({lines}) AS BIGINT)",
        "n_kept": f"CAST(len({kept}) AS BIGINT)",
        "page_kept": f"CAST({page} AS BIGINT)",
        "clean_text": clean,
    }
