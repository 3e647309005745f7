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


def whitespace_token_count(text: Column) -> Column:
    """Token count by whitespace runs (the cheap pre-tokenizer count)."""
    return F.size(F.filter(F.split(text, r"\s+"), lambda x: x != ""))


def word_token_count(text: Column) -> Column:
    """Token count under the engine tokenizer contract (\\W+ split) — a
    BPE-ish upper bound since punctuation splits words apart."""
    return F.size(_tokens(text))


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
    """Characters of `lang`'s script ranges in the row (SCRIPTS table)."""
    cls = script_char_class(lang)
    return F.length(text) - F.length(F.regexp_replace(text, cls, ""))


def lang_id(text: Column, min_tokens: int = 3) -> Column:
    """Language ID with an abstain gate (language_detection.rs:5-65
    min-chars/min-confidence analog): null when too short or no votes.

    Two vote sources, combined in one sequential argmax (a later
    language wins only on strictly more votes): token-level stopword
    markers for space-delimited languages, and character-level script
    votes for CJK — the \\W+ tokenizer produces NO tokens for
    unsegmented text, so Japanese is recognized by its kana characters
    (each kana char = one vote; han votes zh only when kana is absent,
    per the SCRIPTS `unless` precedence). The abstain gate accepts
    either enough tokens OR enough script characters.
    """
    toks = _tokens(text)

    def _marker_votes(lang: str) -> Column:
        # Two-arg lambdas are interpreted as (element, index) by
        # F.filter, so bind the marker array first and keep the lambda
        # unary.
        markers = F.array(*[F.lit(m) for m in _LANG_MARKERS[lang]])
        return F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))

    raw_script = {lang: script_char_count(text, lang) for lang in _LANG_SCRIPTS}

    def _script_votes(lang: str) -> Column:
        v = raw_script[lang]
        for other in _LANG_SCRIPTS[lang]["unless"]:
            v = F.when(raw_script[other] == 0, v).otherwise(F.lit(0))
        return v

    ordered = [(lang, _marker_votes(lang)) for lang in _LANG_MARKERS] + [
        (lang, _script_votes(lang)) for lang in _LANG_SCRIPTS
    ]
    # argmax with deterministic tiebreak on vote order (lang_data.VOTE_ORDER).
    best = None
    best_votes = None
    for lang, v in ordered:
        if best is None:
            best, best_votes = F.lit(lang), v
        else:
            take = v > best_votes
            best = F.when(take, F.lit(lang)).otherwise(best)
            best_votes = F.when(take, v).otherwise(best_votes)
    script_total = None
    for lang in _LANG_SCRIPTS:
        script_total = (
            raw_script[lang]
            if script_total is None
            else script_total + raw_script[lang]
        )
    enough = (F.size(toks) >= min_tokens) | (script_total >= min_tokens)
    return F.when(enough & (best_votes > 0), best).otherwise(
        F.lit(None).cast("string")
    )


def winnowing_fingerprints(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
    portable: bool = False,
):
    """Winnowing document fingerprints (Schleimer et al. 2003): hash all
    k-gram character shingles, keep the min hash of every sliding window.

    Guarantees any shared substring of length >= k+window-1 yields at
    least one shared fingerprint — the rolling-hash dedup/provenance
    primitive. Returns (id, fingerprints array<long> sorted distinct);
    rows too short for one full window get an empty set.

    DataFrame-shaped on purpose: a pure-expression form (transform of
    array_min over slices) re-computes the gram array per window after
    Catalyst's projection collapse — ~100× slower. Here grams explode
    once and the sliding min is a rowsBetween window over per-doc
    partitions (bounded by document length, so no skew at scale).

    ``portable=True`` switches the gram hash from xxhash64 (production
    default) to the md5-based portable_hash64 so the whole pipeline has
    an exact DuckDB twin (see functions/hashing.py); the winnowing
    guarantee is hash-agnostic.
    """
    from pyspark.sql.window import Window

    from alt_spark.functions.hashing import portable_hash64

    hash_fn = portable_hash64 if portable else F.xxhash64
    text = F.col(text_col)
    n = F.length(text)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: hash_fn(text.substr(i.cast("int"), F.lit(k))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    g = df.select(F.col(id_col).alias("id"), F.posexplode(grams).alias("pos", "h"))
    ordered = Window.partitionBy("id").orderBy("pos")
    sliding = ordered.rowsBetween(0, window - 1)
    # "pos has a full window after it" == lead(h, window-1) non-null;
    # expressed as a lead over the SAME (partition, order) spec as the
    # sliding min, the two fuse into one WindowExec pass — the
    # count(*)-over-partition guard has no order spec and forces a
    # second full pass over the exploded grams.
    fps = (
        g.withColumn("wmin", F.min("h").over(sliding))
        .withColumn("full_window", F.lead("h", window - 1).over(ordered).isNotNull())
        .filter(F.col("full_window"))
        .groupBy("id")
        .agg(F.array_sort(F.collect_set("wmin")).alias("fingerprints"))
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(fps, "id", "left")
        .select(
            "id",
            F.coalesce("fingerprints", F.array().cast("array<bigint>")).alias(
                "fingerprints"
            ),
        )
    )
