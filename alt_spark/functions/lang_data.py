"""Language-identification data tables (SURVEY.md §2 I3).

The reference's language gate is EN/JA with min-chars and
min-confidence thresholds (recap-worker/recap-worker/src/
language_detection.rs:5-65). This module is the engine's checked-in
marker/script table: adding a language is a data edit here, never a
code change in text_analysis.py (the operators iterate these dicts).

Two vote sources, because the engine tokenizer (``\\W+`` split, Java
regex → ASCII word chars) cannot produce CJK tokens at all:

- ``MARKERS``: stopword lexicons voted per *token* — works for
  space-delimited scripts.
- ``SCRIPTS``: Unicode codepoint ranges voted per *character* — how
  unsegmented scripts are recognized. Kana is unique to Japanese, so
  any kana marks text ``ja``; Han without kana reads ``zh`` (the
  ``unless`` precedence below). That is exactly the practical EN/JA
  discrimination the reference's lingua gate performs.
"""

from __future__ import annotations

# Token-vote stopword markers per language (lingua-style voting,
# radically simplified; the pandas-UDF slot for a real model is §2.L).
MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr": ("le", "la", "les", "et", "est", "dans", "que", "une"),
    "es": ("el", "la", "los", "que", "es", "en", "una", "por"),
}

# Character-vote script ranges: lang -> {ranges, unless}. A language
# claims each character inside its ranges as one vote, but only when
# every language named in ``unless`` has zero script characters in the
# row (kana suppresses the han→zh claim on Japanese text, which mixes
# both scripts).
SCRIPTS: dict[str, dict[str, tuple]] = {
    "ja": {"ranges": ((0x3040, 0x30FF),), "unless": ()},  # hiragana+katakana
    "zh": {"ranges": ((0x4E00, 0x9FFF),), "unless": ("ja",)},  # CJK unified han
}

# The \b-anchored regexp_count vote in text_analysis.lang_id equals
# token-equality voting only while every marker is a plain \w+ word:
# a metacharacter or apostrophe (fr "c'est") would silently change the
# alternation's semantics. Fail loudly at import instead — a marker
# outside this alphabet needs the escaped-alternation form AND a
# revisit of the \b == \W+-token-boundary equivalence proof.
for _lang, _words in MARKERS.items():
    for _w in _words:
        if not _w.isascii() or not _w.replace("_", "").isalnum() or _w != _w.lower():
            raise AssertionError(
                f"MARKERS[{_lang!r}] entry {_w!r} is not ^[a-z0-9_]+$; "
                "the \\b-vote/token-vote equivalence in lang_id assumes "
                "plain word markers (see text_analysis.lang_id)"
            )

# Deterministic vote order for the sequential argmax (a later language
# wins only on strictly more votes) — marker langs first, then scripts.
VOTE_ORDER: tuple[str, ...] = (*MARKERS, *SCRIPTS)


def script_char_class(lang: str) -> str:
    """Regex character class for a script language's codepoint ranges
    (Java and RE2 both accept literal-endpoint classes)."""
    ranges = SCRIPTS[lang]["ranges"]
    return "[" + "".join(f"{chr(a)}-{chr(b)}" for a, b in ranges) + "]"
