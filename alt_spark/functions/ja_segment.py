"""Dictionary-less Japanese word segmentation (SURVEY.md §2 I5).

The reference tokenizes Japanese morphologically — Lindera/IPADIC in
recap-worker (recap-worker/recap-worker/src/pipeline/preprocess.rs:294-315)
and kagome in the search indexer (search-indexer/app/tokenize/
tokenizer.go:10-46). Neither has a JVM or pip twin in this container, so
this module is the engine's pinned pure-Python fallback: a
TinySegmenter-class heuristic (public algorithm family — character-type
transitions plus a closed function-word list), producing word-level
tokens instead of the previous character-bigram degradation.

Algorithm (deterministic, data-driven):

1. Split the text into script runs — kanji, hiragana, katakana,
   latin/digit; punctuation and symbols are token separators.
2. A script transition is a boundary EXCEPT kanji→hiragana, which stays
   merged so okurigana/inflection attaches to its stem (書いて, 大きな).
3. Inside each (kanji-prefixed) hiragana stretch, scan left-to-right
   with longest-match against FUNCTION_WORDS (particles, copulas,
   auxiliaries — a closed class, so it is data, not a dictionary):
   a match flushes the pending content as one token and emits the
   function word as its own token.

Example: 日本語の文章を書いています →
``日本語 | の | 文章 | を | 書い | て | います`` — the shape a
morphological tokenizer produces, minus dictionary-only compound splits
(関西国際空港 stays one token; IPADIC would split it). Goldens in
tests/test_cleaning_llm.py freeze this contract.

Known, accepted error class: content hiragana words containing a
function-word substring over-split (ひらがな → ひら|が|な) — the same
failure mode TinySegmenter's statistical weights mostly-but-not-always
avoid; acceptable for the IR/tagging use the reference puts tokens to.
"""

from __future__ import annotations

__all__ = ["FUNCTION_WORDS", "segment"]

# Closed-class function words: particles, copulas, common auxiliaries
# and formal nouns. Longest-match-first; extending the segmenter is an
# edit HERE (data), not in the algorithm.
FUNCTION_WORDS: tuple[str, ...] = (
    # 4+ chars
    "ください",
    "について",
    "としては",
    "ているが",
    "しました",
    "しません",
    # 3 chars
    "します",
    "でした",
    "ました",
    "ません",
    "います",
    "される",
    "という",
    "として",
    "ながら",
    "けれど",
    "たちの",
    # 2 chars
    "です",
    "ます",
    "した",
    "して",
    "いる",
    "いた",
    "ある",
    "あり",
    "ない",
    "なる",
    "なり",
    "する",
    "され",
    "れる",
    "から",
    "まで",
    "より",
    "など",
    "こと",
    "もの",
    "ため",
    "とき",
    "これ",
    "それ",
    "あれ",
    "どこ",
    "ここ",
    "そこ",
    "では",
    "には",
    "とは",
    "でも",
    "ても",
    # 1 char
    "の",
    "は",
    "が",
    "を",
    "に",
    "で",
    "と",
    "も",
    "へ",
    "や",
    "か",
    "ね",
    "よ",
    "な",
    "だ",
    "て",
)

_BY_LENGTH: tuple[str, ...] = tuple(
    sorted(FUNCTION_WORDS, key=len, reverse=True)
)
_MAX_FW = max(len(w) for w in FUNCTION_WORDS)
_FW_SET = frozenset(FUNCTION_WORDS)


def _char_class(ch: str) -> str:
    o = ord(ch)
    if 0x3041 <= o <= 0x309F:
        return "hira"
    if 0x30A0 <= o <= 0x30FF:  # includes the prolonged-sound mark ー
        return "kata"
    if 0x4E00 <= o <= 0x9FFF or o == 0x3005:  # han + 々 iteration mark
        return "kanji"
    if ch.isalnum() and o < 0x3000:
        return "latin"
    return "sep"


def _scan_hiragana(pending: str, hira: str, out: list[str]) -> None:
    """Longest-match function-word scan; `pending` is the attached kanji
    stem (may be empty). Non-matching hiragana accretes onto pending."""
    i = 0
    n = len(hira)
    while i < n:
        hit = None
        for ln in range(min(_MAX_FW, n - i), 0, -1):
            if hira[i : i + ln] in _FW_SET:
                hit = hira[i : i + ln]
                break
        if hit is not None:
            if pending:
                out.append(pending)
                pending = ""
            out.append(hit)
            i += len(hit)
        else:
            pending += hira[i]
            i += 1
    if pending:
        out.append(pending)


def segment(text: str | None) -> list[str]:
    """Segment one string into word-level tokens (latin lowercased)."""
    if not text:
        return []
    # Pass 1: script runs.
    runs: list[tuple[str, str]] = []
    cur_cls: str | None = None
    start = 0
    for idx, ch in enumerate(text):
        cls = _char_class(ch)
        if cls != cur_cls:
            if cur_cls is not None and cur_cls != "sep":
                runs.append((cur_cls, text[start:idx]))
            cur_cls = cls
            start = idx
    if cur_cls is not None and cur_cls != "sep":
        runs.append((cur_cls, text[start:]))

    # Pass 2: merge kanji→hiragana, scan hiragana, emit the rest.
    out: list[str] = []
    i = 0
    while i < len(runs):
        cls, run = runs[i]
        if cls == "kanji":
            if i + 1 < len(runs) and runs[i + 1][0] == "hira":
                _scan_hiragana(run, runs[i + 1][1], out)
                i += 2
                continue
            out.append(run)
        elif cls == "hira":
            _scan_hiragana("", run, out)
        elif cls == "kata":
            out.append(run)
        else:  # latin
            out.append(run.lower())
        i += 1
    return out
