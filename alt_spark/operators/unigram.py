"""Unigram-LM subword segmentation (Kudo 2018, "Subword
Regularization") — the SECOND tokenizer algorithm family next to BPE
(operators/bpe.py): where BPE segments by replaying a learned merge
sequence greedily, a unigram tokenizer picks the segmentation that
MAXIMIZES the summed piece log-probabilities under a frozen
vocabulary, via Viterbi dynamic programming over the word's
positions. SentencePiece's default model is this one, so a corpus
engine that prices/tokenizes for both families covers the two
production tokenizer classes.

Deploy-side only, by design (the q88 doctrine: a tokenizer is a
frozen, versioned artifact): the vocabulary here is PINNED —
(piece, milli-log-prob) pairs with integer scores — so the whole DP
is exact integer arithmetic and the chosen segmentation is
oracle-checkable cross-engine. Learning the vocabulary (EM over
segmentation lattices) is out of scope the same way q87's merge loop
is rows-only: iterative argmax feeding the next round.

The 100 TB shape mirrors BPE's: the corpus collapses ONCE to the
Zipf-bounded word-type table, the DP runs in-row on that bounded
table (a word of length n costs n x MAX_PIECE_LEN map-lookups inside
one codegen'd fold — no explode, no join, no shuffle), and documents
join back to their word types by equi-key if per-document output is
needed. Tokenizing with a frozen unigram vocab is scan-speed.

DP contract (both engines replay it exactly):
  best[0] = (score 0, empty segmentation)
  best[i] = argmax over piece lengths l in 1..min(MAX_PIECE_LEN, i):
              best[i-l].score + score(word[i-l+1 .. i])
  where a multi-char piece must be in the vocabulary and a single
  char falls back to UNK_MILLI when absent (SentencePiece's UNK —
  every word stays segmentable, no unreachable prefixes). Ties break
  per position by (score, piece_len, piece) DESCENDING — Spark's
  array_max struct comparator and the oracle's row_number ORDER BY
  are the same total order (seg is never consulted: a piece uniquely
  identifies its start position, so (score, piece_len, piece) is
  already unique per candidate set).

Reference parity anchor: the reference tokenizes JA with Lindera
(recap-worker/recap-worker/src/pipeline/preprocess.rs:294-315), a
Viterbi lattice tokenizer over a pinned dictionary — this operator is
that algorithm class on subword grain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from alt_spark.operators.dedup import tokens_col

__all__ = [
    "PINNED_VOCAB",
    "UNK_MILLI",
    "MAX_PIECE_LEN",
    "word_types",
    "viterbi_segment",
    "ddb_viterbi_ctes",
    "ddb_viterbi_sql",
]

# Frozen vocabulary: (piece, milli-log-prob). Integer milli units keep
# every DP sum exact in both engines. Single chars a-z are the
# fallback floor; multi-char pieces score better than their single-
# char spellouts exactly when the unigram model would prefer them.
# "li"+"ne" == "line" (-12000 both) plants a TIE at the last position
# of "line" — the (piece_len DESC) tie-break picks the whole word, and
# a pytest pins it.
_SINGLES: tuple[tuple[str, int], ...] = tuple(
    (chr(c), -4000) for c in range(ord("a"), ord("z") + 1)
)
_MULTI: tuple[tuple[str, int], ...] = (
    ("ta", -5500),
    ("ble", -6500),
    ("table", -9000),
    ("row", -7000),
    ("scan", -8000),
    ("val", -6800),
    ("ue", -5600),
    ("value", -9500),
    ("er", -5200),
    ("in", -5000),
    ("st", -5300),
    ("or", -5400),
    ("sort", -8200),
    ("part", -8600),
    ("ha", -5700),
    ("sh", -5900),
    ("hash", -8400),
    ("data", -8300),
    ("li", -6000),
    ("ne", -6000),
    ("line", -12000),
    ("que", -7200),
    ("ry", -5800),
    ("win", -6900),
    ("dow", -7100),
)
PINNED_VOCAB: tuple[tuple[str, int], ...] = _SINGLES + _MULTI
UNK_MILLI = -20000
MAX_PIECE_LEN = max(len(p) for p, _ in PINNED_VOCAB)


def word_types(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) under the engine tokenizer contract — the one
    corpus-wide aggregation; the DP runs on this bounded table."""
    return (
        docs.select(F.explode(tokens_col(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _vocab_map() -> Column:
    pairs: list[Column] = []
    for piece, ms in PINNED_VOCAB:
        pairs.extend([F.lit(piece), F.lit(int(ms))])
    return F.create_map(*pairs)


def viterbi_segment(word: Column) -> Column:
    """struct(score long, seg string) — the max-likelihood
    segmentation of ``word`` under PINNED_VOCAB, pieces joined by a
    single space. In-row Viterbi: one fold over the word's positions,
    each step an array_max over at most MAX_PIECE_LEN candidate
    structs — all JVM codegen on the bounded word-type table."""
    vocab = _vocab_map()
    init = F.array(
        F.struct(F.lit(0).cast("long").alias("score"), F.lit("").alias("seg"))
    )

    def step(acc: Column, i: Column) -> Column:
        def cand(length: Column) -> Column:
            piece = F.substr(word, i - length + 1, length)
            base = F.element_at(acc, i - length + 1)
            in_vocab = F.element_at(vocab, piece)
            ms = F.when(length == 1, F.coalesce(in_vocab, F.lit(UNK_MILLI))).otherwise(
                in_vocab
            )
            return F.when(
                ms.isNotNull(),
                F.struct(
                    (base["score"] + ms.cast("long")).alias("score"),
                    length.cast("int").alias("piece_len"),
                    piece.alias("piece"),
                    F.when(base["seg"] == "", piece)
                    .otherwise(F.concat(base["seg"], F.lit(" "), piece))
                    .alias("seg"),
                ),
            )

        cands = F.filter(
            F.transform(
                F.sequence(F.lit(1), F.least(F.lit(MAX_PIECE_LEN), i)), cand
            ),
            lambda x: x.isNotNull(),
        )
        best = F.array_max(cands)
        return F.concat(
            acc,
            F.array(
                F.struct(best["score"].alias("score"), best["seg"].alias("seg"))
            ),
        )

    dp = F.aggregate(F.sequence(F.lit(1), F.length(word)), init, step)
    # Guard the empty word: sequence(1, 0) yields DESCENDING [1, 0]
    # (implicit step -1) and step i=0 would evaluate element_at(acc, 0)
    # — an error even with ANSI off. The tokens_col contract never
    # produces '', but the operator must not crash on it. (Review
    # finding, r8.)
    return F.when(
        F.length(word) > 0, F.element_at(dp, -1)
    ).otherwise(
        F.struct(F.lit(0).cast("long").alias("score"), F.lit("").alias("seg"))
    )


def ddb_viterbi_ctes(words_cte: str, max_len: int) -> str:
    """The DP stage chain as a composable WITH-body fragment: defines
    ``w`` (the caller's words), ``wl(word, cnt, n)`` length-bounded,
    ``v(piece, ms)`` the pinned vocabulary, stages ``b0..b{max_len}``
    (MATERIALIZED — DuckDB inlines plain CTEs, and a stage referencing
    up to MAX_PIECE_LEN prior stages would otherwise expand
    exponentially), and ``fin(n, word, score, seg)`` holding every
    word's full-length best. Callers append their own final SELECT
    joining ``wl`` to ``fin ON f.word = wl.word AND f.n = wl.n``."""
    vocab_rows = ", ".join(
        f"('{p}', {ms})" for p, ms in PINNED_VOCAB
    )
    ctes = [
        f"w AS ({words_cte})",
        f"wl AS (SELECT word, cnt, length(word) AS n FROM w WHERE length(word) <= {max_len})",
        f"v(piece, ms) AS (VALUES {vocab_rows})",
        "b0 AS MATERIALIZED (SELECT word, CAST(0 AS BIGINT) AS score, '' AS seg FROM wl)",
    ]
    for i in range(1, max_len + 1):
        branches = []
        for length in range(1, min(MAX_PIECE_LEN, i) + 1):
            j = i - length
            unk = f"coalesce(v.ms, {UNK_MILLI})" if length == 1 else "v.ms"
            branches.append(
                f"""
      SELECT b.word, b.score + CAST({unk} AS BIGINT) AS score,
             {length} AS piece_len,
             substr(b.word, {j + 1}, {length}) AS piece,
             CASE WHEN b.seg = '' THEN substr(b.word, {j + 1}, {length})
                  ELSE b.seg || ' ' || substr(b.word, {j + 1}, {length}) END AS seg
      FROM b{j} b LEFT JOIN v ON v.piece = substr(b.word, {j + 1}, {length})
      WHERE length(b.word) >= {i} AND {unk} IS NOT NULL"""
            )
        union = "\n      UNION ALL".join(branches)
        ctes.append(
            f"""b{i} AS MATERIALIZED (
  SELECT word, score, seg FROM (
    SELECT word, score, seg,
           row_number() OVER (PARTITION BY word
             ORDER BY score DESC, piece_len DESC, piece DESC) AS rn
    FROM ({union})
  ) WHERE rn = 1
)"""
        )
    finals = "\n    UNION ALL ".join(
        f"SELECT {i} AS n, word, score, seg FROM b{i}" for i in range(1, max_len + 1)
    )
    joined_ctes = ",\n".join(ctes)
    return f"""{joined_ctes},
fin AS (
  {finals}
)"""


def ddb_viterbi_sql(words_cte: str, max_len: int) -> str:
    """DuckDB twin of :func:`viterbi_segment`, as an UNROLLED stage
    chain (a genuinely independent formulation of the same DP — stage
    tables + window argmax, vs Spark's in-row fold): ``b{i}`` holds
    best[i] for every word of length >= i; the final SELECT joins each
    word to its full-length stage. ``words_cte`` must expose
    (word, cnt); callers bound word length to ``max_len`` (the Spark
    side applies the same declared bound so both engines segment the
    identical word set).

    Returns the full WITH...SELECT producing
    (word, cnt, n_chars, n_pieces, score, seg) ORDER BY word.
    """
    return f"""
WITH {ddb_viterbi_ctes(words_cte, max_len)}
SELECT wl.word, wl.cnt,
       wl.n AS n_chars,
       CAST(len(string_split(f.seg, ' ')) AS BIGINT) AS n_pieces,
       f.score, f.seg
FROM wl JOIN fin f ON f.word = wl.word AND f.n = wl.n
ORDER BY wl.word
"""
