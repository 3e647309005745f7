"""Distributed BPE vocabulary learning (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") — the tokenizer
TRAINING step of a data pipeline, upstream of the token counting every
other operator consumes. q80 reports one round's pair statistics; this
operator runs the actual merge loop.

The 100 TB shape rests on one observation: BPE learning never needs
the corpus after the first aggregation. Words collapse to a WORD-TYPE
table (word, count) — one corpus-wide shuffle, Zipf-bounded output —
and all k merge rounds iterate on that bounded table: per round one
weighted pair count (in-row pair construction, map-side combine), one
1-row argmax collect (deterministic tie-break: count desc, then pair
lexicographic), one in-row merge fold. Round lineage is truncated with
localCheckpoint (the connected-components doctrine) so round k's plan
does not embed rounds 1..k-1.

Not SQL-expressible as one query (the argmax of round i feeds the
tokenization of round i+1 — recursive CTEs cannot aggregate over the
recursive term), so q87 registers rows-only; exactness is pinned in
pytest against a reference Python implementation of the published
algorithm with the identical tie-break (tests/test_ml_ops.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from alt_spark.operators.dedup import tokens_col

__all__ = [
    "word_type_table",
    "learn_bpe_merges",
    "apply_bpe_merges",
    "PINNED_MERGES",
    "segment_symbol_string",
    "ddb_segment_symbol_string",
    "word_symbol_string",
    "ddb_word_symbol_string",
]

_EOW = "</w>"  # end-of-word marker: final subwords stay distinct


def word_type_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, cnt) over the engine tokenizer contract — the ONE
    corpus-wide aggregation of BPE learning; everything after runs on
    this Zipf-bounded table."""
    return (
        docs.select(F.explode(tokens_col(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _char_symbols(word: Column) -> Column:
    """array<string> of single characters plus the end-of-word marker.
    Explode positions + substr (codegen) rather than a per-char lambda
    build — but symbol arrays live on the bounded TYPE table, so a
    transform over the word's index range is already cheap."""
    return F.concat(
        F.transform(
            F.sequence(F.lit(1), F.length(word)),
            lambda i: F.substr(word, i, F.lit(1)),
        ),
        F.array(F.lit(_EOW)),
    )


def _merge_fold(syms: Column, left: Column, right: Column) -> Column:
    """One greedy left-to-right merge pass: adjacent (left, right)
    becomes left||right, non-overlapping — 'a a a a' with merge (a,a)
    folds to 'aa aa', matching the reference algorithm."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == left)
            & (s == right),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(left, right)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _pair_counts(types: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the type table's symbol
    arrays: in-row pair construction (two slices zipped), explode,
    count weighted by word frequency."""
    lead = F.greatest(F.size("syms") - 1, F.lit(0))
    pairs = types.select(
        "cnt",
        F.explode(
            F.arrays_zip(
                F.slice("syms", 1, lead).alias("a"),
                F.slice("syms", 2, lead).alias("b"),
            )
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.a").alias("a"), F.col("p.b").alias("b")
    ).agg(F.sum("cnt").alias("n"))


def learn_bpe_merges(
    docs: DataFrame,
    k: int = 8,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> DataFrame:
    """Learn ``k`` BPE merges; returns a DataFrame
    ``(step, left, right, pair_count)`` with step = 1..k in merge
    order. Stops early (fewer rows) when no pair reaches
    ``min_pair_count`` — merging singletons memorizes the corpus.

    Determinism: the argmax tie-break is (count desc, left asc,
    right asc) — total, so the merge sequence is a pure function of
    the corpus (pinned against the reference implementation in
    pytest).
    """
    spark = docs.sparkSession
    # coalesce: the type table is Zipf-bounded (orders of magnitude
    # smaller than the corpus), so the k iteration rounds should not
    # pay corpus-sized task counts — 8 partitions keeps round latency
    # flat locally and still parallelizes a billion-type multilingual
    # table on a cluster.
    types = (
        word_type_table(docs, text_col)
        .coalesce(8)
        .select(_char_symbols(F.col("word")).alias("syms"), "cnt")
        .localCheckpoint()  # corpus scan happens HERE, exactly once
    )
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, k + 1):
        top = (
            _pair_counts(types)
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_pair_count:
            break
        a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
        merges.append((step, a, b, n))
        # Eager on purpose: the next round's action is a limit(1)
        # collect, whose partial-evaluation job computes only some
        # partitions — a LAZY checkpoint here only half-materializes
        # and every later round recomputes the missing partitions
        # through the whole chain (measured 2.8 s -> 11-17 s at sf0.1
        # when this was tried lazy in r12).
        types = types.select(
            _merge_fold(F.col("syms"), F.lit(a), F.lit(b)).alias("syms"),
            "cnt",
        ).localCheckpoint()  # round lineage truncated (CC doctrine)
    return spark.createDataFrame(
        merges, "step int, left string, right string, pair_count long"
    )


def apply_bpe_merges(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize documents with a learned merge list: per word, the k
    merges fold in order (k nested in-row passes — merges are a
    driver-side list because a tokenizer IS a broadcast artifact).
    Returns (id, n_subwords, subword_checksum) — the segmentation
    surface: checksum = sum over subwords of xxhash64(subword), so a
    wrong merge order or a wrong fold changes it.

    At 100 TB this is the scan-side consumer of the learned
    vocabulary: one projection, no shuffle except the caller's own
    aggregation.
    """
    words = F.transform(tokens_col(text_col), _char_symbols)
    for a, b in merges:
        words = F.transform(
            words, lambda syms: _merge_fold(syms, F.lit(a), F.lit(b))
        )
    flat = F.flatten(words)
    return docs.select(
        F.col(id_col).alias("id"),
        F.size(flat).cast("long").alias("n_subwords"),
        F.coalesce(
            F.aggregate(
                flat,
                F.lit(0).cast("long"),
                lambda acc, s: acc + F.xxhash64(s),
            ),
            F.lit(0).cast("long"),
        ).alias("subword_checksum"),
    )


# ----------------------------------------------------- pinned segmentation
# Subword segmentation with a PINNED merge table — the deploy-side
# twin of learn_bpe_merges: a production tokenizer is a versioned
# artifact applied unchanged to every corpus version, so the merge
# list here is a constant (learned once at sf0.1 by q87, then frozen),
# and segmentation becomes fully oracle-checkable (q88).
#
# Formulation: each word renders as a sentinel-delimited symbol string
# ("\x01c\x02" per symbol, symbols separated by one space, words by
# \x03), and one merge (a, b) is ONE literal string replace of
# "\x01a\x02 \x01b\x02" with "\x01ab\x02". Literal replace scans left
# to right non-overlapping — exactly the greedy merge fold's
# semantics (pytest pins the two formulations equal) — and literal
# replace exists identically in Spark and DuckDB, which is what makes
# the oracle possible where the iterative LEARNER (q87) is rows-only.
# Sentinels cannot appear in tokens (the tokenizer strips non-word
# chars), so a pattern can never match from the middle of a symbol.
PINNED_MERGES: tuple[tuple[str, str], ...] = (
    ("e", "</w>"),
    ("e", "r"),
    ("i", "n"),
    ("o", "r"),
    ("s", "t"),
    ("er", "</w>"),  # consumes merge 2's product: chaining exercised
)
_S1, _S2, _SW = "\x01", "\x02", "\x03"


def _sym(s: str) -> str:
    return f"{_S1}{s}{_S2}"


def segment_symbol_string(text: Column) -> Column:
    """The document's full segmentation as one sentinel symbol string
    after applying PINNED_MERGES in order. In-row: a regex char-wrap
    per word, an array_join, and k literal replaces — scan-speed."""
    word = F.transform(
        tokens_col(text),
        lambda t: F.concat(
            F.regexp_replace(t, "(.)", f"{_S1}$1{_S2} "),
            F.lit(_sym(_EOW)),
        ),
    )
    s = F.array_join(word, _SW)
    for a, b in PINNED_MERGES:
        s = F.replace(
            s, F.lit(f"{_sym(a)} {_sym(b)}"), F.lit(_sym(a + b))
        )
    return s


def ddb_segment_symbol_string(text_expr: str = "text") -> str:
    """DuckDB twin of :func:`segment_symbol_string`, generated from the
    SAME merge table and sentinel constants. coalesce: DuckDB
    array_to_string([]) is NULL where Spark array_join([]) is ''."""
    from alt_spark.functions.text_analysis import DDB_TOKENS

    toks = DDB_TOKENS.replace("lower(text)", f"lower({text_expr})")
    c1, c2, c3 = "chr(1)", "chr(2)", "chr(3)"
    word = (
        f"list_transform({toks}, t -> "
        f"regexp_replace(t, '(.)', {c1} || '\\1' || {c2} || ' ', 'g')"
        f" || {c1} || '{_EOW}' || {c2})"
    )
    s = f"coalesce(array_to_string({word}, {c3}), '')"
    for a, b in PINNED_MERGES:
        pat = f"{c1} || '{a}' || {c2} || ' ' || {c1} || '{b}' || {c2}"
        rep = f"{c1} || '{a + b}' || {c2}"
        s = f"replace({s}, {pat}, {rep})"
    return s


def word_symbol_string(word: Column) -> Column:
    """Single-WORD twin of :func:`segment_symbol_string` (same sentinel
    rendering, same PINNED_MERGES replace chain) — for word-type-grain
    consumers (the tokenizer bake-off q106) where segmentation runs
    once per type instead of once per document."""
    s = F.concat(
        F.regexp_replace(word, "(.)", f"{_S1}$1{_S2} "),
        F.lit(_sym(_EOW)),
    )
    for a, b in PINNED_MERGES:
        s = F.replace(s, F.lit(f"{_sym(a)} {_sym(b)}"), F.lit(_sym(a + b)))
    return s


def ddb_word_symbol_string(word_expr: str) -> str:
    """DuckDB twin of :func:`word_symbol_string`."""
    c1, c2 = "chr(1)", "chr(2)"
    s = (
        f"regexp_replace({word_expr}, '(.)', {c1} || '\\1' || {c2} || ' ', 'g')"
        f" || {c1} || '{_EOW}' || {c2}"
    )
    for a, b in PINNED_MERGES:
        pat = f"{c1} || '{a}' || {c2} || ' ' || {c1} || '{b}' || {c2}"
        rep = f"{c1} || '{a + b}' || {c2}"
        s = f"replace({s}, {pat}, {rep})"
    return s
