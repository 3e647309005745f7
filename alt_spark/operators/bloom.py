"""Bloom-filter membership prefilter for n-gram decontamination.

The q62 decontamination rule joins corpus grams against the benchmark
gram SET — at eval-suite scale that set broadcasts fine, but a large
holdout registry (every eval suite + every customer-provided blocklist)
can reach hundreds of millions of grams, where a broadcast hash set no
longer fits. The standard production answer (reference analog: the
search-indexer's seen-URL prefilter; Bloom 1970) is a fixed-size bit
array: K salted hashes per gram set K bits; a probe answers "definitely
absent" or "maybe present" — no false negatives, tunable false-positive
rate (~(K·n/m)^K), and the structure is CONSTANT-SIZE regardless of the
benchmark's cardinality.

Spark shape:
- build: gram → K salted ``portable_hash60`` positions → 32-bit words
  (``bit_or`` per word, union-filled dense) → ONE row holding the whole
  bitmap as ``array<long>`` — broadcastable at a few hundred KB even
  for m = 2^24.
- probe: a pure in-row Column expression (``element_at`` by word index +
  mask test), so candidacy runs at scan speed with ZERO exchanges; only
  the candidates (true hits + the small FP tail) reach the exact verify
  join. At 100 TB that turns "join every corpus gram" into "join ~0.1%
  of corpus grams".

Packing uses 32 used bits per 64-bit long: every mask is ``2^b`` for
b in [0, 31], computed as ``cast(pow(2, b) as long)`` — exact in double
(< 2^53) and expressible with column-valued exponents, which the
``shiftleft`` builtin's Python signature is not. The md5-derived
positions make the structure bit-identical in DuckDB, so queries built
on it are fully oracle-checkable (see q122).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from alt_spark.functions.hashing import DDB_H60, portable_hash60

__all__ = [
    "bloom_bitmap",
    "bloom_hit",
    "ddb_bloom_words",
    "ddb_bloom_probe",
    "merge_bloom_bitmaps",
]

_WORD_BITS = 32  # used bits per array<long> entry (masks stay exact in double)


def _position(gram: Column, salt: str, m_bits: int) -> Column:
    return F.pmod(
        portable_hash60(F.concat(F.lit(salt + "|"), gram)), F.lit(m_bits)
    )


def bloom_bitmap(
    grams: DataFrame,
    gram_col: str = "g",
    m_bits: int = 1 << 17,
    salts: tuple[str, ...] = ("bf1", "bf2"),
) -> DataFrame:
    """ONE-row frame ``(bloom: array<long>)`` — the dense bitmap over
    the input gram column (m_bits bits, 32 per entry).

    The build is one bounded shuffle (the per-word ``bit_or``, map-side
    combinable, over at most ``K·|grams|`` rows); the union with an
    all-zero word range makes the array dense so probes are O(1)
    ``element_at`` lookups, never map scans.
    """
    if m_bits % _WORD_BITS:
        raise ValueError(f"m_bits must be a multiple of {_WORD_BITS}")
    n_words = m_bits // _WORD_BITS
    # No distinct on positions: bit_or is idempotent, so duplicate
    # positions fold for free inside the per-word aggregate — one
    # exchange instead of two. NULL grams are dropped up front: a NULL
    # position would survive the groupBy as a (NULL, NULL) word, sort
    # FIRST in the dense assembly, and shift every real word by one
    # slot — silent false negatives, the one failure the structure
    # must never have.
    pos = grams.filter(F.col(gram_col).isNotNull()).select(
        F.explode(
            F.array(*[_position(F.col(gram_col), s, m_bits) for s in salts])
        ).alias("pos")
    )
    sparse = pos.select(
        F.floor(F.col("pos") / _WORD_BITS).cast("long").alias("wi"),
        F.pow(F.lit(2.0), F.pmod(F.col("pos"), F.lit(_WORD_BITS)).cast("double"))
        .cast("long")
        .alias("w"),
    )
    dense = (
        grams.sparkSession.range(n_words)
        .select(F.col("id").alias("wi"), F.lit(0).cast("long").alias("w"))
        .unionByName(sparse)
        .groupBy("wi")
        .agg(F.bit_or("w").alias("w"))
    )
    # The frame carries its OWN (m_bits, salts) so a merge can verify
    # hash-family compatibility from the data, not a docstring contract:
    # two bitmaps of equal length but different salts would OR into a
    # structure that probes as misses for half the insertions — the
    # false-negative class the merge guard exists to prevent.
    return dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("wi", "w"))), lambda s: s["w"]
        ).alias("bloom")
    ).select(
        "bloom",
        F.lit(m_bits).alias("m_bits"),
        F.lit("|".join(salts)).alias("salts"),
    )


def bloom_hit(
    bitmap: Column,
    gram: Column,
    m_bits: int = 1 << 17,
    salts: tuple[str, ...] = ("bf1", "bf2"),
) -> Column:
    """Boolean probe: all K salted bits set (``maybe present``).

    Pure in-row expression — safe inside ``F.exists``/``F.transform``
    lambdas, so a whole document's gram array probes without leaving
    the scan projection.
    """
    cond = F.lit(True)
    for s in salts:
        p = _position(gram, s, m_bits)
        wi = F.floor(p / _WORD_BITS).cast("int")
        mask = (
            F.pow(F.lit(2.0), F.pmod(p, F.lit(_WORD_BITS)).cast("double"))
            .cast("long")
        )
        cond = cond & (F.element_at(bitmap, wi + 1).bitwiseAND(mask) != 0)
    return cond


def ddb_bloom_words(
    gram_set_sql: str, m_bits: int, salts: tuple[str, ...]
) -> str:
    """DuckDB CTE body: the sparse (wi, w) word table of the bitmap
    built over ``gram_set_sql`` (a query yielding one column ``g``) —
    bit-identical to :func:`bloom_bitmap`'s dense array entries."""
    pos_union = "\nUNION\n".join(
        f"SELECT {DDB_H60(repr(s + '|') + ' || g')} % {m_bits} AS pos"
        f" FROM ({gram_set_sql})"
        for s in salts
    )
    return (
        f"SELECT pos // {_WORD_BITS} AS wi,"
        f" bit_or(1::BIGINT << (pos % {_WORD_BITS})) AS w"
        f" FROM ({pos_union}) GROUP BY 1"
    )


def ddb_bloom_probe(
    gram_expr: str, m_bits: int, salts: tuple[str, ...], words_cte: str
) -> str:
    """DuckDB boolean expression: EXISTS word-lookups replaying
    :func:`bloom_hit` for ``gram_expr`` against ``words_cte``."""
    checks = []
    for s in salts:
        p = f"({DDB_H60(repr(s + '|') + ' || ' + gram_expr)} % {m_bits})"
        checks.append(
            f"EXISTS (SELECT 1 FROM {words_cte} w WHERE w.wi = {p} // {_WORD_BITS}"
            f" AND (w.w & (1::BIGINT << ({p} % {_WORD_BITS}))) <> 0)"
        )
    return "(" + " AND ".join(checks) + ")"


def merge_bloom_bitmaps(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR-merge two one-row bitmaps built with the SAME (m_bits, salts).

    Bloom filters are mergeable — union of insertions == bitwise OR of
    bitmaps — which is what makes the structure streamable and
    generation-partitionable. A Bloom filter cannot DELETE, so
    retention follows the generational pattern rather than
    index_maintenance's stamped-row compaction: keep one bitmap per
    batch window (physically ``partitionBy(batch)``), OR the in-horizon
    generations together at read time, and expire a window by dropping
    its partition — never by unsetting bits. Dropping a generation
    reproduces the freshly-built in-horizon filter BIT FOR BIT
    (pytest-pinned), the same compacted==full contract the stamped
    indexes carry.
    """
    return (
        a.select(
            F.col("bloom").alias("_a"),
            F.col("m_bits").alias("_am"),
            F.col("salts").alias("_as"),
        )
        .crossJoin(
            b.select(
                F.col("bloom").alias("_b"),
                F.col("m_bits").alias("_bm"),
                F.col("salts").alias("_bs"),
            )
        )
        .select(
            # Loud misuse guard: zip_with NULL-pads the shorter array,
            # so merging bitmaps of different m_bits would return NULL
            # words that probe as misses — false negatives; and equal-
            # size bitmaps built with DIFFERENT salts would OR into a
            # structure whose probes miss half the insertions — the
            # same false-negative class with no size symptom. Both are
            # checked against the metadata the frames carry (plus the
            # physical size as belt-and-braces) and raise instead (the
            # q110 strict-guard doctrine). The assert is FOLDED INTO
            # the kept column: a standalone guard column gets pruned
            # away by the optimizer and never evaluates.
            F.when(
                F.assert_true(
                    (F.col("_am") == F.col("_bm"))
                    & (F.col("_as") == F.col("_bs"))
                    & (F.size("_a") == F.size("_b")),
                    F.lit("merge_bloom_bitmaps: mismatched (m_bits, salts)"),
                ).isNull(),
                F.zip_with("_a", "_b", lambda x, y: x.bitwiseOR(y)),
            ).alias("bloom"),
            F.col("_am").alias("m_bits"),
            F.col("_as").alias("salts"),
        )
    )
