"""ROUGE-1 / ROUGE-L evaluation (SURVEY.md §2 I15).

Reference: recap-worker/recap-worker/src/evaluation/rouge.rs:20-120 —
candidate-vs-reference precision/recall/F1, accumulated per genre for
golden-run scoring (evaluation/golden.rs:103-170).

ROUGE-1 is pure column expressions (clipped unigram-multiset overlap —
per-row work, no shuffle, codegen'd). ROUGE-L needs an LCS dynamic
program, which is exactly the §2.L scalar-UDF surface: a vectorized
pandas_udf receiving Arrow batches of token arrays.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = ["rouge_1", "rouge_l_f1"]


def _clipped_overlap(cand: Column, ref: Column) -> Column:
    """Sum over distinct candidate tokens of min(count_in_cand, count_in_ref)."""
    return F.aggregate(
        F.array_distinct(cand),
        F.lit(0),
        lambda acc, t: acc
        + F.least(
            F.size(F.filter(cand, lambda x: x == t)),
            F.size(F.filter(ref, lambda x: x == t)),
        ),
    )


def rouge_1(cand: Column, ref: Column) -> Column:
    """struct(precision, recall, f1) of ROUGE-1 over two token arrays."""
    overlap = _clipped_overlap(cand, ref).cast("double")
    p = overlap / F.greatest(F.size(cand), F.lit(1))
    r = overlap / F.greatest(F.size(ref), F.lit(1))
    f1 = F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))
    return F.struct(p.alias("precision"), r.alias("recall"), f1.alias("f1"))


def _lcs_f1_impl(cand: pd.Series, ref: pd.Series) -> pd.Series:
    """ROUGE-L F1 via LCS length (classic O(m·n) DP per row, Arrow-batched)."""

    def lcs(a: list, b: list) -> int:
        if not a or not b:
            return 0
        prev = [0] * (len(b) + 1)
        for x in a:
            cur = [0]
            for j, y in enumerate(b, 1):
                cur.append(prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1]))
            prev = cur
        return prev[-1]

    out = []
    for a, b in zip(cand, ref):
        a = list(a) if a is not None else []
        b = list(b) if b is not None else []
        ll = lcs(a, b)
        p = ll / len(a) if a else 0.0
        r = ll / len(b) if b else 0.0
        out.append(2 * p * r / (p + r) if p + r > 0 else 0.0)
    return pd.Series(out)


def rouge_l_f1(cand: Column, ref: Column) -> Column:
    """ROUGE-L F1 over two token-array columns (pandas UDF, Arrow batches).

    The UDF wraps lazily — type parsing at decoration time would require
    an active session at import.
    """
    return pandas_udf(_lcs_f1_impl, "double")(cand, ref)
