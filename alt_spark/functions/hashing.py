"""Portable 64-bit hashing: identical values in Spark and DuckDB.

The production hash for dedup/fingerprinting is ``xxhash64`` (JVM-side,
fastest; reference: recap-worker/recap-worker/src/pipeline/dedup.rs
:113-143 uses XXH3 the same way). xxhash64 has no DuckDB builtin, so
operators hashed with it can only get the driver's weaker rows-only
check. This module provides the *declared* alternative: the first 8
bytes of md5, interpreted as a signed 64-bit integer — both engines
compute it exactly (md5 is bytewise-identical everywhere), so MinHash /
SimHash / winnowing pipelines built on it are fully oracle-checkable.

The signed interpretation matters: every downstream comparison (MIN over
permuted values, ORDER BY, band equality) must order the same way in
both engines, so both map the unsigned 64-bit value u to
``u - 2^64 if u >= 2^63 else u`` and compare as signed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "portable_hash64",
    "portable_hash60",
    "DDB_U64",
    "DDB_H64",
    "DDB_H60",
    "ddb_signed",
    "ddb_affine_signed",
]

def portable_hash60(c: Column) -> Column:
    """Non-negative 60-bit hash of a string column: first 15 md5 hex
    chars through ONE ``conv``. The hex→long parse costs more than the
    md5 itself (measured at sf0.1: two-conv 64-bit form 5.2 s over the
    gram workload vs 2.9 s for this one), so per-gram hot paths that
    don't need all 64 bits — winnowing, whose sliding-min only needs a
    consistent total order — use this form. SimHash keeps the 64-bit
    variant (it consumes every bit of the fingerprint).
    """
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def DDB_H60(expr: str) -> str:
    """DuckDB: the exact twin of :func:`portable_hash60` — 60 bits never
    set the sign bit, so a plain BIGINT cast matches Spark's long."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def portable_hash64(c: Column) -> Column:
    """Signed 64-bit hash of a string column: first 16 md5 hex chars.

    Parsed as two 32-bit halves so everything stays in long arithmetic
    (each ``conv`` result fits a long); ``shiftleft(hi,32) | lo`` IS the
    signed two's-complement reinterpretation of the unsigned 64-bit
    value — no DECIMAL hop, no overflow edge.
    """
    md5 = F.md5(c)
    hi = F.conv(F.substring(md5, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(md5, 9, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def DDB_U64(expr: str) -> str:
    """DuckDB: unsigned 64-bit md5 prefix of a string expression."""
    return f"(('0x' || substr(md5({expr}), 1, 16))::UBIGINT)"


def ddb_signed(u_expr: str) -> str:
    """DuckDB: map an unsigned-64 expression to Spark's signed long."""
    return (
        f"(CASE WHEN {u_expr} >= 9223372036854775808::UBIGINT "
        f"THEN (({u_expr})::HUGEINT - 18446744073709551616::HUGEINT)::BIGINT "
        f"ELSE ({u_expr})::BIGINT END)"
    )


def DDB_H64(expr: str) -> str:
    """DuckDB: the signed 64-bit twin of :func:`portable_hash64`."""
    return ddb_signed(DDB_U64(expr))


def ddb_affine_signed(h_expr: str, a: int, b: int) -> str:
    """DuckDB: signed-64 result of Spark's wrapping ``h*a + b`` on longs.

    Spark long arithmetic wraps silently; its result is the mod-2^64
    residue reinterpreted as signed. HUGEINT does the math exactly, the
    double-% forces a non-negative residue, and the CASE re-signs it.
    """
    w = "18446744073709551616::HUGEINT"
    u = f"((( ({h_expr})::HUGEINT * {a}::HUGEINT + {b}::HUGEINT ) % {w} + {w}) % {w})"
    return (
        f"(CASE WHEN {u} >= 9223372036854775808::HUGEINT "
        f"THEN ({u} - 18446744073709551616::HUGEINT)::BIGINT "
        f"ELSE ({u})::BIGINT END)"
    )
