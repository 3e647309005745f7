"""Planted-row oracle helper: the ONE generator for deterministic
literal corpus extensions (the q29/q63/q75 device — negative-id rows
unioned onto the synthetic corpus so a gate the corpus cannot exercise
is still value-checked in both engines).

The quoting rule (single-quote doubling, the ``(id, 'text')`` VALUES
shape, the ``AS extra(cols)`` alias) lives only here: an escaping fix
lands once instead of drifting across per-query copies (review
finding, r7)."""

from __future__ import annotations


def values_sql(rows: tuple[tuple[int, str], ...], cols: str = "doc_id, text") -> str:
    """DuckDB VALUES clause for planted ``(id, text)`` rows, aliased
    ``extra(cols)`` — splice into an oracle's UNION ALL arm."""
    body = ", ".join(
        "({}, '{}')".format(i, t.replace("'", "''")) for i, t in rows
    )
    return f"(VALUES {body}) AS extra({cols})"
