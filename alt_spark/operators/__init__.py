"""Operator library: reusable building blocks behind the declared queries
(SURVEY.md §2.I/J + the north-star LLM-pipeline ops).

- ``dedup``      — exact, MinHash+LSH banded, SimHash, n-gram Jaccard
                   near-dup (I8-I12); portable-hash mode for DuckDB-
                   replayable oracles.
- ``ann``        — vector similarity search: exact brute-force top-k,
                   SRP-LSH buckets, and IVF inverted lists (J8/J11).
- ``rank``       — distributed global rank/row_number (E1 at scale: no
                   single-partition sort).
- ``asof``       — as-of join via union+window (no pair blowup).
- ``rangejoin``  — proximity range join via tolerance-width cells.
- ``rollup``     — hypertable-style rollup cascade from mergeable
                   partials.
- ``multimodal`` — binary media columns with typed metadata; Arrow-batched
                   decode/extract plumbing (J11 ⊕).

Everything is DataFrame-native (built-in functions, no per-row Python)
except the multimodal decode kernels, which are mapInPandas by design.
"""
