"""Operator library: reusable building blocks behind the declared queries
(SURVEY.md §2.I/J + the north-star LLM-pipeline ops).

- ``dedup``      — exact, MinHash+LSH banded, SimHash, n-gram Jaccard
                   near-dup (I8-I12).
- ``ann``        — vector similarity search: exact brute-force top-k and
                   LSH-bucketed candidates (J8/J11).
- ``multimodal`` — binary media columns with typed metadata; Arrow-batched
                   decode/extract plumbing (J11 ⊕).

Everything is DataFrame-native (built-in functions, no per-row Python)
except the multimodal decode kernels, which are mapInPandas by design.
"""
