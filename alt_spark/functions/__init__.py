"""Column-level function library (SURVEY.md §2.H/I; north-star text
analysis).

- ``text_analysis`` — language-ID heuristic, quality scoring, token
  counting, rolling-hash fingerprinting. All pure built-in expressions
  (whole-stage codegen); no UDFs.
"""
