"""alt_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Kaikei-e/Alt (reference surveyed in
/root/repo/SURVEY.md).

Layout:
    session.py    SparkSession builder with the engine's tuned config profile
    catalog.py    explicit StructType schemas + loaders for the test tables
    queries/      declared query inventory (SURVEY.md §2.Q): relational core
                  Q01-Q16 (+ coverage Q34-Q38), text Q17/Q18/Q23/Q24, vectors
                  Q19/Q25/Q26, events Q20-Q22 + time-series Q42-Q44,
                  LLM-pipeline Q27-Q33, search Q39-Q41 — each a
                  (name -> Spark callable) plus, where SQL-expressible, a
                  (name -> DuckDB oracle SQL) entry (43 of 44)
    operators/    dedup family (exact / MinHash-LSH / SimHash), ANN search
                  (brute-force / SRP-LSH / IVF), distributed global rank,
                  as-of join, bucketed range join, rollup cascade,
                  multimodal binary-column plumbing
    functions/    text-analysis expressions (quality, lang-ID, token stats,
                  winnowing fingerprints), portable Spark<->DuckDB hashing
    plans/        physical-plan audit helpers (pushdown/broadcast/shuffle
                  assertions used by tests/test_plans.py)
    sources/      NDJSON log ETL (per-service parsers -> logs -> http_logs)
    streaming/    incremental MVs, checkpointed event-fold projector with
                  dedup + DLQ, partition-aligned retention
"""

__version__ = "0.2.0"
