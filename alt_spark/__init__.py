"""alt_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Kaikei-e/Alt (reference surveyed in
/root/repo/SURVEY.md).

Layout:
    session.py    SparkSession builder with the engine's tuned config profile
    catalog.py    explicit StructType schemas + loaders for the test tables
    queries/      declared query inventory (SURVEY.md §2.Q): relational core
                  Q01-Q16 (+ coverage Q34-Q38, SQL-surface ⊕ Q56-Q58), text
                  Q17/Q18/Q23/Q24, vectors Q19/Q25/Q26, events Q20-Q22 +
                  time-series Q42-Q44, LLM-pipeline Q27-Q33 (+ production
                  hash twins Q53-Q55), search Q39-Q41, graph/rouge/logs/
                  cleaning Q45-Q52 — each a (name -> Spark callable) plus,
                  where SQL-expressible, a (name -> DuckDB oracle SQL)
                  entry (54 of 58)
    operators/    dedup family (exact / MinHash-LSH / SimHash), ANN search
                  (brute-force / SRP-LSH / IVF), distributed global rank,
                  as-of join, bucketed range join, rollup cascade,
                  multimodal binary columns (real BMP/PNG/WAV kernels)
    functions/    text-analysis expressions (quality, lang-ID, token stats,
                  shuffle-free winnowing fingerprints), portable
                  Spark<->DuckDB hashing, cleaning/NFKC, ROUGE, LLM UDF
                  contracts
    plans/        physical-plan audit helpers (pushdown/broadcast/shuffle
                  assertions used by tests/test_plans.py)
    sources/      NDJSON log ETL (per-service parsers -> logs -> http_logs),
                  RSS/Atom (from_xml parser + pluggable format("rss")
                  batch/stream Python DataSource), OTLP spans, search-index
                  batch writer (format("searchindex"), two-phase commit)
    streaming/    incremental MVs (tumbling / sliding / session windows),
                  stream-stream interval joins (inner + left-outer,
                  source-watermarked), checkpointed event-fold projector
                  with dedup + DLQ, file-channel topic producer/consumer
                  groups, search-index sink, partition-aligned retention,
                  backfill/reprojection, stateful folds
                  (applyInPandasWithState + transformWithState twin)
"""

__version__ = "0.3.0"
