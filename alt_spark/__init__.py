"""alt_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Kaikei-e/Alt (reference surveyed in
/root/repo/SURVEY.md).

Layout:
    session.py    SparkSession builder with the engine's tuned config profile
    catalog.py    explicit StructType schemas + loaders for the test tables
    queries/      declared query inventory (SURVEY.md §2.Q) — registry of
                  (name -> Spark callable, name -> DuckDB oracle SQL)
    operators/    reusable operator library (dedup, similarity, text, keyset,
                  RRF, sessionization, fold)
    functions/    scalar expression helpers (decay score, BM25, cosine)
    streaming/    Structured Streaming ports of the reference's MVs and the
                  event-fold projector
"""

__version__ = "0.1.0"
