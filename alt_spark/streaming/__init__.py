"""Structured Streaming layer (SURVEY.md §2.K, Phase 4).

Modules:

- ``mv``        — incremental materialized views: the reference's
                  insert-time ClickHouse MVs re-expressed as streaming
                  aggregations (D9, K8).
- ``projector`` — checkpointed event-fold projector: ordered replay →
                  merge-safe upsert of a per-user projection, with
                  dedupe-key drop, DLQ side output and versioned state
                  (K1, K2, K3, K5, D12).
- ``retention`` — partition-aligned TTL drop (K6).

No Kafka/Delta in this environment: streams replay from file sources
(the driver's parquet tables chunked into a landing dir) and state lands
in versioned parquet — the same shapes apply unchanged to a Kafka source
and a Delta MERGE sink on a real cluster.
"""
