"""Sources: ETL fronts that land external data as engine tables
(SURVEY.md §2.A).

- ``ndjson_logs`` — Docker-tail NDJSON → `logs` → `http_logs` (A2/A3 +
  the B3/B4/B5 MV port). Batch and streaming readers share one parse
  plan.
"""
