"""`df.write.format("searchindex")` — the search-index upsert sink as a
pluggable batch writer (SURVEY.md §2.A8 ⊕, Spark 4 Python DataSource).

The streaming path (`streaming/index_sink.py`) merges micro-batches via
foreachBatch; this is the batch twin for backfills
(search-indexer/app/usecase/index_articles.go:69-94 — the keyset-
paginated reindex job), shaped by the writer API's two-phase commit:

- executors STAGE: each `write(partition)` lands its ops as one parquet
  staging file and returns the path in its commit message — durable
  before acknowledgment, the A8 "ACK after durable write" rule;
- the driver COMMITS: only when every partition reports success does
  `commit()` apply all staged ops (last-writer-wins by op_seq) over the
  latest snapshot and publish version v{n+1}; `abort()` discards the
  staging dir, leaving the last committed snapshot untouched.

The driver-side merge is pyarrow over the snapshot — the Meilisearch-
client analog (the reference funnels upserts through one client too);
the distributed merge path for huge indexes remains the foreachBatch
sink. Rows must carry (op_seq long, doc_key string, title string,
is_delete boolean); the snapshot holds (doc_key, title).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage

__all__ = ["SearchIndexDataSource", "read_index_snapshot"]


class _Staged(WriterCommitMessage):
    def __init__(self, path: str):
        self.path = path


def _latest_version(index_dir: str) -> tuple[int, str | None]:
    if not os.path.isdir(index_dir):
        return -1, None
    versions = sorted(
        (int(d[1:]), os.path.join(index_dir, d))
        for d in os.listdir(index_dir)
        if d.startswith("v") and d[1:].isdigit()
    )
    return versions[-1] if versions else (-1, None)


def read_index_snapshot(index_dir: str):
    """Latest committed snapshot as a pyarrow table (None if empty)."""
    import pyarrow.parquet as pq

    _, path = _latest_version(index_dir)
    return pq.read_table(path) if path else None


class SearchIndexWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("searchindex writer requires a path")
        self.overwrite = overwrite
        self.staging = os.path.join(self.path, f"_staging_{uuid.uuid4().hex[:8]}")

    def write(self, iterator):
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = [
            (r["op_seq"], r["doc_key"], r["title"], bool(r["is_delete"]))
            for r in iterator
        ]
        os.makedirs(self.staging, exist_ok=True)
        out = os.path.join(self.staging, f"part_{uuid.uuid4().hex[:8]}.parquet")
        pq.write_table(
            pa.table(
                {
                    "op_seq": pa.array([r[0] for r in rows], pa.int64()),
                    "doc_key": pa.array([r[1] for r in rows], pa.string()),
                    "title": pa.array([r[2] for r in rows], pa.string()),
                    "is_delete": pa.array([r[3] for r in rows], pa.bool_()),
                }
            ),
            out,
        )
        return _Staged(out)

    def commit(self, messages):
        import pyarrow as pa
        import pyarrow.parquet as pq

        staged = [pq.read_table(m.path) for m in messages if m is not None]
        # last-writer-wins per key by op_seq; zero-op commit (an empty
        # frame still schedules write tasks on some plans) publishes
        # nothing — the previous snapshot stays latest, a no-op version
        # rather than a concat_tables([]) crash (ADVICE r4).
        latest: dict[str, tuple[int, str | None, bool]] = {}
        if staged:
            ops = pa.concat_tables(staged)
            for seq, key, title, dele in zip(
                ops["op_seq"].to_pylist(),
                ops["doc_key"].to_pylist(),
                ops["title"].to_pylist(),
                ops["is_delete"].to_pylist(),
            ):
                if key not in latest or seq > latest[key][0]:
                    latest[key] = (seq, title, dele)
        if not latest and not self.overwrite:
            shutil.rmtree(self.staging, ignore_errors=True)
            return
        prev_version, _ = _latest_version(self.path)
        snapshot: dict[str, str] = {}
        if not self.overwrite:
            prev = read_index_snapshot(self.path)
            if prev is not None:
                snapshot = dict(
                    zip(prev["doc_key"].to_pylist(), prev["title"].to_pylist())
                )
        for key, (_, title, dele) in latest.items():
            if dele:
                snapshot.pop(key, None)
            else:
                snapshot[key] = title
        # Publish atomically: build the snapshot inside the staging dir,
        # then a single os.rename into place — a concurrent
        # read_index_snapshot can never select a half-written version
        # (rename is atomic within one filesystem; ADVICE r4).
        keys = sorted(snapshot)
        build = os.path.join(self.staging, f"_v{prev_version + 1}")
        os.makedirs(build, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "doc_key": pa.array(keys, pa.string()),
                    "title": pa.array([snapshot[k] for k in keys], pa.string()),
                }
            ),
            os.path.join(build, "index.parquet"),
        )
        os.makedirs(self.path, exist_ok=True)
        try:
            os.rename(build, os.path.join(self.path, f"v{prev_version + 1}"))
        except OSError as exc:
            # A concurrent committer published v{N+1} first. Surface a
            # clear conflict instead of ENOTEMPTY — last-committer-wins
            # would silently drop this job's ops — and always clean the
            # staging dir so the failed commit leaves no residue.
            shutil.rmtree(self.staging, ignore_errors=True)
            raise RuntimeError(
                f"searchindex version conflict: v{prev_version + 1} was "
                "published concurrently; re-run the write against the "
                "new snapshot"
            ) from exc
        shutil.rmtree(self.staging, ignore_errors=True)

    def abort(self, messages):
        shutil.rmtree(self.staging, ignore_errors=True)


class SearchIndexDataSource(DataSource):
    """Register with `spark.dataSource.register(SearchIndexDataSource)`."""

    @classmethod
    def name(cls):
        return "searchindex"

    def writer(self, schema, overwrite: bool):
        return SearchIndexWriter(self.options, overwrite)
