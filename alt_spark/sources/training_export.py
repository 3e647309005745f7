"""Training-corpus export sink: sharded parquet + audited manifest,
published atomically as an immutable version (SURVEY.md §2.A ⊕).

The last step of the training-data pipeline (mix → gate → dedup → chunk
→ pack → shard → EXPORT): materialize the prepared corpus where a
training job's data loader reads it. The reference's closest surface is
the two-phase search-index publish (search-indexer
app/usecase/index_articles.go:69-94); this sink keeps that ACK-after-
durable-write / atomic-version contract but writes through Spark's
native parquet path, because a 100 TB export must be written by the
executors — never funneled through a driver-side client.

Design:

- **Stage distributed.** ``df.repartition(shard_col).write.partitionBy
  (shard_col)`` into a hidden staging dir: each shard's rows are
  co-located by the hash exchange, so a shard is one parquet file — the
  unit a data-loader worker claims. All parallelism is Spark's own.
- **Manifest from the staged bytes.** Per-shard row counts, token sums
  and an order-insensitive content fingerprint (sum of xxhash64 over
  the content columns) are aggregated by READING BACK the staged files
  — the manifest certifies what readers will actually read, catching a
  lost or truncated part file, not merely what the writer intended to
  write. One column-pruned pass over the staged output; bounded result
  (one row per shard).
- **Publish atomically.** manifest.json lands inside the staging dir,
  then a single ``os.rename`` moves it to ``v{n+1}`` — a concurrent
  reader can never observe a half-written version, and a concurrent
  exporter surfaces a version conflict instead of silently clobbering
  (the index-writer contract). Published versions are immutable:
  training runs pin a version and stay reproducible while the next
  export builds.
- **Incremental re-export.** With ``incremental=True`` a daily run
  rewrites only the shards whose content fingerprint changed against
  the previous version; unchanged shard files are hard-linked into the
  new version (copy fallback), so the write cost is proportional to
  the CHANGED data — the export-side sibling of the incremental dedup /
  connected-components indexes. Versions stay self-contained and
  immutable either way: a reader of v{n} never follows a pointer into
  v{n-1} (hard links share bytes, not paths).
"""

from __future__ import annotations

import errno
import json
import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "export_packed_corpus",
    "latest_export_version",
    "read_export_manifest",
    "read_export",
    "verify_export",
    "diff_exports",
    "gc_exports",
    "committed_export_versions",
]

_MANIFEST = "manifest.json"


def latest_export_version(out_dir: str) -> tuple[int, str | None]:
    """(version, path) of the newest committed export; (-1, None) if
    none. Staging dirs (``_staging_*``) are never selected. One probe
    implementation for both versioned sinks — a fix to the version
    semantics cannot drift between them."""
    from alt_spark.sources.index_writer import _latest_version

    return _latest_version(out_dir)


def read_export_manifest(out_dir: str, version: int | None = None) -> dict:
    """The manifest of a committed version (latest by default)."""
    if version is None:
        version, path = latest_export_version(out_dir)
    else:
        path = os.path.join(out_dir, f"v{version}")
    if version < 0 or path is None or not os.path.isdir(path):
        raise FileNotFoundError(f"no committed export under {out_dir}")
    with open(os.path.join(path, _MANIFEST)) as fh:
        return json.load(fh)


def read_export(
    spark: SparkSession, out_dir: str, version: int | None = None
) -> DataFrame:
    """The data of a committed version (latest by default) — what a
    training job's loader reads, shard column restored by partition
    discovery."""
    from pyspark.sql.types import StructType

    manifest = read_export_manifest(out_dir, version)
    # The manifest carries the writer's schema: an empty version (zero
    # part files) is still readable, and readers never depend on
    # inference agreeing with what was exported.
    return spark.read.schema(
        StructType.fromJson(manifest["schema"])
    ).parquet(os.path.join(out_dir, f"v{manifest['version']}", "data"))


def _shard_stats(
    df: DataFrame, shard_col: str, token_col: str | None
) -> list[dict]:
    """Per-shard (n_rows, content_hash[, token_sum]) rows, sorted by
    shard. The content hash is the int64-wrapping sum of xxhash64 over
    every non-shard column — order-insensitive, so it is stable under
    any task layout, and disagreeing the moment any row is lost,
    duplicated, or altered."""
    content_cols = [c for c in df.columns if c != shard_col]
    aggs = [
        F.count("*").alias("n_rows"),
        F.sum(F.xxhash64(*content_cols)).alias("content_hash"),
        # coalesce: an all-NULL token group sums to NULL, which would
        # crash the int() in _entry after the staging write already ran.
    ]
    if token_col is not None:
        aggs.append(
            F.coalesce(
                F.sum(F.col(token_col).cast("long")), F.lit(0).cast("long")
            ).alias("token_sum")
        )
    rows = sorted(
        (r.asDict() for r in df.groupBy(shard_col).agg(*aggs).collect()),
        key=lambda r: str(r[shard_col]),
    )
    for r in rows:
        _check_shard_value(r[shard_col])
    return rows


_SHARD_VALUE_RE = re.compile(r"^[A-Za-z0-9._-]+$")


def _check_shard_value(v) -> None:
    """Exportable shard values are non-NULL ints or path-plain strings.

    NULL shards (e.g. shuffle_shards' NULL-id propagation) are an
    upstream bug surfaced here, not silently exported: NULL breaks both
    the incremental change-set filter (``isin([None])`` matches nothing
    — SQL NULL semantics) and the reuse-link path (Spark writes NULL as
    ``__HIVE_DEFAULT_PARTITION__``). Strings needing Hive partition-path
    escaping (':', '%', '=', ...) would make the manifest key, the JSON
    encoding, and the on-disk dir name three different spellings of one
    shard — rejected for the same one-name-everywhere reason."""
    if v is None:
        raise ValueError(
            "NULL shard value: assign or filter NULL-shard rows before "
            "export (a NULL id upstream propagates to a NULL shard)"
        )
    if isinstance(v, bool) or not isinstance(v, (int, str)):
        raise ValueError(
            f"shard values must be int or string, got {type(v).__name__}"
        )
    if isinstance(v, str) and not _SHARD_VALUE_RE.match(v):
        raise ValueError(
            f"shard value {v!r} needs partition-path escaping; use "
            "values matching [A-Za-z0-9._-]+"
        )


def _entry(r: dict, shard_col: str, token_col: str | None) -> dict:
    e = {
        "shard": r[shard_col],
        "n_rows": int(r["n_rows"]),
        "content_hash": int(r["content_hash"]),
    }
    if token_col is not None:
        e["token_sum"] = int(r["token_sum"])
    return e


def _content_key(e: dict, with_tokens: bool) -> tuple:
    """The CONTENT identity of a shard entry — what change-set and
    verification comparisons look at. Deliberately excludes ``shard``
    (the dict key), ``order`` (physical layout, not content: a reused
    hard-linked shard keeps its writing version's layout without being
    "changed"), and ``token_sum`` unless BOTH sides carry token
    accounting (a version exported with token_col next to one without
    must not read as total churn when the bytes are identical)."""
    key: tuple = (int(e["n_rows"]), int(e["content_hash"]))
    if with_tokens:
        key += (int(e["token_sum"]),)
    return key


def verify_export(
    spark: SparkSession,
    out_dir: str,
    version: int | None = None,
    shards: list | None = None,
) -> dict:
    """Re-certify a committed version FROM ITS DATA FILES: recompute
    per-shard (n_rows, content_hash[, token_sum]) and diff against the
    manifest. Returns the manifest on success; raises RuntimeError
    naming the disagreeing shards.

    The write-time manifest certifies what was staged; this is the
    READ-side check a training job (or the incremental exporter, below)
    runs before trusting a version it did not just write — bit-rot, a
    partial restore, or manual tampering all surface here instead of
    silently feeding a training run.

    ``shards`` restricts verification to a subset (manifest-typed shard
    values): the partitioned layout prunes the scan to exactly those
    directories, so verifying k shards costs k shards of read — the
    shape that lets the incremental exporter re-certify only what it is
    about to reuse.
    """
    manifest = read_export_manifest(out_dir, version)
    shard_col = manifest["shard_col"]
    token_col = manifest.get("token_col")
    # Compare CONTENT keys, not raw entry dicts: manifest entries carry
    # layout metadata (per-shard ``order``) that recomputed stats never
    # have and that verification must not be sensitive to.
    want = {str(e["shard"]): e for e in manifest["shards"]}
    df = read_export(spark, out_dir, manifest["version"])
    if shards is not None:
        keys = sorted({str(s) for s in shards})
        unknown = [k for k in keys if k not in want]
        if unknown:
            raise ValueError(
                f"shards {unknown!r} not in the v{manifest['version']} manifest"
            )
        vals = [want[k]["shard"] for k in keys]
        df = df.filter(F.col(shard_col).isin(vals))
        want = {k: want[k] for k in keys}
    got = {
        str(r[shard_col]): _entry(r, shard_col, token_col)
        for r in _shard_stats(df, shard_col, token_col)
    }
    tok = token_col is not None
    if set(got) != set(want) or any(
        _content_key(got[k], tok) != _content_key(want[k], tok) for k in want
    ):
        bad = sorted(
            (set(got) ^ set(want))
            | {
                k
                for k in set(want) & set(got)
                if _content_key(got[k], tok) != _content_key(want[k], tok)
            }
        )
        raise RuntimeError(
            f"export v{manifest['version']} fails verification for shards "
            f"{bad!r}: data files disagree with the manifest"
        )
    return manifest


def diff_exports(out_dir: str, v_old: int, v_new: int) -> dict:
    """Manifest-only diff between two committed versions: which shards
    were added / removed / changed (content fingerprint, row count, or
    token sum), plus corpus-level row/token deltas.

    This is the release-note a data team publishes next to a new
    corpus version, and the pre-flight a training job runs before
    switching versions ("what exactly moved?"). It reads two JSON
    manifests and NOTHING else — at 100 TB the answer costs two file
    reads, which is the point of certifying shard stats at write time.
    Shard values are reported manifest-typed (an int-sharded export
    diffs as ints, never str-ified — the reused_shards lesson)."""
    mo = read_export_manifest(out_dir, v_old)
    mn = read_export_manifest(out_dir, v_new)
    if mo["shard_col"] != mn["shard_col"]:
        raise ValueError(
            f"shard columns differ: v{v_old} partitioned by "
            f"{mo['shard_col']!r}, v{v_new} by {mn['shard_col']!r} — "
            "a shard-level diff is meaningless across layouts"
        )
    so = {str(e["shard"]): e for e in mo["shards"]}
    sn = {str(e["shard"]): e for e in mn["shards"]}
    # Content keys only: token_sum participates only when BOTH versions
    # carry token accounting (an export with token_col diffed against a
    # byte-identical one without must read as unchanged, not total
    # churn), and per-shard ``order`` (layout, not content) never does.
    tok = mo.get("token_col") is not None and mn.get("token_col") is not None
    changed = {
        k
        for k in so.keys() & sn.keys()
        if _content_key(so[k], tok) != _content_key(sn[k], tok)
    }
    out = {
        "from_version": mo["version"],
        "to_version": mn["version"],
        "shard_col": mn["shard_col"],
        "added": [sn[k]["shard"] for k in sorted(sn.keys() - so.keys())],
        "removed": [so[k]["shard"] for k in sorted(so.keys() - sn.keys())],
        "changed": [sn[k]["shard"] for k in sorted(changed)],
        "unchanged": [
            sn[k]["shard"]
            for k in sorted((so.keys() & sn.keys()) - changed)
        ],
        "row_delta": int(mn["n_rows"]) - int(mo["n_rows"]),
    }
    if "token_sum" in mo and "token_sum" in mn:
        out["token_delta"] = int(mn["token_sum"]) - int(mo["token_sum"])
    return out


_VDIR_RE = re.compile(r"^v(\d+)$")


def committed_export_versions(out_dir: str) -> list[int]:
    """Sorted version numbers of every COMMITTED export under
    ``out_dir`` (a version is committed iff its manifest exists —
    staging dirs are ``_staging_*`` and never match)."""
    if not os.path.isdir(out_dir):
        return []
    out = []
    for name in os.listdir(out_dir):
        m = _VDIR_RE.match(name)
        if m and os.path.isfile(os.path.join(out_dir, name, _MANIFEST)):
            out.append(int(m.group(1)))
    return sorted(out)


def gc_exports(out_dir: str, keep_last: int = 2, dry_run: bool = False) -> dict:
    """Retention for the version chain: delete committed versions older
    than the newest ``keep_last``. Returns ``{"removed": [...],
    "kept": [...]}`` (version numbers; with ``dry_run`` nothing is
    deleted and "removed" lists what WOULD go).

    Safe against the incremental sink BY CONSTRUCTION: reused shards
    are hard links, which share bytes but not directory entries — a
    kept version owns its own links, so unlinking any older version
    can never invalidate a kept one (the filesystem frees a shard's
    bytes only when its last version is gone). Staging dirs of an
    in-flight export live under ``_staging_*`` and are never touched.

    ``keep_last`` must be >= 1: the newest version is never collected
    (a training job may be pinned to it, and the incremental exporter
    diffs against it)."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (never collect the newest)")
    versions = committed_export_versions(out_dir)
    kept = versions[-keep_last:]
    doomed = versions[: -keep_last] if keep_last < len(versions) else []
    if not dry_run:
        for v in doomed:
            shutil.rmtree(os.path.join(out_dir, f"v{v}"))
    return {"removed": doomed, "kept": kept}


def _stage_frame(
    df: DataFrame, shard_col: str, order: tuple[str, ...]
) -> DataFrame:
    """The staging layout: one hash exchange on the shard key
    co-locates each shard into a single task (partitionBy then emits
    one file per shard). With ``order`` non-empty the task's rows are
    additionally sorted by (shard, *order) BEFORE the write, so every
    shard file carries rows in that order — at 100 TB this is the
    data-layout lever: parquet page/row-group min-max statistics on
    the order columns become selective, so a downstream filtered read
    prunes instead of scanning, and ordered loaders (curriculum
    schedules keyed on a quality score) read sequentially. Content
    fingerprints are order-insensitive, so layout choice never
    perturbs the incremental change-set decision."""
    out = df.repartition(F.col(shard_col))
    if order:
        out = out.sortWithinPartitions(shard_col, *order)
    return out


def _link_shard_dir(src: str, dst: str) -> None:
    """Hard-link every file of a committed shard dir into the staging
    layout (same filesystem by construction — staging lives beside the
    versions); copy is the cross-device fallback."""
    os.makedirs(dst, exist_ok=True)
    for name in os.listdir(src):
        s, d = os.path.join(src, name), os.path.join(dst, name)
        try:
            os.link(s, d)
        except OSError:
            shutil.copy2(s, d)


def export_packed_corpus(
    df: DataFrame,
    out_dir: str,
    shard_col: str = "shard",
    token_col: str | None = None,
    incremental: bool = False,
    verify_reused: bool = True,
    order_within_shard: tuple[str, ...] = (),
) -> dict:
    """Export a prepared corpus as one immutable sharded version and
    return its manifest.

    ``df`` is the pipeline output (e.g. q68's shuffle-sharded rows or
    q61's packed bins relabeled as shards); ``shard_col`` names the
    shard assignment, ``token_col`` (optional) a per-row token count to
    account in the manifest. ``order_within_shard`` (optional) sorts
    each shard file's rows by the named columns at write time — the
    parquet min-max / sequential-read layout lever (see
    :func:`_stage_frame`). The layout actually carried by each shard's
    files is recorded PER SHARD (entry field ``order``): newly written
    shards record this call's ordering, hard-linked reused shards
    inherit the ordering of the version that wrote their files — the
    newest manifest is self-contained even after :func:`gc_exports`
    removes the writing version's own manifest.

    Returns the committed manifest::

        {"version": N, "shard_col": ..., "token_col": ...,
         "schema": <Spark schema json>,
         "n_shards": ..., "n_rows": ...,
         "token_sum": ...,           # absent when token_col is None
         "reused_shards": [...],     # incremental runs only, manifest-typed
         "order_within_shard": [...],  # this call's argument (new shards)
         "shards": [{"shard": ..., "n_rows": ..., "content_hash": ...,
                     "token_sum": ..., "order": [...]}, ...]}

    Full export (``incremental=False``): stage everything, aggregate
    the manifest from the staged bytes, publish.

    Incremental (``incremental=True``, requires a previous version with
    the same schema and shard column — raises ValueError otherwise):
    one bounded aggregation over the input computes per-shard stats;
    shards whose stats equal the previous manifest are hard-linked from
    the previous version (write cost ∝ changed data), the rest are
    staged and then re-aggregated FROM the staged bytes, which must
    reproduce the input stats (a write fault fails the export instead
    of publishing a manifest that lies). Shards absent from the input
    are dropped from the new version. With ``verify_reused`` (default),
    the shards about to be hard-linked are first re-certified from the
    PREVIOUS version's data files (:func:`verify_export`) — a corrupted
    old shard fails the export instead of being silently propagated
    into the new version. The cost is one pruned read pass over the
    reused shards (reads, not writes — incrementality's write savings
    stand); disable only when the previous version was itself just
    verified.

    An empty frame publishes an empty version (n_rows 0, no shards) —
    an auditable "this run exported nothing", not a silent no-op.
    Raises RuntimeError on a concurrent-publish conflict; the staging
    dir is always cleaned up, win or lose. The published version number
    is pinned at the INITIAL probe (prev latest + 1), so a competing
    publish that lands between probe and rename collides loudly on the
    rename — an incremental diff can never be silently absorbed against
    a base that is no longer the latest.
    """
    if shard_col not in df.columns:
        raise ValueError(f"shard column {shard_col!r} not in {df.columns}")
    missing_order = [c for c in order_within_shard if c not in df.columns]
    if missing_order:
        raise ValueError(
            f"order_within_shard columns {missing_order!r} not in {df.columns}"
        )
    if token_col is not None and token_col not in df.columns:
        raise ValueError(f"token column {token_col!r} not in {df.columns}")
    spark = df.sparkSession
    os.makedirs(out_dir, exist_ok=True)

    # Pin the target version NOW: deciding it immediately before the
    # rename would silently absorb a competitor that committed while
    # this export ran (the r6 ADVICE finding) — an incremental diff
    # would publish against a base that is no longer the latest. Pinned,
    # the competitor's v{version} makes our rename collide and raise.
    prev_version, prev_path = latest_export_version(out_dir)
    version = prev_version + 1

    prev_manifest: dict | None = None
    if incremental:
        if prev_version < 0 or prev_path is None:
            raise ValueError(
                "incremental export requires a previously committed "
                f"version under {out_dir}"
            )
        prev_manifest = read_export_manifest(out_dir, prev_version)
        if prev_manifest["schema"] != df.schema.jsonValue() or (
            prev_manifest["shard_col"] != shard_col
        ):
            raise ValueError(
                "incremental export requires the previous version's "
                "schema and shard column; run a full export instead"
            )

    staging = os.path.join(out_dir, f"_staging_{uuid.uuid4().hex[:8]}")
    data_dir = os.path.join(staging, "data")
    try:
        reused: list = []
        if prev_manifest is None:
            # Full export: stage everything (one hash exchange on the
            # shard key co-locates each shard into a single task, so
            # partitionBy emits one file per shard — durable before
            # anything is published), then certify from the staged
            # bytes. The explicit schema keeps an all-empty stage
            # readable — zero part files infer nothing.
            _stage_frame(df, shard_col, order_within_shard).write.mode(
                "error"
            ).partitionBy(shard_col).parquet(data_dir)
            staged = spark.read.schema(df.schema).parquet(data_dir)
            per_shard = _shard_stats(staged, shard_col, token_col)
            entries = [_entry(r, shard_col, token_col) for r in per_shard]
            for e in entries:
                e["order"] = list(order_within_shard)
        else:
            # Incremental: the input lineage is consumed twice (the
            # stats pass deciding the change set, then the filtered
            # staging write) — persist for the span so a deep pipeline
            # DAG is computed once and, just as important, the staged
            # bytes come from the SAME materialization the change-set
            # stats saw (any nondeterministic lineage would otherwise
            # legitimately fail the certify step). Callers at a scale
            # where MEMORY_AND_DISK caching of the pipeline output is
            # unacceptable should pre-materialize df themselves.
            df = df.persist()
            # Bounded stats pass over the input decides the change set.
            want = {
                str(r[shard_col]): _entry(r, shard_col, token_col)
                for r in _shard_stats(df, shard_col, token_col)
            }
            prev_entries = {
                str(e["shard"]): e for e in prev_manifest["shards"]
            }
            # Content comparison (not raw dict equality): prev entries
            # carry layout metadata (``order``) the fresh stats lack,
            # and token accounting participates only when both versions
            # have it — raw != would mark every shard changed.
            tok_cmp = (
                token_col is not None
                and prev_manifest.get("token_col") is not None
            )
            changed = sorted(
                k
                for k, e in want.items()
                if k not in prev_entries
                or _content_key(prev_entries[k], tok_cmp)
                != _content_key(e, tok_cmp)
            )
            reused = sorted(set(want) - set(changed))
            if changed:
                changed_vals = [
                    want[k]["shard"] for k in changed
                ]  # original-typed values for the filter
                _stage_frame(
                    df.filter(F.col(shard_col).isin(changed_vals)),
                    shard_col,
                    order_within_shard,
                ).write.mode("error").partitionBy(shard_col).parquet(
                    data_dir
                )
                # Certify the changed shards from the staged bytes: the
                # read-back must reproduce the input stats exactly.
                staged = spark.read.schema(df.schema).parquet(data_dir)
                got = {
                    str(r[shard_col]): _entry(r, shard_col, token_col)
                    for r in _shard_stats(staged, shard_col, token_col)
                }
                if got != {k: want[k] for k in changed}:
                    bad = sorted(
                        set(changed) ^ set(got)
                        | {k for k in changed if got.get(k) != want[k]}
                    )
                    raise RuntimeError(
                        "staged bytes disagree with input stats for "
                        f"shards {bad!r}; export aborted"
                    )
            else:
                # Nothing changed: the staging write never ran, so the
                # data dir (and its link targets) must exist regardless.
                os.makedirs(data_dir, exist_ok=True)
            if reused and verify_reused:
                # Re-certify the shards about to be reused FROM the
                # previous version's data files: the prev manifest
                # certified them at write time, but bit-rot / partial
                # restore / tampering since then would otherwise be
                # hard-linked straight into the new version. Pruned
                # read over exactly the reused shards.
                verify_export(
                    spark,
                    out_dir,
                    prev_version,
                    shards=[want[k]["shard"] for k in reused],
                )
            for k in reused:
                _link_shard_dir(
                    os.path.join(prev_path, "data", f"{shard_col}={k}"),
                    os.path.join(data_dir, f"{shard_col}={k}"),
                )
            # Per-shard layout truth: a freshly staged shard carries
            # THIS call's ordering; a hard-linked shard keeps (and
            # records) the layout of the version that wrote its files,
            # inherited through the chain — so the newest manifest is
            # self-contained and an ordered reader never needs an older
            # manifest that gc_exports may have deleted.
            changed_set = set(changed)
            for k, e in want.items():
                if k in changed_set:
                    e["order"] = list(order_within_shard)
                else:
                    e["order"] = list(
                        prev_entries[k].get(
                            "order",
                            prev_manifest.get("order_within_shard", []),
                        )
                    )
            entries = sorted(
                (want[k] for k in want), key=lambda e: str(e["shard"])
            )

        manifest: dict = {
            "version": version,
            "shard_col": shard_col,
            "token_col": token_col,
            # Echo of this call's argument — the layout of NEWLY
            # WRITTEN shards only. The per-shard truth (including
            # hard-linked shards that keep an older version's layout)
            # is each shard entry's "order" field; readers wanting an
            # ordering guarantee must check it per shard, never this.
            "order_within_shard": list(order_within_shard),
            "schema": df.schema.jsonValue(),
            "n_shards": len(entries),
            "n_rows": int(sum(e["n_rows"] for e in entries)),
            "shards": entries,
        }
        if token_col is not None:
            manifest["token_sum"] = int(
                sum(e["token_sum"] for e in entries)
            )
        if incremental:
            # Original-typed shard values (an int-sharded export must
            # not emit reused ["0","3"] next to shards 0/3 — the r6
            # ADVICE consumer-comparison trap).
            manifest["reused_shards"] = [want[k]["shard"] for k in reused]
        with open(os.path.join(staging, _MANIFEST), "w") as fh:
            # No default= fallback: shard values are validated int/str,
            # so anything non-JSON-native here is a bug that must raise,
            # not a silent stringification that would make the returned
            # manifest disagree with the on-disk one (and mark every
            # shard changed on the next incremental diff).
            json.dump(manifest, fh, indent=1)

        # Publish: one atomic rename; concurrent committers conflict
        # loudly instead of last-committer-wins (index_writer contract).
        try:
            os.rename(staging, os.path.join(out_dir, f"v{version}"))
        except OSError as exc:
            # Only an occupied target dir is a CONFLICT; an EACCES /
            # EROFS / ENAMETOOLONG here is an environment fault and
            # retrying against "the new latest" would loop forever on a
            # misdiagnosis — let those surface as themselves.
            if exc.errno not in (errno.EEXIST, errno.ENOTEMPTY):
                raise
            raise RuntimeError(
                f"training export version conflict: v{version} was "
                "published concurrently; re-run against the new latest"
            ) from exc
        return manifest
    finally:
        if incremental:
            df.unpersist()
        shutil.rmtree(staging, ignore_errors=True)
