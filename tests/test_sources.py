"""RSS/Atom and OTLP source tests (SURVEY §2 A1/A4)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

RSS_DOC = """<?xml version="1.0"?>
<rss version="2.0"><channel><title>Feed One</title>
<item><title>First</title><link>https://a.example/1</link>
<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate><description>d1</description></item>
<item><title>Second</title><link>https://a.example/2</link>
<pubDate>Tue, 02 Jan 2024 00:00:00 GMT</pubDate><description>d2</description></item>
<item><title>Evil</title><link>javascript:alert(1)</link>
<pubDate>Tue, 02 Jan 2024 00:00:00 GMT</pubDate><description>x</description></item>
</channel></rss>"""

ATOM_DOC = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom"><title>Feed Two</title>
<entry><title>Alpha</title><link href="https://b.example/a"/>
<updated>2024-01-03T00:00:00Z</updated><summary>s1</summary></entry>
</feed>"""


def test_rss_and_atom_parse_with_url_guard(spark):
    from alt_spark.sources.rss import parse_feeds

    df = spark.createDataFrame(
        [Row(feed_url="f1", xml=RSS_DOC), Row(feed_url="f2", xml=ATOM_DOC)]
    )
    rows = {(r.feed_url, r.title, r.link) for r in parse_feeds(df).collect()}
    assert rows == {
        ("f1", "First", "https://a.example/1"),
        ("f1", "Second", "https://a.example/2"),
        ("f2", "Alpha", "https://b.example/a"),
    }, "items explode per feed; javascript: link dropped by the B9 guard"


def test_otlp_spans_flatten(spark):
    from alt_spark.sources.otlp import parse_otlp_traces

    payload = {
        "resourceSpans": [
            {
                "resource": {
                    "attributes": [
                        {"key": "service.name", "value": {"stringValue": "alt-backend"}}
                    ]
                },
                "scopeSpans": [
                    {
                        "spans": [
                            {
                                "traceId": "t1",
                                "spanId": "s1",
                                "parentSpanId": "",
                                "name": "GET /v1/feeds",
                                "kind": 2,
                                "startTimeUnixNano": "1704067200000000000",
                                "endTimeUnixNano": "1704067200250000000",
                                "attributes": [
                                    {"key": "http.status", "value": {"stringValue": "200"}}
                                ],
                            },
                            {
                                "traceId": "t1",
                                "spanId": "s2",
                                "parentSpanId": "s1",
                                "name": "db.query",
                                "kind": 3,
                                "startTimeUnixNano": "1704067200010000000",
                                "endTimeUnixNano": "1704067200110000000",
                                "attributes": [],
                            },
                        ]
                    }
                ],
            }
        ]
    }
    df = spark.createDataFrame([Row(value=json.dumps(payload))])
    got = {r.span_id: r for r in parse_otlp_traces(df).collect()}
    assert set(got) == {"s1", "s2"}
    assert got["s1"].service_name == "alt-backend"
    assert got["s1"].duration_ms == 250.0
    assert got["s2"].parent_span_id == "s1"
    assert got["s1"].attributes == {"http.status": "200"}
    assert str(got["s1"].start_ts).startswith("2024-01-01 00:00:00")


def test_rss_datasource_matches_expression_parser(spark, tmp_path):
    """A1 ⊕: the pluggable `format("rss")` Python data source yields the
    same articles as the from_xml expression parser over the same landed
    feed files — one input partition per feed, malformed files skipped,
    B9 URL guard applied inside the reader."""
    from alt_spark.sources.rss import parse_feeds
    from alt_spark.sources.rss_datasource import RssDataSource

    feeds = tmp_path / "feeds"
    feeds.mkdir()
    (feeds / "one.xml").write_text(RSS_DOC)
    (feeds / "two.xml").write_text(ATOM_DOC)
    (feeds / "bad.xml").write_text("<rss><channel><item>broken")

    spark.dataSource.register(RssDataSource)
    via_source = spark.read.format("rss").load(str(feeds))
    got = {
        (r.title, r.link, r.published, r.summary) for r in via_source.collect()
    }

    df = spark.createDataFrame(
        [
            Row(feed_url=str(feeds / "one.xml"), xml=RSS_DOC),
            Row(feed_url=str(feeds / "two.xml"), xml=ATOM_DOC),
        ]
    )
    want = {
        (r.title, r.link, r.published, r.summary) for r in parse_feeds(df).collect()
    }
    assert got == want
    # Partition-per-feed parallelism: three files → three input splits.
    assert via_source.rdd.getNumPartitions() == 3
    # The source composes with ordinary DataFrame ops (filter pushes into
    # the plan; result is a plain relation).
    assert via_source.filter("title = 'Alpha'").count() == 1


def test_rss_stream_source_tails_new_feeds(spark, tmp_path):
    """A1/A2 ⊕: readStream.format("rss") tails a feed directory — files
    landed before the stream starts arrive in the first micro-batch,
    files landed mid-stream arrive in a later one, and nothing is
    double-ingested (offset = ingested file set)."""
    from alt_spark.sources.rss_datasource import RssDataSource

    feeds = tmp_path / "feeds"
    feeds.mkdir()
    (feeds / "one.xml").write_text(RSS_DOC)

    spark.dataSource.register(RssDataSource)
    q = (
        spark.readStream.format("rss")
        .load(str(feeds))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("rss_tail")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        first = {r.title for r in spark.sql("SELECT * FROM rss_tail").collect()}
        assert first == {"First", "Second"}, "pre-existing feed in batch 1"

        (feeds / "two.xml").write_text(ATOM_DOC)
        q.processAllAvailable()
        after = [r.title for r in spark.sql("SELECT * FROM rss_tail").collect()]
        assert sorted(after) == ["Alpha", "First", "Second"], (
            "new feed ingested exactly once, old feed not re-ingested"
        )
    finally:
        q.stop()
        q.awaitTermination(30)


def test_searchindex_batch_writer_two_phase_commit(spark, tmp_path):
    """A8 ⊕: df.write.format("searchindex") — executors stage partition
    op files, the driver commits one new snapshot version applying
    last-writer-wins upserts and deletes; a second append builds on the
    first snapshot; abort leaves the committed snapshot untouched."""
    from alt_spark.sources.index_writer import (
        SearchIndexDataSource,
        read_index_snapshot,
    )

    spark.dataSource.register(SearchIndexDataSource)
    idx = str(tmp_path / "index")

    ops1 = spark.createDataFrame(
        [
            (1, "a", "A v1", False),
            (2, "b", "B v1", False),
            (3, "a", "A v2", False),  # same key, later seq wins
        ],
        "op_seq long, doc_key string, title string, is_delete boolean",
    ).repartition(3)
    ops1.write.format("searchindex").option("path", idx).mode("append").save()
    snap = read_index_snapshot(idx)
    assert dict(zip(snap["doc_key"].to_pylist(), snap["title"].to_pylist())) == {
        "a": "A v2",
        "b": "B v1",
    }

    ops2 = spark.createDataFrame(
        [(4, "b", None, True), (5, "c", "C v1", False)],
        "op_seq long, doc_key string, title string, is_delete boolean",
    )
    ops2.write.format("searchindex").option("path", idx).mode("append").save()
    snap2 = read_index_snapshot(idx)
    assert dict(
        zip(snap2["doc_key"].to_pylist(), snap2["title"].to_pylist())
    ) == {"a": "A v2", "c": "C v1"}, "delete propagated, upsert applied"
    # Two committed versions exist (v0, v1) and no staging residue.
    import os

    assert sorted(d for d in os.listdir(idx) if d.startswith("v")) == ["v0", "v1"]
    assert not [d for d in os.listdir(idx) if d.startswith("_staging")]


# ------------------------------------------------------- training export sink
def _sharded_docs(spark):
    from alt_spark.catalog import load_table
    from alt_spark.operators.packing import shuffle_shards

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    return shuffle_shards(docs, "doc_id", n_shards=4, salt="exp-t").withColumn(
        "n_tok", F.size(F.split("text", r"\s+")).cast("long")
    )


def test_training_export_roundtrip_and_manifest(spark, tmp_path):
    """The manifest must certify the staged bytes: totals and per-shard
    content hashes match an independent recomputation from the INPUT,
    and the read-back rows are exactly the input rows."""
    from alt_spark.sources.training_export import (
        export_packed_corpus,
        read_export,
        read_export_manifest,
    )

    out = str(tmp_path / "export")
    sharded = _sharded_docs(spark)
    manifest = export_packed_corpus(sharded, out, "shard", token_col="n_tok")
    assert manifest["version"] == 0 and manifest == read_export_manifest(out)
    expect = {
        r["shard"]: r
        for r in sharded.groupBy("shard")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.xxhash64("doc_id", "text", "pos", "n_tok")).alias("h"),
            F.sum("n_tok").alias("tok"),
        )
        .collect()
    }
    assert manifest["n_rows"] == sum(r["n_rows"] for r in expect.values())
    assert manifest["token_sum"] == sum(r["tok"] for r in expect.values())
    assert manifest["n_shards"] == len(expect) == 4
    for s in manifest["shards"]:
        e = expect[s["shard"]]
        assert (s["n_rows"], s["content_hash"], s["token_sum"]) == (
            e["n_rows"],
            e["h"],
            e["tok"],
        )
    back = read_export(spark, out)
    assert sorted(back.columns) == sorted(sharded.columns)
    assert (
        back.select("doc_id", "shard", "pos").orderBy("doc_id").collect()
        == sharded.select("doc_id", "shard", "pos").orderBy("doc_id").collect()
    )


def test_training_export_versions_are_immutable(spark, tmp_path):
    """A second export publishes v1 next to an untouched v0; the
    content hash is layout-invariant (order-insensitive sum)."""
    from alt_spark.sources.training_export import (
        export_packed_corpus,
        read_export_manifest,
    )

    out = str(tmp_path / "export")
    sharded = _sharded_docs(spark)
    m0 = export_packed_corpus(sharded, out, "shard", token_col="n_tok")
    m1 = export_packed_corpus(
        sharded.repartition(7), out, "shard", token_col="n_tok"
    )
    assert (m0["version"], m1["version"]) == (0, 1)
    assert read_export_manifest(out, 0) == m0, "v0 untouched by v1"
    assert m1["shards"] == m0["shards"], "content hash is layout-invariant"


def test_training_export_conflict_and_cleanup(spark, tmp_path, monkeypatch):
    """A competitor publishing between this exporter's version probe
    and its rename must conflict loudly (never last-committer-wins),
    and the loser's staging dir must not survive. The race window is
    simulated by pinning the version probe while the v1 slot fills."""
    import os

    from alt_spark.sources import training_export as te

    out = str(tmp_path / "export")
    sharded = _sharded_docs(spark)
    te.export_packed_corpus(sharded, out, "shard")

    real_probe = te.latest_export_version

    def stale_probe(d):
        v, p = real_probe(d)
        # The competitor lands v1 right after this exporter reads v0.
        os.makedirs(os.path.join(out, "v1"), exist_ok=True)
        with open(os.path.join(out, "v1", "manifest.json"), "w") as fh:
            fh.write("{}")
        return v, p

    monkeypatch.setattr(te, "latest_export_version", stale_probe)
    with pytest.raises(RuntimeError, match="version conflict"):
        te.export_packed_corpus(sharded, out, "shard")
    assert not [d for d in os.listdir(out) if d.startswith("_staging")]
    # A retry against the new latest succeeds at the next slot.
    monkeypatch.setattr(te, "latest_export_version", real_probe)
    assert te.export_packed_corpus(sharded, out, "shard")["version"] == 2


def test_training_export_empty_frame_publishes_empty_version(spark, tmp_path):
    from alt_spark.sources.training_export import (
        export_packed_corpus,
        read_export,
    )

    out = str(tmp_path / "export")
    empty = _sharded_docs(spark).filter(F.lit(False))
    m = export_packed_corpus(empty, out, "shard", token_col="n_tok")
    assert (m["n_rows"], m["n_shards"], m["shards"]) == (0, 0, [])
    assert read_export(spark, out).count() == 0


def test_training_export_validates_columns(spark, tmp_path):
    from alt_spark.sources.training_export import export_packed_corpus

    sharded = _sharded_docs(spark)
    with pytest.raises(ValueError, match="shard column"):
        export_packed_corpus(sharded, str(tmp_path / "x"), "nope")
    with pytest.raises(ValueError, match="token column"):
        export_packed_corpus(sharded, str(tmp_path / "x"), "shard", token_col="nope")


def test_training_export_incremental_reuses_unchanged_shards(spark, tmp_path):
    """Daily-batch re-export: unchanged shards must be hard-linked from
    the previous version (same inode — zero bytes rewritten), changed
    shards rewritten and re-certified, and the new version must read
    back as exactly the new corpus."""
    import os

    from alt_spark.sources.training_export import (
        export_packed_corpus,
        read_export,
        read_export_manifest,
    )

    out = str(tmp_path / "export")
    sharded = _sharded_docs(spark)
    m0 = export_packed_corpus(sharded, out, "shard", token_col="n_tok")

    # Change exactly the rows of one shard.
    victim = m0["shards"][0]["shard"]
    changed = sharded.withColumn(
        "text",
        F.when(
            F.col("shard") == victim, F.concat(F.col("text"), F.lit(" EDIT"))
        ).otherwise(F.col("text")),
    ).withColumn("n_tok", F.size(F.split("text", r"\s+")).cast("long"))
    m1 = export_packed_corpus(
        changed, out, "shard", token_col="n_tok", incremental=True
    )
    assert m1["version"] == 1
    # reused_shards carries ORIGINAL-typed shard values (r6 ADVICE: an
    # int-sharded export must not emit ["0","3"] next to shards 0/3).
    assert m1["reused_shards"] == [
        s["shard"] for s in m0["shards"] if s["shard"] != victim
    ]
    # Reused shard files share inodes with v0 (linked, not copied).
    for s in m0["shards"]:
        d0 = os.path.join(out, "v0", "data", f"shard={s['shard']}")
        d1 = os.path.join(out, "v1", "data", f"shard={s['shard']}")
        inodes0 = {f: os.stat(os.path.join(d0, f)).st_ino for f in os.listdir(d0)}
        inodes1 = {
            f: os.stat(os.path.join(d1, f)).st_ino
            for f in os.listdir(d1)
            if not f.startswith("_")
        }
        if s["shard"] == victim:
            assert not set(inodes0.values()) & set(inodes1.values())
        else:
            assert inodes0 == {f: i for f, i in inodes1.items() if f in inodes0}
    # Manifest: victim's hash changed, everything else carried.
    h0 = {s["shard"]: s["content_hash"] for s in m0["shards"]}
    h1 = {s["shard"]: s["content_hash"] for s in m1["shards"]}
    assert h0[victim] != h1[victim]
    assert {k: v for k, v in h0.items() if k != victim} == {
        k: v for k, v in h1.items() if k != victim
    }
    # Read-back equals the new corpus; v0 still equals the old one.
    cols = ["doc_id", "text", "pos", "n_tok", "shard"]
    assert (
        read_export(spark, out, 1).select(*cols).orderBy("doc_id").collect()
        == changed.select(*cols).orderBy("doc_id").collect()
    )
    assert read_export_manifest(out, 0) == m0


def test_training_export_incremental_identical_corpus_links_everything(
    spark, tmp_path
):
    from alt_spark.sources.training_export import (
        export_packed_corpus,
        read_export,
    )

    out = str(tmp_path / "export")
    sharded = _sharded_docs(spark)
    m0 = export_packed_corpus(sharded, out, "shard")
    m1 = export_packed_corpus(
        sharded.repartition(5), out, "shard", incremental=True
    )
    assert m1["reused_shards"] == [s["shard"] for s in m0["shards"]]
    assert m1["shards"] == m0["shards"]
    assert read_export(spark, out).count() == sharded.count()


def test_training_export_incremental_preconditions(spark, tmp_path):
    from alt_spark.sources.training_export import export_packed_corpus

    out = str(tmp_path / "export")
    sharded = _sharded_docs(spark)
    with pytest.raises(ValueError, match="previously committed"):
        export_packed_corpus(sharded, out, "shard", incremental=True)
    export_packed_corpus(sharded, out, "shard")
    with pytest.raises(ValueError, match="schema"):
        export_packed_corpus(
            sharded.withColumn("extra", F.lit(1)), out, "shard", incremental=True
        )


def test_training_export_incremental_drops_absent_shards(spark, tmp_path):
    """A shard absent from the input is absent from the new version —
    retention runs compose with incremental export."""
    from alt_spark.sources.training_export import (
        export_packed_corpus,
        read_export,
    )

    out = str(tmp_path / "export")
    sharded = _sharded_docs(spark)
    m0 = export_packed_corpus(sharded, out, "shard")
    victim = m0["shards"][0]["shard"]
    pruned = sharded.filter(F.col("shard") != victim)
    m1 = export_packed_corpus(pruned, out, "shard", incremental=True)
    assert victim not in {s["shard"] for s in m1["shards"]}
    assert m1["n_rows"] == m0["n_rows"] - m0["shards"][0]["n_rows"]
    assert read_export(spark, out, 1).filter(
        F.col("shard") == victim
    ).count() == 0


def test_training_export_rejects_null_and_unsafe_shards(spark, tmp_path):
    """NULL shards (the shuffle_shards NULL-id propagation) and strings
    needing Hive path escaping must be rejected loudly: NULL breaks the
    incremental isin filter and both break the one-name-everywhere
    manifest/dir-name contract."""
    from alt_spark.sources.training_export import export_packed_corpus

    base = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 1)], "doc_id long, text string, shard int"
    )
    with_null = base.withColumn(
        "shard", F.when(F.col("doc_id") == 1, F.lit(None)).otherwise(F.col("shard"))
    )
    with pytest.raises(ValueError, match="NULL shard"):
        export_packed_corpus(with_null, str(tmp_path / "a"), "shard")
    unsafe = base.withColumn("shard", F.concat(F.lit("x:"), F.col("shard")))
    with pytest.raises(ValueError, match="escaping"):
        export_packed_corpus(unsafe, str(tmp_path / "b"), "shard")


def _drop_one_row_from_shard(out, version, shard):
    """Simulate bit-rot/tampering: rewrite one committed shard's part
    file with its last row removed (still a VALID parquet file, so the
    fault is only detectable by re-deriving stats — the case a footer
    check can't catch)."""
    import glob
    import os

    import pyarrow.parquet as pq

    d = os.path.join(out, f"v{version}", "data", f"shard={shard}")
    part = sorted(glob.glob(os.path.join(d, "*.parquet")))[0]
    t = pq.read_table(part)
    pq.write_table(t.slice(0, t.num_rows - 1), part)
    # Drop Hadoop's LOCAL-FS-only .crc sidecars: they would flag the
    # rewrite at read time, but object stores (the 100 TB deployment)
    # have no sidecar — verify_export's stat diff must catch the fault
    # itself, so the test simulates the sidecar-less environment.
    for crc in glob.glob(os.path.join(d, ".*.crc")):
        os.remove(crc)


def test_verify_export_catches_tampered_shard(spark, tmp_path):
    """verify_export re-derives per-shard stats from the data files: a
    committed shard silently losing a row (valid parquet, wrong
    content) must fail verification naming that shard, and a
    shard-subset verify must prune to — and only check — the requested
    shards."""
    from alt_spark.sources.training_export import (
        export_packed_corpus,
        verify_export,
    )

    out = str(tmp_path / "export")
    sharded = _sharded_docs(spark)
    m = export_packed_corpus(sharded, out, "shard", token_col="n_tok")
    assert verify_export(spark, out) == m  # pristine version passes
    victim = m["shards"][0]["shard"]
    intact = m["shards"][1]["shard"]
    _drop_one_row_from_shard(out, 0, victim)
    with pytest.raises(RuntimeError, match=str(victim)):
        verify_export(spark, out)
    # Subset verify prunes the scan: the intact shard still certifies,
    # the tampered one still fails.
    assert verify_export(spark, out, shards=[intact])["version"] == 0
    with pytest.raises(RuntimeError, match="fails verification"):
        verify_export(spark, out, shards=[victim])
    with pytest.raises(ValueError, match="not in the"):
        verify_export(spark, out, shards=["no-such-shard"])


def test_incremental_export_recertifies_reused_shards(spark, tmp_path):
    """A corrupted UNCHANGED shard in the previous version must fail an
    incremental export before hard-linking (the r6 VERDICT gap: write-
    time certification can't see later bit-rot, so a reused shard would
    silently propagate into every future version). verify_reused=False
    documents the propagation path it exists to close."""
    import os

    from alt_spark.sources.training_export import (
        export_packed_corpus,
        read_export_manifest,
    )

    out = str(tmp_path / "export")
    sharded = _sharded_docs(spark)
    m0 = export_packed_corpus(sharded, out, "shard", token_col="n_tok")
    victim = m0["shards"][0]["shard"]  # will change -> staged fresh
    rotted = m0["shards"][1]["shard"]  # unchanged -> reuse candidate
    _drop_one_row_from_shard(out, 0, rotted)
    changed = sharded.withColumn(
        "text",
        F.when(
            F.col("shard") == victim, F.concat(F.col("text"), F.lit(" EDIT"))
        ).otherwise(F.col("text")),
    ).withColumn("n_tok", F.size(F.split("text", r"\s+")).cast("long"))
    with pytest.raises(RuntimeError, match="fails verification"):
        export_packed_corpus(
            changed, out, "shard", token_col="n_tok", incremental=True
        )
    # The failed export published nothing and left no staging residue.
    assert not os.path.isdir(os.path.join(out, "v1"))
    assert not [d for d in os.listdir(out) if d.startswith("_staging")]
    # With verification disabled the rot propagates — the documented
    # trade the flag's default exists to prevent.
    m1 = export_packed_corpus(
        changed,
        out,
        "shard",
        token_col="n_tok",
        incremental=True,
        verify_reused=False,
    )
    assert m1["version"] == 1 and read_export_manifest(out, 1) == m1


def test_plan_draw_shard_export_composition(spark, tmp_path):
    """The full tail of the pipeline end-to-end: token-budget plan →
    multi-epoch draw (epoch_expand) → deterministic shuffle-sharding of
    the drawn COPIES (keyed by doc#copy, since a doc can legitimately
    appear once per epoch) → versioned export. The manifest must
    certify exactly the drawn multiset (token_sum == drawn tokens,
    n_rows == drawn rows) and the read-back must reproduce it."""
    from alt_spark.catalog import load_table
    from alt_spark.operators.dedup import tokens_col
    from alt_spark.operators.mixing import epoch_expand, token_budget_plan
    from alt_spark.operators.packing import shuffle_shards
    from alt_spark.sources.training_export import (
        export_packed_corpus,
        read_export,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "lang", F.size(tokens_col("text")).cast("long").alias("n_tok")
    )
    plan = token_budget_plan(
        docs, "lang", "n_tok", budget_tokens=20_000, epoch_cap_permyriad=25_000
    )
    drawn = epoch_expand(docs, plan, "lang", "doc_id", "n_tok")
    keyed = drawn.withColumn(
        "draw_id", F.concat_ws("#", F.col("doc_id"), F.col("copy"))
    )
    sharded = shuffle_shards(keyed, "draw_id", n_shards=8, salt="e2e")
    out = str(tmp_path / "export")
    m = export_packed_corpus(sharded, out, "shard", token_col="n_tok")
    want_rows = drawn.count()
    want_tok = drawn.agg(F.sum("n_tok")).collect()[0][0]
    assert m["n_rows"] == want_rows and m["token_sum"] == want_tok
    back = read_export(spark, out)
    assert back.count() == want_rows
    assert (
        sorted(
            (r["doc_id"], r["copy"]) for r in back.select("doc_id", "copy").collect()
        )
        == sorted((r["doc_id"], r["copy"]) for r in drawn.collect())
    )


def test_training_export_all_null_token_sums_to_zero(spark, tmp_path):
    from alt_spark.sources.training_export import export_packed_corpus

    df = spark.createDataFrame(
        [(1, "a", 0, None), (2, "b", 0, None)],
        "doc_id long, text string, shard int, n_tok long",
    )
    m = export_packed_corpus(df, str(tmp_path / "e"), "shard", token_col="n_tok")
    assert m["token_sum"] == 0 and m["shards"][0]["token_sum"] == 0


def test_diff_exports_classifies_shards(spark, tmp_path):
    """The manifest-only diff must agree with what the incremental run
    actually did: the changed shard surfaces as changed, the reused
    ones as unchanged, and row/token deltas match the edit."""
    from alt_spark.sources.training_export import (
        diff_exports,
        export_packed_corpus,
    )

    out = str(tmp_path / "export")
    sharded = _sharded_docs(spark)
    m0 = export_packed_corpus(sharded, out, "shard", token_col="n_tok")
    victim = m0["shards"][0]["shard"]
    changed = sharded.withColumn(
        "text",
        F.when(
            F.col("shard") == victim, F.concat(F.col("text"), F.lit(" EDIT"))
        ).otherwise(F.col("text")),
    ).withColumn("n_tok", F.size(F.split("text", r"\s+")).cast("long"))
    m1 = export_packed_corpus(
        changed, out, "shard", token_col="n_tok", incremental=True
    )

    d = diff_exports(out, 0, 1)
    assert d["from_version"] == 0 and d["to_version"] == 1
    assert d["added"] == [] and d["removed"] == []
    assert d["changed"] == [victim]
    # diff's unchanged == the incremental run's reused set, both
    # manifest-typed (ints stay ints)
    assert sorted(map(str, d["unchanged"])) == sorted(
        map(str, m1["reused_shards"])
    )
    assert all(type(s) is not bool for s in d["changed"] + d["unchanged"])
    assert d["row_delta"] == 0  # edit changed content, not cardinality
    # " EDIT" appends one whitespace token per row of the victim shard
    victim_rows = next(
        e["n_rows"] for e in m0["shards"] if e["shard"] == victim
    )
    assert d["token_delta"] == victim_rows


def test_diff_exports_added_removed_and_layout_guard(spark, tmp_path):
    from alt_spark.sources.training_export import (
        diff_exports,
        export_packed_corpus,
        read_export_manifest,
    )

    out = str(tmp_path / "export")
    sharded = _sharded_docs(spark)
    export_packed_corpus(sharded, out, "shard", token_col="n_tok")
    # v1 drops a shard entirely (non-incremental publish of a subset)
    kept = [e["shard"] for e in read_export_manifest(out, 0)["shards"]][1:]
    subset = sharded.filter(F.col("shard").isin(kept))
    export_packed_corpus(subset, out, "shard", token_col="n_tok")
    d = diff_exports(out, 0, 1)
    assert len(d["removed"]) == 1 and d["added"] == []
    assert d["row_delta"] < 0
    # diff across different shard layouts must refuse
    relabeled = sharded.withColumn("shard2", F.col("shard"))
    export_packed_corpus(
        relabeled.drop("shard"), out, "shard2", token_col="n_tok"
    )
    with pytest.raises(ValueError, match="shard columns differ"):
        diff_exports(out, 1, 2)


def test_gc_exports_keeps_hardlinked_chain_valid(spark, tmp_path):
    """The retention contract: collect old versions under an
    incremental chain, then prove the surviving newest version still
    READS and RE-CERTIFIES — reused shards are hard links, so deleting
    the version they were linked from must not invalidate them."""
    from alt_spark.sources.training_export import (
        committed_export_versions,
        export_packed_corpus,
        gc_exports,
        read_export,
        verify_export,
    )

    out = str(tmp_path / "export")
    sharded = _sharded_docs(spark)
    export_packed_corpus(sharded, out, "shard", token_col="n_tok")
    # two incremental generations, each editing one (different) shard
    cur = sharded
    for gen in range(2):
        victim = sorted(
            r["shard"] for r in cur.select("shard").distinct().collect()
        )[gen]
        cur = cur.withColumn(
            "text",
            F.when(
                F.col("shard") == victim,
                F.concat(F.col("text"), F.lit(f" GEN{gen}")),
            ).otherwise(F.col("text")),
        ).withColumn("n_tok", F.size(F.split("text", r"\s+")).cast("long"))
        export_packed_corpus(
            cur, out, "shard", token_col="n_tok", incremental=True
        )
    assert committed_export_versions(out) == [0, 1, 2]

    # dry run reports without deleting
    plan = gc_exports(out, keep_last=1, dry_run=True)
    assert plan == {"removed": [0, 1], "kept": [2]}
    assert committed_export_versions(out) == [0, 1, 2]

    res = gc_exports(out, keep_last=1)
    assert res == {"removed": [0, 1], "kept": [2]}
    assert committed_export_versions(out) == [2]
    # v2 reused shards hard-linked from v1 (itself linking from v0):
    # both sources are gone, yet v2 must read back the full corpus and
    # re-certify byte-for-byte.
    verify_export(spark, out, 2)
    got = {
        (r["doc_id"], r["text"])
        for r in read_export(spark, out, 2).collect()
    }
    want = {(r["doc_id"], r["text"]) for r in cur.collect()}
    assert got == want


def test_gc_exports_guards(tmp_path):
    from alt_spark.sources.training_export import gc_exports

    with pytest.raises(ValueError, match="keep_last"):
        gc_exports(str(tmp_path), keep_last=0)
    # nothing committed: nothing to do, no error
    assert gc_exports(str(tmp_path / "nowhere"), keep_last=3) == {
        "removed": [],
        "kept": [],
    }


def test_training_export_order_within_shard(spark, tmp_path):
    """Layout lever: with order_within_shard, every shard FILE carries
    rows sorted by the order columns (verified per file, not per
    frame), the manifest records the promise, content certification is
    unaffected (fingerprints are order-insensitive), and missing order
    columns are refused before anything is written."""
    import os

    import pyarrow.parquet as _pq

    from alt_spark.sources.training_export import (
        export_packed_corpus,
        read_export,
    )

    out = str(tmp_path / "export")
    sharded = _sharded_docs(spark)
    m = export_packed_corpus(
        sharded, out, "shard", token_col="n_tok",
        order_within_shard=("doc_id",),
    )
    assert m["order_within_shard"] == ["doc_id"]
    data = os.path.join(out, "v0", "data")
    n_files = 0
    for shard_dir in sorted(os.listdir(data)):
        d = os.path.join(data, shard_dir)
        if not os.path.isdir(d):
            continue
        for f in os.listdir(d):
            if not f.endswith(".parquet"):
                continue
            ids = _pq.read_table(os.path.join(d, f)).column(
                "doc_id"
            ).to_pylist()
            assert ids == sorted(ids), f"{shard_dir}/{f} not ordered"
            n_files += 1
    assert n_files == m["n_shards"]
    # Round trip still exact.
    got = {r["doc_id"] for r in read_export(spark, out).collect()}
    assert got == {r["doc_id"] for r in sharded.collect()}
    with pytest.raises(ValueError, match="order_within_shard"):
        export_packed_corpus(
            sharded, out, "shard", order_within_shard=("nope",)
        )


def test_export_per_shard_order_survives_incremental_reuse(spark, tmp_path):
    """The r7 review finding: the version-level order_within_shard is a
    promise hard-linked shards cannot keep. Per-shard ``order`` must
    record each shard's TRUE layout — reused shards inherit the writing
    version's ordering through the chain, so the newest manifest stays
    truthful even after gc removes the writing version."""
    from alt_spark.sources.training_export import (
        export_packed_corpus,
        gc_exports,
        read_export_manifest,
    )

    out = str(tmp_path / "export")
    sharded = _sharded_docs(spark)
    # v0: UNordered layout.
    m0 = export_packed_corpus(sharded, out, "shard", token_col="n_tok")
    assert all(s["order"] == [] for s in m0["shards"])
    # v1: incremental with an ordering promise; only the victim shard
    # changes, everything else is hard-linked (and stays unordered).
    victim = m0["shards"][0]["shard"]
    changed = sharded.withColumn(
        "text",
        F.when(
            F.col("shard") == victim, F.concat(F.col("text"), F.lit(" v1"))
        ).otherwise(F.col("text")),
    ).withColumn("n_tok", F.size(F.split("text", r"\s+")).cast("long"))
    m1 = export_packed_corpus(
        changed, out, "shard", token_col="n_tok",
        incremental=True, order_within_shard=("doc_id",),
    )
    per_shard = {s["shard"]: s["order"] for s in m1["shards"]}
    assert per_shard[victim] == ["doc_id"]  # freshly staged: new layout
    assert all(
        per_shard[s["shard"]] == [] for s in m0["shards"] if s["shard"] != victim
    ), "hard-linked shards must record their writing version's layout"
    # v2: nothing changes; inheritance carries BOTH layouts forward and
    # the chain stays truthful after the writing versions are gc'd.
    m2 = export_packed_corpus(
        changed, out, "shard", token_col="n_tok",
        incremental=True, order_within_shard=("doc_id",),
    )
    assert {s["shard"]: s["order"] for s in m2["shards"]} == per_shard
    gc_exports(out, keep_last=1)
    assert {
        s["shard"]: s["order"] for s in read_export_manifest(out)["shards"]
    } == per_shard


def test_diff_exports_token_accounting_presence_is_not_churn(spark, tmp_path):
    """A version exported WITH token accounting diffed against a
    byte-identical one WITHOUT must read as unchanged (the r7 review
    finding: entry-dict comparison marked every shard changed)."""
    from alt_spark.sources.training_export import (
        diff_exports,
        export_packed_corpus,
    )

    out = str(tmp_path / "export")
    sharded = _sharded_docs(spark)
    export_packed_corpus(sharded, out, "shard", token_col="n_tok")
    export_packed_corpus(sharded, out, "shard", token_col=None)
    d = diff_exports(out, 0, 1)
    assert d["changed"] == [] and d["added"] == [] and d["removed"] == []
    assert len(d["unchanged"]) == 4
    assert "token_delta" not in d  # only one side carries accounting
    assert d["row_delta"] == 0


def test_release_pipeline_to_export_composition(spark, tmp_path):
    """End-to-end release: the q100 chain's SURVIVOR DOCUMENTS (span-
    trimmed text, validity re-gated) shard through shuffle_shards and
    publish through the versioned export sink; the committed version
    re-certifies from its own data files and reads back the exact
    surviving set — the full trim → gate → shard → export → verify
    story in one run."""
    from alt_spark.operators.dedup import trim_duplicate_spans
    from alt_spark.operators.packing import shuffle_shards
    from alt_spark.queries.pipeline_ops import (
        _REL_MIN_CHARS,
        _REL_MIN_TOKS,
        _SPAN_W,
    )
    from alt_spark.sources.training_export import (
        export_packed_corpus,
        read_export,
        verify_export,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    trimmed = trim_duplicate_spans(docs, width=_SPAN_W)
    survivors = trimmed.filter(
        (F.col("kept_tok") >= _REL_MIN_TOKS)
        & (F.length("trimmed_text") >= _REL_MIN_CHARS)
    ).select(
        F.col("id").alias("doc_id"),
        F.col("trimmed_text").alias("text"),
        F.col("kept_tok").alias("n_tok"),
    )
    sharded = shuffle_shards(survivors, "doc_id", n_shards=4, salt="rel-t")
    out = str(tmp_path / "release")
    manifest = export_packed_corpus(sharded, out, "shard", token_col="n_tok")
    assert manifest["n_rows"] == survivors.count() > 0
    assert manifest["token_sum"] == survivors.agg(F.sum("n_tok")).first()[0]
    # verify_export raises on any disagreement and returns the manifest
    assert verify_export(spark, out, manifest["version"])["version"] == manifest["version"]
    back = read_export(spark, out)
    want = {
        (r["doc_id"], r["text"], r["n_tok"]) for r in survivors.collect()
    }
    got = {
        (r["doc_id"], r["text"], r["n_tok"])
        for r in back.select("doc_id", "text", "n_tok").collect()
    }
    assert got == want


def test_parse_otlp_logs_nesting_and_units(spark):
    """A4's logs leg: a hand-built OTLP/JSON logs envelope with two
    resources, two scopes and multi-record lists must flatten to one
    row per logRecord with the resource service name, scope name,
    ns→µs timestamp truncation, severity pair, Body string and the
    attribute map."""
    import json as _json

    from alt_spark.sources.otlp import parse_otlp_logs

    def rec(ns, num, txt, body, **attrs):
        return {
            "timeUnixNano": str(ns),
            "severityNumber": num,
            "severityText": txt,
            "body": {"stringValue": body},
            "attributes": [
                {"key": k, "value": {"stringValue": v}}
                for k, v in attrs.items()
            ],
        }

    env = {
        "resourceLogs": [
            {
                "resource": {
                    "attributes": [
                        {"key": "service.name", "value": {"stringValue": "a"}}
                    ]
                },
                "scopeLogs": [
                    {
                        "scope": {"name": "s1"},
                        "logRecords": [
                            rec(1_700_000_000_123_456_789, 9, "INFO", "m1", k="v"),
                            rec(1_700_000_000_000_000_000, 17, "ERROR", "m2"),
                        ],
                    },
                    {"scope": {"name": "s2"}, "logRecords": [rec(2_000, 5, "DEBUG", "m3")]},
                ],
            },
            {
                "resource": {
                    "attributes": [
                        {"key": "service.name", "value": {"stringValue": "b"}}
                    ]
                },
                "scopeLogs": [
                    {"scope": {"name": "s3"}, "logRecords": [rec(3_000, 13, "WARN", "m4")]}
                ],
            },
        ]
    }
    df = spark.createDataFrame([(_json.dumps(env),)], "value string")
    rows = {r["body"]: r for r in parse_otlp_logs(df).collect()}
    assert set(rows) == {"m1", "m2", "m3", "m4"}
    r1 = rows["m1"]
    assert r1["service_name"] == "a" and r1["scope_name"] == "s1"
    assert r1["severity_number"] == 9 and r1["severity_text"] == "INFO"
    # ns truncates to µs (div 1000): ...123_456_789 ns -> ...123456 µs.
    from pyspark.sql import functions as F

    got_us = (
        parse_otlp_logs(df)
        .filter(F.col("body") == "m1")
        .select(F.unix_micros("ts"))
        .first()[0]
    )
    assert got_us == 1_700_000_000_123_456_789 // 1000
    assert r1["attributes"] == {"k": "v"}
    assert rows["m4"]["service_name"] == "b" and rows["m4"]["scope_name"] == "s3"
