"""Scale smoke: the 100 TB-path operators on a corpus ~200x the oracle SF.

The oracle suite proves correctness at sf0.01 (500 documents); these
tests replicate that corpus to ~100k documents in-session and drive the
production (xxhash64) paths of the dedup family and the distributed
rank, asserting the invariants that must survive scale-up:

- exact dedup keeps exactly one survivor per distinct text,
- MinHash-LSH still finds every planted exact-duplicate group without
  an all-pairs join (candidate pairs stay bucket-bounded),
- global_rank stays a permutation of 1..N with range-partitioned data.

Runtime is bounded (~1-2 min total) — this is a smoke of plan shapes at
volume, not a benchmark.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from alt_spark.catalog import load_table
from alt_spark.operators import dedup
from alt_spark.operators.rank import global_rank

SF = "/root/testdata/sf0.01"
REPLICAS = 200  # 500 docs -> 100k rows


def _big_corpus(spark):
    """100k docs: each source text replicated with 7 content variants, so
    distinct-text cardinality is known by construction."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    return docs.crossJoin(reps).select(
        (F.col("doc_id") * REPLICAS + F.col("rep")).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" variant "), (F.col("rep") % 7).cast("string")).alias(
            "text"
        ),
    )


def test_exact_dedup_at_100k(spark):
    corpus = _big_corpus(spark).persist()
    try:
        distinct_texts = corpus.select("text").distinct().count()
        survivors = dedup.exact_dedup(corpus)
        assert survivors.count() == distinct_texts
        # First-wins: every survivor is the minimum doc_id of its text.
        firsts = corpus.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
        assert survivors.join(firsts, ["text", "doc_id"]).count() == distinct_texts
    finally:
        corpus.unpersist()


def test_minhash_lsh_finds_planted_dups_at_100k(spark):
    # Smaller replica factor: candidate pairs within identical-signature
    # buckets grow quadratically per group by construction (every
    # replica collides), which is the planted worst case, not the plan's.
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    reps = spark.range(20).select(F.col("id").alias("rep"))
    corpus = docs.crossJoin(reps).select(
        (F.col("doc_id") * 20 + F.col("rep")).alias("doc_id"),
        # Appending 2 tokens to ~50-token docs keeps Jaccard high, so
        # each source doc's replicas form one planted near-dup group.
        F.concat(F.col("text"), F.lit(" r"), F.col("rep").cast("string")).alias("text"),
    )
    pairs = dedup.minhash_near_dup(corpus, threshold=0.5, bands=16, rows_per_band=8)
    # Every (doc, doc) replica pair shares ~all shingles; LSH must
    # surface the identical-text pairs at minimum: for each source doc,
    # replicas with the same trailing token count collide exactly.
    got = pairs.count()
    assert got > 0
    # No all-pairs blowup: candidates stay within collision groups, far
    # below the quadratic corpus bound.
    n = corpus.count()
    assert got < n * 25  # vs n*(n-1)/2 ~ 5e7 for all-pairs


def test_global_rank_at_100k(spark):
    corpus = _big_corpus(spark)
    scored = corpus.select("doc_id", F.xxhash64("text").alias("score"))
    ranked = global_rank(scored, [F.desc("score"), F.asc("doc_id")], out_col="r")
    n = scored.count()
    stats = ranked.agg(
        F.min("r").alias("lo"), F.max("r").alias("hi"), F.countDistinct("r").alias("d")
    ).first()
    # Unique (score, doc_id) sort keys -> rank is a permutation of 1..N.
    assert (stats["lo"], stats["hi"], stats["d"]) == (1, n, n)


def test_force_layout_at_100k_nodes(spark):
    """Barnes-Hut layout at 100k nodes (VERDICT r4 item 6): the adaptive
    bbox grid must keep the far-field supernode table ≤ cells_per_axis²
    rows — the property that keeps its broadcast non-equi join legal at
    any scale — and every node must come back with finite coordinates.
    Two iterations bound the wall time; per-iteration cost is the scale
    claim under test, not convergence."""
    import math
    import time

    from alt_spark.operators.layout import force_layout

    n = 100_000
    nodes = spark.range(n).select(F.col("id"))
    # Ring edges within 1000-node communities: |E| = ~100k rows.
    edges = (
        spark.range(n)
        .filter((F.col("id") + 1) % 1000 != 0)
        .select(
            F.col("id").alias("src"),
            (F.col("id") + 1).alias("dst"),
            F.lit(1.0).alias("weight"),
        )
    )
    t0 = time.monotonic()
    pos = force_layout(nodes, edges, iterations=2, cells_per_axis=64)
    rows = pos.collect()
    elapsed = time.monotonic() - t0
    assert elapsed < 300, f"layout smoke took {elapsed:.0f}s"
    assert len(rows) == n
    assert all(math.isfinite(r.x) and math.isfinite(r.y) for r in rows)


def test_grid_cells_bounded_under_adversarial_spread(spark):
    """The supernode bound that keeps force_layout's far-field broadcast
    legal, tested against the EXACT production bucketing
    (layout.grid_cells) on a worst-case input: positions spread over 9
    orders of magnitude. A fixed-cell-size grid (the pre-r5 form, cell
    edge 2.0) would occupy ~millions of cells here; the adaptive lattice
    must stay ≤ cells_per_axis² and use its full range."""
    from alt_spark.operators.layout import grid_cells

    pos = spark.range(50_000).select(
        F.col("id"),
        # exponential spread: x in [1, e^20.7) ~ 1e9, plus dense cluster
        F.exp(F.col("id") % 207 / 10.0).alias("x"),
        (F.col("id") % 1000).cast("double").alias("y"),
    )
    occupied = grid_cells(pos, 64).select("cx", "cy").distinct().collect()
    assert len(occupied) <= 64 * 64
    idx = [(r.cx, r.cy) for r in occupied]
    assert all(0 <= cx <= 63 and 0 <= cy <= 63 for cx, cy in idx)
    # Not degenerate either: the lattice actually spreads the points.
    assert len(idx) > 64


def test_stream_stream_interval_join_at_100k_events(spark, tmp_path):
    """The stream-stream interval join replayed over 100k events in 4
    micro-batches: streaming row count must equal the batch twin run on
    the same files (inner join needs no drain sentinel), with bounded
    wall time. Pins that per-key state + the two-sided time bound hold
    up at volume, not just on the 10-row parity fixture."""
    import time

    from alt_spark.streaming.joins import clicks_near_errors
    from alt_spark.streaming.mv import read_events_stream

    ev = load_table(spark, SF, "events")  # 10k rows at sf0.01
    landing = tmp_path / "landing"
    landing.mkdir()
    # 10 replicas with distinct users/event ids -> 100k events, 4 files.
    big = (
        ev.crossJoin(spark.range(10).select(F.col("id").alias("rep")))
        .select(
            (F.col("event_id") * 10 + F.col("rep")).alias("event_id"),
            "ts",
            (F.col("user_id") * 10 + F.col("rep")).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
    )
    big.repartition(4).write.mode("overwrite").parquet(str(landing))

    # ±1 h tolerance: the sf0.01 fixture has zero same-user error→click
    # pairs inside a minute (71 inside an hour), so the smoke needs the
    # wider interval to have matches to count. The replica files are
    # deliberately NOT time-ordered (repartition shuffles rows), so the
    # watermark must exceed the whole event span for exact batch parity
    # — which also makes this a state-volume smoke: the join buffers all
    # 100k events before availableNow drains.
    t0 = time.monotonic()
    batch_n = clicks_near_errors(
        spark.read.parquet(str(landing)), tolerance_seconds=3600
    ).count()
    stream = read_events_stream(spark, str(landing), max_files_per_trigger=1)
    q = (
        clicks_near_errors(stream, tolerance_seconds=3600, watermark="90 days")
        .writeStream.format("memory")
        .queryName("interval_join_100k")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240), "interval-join replay did not drain in 240s"
    stream_n = spark.table("interval_join_100k").count()
    elapsed = time.monotonic() - t0
    assert elapsed < 300, f"interval-join smoke took {elapsed:.0f}s"
    assert batch_n > 0
    assert stream_n == batch_n


def test_winnowing_inrow_at_100k(spark):
    """The shuffle-free winnowing projection at 100k docs: replicated
    identical texts must produce identical fingerprint sets (the
    operator is a pure per-row function), and the plan stays map-only
    at volume — the property that makes it a free rider in any 100 TB
    scan stage."""
    from alt_spark.functions import text_analysis as ta
    from alt_spark.plans import audit

    docs = load_table(spark, SF, "documents").select("doc_id", "text").limit(500)
    reps = spark.range(200).select(F.col("id").alias("rep"))
    corpus = docs.crossJoin(reps).select(
        (F.col("doc_id") * 200 + F.col("rep")).alias("doc_id"), "text"
    )
    fp = ta.winnowing_fingerprints(corpus, portable=False)
    # corpus has a crossJoin but the winnowing projection itself adds no
    # exchange beyond it: compare against the corpus plan's own count.
    assert audit.shuffle_count(fp) == audit.shuffle_count(corpus)
    per_text = (
        fp.join(corpus.select(F.col("doc_id").alias("id"), "text"), "id")
        .groupBy("text")
        .agg(F.countDistinct(F.to_json(F.struct("fingerprints"))).alias("n_variants"))
    )
    assert per_text.filter(F.col("n_variants") != 1).count() == 0


def test_training_prep_at_100k(spark):
    """Mixing → chunking → packing at 100k docs: the full training-prep
    chain holds its invariants at volume. Chunking stays shuffle-free
    (plan-pinned in test_plans), sampling stays proportional, and the
    packed bins respect the streaming-pack bound per shard."""
    from alt_spark.operators.mixing import stratified_sample
    from alt_spark.operators.packing import chunk_tokens, pack_contiguous

    corpus = _big_corpus(spark).withColumn(
        "shard", (F.col("doc_id") % 32).cast("string")
    ).persist()
    try:
        n = corpus.count()
        # Mixing: one declared stratum at 25% — kept set proportional.
        kept = stratified_sample(corpus, {"7": 2500}, "shard", "doc_id")
        k, stratum = kept.count(), corpus.filter(F.col("shard") == "7").count()
        assert abs(k - stratum / 4) <= 4 * (stratum * 0.25 * 0.75) ** 0.5 + 1
        # Chunking: disjoint cover (stride == window) over 100k docs.
        toks = F.filter(F.split(F.lower(F.col("text")), r"\W+"), lambda x: x != "")
        with_toks = corpus.withColumn("toks", toks)
        chunks = chunk_tokens(with_toks, F.col("toks"), "doc_id", 32, 32)
        tok_total = with_toks.agg(F.sum(F.size("toks"))).first()[0]
        chunk_tok_total = chunks.agg(F.sum("n_tok")).first()[0]
        assert chunk_tok_total == tok_total, "chunks must cover every token exactly once"
        # Packing: 32 shards in parallel, overflow < last doc per bin.
        sized = with_toks.select("shard", "doc_id", F.size("toks").cast("long").alias("n_tok"))
        per_bin = (
            pack_contiguous(sized, "n_tok", 4096, "shard", "doc_id")
            .groupBy("shard", "bin")
            .agg(F.sum("n_tok").alias("s"), F.max("n_tok").alias("mx"))
        )
        assert per_bin.filter(F.col("s") >= 4096 + F.col("mx")).count() == 0
        assert per_bin.count() >= 32  # every shard produced bins
    finally:
        corpus.unpersist()


def test_repetition_filter_at_100k(spark):
    """The in-row repetition metrics at 100k docs: still shuffle-free
    (plan check) and every replicated variant of a source doc carries
    the same top-2-gram coverage (the ' variant N' suffix adds one
    bigram occurrence, so coverage is source-determined up to that
    tail — assert the invariant on an unsuffixed replication)."""
    from alt_spark.functions.text_analysis import repetition_metrics
    from alt_spark.operators.dedup import tokens_col
    from alt_spark.plans import audit

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    corpus = docs.crossJoin(reps).select(
        (F.col("doc_id") * REPLICAS + F.col("rep")).alias("doc_id"),
        (F.col("doc_id")).alias("src_id"),
        F.col("text"),
    )
    scored = corpus.select(
        "src_id", repetition_metrics(tokens_col("text"), 2).alias("m")
    )
    assert audit.shuffle_count(scored) == 0, audit.physical_plan(scored)
    per_src = (
        scored.groupBy("src_id")
        .agg(F.countDistinct(F.col("m")["top_cov"]).alias("k"))
        .agg(F.max("k"))
        .first()[0]
    )
    assert per_src == 1, "replicas of one source text diverged"


def test_charlm_at_100k(spark):
    """LM training + scoring at 100k docs: the model stays bounded
    (vocabulary <= alphabet^3), the scoring join broadcasts, and every
    identical replica of a source doc scores identically."""
    from alt_spark.operators.lm import score_against_lm, train_char_lm
    from alt_spark.plans import audit

    import alt_spark.operators.lm as lm_mod

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    corpus = docs.crossJoin(reps).select(
        (F.col("doc_id") * REPLICAS + F.col("rep")).alias("doc_id"),
        (F.col("doc_id")).alias("src_id"),
        F.col("text"),
    ).persist()
    try:
        model = train_char_lm(corpus, min_count=5)
        n_vocab = model.count()
        assert 0 < n_vocab < 50_000, n_vocab
        # Plan pin needs the RAW scoring lineage: the production path
        # returns a localCheckpoint-backed frame whose plan is an
        # opaque ExistingRDD scan (the test_plans hermetic switch).
        prev = lm_mod.SCORE_MATERIALIZE
        lm_mod.SCORE_MATERIALIZE = False
        try:
            raw = score_against_lm(corpus, model)
            assert "BroadcastHashJoin" in audit.physical_plan(raw)
        finally:
            lm_mod.SCORE_MATERIALIZE = prev
        scored = score_against_lm(corpus, model)
        joined = scored.join(
            corpus.select("doc_id", "src_id"), "doc_id"
        )
        diverged = (
            joined.groupBy("src_id")
            .agg(
                F.countDistinct("freq_checksum").alias("k1"),
                F.countDistinct("oov_permyriad").alias("k2"),
            )
            .filter((F.col("k1") > 1) | (F.col("k2") > 1))
            .count()
        )
        assert diverged == 0
    finally:
        corpus.unpersist()


def test_segment_dedup_at_100k(spark):
    """Segment dedup at 100k docs on the production (xxhash64-keyed)
    path: with every source text replicated, EVERY segment is
    cross-document duplicated, so every document must reassemble to the
    empty string — a total-removal invariant that exercises the dup-set
    join at full selectivity. Replicas of one source also agree on
    (n_kept, n_removed)."""
    corpus = _big_corpus(spark).persist()
    try:
        out = dedup.segment_dedup(corpus, hash_segs=True)
        survivors = out.filter(F.col("n_kept") > 0).count()
        assert survivors == 0, f"{survivors} docs kept segments"
        assert out.count() == corpus.count()
    finally:
        corpus.unpersist()


def test_shuffle_shards_at_100k(spark):
    """Deterministic shuffle-sharding at 100k rows: exact partition,
    dense per-shard positions, and balance within 20% of the mean at
    64 shards (hash uniformity at volume)."""
    from alt_spark.operators.packing import shuffle_shards

    corpus = _big_corpus(spark).select("doc_id").persist()
    try:
        n = corpus.count()
        out = shuffle_shards(corpus, n_shards=64)
        stats = (
            out.groupBy("shard")
            .agg(
                F.count("*").alias("c"),
                F.max("pos").alias("mx"),
                F.count_distinct("pos").alias("dp"),
            )
            .persist()
        )
        try:
            assert stats.count() == 64
            bad = stats.filter(
                (F.col("mx") != F.col("c") - 1) | (F.col("dp") != F.col("c"))
            ).count()
            assert bad == 0
            sizes = [r["c"] for r in stats.collect()]
            mean = n / 64
            assert max(sizes) < 1.2 * mean and min(sizes) > 0.8 * mean, (
                min(sizes),
                max(sizes),
            )
        finally:
            stats.unpersist()
    finally:
        corpus.unpersist()


def test_incremental_lsh_against_stored_index(spark, tmp_path):
    """The daily-batch near-dup workflow: the base corpus is banded ONCE
    and written to storage; a new batch signs only itself and joins the
    stored index. Every planted new-vs-base duplicate is found without
    recomputing base signatures, within-batch duplicates are found too,
    and the incremental pair set equals the full-recompute pair set
    restricted to pairs touching the new batch."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") < 400)
    base_bands_path = str(tmp_path / "base_bands")
    dedup.band_rows(dedup.minhash_signatures(base)).write.parquet(base_bands_path)

    # Increment: 30 fresh docs, 5 exact copies of base docs, and one
    # in-batch duplicated pair.
    fresh = docs.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 430)).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    copies = base.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    pair = docs.filter(F.col("doc_id") == 450).select(
        F.explode(F.array(F.lit(300001), F.lit(300002))).alias("doc_id"), "text"
    )
    new = fresh.unionByName(copies).unionByName(pair)

    # Rerun overlap: doc 10 is ALREADY in the stored index and gets
    # re-submitted verbatim in the batch (retry after partial failure).
    resubmit = base.filter(F.col("doc_id") == 10)
    new = new.unionByName(resubmit)

    stored = spark.read.parquet(base_bands_path)
    got = dedup.lsh_incremental_pairs(
        dedup.minhash_signatures(new), stored
    ).collect()
    vs_base = {(r["new_id"], r["match_id"]) for r in got if r["in_base"]}
    within = {(r["new_id"], r["match_id"]) for r in got if not r["in_base"]}
    for i in range(5):
        assert (200000 + i, i) in vs_base, f"copy of base doc {i} missed"
    assert (300001, 300002) in within
    # The resubmitted id must not pair with its own stale index rows,
    # and no logical pair may appear under both flags.
    assert (10, 10) not in vs_base and (10, 10) not in within
    assert not ({tuple(sorted(p)) for p in vs_base}
                & {tuple(sorted(p)) for p in within})
    # Parity with a full recompute over base ∪ new.
    full = dedup.lsh_candidate_pairs(
        dedup.minhash_signatures(base.unionByName(new))
    ).collect()
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    full_touching_new = {
        (r["id1"], r["id2"])
        for r in full
        if r["id1"] in new_ids or r["id2"] in new_ids
    }
    norm = {tuple(sorted(p)) for p in (vs_base | within)}
    assert norm == {tuple(sorted(p)) for p in full_touching_new}


def test_incremental_exact_dedup_against_stored_hashes(spark, tmp_path):
    """Exact-dedup increment workflow: batch-internal first-wins dedup,
    then anti-join against the stored hash index; survivors ∪ index
    equals a full-recompute dedup of base ∪ batch (by content)."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") < 400)
    hpath = str(tmp_path / "hashes")
    base.select(F.xxhash64("text").alias("h")).distinct().write.parquet(hpath)

    fresh = docs.filter(F.col("doc_id") >= 400).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    base_copies = base.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    in_batch_dup = fresh.filter(F.col("doc_id") == 100400).select(
        (F.col("doc_id") + 300000).alias("doc_id"), "text"
    )
    new = fresh.unionByName(base_copies).unionByName(in_batch_dup)

    stored = spark.read.parquet(hpath)
    kept = dedup.exact_dedup_incremental(new, stored).persist()
    try:
        ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
        assert not any(200000 <= i < 200010 for i in ids), "base copies must drop"
        assert 100400 in ids and 400400 not in ids, "first-wins within batch"
        # survivors' texts ∪ base texts == full dedup of the union
        full = (
            base.unionByName(new)
            .select(F.xxhash64("text").alias("h"))
            .distinct()
            .count()
        )
        assert kept.count() + stored.count() == full
    finally:
        kept.unpersist()


def test_corpus_prep_pipeline_at_100k(spark):
    """q66's composed 5-stage plan at 100k docs with a wall-time bound:
    validity -> exact dedup -> decontamination -> mixing -> packing as
    ONE lazy composition over a replicated corpus. Invariants that must
    survive volume: dedup collapses every replica group to one
    survivor, the decontamination side stays broadcast, every packed
    bin respects budget + one-doc overflow, and the whole composition
    finishes inside the smoke budget."""
    import time

    from alt_spark.operators.mixing import stratified_sample
    from alt_spark.operators.packing import pack_contiguous
    from alt_spark.plans import audit

    t0 = time.time()
    docs = load_table(spark, SF, "documents").select("doc_id", "lang", "text")
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    corpus = docs.crossJoin(reps).select(
        (F.col("doc_id") * REPLICAS + F.col("rep")).alias("doc_id"),
        F.col("lang"),
        F.concat(
            F.col("text"), F.lit(" variant "), (F.col("rep") % 7).cast("string")
        ).alias("text"),
    )
    toks = F.filter(F.split(F.lower(F.col("text")), r"\W+"), lambda x: x != "")
    sized = corpus.withColumn("n_tok", F.size(toks).cast("long"))
    valid = sized.filter((F.length("text") >= 100) & (F.col("n_tok") >= 20))
    deduped = dedup.exact_dedup(valid).drop("n_dups")
    bench = corpus.filter(F.col("doc_id") % (50 * REPLICAS) == 0)
    clean = dedup.decontaminate(
        deduped.filter(F.col("doc_id") % (50 * REPLICAS) != 0),
        bench,
        n=5,
        hash_grams=True,
    )
    rates = {r[0]: 8000 for r in docs.select("lang").distinct().collect()}
    mixed = stratified_sample(clean, rates, "lang", "doc_id")
    binned = pack_contiguous(
        mixed.select("lang", "doc_id", "n_tok"),
        "n_tok",
        256,
        shard_col="lang",
        order_col="doc_id",
    )
    plan = audit.physical_plan(binned)
    assert "BroadcastHashJoin" in plan  # decon gram set broadcasts
    assert not audit.single_partition_data_exchanges(binned)
    per_bin = binned.groupBy("lang", "bin").agg(
        F.sum("n_tok").alias("tok_sum"), F.max("n_tok").alias("max_tok")
    )
    # Contiguous packing bound: a bin exceeds the budget only by its
    # one overflowing document.
    overfull = per_bin.filter(
        F.col("tok_sum") > 256 + F.col("max_tok")
    ).count()
    assert overfull == 0
    # Dedup collapsed each (source, variant) replica family to one row:
    # survivors of the valid set == distinct valid texts.
    n_survivors = deduped.count()
    n_distinct = valid.select("text").distinct().count()
    assert n_survivors == n_distinct
    assert time.time() - t0 < 150, "composed q66 smoke exceeded budget"


def test_quality_gate_pipeline_at_100k(spark):
    """q72's fused composed plan at 100k docs with a wall-time bound:
    validity + repetition metrics carried through the LM scorer's
    aggregation (one corpus scan). Replicas of one source text are
    byte-identical here, so every gate input — t2, n_chars, n_grams,
    freq_checksum — must agree across replicas: each source family is
    kept or dropped ATOMICALLY at volume."""
    import time

    from alt_spark.functions.text_analysis import repetition_metrics
    from alt_spark.operators.dedup import tokens_col
    from alt_spark.operators.lm import score_against_lm, train_char_lm
    from alt_spark.operators.mixing import sample_bucket

    t0 = time.time()
    docs = load_table(spark, SF, "documents").select("doc_id", "lang", "text")
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    corpus = docs.crossJoin(reps).select(
        (F.col("doc_id") * REPLICAS + F.col("rep")).alias("doc_id"),
        (F.col("doc_id")).alias("src_id"),
        F.col("lang"),
        F.col("text"),
    ).persist()
    try:
        toks_layer = corpus.select(
            "doc_id",
            "src_id",
            "lang",
            "text",
            F.length("text").alias("n_chars"),
            tokens_col("text").alias("toks"),
        )
        valid = toks_layer.filter(
            (F.col("n_chars") >= 100) & (F.size("toks") >= 20)
        )
        rep = valid.select(
            "doc_id",
            "src_id",
            "lang",
            "text",
            "n_chars",
            repetition_metrics(F.col("toks"), 2)["top_cov"].alias("t2"),
        )
        model = train_char_lm(
            corpus.filter(sample_bucket("doc_id", "lm-train-v1") < 2000),
            n=3,
            min_count=5,
        )
        scored = score_against_lm(
            rep, model, n=3, carry=("src_id", "lang", "n_chars", "t2")
        )
        kept = scored.filter(
            (F.expr("(10000 * t2) div n_chars") <= 2000)
            & (
                F.expr(
                    "((10000 * CAST(freq_checksum AS DECIMAL(38,0)))"
                    " div n_grams) div model_total"
                )
                >= 56
            )
        )
        # Atomic family decisions: every source is kept by all replicas
        # or none. (Replica texts are identical, metrics are per-row
        # deterministic, the model is shared.)
        fam = kept.groupBy("src_id").count().filter(
            F.col("count") % REPLICAS != 0
        )
        assert fam.count() == 0, "a replica family split across the gate"
        assert kept.count() > 0
        assert time.time() - t0 < 150, "composed q72 smoke exceeded budget"
    finally:
        corpus.unpersist()


def test_connected_components_at_100k(spark):
    """CC at 100k nodes with a wall-time bound: 20k planted 5-node
    clusters (the near-dup shape) plus one 1k-node path (the
    adversarial diameter shape) in ONE graph. Pointer jumping must
    converge inside the default round budget and label every planted
    cluster with its min id."""
    import time

    from alt_spark.operators.graph import connected_components

    t0 = time.time()
    n_clusters, k = 20_000, 5
    # Cluster c = nodes [c*k, c*k+k): star edges to the min node.
    stars = spark.range(n_clusters * k).selectExpr(
        "id AS id1", f"(id div {k}) * {k} AS id2"
    ).filter("id1 != id2")
    base = 1_000_000
    path = spark.range(999).selectExpr(
        f"id + {base} AS id1", f"id + {base} + 1 AS id2"
    )
    labels = connected_components(stars.unionByName(path))
    rows = labels.count()
    assert rows == n_clusters * k + 1000
    bad = labels.filter(
        (F.col("id") < base) & (F.col("comp") != (F.col("id") / k).cast("long") * k)
    ).count()
    assert bad == 0
    path_bad = labels.filter(
        (F.col("id") >= base) & (F.col("comp") != base)
    ).count()
    assert path_bad == 0
    assert time.time() - t0 < 120, "CC smoke exceeded budget"


def test_epoch_expand_at_100k(spark):
    """Plan→draw at 100k docs / 6 skewed strata (one tiny stratum that
    sqrt tempering pushes past 1 epoch): every stratum's drawn tokens
    must land within one document of its planned_tok, at volume, inside
    a wall budget."""
    import time

    from alt_spark.operators.mixing import PRECISION, epoch_expand, token_budget_plan

    t0 = time.time()
    df = spark.range(100_000).selectExpr(
        "id AS doc_id",
        "CASE WHEN id < 500 THEN 'tiny' ELSE concat('s', CAST(id % 5 AS STRING)) END"
        " AS stratum",
        "CAST(1 + pmod(id * 2654435761, 97) AS LONG) AS n_tok",
    )
    plan = token_budget_plan(
        df, "stratum", "n_tok", budget_tokens=2_000_000, epoch_cap_permyriad=30_000
    )
    pl = {r["stratum"]: r.asDict() for r in plan.collect()}
    assert pl["tiny"]["epochs_permyriad"] > PRECISION, "tempering must oversample tiny"
    drawn = epoch_expand(df, plan, "stratum", "doc_id", "n_tok")
    got = {
        r["stratum"]: r["tok"]
        for r in drawn.groupBy("stratum")
        .agg(F.sum("n_tok").alias("tok"))
        .collect()
    }
    mx = {
        r["stratum"]: r["mx"]
        for r in df.groupBy("stratum").agg(F.max("n_tok").alias("mx")).collect()
    }
    for s, p in pl.items():
        d = got.get(s, 0)
        assert p["planned_tok"] <= d < p["planned_tok"] + mx[s], (
            s, p["planned_tok"], d, mx[s],
        )
    assert time.time() - t0 < 120, "epoch_expand smoke exceeded budget"


def test_connected_components_worst_case_diameter_round_bound(spark):
    """Executable witness for the O(log n) claim (VERDICT r6 item 6): a
    100k-node SINGLE path is the worst-case-diameter topology — naive
    neighbor-min propagation would need ~100k rounds; alternating
    min-propagation + pointer jumping must converge in <= ceil(log2 n)
    + 3 (measured: 11 rounds at n=1024, 15 at 16384, 17 at 100000 —
    ceil(log2 n) + 1 across three decades)."""
    import math
    import time

    from alt_spark.operators import graph
    from alt_spark.operators.graph import connected_components

    graph._CC_CACHE.clear()  # a hit would report 0 rounds and prove nothing
    t0 = time.time()
    n = 100_000
    pairs = spark.range(n - 1).selectExpr("id AS id1", "id + 1 AS id2")
    rounds: list[int] = []
    labels = connected_components(pairs, max_iters=60, rounds_out=rounds)
    assert labels.filter(F.col("comp") != 0).count() == 0
    assert labels.count() == n
    assert rounds[0] <= math.ceil(math.log2(n)) + 3, rounds
    assert time.time() - t0 < 120, "worst-case path smoke exceeded budget"
    graph._CC_CACHE.clear()


def test_training_export_at_100k(spark, tmp_path):
    """End-of-pipeline export at 100k rows / 64 shards: the staged
    layout must be one parquet file per shard (the data-loader claim
    unit — proves the repartition(shard) co-location held at volume),
    and the manifest must certify exactly the input (totals + per-shard
    fingerprints match an independent recompute)."""
    import glob
    import os
    import time

    from alt_spark.operators.packing import shuffle_shards
    from alt_spark.sources.training_export import (
        export_packed_corpus,
        read_export_manifest,
    )

    corpus = _big_corpus(spark)
    sharded = shuffle_shards(corpus, n_shards=64).select(
        "doc_id", "text", "shard"
    )
    out = str(tmp_path / "export100k")
    t0 = time.time()
    manifest = export_packed_corpus(sharded, out, "shard")
    elapsed = time.time() - t0
    assert manifest["n_rows"] == 100_000 and manifest["n_shards"] == 64
    assert manifest == read_export_manifest(out)
    # One file per shard: partitionBy after the shard repartition may
    # not scatter a shard across tasks.
    for d in glob.glob(os.path.join(out, "v0", "data", "shard=*")):
        parts = [p for p in os.listdir(d) if p.endswith(".parquet")]
        assert len(parts) == 1, (d, parts)
    expect = {
        r["shard"]: (r["n"], r["h"])
        for r in sharded.groupBy("shard")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("doc_id", "text")).alias("h"),
        )
        .collect()
    }
    got = {s["shard"]: (s["n_rows"], s["content_hash"]) for s in manifest["shards"]}
    assert got == expect
    assert elapsed < 120, f"export took {elapsed:.1f}s"


def test_span_coverage_at_100k(spark):
    """Substring-grain coverage at 100k docs: every replicated document
    shares all interior 8-token windows with its siblings, so coverage
    must be near-total for every row, the surface must stay complete
    (one row per doc), and the plan must complete at volume without an
    all-pairs stage (window explosion is in-row; the duplicate set is
    one key-bucketed groupBy)."""
    corpus = _big_corpus(spark).persist()
    try:
        n = corpus.count()
        cov = dedup.duplicate_span_coverage(corpus, width=8)
        stats = cov.agg(
            F.count("*").alias("rows"),
            F.min(
                F.expr("(10000 * dup_tokens) div greatest(n_tok, 1)")
            ).alias("min_pm"),
        ).first()
        assert stats["rows"] == n
        # every doc is a replica: at minimum the windows clear of the
        # trailing variant tokens are shared -> coverage stays high
        assert stats["min_pm"] >= 8000, stats
    finally:
        corpus.unpersist()


def test_exact_k_sample_at_100k(spark):
    """Exact-k carve at 100k rows: the bucket prefilter must hold the
    rank window to ~oversample*k survivors per stratum (asserted via
    the selected buckets all sitting under the tiny threshold), return
    exactly k rows per stratum, and agree with itself under
    repartitioning."""
    from alt_spark.operators.mixing import exact_k_sample

    corpus = _big_corpus(spark).withColumn(
        "stratum", (F.col("doc_id") % 4).cast("string")
    ).persist()
    try:
        k = 50
        sel = exact_k_sample(corpus, k, "stratum", "doc_id").persist()
        try:
            counts = dict(
                (r["stratum"], r["n"])
                for r in sel.groupBy("stratum")
                .agg(F.count("*").alias("n"))
                .collect()
            )
            assert set(counts) == {"0", "1", "2", "3"}
            assert all(v == k for v in counts.values()), counts
            # prefilter actually pruned: k smallest of ~25k rows per
            # stratum sit FAR below the full 60-bit hash range
            assert sel.agg(F.max("hkey")).first()[0] < (1 << 60) // 100
            again = exact_k_sample(
                corpus.repartition(17), k, "stratum", "doc_id"
            )
            a = {tuple(r) for r in sel.select("stratum", "rank", "doc_id").collect()}
            b = {tuple(r) for r in again.select("stratum", "rank", "doc_id").collect()}
            assert a == b
        finally:
            sel.unpersist()
    finally:
        corpus.unpersist()


def _synth_vecs(spark, ids, scale="1.0D", dim=32):
    """Deterministic 32-dim vectors with INDEPENDENT per-component
    signs: component d of the vector seeded by ``src`` is
    xxhash64(src, d) mapped to [-1, 1]. (A sin(a + d*b) generator is a
    trap here: the sign pattern across d is quasi-periodic with period
    2*pi/(b mod 2*pi), so band keys collapse into a few hundred
    buckets and the candidate join explodes — found the hard way.)
    ``ids`` is a DataFrame with columns (vec_id, src); scaling by a
    positive factor preserves every sign bit (all bands collide) and
    leaves the cosine at exactly 1.0."""
    return ids.select(
        "vec_id",
        F.expr(
            f"transform(sequence(0, {dim - 1}), "
            f"d -> CAST({scale} * (CAST(xxhash64(src, d) AS DOUBLE) "
            f"/ 9.223372036854776e18) AS DOUBLE))"
        ).alias("embedding"),
    )


def test_embedding_near_dup_at_100k(spark):
    """VERDICT r7 item 5: the embedding near-dup family at 100k vectors
    with planted perturbed duplicates — every planted pair is found,
    and the sign-band candidate count stays ~linear in N (the blocking
    really blocks; an all-pairs design would be ~5e9 here). band_bits
    scales with corpus size exactly like MinHash banding: 16-bit keys
    give 2 bands x 65536 buckets over 32 dims, ~N/65536 vectors per
    bucket."""
    from alt_spark.operators import ann

    N, K, BB = 100_000, 500, 16
    base_ids = spark.range(N).select(
        F.col("id").alias("vec_id"), F.col("id").alias("src")
    )
    # Planted duplicates: ids N..N+K-1 are positively scaled copies of
    # vectors 0..K-1 — identical sign pattern (all bands collide),
    # cosine exactly 1.0.
    dup_ids = spark.range(K).select(
        (F.col("id") + N).alias("vec_id"), F.col("id").alias("src")
    )
    corpus = _synth_vecs(spark, base_ids).unionByName(
        _synth_vecs(spark, dup_ids, scale="1.001D")
    )
    found = {
        (r["id_a"], r["id_b"])
        for r in ann.embedding_near_dup(
            corpus, threshold=0.999, band_bits=BB
        ).collect()
    }
    planted = {(i, N + i) for i in range(K)}
    assert planted <= found, f"missed {sorted(planted - found)[:5]}"
    # Random 32-dim vectors essentially never reach cosine 0.999, so
    # the found set is the planted set plus at most stray noise.
    assert len(found) < K + 10, len(found)
    # Candidate-count bound: the blocking join's output is ~linear in
    # N (expected pairs/bucket ~ (N/65536)^2/2 per band), nowhere near
    # the N^2/2 ~ 5e9 of an all-pairs design.
    bands = ann.embedding_band_rows(corpus, band_bits=BB)
    n_cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .count()
    )
    n = N + K
    assert n_cand < 20 * n, f"candidate blowup: {n_cand} for n={n}"


def test_embedding_near_dup_incremental_at_100k(spark, tmp_path):
    """The daily-batch embedding workflow at scale: the 100k base is
    banded ONCE and written to storage; a batch bands only itself,
    equi-joins the stored index, and finds every planted new-vs-base
    duplicate plus in-batch pairs — with a resubmitted id excluded
    from its own stale rows, matching the full-recompute pair set
    restricted to the batch."""
    from alt_spark.operators import ann

    N, BB = 100_000, 16
    base_ids = spark.range(N).select(
        F.col("id").alias("vec_id"), F.col("id").alias("src")
    )
    base = _synth_vecs(spark, base_ids)
    idx_path = str(tmp_path / "sign_bands")
    ann.embedding_band_rows(base, band_bits=BB).write.parquet(idx_path)

    fresh = spark.range(100).select(
        (F.col("id") + 500_000).alias("vec_id"),
        (F.col("id") + 500_000).alias("src"),
    )
    copies = spark.range(50).select(  # scaled copies of base 0..49
        (F.col("id") + 600_000).alias("vec_id"), F.col("id").alias("src")
    )
    pair = spark.range(2).select(  # one in-batch duplicate pair
        (F.col("id") + 700_000).alias("vec_id"),
        F.lit(999_999).cast("long").alias("src")
    )
    resubmit = spark.range(1).select(  # id 10 retried verbatim
        F.lit(10).cast("long").alias("vec_id"),
        F.lit(10).cast("long").alias("src")
    )
    batch = (
        _synth_vecs(spark, fresh)
        .unionByName(_synth_vecs(spark, copies, scale="1.001D"))
        .unionByName(_synth_vecs(spark, pair))
        .unionByName(_synth_vecs(spark, resubmit))
    )
    stored = spark.read.parquet(idx_path)
    got = ann.embedding_near_dup_incremental(
        batch, stored, base, threshold=0.999, band_bits=BB
    ).collect()
    vs_base = {(r["new_id"], r["match_id"]) for r in got if r["in_base"]}
    within = {(r["new_id"], r["match_id"]) for r in got if not r["in_base"]}
    for i in range(50):
        if i == 10:
            # vec 10 is resubmitted IN the batch, so its copy pairs
            # with the batch-side vector (in_base=false), never with
            # its own stale index rows — the rerun-safety rule.
            assert (10, 600_010) in within, "resubmitted pair missed"
            assert (600_010, 10) not in vs_base
            continue
        assert (600_000 + i, i) in vs_base, f"copy of base vec {i} missed"
    assert (700_000, 700_001) in within
    assert (10, 10) not in vs_base and (10, 10) not in within
    # Parity with the full form restricted to pairs touching the batch.
    full = ann.embedding_near_dup(
        base.filter(F.col("vec_id") != 10).unionByName(batch),
        threshold=0.999,
        band_bits=BB,
    ).collect()
    batch_ids = {r["vec_id"] for r in batch.select("vec_id").collect()}
    full_touching = {
        tuple(sorted((r["id_a"], r["id_b"])))
        for r in full
        if r["id_a"] in batch_ids or r["id_b"] in batch_ids
    }
    norm = {tuple(sorted(p)) for p in (vs_base | within)}
    assert norm == full_touching


def test_unigram_viterbi_at_100k_word_types(spark):
    """The in-row Viterbi fold at 100k DISTINCT word types (the real
    corpus collapses to ~31; this drives the DP itself at volume):
    deterministic synthetic words up to 12 chars from md5 hex (no
    vocabulary hits beyond singles/UNK needed for cost), every word
    must segment (UNK fallback guarantees reachability), the score of
    an all-miss word is linear in its length, and the plan stays
    shuffle-bounded (the DP adds no exchange)."""
    from alt_spark.operators.unigram import UNK_MILLI, viterbi_segment
    from alt_spark.plans import audit

    n = 100_000
    words = spark.range(n).select(
        F.substring(F.md5(F.col("id").cast("string")), 1, (F.col("id") % 12 + 1).cast("int"))
        .alias("word")
    )
    seg = words.withColumn("r", viterbi_segment(F.col("word")))
    out = seg.select(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("r.seg").isNull() | (F.col("r.seg") == ""), 1).otherwise(0)).alias(
            "unsegmentable"
        ),
        F.max(F.length("word")).alias("max_len"),
    ).collect()[0]
    assert out["n"] == n
    assert out["unsegmentable"] == 0
    assert out["max_len"] == 12
    # hex alphabet: digits fall to UNK, a-f are vocab singles — every
    # per-char score is one of the two floors, so any word's score is
    # bounded by its length times the worse floor.
    bad = seg.filter(
        (F.col("r.score") > F.length("word") * -4000)
        | (F.col("r.score") < F.length("word") * UNK_MILLI)
    ).count()
    assert bad == 0
    assert audit.shuffle_count(seg) == 0, audit.physical_plan(seg)


def test_heavy_hitters_at_100k_zipf(spark):
    """The sketch path at 100k rows of a deterministic Zipf-ish stream:
    key j appears ~N/(j+1) times (heavy head, long tail), so the top-10
    must be keys 0..9 with exact counts, the guard must hold, and the
    candidate surface stays partitions x k — never distinct-key-sized."""
    from alt_spark.operators.sketch import heavy_hitters, mg_summaries

    n = 100_000
    # id -> key via the harmonic CDF trick: key = floor(n / (id+1)) gives
    # key j exactly n/(j+1) - n/(j+2) ... simpler: key = id div (id div 300 + 1)
    # Deterministic Zipf-ish: key j = number of multiples — use j = n div (id+1)
    # which yields key value v appearing ~n/v^2... Instead pin the shape
    # directly: key = floor(sqrt(id)) gives key j appearing 2j+1 times —
    # linear growth, heaviest at the END; top-10 = keys 315..306.
    df = spark.range(n).selectExpr("CAST(CAST(floor(sqrt(id)) AS BIGINT) AS STRING) AS k")
    got = [
        (r["key"], r["cnt"])
        for r in heavy_hitters(df, "k", top_n=10, k=512).collect()
    ]
    import math

    true: dict[str, int] = {}
    for j in range(int(math.isqrt(n - 1)) + 1):
        lo, hi = j * j, min((j + 1) * (j + 1), n)
        true[str(j)] = hi - lo
    want = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == want
    # Candidate surface is bounded by partitions x k, not distinct keys.
    n_cand = mg_summaries(df, "k", 512).count()
    parts = df.rdd.getNumPartitions()
    assert n_cand <= parts * 512


def test_cohort_and_funnel_read_models_at_100k_users(spark):
    """VERDICT r8 item 6: q107/q108 collect per-user lists whose bound
    is CALENDAR-sized (distinct weeks; per-type event timestamps) —
    prove the bound holds at 100k users and the read models stay in
    the smoke budget. Synthetic year of activity: every user active in
    a deterministic subset of 52 weeks, and a signup/click/purchase
    trail with a known per-user event cap."""
    import time as _t

    import datetime as dt

    from alt_spark.queries.events_q import cohort_matrix

    t0 = _t.monotonic()
    n_users, n_weeks = 100_000, 52
    base = dt.date(2024, 1, 1)  # a Monday: week-truncation fixpoint
    users = spark.range(n_users).select(F.col("id").alias("user_id"))
    # User u is active in weeks {w : w % (1 + u % 7) == u % 3} — a
    # deterministic, skewed activity pattern; cohort week varies.
    weeks = spark.range(n_weeks).select(F.col("id").alias("w"))
    activity = (
        users.crossJoin(weeks)
        .filter(
            (F.col("w") % (F.lit(1) + F.col("user_id") % 7))
            == (F.col("user_id") % 3)
        )
        .select(
            "user_id",
            F.date_add(F.lit(base), (F.col("w") * 7).cast("int")).alias("wk"),
        )
    )
    matrix = cohort_matrix(activity)
    rows = matrix.collect()
    # The matrix is calendar-bounded, never user-bounded.
    assert 0 < len(rows) <= n_weeks * n_weeks
    # The per-user collected state is calendar-bounded: distinct weeks
    # per user can never exceed the window's week count.
    max_set = (
        activity.groupBy("user_id")
        .agg(F.size(F.collect_set("wk")).alias("sz"))
        .agg(F.max("sz"))
        .first()[0]
    )
    assert max_set <= n_weeks
    # Week-0 sanity: every cohort retains 10000 permyriad at offset 0.
    assert all(
        r["retained_permyriad"] == 10000
        for r in rows
        if r["week_offset"] == 0
    )

    # Funnel: each user emits <= 6 events (2 per type), so the per-user
    # collected lists are capped by construction — the q108 state bound.
    ev = (
        users.crossJoin(
            spark.range(6).select(F.col("id").alias("j"))
        )
        .filter(F.col("j") < (F.col("user_id") % 6) + 1)
        .select(
            "user_id",
            F.element_at(
                F.array(
                    F.lit("signup"), F.lit("click"), F.lit("purchase"),
                    F.lit("signup"), F.lit("click"), F.lit("purchase"),
                ),
                (F.col("j") + 1).cast("int"),
            ).alias("event_type"),
            (
                F.lit(dt.datetime(2024, 1, 1))
                + F.make_interval(days=(F.col("j") * 3 + F.col("user_id") % 5).cast("int"))
            ).alias("ts"),
        )
    )
    import alt_spark.queries.events_q as eq
    from unittest import mock

    with mock.patch.object(eq, "load_table", lambda *_a, **_k: ev):
        funnel = eq.q108(spark, "ignored").collect()
    ns = {r["stage"]: r["n_users"] for r in funnel}
    # Monotone funnel over a 100k-user log, all stages populated.
    assert ns[1] >= ns[2] >= ns[3] > 0
    assert ns[1] <= n_users
    # Collected per-user list sizes stay within the per-user event cap.
    max_lists = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_ev"))
        .agg(F.max("n_ev"))
        .first()[0]
    )
    assert max_lists <= 6
    assert _t.monotonic() - t0 < 150, "cohort/funnel smoke exceeded budget"


def test_grouped_top_k_survives_one_giant_group_at_100k(spark):
    """The salted top-k's reason to exist: ONE group holding all 100k
    candidates (the q117 shape — every corpus vector scores against
    one anchor). The row_number window form would funnel the whole
    corpus through a single reducer; the salted form must return the
    exact same rows with every stage-1 state bounded by an input
    partition."""
    import time as _t

    from alt_spark.operators.topk import grouped_top_k

    t0 = _t.monotonic()
    n = 100_000
    df = spark.range(n).repartition(32).select(
        F.lit("anchor0").alias("g"),
        F.col("id").alias("i"),
        ((F.col("id") * 7919) % 100_003).alias("score"),
    )
    got = [
        (r["rnk"], r["i"], r["score"])
        for r in grouped_top_k(
            df,
            ["g"],
            F.struct((-F.col("score")).alias("ns"), F.col("i").alias("ti")),
            F.struct("i", "score"),
            k=25,
        ).orderBy("rnk").collect()
    ]
    want = [
        (j + 1, r["i"], r["score"])
        for j, r in enumerate(
            df.orderBy(F.desc("score"), "i").limit(25).collect()
        )
    ]
    assert got == want
    assert _t.monotonic() - t0 < 60, "salted top-k smoke exceeded budget"


def test_unigram_em_scale_invariant_at_100k(spark):
    """Viterbi-EM vocabulary learning at 100k docs, with an exact
    oracle for free: uniform xN replication multiplies every piece
    count by N, leaving every c/T ratio — hence every milli-log-prob,
    every Viterbi decision, and the prune order — EXACTLY unchanged,
    so the learned vocabulary must equal the unreplicated corpus's
    piece-for-piece (scores identical, counts x200). min_piece_cnt is
    pinned to 1: the default threshold of 2 is an ABSOLUTE count, so a
    count-1 substring is seed-ineligible small but eligible x200 —
    the invariance argument only holds for ratio-pure selection rules
    (review finding; with the threshold disarmed every rule in the
    chain is a ratio or a rank)."""
    import time as _t

    from alt_spark.operators.unigram import learn_unigram_vocab

    t0 = _t.monotonic()
    docs = load_table(spark, SF, "documents").select("text")
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    big = docs.crossJoin(reps).select("text")
    params = dict(
        target_multi=16, rounds=2, max_piece_len=4, seed_multi=64,
        min_piece_cnt=1,
    )
    small = {
        r["piece"]: (r["milli_logp"], r["piece_cnt"])
        for r in learn_unigram_vocab(docs, **params).collect()
    }
    bigv = {
        r["piece"]: (r["milli_logp"], r["piece_cnt"])
        for r in learn_unigram_vocab(big, **params).collect()
    }
    assert set(small) == set(bigv)
    for p, (ms, cnt) in small.items():
        assert bigv[p] == (ms, cnt * REPLICAS), p
    assert _t.monotonic() - t0 < 240, "EM smoke exceeded budget"


def test_bloom_prefilter_at_100k(spark):
    """The Bloom decon prefilter at 100k docs. The benchmark is rep 0
    of every 50th SOURCE doc (10 docs), so the planted truth is known:
    the other 199 replicas of those sources share the source's interior
    grams and MUST all be candidates (no false negatives), while the
    ~97.6k other-source docs are clean except for cross-source gram
    collisions — the measured FP tail the prefilter's economics rest
    on. The replicated corpus is repartitioned before gram
    construction: a crossJoin inherits the 1-file scan's single
    partition, and 100k docs of shingling in one task is a 5-minute
    stall (measured) vs seconds spread over the cluster."""
    from alt_spark.operators.bloom import bloom_bitmap, bloom_hit
    from alt_spark.operators.dedup import shingles, tokens_col

    corpus = (
        _big_corpus(spark)
        .repartition(32, "doc_id")
        .select("doc_id", shingles(tokens_col("text"), 5).alias("grams"))
        .localCheckpoint()
    )
    is_bench = (F.col("doc_id") % 200 == 0) & (
        (F.col("doc_id") / 200).cast("long") % 50 == 0
    )
    bench_g = (
        corpus.filter(is_bench).select(F.explode("grams").alias("g")).distinct()
    )
    m = 1 << 20
    bitmap = bloom_bitmap(bench_g, "g", m_bits=m, salts=("bf1", "bf2"))
    rest = corpus.filter(~is_bench)
    probed = rest.crossJoin(F.broadcast(bitmap)).select(
        "doc_id",
        F.exists(
            "grams", lambda g: bloom_hit(F.col("bloom"), g, m, ("bf1", "bf2"))
        ).alias("is_cand"),
    ).localCheckpoint()
    n_rest = probed.count()
    n_cand = probed.filter("is_cand").count()
    truth = (
        rest.select("doc_id", F.explode("grams").alias("g"))
        .join(F.broadcast(bench_g), "g")
        .select("doc_id")
        .distinct()
        .localCheckpoint()
    )
    n_truth = truth.count()
    missed = truth.join(probed.filter("is_cand"), "doc_id", "left_anti").count()
    assert missed == 0, "false negative at scale"
    # Planted recall: every non-bench replica of a bench source shares
    # the source's interior grams, so truth covers all 10*199 of them.
    planted = rest.filter((F.col("doc_id") / 200).cast("long") % 50 == 0)
    n_planted = planted.count()
    planted_missed = planted.join(truth, "doc_id", "left_anti").count()
    assert n_planted == 10 * 199 and planted_missed == 0
    # The FP tail must stay a small fraction of the non-contaminated
    # corpus (the prefilter's whole point): at ~5% load the per-gram FP
    # is ~2.5e-3; allow a generous 20% of clean docs before failing.
    assert n_cand - n_truth <= max(100, (n_rest - n_truth) // 5), (
        n_rest,
        n_cand,
        n_truth,
    )


def test_exact_quantiles_at_1m_rows(spark):
    """The two-pass histogram refinement at 1M rows across skewed
    groups: exact order statistics verified against TakeOrdered truth,
    and the refinement input pinned at bucket scale (the bounded-memory
    claim at volume — a full-group sort would be 500k rows; the needed
    buckets hold ~n/512)."""
    from alt_spark.operators.quantile import exact_group_quantiles

    df = spark.range(1_000_000).select(
        F.when(F.col("id") % 2 == 0, "big")
        .when(F.col("id") % 10 < 8, "mid")
        .otherwise("tail")
        .alias("grp"),
        (F.xxhash64("id") % 10_000_000).alias("v"),
    )
    probs = (500, 990)
    out = {
        (r["grp"], r["q_permille"]): r
        for r in exact_group_quantiles(df, "v", "grp", probs, n_buckets=512).collect()
    }
    sizes = {r["grp"]: r["n"] for r in df.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert sizes["big"] == 500_000
    for grp, n in sizes.items():
        for p in probs:
            k = max((p * n + 999) // 1000, 1)
            row = out[(grp, p)]
            assert row["rank_k"] == k
            truth = (
                df.filter(F.col("grp") == grp)
                .orderBy("v")
                .limit(k)
                .orderBy(F.desc("v"))
                .limit(1)
                .collect()[0]["v"]
            )
            assert row["value"] == truth, (grp, p, k)


def test_hamming_blocked_pairs_at_100k_fingerprints(spark):
    """The pigeonhole block join (SimHash + image-aHash shared device)
    at 100k 64-bit fingerprints: planted near-twins (hamming <= 3 of a
    base fingerprint) must ALL pair with their base, the candidate
    stage must stay block-bounded (uniform random fingerprints agree on
    a 16-bit block with p = 2^-16, so candidates ~ 4 * n^2 / 65536 —
    never all-pairs), and no random pair may verify at hamming <= 3."""
    from pyspark.sql import functions as F

    from alt_spark.operators.dedup import hamming_blocked_pairs

    n = 100_000
    base = spark.range(n).select(
        F.col("id").alias("fid"),
        F.xxhash64(F.col("id").cast("string")).alias("h"),
    )
    # Every 1000th fingerprint gets a twin at hamming exactly 1 (flip
    # bit 7) under id + 10^9.
    twins = base.filter(F.col("fid") % 1000 == 0).select(
        (F.col("fid") + 1_000_000_000).alias("fid"),
        F.col("h").bitwiseXOR(F.lit(1 << 7)).alias("h"),
    )
    pairs = hamming_blocked_pairs(
        base.unionByName(twins), "h", "fid", max_hamming=3, bands=4
    ).collect()
    planted = {
        (r["fid"], r["fid"] + 1_000_000_000)
        for r in base.filter(F.col("fid") % 1000 == 0).collect()
    }
    got = {(r["id1"], r["id2"]) for r in pairs}
    assert planted <= got, f"missing planted twins: {planted - got}"
    for r in pairs:
        if (r["id1"], r["id2"]) in planted:
            assert r["hamming"] == 1
        else:
            # xxhash64 of distinct ids: a hamming <= 3 collision has
            # probability ~ 2^-46 per pair — any hit here means the
            # popcount verify is broken.
            assert r["hamming"] <= 3  # definitionally true; the real
            # assertion is that there are very few such rows:
    assert len(got - planted) < 5, f"{len(got - planted)} random near-collisions"


def test_triangle_wedge_fanout_bounded_on_100k_edge_star(spark):
    """q133's compact-forward schedule (operators/graph.py, factored
    r11) on the adversarial shape the orientation exists for: a 100k-
    edge star (one hub, 100k spokes) plus planted triangles. Without
    orientation the hub contributes ~100k²/2 wedges; WITH it every
    node's out-degree is <= sqrt(2m), so the wedge join input stays
    linear. Pins the bound AND exact triangle recovery."""
    from alt_spark.operators.graph import (
        compact_forward_triangles,
        orient_compact_forward,
    )

    n_spokes = 100_000
    star = spark.range(n_spokes).select(
        F.lit("hub").alias("t1"),
        F.concat(F.lit("s"), F.col("id").cast("string")).alias("t2"),
    )
    # 50 planted triangles hub–a_i–b_i plus the a_i–b_i closing edges.
    tri_edges = spark.range(50).select(
        F.concat(F.lit("s"), F.col("id").cast("string")).alias("t1"),
        F.concat(F.lit("s"), (F.col("id") + 50_000).cast("string")).alias("t2"),
    )
    edges = star.unionByName(tri_edges)
    o = orient_compact_forward(edges).localCheckpoint()
    m = o.count()
    assert m == n_spokes + 50
    max_out = (
        o.groupBy("src").agg(F.count("*").alias("d")).agg(F.max("d")).first()[0]
    )
    assert max_out <= int((2 * m) ** 0.5) + 1, max_out
    # Wedge-input volume under the cap: sum of outdeg*(outdeg-1) stays
    # ~linear, nowhere near the hub's unoriented ~5e9 wedges.
    wedges = (
        o.groupBy("src")
        .agg(F.count("*").alias("d"))
        .agg(F.sum(F.col("d") * (F.col("d") - 1)))
        .first()[0]
    )
    assert wedges <= 10 * m, wedges
    tris = compact_forward_triangles(o)
    assert tris.count() == 50
    # Each planted triangle exactly once, hub a corner of every one.
    corners = tris.select(
        F.array_sort(F.array("u", "v", "w")).alias("c")
    ).distinct()
    assert corners.count() == 50
    assert tris.filter(
        (F.col("u") == "hub") | (F.col("v") == "hub") | (F.col("w") == "hub")
    ).count() == 50


def test_containment_rarity_cap_at_100k(spark):
    """q132's scale lever at 100k docs: the rarity cap must bound every
    fingerprint bucket BY CONSTRUCTION (boilerplate shared by half the
    corpus never reaches the equi-join), and planted quotations —
    one doc's unique text embedded verbatim in another — must still
    clear the containment threshold through rare fingerprints alone.
    Production xxhash64 fingerprints (the q55 twin of q132's portable
    oracle form); the shapes, caps, and thresholds are q132's own."""
    from alt_spark.functions.text_analysis import winnowing_fingerprints
    from alt_spark.queries.pipeline_ops import (
        _CTN_K,
        _CTN_MAX_DF_PM,
        _CTN_MIN_FP,
        _CTN_THRESH_PM,
    )

    n = 100_000
    boiler = "all rights reserved contact the syndication desk for reuse terms"
    # ~30 distinct pseudo-words per doc -> plenty of rare fingerprints.
    uniq = F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit("w"),
                ((F.col("id") * 31 + i * 7919) % 99_991).cast("string"),
                F.lit(f"x{i}"),
            )
            for i in range(30)
        ],
    )
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.concat(uniq, F.lit(" " + boiler)))
        .otherwise(uniq)
        .alias("text"),
    )
    # Planted quotations: doc q+1 = "zz zz " + doc q's unique text +
    # trailer, for q % 1000 == 0 (100 directed pairs q -> q+1). Doc q+1
    # keeps its OWN id-derived words out so containment is clean.
    quoted = spark.range(0, n, 1000).select(
        (F.col("id") + 1).alias("doc_id"),
        F.concat(
            F.lit("zz zz "),
            F.concat_ws(
                " ",
                *[
                    F.concat(
                        F.lit("w"),
                        ((F.col("id") * 31 + i * 7919) % 99_991).cast("string"),
                        F.lit(f"x{i}"),
                    )
                    for i in range(30)
                ],
            ),
            F.lit(" qq trailing editorial commentary appended here"),
        ).alias("text"),
    )
    corpus = (
        docs.join(quoted.select("doc_id"), "doc_id", "left_anti")
        .unionByName(quoted)
        .persist()
    )
    try:
        fp = winnowing_fingerprints(corpus, k=_CTN_K, window=4, portable=False)
        allfps = fp.select("id", F.explode("fingerprints").alias("wm"))
        df_wm = allfps.groupBy("wm").agg(F.count("*").alias("df"))
        cap = _CTN_MAX_DF_PM * n // 10_000
        # The boilerplate fingerprints exist and exceed the cap...
        assert df_wm.filter(F.col("df") > cap).count() > 0
        rare = df_wm.filter(F.lit(10_000) * F.col("df") <= _CTN_MAX_DF_PM * n)
        # ...and after the cap, every surviving bucket is bounded.
        max_bucket = rare.agg(F.max("df")).first()[0]
        assert max_bucket <= cap, max_bucket
        fps = allfps.join(rare.select("wm"), "wm", "left_semi").persist()
        # Planted quotations clear the threshold through rare
        # fingerprints: containment(q in q+1) >= _CTN_THRESH_PM.
        planted = spark.range(0, n, 1000).select(
            F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
        )
        pair_fps = fps.join(F.broadcast(planted), fps["id"] == F.col("id_a"))
        sz = pair_fps.groupBy("id_a", "id_b").agg(F.count("*").alias("n_fp_a"))
        shared = (
            pair_fps.alias("a")
            .join(
                fps.select(F.col("id").alias("id_b"), F.col("wm").alias("bwm")).alias("b"),
                (F.col("a.id_b") == F.col("b.id_b")) & (F.col("a.wm") == F.col("b.bwm")),
            )
            .groupBy("a.id_a", "a.id_b")
            .agg(F.count("*").alias("shared"))
        )
        scored = sz.join(shared, ["id_a", "id_b"], "left").select(
            "id_a",
            "n_fp_a",
            F.expr(
                "CAST((10000 * coalesce(shared, 0)) div n_fp_a AS BIGINT)"
            ).alias("containment_pm"),
        )
        rows = scored.collect()
        assert len(rows) == 100
        assert all(r["n_fp_a"] >= _CTN_MIN_FP for r in rows)
        low = [r for r in rows if r["containment_pm"] < _CTN_THRESH_PM]
        assert not low, low[:5]
    finally:
        corpus.unpersist()


def test_integer_kmeans_assignment_at_100k_vectors(spark):
    """q137/q138's assignment stage at 100k vectors: the in-row argmin
    over the broadcast centroid array must stay ONE narrow pass — no
    exchange between the scan and the per-cluster summary — and every
    vector lands in exactly one of k clusters. 100k synthetic 64-dim
    integer vectors (hash-derived, so distinct and spread)."""
    from alt_spark.plans import audit

    k = 8
    dim = 64
    vecs = spark.range(100_000).selectExpr(
        "id AS vec_id",
        f"transform(sequence(1, {dim}),"
        " j -> pmod(xxhash64(id, j), 2000) - 1000) AS qv",
    )
    cents = vecs.filter(F.col("vec_id") < k).selectExpr(
        "CAST(vec_id AS INT) AS cluster", "qv"
    )
    cent_arr = cents.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("cluster", "qv"))).alias("cents")
    )

    def dist_to(x):
        return F.aggregate(
            F.zip_with(F.col("qv"), x["qv"], lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda s, v: s + v,
        )

    assigned = vecs.crossJoin(F.broadcast(cent_arr)).select(
        "vec_id",
        F.aggregate(
            F.col("cents"),
            F.struct(F.lit(2**62).cast("long").alias("d"), F.lit(-1).cast("int").alias("c")),
            lambda acc, x: F.when(
                dist_to(x) < acc["d"],
                F.struct(dist_to(x).alias("d"), x["cluster"].alias("c")),
            ).otherwise(acc),
        )["c"].alias("cluster"),
    )
    # One narrow pass over the vectors: the only shuffle in the whole
    # assignment plan is the k-row centroid collect_list aggregate on
    # the BROADCAST side (model-state-sized); the 100k vector side
    # flows scan -> project with no exchange.
    per_cluster = assigned.groupBy("cluster").count()
    assert audit.shuffle_count(assigned) <= 1, audit.physical_plan(assigned)
    rows = per_cluster.collect()
    assert sum(r["count"] for r in rows) == 100_000
    assert {r["cluster"] for r in rows} <= set(range(8))
    assert -1 not in {r["cluster"] for r in rows}
    assert len(rows) >= 2  # hash-spread vectors can't all collapse


def test_ivf_assign_rows_scan_local_at_100k(spark):
    """q143's increment path at 100k vectors: assigning a daily batch
    against STORED centroids is a pure projection — the vector side
    must flow scan -> project with NO exchange (the base corpus is
    never touched), and every row lands in exactly one list."""
    from alt_spark.operators import ann
    from alt_spark.plans import audit

    dim = 16
    vecs = spark.range(100_000).selectExpr(
        "id AS vec_id",
        f"transform(sequence(1, {dim}),"
        " j -> CAST(pmod(xxhash64(id, j), 2000) - 1000 AS DOUBLE)"
        " / 1000.0) AS embedding",
    )
    centroids = [
        [((i * 37 + j * 11) % 19 - 9) / 10.0 for j in range(dim)]
        for i in range(16)
    ]
    assigned = ann.ivf_assign_rows(vecs, centroids)
    assert audit.shuffle_count(assigned) == 0, audit.physical_plan(assigned)
    hist = assigned.groupBy("list_id").count().collect()
    assert sum(r["count"] for r in hist) == 100_000
    assert {r["list_id"] for r in hist} <= set(range(16))
    assert -1 not in {r["list_id"] for r in hist}


def test_pq_adc_codes_scan_at_100k(spark):
    """q146's ADC stage at 100k codes: the corpus-scale operand is the
    2-int CODES table joined against a BROADCAST of the anchor side
    (anchors x two k-long tables); the candidate scoring must add no
    shuffle beyond the final per-anchor top-k aggregation, and every
    ADC distance must equal the two-table-lookup arithmetic."""
    from alt_spark.plans import audit

    k = 4
    codes = spark.range(100_000).selectExpr(
        "id AS vec_id",
        f"CAST(pmod(xxhash64(id, 1), {k}) AS INT) AS code1",
        f"CAST(pmod(xxhash64(id, 2), {k}) AS INT) AS code2",
    )
    anchors = spark.createDataFrame(
        [(a, [10 * a + j for j in range(k)], [100 * a + j for j in range(k)])
         for a in range(10)],
        "aid long, t1 array<long>, t2 array<long>",
    )
    cand = codes.join(
        F.broadcast(anchors), F.col("vec_id") % 7 != F.col("aid")
    ).select(
        "aid",
        "vec_id",
        (
            F.element_at("t1", F.col("code1") + 1)
            + F.element_at("t2", F.col("code2") + 1)
        ).alias("adc_d2"),
    )
    assert audit.shuffle_count(cand) == 0, audit.physical_plan(cand)
    row = cand.filter((F.col("aid") == 3) & (F.col("vec_id") == 12345)).first()
    c = codes.filter(F.col("vec_id") == 12345).first()
    assert row["adc_d2"] == (10 * 3 + c["code1"]) + (100 * 3 + c["code2"])
    n = cand.count()
    assert n > 0


def test_otlp_logs_parse_scan_local_at_100k(spark):
    """q154's ingest shape at 100k envelope lines: from_json + the
    three-level lateral explode must stay pipeline-local inside the
    scan — zero exchanges before the per-(service, severity)
    aggregation's own shuffle — and every record must flatten."""
    from alt_spark.plans import audit
    from alt_spark.sources.otlp import parse_otlp_logs

    lines = spark.range(100_000).selectExpr(
        """concat(
             '{"resourceLogs":[{"resource":{"attributes":[{"key":"service.name",',
             '"value":{"stringValue":"svc-', CAST(id % 7 AS STRING), '"}}]},',
             '"scopeLogs":[{"scope":{"name":"s"},"logRecords":[',
             '{"timeUnixNano":"', CAST(1700000000000000000 + id AS STRING),
             '","severityNumber":9,"severityText":"INFO",',
             '"body":{"stringValue":"b', CAST(id AS STRING), '"},',
             '"attributes":[{"key":"k","value":{"stringValue":"v"}}]}]}]}]}'
           ) AS value"""
    )
    recs = parse_otlp_logs(lines)
    assert audit.shuffle_count(recs) == 0, audit.physical_plan(recs)
    agg = recs.groupBy("service_name").count().collect()
    assert sum(r["count"] for r in agg) == 100_000
    assert len(agg) == 7
