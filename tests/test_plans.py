"""Plan audits: the engine's scale conventions, test-enforced (SURVEY §4).

Every declared query's physical plan is checked for the global
invariants (no cartesian products, no unpruned full-width event scans),
and headline queries are pinned to the specific plan features they were
designed around (scan-level pushdown, broadcast dims, pre-aggregated
join inputs). A regression here means Catalyst stopped producing the
plan the query was written to get — the 100 TB contract, caught at
test scale.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from alt_spark.plans import audit
from alt_spark.queries import all_queries

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module", autouse=True)
def _raw_scoring_lineage():
    """Plan audits assert properties of RAW lineage (fused-scan shape,
    exchange counts, the 1-row cross-join allowlist); the production
    plan-keyed caches would wrap hot frames in checkpoint barriers —
    or, for the span/embedding families, run real Spark jobs at frame
    CONSTRUCTION time (the r7 ADVICE finding) — and make every such
    pin vacuous. Audit with every materialization switch off,
    module-wide: lm.SCORE_MATERIALIZE gates the scored-frame registry,
    dfcache.MATERIALIZE gates get_or_promote, the operator-local inner
    checkpoints (MinHash signatures, incremental band rows), and
    q100's survivor-manifest checkpoint."""
    from alt_spark.operators import ann, dedup, lm
    from alt_spark.plans import dfcache

    prev = lm.SCORE_MATERIALIZE
    prev_mat = dfcache.MATERIALIZE
    lm.SCORE_MATERIALIZE = False
    dfcache.MATERIALIZE = False
    for c in (
        lm._SCORE_CACHE,
        dedup._PAIR_CACHE,
        dedup._SPAN_DUP_CACHE,
        dedup._TRIM_CACHE,
        ann._SCORED_PAIR_CACHE,
    ):
        c.clear()
    try:
        yield
    finally:
        lm.SCORE_MATERIALIZE = prev
        dfcache.MATERIALIZE = prev_mat

# Queries allowed to contain a broadcast nested-loop (1-row cursor /
# corpus-stat cross joins — bounded by construction).
_NESTED_LOOP_OK = {
    # 1-row Bloom-bitmap frame crossed onto the corpus scan so the
    # candidate probe is an in-row expression (operators/bloom.py) —
    # bounded by construction (m_bits/32 longs in one row).
    "q122_bloom_decontamination",
    # 1-row node-count and per-iteration norm frames crossed onto the
    # node tables (q114's no-driver-collect device, twice per HITS
    # iteration) — all bounded by construction.
    "q124_hits_user_event",
    # q136's non-equi layout joins are all bounded by construction:
    # the far field broadcasts the <=64-row supernode table (the
    # adaptive-grid invariant grid_cells pins), the near field
    # broadcasts the <=40-row tag-cloud position table, and the bbox /
    # node-array frames are 1-row crosses (the BM25 stats-row device).
    "q136_force_layout_integer",
    # q137/q138: the k current centroids ride a 1-row broadcast (an
    # array of k structs) crossed onto the vector scan so assignment /
    # probe selection fold in-row — bounded by construction (k x dim
    # integers), the BM25 stats-row device at model-state size.
    "q137_kmeans_integer",
    "q138_ivf_ann_integer",
    # q143 reuses the q137/q138 device twice: the Lloyd fit's 1-row
    # broadcast centroid array on the base slice, and the increment /
    # anchor assignment against the same stored-centroid broadcast —
    # all bounded by construction (k x dim integers).
    "q143_ivf_incremental_update",
    # q146's per-subspace Lloyd fits ride the same 1-row centroid
    # broadcasts, and the ADC stage joins the corpus-scale CODES scan
    # against a broadcast of the anchor side (anchors x two k-long
    # distance tables — query-set-sized, the q102 broadcast-bench
    # device); the != predicate makes it cross-shaped by name only.
    "q146_pq_adc_integer",
    "q13_keyset_pagination",
    "q14_paged_window_count",
    "q18_tfidf_doc0",
    "q23_bm25",
    "q40_bm25_multiterm",
    "q41_keyword_extraction",
    # 1-row model-total frame crossed onto per-doc scores (operators/lm).
    "q65_charlm_score",
    # 1-row (tw, tn) totals frame crossed onto the stratum-sized count
    # table (operators/mixing.temperature_rates) — bounded by
    # construction, same device as the BM25/LM stats rows.
    "q70_temperature_mixing",
    # 1-row model_total frame crossed onto the per-doc gate rows
    # (the composed quality pipeline reuses q65's LM stats-row device).
    "q72_quality_gate_pipeline",
    # 1-row weight-total frame crossed onto the stratum-sized plan
    # table (operators/mixing.token_budget_plan, q70's device).
    "q74_token_budget_plan",
    # q79 materializes the q74 plan, so the same 1-row weight-total
    # cross join rides inside its broadcast plan side.
    "q79_epoch_expansion",
    # 1-row model-total frame from the q65 scorer (q76 reuses the
    # scoring chain; the cross join rides along even though the bucket
    # query only consumes the OOV column).
    "q76_ccnet_buckets",
    # 1-row corpus-token-total frame crossed onto the |ladder|-sized
    # coverage table (the BM25/LM stats-row device; left side is
    # bounded by the vocab ladder, right side is 1 row).
    "q89_vocab_coverage",
    # 1-row summary frame (n_rows/n_keys/max) crossed onto the
    # TakeOrdered top-5 heavy keys — both sides bounded by
    # construction (the skew-audit report surface).
    "q98_join_key_skew_audit",
    # 1-row collect_list(benchmark vectors) frame broadcast onto the
    # corpus scan — the benchmark side is eval-suite-sized by
    # construction (the q62 broadcast-bench device, vector form).
    "q102_semantic_decontamination",
    # 1-row n_docs frame crossed onto the vocabulary-pair count table
    # for the support gate (the BM25/LM stats-row device; left side
    # bounded by observed vocabulary pairs, right side is 1 row).
    "q129_collocation_lift",
    # Same 1-row n_docs support-gate cross, onto the gated bigram edge
    # table (bounded by observed adjacent-token pairs).
    "q133_collocation_triangles",
    # 1-row n_docs frame crossed onto the fingerprint doc-frequency
    # table for the rarity cap (bounded by distinct fingerprints,
    # right side is 1 row).
    "q132_containment_topk",
    # Two 1-row crosses: corpus count x clustered-mass (both 1-row
    # aggregates, the singleton complement) and corpus count onto the
    # size histogram (bounded by distinct cluster sizes) for yield_pm.
    "q135_dedup_yield_report",
    # 1-row bottleneck-total frame crossed onto the stratum-sized
    # count table (operators/mixing.target_mixture_rates, q70's
    # device).
    "q103_target_mixture_rebalance",
    # 1-row (min selected count) frame crossed onto the 1-row corpus
    # total for the heavy-hitters guarantee guard (operators/sketch.
    # heavy_hitters) — both sides 1 row by construction.
    "q110_heavy_hitters",
    # 1-row node-count frame crossed onto the node table in every
    # PageRank iteration (teleport term; the q70 stats-row device).
    "q114_pagerank_integer",
    # 1-row collect_list(anchor vectors) frame broadcast onto the
    # corpus scan — the anchor side is eval-sized by construction
    # (the q102 broadcast-bench device; contrastive-mining and
    # retrieval-metric forms share it).
    "q117_contrastive_pairs",
    "q119_retrieval_quality_metrics",
}


@pytest.fixture(scope="module")
def dfs(spark):
    # q69, q73, q77, q81, q87, q115, q118, q121, q49 and q120 are
    # excluded:
    # constructing q69 FITS an MLlib model (Pipeline.fit is an action —
    # percentile_cont pass + L-BFGS iterations); q73/q77/q81/q118 run
    # the connected-components convergence loop (one keyed join + count
    # per round), as does q121's composed index update; q87 runs the
    # full BPE merge loop and q115 the unigram
    # Viterbi-EM loop (per-round aggregate + collect); q49/q120 run a
    # REAL Structured-Streaming replay. All return driver-local frames
    # any plan audit would pass vacuously — real executor work inside
    # what should be plan-only audits. Their scan/broadcast invariants
    # are covered by their own property/parity tests.
    return {
        name: fn(spark, SF)
        for name, fn in all_queries().items()
        if name not in (
            "q69_quality_classifier",
            "q73_neardup_clusters",
            "q77_leakage_free_splits",
            "q81_cluster_representatives",
            "q87_bpe_vocab_learning",
            "q115_unigram_vocab_learning",
            "q118_ensemble_neardup_clusters",
            "q121_incremental_cluster_update",
            "q49_streaming_mv_replay",
            "q120_windowed_trending_tags",
        )
    }


def test_no_cartesian_products_anywhere(dfs):
    offenders = [n for n, df in dfs.items() if audit.has_cartesian_product(df)]
    assert not offenders, f"cartesian products in: {offenders}"


def test_fact_scans_are_column_pruned(dfs):
    """Queries touching events/lineitem must never read full-width rows."""
    wide = []
    for name, df in dfs.items():
        for schema in audit.read_schemas(df):
            if "props" in schema and name not in (
                "q16_conditional_extraction",
                "q38_map_guarded_extraction",
            ):
                wide.append((name, schema))
    assert not wide, f"props column read but unused: {wide}"


def test_filter_pushdown_reaches_scans(dfs):
    """Dim filters must appear as PushedFilters at the parquet scan."""
    assert any(
        "c_mktsegment" in f for f in audit.pushed_filters(dfs["q09_building_orders_per_day"])
    )
    # q08's literal date range must reach the orders scan. (q13's cursor
    # is computed in a subquery — nothing literal exists to push there.)
    assert any(
        "o_orderdate" in f for f in audit.pushed_filters(dfs["q08_customers_without_orders"])
    )


def test_dim_joins_broadcast(dfs):
    """Semi/inner dim joins ride broadcasts, not shuffles (C11)."""
    for q in ("q09_building_orders_per_day", "q15_brand_order_counts", "q26_hybrid_rrf"):
        assert audit.broadcast_join_count(dfs[q]) >= 1, q


def test_preaggregated_outer_join_stays_small(dfs):
    """q03's full-outer join must join two aggregated sides: its shuffle
    count stays at 2 groupBys + join exchanges, never raw-fact width."""
    assert audit.shuffle_count(dfs["q03_trend_buckets_full_outer"]) <= 5


# Queries allowed a raw-data SinglePartition exchange: global rank over
# dim-sized input (q10, documented there) and rankings over inputs
# already cut to a bounded top-k (q26).
_SINGLE_PARTITION_OK = {
    "q10_rrf_suppliers",
    "q26_hybrid_rrf",
    # q112's running-sum/position windows order the chunk frame of the
    # TOP-10 retrieved documents only (bounded by the q26 limit behind
    # a broadcast semi-join) — dim-sized by design, like q26's ranks.
    "q112_rag_context_assembly",
    # q142's rerank cap (ORDER BY score LIMIT max_candidates feeding
    # the scorer) plans as LocalLimit → SinglePartition → GlobalLimit:
    # every upstream task emits at most max_candidates rows into the
    # exchange (LocalLimit runs per partition), so the funnel carries
    # <= 64 x partitions rows by construction — the rerank service cap
    # (rerank.go:22-96), not a raw-data collapse.
    "q142_rerank_integer",
}


def test_no_raw_data_single_partition_exchanges(dfs):
    """No query may funnel non-aggregated rows into one partition (the
    global-window collapse) unless its input is dim-sized by design.
    The distributed form for large inputs is operators/rank.py."""
    offenders = {
        name: kinds
        for name, df in dfs.items()
        if name not in _SINGLE_PARTITION_OK
        and (kinds := audit.single_partition_data_exchanges(df))
    }
    assert not offenders, f"raw-data SinglePartition exchanges: {offenders}"


def test_single_partition_audit_catches_global_window(spark):
    """Negative control: the audit must flag the very shape it polices."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    df = spark.range(100).withColumn(
        "r", F.rank().over(Window.orderBy(F.desc("id")))
    )
    assert audit.single_partition_data_exchanges(df), (
        "audit failed to flag a global window's SinglePartition exchange"
    )


def test_no_unexpected_nested_loop_joins(dfs):
    offenders = []
    for name, df in dfs.items():
        if name in _NESTED_LOOP_OK:
            continue
        plan = audit.physical_plan(df)
        if "BroadcastNestedLoopJoin" in plan and "Cross" in plan:
            offenders.append(name)
    assert not offenders, f"unexpected cross-shaped nested loops: {offenders}"


def test_nginx_parse_expressions_not_duplicated(dfs):
    """The q48 parse chain must hold each expensive scan expression a
    bounded number of times. parse_logs layers its projections so
    CollapseProject cannot re-embed them, and http_logs filters above a
    single-element explode() so predicate pushdown cannot substitute the
    parse into the filter condition — without those guards the optimized
    plan carried 66 copies of the access regex and 90 of from_json per
    input row (measured r5, sf0.1: 6.2 s vs 2.2 s). Pin the property."""
    plan = audit.optimized_plan(dfs["q48_nginx_log_parse"])
    # Since r11 the query unions three producers and runs TWO parse
    # passes (http over all three, level/message over pg+meili only —
    # see the q48 docstring), so the STATIC counts scale with the five
    # parse-layer instances; the per-ROW bound is one instance: at most
    # 3 regexp_replace (nginx access / postgres / ANSI rewrites, each
    # service-gated so one fires) and 2 from_json (envelope + payload).
    assert plan.count("regexp_replace") <= 5 * 3, plan
    assert plan.count("from_json") <= 5 * 2, plan
    # The substitution hazard stays pinned: no pushed Filter may embed
    # the envelope parse (the r11 svc-filter incident: an isin() on the
    # derived service column pushed below the parse with 4 from_json
    # copies in the condition).
    for line in plan.split("\n"):
        if "Filter" in line:
            assert "from_json" not in line, line


def test_winnowing_is_map_only(spark):
    """The in-row winnowing formulation must compile to a shuffle-free
    plan: gram hashing + sliding minima are one narrow projection over
    the scan, so at 100 TB the operator adds zero exchanges. (The old
    explode + rowsBetween-window form shuffled one row per character
    gram — this pins the improvement.)"""
    from alt_spark.catalog import load_table
    from alt_spark.functions import text_analysis as ta

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    fp = ta.winnowing_fingerprints(docs)
    assert audit.shuffle_count(fp) == 0, audit.physical_plan(fp)


def test_chunking_is_map_only(spark):
    """Context-window chunking (operators/packing.chunk_tokens) is a
    single narrow projection — sequence/slice/posexplode in-row — so
    chunking 100 TB parallelizes exactly like scanning it: zero
    exchanges."""
    from pyspark.sql import functions as F

    from alt_spark.catalog import load_table
    from alt_spark.operators.packing import chunk_tokens

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), r"\W+"), lambda x: x != "")
    chunks = chunk_tokens(docs.withColumn("toks", toks), F.col("toks"), "doc_id")
    assert audit.shuffle_count(chunks) == 0, audit.physical_plan(chunks)


def test_stratified_sample_is_scan_local(spark):
    """The mixing filter must stay a narrow predicate over the scan
    (no exchange, no UDF): one md5 + integer mod per row."""
    from alt_spark.catalog import load_table
    from alt_spark.operators.mixing import stratified_sample

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    kept = stratified_sample(docs, {"en": 5000}, "lang")
    plan = audit.physical_plan(kept)
    assert audit.shuffle_count(kept) == 0, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_repetition_filter_is_shuffle_free(spark):
    """q64's metrics are in-row by design: the whole query must plan as
    a narrow projection over the documents scan — zero exchanges."""
    from alt_spark.queries import all_queries

    df = all_queries()["q64_repetition_filter"](spark, SF)
    assert audit.shuffle_count(df) == 0, audit.physical_plan(df)


def test_corpus_prep_pipeline_plan_shape(spark):
    """q66 composes five stages; the composed plan must keep each
    stage's scale contract: the benchmark-gram side of decontamination
    broadcasts, and nothing collapses to a single partition."""
    from alt_spark.queries import all_queries

    df = all_queries()["q66_corpus_prep_pipeline"](spark, SF)
    assert audit.broadcast_join_count(df) >= 1, audit.physical_plan(df)
    assert not audit.single_partition_data_exchanges(df)
    assert not audit.has_cartesian_product(df)


def test_quality_gate_pipeline_fused_scan(spark):
    """q72's r6 fused shape, plan-pinned: the repetition kernel runs
    ONCE per document below the gram explode (not once per gram row —
    the q48 duplication hazard), and the rep metrics ride the scorer's
    aggregation instead of a second corpus scan + doc_id re-join."""
    from alt_spark.operators import lm
    from alt_spark.queries import all_queries

    # Hermetic plan: if an earlier test materialized q72's LM model,
    # the persisted model substitutes as InMemoryRelation and the plan
    # PRINTER repeats the cached lineage (its internal exchange) inside
    # both consumers — inflating the textual exchange count without any
    # extra runtime shuffle. Release the model cache so the audited
    # plan is the cold-start one the bounds describe.
    for cached in lm._MODEL_CACHE.values():
        cached.unpersist()
    lm._MODEL_CACHE.clear()
    # (The r7 scored-frame registry is already disabled module-wide by
    # the _raw_scoring_lineage fixture — this audit sees raw lineage.)
    df = all_queries()["q72_quality_gate_pipeline"](spark, SF)
    opt = audit.optimized_plan(df)
    # repetition_metrics sorts the gram array in-row; if CollapseProject
    # ever re-embeds it above the Generate, the count explodes with the
    # gram multiplicity. One evaluation (plus one in a pushed filter
    # copy at most) is the designed bound.
    assert opt.count("array_sort") <= 2, opt
    phys = audit.physical_plan(df)
    # documents is read by exactly two scans: the fused metrics+gram
    # scan and the LM training slice. The r5 shape had four.
    assert phys.count("documents.parquet") <= 2, phys
    # The gates meet inside the scorer's aggregation — no extra
    # doc_id-keyed shuffle join between a rep frame and a scored frame.
    # The five remaining exchanges: model gram groupBy, 1-row
    # model-total agg, per-doc score groupBy, per-lang manifest
    # groupBy, final orderBy. The r5 two-path plan had the rep⋈scored
    # join's exchanges on top of these.
    assert audit.shuffle_count(df) <= 5, phys


def test_gopher_signals_shuffle_free(spark):
    """q75's signals are in-row by design: the whole query must plan as
    a narrow projection over the scan (plus the planted-row local union)
    — zero exchanges, no Python."""
    from alt_spark.queries import all_queries

    df = all_queries()["q75_gopher_signals"](spark, SF)
    plan = audit.physical_plan(df)
    assert audit.shuffle_count(df) == 0, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_footer_stats_pushes_aggregate_to_parquet_metadata(spark):
    """COUNT/MIN/MAX from footer statistics: the scoped DSv2 scan must
    carry PushedAggregation (zero data pages), values must equal a real
    scan, and the session's v1 parquet default must be restored so
    every other plan audit keeps its v1 shape."""
    from alt_spark.sources.metadata_scan import _V1_KEY, footer_stats

    before = spark.conf.get(_V1_KEY)
    path = f"{SF}/documents.parquet"
    st = footer_stats(spark, path, minmax_cols=("doc_id", "n_chars"))
    assert st["pushed"] is True
    real = spark.read.parquet(path).agg(
        F.count(F.lit(1)), F.min("doc_id"), F.max("doc_id"),
        F.min("n_chars"), F.max("n_chars"),
    ).first()
    assert st["n_rows"] == real[0]
    assert (st["min"]["doc_id"], st["max"]["doc_id"]) == (real[1], real[2])
    assert (st["min"]["n_chars"], st["max"]["n_chars"]) == (real[3], real[4])
    assert spark.conf.get(_V1_KEY) == before, "session conf must be restored"


def test_footer_stats_refuses_silent_fallback(spark):
    """A column without statistics pushdown support must raise under
    require_pushdown (the caller asked for metadata cost), and still
    return correct values when the fallback is accepted explicitly."""
    from alt_spark.sources.metadata_scan import footer_stats

    path = f"{SF}/documents.parquet"
    with pytest.raises(RuntimeError, match="not pushed"):
        footer_stats(spark, path, minmax_cols=("text",))
    st = footer_stats(
        spark, path, minmax_cols=("text",), require_pushdown=False
    )
    assert st["pushed"] is False and st["n_rows"] > 0
    assert st["min"]["text"] is not None


def test_contrastive_mining_plan_has_no_corpus_window(spark):
    """q117's per-anchor selection must compile to the SALTED two-stage
    top-k — no Window operator anywhere (a row_number window keyed on
    anchor would funnel each anchor's corpus-sized candidate set
    through one reducer), anchors riding in as one BroadcastExchange,
    and the whole mine within a bounded exchange budget (anchor agg +
    salted stage + k-bounded stage + output sort)."""
    df = all_queries()["q117_contrastive_pairs"](spark, SF)
    plan = audit.physical_plan(df)
    assert "Window" not in plan, plan
    assert "BroadcastExchange" in plan, plan
    assert audit.shuffle_count(df) <= 4, plan


def test_release_diff_is_one_scan_one_aggregate(spark):
    """q116 derives BOTH releases from one in-row projection: no join
    of two snapshots, no Python, exactly the class-aggregate exchange
    plus the 4-row output sort."""
    df = all_queries()["q116_release_doc_diff"](spark, SF)
    plan = audit.physical_plan(df)
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert audit.shuffle_count(df) <= 2, plan
