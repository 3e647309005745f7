"""Q17/Q18/Q23/Q24: text pipeline (SURVEY.md §2.I/J1-J2, Phase 3).

Tokenization contract shared by Q18/Q23/Q24 and the DuckDB oracles:
``lower(text)`` split on ``\\W+`` with empty tokens dropped — ASCII
semantics are identical in Java regex and RE2, so both engines produce
the same token stream (documents testdata is ASCII).

Scale notes: Q17/Q18/Q23 are hash-partitioned groupBy/window plans that
shuffle token- or hash-cardinality rows, not full documents — they hold
at 100 TB as-is. Q24 is the *exact* all-pairs shingle join, deliberately
restricted to a 50-doc pane; the unbounded-scale path is the MinHash-LSH
banded join in alt_spark.operators.dedup (SURVEY §2 I10/I12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from alt_spark.catalog import load_table
from alt_spark.functions.text_analysis import DDB_TOKENS as _DDB_TOKENS
from alt_spark.plans import dfcache as _dfcache
from alt_spark.queries import query


def _token_col():
    """Shared tokenizer (Spark side). DuckDB twin: _DDB_TOKENS (single
    definition in functions/text_analysis.py).

    Built lazily — Column construction needs an active SparkContext.
    """
    from alt_spark.operators.dedup import tokens_col

    return tokens_col("text")


def _tokens(spark: SparkSession, sf: str) -> DataFrame:
    """One row per (doc_id, token) occurrence."""
    docs = load_table(spark, sf, "documents")
    return docs.select("doc_id", F.explode(_token_col()).alias("token"))


# ---------------------------------------------------------------------------
@query(
    "q17_exact_dedup",
    oracle="""
WITH hashed AS (
  SELECT doc_id, lang, md5(text) AS h FROM documents
), ranked AS (
  SELECT lang, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
  FROM hashed
)
SELECT lang, count(*) AS survivors
FROM ranked WHERE rn = 1
GROUP BY lang
ORDER BY lang
""",
)
def q17(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup: content-hash first-wins keep, survivors per language.

    Reference: recap-worker/recap-worker/src/pipeline/dedup.rs:113-143 (I8) —
    XXH3-64 of the body, first occurrence kept. Declared with md5 for
    engine-portable oracle parity (Spark xxhash64 and DuckDB have no shared
    xxh3 seed contract); the hash choice doesn't change the operator shape.
    At scale this is one hash-partitioned window over the hash key — no
    skew (hashes are uniform), no all-pairs comparison.
    """
    docs = load_table(spark, sf, "documents")
    rn = F.row_number().over(Window.partitionBy("h").orderBy("doc_id"))
    return (
        docs.select("doc_id", "lang", F.md5(F.col("text")).alias("h"))
        .withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .groupBy("lang")
        .agg(F.count("*").alias("survivors"))
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
@query(
    "q18_tfidf_doc0",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({_DDB_TOKENS}) AS token FROM documents
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2
), df AS (
  SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1
), n AS (
  SELECT count(*) AS n FROM documents
)
SELECT tf.token AS token,
       tf.tf AS tf,
       df.df AS df,
       round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf
FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
WHERE tf.doc_id = 0
ORDER BY tfidf DESC, token
LIMIT 20
""",
)
def q18(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 TF-IDF tokens of doc 0 over the whole-corpus df/idf.

    Reference: recap-worker tokenize src/pipeline/preprocess.rs:316-344 (I6)
    + TF-IDF build src/classification/features.rs:166-234,309-326 (J1).
    idf = ln(N/df), tfidf = tf*idf. The corpus-wide df aggregation is the
    only wide stage (token-cardinality rows); N is a 1-row broadcast.
    """
    tok = _tokens(spark, sf)
    # tf of the query doc only: the doc_id==0 filter reaches the parquet
    # scan (PushedFilters), so this branch tokenizes one document.
    tf0 = (
        tok.filter(F.col("doc_id") == 0)
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    # df only for tokens that appear in the query doc: broadcast the tiny
    # query-vocab and semi-join the corpus token stream BEFORE the
    # aggregation. At 100 TB the alternative (df over the full vocabulary,
    # then broadcast) shuffles and collects a corpus-sized dictionary; this
    # plan reduces the wide stage to query-vocab cardinality. Per-doc
    # duplicate tokens collapse IN-ROW (array_distinct before the explode),
    # so rows are already unique per (doc, token) and df is a plain count
    # with map-side partial aggregation — an exact COUNT(DISTINCT doc_id)
    # would instead shuffle every (token, doc_id) pair to dedupe again.
    docs = load_table(spark, sf, "documents")
    dtok = docs.select(
        "doc_id", F.explode(F.array_distinct(_token_col())).alias("token")
    )
    df = (
        dtok.join(F.broadcast(tf0.select("token")), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("df"))
    )
    n = load_table(spark, sf, "documents").agg(F.count("*").alias("n"))
    return (
        tf0.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n))
        .select(
            "token",
            "tf",
            "df",
            F.round(F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 6).alias("tfidf"),
        )
        .orderBy(F.desc("tfidf"), "token")
        .limit(20)
    )


# ---------------------------------------------------------------------------
@query(
    "q23_bm25",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({_DDB_TOKENS}) AS token FROM documents
), doclen AS (
  SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1
), stats AS (
  SELECT count(*) AS n, avg(dl) AS avgdl FROM doclen
), tf AS (
  SELECT doc_id, count(*) AS tf FROM tok WHERE token = 'dup' GROUP BY 1
), idf AS (
  SELECT ln(1.0 + (stats.n - count(*) + 0.5) / (count(*) + 0.5)) AS idf
  FROM tf, stats GROUP BY stats.n
)
SELECT tf.doc_id AS doc_id,
       tf.tf AS tf,
       round(idf.idf * tf.tf * 2.2 /
             (tf.tf + 1.2 * (1 - 0.75 + 0.75 * doclen.dl / stats.avgdl)), 6) AS score
FROM tf
JOIN doclen ON tf.doc_id = doclen.doc_id
CROSS JOIN stats CROSS JOIN idf
ORDER BY score DESC, doc_id
LIMIT 10
""",
)
def q23(spark: SparkSession, sf: str) -> DataFrame:
    """BM25(k1=1.2, b=0.75) of the fixed query term 'dup', top-10 docs.

    Reference: recap-worker/recap-worker/src/classification/features.rs:327-344
    (J2), params model.rs:171-181. Okapi idf with the Lucene +1 floor:
    idf = ln(1 + (N - df + 0.5)/(df + 0.5)); score = idf·tf·(k1+1) /
    (tf + k1·(1 − b + b·dl/avgdl)). doclen/avgdl come from one token-level
    aggregation; the matching-docs side is df-sized (tiny), joined to
    per-doc lengths by key.
    """
    k1, b = 1.2, 0.75
    tok = _tokens(spark, sf)
    doclen = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = doclen.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    )
    tf = tok.filter(F.col("token") == "dup").groupBy("doc_id").agg(F.count("*").alias("tf"))
    matched = tf.crossJoin(F.broadcast(stats))
    idf = F.log(
        1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    df_cnt = tf.agg(F.count("*").alias("df"))
    return (
        matched.crossJoin(F.broadcast(df_cnt))
        .join(doclen, "doc_id")
        .select(
            "doc_id",
            "tf",
            F.round(
                idf
                * F.col("tf")
                * (k1 + 1)
                / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
                6,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
@query(
    "q24_shingle_jaccard",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_DDB_TOKENS} AS t FROM documents WHERE doc_id < 50
), sh AS (
  SELECT DISTINCT doc_id, t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS shingle
  FROM toks, unnest(range(len(t)-2)) AS u(i)
  WHERE len(t) >= 3
), sz AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
), inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT d1, d2, common,
       round(CAST(common AS DOUBLE) / (s1.n + s2.n - common), 6) AS jaccard
FROM inter
JOIN sz s1 ON s1.doc_id = d1
JOIN sz s2 ON s2.doc_id = d2
ORDER BY jaccard DESC, d1, d2
LIMIT 20
""",
)
def q24(spark: SparkSession, sf: str) -> DataFrame:
    """Exact 3-gram-shingle Jaccard over doc pairs (first 50 docs), top-20.

    Reference: recap-worker/recap-worker/src/pipeline/minhash.rs:52-64 (I10) —
    the exact Jaccard that MinHash estimates; dedup.rs:144-190 (I9) shingle
    candidate generation. Declared exact per SURVEY §2.Q: MinHash is the
    scale optimization (alt_spark.operators.dedup), validated ±ε in tests,
    not hash-matched. Candidate pairs come from an equi-join on the shingle
    key (inverted index), never a cross join — pairs sharing no shingle are
    never materialized.
    """
    docs = load_table(spark, sf, "documents").filter(F.col("doc_id") < 50)
    sh = (
        docs.select("doc_id", _token_col().alias("t"))
        .filter(F.size("t") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(0, size(t)-3),"
                        " i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"
                    )
                )
            ).alias("shingle"),
        )
    )
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").alias("common"))
    )
    return (
        inter.join(F.broadcast(sz.withColumnRenamed("doc_id", "d1").withColumnRenamed("n", "n1")), "d1")
        .join(F.broadcast(sz.withColumnRenamed("doc_id", "d2").withColumnRenamed("n", "n2")), "d2")
        .select(
            "d1",
            "d2",
            "common",
            F.round(F.col("common").cast("double") / (F.col("n1") + F.col("n2") - F.col("common")), 6).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "d1", "d2")
        .limit(20)
    )


# ---------------------------------------------------------------------------
@query(
    "q110_heavy_hitters",
    oracle=f"""
WITH tok AS (
  SELECT unnest({_DDB_TOKENS}) AS key FROM documents
)
SELECT key, count(*) AS cnt
FROM tok GROUP BY key
ORDER BY cnt DESC, key
LIMIT 10
""",
)
def q110(spark: SparkSession, sf: str) -> DataFrame:
    """Exact top-10 most frequent tokens via the heavy-hitters sketch
    path (weighted Misra-Gries candidates -> exact verification ->
    TakeOrdered; operators/sketch.py) — the 100 TB form of the
    reference's trending-tags query (trending_tags_driver.go:16-23)
    for keys whose cardinality outgrows a direct groupBy shuffle.

    The result is EXACT, not approximate: MG guarantees every key
    above N/(k+1) survives some partition summary, the verify pass
    recounts candidates exactly, and a loud assert_true guard raises
    at action time if the top-10 cut ever fails the exclusion
    inequality (min(cnt) x (k+1) > N) instead of returning silently
    wrong rows — which is what makes a sketch query oracle-checkable
    against the direct groupBy.
    """
    from alt_spark.operators.sketch import heavy_hitters

    docs = load_table(spark, sf, "documents")
    toks = docs.select(F.explode(_token_col()).alias("tok"))
    return heavy_hitters(toks, "tok", top_n=10, k=256).orderBy(
        F.desc("cnt"), "key"
    )


# ---------------------------------------------------------------------------
_WTT_K = 256       # sketch width for the windowed trending replay
_WTT_BATCHES = 3   # doc_id % 3 residues play the micro-batches
_WTT_WINDOW = (1, 2)  # trending window = the last two batches


@query(
    "q120_windowed_trending_tags",
    oracle=f"""
WITH tok AS (
  SELECT unnest({_DDB_TOKENS}) AS key FROM documents
  WHERE doc_id % {_WTT_BATCHES} IN {_WTT_WINDOW}
)
SELECT key, count(*) AS cnt
FROM tok GROUP BY key
ORDER BY cnt DESC, key
LIMIT 10
""",
)
def q120(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding-window trending tags through a REAL Structured-Streaming
    sketch replay (the q49 doctrine applied to the MG sketch): the
    corpus's token stream is re-landed as three files keyed by
    ``doc_id % 3`` (mtime-staggered so the file source's batch order is
    the residue order), folded through
    ``run_streaming_sketch(keep_per_batch=True)``, and the trending
    top-10 of the LAST TWO batches is reconstructed from their
    per-batch summaries alone (``windowed_sketch_state`` — mergeability
    makes that the exact sketch of the window) then exact-verified
    against the window's rows with the strict exclusion guard. Because
    batch membership is a doc_id residue, the whole streaming window is
    SQL-reproducible: the oracle is the plain top-10 over the window
    residues' tokens — a driver-hash-checkable STREAMING sketch query,
    the reference's actual trending-tags consumer shape
    (trending_tags_driver.go:16-23 reads a windowed slice).

    Scale shape: per-batch work is the narrow MG scan; the window
    reconstruction merges |window| x (k+1) rows regardless of stream
    volume; out-of-window batches age out as whole-directory drops.
    The re-landing stays EXECUTOR-side (per-residue Spark parquet
    writes — never a driver collect of the exploded token frame) and
    the replay runs availableNow so the timeout is real (both review
    findings, r9).
    """
    import os
    import shutil
    import tempfile
    import time
    import uuid

    from alt_spark.operators.dedup import tokens_col
    from alt_spark.streaming.landing import (
        land_residue_chunks,
        replay_shuffle_partitions,
    )
    from alt_spark.streaming.sketch_stream import (
        run_streaming_sketch,
        verified_top_n,
        windowed_sketch_state,
    )

    docs = load_table(spark, sf, "documents")
    # The exploded token frame has exactly ONE Spark consumer now (the
    # single-job residue landing below): the window verification scan
    # reads the landed chunk files back instead of a second pass over
    # the explode, so the former eager localCheckpoint — a full
    # materialization of the corpus-sized token frame paid only to
    # share it between two consumers — is gone (r12 optimization;
    # measured 6.3 -> 4.5 s isolated at sf0.1). Each landed chunk
    # holds exactly residue b's rows by the landing contract, so
    # reading the window residues' chunks IS the window's token rows.
    toks = docs.select(
        (F.col("doc_id") % _WTT_BATCHES).alias("residue"),
        F.explode(tokens_col("text")).alias("tok"),
    )

    root = tempfile.mkdtemp(prefix="q120_trending_")
    landing = os.path.join(root, "landing")
    state = os.path.join(root, "state")
    os.makedirs(landing)
    try:
        # Executor-side landing through the shared single-write-job
        # device (q141/q145/q148's footing — the exploded token frame
        # is corpus-sized, so it must never collect to the driver;
        # review finding, r9): ONE repartition(n, residue) +
        # partitionBy write stages all three chunks in parallel tasks,
        # replacing three filter + coalesce(1) jobs that each rescanned
        # the checkpointed token frame and funneled every row through a
        # single task. The mtime stagger keeps the file source's
        # (mtime-ordered) batch id equal to the residue.
        land_residue_chunks(
            toks.select("tok", "residue"),
            "residue",
            _WTT_BATCHES,
            landing,
            os.path.join(root, "stage"),
            time.time(),
        )
        src = (
            spark.readStream.schema("tok string")
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        # Replay-scale shuffle sizing (the q49/q141 discipline): the
        # per-batch MG merges move metadata-sized summary frames — 32
        # session shuffle partitions are pure per-task overhead here.
        # The VERIFIED top-10 is partition-count-invariant by the MG
        # guarantee + strict guard (candidate SETS may vary; the exact-
        # verified output cannot — pytest-pinned on the operator).
        with replay_shuffle_partitions(spark):
            q = run_streaming_sketch(
                spark,
                src,
                state_dir=state,
                checkpoint_dir=os.path.join(
                    root, "ckpt" + uuid.uuid4().hex[:8]
                ),
                key_col="tok",
                k=_WTT_K,
                keep_per_batch=True,
                available_now=True,
            )
            try:
                # availableNow terminates after draining, so this
                # timeout is LIVE — a wedged micro-batch raises instead
                # of hanging the driver (review finding, r9: stop()
                # before awaitTermination made the old guard dead code).
                if not q.awaitTermination(300):
                    q.stop()
                    raise RuntimeError("q120 streaming replay timed out")
            finally:
                if q.isActive:
                    q.stop()
        win_state = windowed_sketch_state(spark, state, list(_WTT_WINDOW), _WTT_K)
        # The window's rows, read back from the landed chunks (one
        # parquet file per residue, `tok` column only) — identical to
        # re-filtering the explode, without re-running it.
        window_rows = spark.read.schema("tok string").parquet(
            *[
                os.path.join(landing, f"chunk_{b:03d}.parquet")
                for b in _WTT_WINDOW
            ]
        )
        out = verified_top_n(win_state, window_rows, "tok", top_n=10, k=_WTT_K)
        # Materialize before the state dir disappears (the q49 device).
        return spark.createDataFrame(out.collect(), out.schema).orderBy(
            F.desc("cnt"), "key"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# q129: collocation mining by integer lift. The I13 keyword family
# mines single terms (TF-IDF); production corpus analysis also ships
# PAIR statistics (collocations — Manning & Schütze ch. 5): token pairs
# that co-occur in documents far more than independence predicts. The
# association measure here is document-level LIFT in permyriad —
# (10000 * c_xy * N) div (c_x * c_y) — instead of log-PMI, because the
# ordering is identical (log is monotone) and the integer form replays
# bit-for-bit cross-engine (no transcendental crosses the oracle
# boundary — the q114/q115 doctrine).
_COLL_SUPPORT_PM = 300  # min document support for a pair: c_xy * 1e4 >= 300 * N
_COLL_TOP = 30


@query(
    "q129_collocation_lift",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct({_DDB_TOKENS})) AS t FROM documents
), n AS (
  SELECT count(*) AS n_docs FROM documents
), df AS (
  SELECT t, count(*) AS c FROM toks GROUP BY t
), pairs AS (
  SELECT a.t AS t1, b.t AS t2, count(*) AS c_xy
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.t < b.t
  GROUP BY 1, 2
), scored AS (
  SELECT t1, t2, c_xy, da.c AS c_x, db.c AS c_y,
         CAST((10000 * CAST(c_xy AS HUGEINT) * n.n_docs)
              // (CAST(da.c AS HUGEINT) * db.c) AS BIGINT) AS lift_pm
  FROM pairs, n
  JOIN df da ON da.t = pairs.t1
  JOIN df db ON db.t = pairs.t2
  WHERE 10000 * c_xy >= {_COLL_SUPPORT_PM} * n.n_docs
)
SELECT t1, t2, CAST(c_xy AS BIGINT) AS c_xy,
       CAST(c_x AS BIGINT) AS c_x, CAST(c_y AS BIGINT) AS c_y, lift_pm
FROM scored
ORDER BY lift_pm DESC, c_xy DESC, t1, t2
LIMIT {_COLL_TOP}
""",
)
def q129(spark: SparkSession, sf: str) -> DataFrame:
    """Top collocations by integer document-level lift: token pairs
    (t1 < t2, distinct-per-document) whose co-occurrence beats
    independence, support-gated at ``_COLL_SUPPORT_PM`` permyriad of
    the corpus so rare flukes never rank. Lift in permyriad is the
    exact integer surface (log-PMI orders identically; the monotone
    transform is dropped so no float crosses the oracle boundary).

    Plan (100 TB shape): pair generation is IN-ROW — each document's
    sorted distinct-token array expands to its own (t1 < t2) pairs via
    nested array transforms inside the scan projection, so there is NO
    token-level self-join (the oracle replays the same pair SET with a
    within-doc join, affordable at oracle scale): the corpus-scale
    exchange is one map-side-combinable pair count, bounded by the
    vocabulary-pair space actually observed, and the support gate
    broadcasts as one scalar. Per-document cost is quadratic in the
    document's DISTINCT vocabulary — the classic collocation-mining
    envelope, bounded by content (a Zipf vocabulary), not corpus size.
    Final cut is a TakeOrdered top-{_COLL_TOP}, never a global sort.
    """
    docs = load_table(spark, sf, "documents")
    toks = F.array_sort(F.array_distinct(_token_col()))
    # In-row unordered pairs of a sorted array: for index i, pair t[i]
    # with every later element — flatten(transform-with-index). The
    # token array is BOUND ONCE as a HOF lambda variable (the winnowing
    # device): referencing `toks` directly inside the inner lambdas
    # lets CollapseProject inline the tokenize+distinct+sort chain into
    # every slice — a per-element re-tokenize measured at 4.7 s vs
    # 0.8 s at sf0.1.
    pairs_col = F.flatten(
        F.transform(
            F.array(toks),
            lambda ts: F.flatten(
                F.transform(
                    ts,
                    lambda x, i: F.transform(
                        F.slice(ts, i + 2, F.size(ts)),
                        lambda y: F.struct(x.alias("t1"), y.alias("t2")),
                    ),
                )
            ),
        )
    )
    pair_rows = docs.select(F.explode(pairs_col).alias("p")).select(
        F.col("p.t1").alias("t1"), F.col("p.t2").alias("t2")
    )
    c_xy = pair_rows.groupBy("t1", "t2").agg(F.count("*").alias("c_xy"))
    tok_rows = docs.select(F.explode(toks).alias("t"))
    df_t = tok_rows.groupBy("t").agg(F.count("*").alias("c"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        c_xy.crossJoin(F.broadcast(n_docs))
        .filter(F.lit(10000) * F.col("c_xy") >= _COLL_SUPPORT_PM * F.col("n_docs"))
        .join(
            F.broadcast(df_t.withColumnRenamed("t", "t1").withColumnRenamed("c", "c_x")),
            "t1",
        )
        .join(
            F.broadcast(df_t.withColumnRenamed("t", "t2").withColumnRenamed("c", "c_y")),
            "t2",
        )
        .select(
            "t1",
            "t2",
            F.col("c_xy").cast("long").alias("c_xy"),
            F.col("c_x").cast("long").alias("c_x"),
            F.col("c_y").cast("long").alias("c_y"),
            # `div`, not decimal `/`-then-cast: the cast ROUNDS half-up
            # where DuckDB's `//` floors — a 1-unit hash mismatch class.
            F.expr(
                "CAST((10000 * CAST(c_xy AS DECIMAL(38,0)) * n_docs)"
                " div (CAST(c_x AS DECIMAL(38,0)) * c_y) AS BIGINT)"
            ).alias("lift_pm"),
        )
    )
    return scored.orderBy(
        F.desc("lift_pm"), F.desc("c_xy"), "t1", "t2"
    ).limit(_COLL_TOP)


# ---------------------------------------------------------------------------
# q133: triangle counting + clustering coefficients on the adjacency-
# bigram graph — the J4 family's local-structure measure next to CC
# (global connectivity), PageRank/HITS (centrality) and label
# propagation: a token's clustering coefficient says whether its
# frequent neighbors also neighbor EACH OTHER (topical cohesion vs
# hub-ness). Edges are ABOVE-RATE bigrams (unordered adjacent-token
# pairs whose occurrence rate clears a permyriad-of-corpus gate —
# adjacency is the grain Manning & Schütze's collocation chapter
# actually measures, and the rate gate leaves a non-complete graph
# with real degree variance at every generated SF, where q129's
# document-co-occurrence relation is near-complete on this
# vocabulary). The algorithm is the degree-ordered compact-forward
# scheme (Latapy 2008; Suri & Vassilvitskii 2011 for the MapReduce
# form): orient every edge from the (degree, node)-smaller endpoint
# to the larger, count wedges (u->v, u->w) closed by an oriented
# (v->w) edge — each triangle counted exactly once, and the wedge
# join's fan-out is bounded by out-degree <= O(sqrt(m)) instead of
# max raw degree (the hub that kills naive wedge counting).
_TRI_TOP = 15
_BG_SUPPORT_PM = 1250  # bigram occurrences per doc >= 0.125 to edge


@query(
    "q133_collocation_triangles",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_DDB_TOKENS} AS ts FROM documents
), n AS (
  SELECT count(*) AS n_docs FROM documents
), bg AS (
  SELECT least(ts[i], ts[i + 1]) AS t1, greatest(ts[i], ts[i + 1]) AS t2
  FROM toks, unnest(range(1, len(ts))) u(i)
  WHERE ts[i] <> ts[i + 1]
), pairs AS (
  SELECT t1, t2 FROM bg
  GROUP BY 1, 2
  HAVING 10000 * count(*) >= {_BG_SUPPORT_PM} * (SELECT n_docs FROM n)
), deg AS (
  SELECT t, count(*) AS d FROM (
    SELECT t1 AS t FROM pairs UNION ALL SELECT t2 FROM pairs
  ) GROUP BY t
), o AS (
  SELECT CASE WHEN (da.d, p.t1) < (db.d, p.t2) THEN p.t1 ELSE p.t2 END AS src,
         CASE WHEN (da.d, p.t1) < (db.d, p.t2) THEN p.t2 ELSE p.t1 END AS dst
  FROM pairs p JOIN deg da ON da.t = p.t1 JOIN deg db ON db.t = p.t2
), tri AS (
  SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
  FROM o e1 JOIN o e2 ON e1.src = e2.src AND e1.dst <> e2.dst
  JOIN o e3 ON e3.src = e1.dst AND e3.dst = e2.dst
), pernode AS (
  SELECT t, count(*) AS n_tri FROM (
    SELECT u AS t FROM tri UNION ALL SELECT v FROM tri UNION ALL SELECT w FROM tri
  ) GROUP BY t
)
SELECT d.t AS token, CAST(d.d AS BIGINT) AS degree,
       CAST(coalesce(p.n_tri, 0) AS BIGINT) AS n_triangles,
       CAST(CASE WHEN d.d >= 2
                 THEN (10000 * 2 * coalesce(p.n_tri, 0)) // (d.d * (d.d - 1))
                 ELSE 0 END AS BIGINT) AS clustering_pm
FROM deg d LEFT JOIN pernode p ON p.t = d.t
ORDER BY n_triangles DESC, token
LIMIT {_TRI_TOP}
""",
)
def q133(spark: SparkSession, sf: str) -> DataFrame:
    """Per-token triangle counts and clustering coefficients over the
    above-rate adjacency-bigram graph (edge iff the unordered adjacent
    pair's occurrence rate clears ``_BG_SUPPORT_PM`` permyriad of the
    corpus doc count). Coefficient = 2T/(d(d-1)) in permyriad, floor
    division — integer-exact cross-engine.

    Plan (100 TB shape): bigram extraction is one in-row zip of two
    array slices inside the scan projection (no self-join), collapsed
    by one map-side-combinable count; degrees are one combinable
    aggregate; the triangle join is compact-forward — the wedge
    fan-out after degree orientation is bounded by out-degree <=
    O(sqrt(m)), and the closing edge check is an equi-join on (v, w),
    never an all-wedges materialize-and-filter against raw hub
    degrees. Per-node attribution is a 3-way union of triangle corners
    into one combinable count; the final cut is TakeOrdered
    top-{_TRI_TOP}.
    """
    docs = load_table(spark, sf, "documents")
    ts = _token_col()
    # Token array bound once as a HOF lambda variable (the q129/
    # winnowing device) so the two slices don't each re-tokenize.
    bigrams = F.flatten(
        F.transform(
            F.array(ts),
            lambda a: F.filter(
                F.zip_with(
                    F.slice(a, 1, F.size(a) - 1),
                    F.slice(a, 2, F.size(a) - 1),
                    lambda x, y: F.struct(
                        F.least(x, y).alias("t1"),
                        F.greatest(x, y).alias("t2"),
                    ),
                ),
                lambda p: p["t1"] != p["t2"],
            ),
        )
    )
    pair_rows = (
        docs.filter(F.size(ts) >= 2)
        .select(F.explode(bigrams).alias("p"))
        .select(F.col("p.t1").alias("t1"), F.col("p.t2").alias("t2"))
    )
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    edges = (
        pair_rows.groupBy("t1", "t2")
        .agg(F.count("*").alias("c_xy"))
        .crossJoin(F.broadcast(n_docs))
        .filter(
            F.lit(10000) * F.col("c_xy") >= _BG_SUPPORT_PM * F.col("n_docs")
        )
        .select("t1", "t2")
    )
    if _dfcache.MATERIALIZE:
        edges = edges.localCheckpoint(eager=False)
    # Orientation + wedge close are the shared graph operators (factored
    # out r11 so the 100k hub-graph smoke drives the exact production
    # join shape — tests/test_scale_smoke.py pins the sqrt(2m)
    # out-degree cap on them).
    from alt_spark.operators.graph import (
        compact_forward_triangles,
        orient_compact_forward,
    )

    deg = (
        edges.select(F.col("t1").alias("t"))
        .unionByName(edges.select(F.col("t2").alias("t")))
        .groupBy("t")
        .agg(F.count("*").alias("d"))
    )
    o = orient_compact_forward(edges)
    if _dfcache.MATERIALIZE:
        o = o.localCheckpoint(eager=False)
    tri = compact_forward_triangles(o)
    pernode = (
        tri.select(F.col("u").alias("t"))
        .unionByName(tri.select(F.col("v").alias("t")))
        .unionByName(tri.select(F.col("w").alias("t")))
        .groupBy("t")
        .agg(F.count("*").alias("n_tri"))
    )
    return (
        deg.join(pernode, "t", "left")
        .select(
            F.col("t").alias("token"),
            F.col("d").cast("long").alias("degree"),
            F.coalesce("n_tri", F.lit(0)).cast("long").alias("n_triangles"),
            F.expr(
                "CAST(CASE WHEN d >= 2"
                " THEN (10000 * 2 * coalesce(n_tri, 0)) div (d * (d - 1))"
                " ELSE 0 END AS BIGINT)"
            ).alias("clustering_pm"),
        )
        .orderBy(F.desc("n_triangles"), "token")
        .limit(_TRI_TOP)
    )


# ---------------------------------------------------------------------------
# q136: integer-exact force-directed layout (J12 as a driver-hash-
# checkable QUERY — VERDICT r10 item 4, the q114 doctrine applied to
# operators/layout.py). The FLOAT production operator stays
# `force_layout`; this is its micro-unit twin running the SAME staged
# schedule per iteration — bounding box → adaptive grid → per-cell
# supernodes (Barnes-Hut far field) → exact 3×3-neighborhood near
# field → weighted spring attraction → cooled, capped displacement —
# with every update in integer milli-units and sign-decomposed floor
# division, so Spark, DuckDB, and a pencil produce bit-identical
# positions. Reference: the tag-cloud octree layout
# (alt-backend fetch_tag_cloud_usecase/layout_octree.go, layout.go —
# repulsion via far-field aggregation, attraction along co-occurrence
# edges, fixed iteration count with cooling).
_FL_TOP = 40  # tag-cloud node count (top tokens by document frequency)
_FL_CPA = 8  # grid cells per axis
_FL_ITERS = 3  # fixed iteration count (a pinned config, like a vocab)
_FL_K2 = 1_000_000  # squared spring constant, milli-unit scale
_FL_SCALE = 100  # force -> displacement divisor
_FL_T = (450, 300, 150)  # per-iteration displacement cap (cooling)
_FL_INIT = 10_000  # hash-uniform init positions in [0, 10000) milli


def _fl_idiv(num: str, den: str, op: str) -> str:
    """Sign-decomposed integer division fragment: sign(num) * (|num|
    op den), den > 0. Floor-on-absolute-value is truncation toward
    zero in BOTH engines regardless of their native negative-operand
    rounding — the one place Spark's `div` and DuckDB's `//` could
    silently diverge."""
    return (
        f"(CASE WHEN ({num}) < 0 THEN -((-({num})) {op} ({den})) "
        f"ELSE ({num}) {op} ({den}) END)"
    )


def _fl_oracle() -> str:
    from alt_spark.functions.hashing import DDB_H60

    k2, sc, cpa = _FL_K2, _FL_SCALE, _FL_CPA
    stages = []
    for i in range(1, _FL_ITERS + 1):
        p, t_cap = f"p{i - 1}", _FL_T[i - 1]
        far_d2 = "((c.x - s.mx) * (c.x - s.mx) + (c.y - s.my) * (c.y - s.my) + 1)"
        near_d2 = "((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) + 1)"
        stages.append(
            f"""bb{i} AS (
  SELECT min(x) AS bx0, max(x) AS bx1, min(y) AS by0, max(y) AS by1 FROM {p}
), cell{i} AS MATERIALIZED (
  SELECT t, x, y,
         least((x - bb.bx0) * {cpa} // greatest(bb.bx1 - bb.bx0, 1), {cpa - 1}) AS cx,
         least((y - bb.by0) * {cpa} // greatest(bb.by1 - bb.by0, 1), {cpa - 1}) AS cy
  FROM {p}, bb{i} bb
), sup{i} AS MATERIALIZED (
  SELECT cx, cy, count(*) AS m,
         sum(x) // count(*) AS mx, sum(y) // count(*) AS my
  FROM cell{i} GROUP BY 1, 2
), frc{i} AS MATERIALIZED (
  SELECT t, CAST(sum(fx) AS BIGINT) AS fx, CAST(sum(fy) AS BIGINT) AS fy FROM (
    SELECT c.t,
           s.m * {_fl_idiv(f"{k2} * (c.x - s.mx)", far_d2, "//")} AS fx,
           s.m * {_fl_idiv(f"{k2} * (c.y - s.my)", far_d2, "//")} AS fy
    FROM cell{i} c JOIN sup{i} s
      ON abs(c.cx - s.cx) > 1 OR abs(c.cy - s.cy) > 1
    UNION ALL
    SELECT a.t,
           {_fl_idiv(f"{k2} * (a.x - b.x)", near_d2, "//")} AS fx,
           {_fl_idiv(f"{k2} * (a.y - b.y)", near_d2, "//")} AS fy
    FROM cell{i} a JOIN cell{i} b
      ON a.t <> b.t AND abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
    UNION ALL
    SELECT e.u, -(pu.x - pv.x) * e.w AS fx, -(pu.y - pv.y) * e.w AS fy
    FROM und e JOIN {p} pu ON pu.t = e.u JOIN {p} pv ON pv.t = e.v
  ) GROUP BY 1
), p{i} AS MATERIALIZED (
  SELECT q.t,
         q.x + CAST(coalesce((CASE WHEN f.fx < 0 THEN -1 ELSE 1 END)
               * least(abs(f.fx) // {sc}, {t_cap}), 0) AS BIGINT) AS x,
         q.y + CAST(coalesce((CASE WHEN f.fy < 0 THEN -1 ELSE 1 END)
               * least(abs(f.fy) // {sc}, {t_cap}), 0) AS BIGINT) AS y
  FROM {p} q LEFT JOIN frc{i} f ON f.t = q.t
)"""
        )
    chain = ",\n".join(stages)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct({_DDB_TOKENS})) AS t FROM documents
), dfreq AS (
  SELECT t, count(*) AS c FROM toks GROUP BY t
), nodes AS MATERIALIZED (
  SELECT t FROM dfreq ORDER BY c DESC, t LIMIT {_FL_TOP}
), nt AS MATERIALIZED (
  SELECT toks.doc_id, toks.t FROM toks JOIN nodes USING (t)
), edges AS MATERIALIZED (
  SELECT a.t AS t1, b.t AS t2, CAST(count(*) AS BIGINT) AS w
  FROM nt a JOIN nt b ON a.doc_id = b.doc_id AND a.t < b.t
  GROUP BY 1, 2
), und AS MATERIALIZED (
  SELECT t1 AS u, t2 AS v, w FROM edges
  UNION ALL
  SELECT t2 AS u, t1 AS v, w FROM edges
), p0 AS MATERIALIZED (
  SELECT t, {DDB_H60("'flx|' || t")} % {_FL_INIT} AS x,
            {DDB_H60("'fly|' || t")} % {_FL_INIT} AS y
  FROM nodes
),
{chain}
SELECT t AS token, CAST(x AS BIGINT) AS x_milli, CAST(y AS BIGINT) AS y_milli
FROM p{_FL_ITERS}
ORDER BY token
"""


@query("q136_force_layout_integer", oracle=_fl_oracle())
def q136(spark: SparkSession, sf: str) -> DataFrame:
    """Integer-exact force-directed tag-cloud layout ({_FL_ITERS} fixed
    iterations): nodes are the top-{_FL_TOP} tokens by document
    frequency (total order: df DESC, token), edges are their
    document-level co-occurrence counts, positions start hash-uniform
    (portable md5) in milli-units, and every iteration replays the
    production `force_layout` schedule (operators/layout.py) in
    integer arithmetic — adaptive {_FL_CPA}x{_FL_CPA} grid on the
    current bounding box, per-cell (count, floor-centroid) supernodes
    for the far field, exact pairwise near field inside the 3x3 cell
    neighborhood, linear spring attraction along weighted edges, and a
    cooled per-axis displacement cap via sign-decomposed floor
    division. Mass/energy are NOT conserved under floors — the
    declared contract is a reproducible LAYOUT, not physics (the q114
    doctrine). Reference: alt-backend fetch_tag_cloud_usecase/
    layout_octree.go (Barnes-Hut far-field aggregation), layout.go
    (cooling, fixed iterations).

    Plan (100 TB shape): the corpus-scale work is the node/edge build
    — one token explode + map-side-combinable document-frequency
    count, then a broadcast semi-filter onto the {_FL_TOP}-token node
    set before the within-doc pair count (the join never sees
    non-cloud tokens). The layout itself runs on tag-cloud-sized
    frames: supernodes are <= {_FL_CPA}² rows by construction (the
    adaptive-grid invariant grid_cells pins), so the far-field
    non-equi join is a bounded broadcast, and each iteration is a
    fixed number of tiny exchanges — node count never multiplies
    corpus cost. The float production operator keeps the explode-based
    near-field equi-join for million-node graphs; at the tag-cloud
    grain the 3x3 condition join is the same pair set.
    """
    docs = load_table(spark, sf, "documents")
    # Tokenize ONCE: both corpus consumers (the df count and the in-row
    # edge build) read the materialized per-doc distinct-token arrays
    # instead of re-running the tokenizer chain per consumer (r11:
    # second tokenize pass was ~1.5 s of the sf0.1 wall).
    doc_toks = docs.select(
        "doc_id", F.array_distinct(_token_col()).alias("dts")
    )
    if _dfcache.MATERIALIZE:
        doc_toks = doc_toks.localCheckpoint(eager=False)
    toks = doc_toks.select("doc_id", F.explode("dts").alias("t"))
    dfreq = toks.groupBy("t").agg(F.count("*").alias("c"))
    nodes = dfreq.orderBy(F.desc("c"), "t").limit(_FL_TOP).select("t")
    # The node set feeds three consumers (init positions, the in-row
    # edge filter, and transitively every iteration) — materialize the
    # 40 rows once instead of re-running the corpus df count per
    # consumer (measured: 15.8 s -> ~8 s at sf0.1 together with the
    # in-row pair build below).
    if _dfcache.MATERIALIZE:
        nodes = nodes.localCheckpoint(eager=False)
    # Edges by the q129 in-row device: intersect each document's
    # distinct-token array with the broadcast node set, then expand
    # (t1 < t2) pairs inside the scan projection — no token-level
    # self-join touches the corpus. The oracle replays the same pair
    # SET with a within-doc join (affordable at oracle scale).
    nodes_arr = nodes.agg(F.collect_list("t").alias("ns"))
    cloud_toks = F.array_sort(F.array_intersect(F.col("dts"), F.col("ns")))
    pairs_col = F.flatten(
        F.transform(
            F.array(cloud_toks),
            lambda ts: F.flatten(
                F.transform(
                    ts,
                    lambda x, i: F.transform(
                        F.slice(ts, i + 2, F.size(ts)),
                        lambda y: F.struct(x.alias("t1"), y.alias("t2")),
                    ),
                )
            ),
        )
    )
    edges = (
        doc_toks.crossJoin(F.broadcast(nodes_arr))
        .select(F.explode(pairs_col).alias("p"))
        .groupBy(F.col("p.t1").alias("t1"), F.col("p.t2").alias("t2"))
        .agg(F.count("*").cast("long").alias("w"))
    )
    und = edges.select(
        F.col("t1").alias("u"), F.col("t2").alias("v"), "w"
    ).unionByName(
        edges.select(F.col("t2").alias("u"), F.col("t1").alias("v"), "w")
    )
    from alt_spark.functions.hashing import portable_hash60

    pos = nodes.select(
        "t",
        (portable_hash60(F.concat(F.lit("flx|"), F.col("t"))) % _FL_INIT)
        .cast("long")
        .alias("x"),
        (portable_hash60(F.concat(F.lit("fly|"), F.col("t"))) % _FL_INIT)
        .cast("long")
        .alias("y"),
    )
    # The layout loop runs as a DRIVER-SIDE integer fold over
    # model-sized state (the q141/mini-batch-k-means doctrine): the
    # position table is _FL_TOP rows and the edge list is bounded by
    # _FL_TOP², independent of corpus size, so each Spark iteration was
    # ~6 tiny jobs (4 broadcasts + an eager checkpoint) of pure
    # orchestration — measured ~3 s of the 4.6 s sf0.1 wall for 40
    # rows. The corpus-scale stages above (tokenize, df count, in-row
    # edge build, md5 init) stay distributed; the fold below replays
    # the identical integer schedule (same sign-decomposed truncating
    # division both engines use — see _fl_idiv), so the oracle replay
    # is unchanged. At 100 TB the node count is still _FL_TOP: the
    # collect is model-sized state, like the k-means centroid fold.
    k2, sc, cpa = _FL_K2, _FL_SCALE, _FL_CPA

    def idiv(num: int, den: int) -> int:
        # sign(num) * (|num| // den), den > 0 — truncation toward zero,
        # the shared Spark `div` / DuckDB `//` rule (_fl_idiv's twin).
        return -((-num) // den) if num < 0 else num // den

    p = {r["t"]: (int(r["x"]), int(r["y"])) for r in pos.collect()}
    edges_l = [(r["u"], r["v"], int(r["w"])) for r in und.collect()]
    for i in range(_FL_ITERS):
        t_cap = _FL_T[i]
        xs = [x for x, _ in p.values()]
        ys = [y for _, y in p.values()]
        bx0, bx1 = min(xs), max(xs)
        by0, by1 = min(ys), max(ys)
        gw, gh = max(bx1 - bx0, 1), max(by1 - by0, 1)
        cell = {
            t: (
                min((x - bx0) * cpa // gw, cpa - 1),
                min((y - by0) * cpa // gh, cpa - 1),
            )
            for t, (x, y) in p.items()
        }
        sup: dict[tuple[int, int], list[int]] = {}
        for t, (x, y) in p.items():
            s = sup.setdefault(cell[t], [0, 0, 0])
            s[0] += 1
            s[1] += x
            s[2] += y
        sup_rows = [
            (cx, cy, m, idiv(sx, m), idiv(sy, m))
            for (cx, cy), (m, sx, sy) in sup.items()
        ]
        frc = {t: [0, 0] for t in p}
        for t, (x, y) in p.items():
            tcx, tcy = cell[t]
            for cx, cy, m, mx, my in sup_rows:
                if abs(tcx - cx) > 1 or abs(tcy - cy) > 1:
                    d2 = (x - mx) * (x - mx) + (y - my) * (y - my) + 1
                    frc[t][0] += m * idiv(k2 * (x - mx), d2)
                    frc[t][1] += m * idiv(k2 * (y - my), d2)
        for t, (x, y) in p.items():
            tcx, tcy = cell[t]
            for ot, (ox, oy) in p.items():
                ocx, ocy = cell[ot]
                if t != ot and abs(tcx - ocx) <= 1 and abs(tcy - ocy) <= 1:
                    d2 = (x - ox) * (x - ox) + (y - oy) * (y - oy) + 1
                    frc[t][0] += idiv(k2 * (x - ox), d2)
                    frc[t][1] += idiv(k2 * (y - oy), d2)
        for u, v, w in edges_l:
            ux, uy = p[u]
            vx, vy = p[v]
            frc[u][0] += -(ux - vx) * w
            frc[u][1] += -(uy - vy) * w
        newp = {}
        for t, (x, y) in p.items():
            fx, fy = frc[t]
            dx = (-1 if fx < 0 else 1) * min(abs(fx) // sc, t_cap)
            dy = (-1 if fy < 0 else 1) * min(abs(fy) // sc, t_cap)
            newp[t] = (x + dx, y + dy)
        p = newp
    rows = [(t, x, y) for t, (x, y) in sorted(p.items())]
    return spark.createDataFrame(
        rows, "token string, x_milli long, y_milli long"
    ).orderBy("token")
