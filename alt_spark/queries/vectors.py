"""Q19 + vector search queries (SURVEY.md §2.J, Phase 5).

The embeddings table is `(vec_id, embedding array<float>, label)`. All
three queries use the same relational decomposition of vector math on
both engines — posexplode to (idx, val) rows, dot/norms as grouped sums —
so Spark and DuckDB run numerically identical plans (double arithmetic,
same rounding before any threshold compare or rank).

Scale shape: centroids are label-cardinality (broadcast); per-member
work is a hash join + groupBy on (label, idx) / (vec_id) keys. The
exact kNN here is the correctness baseline (J8); the sub-linear path is
the LSH-bucketed variant in alt_spark.operators.ann (J11).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from alt_spark.catalog import load_table
from alt_spark.queries import query

# DuckDB twin of posexplode over the embedding array.
_DDB_EXPLODE = (
    "SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS val,"
    " generate_subscripts(embedding, 1) AS idx FROM embeddings"
)


def _exploded(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("idx", "fval"),
    ).select("vec_id", "label", "idx", F.col("fval").cast("double").alias("val"))


# --- shared broadcast-anchor cosine scorer (q102 / q117 / q119) -----------
# One implementation of the load-bearing math — the round(·,6) boundary,
# the zero-norm -1.0 sentinel, the empty-anchor guard — so a fix applied
# to one query cannot silently leave its siblings diverging from their
# oracles (review finding, r9: three hand-kept copies).


def _dot(u: Column, w: Column) -> Column:
    return F.aggregate(
        F.zip_with(u, w, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _unit_vecs(spark: SparkSession, sf: str) -> DataFrame:
    """(vec_id, label, v double[], nrm) with zero-LENGTH (and NULL)
    embeddings EXCLUDED: the oracles' unnest equi-joins drop such
    vectors naturally (they produce no (idx, val) rows), so emitting a
    sentinel-scored Spark row for them would be a latent engine
    divergence (review finding, r9). Zero-NORM but non-empty vectors
    stay — both engines score those pairs -1."""
    emb = load_table(spark, sf, "embeddings")
    return (
        emb.filter(F.size("embedding") > 0)
        .select(
            "vec_id",
            "label",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        .withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    )


def _anchor_frame(vec: DataFrame, mod: int, msg: str) -> DataFrame:
    """The eval side as ONE broadcastable row: [struct(aid, alabel, av,
    anrm)] for every vec_id % mod == 0 vector, with the loud
    empty-set guard (the ungrouped collect_list always yields one row,
    so an empty eval set must raise, not quietly score nothing)."""
    return (
        vec.filter(F.col("vec_id") % mod == 0)
        .select(
            F.struct(
                F.col("vec_id").alias("aid"),
                F.col("label").alias("alabel"),
                F.col("v").alias("av"),
                F.col("nrm").alias("anrm"),
            ).alias("a")
        )
        .agg(F.collect_list("a").alias("anchors"))
        .filter(F.assert_true(F.size("anchors") > 0, F.lit(msg)).isNull())
    )


def _anchor_cos(a: Column) -> Column:
    """6-digit-rounded cosine of the current row's (v, nrm) against one
    anchor struct; degenerate (zero-norm) pairs score -1 in BOTH
    engines (the q102 NaN-ordering device)."""
    return F.when(
        (F.col("nrm") > 0) & (a["anrm"] > 0),
        F.round(_dot(F.col("v"), a["av"]) / (F.col("nrm") * a["anrm"]), 6),
    ).otherwise(F.lit(-1.0))


# ---------------------------------------------------------------------------
@query(
    "q19_embedding_outlier_filter",
    oracle=f"""
WITH ex AS (
  {_DDB_EXPLODE}
), cent AS (
  SELECT label, idx, avg(val) AS c FROM ex GROUP BY 1, 2
), d AS (
  SELECT ex.vec_id, ex.label,
         1 - sum(val * c) / (sqrt(sum(val * val)) * sqrt(sum(c * c))) AS dist
  FROM ex JOIN cent ON ex.label = cent.label AND ex.idx = cent.idx
  GROUP BY 1, 2
), p AS (
  SELECT label, percentile_cont(0.8) WITHIN GROUP (ORDER BY dist) AS p80
  FROM d GROUP BY 1
)
SELECT d.label AS label,
       count(*) AS n_total,
       CAST(sum(CASE WHEN round(dist, 9) <= round(p80, 9) THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round(max(p80), 6) AS p80
FROM d JOIN p ON d.label = p.label
GROUP BY d.label
ORDER BY label
""",
)
def q19(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label centroid-distance outlier filter, keep <= 80th percentile.

    Reference: recap-worker/recap-worker/src/select/filtering.rs:84-134 (J7)
    — per-genre centroid, cosine distance, p80 cut. Exact percentile_cont
    for the oracle; at 100 TB swap percentile_approx (same contract as Q04).
    Centroids are label-cardinality and broadcast; distances are one
    (label, idx) hash join + per-vector groupBy. Threshold compare uses
    round(·, 9) on both engines so interpolated-percentile boundary values
    can't flip on last-ulp differences.
    """
    ex = _exploded(spark, sf)
    cent = ex.groupBy("label", "idx").agg(F.avg("val").alias("c"))
    d = (
        ex.join(F.broadcast(cent), ["label", "idx"])
        .groupBy("vec_id", "label")
        .agg(
            (
                1
                - F.sum(F.col("val") * F.col("c"))
                / (F.sqrt(F.sum(F.col("val") * F.col("val"))) * F.sqrt(F.sum(F.col("c") * F.col("c"))))
            ).alias("dist")
        )
    )
    p = d.groupBy("label").agg(F.percentile("dist", 0.8).alias("p80"))
    return (
        d.join(F.broadcast(p), "label")
        .groupBy("label")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(
                F.when(F.round("dist", 9) <= F.round("p80", 9), 1).otherwise(0)
            ).cast("long").alias("n_kept"),
            F.round(F.max("p80"), 6).alias("p80"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
@query(
    "q25_vector_knn",
    oracle=f"""
WITH ex AS (
  {_DDB_EXPLODE}
), q AS (
  SELECT idx, val AS qval FROM ex WHERE vec_id = 0
), sim AS (
  SELECT ex.vec_id,
         sum(val * qval) / (sqrt(sum(val * val)) * sqrt(sum(qval * qval))) AS cos_sim
  FROM ex JOIN q ON ex.idx = q.idx
  WHERE ex.vec_id != 0
  GROUP BY 1
)
SELECT vec_id, round(cos_sim, 6) AS cos_sim
FROM sim
ORDER BY round(cos_sim, 6) DESC, vec_id
LIMIT 10
""",
)
def q25(spark: SparkSession, sf: str) -> DataFrame:
    """Exact cosine top-10 nearest neighbors of vector 0 (brute force).

    Reference: rag-orchestrator/internal/adapter/repository/
    hybrid_search_repo.go:72-76 (J8, pgvector `embedding <=> $1` order-limit)
    and recap-subworker FAISS kNN (clusterer.py:20-51). This is the
    correctness baseline: a broadcast of the 64-float query vector against
    every member, one groupBy per vec — O(n·dim) scan, no shuffle of the
    corpus beyond the per-vector aggregation. The sub-linear ANN variant
    (LSH buckets) is alt_spark.operators.ann.
    """
    ex = _exploded(spark, sf)
    q = ex.filter(F.col("vec_id") == 0).select("idx", F.col("val").alias("qval"))
    sim = (
        ex.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q), "idx")
        .groupBy("vec_id")
        .agg(
            (
                F.sum(F.col("val") * F.col("qval"))
                / (F.sqrt(F.sum(F.col("val") * F.col("val"))) * F.sqrt(F.sum(F.col("qval") * F.col("qval"))))
            ).alias("cos_sim")
        )
    )
    return (
        sim.select("vec_id", F.round("cos_sim", 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q26's oracle split into composable fragments so the RAG capstone
# (q112) can extend the exact same retrieval chain with chunking and a
# context-budget cut without duplicating the CTE text.
_Q26_CTES = f"""ex AS (
  {_DDB_EXPLODE}
), q AS (
  SELECT idx, val AS qval FROM ex WHERE vec_id = 0
), vrank AS (
  SELECT vec_id AS id,
         rank() OVER (ORDER BY round(sum(val*qval) / (sqrt(sum(val*val)) * sqrt(sum(qval*qval))), 6) DESC, vec_id) AS r
  FROM ex JOIN q ON ex.idx = q.idx
  WHERE ex.vec_id != 0
  GROUP BY vec_id
), tok AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\W+'), x -> x <> '')) AS token
  FROM documents
), trank AS (
  SELECT doc_id AS id,
         rank() OVER (ORDER BY count(*) DESC, doc_id) AS r
  FROM tok WHERE token = 'dup' AND doc_id != 0
  GROUP BY doc_id
), unioned AS (
  SELECT id, r FROM vrank WHERE r <= 50
  UNION ALL
SELECT id, r FROM trank WHERE r <= 50
)"""
_Q26_FINAL = """SELECT id, round(sum(1.0 / (r + 60)), 6) AS rrf_score, count(*) AS n_lists
FROM unioned
GROUP BY id
ORDER BY rrf_score DESC, id
LIMIT 10"""


@query("q26_hybrid_rrf", oracle=f"WITH {_Q26_CTES}\n{_Q26_FINAL}")
def q26(spark: SparkSession, sf: str) -> DataFrame:
    """Hybrid search: RRF fusion of a vector ranking and a term ranking.

    Reference: hybrid_search_repo.go:71-110 (J9, k=60 at :46-49) — vector
    rank (pgvector cosine) UNION ALL text rank (ts_rank_cd), fused with
    sum(1/(rank+60)). Here the vector list ranks embeddings by cosine to
    vector 0 and the text list ranks documents by term frequency of 'dup'
    (doc_id aligns with vec_id in the testdata). Both rankings are rounded
    before ranking so rank boundaries agree across engines; each list is
    cut to its top-50 before the union, as the reference LIMITs each arm.
    """
    ex = _exploded(spark, sf)
    q = ex.filter(F.col("vec_id") == 0).select("idx", F.col("val").alias("qval"))
    from pyspark.sql.window import Window

    vscore = (
        ex.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q), "idx")
        .groupBy("vec_id")
        .agg(
            F.round(
                F.sum(F.col("val") * F.col("qval"))
                / (F.sqrt(F.sum(F.col("val") * F.col("val"))) * F.sqrt(F.sum(F.col("qval") * F.col("qval")))),
                6,
            ).alias("score")
        )
    )
    # Scale-safe ranking: cut each arm to its top-50 with a distributed
    # TakeOrderedAndProject *first*; the rank window then runs over 50
    # rows, never the full corpus. The (score desc, id) ordering is total,
    # so rank == row_number and matches the oracle's full-set rank <= 50.
    vrank = (
        vscore.orderBy(F.desc("score"), "vec_id")
        .limit(50)
        .select(
            F.col("vec_id").alias("id"),
            F.rank().over(Window.orderBy(F.desc("score"), "vec_id")).alias("r"),
        )
    )
    docs = load_table(spark, sf, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.filter(F.split(F.lower(F.col("text")), r"\W+"), lambda x: x != "")).alias("token"),
    )
    tscore = (
        tok.filter((F.col("token") == "dup") & (F.col("doc_id") != 0))
        .groupBy("doc_id")
        .agg(F.count("*").alias("tf"))
    )
    trank = (
        tscore.orderBy(F.desc("tf"), "doc_id")
        .limit(50)
        .select(
            F.col("doc_id").alias("id"),
            F.rank().over(Window.orderBy(F.desc("tf"), "doc_id")).alias("r"),
        )
    )
    unioned = vrank.unionByName(trank)
    return (
        unioned.groupBy("id")
        .agg(
            F.round(F.sum(1.0 / (F.col("r") + 60)), 6).alias("rrf_score"),
            F.count("*").alias("n_lists"),
        )
        .orderBy(F.desc("rrf_score"), "id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
@query(
    "q39_centroid_classify",
    oracle=f"""
WITH ex AS (
  {_DDB_EXPLODE}
), cent AS (
  SELECT label AS clabel, idx, avg(val) AS c FROM ex GROUP BY 1, 2
), scored AS (
  SELECT ex.vec_id, ex.label AS true_label, cent.clabel,
         round(sum(val * c) / (sqrt(sum(val * val)) * sqrt(sum(c * c))), 9) AS sim
  FROM ex JOIN cent ON ex.idx = cent.idx
  GROUP BY 1, 2, 3
), best AS (
  SELECT vec_id, true_label, clabel AS predicted,
         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, clabel) AS rn
  FROM scored
)
SELECT true_label, predicted, count(*) AS n
FROM best WHERE rn = 1
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def q39(spark: SparkSession, sf: str) -> DataFrame:
    """Centroid-classifier confusion matrix over the embeddings table (J3).

    Reference: recap-worker classifier/workflow.rs:227-360 (multi-centroid
    cosine classify), model.rs:133-160. Self-classification against
    per-label mean vectors via alt_spark.operators.classify — centroids
    broadcast, argmax rounded to 9 places before ranking so the
    cross-engine tiebreak is stable. The synthetic embeddings are
    near-isotropic, so the confusion matrix is dense — the declared
    contract is the operator shape, not classifier quality.
    """
    from alt_spark.operators import classify as _cls

    emb = load_table(spark, sf, "embeddings")
    cents = _cls.train_centroids(emb)
    pred = _cls.classify(emb, cents)
    truth = emb.select(F.col("vec_id").alias("id"), F.col("label").alias("true_label"))
    return (
        pred.join(truth, "id")
        .groupBy("true_label", F.col("predicted"))
        .agg(F.count("*").alias("n"))
        .orderBy("true_label", "predicted")
    )



def _neardup_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """The q91/q99 vector corpus: the embeddings table plus the planted
    perturbed duplicates (ids 0-9 re-landed as id+100000 with +0.02 on
    the first 8 dims). One construction shared by both queries so their
    plans canonicalize EQUAL and the scored-candidate cache in
    operators/ann.embedding_near_dup serves both from one banding
    join."""
    emb = load_table(spark, sf, "embeddings")
    base = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x AS double))").alias(
            "embedding"
        ),
    )
    planted = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) ->"
            " cast(x AS double) + IF(i < 8, 0.02D, 0D))"
        ).alias("embedding"),
    )
    return base.unionByName(planted)

# ---------------------------------------------------------------------------
@query(
    "q91_embedding_neardup_lsh",
    oracle=f"""
WITH ex0 AS (
  SELECT vec_id AS id, CAST(unnest(embedding) AS DOUBLE) AS val,
         generate_subscripts(embedding, 1) AS idx
  FROM embeddings
), ex AS (
  SELECT id, idx, val FROM ex0
  UNION ALL
  SELECT id + 100000, idx, val + CASE WHEN idx <= 8 THEN 0.02 ELSE 0 END
  FROM ex0 WHERE id < 10
), bands AS (
  SELECT id, CAST((idx - 1) // 8 AS INT) AS band,
         string_agg(CASE WHEN val >= 0 THEN '1' ELSE '0' END, '' ORDER BY idx) AS key
  FROM ex GROUP BY 1, 2
), cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.id < b.id
), dots AS (
  SELECT c.id_a, c.id_b,
         round(sum(ea.val * eb.val)
               / (sqrt(sum(ea.val * ea.val)) * sqrt(sum(eb.val * eb.val))),
               6) AS cos_sim
  FROM cand c
  JOIN ex ea ON ea.id = c.id_a
  JOIN ex eb ON eb.id = c.id_b AND eb.idx = ea.idx
  GROUP BY 1, 2
)
SELECT id_a, id_b, cos_sim
FROM dots
WHERE cos_sim >= 0.99
ORDER BY id_a, id_b
""",
)
def q91(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via sign-band LSH (the
    embedding-space dedup mode of the near-dup family: I8-I10 are
    token-space, this is J8's vector space turned on the corpus
    itself). q32 is the label-blocked sibling — blocking there needs a
    semantic key; this is the content-blind SRP-banded form q32's
    docstring names as the 100 TB path, plus planted TRUE near-dups so
    the verify stage separates a real pair (0.998) from the densest
    false candidate (0.467) instead of ranking loosely-similar vectors.

    Reference: recap-subworker clusterer.py:20-51 (FAISS neighborhood
    construction) + the pgvector `<=>` operator the reference uses for
    similarity (hybrid_search_repo.go:72-76) — as a governance query:
    every pair of near-identical vectors, found by sign-band LSH
    blocking + exact verification (operators/ann.embedding_near_dup).

    The synthetic embeddings are unit-normalized with max pairwise
    cosine ~0.51, so true near-dups are PLANTED exactly as in q75's
    pattern: vectors 0-9 reappear as id+100000 with +0.02 on their
    first 8 dimensions (double arithmetic on both engines -> identical
    bits; cosine ~0.9984 vs next candidate 0.467, so the 0.99 threshold
    sits in a ~0.53-wide margin — no float-boundary risk). All
    perturbed dims fall inside band 0, so bands 1-7 guarantee recall:
    the blocked result provably equals brute force here, and
    tests/test_ann.py pins exactly that.
    """
    from alt_spark.operators.ann import embedding_near_dup

    return embedding_near_dup(
        _neardup_corpus(spark, sf),
        id_col="vec_id",
        vec_col="embedding",
        threshold=0.99,
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
@query(
    "q99_neardup_threshold_histogram",
    oracle=f"""
WITH ex0 AS (
  SELECT vec_id AS id, CAST(unnest(embedding) AS DOUBLE) AS val,
         generate_subscripts(embedding, 1) AS idx
  FROM embeddings
), ex AS (
  SELECT id, idx, val FROM ex0
  UNION ALL
  SELECT id + 100000, idx, val + CASE WHEN idx <= 8 THEN 0.02 ELSE 0 END
  FROM ex0 WHERE id < 10
), bands AS (
  SELECT id, CAST((idx - 1) // 8 AS INT) AS band,
         string_agg(CASE WHEN val >= 0 THEN '1' ELSE '0' END, '' ORDER BY idx) AS key
  FROM ex GROUP BY 1, 2
), cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.id < b.id
), dots AS (
  SELECT c.id_a, c.id_b,
         round(sum(ea.val * eb.val)
               / (sqrt(sum(ea.val * ea.val)) * sqrt(sum(eb.val * eb.val))),
               6) AS cos_sim
  FROM cand c
  JOIN ex ea ON ea.id = c.id_a
  JOIN ex eb ON eb.id = c.id_b AND eb.idx = ea.idx
  GROUP BY 1, 2
)
SELECT CAST(floor(cos_sim * 20) AS BIGINT) AS bucket,
       count(*) AS n_pairs,
       round(min(cos_sim), 6) AS lo,
       round(max(cos_sim), 6) AS hi
FROM dots
GROUP BY 1
ORDER BY 1
""",
)
def q99(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup threshold calibration: the cosine-similarity histogram
    (0.05-wide buckets) of EVERY sign-band candidate pair, unfiltered —
    the distribution an operator inspects to SET q91's threshold (the
    planted duplicates sit isolated in the top bucket; the dense false
    candidates pile below ~0.5, so the knee is visible). Running the
    audit before the cut is how a production vector-dedup chooses its
    threshold per embedding model rather than hard-coding one.

    Plan: identical machinery to q91 with threshold -1 — and literally
    the SAME materialized scored-candidate frame (operators/ann.
    _SCORED_PAIR_CACHE; the corpus construction is shared via
    _neardup_corpus so the plans canonicalize equal): one banding join
    per suite serves both the cut and its calibration. The histogram
    is one bounded groupBy on a 41-value bucket key. The bucket floor
    runs on the 6-digit ROUNDED cosine (bit-identical doubles in both
    engines — the q91 device), so bucket edges carry no float-boundary
    risk.
    """
    from alt_spark.operators.ann import embedding_near_dup

    pairs = embedding_near_dup(
        _neardup_corpus(spark, sf),
        id_col="vec_id",
        vec_col="embedding",
        threshold=-1.0,
    )
    return (
        pairs.select(
            F.floor(F.col("cos_sim") * 20).cast("long").alias("bucket"),
            "cos_sim",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.min("cos_sim"), 6).alias("lo"),
            F.round(F.max("cos_sim"), 6).alias("hi"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
_SEMDECON_TAU = 0.35  # cosine threshold on the 6-digit-rounded similarity
_SEMDECON_MOD = 50  # every 50th vector plays the benchmark (q62's device)


@query(
    "q102_semantic_decontamination",
    oracle=f"""
WITH ex AS ({_DDB_EXPLODE}),
c AS (SELECT * FROM ex WHERE vec_id % {_SEMDECON_MOD} <> 0),
b AS (SELECT * FROM ex WHERE vec_id % {_SEMDECON_MOD} = 0),
pairs AS (
  SELECT c.vec_id AS cid, c.label AS label,
         CASE WHEN sum(c.val * c.val) > 0 AND sum(b.val * b.val) > 0
              THEN round(sum(c.val * b.val)
                   / (sqrt(sum(c.val * c.val)) * sqrt(sum(b.val * b.val))), 6)
              ELSE -1.0 END AS cos
  FROM c JOIN b ON c.idx = b.idx
  GROUP BY c.vec_id, c.label, b.vec_id
), mx AS (
  SELECT cid, label, max(cos) AS max_cos FROM pairs GROUP BY 1, 2
)
SELECT label,
       count(*) AS n_corpus,
       count(*) FILTER (WHERE max_cos >= {_SEMDECON_TAU}) AS n_contaminated,
       CAST(coalesce(sum(cid) FILTER (WHERE max_cos >= {_SEMDECON_TAU}), 0)
            AS BIGINT) AS contam_checksum
FROM mx GROUP BY label ORDER BY label
""",
)
def q102(spark: SparkSession, sf: str) -> DataFrame:
    """Semantic (embedding-space) benchmark decontamination: flag every
    corpus vector whose max cosine to ANY benchmark vector clears the
    threshold — the paraphrase-robust complement of q62's n-gram rule
    (a reworded eval item shares no 5-gram with its source but stays
    close in embedding space; embedding-similarity decontamination is
    how recent model cards audit for exactly that leak). Every 50th
    vector plays the benchmark, the q62 device.

    Plan (the 100 TB shape): the benchmark side is eval-suite-sized, so
    it collapses to ONE collect_list row broadcast onto the corpus scan
    — the max-cosine is an in-row fold over the benchmark array (all
    JVM codegen, |bench| x dim multiply-adds per row, zero corpus
    shuffle), followed by one bounded per-label aggregate. Contrast
    q32, where both sides are corpus-scale and blocking (labels there,
    SRP bands in q91) is mandatory; against a BOUNDED benchmark,
    brute-force max IS the scale plan — no recall caveat, no index.
    Per-pair cosines are rounded to 6 digits BEFORE the max/threshold
    (the q32/q91 bit-identity device), so the flag decision is exact
    cross-engine; the id checksum pins the exact contaminated SET.
    """
    # Shared scorer helpers (_unit_vecs/_anchor_frame/_anchor_cos):
    # empty-benchmark guard per ADVICE r8 (raise, never quietly score
    # nothing); zero-norm pairs -1 in both engines (review finding,
    # r8); zero-length embeddings excluded on both sides (review
    # finding, r9 — the oracle's unnest join drops them naturally).
    vec = _unit_vecs(spark, sf)
    bench = _anchor_frame(
        vec,
        _SEMDECON_MOD,
        "q102: benchmark partition is empty — nothing to decontaminate against",
    )
    corpus = vec.filter(F.col("vec_id") % _SEMDECON_MOD != 0)
    scored = corpus.crossJoin(F.broadcast(bench)).withColumn(
        "max_cos", F.array_max(F.transform(F.col("anchors"), _anchor_cos))
    )
    contam = F.col("max_cos") >= _SEMDECON_TAU
    return (
        scored.groupBy("label")
        .agg(
            F.count("*").alias("n_corpus"),
            F.count(F.when(contam, 1)).alias("n_contaminated"),
            F.coalesce(F.sum(F.when(contam, F.col("vec_id"))), F.lit(0))
            .cast("long")
            .alias("contam_checksum"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
_CTX_BUDGET = 256  # context-window token budget for the assembled prompt


def _q112_oracle() -> str:
    from alt_spark.queries.training import _CHUNK, _STRIDE

    from alt_spark.functions.text_analysis import DDB_TOKENS

    return f"""
WITH {_Q26_CTES},
fused AS (
  {_Q26_FINAL}
),
ranked AS (
  SELECT id, row_number() OVER (ORDER BY rrf_score DESC, id) AS rrf_rank FROM fused
),
dtok AS (
  SELECT doc_id, {DDB_TOKENS} AS toks FROM documents
  WHERE doc_id IN (SELECT id FROM ranked)
),
starts AS (
  SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 1, {_STRIDE})) AS s
  FROM dtok WHERE len(toks) > 0
),
chunks AS (
  SELECT doc_id,
         CAST(s / {_STRIDE} AS BIGINT) AS chunk_idx,
         CAST(least({_CHUNK}, len(toks) - s) AS BIGINT) AS n_tok,
         md5(array_to_string(list_slice(toks, s + 1, least(s + {_CHUNK}, len(toks))), ' ')) AS chunk_md5
  FROM starts
),
ordered AS (
  SELECT r.rrf_rank, c.doc_id, c.chunk_idx, c.n_tok, c.chunk_md5,
         CAST(sum(c.n_tok) OVER (ORDER BY r.rrf_rank, c.chunk_idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
  FROM chunks c JOIN ranked r ON c.doc_id = r.id
)
SELECT CAST(row_number() OVER (ORDER BY rrf_rank, chunk_idx) AS BIGINT) AS ctx_pos,
       doc_id, chunk_idx, n_tok, cum_tok, chunk_md5
FROM ordered
WHERE cum_tok <= {_CTX_BUDGET}
ORDER BY ctx_pos
"""


@query("q112_rag_context_assembly", oracle=_q112_oracle())
def q112(spark: SparkSession, sf: str) -> DataFrame:
    """RAG serving-path capstone, composed as ONE plan: hybrid
    retrieval (the exact q26 chain — cosine arm ∪ term arm, RRF-fused
    top-10) → overlapping context chunks of the selected documents
    (the q60 device) → greedy token-budget cut (keep chunks in
    (relevance rank, chunk order) until the 256-token context window
    fills) — the chain the reference's rag-orchestrator executes per
    question (`hybrid_search_repo.go:71-110` retrieval + context
    assembly before the LLM call). The per-chunk md5 pins assembled
    context CONTENT; cum_tok pins the exact cut point.

    Plan: both retrieval arms cut to bounded top-50 frames BEFORE any
    window (q26's distributed TakeOrdered discipline); chunking runs
    only on the 10 selected documents (broadcast semi-join); the
    running-sum and position windows order a ≤(10 x chunks/doc) frame
    — every window in the plan is bounded, the corpus is scanned
    twice (once per retrieval arm) and never shuffled whole.
    """
    from pyspark.sql.window import Window

    from alt_spark.operators.packing import chunk_tokens
    from alt_spark.queries.training import _CHUNK, _STRIDE, _tokens_col

    fused = q26(spark, sf)
    ranked = fused.select(
        "id",
        F.row_number()
        .over(Window.orderBy(F.desc("rrf_score"), "id"))
        .alias("rrf_rank"),
    )
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    # Prune-then-chunk: the first join only needs to RESTRICT docs to
    # the retrieved ten (chunk_tokens keeps only its own columns, so a
    # carried rrf_rank would be dead weight) — a broadcast left_semi
    # makes that intent explicit; the rank joins on once, after
    # chunking, against the same 10-row frame. (Review finding, r8.)
    sel = docs.join(
        F.broadcast(ranked.select(F.col("id").alias("doc_id"))),
        "doc_id",
        "left_semi",
    )
    chunks = chunk_tokens(
        sel.withColumn("toks", _tokens_col()),
        F.col("toks"),
        id_col="doc_id",
        max_tokens=_CHUNK,
        stride=_STRIDE,
    ).join(
        F.broadcast(ranked.withColumnRenamed("id", "doc_id")),
        F.col("id") == F.col("doc_id"),
    )
    order = Window.orderBy("rrf_rank", "chunk_idx")
    ordered = chunks.select(
        "rrf_rank",
        F.col("id").alias("out_doc_id"),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("n_tok").cast("long").alias("n_tok"),
        F.md5("chunk_text").alias("chunk_md5"),
    ).withColumn(
        "cum_tok",
        F.sum("n_tok")
        .over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return (
        ordered.filter(F.col("cum_tok") <= _CTX_BUDGET)
        .select(
            F.row_number().over(order).cast("long").alias("ctx_pos"),
            F.col("out_doc_id").alias("doc_id"),
            "chunk_idx",
            "n_tok",
            "cum_tok",
            "chunk_md5",
        )
        .orderBy("ctx_pos")
    )


# ---------------------------------------------------------------------------
_CPM_MOD = 50  # every 50th vector plays the eval anchor (the q62/q102 device)
_CPM_NEG_K = 2  # hard negatives mined per anchor


@query(
    "q117_contrastive_pairs",
    oracle=f"""
WITH ex AS ({_DDB_EXPLODE}),
a AS (SELECT * FROM ex WHERE vec_id % {_CPM_MOD} = 0),
c AS (SELECT * FROM ex WHERE vec_id % {_CPM_MOD} <> 0),
pairs AS (
  SELECT a.vec_id AS anchor_id, c.vec_id AS cand_id,
         CASE WHEN a.label = c.label THEN 'pos' ELSE 'neg' END AS pair_type,
         CASE WHEN sum(c.val * c.val) > 0 AND sum(a.val * a.val) > 0
              THEN round(sum(a.val * c.val)
                   / (sqrt(sum(a.val * a.val)) * sqrt(sum(c.val * c.val))), 6)
              ELSE -1.0 END AS cos
  FROM a JOIN c ON a.idx = c.idx
  GROUP BY a.vec_id, c.vec_id, a.label, c.label
), ranked AS (
  SELECT anchor_id, pair_type, cand_id, cos,
         row_number() OVER (PARTITION BY anchor_id, pair_type
                            ORDER BY cos DESC, cand_id) AS rnk
  FROM pairs
)
SELECT anchor_id, pair_type, CAST(rnk AS BIGINT) AS rnk, cand_id, cos
FROM ranked
WHERE (pair_type = 'pos' AND rnk <= 1) OR (pair_type = 'neg' AND rnk <= {_CPM_NEG_K})
ORDER BY anchor_id, pair_type, rnk
""",
)
def q117(spark: SparkSession, sf: str) -> DataFrame:
    """Contrastive pair mining for embedding-model training: per eval
    anchor, the nearest SAME-label candidate (the positive) and the
    top ``_CPM_NEG_K`` nearest DIFFERENT-label candidates (the classic
    hard negatives — near in embedding space, wrong by label), ranks
    broken on the 6-digit-rounded cosine then candidate id so both
    engines draw identical pairs. Every 50th vector plays the anchor
    set (the q62/q102 device). This is the triplet-mining step of an
    embedding-training data pipeline (anchor, positive, hard
    negatives), rank-based because production miners select by
    NEIGHBORHOOD, not absolute threshold.

    Plan (the 100 TB shape): the anchor side is eval-sized, so it
    collapses to ONE broadcast array folded in-row over the corpus
    scan (the q102 zero-corpus-shuffle device: |anchors| x dim
    multiply-adds per row, zero-norm pairs scored -1 in both engines,
    empty-anchor frame raises loudly); per-anchor selection then runs
    through :func:`alt_spark.operators.topk.grouped_top_k` — the
    partition-salted two-stage top-k, because each anchor's candidate
    set is CORPUS-sized and a row_number window would funnel it
    through one reducer (the q10 anti-pattern the salt exists to kill).
    """
    from alt_spark.operators.topk import grouped_top_k

    vec = _unit_vecs(spark, sf)
    anchors = _anchor_frame(
        vec, _CPM_MOD, "q117: anchor set is empty — nothing to mine against"
    )
    scored = (
        vec.filter(F.col("vec_id") % _CPM_MOD != 0)
        .crossJoin(F.broadcast(anchors))
        .select(
            F.col("vec_id").alias("cand_id"),
            "label",
            F.explode(
                F.transform(
                    F.col("anchors"),
                    lambda a: F.struct(
                        a["aid"].alias("anchor_id"),
                        a["alabel"].alias("alabel"),
                        _anchor_cos(a).alias("cos"),
                    ),
                )
            ).alias("s"),
        )
        .select(
            F.col("s.anchor_id").alias("anchor_id"),
            F.when(F.col("s.alabel") == F.col("label"), "pos")
            .otherwise("neg")
            .alias("pair_type"),
            F.col("cand_id"),
            F.col("s.cos").alias("cos"),
        )
    )
    top = grouped_top_k(
        scored,
        ["anchor_id", "pair_type"],
        # Ascending struct key = (cos desc via negation, cand_id asc):
        # a TOTAL order, since cand_id is unique within a group.
        F.struct((-F.col("cos")).alias("nc"), F.col("cand_id").alias("cid")),
        F.struct(F.col("cand_id"), F.col("cos")),
        k=_CPM_NEG_K,
    )
    return top.filter(
        (F.col("pair_type") == "neg") | (F.col("rnk") <= 1)
    ).orderBy("anchor_id", "pair_type", "rnk")


# ---------------------------------------------------------------------------
_RQM_K = 10  # metric cutoff: MRR / recall / precision @ 10


@query(
    "q119_retrieval_quality_metrics",
    oracle=f"""
WITH ex AS ({_DDB_EXPLODE}),
a AS (SELECT * FROM ex WHERE vec_id % {_CPM_MOD} = 0),
c AS (SELECT * FROM ex WHERE vec_id % {_CPM_MOD} <> 0),
pairs AS (
  SELECT a.vec_id AS anchor_id, c.vec_id AS cand_id,
         a.label = c.label AS is_rel,
         CASE WHEN sum(c.val * c.val) > 0 AND sum(a.val * a.val) > 0
              THEN round(sum(a.val * c.val)
                   / (sqrt(sum(a.val * a.val)) * sqrt(sum(c.val * c.val))), 6)
              ELSE -1.0 END AS cos
  FROM a JOIN c ON a.idx = c.idx
  GROUP BY a.vec_id, c.vec_id, a.label, c.label
), ranked AS (
  SELECT anchor_id, cand_id, is_rel, cos,
         row_number() OVER (PARTITION BY anchor_id
                            ORDER BY cos DESC, cand_id) AS rnk
  FROM pairs
), topk AS (
  SELECT anchor_id,
         min(CASE WHEN is_rel THEN rnk END) AS first_rel_rank,
         CAST(coalesce(sum(CASE WHEN is_rel THEN 1 END), 0) AS BIGINT)
           AS hits_at_k
  FROM ranked WHERE rnk <= {_RQM_K} GROUP BY 1
), rel AS (
  SELECT anchor_id, CAST(count(*) FILTER (is_rel) AS BIGINT) AS n_relevant
  FROM pairs GROUP BY 1
)
SELECT r.anchor_id,
       CAST(t.first_rel_rank AS BIGINT) AS first_rel_rank,
       CAST(CASE WHEN t.first_rel_rank IS NOT NULL
                 THEN 10000 // t.first_rel_rank ELSE 0 END AS BIGINT) AS rr_pm,
       t.hits_at_k,
       r.n_relevant,
       CAST((10000 * t.hits_at_k)
            // greatest(least({_RQM_K}, r.n_relevant), 1) AS BIGINT) AS recall_pm,
       CAST((10000 * t.hits_at_k) // {_RQM_K} AS BIGINT) AS precision_pm
FROM rel r JOIN topk t ON r.anchor_id = t.anchor_id
ORDER BY r.anchor_id
""",
)
def q119(spark: SparkSession, sf: str) -> DataFrame:
    """Retrieval-quality metrics at k = ``_RQM_K``: per eval anchor, the
    rank of the first relevant hit, reciprocal rank in permyriad
    (10000 div rank — the integer-exact MRR surface), hits@k,
    recall@k and precision@k in permyriad — the evaluation table a
    retrieval release publishes before swapping an index or embedding
    model (the acceptance gate for q25/q26/q112's retrieval stack).
    Relevance is the standard same-label proxy; anchors are every
    50th vector (the q62/q102 device). Reciprocal rank and the
    permyriad ratios are integer floor divisions, so the whole metric
    table replays bit-for-bit cross-engine — no float MRR ever
    crosses the oracle boundary.

    Plan (100 TB shape): anchors broadcast + in-row cosine fold (the
    q102 zero-corpus-shuffle device); top-k per anchor via the salted
    :func:`grouped_top_k` (corpus-sized candidate sets — q117's
    argument); n_relevant is one anchor-keyed COUNT aggregate, which
    map-side partials keep skew-proof where a window would not be.
    """
    from alt_spark.operators.topk import grouped_top_k

    vec = _unit_vecs(spark, sf)
    anchors = _anchor_frame(
        vec, _CPM_MOD, "q119: anchor set is empty — nothing to evaluate"
    )
    scored = (
        vec.filter(F.col("vec_id") % _CPM_MOD != 0)
        .crossJoin(F.broadcast(anchors))
        .select(
            F.col("vec_id").alias("cand_id"),
            "label",
            F.explode(
                F.transform(
                    F.col("anchors"),
                    lambda a: F.struct(
                        a["aid"].alias("anchor_id"),
                        (a["alabel"] == F.col("label")).alias("is_rel"),
                        _anchor_cos(a).alias("cos"),
                    ),
                )
            ).alias("s"),
        )
        .select(
            F.col("s.anchor_id").alias("anchor_id"),
            F.col("s.is_rel").alias("is_rel"),
            F.col("cand_id"),
            F.col("s.cos").alias("cos"),
        )
    )
    topk = grouped_top_k(
        scored,
        ["anchor_id"],
        F.struct((-F.col("cos")).alias("nc"), F.col("cand_id").alias("cid")),
        F.struct(F.col("cand_id"), F.col("is_rel")),
        k=_RQM_K,
    ).groupBy("anchor_id").agg(
        F.min(F.when(F.col("is_rel"), F.col("rnk"))).alias("first_rel_rank"),
        F.coalesce(F.sum(F.when(F.col("is_rel"), 1)), F.lit(0))
        .cast("long")
        .alias("hits_at_k"),
    )
    rel = scored.groupBy("anchor_id").agg(
        F.count(F.when(F.col("is_rel"), 1)).alias("n_relevant")
    )
    return (
        rel.join(topk, "anchor_id")
        .select(
            "anchor_id",
            F.col("first_rel_rank").cast("long").alias("first_rel_rank"),
            F.when(
                F.col("first_rel_rank").isNotNull(),
                F.expr("10000 div first_rel_rank"),
            )
            .otherwise(0)
            .cast("long")
            .alias("rr_pm"),
            "hits_at_k",
            "n_relevant",
            F.expr(
                f"(10000 * hits_at_k) div greatest(least({_RQM_K}, n_relevant), 1)"
            )
            .cast("long")
            .alias("recall_pm"),
            F.expr(f"(10000 * hits_at_k) div {_RQM_K}")
            .cast("long")
            .alias("precision_pm"),
        )
        .orderBy("anchor_id")
    )


# ---------------------------------------------------------------------------
# q137: integer-exact k-means (J5 as a driver-hash-checkable QUERY —
# the q114/q136 doctrine applied to operators/clustering.py). The
# MLlib float path (`kmeans_assign`, reference util/kmeans.rs:22-92)
# stays production; this is the fixed-iteration Lloyd twin in integer
# milli-units: embeddings quantize by floor(x*1000) (float64 widening
# + multiply are IEEE-identical in the JVM and DuckDB, so the floor is
# deterministic cross-engine), seeds are the k lowest vec_ids (a
# pinned seed policy, like a tokenizer vocab), assignment is argmin of
# the integer squared L2 with ties to the lowest cluster, and each new
# centroid is the per-dimension TRUNCATED mean (Spark `div` and DuckDB
# `//` both truncate toward zero — verified, and the pencil replay
# sign-decomposes to match) — every number either
# engine touches after quantization is an integer, so three engines
# agree bit-for-bit (Spark / DuckDB unrolled MATERIALIZED stages /
# pure-Python pencil in tests/test_ml_ops.py).
_KM_K = 8
_KM_ITERS = 3
_KM_Q = 1000  # quantization: milli-units

# Plan-keyed cache for the fitted Lloyd chain (the minhash_pairs
# doctrine): q137/q138 fit the identical quantizer — one materializes,
# the sibling reuses. Two entries per fit (cents + assigned), distinct
# (slice, k, iters) fits key separately. Sized to the POPULATION:
# the suite runs 8 distinct fits (full corpus ×2 scales via the warm
# pass, base slice, batch slice, 4 PQ subspaces) × 2 entries = 16 —
# r12 ran with 12 slots and recorded 16 puts / 4 evictions (an evicted
# fit re-pays its Lloyd iterations on the next touch); 20 slots hold
# the population with headroom and cost only DataFrame handles.
from alt_spark.plans.dfcache import DataFramePlanCache

_KM_FIT_CACHE = DataFramePlanCache(max_entries=20, name="km_fit")


def _km_chain_ctes(
    src: str = "embeddings",
    prefix: str = "",
    k: int = _KM_K,
    iters: int = _KM_ITERS,
    qvecs_sql: str | None = None,
) -> str:
    """The shared k-means WITH-chain ({p}qvecs → {p}c0 →
    {p}a1..{p}c{iters}) — q137's oracle reports from it; q138's IVF
    oracle probes against the same fitted quantizer (the q121
    rebuild-the-base-artifacts-in-query doctrine, so each query stands
    alone for the driver); q143 fits the chain on a BASE slice via
    ``src``; q146 derives its per-subspace PQ codebook chains via
    ``prefix``/``k``/``iters``/``qvecs_sql`` (ONE template — a fix to
    the tie rule, the truncated mean, or the empty-cluster carry-over
    cannot land in one oracle family and not the other). ``qvecs_sql``
    overrides the default milli-quantization body of the {p}qvecs CTE
    (it must yield (vec_id, qv))."""
    p = prefix
    dist = (
        "list_sum(list_transform(list_zip(v.qv, c.qv),"
        " p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )
    stages = []
    for t in range(1, iters + 1):
        stages.append(
            f"""{p}a{t} AS MATERIALIZED (
  SELECT vec_id, qv, cluster FROM (
    SELECT v.vec_id, v.qv, c.cluster,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {dist}, c.cluster) AS rn
    FROM {p}qvecs v CROSS JOIN {p}c{t - 1} c
  ) WHERE rn = 1
), {p}m{t} AS (
  SELECT cluster, u['i'] AS i, sum(u['x']) // count(*) AS val
  FROM (SELECT cluster,
               unnest(list_transform(qv, (x, i) -> {{'i': i, 'x': x}})) AS u
        FROM {p}a{t})
  GROUP BY 1, 2
), {p}c{t} AS MATERIALIZED (
  SELECT cluster, list(val ORDER BY i) AS qv FROM {p}m{t} GROUP BY 1
  UNION ALL
  SELECT p.cluster, p.qv FROM {p}c{t - 1} p
  WHERE p.cluster NOT IN (SELECT cluster FROM {p}m{t})
)"""
        )
    chain = ",\n".join(stages)
    if qvecs_sql is None:
        qvecs_sql = f"""SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(x * {_KM_Q}) AS BIGINT)) AS qv
  FROM {src}"""
    return f"""{p}qvecs AS MATERIALIZED (
  {qvecs_sql}
), {p}c0 AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cluster,
         qv
  FROM (SELECT vec_id, qv FROM {p}qvecs ORDER BY vec_id LIMIT {k})
),
{chain}"""


def _km_oracle() -> str:
    return f"""
WITH {_km_chain_ctes()},
members AS (
  SELECT cluster, count(*) AS n, sum(vec_id) AS ids
  FROM a{_KM_ITERS} GROUP BY 1
)
SELECT c.cluster,
       CAST(coalesce(m.n, 0) AS BIGINT) AS n_vecs,
       CAST(coalesce(m.ids, 0) AS BIGINT) AS id_checksum,
       CAST(list_sum(list_transform(c.qv, (x, i) -> i * x)) AS BIGINT)
         AS centroid_checksum
FROM c{_KM_ITERS} c LEFT JOIN members m ON m.cluster = c.cluster
ORDER BY c.cluster
"""


def _km_cent_arr(cents: DataFrame) -> DataFrame:
    """The 1-row broadcastable centroid array (sorted by cluster id —
    struct order IS the tie rule and array position i+1 IS cluster i).
    Build it ONCE per consumer chain and pass it down; q143's probe
    stage and its `_km_assign` call share a single aggregation."""
    return cents.agg(
        F.array_sort(
            F.collect_list(F.struct("cluster", "qv"))
        ).alias("cents")
    )


def _km_assign(
    qvecs: DataFrame,
    cents: DataFrame,
    cent_arr: DataFrame | None = None,
) -> DataFrame:
    """Assign (vec_id, qv) rows to their nearest centroid in the
    (cluster, qv) table: in-row integer-squared-L2 argmin over a 1-row
    broadcast centroid array, distances transform-precomputed once,
    ties to the lowest cluster. Shared by the Lloyd loop (q137/q138)
    and the q143 increment path — stored lists and daily batches use
    ONE assignment rule. Pass a prebuilt ``cent_arr`` to reuse the
    aggregation across stages."""
    if cent_arr is None:
        cent_arr = _km_cent_arr(cents)

    def dist_to(x):
        return F.aggregate(
            F.zip_with(
                F.col("qv"), x["qv"], lambda a, b: (a - b) * (a - b)
            ),
            F.lit(0).cast("long"),
            lambda s, v: s + v,
        )

    big = F.lit(2**62).cast("long")
    return qvecs.crossJoin(F.broadcast(cent_arr)).select(
        "vec_id",
        "qv",
        F.aggregate(
            F.transform(
                F.col("cents"),
                lambda x: F.struct(
                    dist_to(x).alias("d"),
                    x["cluster"].alias("c"),
                ),
            ),
            F.struct(big.alias("d"), F.lit(-1).cast("int").alias("c")),
            lambda acc, x: F.when(x["d"] < acc["d"], x).otherwise(acc),
        )["c"].alias("cluster"),
    )


def _km_quantized(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    return emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.floor(x * _KM_Q).cast("long")
        ).alias("qv"),
    )


def _km_fit(
    spark: SparkSession,
    sf: str,
    qvecs: DataFrame | None = None,
    k: int = _KM_K,
    iters: int = _KM_ITERS,
):
    """Run the integer Lloyd fit; returns (cents, assigned) — the
    fitted centroids (cluster, qv) and the final assignment
    (vec_id, qv, cluster). Shared by q137 (reports the fit), q138
    (probes the fitted quantizer), q143 (fits on the BASE slice via
    the ``qvecs`` override, then assigns increments against the stored
    centroids) and q146 (per-subspace PQ codebooks via k/iters).

    The fit itself is served through a plan-keyed cache (the MinHash
    pair-frame doctrine, dfcache): q137 and q138 fit the IDENTICAL
    quantizer over the same qvecs plan — one pays the iteration jobs,
    the other reads the checkpointed centroids/assignment. Keyed on
    (qvecs plan, k, iters); distinct slices (q143's base fit) or
    subspaces (q146) key separately."""
    if qvecs is None:
        qvecs = _km_quantized(spark, sf)
    from alt_spark.plans import dfcache as _dfcache

    if _dfcache.MATERIALIZE:
        key_df = qvecs
        hit_c = _KM_FIT_CACHE.get(key_df, ("cents", k, iters))
        hit_a = _KM_FIT_CACHE.get(key_df, ("assigned", k, iters))
        if hit_c is not None and hit_a is not None:
            return hit_c, hit_a
        qvecs = qvecs.localCheckpoint(eager=False)
    from pyspark.sql.window import Window

    seeds = qvecs.orderBy("vec_id").limit(k)
    cents = seeds.select(
        (
            F.row_number().over(Window.orderBy("vec_id")) - 1
        ).cast("int").alias("cluster"),
        "qv",
    )

    last_assigned = None
    for _ in range(iters):
        assigned = _km_assign(qvecs, cents)
        if _dfcache.MATERIALIZE:
            assigned = assigned.localCheckpoint(eager=True)
        dims = assigned.select(
            "cluster", F.posexplode("qv").alias("i", "v")
        )
        means = dims.groupBy("cluster", "i").agg(
            F.expr("sum(v) div count(*)").alias("val")
        )
        new_cents = means.groupBy("cluster").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "val"))),
                lambda s: s["val"],
            ).alias("qv")
        )
        # Empty clusters keep their previous centroid (deterministic —
        # never a respawn heuristic that would need a random source).
        cents = new_cents.unionByName(
            cents.join(new_cents.select("cluster"), "cluster", "left_anti")
        )
        last_assigned = assigned
    if _dfcache.MATERIALIZE:
        cents = cents.localCheckpoint(eager=False)
        _KM_FIT_CACHE.put(key_df, cents, ("cents", k, iters))
        _KM_FIT_CACHE.put(key_df, last_assigned, ("assigned", k, iters))
    return cents, last_assigned


@query("q137_kmeans_integer", oracle=_km_oracle())
def q137(spark: SparkSession, sf: str) -> DataFrame:
    """Integer-exact Lloyd k-means over the embeddings table: k={_KM_K}
    clusters, {_KM_ITERS} fixed iterations, per-dim milli-unit
    quantization, floor-mean centroid updates, ties to the lowest
    cluster id, empty clusters keep their previous centroid. Output:
    per-cluster member count, member-id checksum, and a position-
    weighted centroid checksum — the full assignment AND the exact
    centroid arithmetic are on trial.

    Plan (100 TB shape): assignment is IN-ROW — the k current centroids
    ride a 1-row broadcast as an array of structs and the argmin folds
    over it inside the scan projection (F.aggregate over zip_with), so
    the per-iteration corpus work is ONE narrow pass with no vector
    exchange; the centroid update is one map-side-combinable
    (cluster, dim) aggregate of k*dim output rows. That is the classic
    distributed-Lloyd schedule: iterations cost O(scan), state is
    k x dim integers. MLlib's float KMeans (`kmeans_assign`) stays the
    engine-native path for production k; this twin pins the semantics
    the driver can hash.
    """
    cents, last_assigned = _km_fit(spark, sf)
    members = last_assigned.groupBy("cluster").agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.sum("vec_id").cast("long").alias("id_checksum"),
    )
    return (
        cents.join(members, "cluster", "left")
        .select(
            "cluster",
            F.coalesce("n_vecs", F.lit(0).cast("long")).alias("n_vecs"),
            F.coalesce("id_checksum", F.lit(0).cast("long")).alias(
                "id_checksum"
            ),
            F.aggregate(
                F.zip_with(
                    "qv",
                    F.sequence(F.lit(1), F.size("qv")),
                    lambda x, i: x * i.cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda s, v: s + v,
            ).alias("centroid_checksum"),
        )
        .orderBy("cluster")
    )


# ---------------------------------------------------------------------------
# q138: IVF approximate-nearest-neighbor search over the q137 coarse
# quantizer — J8's SCALE path as a driver-hash-checkable query. q25
# pins the exact brute-force baseline; operators/ann.py carries the
# float IVF/LSH/PQ production forms with recall pytest; this is the
# integer twin whose ALGORITHM the oracle replays verbatim: fit the
# quantizer (the shared q137 chain — the q121 rebuild-in-query
# doctrine), pick each anchor's _IVF_NPROBE nearest cells, scan ONLY
# those cells' member lists, and return the top-_IVF_TOPK by integer
# squared L2 with total-order ties (d2, then candidate id). Recall vs
# exact is the operator family's property test; what the hash pins is
# the probe selection + cell-restricted candidate set + ranking.
_IVF_NPROBE = 2
_IVF_TOPK = 5
_IVF_ANCHOR_MOD = 50  # every 50th vector plays the query side


def _ivf_oracle() -> str:
    adist = (
        "list_sum(list_transform(list_zip(a.aqv, c.qv),"
        " p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )
    cdist = (
        "list_sum(list_transform(list_zip(p.aqv, v.qv),"
        " z -> (z[1] - z[2]) * (z[1] - z[2])))"
    )
    return f"""
WITH {_km_chain_ctes()},
anchors AS (
  SELECT vec_id AS aid, qv AS aqv FROM qvecs WHERE vec_id % {_IVF_ANCHOR_MOD} = 0
), probe AS MATERIALIZED (
  SELECT aid, aqv, cluster FROM (
    SELECT a.aid, a.aqv, c.cluster,
           row_number() OVER (PARTITION BY a.aid
                              ORDER BY {adist}, c.cluster) AS rn
    FROM anchors a CROSS JOIN c{_KM_ITERS} c
  ) WHERE rn <= {_IVF_NPROBE}
), cand AS (
  SELECT p.aid, v.vec_id AS cand_id, CAST({cdist} AS BIGINT) AS d2
  FROM probe p JOIN a{_KM_ITERS} v ON v.cluster = p.cluster
  WHERE v.vec_id <> p.aid
)
SELECT aid, rank, cand_id, d2 FROM (
  SELECT aid, cand_id, d2,
         row_number() OVER (PARTITION BY aid ORDER BY d2, cand_id) AS rank
  FROM cand
) WHERE rank <= {_IVF_TOPK}
ORDER BY aid, rank
"""


@query("q138_ivf_ann_integer", oracle=_ivf_oracle())
def q138(spark: SparkSession, sf: str) -> DataFrame:
    """IVF ANN: per anchor (every {_IVF_ANCHOR_MOD}th vector), probe
    the {_IVF_NPROBE} nearest coarse cells of the fitted integer
    quantizer and rank ONLY their members by integer squared L2 —
    top-{_IVF_TOPK} with (d2, id) total order.

    Plan (100 TB shape): this is the inverted-file promise made
    literal — the corpus-scale join is an EQUI-join on cell id between
    the (anchors × nprobe) probe rows and the assignment table (the
    persisted IVF lists; partition the list table by cluster and the
    probe is partition pruning), never a brute-force anchor×corpus
    cross; probe selection folds in-row over the k-row broadcast
    centroid array; the per-anchor cut is one bounded window over the
    probed cells' members. q25 keeps the exact baseline the recall
    pytest measures the operator family against.
    """
    cents, assigned = _km_fit(spark, sf)
    from pyspark.sql.window import Window

    cent_arr = _km_cent_arr(cents)
    anchors = assigned.filter(
        F.col("vec_id") % _IVF_ANCHOR_MOD == 0
    ).select(F.col("vec_id").alias("aid"), F.col("qv").alias("aqv"))

    def adist(x):
        return F.aggregate(
            F.zip_with(
                F.col("aqv"), x["qv"], lambda a, b: (a - b) * (a - b)
            ),
            F.lit(0).cast("long"),
            lambda s, v: s + v,
        )

    # In-row probe selection: score the sorted centroid array, sort by
    # (d, cluster) — struct order IS the tie rule — and slice nprobe.
    probes = F.slice(
        F.array_sort(
            F.transform(
                F.col("cents"),
                lambda x: F.struct(
                    adist(x).alias("d"), x["cluster"].alias("c")
                ),
            )
        ),
        1,
        _IVF_NPROBE,
    )
    probe = (
        anchors.crossJoin(F.broadcast(cent_arr))
        .select("aid", "aqv", F.explode(probes).alias("p"))
        .select("aid", "aqv", F.col("p.c").alias("cluster"))
    )
    cand = (
        probe.join(assigned, "cluster")
        .filter(F.col("vec_id") != F.col("aid"))
        .select(
            "aid",
            F.col("vec_id").alias("cand_id"),
            F.aggregate(
                F.zip_with(
                    "aqv", "qv", lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0).cast("long"),
                lambda s, v: s + v,
            ).alias("d2"),
        )
    )
    w = Window.partitionBy("aid").orderBy("d2", "cand_id")
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _IVF_TOPK)
        .select("aid", "rank", "cand_id", "d2")
        .orderBy("aid", "rank")
    )


# ---------------------------------------------------------------------------
# q141: streaming mini-batch k-means, driver-hash-checked (VERDICT r11
# item 2 — the q137 integer doctrine applied on the q131 replay
# footing to streaming/minibatch_kmeans.py, which until now carried
# float pytest parity only). The corpus re-lands as residue-keyed
# micro-batches (vec_id % _MBK_BATCHES, mtime-staggered so batch order
# == residue order), embeddings quantize to milli-units exactly like
# q137, seeds are the FIRST batch's k lowest vec_ids, and every
# micro-batch applies ONE batch-aggregated Sculley step in TRUNCATED
# integer arithmetic (n_c += n; c += (sum - n*c) div n_c — Spark `div`
# and DuckDB `//` both truncate toward zero, verified on negative
# operands), so the oracle can replay the whole trajectory as unrolled
# per-batch stages and the hash pins seeds, assignment, update
# arithmetic AND batch ordering at once.
# Reference: recap-worker/recap-worker/src/util/kmeans.rs:99-160 (the
# Sculley mini-batch path); the float production form stays
# streaming/minibatch_kmeans.py:run_streaming_minibatch_kmeans.
_MBK_K = 8
_MBK_BATCHES = 4


def _mbk_oracle() -> str:
    dist = (
        "list_sum(list_transform(list_zip(v.qv, c.qv),"
        " p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )
    stages = []
    for b in range(_MBK_BATCHES):
        stages.append(
            f"""a{b} AS MATERIALIZED (
  SELECT vec_id, qv, cluster FROM (
    SELECT v.vec_id, v.qv, c.cluster,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {dist}, c.cluster) AS rn
    FROM qvecs v CROSS JOIN c{b} c WHERE v.batch = {b}
  ) WHERE rn = 1
), m{b} AS (
  SELECT cluster, u['i'] AS i, count(*) AS n, sum(u['x']) AS s
  FROM (SELECT cluster,
               unnest(list_transform(qv, (x, i) -> {{'i': i, 'x': x}})) AS u
        FROM a{b})
  GROUP BY 1, 2
), c{b + 1} AS MATERIALIZED (
  SELECT u.cluster,
         list(CASE WHEN m.n IS NULL THEN u.x
                   ELSE u.x + (m.s - m.n * u.x) // (u.cnt + m.n)
              END ORDER BY u.i) AS qv,
         u.cnt + coalesce(max(m.n), 0) AS cnt
  FROM (SELECT cluster, cnt, uu['i'] AS i, uu['x'] AS x
        FROM (SELECT cluster, cnt,
                     unnest(list_transform(qv,
                            (x, i) -> {{'i': i, 'x': x}})) AS uu
              FROM c{b})) u
  LEFT JOIN m{b} m ON m.cluster = u.cluster AND m.i = u.i
  GROUP BY u.cluster, u.cnt
)"""
        )
    chain = ",\n".join(stages)
    return f"""
WITH qvecs AS MATERIALIZED (
  SELECT vec_id, vec_id % {_MBK_BATCHES} AS batch,
         list_transform(embedding,
                        x -> CAST(floor(x * {_KM_Q}) AS BIGINT)) AS qv
  FROM embeddings
), c0 AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cluster,
         qv, CAST(0 AS BIGINT) AS cnt
  FROM (SELECT vec_id, qv FROM qvecs WHERE batch = 0
        ORDER BY vec_id LIMIT {_MBK_K})
),
{chain}
SELECT cluster, cnt AS n_assigned,
       CAST(list_sum(list_transform(qv, (x, i) -> i * x)) AS BIGINT)
         AS centroid_checksum
FROM c{_MBK_BATCHES}
ORDER BY cluster
"""


@query("q141_streaming_minibatch_kmeans", oracle=_mbk_oracle())
def q141(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming mini-batch k-means (Sculley) through a REAL
    Structured-Streaming foreachBatch fold, driver-hash-checked: the
    embeddings land as {_MBK_BATCHES} residue-keyed micro-batches of
    pre-quantized integer vectors, the fold seeds from batch 0's
    {_MBK_K} lowest vec_ids and applies one truncated-arithmetic
    Sculley step per batch; output is per-cluster (final assigned
    count, position-weighted centroid checksum). The oracle unrolls
    the identical per-batch stages in SQL — seeds, argmin ties,
    truncated division and batch order are all on trial.

    Scale shape: per batch the corpus work is ONE narrow in-row argmin
    pass over a k-row broadcast centroid array plus a map-side-
    combinable (cluster, dim) aggregate — no vector ever shuffles;
    fold state is k x dim integers on the driver (model-sized, like
    the LM cache and the IVF centroid table). The landing/re-reading
    is harness economics (the q49/q131 device) — production points the
    same fold at the live ingest stream.
    """
    import os
    import shutil
    import tempfile

    from alt_spark.streaming.landing import (
        land_residue_chunks,
        replay_shuffle_partitions,
    )
    from alt_spark.streaming.minibatch_kmeans import (
        run_streaming_minibatch_kmeans_int,
    )

    emb = load_table(spark, sf, "embeddings")
    qvecs = emb.select(
        "vec_id",
        (F.col("vec_id") % _MBK_BATCHES).alias("batch"),
        F.transform(
            "embedding", lambda x: F.floor(x * _KM_Q).cast("long")
        ).alias("qv"),
    )

    root = tempfile.mkdtemp(prefix="q141_mbk_")
    landing = os.path.join(root, "landing")
    os.makedirs(landing)
    try:
        import time

        # The shared single-write-job landing device (this was the
        # priciest query in the sf0.01 bench detail before it; the
        # landing was half its wall).
        land_residue_chunks(
            qvecs,
            "batch",
            _MBK_BATCHES,
            landing,
            os.path.join(root, "stage"),
            time.time(),
        )
        # Replay-scale shuffle sizing (the shared discipline): the
        # per-batch (cluster, dim) aggregates are k x dim rows — 32
        # state partitions are pure task overhead here.
        with replay_shuffle_partitions(spark):
            cents, counts, n_batches = run_streaming_minibatch_kmeans_int(
                spark, landing, _MBK_K, root
            )
        if n_batches != _MBK_BATCHES:
            raise RuntimeError(
                f"expected {_MBK_BATCHES} micro-batches, saw {n_batches}"
            )
        rows = [
            (
                c,
                int(counts[c]),
                sum((i + 1) * x for i, x in enumerate(cents[c])),
            )
            for c in range(_MBK_K)
        ]
        return spark.createDataFrame(
            rows, "cluster int, n_assigned long, centroid_checksum long"
        ).orderBy("cluster")
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# q143: incremental IVF index update, driver-hash-checked (VERDICT r11
# item 4 — the incremental-index family's ANN member, the q121
# rebuild-in-query doctrine applied to the q137/q138 quantizer). The
# quantizer fits on the BASE slice only (vec_id % 4 != 3 — yesterday's
# corpus); the increment (vec_id % 4 == 3 — today's batch) assigns
# IN-ROW against the STORED centroids with the same argmin rule, the
# inverted lists grow by append only, and the anchors (drawn from the
# increment) probe nprobe cells of the UPDATED lists — base and
# increment members compete in one ranking, which is exactly what an
# incremental index must produce. `cand_is_new` marks increment
# members in the results so the hash pins list growth, not just
# ranking. Float production form: operators/ann.py ivf_assign_rows
# (+ MLlib-parity and stamped-merge rerun-safety pytest).
# Reference: rag-orchestrator hybrid_search_repo.go:72-76 (the
# serving path) + search-indexer's incremental index contract.


def _ivf_inc_oracle() -> str:
    adist = (
        "list_sum(list_transform(list_zip(a.aqv, c.qv),"
        " p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )
    idist = (
        "list_sum(list_transform(list_zip(v.qv, c.qv),"
        " p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )
    cdist = (
        "list_sum(list_transform(list_zip(p.aqv, v.qv),"
        " z -> (z[1] - z[2]) * (z[1] - z[2])))"
    )
    return f"""
WITH base_emb AS MATERIALIZED (
  SELECT * FROM embeddings WHERE vec_id % 4 <> 3
),
{_km_chain_ctes(src="base_emb")},
inc AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(x * {_KM_Q}) AS BIGINT)) AS qv
  FROM embeddings WHERE vec_id % 4 = 3
), inc_assign AS MATERIALIZED (
  SELECT vec_id, qv, cluster FROM (
    SELECT v.vec_id, v.qv, c.cluster,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {idist}, c.cluster) AS rn
    FROM inc v CROSS JOIN c{_KM_ITERS} c
  ) WHERE rn = 1
), lists AS (
  SELECT vec_id, qv, cluster FROM a{_KM_ITERS}
  UNION ALL
  SELECT vec_id, qv, cluster FROM inc_assign
), anchors AS (
  SELECT vec_id AS aid, qv AS aqv FROM inc_assign WHERE vec_id % 20 = 3
), probe AS MATERIALIZED (
  SELECT aid, aqv, cluster FROM (
    SELECT a.aid, a.aqv, c.cluster,
           row_number() OVER (PARTITION BY a.aid
                              ORDER BY {adist}, c.cluster) AS rn
    FROM anchors a CROSS JOIN c{_KM_ITERS} c
  ) WHERE rn <= {_IVF_NPROBE}
), cand AS (
  SELECT p.aid, v.vec_id AS cand_id, CAST({cdist} AS BIGINT) AS d2,
         v.vec_id % 4 = 3 AS cand_is_new
  FROM probe p JOIN lists v ON v.cluster = p.cluster
  WHERE v.vec_id <> p.aid
)
SELECT aid, rank, cand_id, d2, cand_is_new FROM (
  SELECT aid, cand_id, d2, cand_is_new,
         row_number() OVER (PARTITION BY aid ORDER BY d2, cand_id) AS rank
  FROM cand
) WHERE rank <= {_IVF_TOPK}
ORDER BY aid, rank
"""


@query("q143_ivf_incremental_update", oracle=_ivf_inc_oracle())
def q143(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental IVF update + search: fit the integer quantizer on
    the base slice, assign today's batch against the stored centroids
    (one shared argmin rule — `_km_assign`), append to the inverted
    lists, then rank each increment anchor's top-{_IVF_TOPK} within
    its {_IVF_NPROBE} probed cells of the UPDATED lists.

    Plan (100 TB shape): the increment pays ONE narrow in-row argmin
    pass over the k-row broadcast centroid table — the base corpus is
    never rescanned or reshuffled; the list table grows by append
    (partition by cluster and the append touches only assigned cells);
    the search stays an equi-join on cell id exactly like q138. That
    is the daily-batch economics the incremental-index family
    (exact-hash, LSH bands, span-grams, winnowing, embedding bands,
    syndication) already pins — this closes the ANN member.
    """
    from pyspark.sql.window import Window

    qvecs = _km_quantized(spark, sf)
    base = qvecs.filter(F.col("vec_id") % 4 != 3)
    inc = qvecs.filter(F.col("vec_id") % 4 == 3)
    cents, base_assigned = _km_fit(spark, sf, qvecs=base)
    cent_arr = _km_cent_arr(cents)
    inc_assigned = _km_assign(inc, cents, cent_arr=cent_arr)
    lists = base_assigned.select("vec_id", "qv", "cluster").unionByName(
        inc_assigned.select("vec_id", "qv", "cluster")
    )
    anchors = inc_assigned.filter(F.col("vec_id") % 20 == 3).select(
        F.col("vec_id").alias("aid"), F.col("qv").alias("aqv")
    )

    def adist(x):
        return F.aggregate(
            F.zip_with(
                F.col("aqv"), x["qv"], lambda a, b: (a - b) * (a - b)
            ),
            F.lit(0).cast("long"),
            lambda s, v: s + v,
        )

    probes = F.slice(
        F.array_sort(
            F.transform(
                F.col("cents"),
                lambda x: F.struct(
                    adist(x).alias("d"), x["cluster"].alias("c")
                ),
            )
        ),
        1,
        _IVF_NPROBE,
    )
    probe = (
        anchors.crossJoin(F.broadcast(cent_arr))
        .select("aid", "aqv", F.explode(probes).alias("p"))
        .select("aid", "aqv", F.col("p.c").alias("cluster"))
    )
    cand = (
        probe.join(lists, "cluster")
        .filter(F.col("vec_id") != F.col("aid"))
        .select(
            "aid",
            F.col("vec_id").alias("cand_id"),
            F.aggregate(
                F.zip_with(
                    "aqv", "qv", lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0).cast("long"),
                lambda s, v: s + v,
            ).alias("d2"),
            (F.col("vec_id") % 4 == 3).alias("cand_is_new"),
        )
    )
    w = Window.partitionBy("aid").orderBy("d2", "cand_id")
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _IVF_TOPK)
        .select("aid", "rank", "cand_id", "d2", "cand_is_new")
        .orderBy("aid", "rank")
    )


# ---------------------------------------------------------------------------
# q146: product-quantization ADC search, driver-hash-checked (J8's
# memory-bound scale path — `operators/ann.py` pq_train/pq_encode/
# pq_adc_topk carried recall-pytest evidence only; this is the integer
# twin in the q137/q138 doctrine). Two 32-dim subspaces, each with its
# own k=4 integer Lloyd codebook (2 fixed iterations via the shared
# `_km_fit` chain), every vector encodes to (code1, code2) — 2 small
# ints instead of 64 floats, the PQ compression promise — and each
# anchor ranks ALL codes by the ADC approximation: per-subspace
# distance tables to the codebook centroids computed ONCE per anchor
# in-row, approximate d2 = t1[code1] + t2[code2] (two array lookups
# per candidate, never a vector op). The oracle replays both codebook
# fits, the encoding and the lookup arithmetic verbatim.
_PQ_SUBS = ((1, 32), (33, 32))  # (1-based offset, length) per subspace
_PQ_K = 4
_PQ_ITERS = 2
_PQ_ANCHOR_MOD = 50
_PQ_TOPK = 5


def _pq_chain(prefix: str, lo: int, ln: int) -> str:
    """Per-subspace integer Lloyd WITH-chain for the PQ oracle — the
    SHARED `_km_chain_ctes` template with a name prefix, a qv-slice
    qvecs body, and (k, iters) = (_PQ_K, _PQ_ITERS); reads the shared
    milli-quantized `qfull`."""
    return _km_chain_ctes(
        prefix=prefix,
        k=_PQ_K,
        iters=_PQ_ITERS,
        qvecs_sql=(
            f"SELECT vec_id, list_slice(qv, {lo}, {lo + ln - 1}) AS qv"
            " FROM qfull"
        ),
    )


def _pq_oracle() -> str:
    (lo1, ln1), (lo2, ln2) = _PQ_SUBS
    d1 = (
        "list_sum(list_transform(list_zip(a.aqv1, c1.qv),"
        " p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )
    d2 = (
        "list_sum(list_transform(list_zip(a.aqv2, c2.qv),"
        " p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )
    return f"""
WITH qfull AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(x * {_KM_Q}) AS BIGINT)) AS qv
  FROM embeddings
),
{_pq_chain("s1", lo1, ln1)},
{_pq_chain("s2", lo2, ln2)},
codes AS MATERIALIZED (
  SELECT a1.vec_id, a1.cluster AS code1, a2.cluster AS code2
  FROM s1a{_PQ_ITERS} a1 JOIN s2a{_PQ_ITERS} a2 ON a2.vec_id = a1.vec_id
), anchors AS (
  SELECT vec_id AS aid,
         list_slice(qv, {lo1}, {lo1 + ln1 - 1}) AS aqv1,
         list_slice(qv, {lo2}, {lo2 + ln2 - 1}) AS aqv2
  FROM qfull WHERE vec_id % {_PQ_ANCHOR_MOD} = 0
), cand AS (
  SELECT a.aid, v.vec_id AS cand_id,
         CAST({d1} + {d2} AS BIGINT) AS adc_d2
  FROM anchors a
  JOIN codes v ON v.vec_id <> a.aid
  JOIN s1c{_PQ_ITERS} c1 ON c1.cluster = v.code1
  JOIN s2c{_PQ_ITERS} c2 ON c2.cluster = v.code2
)
SELECT aid, rank, cand_id, adc_d2 FROM (
  SELECT aid, cand_id, adc_d2,
         row_number() OVER (PARTITION BY aid ORDER BY adc_d2, cand_id) AS rank
  FROM cand
) WHERE rank <= {_PQ_TOPK}
ORDER BY aid, rank
"""


@query("q146_pq_adc_integer", oracle=_pq_oracle())
def q146(spark: SparkSession, sf: str) -> DataFrame:
    """PQ/ADC approximate nearest neighbor: per-subspace integer
    codebooks, 2-int codes, and anchor-side distance tables — each
    anchor ranks every candidate by two table LOOKUPS (see the header
    comment for what the hash pins).

    Plan (100 TB shape): this is PQ's memory economics made literal —
    the corpus-scale operand is the CODES table (2 small ints per
    vector, ~30x smaller than the embedding column; scanned once,
    never exchanged), the anchor side broadcasts (anchors x 2 tables
    of k longs — query-set-sized, the q102 broadcast-bench device),
    and per candidate the work is 2 array lookups + 1 add. The float
    production forms stay `operators/ann.py` pq_train/pq_encode/
    pq_adc_topk (recall-tested); q25/q138/q143 pin the exact and IVF
    baselines this trades accuracy against.
    """
    from pyspark.sql.window import Window

    qfull = _km_quantized(spark, sf)
    from alt_spark.plans import dfcache as _dfcache

    if _dfcache.MATERIALIZE:
        qfull = qfull.localCheckpoint(eager=False)
    (lo1, ln1), (lo2, ln2) = _PQ_SUBS
    # The per-subspace codebook fits are INDEPENDENT job chains over
    # the same checkpointed qvecs — overlap them from a 2-thread pool
    # (guide §2.6: actions are only sequential because the driver
    # calls them sequentially; the second fit's tiny jobs back-fill
    # executors the first leaves idle between its iteration barriers).
    # The fit cache is lock-protected (dfcache) and the fits write
    # DISTINCT keys; inheritable_thread_target propagates the job
    # group/description thread-locals per the PySpark docs.
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    def _fit_sub(lo_ln):
        lo, ln = lo_ln
        sub = qfull.select("vec_id", F.slice("qv", lo, ln).alias("qv"))
        return _km_fit(spark, sf, qvecs=sub, k=_PQ_K, iters=_PQ_ITERS)

    with ThreadPoolExecutor(max_workers=len(_PQ_SUBS)) as pool:
        subs = list(
            pool.map(inheritable_thread_target(spark)(_fit_sub), _PQ_SUBS)
        )
    (c1, a1), (c2, a2) = subs
    codes = a1.select("vec_id", F.col("cluster").alias("code1")).join(
        a2.select("vec_id", F.col("cluster").alias("code2")), "vec_id"
    )

    def dist(av, x):
        return F.aggregate(
            F.zip_with(av, x, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda s, v: s + v,
        )

    # Anchor-side ADC tables: centroid arrays sorted by cluster id, so
    # array position i+1 IS code i (all k rows always present — empty
    # clusters carry their previous centroid in _km_fit).
    cent1 = _km_cent_arr(c1).withColumnRenamed("cents", "cs1")
    cent2 = _km_cent_arr(c2).withColumnRenamed("cents", "cs2")
    anchors = (
        qfull.filter(F.col("vec_id") % _PQ_ANCHOR_MOD == 0)
        .select(
            F.col("vec_id").alias("aid"),
            F.slice("qv", lo1, ln1).alias("aqv1"),
            F.slice("qv", lo2, ln2).alias("aqv2"),
        )
        .crossJoin(F.broadcast(cent1))
        .crossJoin(F.broadcast(cent2))
        .select(
            "aid",
            F.transform(
                "cs1", lambda x: dist(F.col("aqv1"), x["qv"])
            ).alias("t1"),
            F.transform(
                "cs2", lambda x: dist(F.col("aqv2"), x["qv"])
            ).alias("t2"),
        )
    )
    cand = (
        codes.join(F.broadcast(anchors), F.col("vec_id") != F.col("aid"))
        .select(
            "aid",
            F.col("vec_id").alias("cand_id"),
            (
                F.element_at("t1", F.col("code1") + 1)
                + F.element_at("t2", F.col("code2") + 1)
            ).alias("adc_d2"),
        )
    )
    w = Window.partitionBy("aid").orderBy("adc_d2", "cand_id")
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _PQ_TOPK)
        .select("aid", "rank", "cand_id", "adc_d2")
        .orderBy("aid", "rank")
    )
