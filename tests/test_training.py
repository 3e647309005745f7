"""Training-data preparation ops (operators/mixing.py, packing.py):
sampling determinism, chunk-cover exactness, packing invariants.
Oracle parity for Q59-Q61 lives in test_oracle.py; these are the
properties SQL can't state (determinism under repartitioning, FFD
budget-safety, packing efficiency)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alt_spark.catalog import load_table
from alt_spark.operators.mixing import PRECISION, sample_bucket, stratified_sample
from alt_spark.operators.packing import chunk_tokens, pack_contiguous, pack_ffd
from tests.conftest import SF_SMOKE


def _docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


def _tokens_col():
    return F.filter(F.split(F.lower(F.col("text")), r"\W+"), lambda x: x != "")


# ---------------------------------------------------------------------- mixing
def test_sample_rate_edges_and_subset(spark):
    docs = _docs(spark)
    langs = [r[0] for r in docs.select("lang").distinct().collect()]
    all_kept = stratified_sample(docs, {l: PRECISION for l in langs}, "lang")
    assert all_kept.count() == docs.count()
    assert stratified_sample(docs, {l: 0 for l in langs}, "lang").count() == 0
    # Undeclared strata drop: a config lists exactly what it wants.
    only_en = stratified_sample(docs, {"en": PRECISION}, "lang")
    assert only_en.filter(F.col("lang") != "en").count() == 0


def test_sample_deterministic_under_repartitioning(spark):
    docs = _docs(spark)
    rates = {"en": 3000, "de": 7000, "fr": 1234, "es": 5000, "zh": 500}
    a = {r[0] for r in stratified_sample(docs, rates, "lang").select("doc_id").collect()}
    b = {
        r[0]
        for r in stratified_sample(docs.repartition(13), rates, "lang")
        .select("doc_id")
        .collect()
    }
    assert a == b, "sampling must not depend on physical layout"
    # Different salt draws a genuinely different sample.
    c = {
        r[0]
        for r in stratified_sample(docs, rates, "lang", salt="other")
        .select("doc_id")
        .collect()
    }
    assert c != a


def test_sample_proportion_tracks_rate(spark):
    docs = _docs(spark)
    n = docs.filter(F.col("lang") == "en").count()
    kept = stratified_sample(docs, {"en": 5000}, "lang").count()
    # Binomial(n, 0.5): 4 sigma tolerance — deterministic given testdata.
    assert abs(kept - 0.5 * n) <= 4 * (n * 0.25) ** 0.5 + 1


def test_sample_bucket_range(spark):
    docs = _docs(spark)
    row = docs.select(
        F.min(sample_bucket("doc_id", "s")).alias("lo"),
        F.max(sample_bucket("doc_id", "s")).alias("hi"),
    ).first()
    assert 0 <= row["lo"] and row["hi"] < PRECISION


def test_sample_rejects_bad_rate(spark):
    with pytest.raises(ValueError):
        stratified_sample(_docs(spark), {"en": PRECISION + 1}, "lang")


# -------------------------------------------------------------------- chunking
def test_chunks_disjoint_cover_when_stride_equals_window(spark):
    docs = _docs(spark).select("doc_id", "text").withColumn("toks", _tokens_col())
    chunks = chunk_tokens(docs, F.col("toks"), "doc_id", max_tokens=16, stride=16)
    # Reassembling chunks in order must reproduce the token stream exactly.
    rebuilt = (
        chunks.groupBy("id")
        .agg(
            F.concat_ws(
                " ", F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk_text")))
                .getField("chunk_text")
            ).alias("rebuilt")
        )
    )
    orig = docs.select("doc_id", F.concat_ws(" ", "toks").alias("orig"))
    joined = orig.join(rebuilt, orig.doc_id == rebuilt.id, "left")
    bad = joined.filter(
        (F.col("orig") != F.coalesce(F.col("rebuilt"), F.lit("")))
        & (F.length("orig") > 0)
    ).count()
    assert bad == 0
    # Window bound + per-doc chunk count: ceil(n_tok / 16).
    sizes = chunks.agg(F.max("n_tok").alias("mx"), F.min("n_tok").alias("mn")).first()
    assert sizes["mx"] <= 16 and sizes["mn"] >= 1
    counts = (
        docs.select("doc_id", F.size("toks").alias("n"))
        .filter(F.col("n") > 0)
        .join(chunks.groupBy("id").agg(F.count("*").alias("c")), F.col("doc_id") == F.col("id"))
        .filter(F.col("c") != F.ceil(F.col("n") / 16.0))
        .count()
    )
    assert counts == 0


def test_chunks_overlap_stride(spark):
    docs = _docs(spark).select("doc_id", "text").withColumn("toks", _tokens_col())
    chunks = chunk_tokens(docs, F.col("toks"), "doc_id", max_tokens=32, stride=24)
    # chunk_idx is dense from 0 and each full window holds exactly 32.
    first = chunks.filter(F.col("chunk_idx") == 0).count()
    docs_nonempty = docs.filter(F.size("toks") > 0).count()
    assert first == docs_nonempty
    with pytest.raises(ValueError):
        chunk_tokens(docs, F.col("toks"), "doc_id", max_tokens=8, stride=9)


# --------------------------------------------------------------------- packing
def _sized(spark):
    docs = _docs(spark)
    return docs.select(
        "lang", "doc_id", F.size(_tokens_col()).cast("long").alias("n_tok")
    )


def test_contiguous_packing_overflow_bound(spark):
    t = _sized(spark)
    budget = 128
    binned = pack_contiguous(t, "n_tok", budget, "lang", "doc_id")
    per_bin = binned.groupBy("lang", "bin").agg(
        F.sum("n_tok").alias("s"), F.max("n_tok").alias("mx")
    )
    # Streaming-pack bound: a bin exceeds budget by less than its
    # largest (= last) document.
    assert per_bin.filter(F.col("s") >= budget + F.col("mx")).count() == 0
    # Bins are dense per shard starting at 0.
    dense = per_bin.groupBy("lang").agg(
        F.min("bin").alias("lo"), F.max("bin").alias("hi"), F.count("*").alias("c")
    )
    assert dense.filter((F.col("lo") != 0) | (F.col("c") != F.col("hi") + 1)).count() == 0


def test_ffd_packing_invariants(spark):
    t = _sized(spark)
    budget = 128
    packed = pack_ffd(t, "n_tok", budget, "lang", "doc_id").cache()
    # Partition: every doc exactly once.
    assert packed.count() == t.count()
    assert packed.select("id").distinct().count() == t.count()
    # Budget safety: only singleton bins may exceed the budget.
    per_bin = packed.groupBy("shard", "bin").agg(
        F.sum("n_tokens").alias("s"), F.count("*").alias("c")
    )
    assert per_bin.filter((F.col("s") > budget) & (F.col("c") > 1)).count() == 0
    # Determinism.
    again = pack_ffd(t, "n_tok", budget, "lang", "doc_id")
    assert packed.exceptAll(again).count() == 0
    # First-fit efficiency invariant: two bins can never both be at most
    # half full (the second's docs would have fit in the first), so each
    # shard has at most one such bin — utilization stays > 50% minus one
    # bin, the textbook FF guarantee.
    slack = per_bin.filter(F.col("s") * 2 <= budget).groupBy("shard").count()
    assert slack.filter(F.col("count") > 1).count() == 0
    packed.unpersist()


def test_ffd_oversize_doc_gets_singleton_bin(spark):
    rows = [("s", 1, 500), ("s", 2, 60), ("s", 3, 60), ("s", 4, 10)]
    df = spark.createDataFrame(rows, ["shard", "doc_id", "n_tok"])
    packed = pack_ffd(df, "n_tok", 128, "shard", "doc_id").collect()
    by_id = {r["id"]: r["bin"] for r in packed}
    # The oversize doc (500 > budget) must sit alone in its bin.
    assert sum(1 for r in packed if r["bin"] == by_id[1]) == 1


def test_ffd_randomized_shards(spark):
    """Randomized FFD coverage in one job: 40 seeded random shards with
    adversarial size mixes (tiny/budget-sized/oversize). Invariants per
    shard: partition of ids, budget safety outside singletons, at most
    one ≤-half-full bin."""
    import random

    rng = random.Random(59)
    budget = 100
    rows = []
    for shard in range(40):
        n = rng.randint(1, 60)
        for i in range(n):
            kind = rng.random()
            if kind < 0.1:
                size = rng.randint(budget + 1, budget * 3)  # oversize
            elif kind < 0.4:
                size = rng.randint(budget // 2, budget)  # near-budget
            else:
                size = rng.randint(1, budget // 2)  # small
            rows.append((str(shard), shard * 1000 + i, size))
    df = spark.createDataFrame(rows, ["shard", "doc_id", "n_tok"])
    packed = pack_ffd(df, "n_tok", budget, "shard", "doc_id").cache()
    assert packed.count() == len(rows)
    assert packed.select("id").distinct().count() == len(rows)
    per_bin = packed.groupBy("shard", "bin").agg(
        F.sum("n_tokens").alias("s"), F.count("*").alias("c")
    )
    assert per_bin.filter((F.col("s") > budget) & (F.col("c") > 1)).count() == 0
    slack = per_bin.filter(F.col("s") * 2 <= budget).groupBy("shard").count()
    assert slack.filter(F.col("count") > 1).count() == 0
    packed.unpersist()


def test_ffd_null_and_zero_token_docs(spark):
    """Null token counts pack as 0-token docs (no task failure), and
    0-token docs never join exhausted bins — in particular not an
    oversize singleton (code-review regression: int(NaN) crash and the
    t=0 <= rem=0 hole)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("shard", StringType()),
            StructField("doc_id", LongType()),
            StructField("n_tok", LongType()),
        ]
    )
    rows = [("s", 1, 500), ("s", 2, None), ("s", 3, 0), ("s", 4, 128)]
    df = spark.createDataFrame(rows, schema)
    packed = pack_ffd(df, "n_tok", 128, "shard", "doc_id").collect()
    assert len(packed) == 4
    by_id = {r["id"]: r["bin"] for r in packed}
    # Oversize doc 1 stays a singleton; the exactly-full doc 4 too
    # (rem=0 afterwards); 0/null docs share their own bin.
    assert sum(1 for r in packed if r["bin"] == by_id[1]) == 1
    assert sum(1 for r in packed if r["bin"] == by_id[4]) == 1
    assert by_id[2] == by_id[3]


def test_sample_null_id_dropped_in_both_engines(spark, ddb):
    """A NULL id has no deterministic bucket: the row is dropped by the
    Spark filter AND by the DuckDB twin (|| propagates NULL; DuckDB's
    concat() would not — code-review regression)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from alt_spark.operators.mixing import ddb_sample_bucket

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("lang", StringType())]
    )
    df = spark.createDataFrame([(None, "en"), (7, "en")], schema)
    kept = stratified_sample(df, {"en": PRECISION}, "lang")
    assert [r["doc_id"] for r in kept.collect()] == [7]
    sql = (
        "SELECT count(*) FROM (VALUES (CAST(NULL AS BIGINT)), (7)) t(doc_id) "
        f"WHERE {ddb_sample_bucket('doc_id', 'mix')} < {PRECISION}"
    )
    assert ddb.execute(sql).fetchone()[0] == 1


# -------------------------------------------------------------- decontamination
def test_decontaminate_planted_overlap(spark):
    """A corpus doc sharing one n-gram with the benchmark is removed;
    disjoint docs survive; the production hashed-gram form keeps the
    exact same set as the oracle string form."""
    from alt_spark.operators.dedup import decontaminate

    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, f"prefix words {bench_text} suffix words"),  # contains bench 5-grams
        (2, "totally unrelated content about other things entirely here"),
        (3, "alpha beta gamma unrelated tail words here now"),  # only a 3-gram overlap
    ]
    corpus = spark.createDataFrame(rows, ["doc_id", "text"])
    bench = spark.createDataFrame([(100, bench_text)], ["doc_id", "text"])
    for hashed in (False, True):
        kept = {
            r["doc_id"]
            for r in decontaminate(corpus, bench, n=5, hash_grams=hashed).collect()
        }
        assert kept == {2, 3}, (hashed, kept)


def test_decontaminate_hash_equals_string_on_corpus(spark):
    """xxhash64-gram and string-gram forms keep identical sets on the
    real corpus split q62 uses."""
    from alt_spark.operators.dedup import decontaminate

    docs = _docs(spark)
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    a = {r["doc_id"] for r in decontaminate(corpus, bench, n=5, hash_grams=True).select("doc_id").collect()}
    b = {r["doc_id"] for r in decontaminate(corpus, bench, n=5, hash_grams=False).select("doc_id").collect()}
    assert a == b
    assert len(a) < corpus.count(), "planted near-dups must trigger removals"


# --------------------------------------------------------------------------
# Q64 repetition filter / Q65 char-LM scoring (operators/lm.py,
# functions/text_analysis.repetition_metrics)


def test_repetition_metrics_known_values(spark):
    from alt_spark.functions.text_analysis import repetition_metrics
    from alt_spark.operators.dedup import tokens_col

    rows = [
        # "a b a b a b": 2-grams = [a b, b a, a b, b a, a b] →
        # top "a b" count 3, len 3 → top_cov 9; dup = 3*3 + 2*3 = 15.
        (1, "a b a b a b"),
        # all-distinct bigrams: top_cov = max single len, dup = 0.
        (2, "one two three four"),
        # fewer than 2 tokens: both 0.
        (3, "solo"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: (r["m"]["top_cov"], r["m"]["dup_chars"])
        for r in df.select(
            "doc_id", repetition_metrics(tokens_col("text"), 2).alias("m")
        ).collect()
    }
    assert out[1] == (9, 15)
    assert out[2] == (len("three four"), 0)
    assert out[3] == (0, 0)
    assert out[4] == (0, 0)


def test_repetition_in_row_matches_explode_groupby(spark):
    """The sorted-run aggregate equals the obvious explode + groupBy
    definition on real corpus text (the same cross-check the DuckDB
    oracle performs, here kept as a pure-Spark property at smoke SF)."""
    from alt_spark.functions.text_analysis import ngram_strings, repetition_metrics
    from alt_spark.operators.dedup import tokens_col

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    n = 3
    fast = {
        r["doc_id"]: (r["m"]["top_cov"], r["m"]["dup_chars"])
        for r in docs.select(
            "doc_id", repetition_metrics(tokens_col("text"), n).alias("m")
        ).collect()
    }
    slow = {
        r["doc_id"]: (r["top_cov"], r["dup_chars"])
        for r in (
            docs.select(
                "doc_id",
                F.explode(ngram_strings(tokens_col("text"), n)).alias("g"),
            )
            .groupBy("doc_id", "g")
            .agg(F.count("*").alias("c"))
            .groupBy("doc_id")
            .agg(
                F.max(F.col("c") * F.length("g")).alias("top_cov"),
                F.coalesce(
                    F.sum(
                        F.when(F.col("c") > 1, F.col("c") * F.length("g"))
                    ),
                    F.lit(0),
                ).alias("dup_chars"),
            )
            .collect()
        )
    }
    for doc_id, got in slow.items():
        assert fast[doc_id] == got, doc_id
    # Docs absent from `slow` (too short for any n-gram) must be 0/0.
    for doc_id, got in fast.items():
        if doc_id not in slow:
            assert got == (0, 0)


def test_charlm_surprisal_matches_python_model(spark):
    """avg_surprisal equals ln(total) - mean(ln cnt) over hit grams,
    recomputed with a driver-side Counter (float tolerance — the
    integer columns are oracle-exact in q65 instead)."""
    import math
    from collections import Counter

    from alt_spark.operators.lm import score_against_lm, train_char_lm

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    model = train_char_lm(docs, n=3, min_count=5)
    scored = score_against_lm(docs, model, n=3)

    local = [(r["doc_id"], r["text"].lower()) for r in docs.collect()]
    counts = Counter(
        t[i : i + 3] for _, t in local for i in range(len(t) - 2)
    )
    vocab = {g: c for g, c in counts.items() if c >= 5}
    total = sum(vocab.values())
    got = {r["doc_id"]: r for r in scored.collect()}
    assert len(got) == len(local)
    for doc_id, t in local:
        grams = [t[i : i + 3] for i in range(len(t) - 2)]
        hits = [vocab[g] for g in grams if g in vocab]
        r = got[doc_id]
        assert r["n_grams"] == len(grams)
        assert r["freq_checksum"] == sum(hits)
        if grams:
            assert r["oov_permyriad"] == 10000 * (len(grams) - len(hits)) // len(grams)
        if hits:
            want = math.log(total) - sum(math.log(c) for c in hits) / len(hits)
            assert abs(r["avg_surprisal"] - want) < 1e-9
        else:
            assert r["avg_surprisal"] is None


def test_charlm_scoring_plan_has_broadcast_model(spark):
    """The model side of the scoring join must broadcast — a shuffled
    join on gram would move the exploded corpus (O(chars) rows)."""
    from alt_spark.operators import lm
    from alt_spark.operators.lm import score_against_lm, train_char_lm

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    # Audit the RAW scoring lineage — the scored-frame registry's
    # checkpoint barrier would hide the join (test_plans' fixture
    # rationale, applied locally).
    prev = lm.SCORE_MATERIALIZE
    lm.SCORE_MATERIALIZE = False
    try:
        scored = score_against_lm(docs, train_char_lm(docs), n=3)
        plan = scored._jdf.queryExecution().executedPlan().toString()
    finally:
        lm.SCORE_MATERIALIZE = prev
    assert "BroadcastHashJoin" in plan


# --------------------------------------------------------------- segment dedup
def test_segment_dedup_hash_equals_string_on_corpus(spark):
    """The production xxhash64-keyed form and the portable string-keyed
    form (the DuckDB-oracle path, q67) make identical per-document
    decisions — extends the oracle transitively to the hashed path."""
    from alt_spark.operators.dedup import segment_dedup

    docs = load_table(spark, SF_SMOKE, "documents")
    a = segment_dedup(docs, hash_segs=True).orderBy("id").collect()
    b = segment_dedup(docs, hash_segs=False).orderBy("id").collect()
    assert a == b
    assert any(r["n_removed"] > 0 for r in a), "corpus must exercise removal"


def test_segment_dedup_untouched_doc_roundtrips(spark):
    """A document with no duplicated segments reassembles to exactly its
    own token stream (content and order preserved bit-for-bit)."""
    from alt_spark.operators.dedup import segment_dedup, tokens_col

    docs = load_table(spark, SF_SMOKE, "documents")
    joined = (
        segment_dedup(docs, hash_segs=True)
        .filter(F.col("n_removed") == 0)
        .join(docs.select(F.col("doc_id").alias("id"), "text"), "id")
    )
    assert joined.count() > 0, "corpus must contain untouched docs"
    diverged = joined.filter(
        F.col("clean_text") != F.concat_ws(" ", tokens_col("text"))
    ).count()
    assert diverged == 0


def test_segment_dedup_planted_boilerplate(spark):
    """Planted repeated boilerplate is removed from every carrier doc
    while the distinct payloads survive."""
    from alt_spark.operators.dedup import segment_dedup

    boiler = "subscribe to our newsletter today"  # 5 tokens
    rows = [(i, f"{boiler} unique payload word{i} alpha{i} beta{i}") for i in range(4)]
    rows.append((99, "entirely distinct document with original content only"))
    rows.append((98, "!!!"))  # zero tokens: row must survive with empty output
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in segment_dedup(df, width=5, hash_segs=True).collect()}
    assert len(out) == len(rows), "every input doc keeps an output row"
    for i in range(4):
        assert out[i]["n_removed"] >= 1, out[i]
        assert "subscribe" not in out[i]["clean_text"]
        assert f"word{i}" in out[i]["clean_text"]
    assert out[99]["n_removed"] == 0
    assert (out[98]["n_kept"], out[98]["n_removed"], out[98]["clean_text"]) == (0, 0, "")


# --------------------------------------------------------------- shuffle shard
def test_shuffle_shards_is_a_dense_permutation(spark):
    """Sharding partitions the corpus exactly; positions are dense
    0..n-1 within every shard; the assignment is deterministic and
    salt-sensitive."""
    from alt_spark.operators.packing import shuffle_shards

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    n = docs.count()
    out = shuffle_shards(docs, n_shards=8).persist()
    try:
        assert out.count() == n
        assert out.select("doc_id").distinct().count() == n
        # dense positions: per shard, max(pos) == count-1 and all distinct
        bad = (
            out.groupBy("shard")
            .agg(
                F.count("*").alias("c"),
                F.max("pos").alias("mx"),
                F.count_distinct("pos").alias("dp"),
            )
            .filter((F.col("mx") != F.col("c") - 1) | (F.col("dp") != F.col("c")))
            .count()
        )
        assert bad == 0
        again = shuffle_shards(docs, n_shards=8).collect()
        assert sorted(map(tuple, again)) == sorted(map(tuple, out.collect()))
        other = shuffle_shards(docs, n_shards=8, salt="epoch-2")
        moved = (
            out.join(other.withColumnRenamed("pos", "pos2").withColumnRenamed("shard", "shard2"), "doc_id")
            .filter((F.col("pos") != F.col("pos2")) | (F.col("shard") != F.col("shard2")))
            .count()
        )
        assert moved > n // 2, "a new salt must re-permute the corpus"
    finally:
        out.unpersist()


def test_shuffle_shards_balanced(spark):
    """Hash sharding stays balanced: no shard deviates wildly from the
    mean at 8 shards over the smoke corpus."""
    from alt_spark.operators.packing import shuffle_shards

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    n = docs.count()
    sizes = [
        r["c"]
        for r in shuffle_shards(docs, n_shards=8)
        .groupBy("shard")
        .agg(F.count("*").alias("c"))
        .collect()
    ]
    assert len(sizes) == 8
    mean = n / 8
    assert max(sizes) < 2 * mean and min(sizes) > mean / 2, sizes


# ------------------------------------------------------------ quality classifier
def test_quality_classifier_learns_and_separates(spark):
    """Bootstrap labels from the heuristic quality median, train on the
    even-id half, evaluate on the odd-id holdout: the classifier must
    rank held-out keep-docs above drop-docs (AUC), and planted junk
    must score below planted clean text."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    from alt_spark.operators.quality_clf import (
        bootstrap_labels,
        score_quality,
        train_quality_classifier,
    )

    docs = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "text"
    )
    labeled = bootstrap_labels(docs).persist()
    try:
        n_keep = labeled.filter(F.col("label") == 1.0).count()
        n = labeled.count()
        assert 0 < n_keep < n, "median split must produce both classes"

        train = labeled.filter(F.col("doc_id") % 2 == 0)
        test = labeled.filter(F.col("doc_id") % 2 == 1)
        model = train_quality_classifier(train)

        pred = model.transform(test.withColumn("__toks", _tokens_col()))
        auc = BinaryClassificationEvaluator(
            labelCol="label", metricName="areaUnderROC"
        ).evaluate(pred)
        assert auc > 0.75, f"held-out AUC too low: {auc}"

        planted = spark.createDataFrame(
            [
                (900001, "the data table shows a small group of customer orders and the line values sorted by key"),
                (900002, "zz zz zz zz zz zz zz zz zz zz zz zz zz zz zz zz"),
            ],
            "doc_id long, text string",
        )
        got = {r["id"]: r["keep_prob"] for r in score_quality(model, planted).collect()}
        assert got[900001] > got[900002], got
    finally:
        labeled.unpersist()


def test_quality_classifier_scoring_is_deterministic(spark):
    """Scoring the same corpus twice with one fitted model is exact."""
    from alt_spark.operators.quality_clf import (
        bootstrap_labels,
        score_quality,
        train_quality_classifier,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    model = train_quality_classifier(bootstrap_labels(docs))
    a = sorted(map(tuple, score_quality(model, docs).collect()))
    b = sorted(map(tuple, score_quality(model, docs).collect()))
    assert a == b


def test_shuffle_shards_null_id_propagates(spark):
    """A NULL id must get a NULL shuffle key (concat semantics, matching
    the oracle's ||), never silently hash the bare salt — the
    sample_bucket convention (ADVICE r4 / self-review r5)."""
    from alt_spark.operators.packing import shuffle_shards

    df = spark.createDataFrame(
        [(1,), (2,), (None,)], "doc_id long"
    )
    out = shuffle_shards(df, n_shards=4).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[None]["shard"] is None
    assert by_id[1]["shard"] is not None and by_id[2]["shard"] is not None


def test_temperature_rates_boost_rare_strata(spark):
    """alpha=0.5 tempering: keep-rate is monotone DECREASING in stratum
    size (rate ∝ sqrt(n)/n), the overall expected keep tracks the
    budget, and no rate leaves [0, PRECISION]."""
    from alt_spark.operators.mixing import PRECISION, temperature_rates

    docs = _docs(spark)
    rates = {r["lang"]: (r["n"], r["rate"]) for r in
             temperature_rates(docs, "lang", budget_permyriad=5000).collect()}
    assert len(rates) >= 3
    by_size = sorted(rates.values())
    # rate ∝ floor(sqrt(n))/n is only monotone up to floor jitter, so
    # compare strata with a REAL size gap (>=2x): the smaller must get
    # at least the larger's rate.
    for n1, r1 in by_size:
        for n2, r2 in by_size:
            if n2 >= 2 * n1:
                assert r1 >= r2, f"stratum {n1} vs {n2}: {r1} < {r2}"
    assert all(0 <= r <= PRECISION for _, r in rates.values())
    expected = sum(n * r for n, r in rates.values()) / PRECISION
    total = sum(n for n, _ in rates.values())
    assert 0.35 * total <= expected <= 0.55 * total, (expected, total)


def test_lm_model_cache_is_bounded_lru(spark):
    """Scoring against many DISTINCT models must not accumulate
    unreleased cache entries (r5 advice): the module LRU caps persisted
    models at _MODEL_CACHE_MAX and unpersists evictees."""
    from alt_spark.operators import lm
    from alt_spark.operators.lm import score_against_lm, train_char_lm

    lm._MODEL_CACHE.clear()
    docs = _docs(spark).select("doc_id", "text").limit(50)
    models = []
    for min_count in (2, 3, 4, 5, 6, 7):  # 6 distinct model plans
        m = train_char_lm(docs, n=3, min_count=min_count)
        score_against_lm(docs, m, n=3).count()
        models.append(m)
    assert len(lm._MODEL_CACHE) <= lm._MODEL_CACHE_MAX
    # The oldest models were evicted AND unpersisted (StorageLevel NONE);
    # the newest are still cached. _persist_model returned new frames,
    # so check the registry's own entries.
    cached = list(lm._MODEL_CACHE.values())
    assert all(df.storageLevel.useMemory for df in cached)
    # Re-scoring against a cached model is a registry hit, not a new entry.
    before = list(lm._MODEL_CACHE)
    score_against_lm(docs, models[-1], n=3).count()
    assert list(lm._MODEL_CACHE) == before


def _epoch_fixture(spark):
    """Skewed strata (8/30/100/262 docs) so sqrt tempering pushes the
    small strata past 1 epoch while the big one stays fractional."""
    import random

    rng = random.Random(3)
    rows, i = [], 0
    for s, n in (("s0", 8), ("s1", 30), ("s2", 100), ("s3", 262)):
        for _ in range(n):
            rows.append((i, s, rng.randint(1, 40)))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, stratum string, n_tok long")


def test_epoch_expand_hits_planned_tokens_within_one_doc(spark):
    """The draw must land within ONE document of the plan (VERDICT r6
    item 3's Done-criterion): planned_tok <= drawn_tok < planned_tok +
    max(doc tokens), exactly planned_tok when the remainder is zero —
    for every stratum, including ones the epoch cap binds."""
    from alt_spark.operators.mixing import epoch_expand, token_budget_plan

    df = _epoch_fixture(spark)
    plan = token_budget_plan(
        df, "stratum", "n_tok", budget_tokens=5000, epoch_cap_permyriad=25000
    )
    pl = {r["stratum"]: r.asDict() for r in plan.collect()}
    # The fixture must actually exercise both regimes.
    assert any(p["epochs_permyriad"] > PRECISION for p in pl.values())
    assert any(0 < p["epochs_permyriad"] < PRECISION for p in pl.values())
    drawn = epoch_expand(df, plan, "stratum", "doc_id", "n_tok")
    got = {
        r["stratum"]: r["tok"]
        for r in drawn.groupBy("stratum").agg(F.sum("n_tok").alias("tok")).collect()
    }
    mx = {
        r["stratum"]: r["mx"]
        for r in df.groupBy("stratum").agg(F.max("n_tok").alias("mx")).collect()
    }
    for s, p in pl.items():
        d = got.get(s, 0)
        if p["planned_tok"] == 0:
            assert d == 0, s
        else:
            assert p["planned_tok"] <= d < p["planned_tok"] + mx[s], (
                s, p["planned_tok"], d, mx[s],
            )
        # Full copies are complete passes: every copy below the epoch
        # floor draws the whole stratum.
        n_full = p["epochs_permyriad"] // PRECISION
        if n_full >= 1:
            per_copy = {
                r["copy"]: (r["n"], r["ids"])
                for r in drawn.filter(F.col("stratum") == s)
                .groupBy("copy")
                .agg(F.count("*").alias("n"), F.sum("doc_id").alias("ids"))
                .collect()
            }
            whole = (p["n_docs"], None)
            for c in range(1, n_full + 1):
                assert per_copy[c][0] == p["n_docs"], (s, c, per_copy, whole)


def test_epoch_expand_deterministic_under_repartitioning(spark):
    """The drawn multiset is a pure function of (ids, plan, salt) —
    identical under any physical layout (hash order + integer cumsum,
    no rand())."""
    from alt_spark.operators.mixing import epoch_expand, token_budget_plan

    df = _epoch_fixture(spark)
    plan = token_budget_plan(
        df, "stratum", "n_tok", budget_tokens=5000, epoch_cap_permyriad=25000
    )

    def multiset(frame):
        return sorted(
            (r["stratum"], r["doc_id"], r["copy"])
            for r in epoch_expand(
                frame, plan, "stratum", "doc_id", "n_tok"
            ).collect()
        )

    base = multiset(df)
    assert base == multiset(df.repartition(13))
    # A different salt draws a different fractional remainder (the full
    # copies are salt-independent by definition).
    from alt_spark.operators.mixing import epoch_expand as ee

    other = sorted(
        (r["stratum"], r["doc_id"], r["copy"])
        for r in ee(
            df, plan, "stratum", "doc_id", "n_tok", salt="other"
        ).collect()
    )
    assert other != base


def test_q75_planted_ids_cannot_collide(spark):
    """Planted probe rows (q75 Gopher gates, q63 PII, q29 CJK) use
    NEGATIVE doc_ids (r6 ADVICE: fixed positive ids would silently
    collide with generated ids when the corpus grows). Canary both
    halves of that invariant: every planted id in every device is
    negative, every generated id non-negative — at any regenerated
    scale the per-document surfaces stay keyed by doc_id."""
    from alt_spark.queries.pipeline_ops import _Q29_EXTRA
    from alt_spark.queries.training import _GOPHER_EXTRA, _PII_EXTRA
    from tests.conftest import SF_ORACLE

    for extra in (_GOPHER_EXTRA, _PII_EXTRA, _Q29_EXTRA):
        assert all(i < 0 for i, _ in extra)
    for sf in (SF_SMOKE, SF_ORACLE):
        low = (
            load_table(spark, sf, "documents")
            .agg(F.min("doc_id").alias("mn"))
            .first()["mn"]
        )
        assert low >= 0, f"{sf}: generator emitted a negative doc_id"


def test_q69_aggregate_surface_is_partition_invariant(spark):
    """q69's manifest must not depend on partitioning (r5 advice: a
    float AVG's summation order could flip a rounded digit). The fixed
    surface rounds per row then aggregates integers — identical under
    any layout of the same scored rows."""
    import random

    rng = random.Random(7)
    rows = [(i, f"s{i % 3}", rng.random()) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, source string, keep_prob double")

    def manifest(frame):
        out = (
            frame.withColumn(
                "keep_permyriad", F.round(F.col("keep_prob") * 10000).cast("long")
            )
            .groupBy("source")
            .agg(
                F.count("*").alias("n_docs"),
                F.expr("sum(keep_permyriad) div count(*)").alias("avg_keep_permyriad"),
                F.count(F.when(F.col("keep_prob") >= 0.5, 1)).alias("n_keep"),
            )
            .orderBy("source")
        )
        return [tuple(r) for r in out.collect()]

    base = manifest(df)
    assert manifest(df.repartition(17)) == base
    assert manifest(df.repartition(1)) == base
    assert manifest(df.repartition(8, "source")) == base


def test_token_budget_plan_invariants(spark):
    """Plan-table invariants on randomized strata: budget shares never
    exceed the budget in total, epochs respect the cap, planned tokens
    equal the exact integer chain, and everything is order-insensitive
    (pure arithmetic on one bounded aggregate)."""
    import random

    from alt_spark.operators.mixing import token_budget_plan

    rng = random.Random(3)
    rows = [
        (f"s{i % 7}", rng.randint(1, 400)) for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "src string, n_tok long")
    budget, cap = 100_000, 17_500
    plan = {
        r["src"]: r
        for r in token_budget_plan(
            df, "src", "n_tok", budget_tokens=budget, epoch_cap_permyriad=cap
        ).collect()
    }
    assert len(plan) == 7
    assert sum(r["target_tok"] for r in plan.values()) <= budget
    for r in plan.values():
        assert 0 <= r["epochs_permyriad"] <= cap
        assert r["weight"] == int(r["avail_tok"] ** 0.5)
        assert r["planned_tok"] == (
            r["avail_tok"] * r["epochs_permyriad"]
        ) // 10_000
        # Uncapped strata draw their target up to the epoch-quantization
        # loss: epochs are floored to permyriads, so planned can trail
        # target by at most avail/10000 tokens (and never exceeds it).
        if r["epochs_permyriad"] < cap:
            assert 0 <= r["target_tok"] - r["planned_tok"] <= r["avail_tok"] // 10_000 + 1
    # Repartitioning cannot change a pure aggregate plan.
    again = {
        r["src"]: tuple(r)
        for r in token_budget_plan(
            df.repartition(13), "src", "n_tok", budget, cap
        ).collect()
    }
    assert again == {k: tuple(v) for k, v in plan.items()}


def test_token_budget_plan_rejects_bad_args(spark):
    from alt_spark.operators.mixing import token_budget_plan

    df = spark.createDataFrame([("a", 5)], "src string, n_tok long")
    with pytest.raises(ValueError):
        token_budget_plan(df, "src", "n_tok", budget_tokens=-1)
    with pytest.raises(ValueError):
        token_budget_plan(df, "src", "n_tok", 10, epoch_cap_permyriad=-5)


def test_token_budget_plan_all_zero_tokens(spark):
    """Degenerate input (every stratum empty of tokens): the plan must
    be all-zero rows, not NULLs or a division error — cross-engine the
    oracle's greatest(tw, 1) mirrors this guard."""
    from alt_spark.operators.mixing import token_budget_plan

    df = spark.createDataFrame(
        [("a", 0), ("b", 0)], "src string, n_tok long"
    )
    rows = {r["src"]: r for r in token_budget_plan(df, "src", "n_tok", 1000).collect()}
    for r in rows.values():
        assert (r["weight"], r["target_tok"], r["epochs_permyriad"], r["planned_tok"]) == (0, 0, 0, 0)


# ------------------------------------------------------------- CDF buckets
def test_cdf_buckets_tie_coherent_terciles(spark):
    """Tie groups share a bucket; bucket boundaries follow the exact
    (k * c_lt) div n rule; buckets are monotone in score."""
    from alt_spark.operators.mixing import cdf_buckets

    # scores: 0 x4, 5 x2, 9 x3  (n=9; terciles cut at c_lt 3 and 6)
    counts = spark.createDataFrame(
        [(0, 4), (5, 2), (9, 3)], "score long, cnt long"
    )
    got = {r["score"]: r["bucket"] for r in cdf_buckets(counts, "score", "cnt").collect()}
    # c_lt(0)=0 -> 0; c_lt(5)=4 -> (3*4) div 9 = 1; c_lt(9)=6 -> 2
    assert got == {0: 0, 5: 1, 9: 2}


def test_cdf_buckets_multi_row_per_score(spark):
    """Per-(group, score) partials: sibling rows of a score must see
    the SAME c_lt (the RANGE frame sums by score value, not row
    position) and carry their grouping column through."""
    from alt_spark.operators.mixing import cdf_buckets

    counts = spark.createDataFrame(
        [("a", 0, 2), ("b", 0, 2), ("a", 5, 2), ("b", 9, 3)],
        "src string, score long, cnt long",
    )
    rows = cdf_buckets(counts, "score", "cnt").collect()
    got = {(r["src"], r["score"]): r["bucket"] for r in rows}
    # n=9: c_lt(0)=0 -> 0 for BOTH sources; c_lt(5)=4 -> 1; c_lt(9)=6 -> 2
    assert got == {("a", 0): 0, ("b", 0): 0, ("a", 5): 1, ("b", 9): 2}


def test_cdf_buckets_all_tied_single_bucket(spark):
    """A fully tied distribution cannot be split: everything is head."""
    from alt_spark.operators.mixing import cdf_buckets

    counts = spark.createDataFrame([(7, 100)], "score long, cnt long")
    assert cdf_buckets(counts, "score", "cnt", k=3).collect()[0]["bucket"] == 0


def test_cdf_buckets_all_zero_counts_bucket0(spark):
    """Degenerate input (every count 0): bucket 0 everywhere, never a
    NULL bucket from the div-by-zero (greatest guard, like
    token_budget_plan's)."""
    from alt_spark.operators.mixing import cdf_buckets

    counts = spark.createDataFrame([(1, 0), (2, 0)], "score long, cnt long")
    assert [r["bucket"] for r in cdf_buckets(counts, "score", "cnt").collect()] == [0, 0]


def test_cdf_buckets_k_validation_and_k1(spark):
    from alt_spark.operators.mixing import cdf_buckets

    counts = spark.createDataFrame([(1, 1), (2, 1)], "score long, cnt long")
    with pytest.raises(ValueError):
        cdf_buckets(counts, "score", "cnt", k=0)
    # k=1: one bucket, everything in it.
    assert {
        r["bucket"] for r in cdf_buckets(counts, "score", "cnt", k=1).collect()
    } == {0}


def test_q76_buckets_partition_and_cover(spark):
    """q76's buckets cover every document exactly once, bucket count
    deviation from n/3 is explained by ties only, and scores are
    ordered head <= middle <= tail."""
    from alt_spark.queries import all_queries

    out = all_queries()["q76_ccnet_buckets"](spark, SF_SMOKE).collect()
    docs = _docs(spark)
    n = docs.count()
    assert sum(r["n_docs"] for r in out) == n
    id_sum = docs.agg(F.sum("doc_id")).first()[0]
    assert sum(r["id_checksum"] for r in out) == id_sum
    by_bucket: dict[str, list] = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    order = {"head": 0, "middle": 1, "tail": 2}
    assert set(by_bucket) <= set(order)
    # Score ranges must be disjoint and ordered across buckets.
    ranges = sorted(
        ((min(r["min_score"] for r in rows), max(r["max_score"] for r in rows), b)
         for b, rows in by_bucket.items()),
        key=lambda t: order[t[2]],
    )
    for (lo1, hi1, _), (lo2, hi2, _) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, ranges


def test_lm_score_cache_is_bounded_and_reuses(spark):
    """The scored-frame registry (q65/q76 reuse): a second identical
    scoring call returns the SAME checkpoint-backed frame (no
    gram-explode replay — and the blocks survive
    spark.catalog.clearCache(), the bench loop's between-queries
    reset); distinct scoring shapes stay bounded at the LRU cap; an
    evicted frame still computes correct values."""
    from alt_spark.operators import lm
    from alt_spark.operators.lm import score_against_lm, train_char_lm

    lm._SCORE_CACHE.clear()
    docs = _docs(spark).select("doc_id", "text").limit(50)
    m = train_char_lm(docs, n=3, min_count=2)
    first = score_against_lm(docs, m, n=3)
    n0 = first.count()
    spark.catalog.clearCache()  # the bench reset must NOT drop reuse
    again = score_against_lm(docs, m, n=3)
    # Seen to miss twice under CONCURRENT pytest/bench load (never in a
    # single-process run); surface the cache's own miss reason so a
    # recurrence is self-diagnosing instead of a bare identity failure.
    assert again is first, (
        f"identical scoring call must be a cache hit; "
        f"miss reason: {lm._SCORE_CACHE.last_miss}"
    )
    assert again.count() == n0
    # The fused carry= shape is single-consumer by construction and
    # must NOT occupy a cache slot or gain a checkpoint barrier (the
    # r7 q72 regression, VERDICT r7 item 3).
    valid = docs.filter("length(text) >= 3").withColumn(
        "n_chars", F.length("text")
    )
    entries_before = len(lm._SCORE_CACHE)
    fused = score_against_lm(valid, m, n=3, carry=("n_chars",))
    assert len(lm._SCORE_CACHE) == entries_before, (
        "carry= shapes must skip the score cache"
    )
    assert "ExistingRDD" not in fused._jdf.queryExecution().optimizedPlan().toString(), (
        "carry= shapes must not be checkpoint-backed"
    )

    # Distinct shapes (different doc slices) evict oldest.
    for lim in (40, 30, 20):
        d = _docs(spark).select("doc_id", "text").limit(lim)
        score_against_lm(
            d, train_char_lm(d, n=3, min_count=2), n=3
        ).count()
    assert len(lm._SCORE_CACHE) <= 2
    # The evicted first frame still computes correct values (checkpoint
    # reference dropped -> blocks reclaimable; results unaffected).
    assert first.count() == n0
    lm._SCORE_CACHE.clear()


def test_plan_cache_misses_on_in_place_regeneration(spark, tmp_path):
    """semanticHash keys on scan PATHS, so overwriting a dataset in
    place (same path, same file name, new bytes) must MISS via the
    entry's input-file fingerprint — the r7 review staleness finding
    against the score cache, pinned at the shared-cache level."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from alt_spark.plans.dfcache import DataFramePlanCache

    p = str(tmp_path / "corpus.parquet")
    pq.write_table(pa.table({"doc_id": [1, 2], "x": [10, 20]}), p)
    cache = DataFramePlanCache(max_entries=2)
    df1 = spark.read.parquet(p)
    derived = df1.groupBy().sum("x")
    cache.put(df1, derived)
    assert cache.get(spark.read.parquet(p)) is derived  # warm, same bytes

    # Same path, SAME file name, different content: a plan-only key
    # would hit here and serve the stale derived frame.
    pq.write_table(
        pa.table({"doc_id": [1, 2, 3], "x": [10, 20, 999]}), p
    )
    assert cache.get(spark.read.parquet(p)) is None, (
        "in-place regeneration must invalidate plan-keyed cache entries"
    )


def test_plan_cache_survives_cache_substitution_flip(spark, tmp_path):
    """Dataset.inputFiles() returns [] while any ancestor of the scan
    is block-cached (cache substitution), and the empty answer is
    memoized per Dataset even past clearCache(). The suite-order bug
    this pins: put() under a block-cached subtree, unrelated
    clearCache(), then an identical get() — the fingerprint flips
    empty→real, and a fingerprint-IN-KEY design misses forever. The
    opaque entry state must match any digest, so the second call HITS."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from alt_spark.plans.dfcache import DataFramePlanCache

    p = str(tmp_path / "corpus.parquet")
    pq.write_table(pa.table({"doc_id": [1, 2], "x": [10, 20]}), p)
    base = spark.read.parquet(p)
    base.cache()
    base.count()
    try:
        df1 = spark.read.parquet(p)
        assert df1.inputFiles() == [], (
            "precondition drifted: cache substitution no longer hides "
            "inputFiles — revisit the opaque-fingerprint design"
        )
        cache = DataFramePlanCache(max_entries=2)
        derived = df1.groupBy().sum("x")
        cache.put(df1, derived)  # stored with the OPAQUE fingerprint
    finally:
        spark.catalog.clearCache()
    # Fresh identical plan, real file listing this time: must still hit.
    assert cache.get(spark.read.parquet(p)) is derived, cache.last_miss


def test_plan_cache_digest_entry_unverifiable_under_substitution(spark, tmp_path):
    """The asymmetric arm of the fingerprint rule: an entry stored with
    a real digest MISSES (without being dropped) while cache
    substitution hides the listing — the digest can't be re-verified,
    so the cache refuses to vouch for it and the caller recomputes;
    the recompute's put() re-keys the entry under the opaque state and
    the NEXT call in the same epoch hits."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from alt_spark.plans.dfcache import DataFramePlanCache

    p = str(tmp_path / "corpus.parquet")
    pq.write_table(pa.table({"doc_id": [1, 2], "x": [10, 20]}), p)
    cache = DataFramePlanCache(max_entries=2)
    df1 = spark.read.parquet(p)
    derived = df1.groupBy().sum("x")
    cache.put(df1, derived)  # stored with a REAL digest
    base = spark.read.parquet(p)
    base.cache()
    base.count()
    try:
        df2 = spark.read.parquet(p)
        assert df2.inputFiles() == []  # substitution epoch active
        assert cache.get(df2) is None, "unverifiable digest must miss"
        assert "unverifiable" in cache.last_miss
        assert len(cache) == 1, "the entry must not be dropped"
        # The caller's recompute re-puts under the opaque state; a
        # further call in the same epoch now hits.
        derived2 = df2.groupBy().sum("x")
        cache.put(df2, derived2)
        assert cache.get(spark.read.parquet(p)) is derived2, cache.last_miss
    finally:
        spark.catalog.clearCache()


def test_plan_cache_get_or_materialize_and_counters(spark, tmp_path):
    """Shared-materialization + instrumentation (VERDICT r7 item 3):
    the first request wraps the raw frame in a LAZY checkpoint
    (construction is plan-only — no jobs run until an action), later
    requests alias that frame, and every transition shows up in the
    stats counters that bench.py exports per round via cache_stats()."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from alt_spark.plans import dfcache
    from alt_spark.plans.dfcache import DataFramePlanCache, cache_stats

    p = str(tmp_path / "corpus.parquet")
    pq.write_table(pa.table({"doc_id": [1, 2], "x": [10, 20]}), p)
    cache = DataFramePlanCache(max_entries=2, name="__test_mat")
    try:
        def shape():
            return spark.read.parquet(p).groupBy().sum("x")

        raw = shape()
        first = cache.get_or_materialize(shape(), raw)
        assert first is not raw, "first use must wrap in a checkpoint"
        second = cache.get_or_materialize(shape(), shape())
        assert second is first, (
            f"later requests must alias the cached frame; "
            f"miss: {cache.last_miss}"
        )
        assert second.first()["sum(x)"] == 30
        s = cache.stats
        assert s["hits"] == 1 and s["misses"] == 1 and s["puts"] == 1
        assert cache_stats()["__test_mat"]["entries"] == 1
        # Hermetic switch: plan audits must get the raw frame back
        # untouched with the cache not even consulted.
        prev = dfcache.MATERIALIZE
        dfcache.MATERIALIZE = False
        try:
            audited = shape()
            assert cache.get_or_materialize(shape(), audited) is audited
            assert cache.stats["hits"] == 1, "switch off => no lookups"
        finally:
            dfcache.MATERIALIZE = prev
    finally:
        cache.clear()
        dfcache._NAMED.pop("__test_mat", None)


def test_q89_coverage_curve_invariants(spark):
    """Vocabulary coverage curve: one row per ladder size, coverage
    monotone nondecreasing in K, covered+oov == the corpus token total
    at every K, n_types <= K, and permyriad bounded."""
    from alt_spark.queries import all_queries
    from alt_spark.queries.training import _VOCAB_LADDER

    rows = all_queries()["q89_vocab_coverage"](spark, SF_SMOKE).collect()
    assert [r["vocab_size"] for r in rows] == sorted(_VOCAB_LADDER)
    total = _docs(spark).selectExpr(
        "sum(size(filter(split(lower(text), '\\\\W+'), x -> x != ''))) AS t"
    ).first()["t"]
    prev = -1
    for r in rows:
        assert r["covered_occurrences"] + r["oov_occurrences"] == total
        assert r["n_types"] <= r["vocab_size"]
        assert 0 <= r["coverage_permyriad"] <= 10000
        assert r["covered_occurrences"] >= prev
        prev = r["covered_occurrences"]
    # The largest ladder step dominates the smallest whenever the
    # vocabulary actually exceeds the smallest rung (at the sf0.001
    # smoke fixture the whole vocabulary can fit inside K=100, in
    # which case every rung must agree exactly instead).
    if rows[-1]["n_types"] > rows[0]["n_types"]:
        assert rows[-1]["covered_occurrences"] > rows[0]["covered_occurrences"]
    else:
        assert rows[-1]["covered_occurrences"] == rows[0]["covered_occurrences"]


# ----------------------------------------------------------- exact-k sampling
def test_exact_k_pruned_equals_plain_window(spark):
    """The bucket-threshold prefilter path must select the IDENTICAL
    rows (membership, rank, and bucket) as the plain-window path — the
    pruning is provably order-prefix-safe, so any divergence is a bug."""
    from alt_spark.operators.mixing import exact_k_sample

    docs = _docs(spark).select("lang", "doc_id")
    cols = ("lang", "rank", "doc_id", "hkey")
    pruned = {
        tuple(r) for r in exact_k_sample(docs, 7, "lang").select(*cols).collect()
    }
    plain = {
        tuple(r)
        for r in exact_k_sample(docs, 7, "lang", oversample=None)
        .select(*cols)
        .collect()
    }
    assert pruned == plain and pruned


def test_exact_k_counts_ranks_and_determinism(spark):
    from alt_spark.operators.mixing import exact_k_sample

    docs = _docs(spark).select("lang", "doc_id")
    per_lang = dict(docs.groupBy("lang").count().collect())
    k = 9
    sel = exact_k_sample(docs, k, "lang").collect()
    got = {}
    for r in sel:
        got.setdefault(r["lang"], []).append(r["rank"])
    for lang, n in per_lang.items():
        ranks = sorted(got.get(lang, []))
        assert ranks == list(range(1, min(k, n) + 1)), lang
    # physical layout cannot change the carve
    again = {
        (r["lang"], r["rank"], r["doc_id"])
        for r in exact_k_sample(
            docs.repartition(13), k, "lang"
        ).collect()
    }
    assert again == {(r["lang"], r["rank"], r["doc_id"]) for r in sel}
    # k beyond the stratum size keeps the whole stratum, exactly once
    all_of_it = exact_k_sample(docs, 10**6, "lang")
    assert all_of_it.count() == docs.count()
    assert all_of_it.select("doc_id").distinct().count() == docs.count()


def test_exact_k_starved_prefilter_raises(spark):
    """A deliberately starved oversample must fail LOUDLY at action
    time (the union-branch assert_true guard), never silently
    under-select. The frame is built so every row's hash key sits
    ABOVE the starved threshold (t = ceil(2^60/100) at oversample*k
    -> 1 target row over n=100), so zero rows survive the prefilter
    deterministically."""
    from alt_spark.functions.hashing import portable_hash60
    from alt_spark.operators.mixing import exact_k_sample

    hk = portable_hash60(
        F.concat(F.lit("holdout"), F.lit(":"), F.col("doc_id").cast("string"))
    )
    base = spark.range(1, 2000).select(
        F.lit("en").alias("lang"), F.col("id").alias("doc_id")
    )
    high = base.filter(hk >= (1 << 60) // 50).limit(100)
    df = spark.createDataFrame(high.collect(), "lang string, doc_id long")
    assert df.count() == 100
    with pytest.raises(Exception, match="starved stratum en"):
        exact_k_sample(df, 5, "lang", oversample=1e-9).collect()
    # sanity: the same frame carves fine at the default oversample
    assert exact_k_sample(df, 5, "lang").count() == 5


def test_exact_k_null_rows_excluded_in_both_paths(spark):
    """NULL ids and NULL strata are excluded up front, identically in
    the pruned and plain paths (a NULL id has no hash; the plain
    window would otherwise rank NULLs FIRST and the pruned join would
    drop them — review finding)."""
    from alt_spark.operators.mixing import exact_k_sample

    rows = [("en", i) for i in range(1, 40)]
    rows += [("en", None), (None, 99), (None, None)]
    df = spark.createDataFrame(rows, "lang string, doc_id long")
    cols = ("lang", "rank", "doc_id")
    pruned = {
        tuple(r) for r in exact_k_sample(df, 5, "lang").select(*cols).collect()
    }
    plain = {
        tuple(r)
        for r in exact_k_sample(df, 5, "lang", oversample=None)
        .select(*cols)
        .collect()
    }
    assert pruned == plain and len(pruned) == 5
    assert all(r[0] == "en" and r[2] is not None for r in pruned)


def test_exact_k_rejects_bad_args(spark):
    from alt_spark.operators.mixing import exact_k_sample

    docs = _docs(spark).select("lang", "doc_id")
    with pytest.raises(ValueError):
        exact_k_sample(docs, 0, "lang")
    with pytest.raises(ValueError):
        exact_k_sample(docs, 5, "lang", oversample=-1.0)


def test_plan_cache_opaque_entry_upgrades_to_digest_on_hit(spark, tmp_path):
    """An entry stored under the OPAQUE state must pin the real digest
    the first time a hit can see one, so a LATER in-place regeneration
    still invalidates it (review finding: without the upgrade an
    opaque entry matched any state forever, permanently masking
    regeneration for frames first cached under a block-cached
    subtree)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from alt_spark.plans.dfcache import DataFramePlanCache

    p = str(tmp_path / "corpus.parquet")
    pq.write_table(pa.table({"doc_id": [1, 2], "x": [10, 20]}), p)
    base = spark.read.parquet(p)
    base.cache()
    base.count()
    try:
        df1 = spark.read.parquet(p)
        assert df1.inputFiles() == []
        cache = DataFramePlanCache(max_entries=2)
        derived = df1.groupBy().sum("x")
        cache.put(df1, derived)  # stored OPAQUE
    finally:
        spark.catalog.clearCache()
    # First visible-listing hit upgrades the stored fingerprint …
    assert cache.get(spark.read.parquet(p)) is derived, cache.last_miss
    # … so an in-place regeneration afterwards MUST miss.
    pq.write_table(pa.table({"doc_id": [1, 2, 3], "x": [1, 2, 3]}), p)
    assert cache.get(spark.read.parquet(p)) is None, (
        "regeneration after an opaque→digest upgrade must invalidate"
    )


def test_epoch_expand_rejects_colliding_columns(spark):
    """A frame that already carries 'copy' (e.g. the output of a prior
    epoch_expand pass) must be rejected loudly instead of producing
    duplicate column names (review finding)."""
    from alt_spark.operators.mixing import epoch_expand, token_budget_plan

    df = _docs(spark).select(
        "lang", "doc_id", F.size(_tokens_col()).cast("long").alias("n_tok")
    )
    plan = token_budget_plan(df, "lang", "n_tok", budget_tokens=1000)
    expanded = epoch_expand(df, plan, "lang", "doc_id", "n_tok")
    with pytest.raises(ValueError, match="copy"):
        epoch_expand(expanded, plan, "lang", "doc_id", "n_tok")


# ---------------------------------------------------------------------------
def test_target_mixture_rates_match_python_reference(spark):
    """The whole integer chain — per-stratum mass, bottleneck total,
    planned masses, rates — must equal an independent pure-Python
    replay, and an undeclared stratum must get rate 0 with planned 0
    (the stratified_sample drop contract)."""
    from alt_spark.operators.mixing import target_mixture_rates
    from alt_spark.queries.training import _TGT_SHARES, _tokens_col

    docs = load_table(spark, SF_SMOKE, "documents")
    t = docs.select(
        "lang", "doc_id", F.size(_tokens_col()).cast("long").alias("n_tok")
    )
    got = {
        r["lang"]: (r["tok"], r["planned_tok"], r["rate"])
        for r in target_mixture_rates(t, "lang", _TGT_SHARES, "n_tok").collect()
    }

    toks: dict[str, int] = {}
    for r in t.groupBy("lang").agg(F.sum("n_tok").alias("tok")).collect():
        toks[r["lang"]] = int(r["tok"])
    t_total = min(
        toks[s] * PRECISION // share
        for s, share in _TGT_SHARES.items()
        if s in toks
    )
    for lang, tok in toks.items():
        share = _TGT_SHARES.get(lang)
        planned = 0 if share is None else share * t_total // PRECISION
        rate = min(PRECISION, planned * PRECISION // tok)
        assert got[lang] == (tok, planned, rate), lang
        assert planned <= tok, "a keep/drop sampler cannot upsample"
    # 'es' exists in the corpus but not in the recipe: dropped outright.
    assert "es" in toks and _TGT_SHARES.get("es") is None
    assert got["es"][1:] == (0, 0)
    # The binding stratum is kept (nearly) whole: the two floors lose
    # at most one token of mass (T floors by share, planned floors by
    # PRECISION), so its rate sits within ceil(PRECISION/tok)+1 of full.
    binding = min(
        (s for s in _TGT_SHARES if s in toks),
        key=lambda s: toks[s] * PRECISION // _TGT_SHARES[s],
    )
    slack = -(-PRECISION // toks[binding]) + 1
    assert got[binding][2] >= PRECISION - slack


def test_target_mixture_rates_validation():
    from alt_spark.operators.mixing import target_mixture_rates

    with pytest.raises(ValueError, match="sum"):
        target_mixture_rates(None, "lang", {"en": 1}, "n_tok")
    with pytest.raises(ValueError, match="share"):
        target_mixture_rates(None, "lang", {"en": 10001, "de": -1}, "n_tok")


def test_q104_padding_invariants(spark):
    """Bucket rows must partition the corpus, flat padding can never
    waste less than bucketed padding, and truncation overflow can only
    exist in the top bucket."""
    from alt_spark.queries.training import q104

    rows = q104(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        assert r["waste_flat_permyriad"] >= r["waste_bucketed_permyriad"]
        assert r["padded_bucketed"] <= r["padded_flat"]
        assert r["real_tok"] <= r["padded_bucketed"]
        if r["bucket_bound"] < 256:
            assert r["overflow_tok"] == 0


# ---------------------------------------------------------------------------
def test_q111_priority_sample_reference_and_invariance(spark):
    """The weighted draw must equal a pure-Python replay of the same
    integer->double->division arithmetic (IEEE-identical operands),
    survive repartitioning, and visibly favor heavy documents."""
    from alt_spark.functions.hashing import portable_hash60
    from alt_spark.queries.training import _WPS_K, _WPS_SALT, _tokens_col, q111

    docs = load_table(spark, SF_SMOKE, "documents")
    t = docs.select(
        "doc_id",
        F.size(_tokens_col()).cast("long").alias("w"),
        portable_hash60(
            F.concat(F.lit(_WPS_SALT), F.lit(":"), F.col("doc_id").cast("string"))
        ).alias("h"),
    ).filter(F.col("w") > 0)
    rows = t.collect()
    ref = sorted(
        ((float(r["w"]) / float(r["h"] + 1), r["doc_id"]) for r in rows),
        key=lambda x: (-x[0], x[1]),
    )[: _WPS_K]
    want = [doc for _, doc in ref]
    got = [r["doc_id"] for r in q111(spark, SF_SMOKE).collect()]
    assert got == want

    corpus_mean = sum(r["w"] for r in rows) / len(rows)
    sel_w = {r["doc_id"]: r["w"] for r in rows}
    sel_mean = sum(sel_w[d] for d in got) / len(got)
    assert sel_mean > corpus_mean


def test_target_mixture_rates_zero_mass_stratum(spark):
    """A declared stratum whose rows all carry zero weight must get
    rate 0 (and zero it NEVER keeps rows via a NULL-skipping least) —
    the r8 review finding: bare `div tok` is NULL under ANSI-off and
    F.least skips NULLs, which silently produced keep-all."""
    from alt_spark.operators.mixing import target_mixture_rates

    df = spark.createDataFrame(
        [("en", 1, 10), ("en", 2, 30), ("de", 3, 0), ("de", 4, 0)],
        ["lang", "doc_id", "n_tok"],
    )
    got = {
        r["lang"]: (r["tok"], r["planned_tok"], r["rate"])
        for r in target_mixture_rates(
            df, "lang", {"en": 5000, "de": 5000}, "n_tok"
        ).collect()
    }
    # de's zero mass makes the whole recipe unachievable: T=0.
    assert got["de"] == (0, 0, 0)
    assert got["en"] == (40, 0, 0)


def test_target_mixture_rates_null_mass_stratum(spark):
    """A declared stratum whose rows ALL carry NULL weight must bind
    T=0 exactly like the zero-weight case — the r9 review finding:
    sum(NULL)=NULL would otherwise skip the bottleneck min (F.min
    ignores NULLs) and ship the other strata at full rate."""
    from alt_spark.operators.mixing import target_mixture_rates

    df = spark.createDataFrame(
        [("en", 1, 10), ("en", 2, 30), ("de", 3, None), ("de", 4, None)],
        "lang string, doc_id long, n_tok long",
    )
    got = {
        r["lang"]: (r["tok"], r["planned_tok"], r["rate"])
        for r in target_mixture_rates(
            df, "lang", {"en": 5000, "de": 5000}, "n_tok"
        ).collect()
    }
    assert got["de"] == (0, 0, 0)
    assert got["en"] == (40, 0, 0)


def test_target_mixture_rates_missing_declared_stratum_raises(spark):
    """ADVICE r8: a declared stratum with NO corpus rows at all must be
    LOUD — without the guard it silently un-constrains the bottleneck
    min and the output violates the declared recipe (en kept at full
    rate with 0% of the missing 'fr'). Adjacent degenerate case (zero
    WEIGHT but rows present) keeps the T=0 contract, tested above."""
    from alt_spark.operators.mixing import target_mixture_rates

    df = spark.createDataFrame(
        [("en", 1, 10), ("en", 2, 30), ("de", 3, 5)],
        ["lang", "doc_id", "n_tok"],
    )
    with pytest.raises(Exception, match="declared strata absent"):
        target_mixture_rates(
            df, "lang", {"en": 4000, "de": 4000, "fr": 2000}, "n_tok"
        ).collect()
    # Healthy recipe over the same frame still computes (guard branch
    # stays empty; no behavior change for achievable recipes).
    rows = target_mixture_rates(
        df, "lang", {"en": 8000, "de": 2000}, "n_tok"
    ).collect()
    assert {r["lang"] for r in rows} == {"en", "de"}
    assert all(r["rate"] is not None for r in rows)


def test_q116_release_diff_invariants(spark):
    """The four diff classes must partition the union of both release
    gates, checksums must reconcile with a direct per-class id sum,
    and the re-clean release can only shrink token mass."""
    from alt_spark.queries.training import (
        _RDIFF_GATE_A,
        _RDIFF_GATE_B,
        _RDIFF_STOP,
        _tokens_col,
        q116,
    )

    rows = {r["diff_class"]: r for r in q116(spark, SF_SMOKE).collect()}
    assert set(rows) == {"added", "removed", "changed", "unchanged"}

    docs = load_table(spark, SF_SMOKE, "documents")
    toks = _tokens_col()
    clean = F.filter(toks, lambda t: ~t.isin(*_RDIFF_STOP))
    m = docs.select(
        "doc_id",
        F.size(toks).alias("n_raw"),
        F.size(clean).alias("n_clean"),
    ).collect()
    want: dict[str, list] = {k: [] for k in rows}
    for r in m:
        in_a, in_b = r["n_raw"] >= _RDIFF_GATE_A, r["n_clean"] >= _RDIFF_GATE_B
        if in_a and in_b:
            cls = "changed" if r["n_raw"] != r["n_clean"] else "unchanged"
        elif in_b:
            cls = "added"
        elif in_a:
            cls = "removed"
        else:
            continue
        want[cls].append(r)
    for cls, members in want.items():
        assert rows[cls]["n_docs"] == len(members), cls
        assert rows[cls]["id_checksum"] == sum(r["doc_id"] for r in members), cls
        # B's cleaning only removes tokens: tok_b <= tok_a wherever both
        # sides exist.
        if cls in ("changed", "unchanged"):
            assert rows[cls]["tok_b"] <= rows[cls]["tok_a"], cls
        if cls == "unchanged":
            assert rows[cls]["tok_b"] == rows[cls]["tok_a"]
        if cls == "added":
            assert rows[cls]["tok_a"] == 0
        if cls == "removed":
            assert rows[cls]["tok_b"] == 0
    # Classes partition the gated union: totals reconcile.
    assert sum(r["n_docs"] for r in rows.values()) == sum(
        len(v) for v in want.values()
    )


# ----------------------------------------------------------------- q122 bloom
def test_bloom_filter_has_no_false_negatives(spark):
    """Every inserted gram must probe positive — the property q122's
    exactness rests on (verify-only-candidates reproduces the q62
    truth). Checked over every benchmark gram, not a sample."""
    from alt_spark.operators.bloom import bloom_bitmap, bloom_hit
    from alt_spark.operators.dedup import shingles, tokens_col

    docs = load_table(spark, SF_SMOKE, "documents")
    grams = (
        docs.select(F.explode(shingles(tokens_col("text"), 5)).alias("g"))
        .distinct()
    )
    bitmap = bloom_bitmap(grams, "g", m_bits=1 << 14, salts=("bf1", "bf2"))
    misses = (
        grams.crossJoin(F.broadcast(bitmap))
        .filter(~bloom_hit(F.col("bloom"), F.col("g"), 1 << 14, ("bf1", "bf2")))
        .count()
    )
    assert misses == 0, "Bloom filter produced a false negative"
    # Dense layout contract: one long per 32 bits, element_at-addressable.
    row = bitmap.collect()[0]
    assert len(row["bloom"]) == (1 << 14) // 32


def test_bloom_filter_rejects_absent_grams_at_sane_rate(spark):
    """Probing grams that were NEVER inserted must mostly miss — a
    bitmap that answers 'maybe' for everything is the silent failure
    mode (wrong m, broken masks) the FP accounting would hide."""
    from alt_spark.operators.bloom import bloom_bitmap, bloom_hit

    grams = spark.range(500).select(F.concat(F.lit("in-"), "id").alias("g"))
    absent = spark.range(2000).select(F.concat(F.lit("out-"), "id").alias("g"))
    m = 1 << 14
    bitmap = bloom_bitmap(grams, "g", m_bits=m, salts=("bf1", "bf2"))
    fp = (
        absent.crossJoin(F.broadcast(bitmap))
        .filter(bloom_hit(F.col("bloom"), F.col("g"), m, ("bf1", "bf2")))
        .count()
    )
    # load = 2*500/16384 ≈ 6.1% → per-probe FP ≈ 0.4%; 2000 probes give
    # an expected ~7.5 hits. 60 (3% of probes) is >7 sigma away.
    assert fp < 60, f"false-positive rate implausibly high: {fp}/2000"


def test_q122_exact_set_matches_brute_force_decontamination(spark):
    """The Bloom path's contaminated set must equal the q62 brute-force
    rule exactly (no false negatives ⇒ verify-only-candidates is
    lossless), and candidates must be a superset of the truth."""
    from alt_spark.operators.dedup import shingles, tokens_col
    from alt_spark.queries import all_queries

    res = all_queries()["q122_bloom_decontamination"](spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", shingles(tokens_col("text"), 5).alias("grams")
    )
    bench_g = (
        docs.filter(F.col("doc_id") % 50 == 0)
        .select(F.explode("grams").alias("g"))
        .distinct()
    )
    brute = (
        docs.filter(F.col("doc_id") % 50 != 0)
        .select("doc_id", "lang", F.explode("grams").alias("g"))
        .join(bench_g, "g")
        .groupBy("lang")
        .agg(F.countDistinct("doc_id").alias("n"))
        .collect()
    )
    brute_by_lang = {r["lang"]: r["n"] for r in brute}
    for row in res:
        assert row["n_contaminated"] == brute_by_lang.get(row["lang"], 0)
        assert row["n_candidates"] >= row["n_contaminated"]
        assert row["n_false_positive"] == row["n_candidates"] - row["n_contaminated"]


def test_bloom_bitmaps_merge_losslessly_and_forget_by_generation(spark):
    """Mergeability (the streaming/incremental contract): OR of
    per-generation bitmaps == the bitmap of the union, bit for bit.
    Retention (the compacted==full contract of the stamped indexes,
    generational form): dropping the expired generation reproduces the
    freshly-built in-horizon filter exactly — and the expired
    generation's unique grams stop probing positive (loud forgetting),
    modulo the declared FP rate."""
    from alt_spark.operators.bloom import (
        bloom_bitmap,
        bloom_hit,
        merge_bloom_bitmaps,
    )

    m, salts = 1 << 14, ("bf1", "bf2")
    gens = [
        spark.range(300).select(F.concat(F.lit(f"g{i}-"), "id").alias("g"))
        for i in range(3)
    ]
    bms = [bloom_bitmap(g, "g", m, salts) for g in gens]
    # Merge == rebuild, exactly.
    merged_all = merge_bloom_bitmaps(merge_bloom_bitmaps(bms[0], bms[1]), bms[2])
    rebuilt_all = bloom_bitmap(gens[0].union(gens[1]).union(gens[2]), "g", m, salts)
    assert merged_all.collect()[0]["bloom"] == rebuilt_all.collect()[0]["bloom"]
    # Generational retention: horizon = generations 1-2.
    retained = merge_bloom_bitmaps(bms[1], bms[2])
    rebuilt_horizon = bloom_bitmap(gens[1].union(gens[2]), "g", m, salts)
    assert (
        retained.collect()[0]["bloom"] == rebuilt_horizon.collect()[0]["bloom"]
    )
    # In-horizon grams all probe positive; expired generation mostly not
    # (its grams are unique by construction, so hits are pure FP).
    hit = lambda grams, bm: (
        grams.crossJoin(F.broadcast(bm))
        .filter(bloom_hit(F.col("bloom"), F.col("g"), m, salts))
        .count()
    )
    assert hit(gens[1], retained) == 300 and hit(gens[2], retained) == 300
    assert hit(gens[0], retained) < 60, "expired generation still resident"


def test_bloom_build_ignores_null_grams_and_merge_guards_m_bits(spark):
    """A NULL gram must not shift the dense word array (that would be
    a silent false-negative class); merging bitmaps of different
    m_bits must raise, not NULL-pad — and merging SAME-size bitmaps
    built with different salts must raise too (equal arrays, disjoint
    hash families: the OR would probe as misses for half the
    insertions with no size symptom; the frames carry their own
    (m_bits, salts) metadata so the guard checks compatibility from
    data, not docstring discipline)."""
    import pytest as _pytest

    from alt_spark.operators.bloom import (
        bloom_bitmap,
        bloom_hit,
        merge_bloom_bitmaps,
    )

    m, salts = 1 << 14, ("bf1", "bf2")
    clean = spark.createDataFrame([("a b c",), ("d e f",)], "g string")
    dirty = clean.union(spark.createDataFrame([(None,)], "g string"))
    bm_clean = bloom_bitmap(clean, "g", m, salts).collect()[0]["bloom"]
    bm_dirty = bloom_bitmap(dirty, "g", m, salts).collect()[0]["bloom"]
    assert len(bm_dirty) == m // 32
    assert bm_clean == bm_dirty
    hits = (
        clean.crossJoin(
            F.broadcast(bloom_bitmap(dirty, "g", m, salts))
        )
        .filter(bloom_hit(F.col("bloom"), F.col("g"), m, salts))
        .count()
    )
    assert hits == 2
    with _pytest.raises(Exception, match=r"mismatched \(m_bits, salts\)"):
        merge_bloom_bitmaps(
            bloom_bitmap(clean, "g", 1 << 14, salts),
            bloom_bitmap(clean, "g", 1 << 15, salts),
        ).collect()
    with _pytest.raises(Exception, match=r"mismatched \(m_bits, salts\)"):
        merge_bloom_bitmaps(
            bloom_bitmap(clean, "g", m, ("bf1", "bf2")),
            bloom_bitmap(clean, "g", m, ("bf3", "bf4")),
        ).collect()


# ----------------------------------------------------------------- q125 boot
def test_bootstrap_ci_brackets_point_and_narrows_with_n(spark):
    """Deterministic statistical sanity for the Poisson bootstrap:
    (a) intervals are ordered and bracket the point estimate on the
    real corpus; (b) Poisson(1) weights average ~1 (the resample is
    unbiased in expectation); (c) on an 8x-replicated corpus the CI
    width shrinks for every language — the 1/sqrt(n) behavior that
    makes the interval MEAN something. All hash-derandomized, so these
    are exact assertions, not flaky statistics."""
    from unittest import mock

    import alt_spark.queries.training as tr

    rows = tr.q125(spark, SF_SMOKE).collect()
    assert rows
    widths = {}
    for r in rows:
        assert r["ci_lo_milli"] <= r["mean_milli"] <= r["ci_hi_milli"], r
        widths[r["lang"]] = r["ci_hi_milli"] - r["ci_lo_milli"]

    docs = load_table(spark, SF_SMOKE, "documents")
    reps = spark.range(8).select(F.col("id").alias("rep"))
    big = docs.crossJoin(reps).select(
        (F.col("doc_id") * 8 + F.col("rep")).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    with mock.patch.object(tr, "load_table", lambda *_a, **_k: big):
        big_rows = tr.q125(spark, "ignored").collect()
    for r in big_rows:
        assert (
            r["ci_hi_milli"] - r["ci_lo_milli"] < widths[r["lang"]]
        ), (r["lang"], widths[r["lang"]], r)

    # Weight unbiasedness: mean Poisson(1) draw over (docs x replicas).
    from alt_spark.functions.hashing import portable_hash60
    from alt_spark.queries.training import _BOOT_B, _BOOT_CUM

    rep = docs.select("doc_id").crossJoin(
        spark.range(_BOOT_B).select(F.col("id").alias("r"))
    )
    h = portable_hash60(
        F.concat_ws("|", F.col("doc_id"), F.col("r"), F.lit("bs"))
    )
    w = F.lit(6)
    for k, c in reversed(list(enumerate(_BOOT_CUM))):
        w = F.when(h < c, k).otherwise(w)
    stats = rep.select(w.alias("w")).agg(
        F.avg("w").alias("mu"), F.count("*").alias("n")
    ).collect()[0]
    assert 0.95 < stats["mu"] < 1.05, stats


def test_bootstrap_ci_small_stratum_excludes_empty_replicas(spark):
    """A 1-document stratum: ~e^-1 of replicas draw weight 0 and have
    NO mean — they must be excluded, not forced to 0, or ci_lo
    collapses to 0 and the interval reflects the zero-guard instead of
    resampling spread (review finding). With one document every
    surviving replica's mean equals the document's token count, so the
    interval is exactly degenerate."""
    from unittest import mock

    import alt_spark.queries.training as tr

    one = spark.createDataFrame(
        [(1, "hello world tokens here", "xx", "s", 23)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with mock.patch.object(tr, "load_table", lambda *_a, **_k: one):
        r = tr.q125(spark, "ignored").collect()[0]
    assert r["mean_milli"] == 4000
    assert r["ci_lo_milli"] == r["ci_hi_milli"] == 4000, r


# ----------------------------------------------------------------- q127 KS
def test_q127_ks_matches_pure_python_and_flags_only_real_drift(spark):
    """The cross-multiplied KS statistic must equal an exact pure-Python
    replay (unbounded ints, definitional two-sample KS over the same
    token counts), the re-clean comparison must flag in every language
    (it is a large planted shift), and the even/odd resample must not
    (same generator)."""
    from pyspark.sql import functions as F

    from alt_spark.catalog import load_table
    from alt_spark.operators.dedup import tokens_col
    from alt_spark.queries.training import _KS_C2_E4, _KS_MIN_TOKEN_LEN, q127

    sf = "/root/testdata/sf0.001"
    rows = {(r["cmp"], r["lang"]): r for r in q127(spark, sf).collect()}
    docs = (
        load_table(spark, sf, "documents")
        .select(
            "doc_id",
            "lang",
            F.size(tokens_col("text")).alias("n_raw"),
            F.size(
                F.filter(
                    tokens_col("text"),
                    lambda t: F.length(t) > _KS_MIN_TOKEN_LEN,
                )
            ).alias("n_clean"),
        )
        .collect()
    )

    def ks(sample_a, sample_b):
        values = sorted(set(sample_a) | set(sample_b))
        na, nb = len(sample_a), len(sample_b)
        ds = 0
        ca = cb = 0
        for v in values:
            ca += sum(1 for x in sample_a if x == v)
            cb += sum(1 for x in sample_b if x == v)
            ds = max(ds, abs(ca * nb - cb * na))
        return na, nb, ds

    langs = sorted({r["lang"] for r in docs})
    for lang in langs:
        sub = [r for r in docs if r["lang"] == lang]
        # resample: even vs odd ids, raw counts.
        na, nb, ds = ks(
            [r["n_raw"] for r in sub if r["doc_id"] % 2 == 0],
            [r["n_raw"] for r in sub if r["doc_id"] % 2 == 1],
        )
        got = rows[("resample", lang)]
        assert (got["n_a"], got["n_b"]) == (na, nb)
        assert got["ks_pm"] == (10000 * ds) // (na * nb)
        want_flag = int(10000 * ds * ds > _KS_C2_E4 * na * nb * (na + nb))
        assert got["drift_flag"] == want_flag == 0, (lang, got)
        # reclean: raw vs short-token-stripped counts over ALL docs.
        na, nb, ds = ks([r["n_raw"] for r in sub], [r["n_clean"] for r in sub])
        got = rows[("reclean", lang)]
        assert (got["n_a"], got["n_b"]) == (na, nb)
        assert got["ks_pm"] == (10000 * ds) // (na * nb)
        want_flag = int(10000 * ds * ds > _KS_C2_E4 * na * nb * (na + nb))
        assert got["drift_flag"] == want_flag == 1, (lang, got)


# ------------------------------------------------------------ q128 curriculum
def test_q128_steps_partition_the_global_order(spark):
    """The curriculum schedule's rank spans must exactly tile
    [1, n_docs] in step order (no gap, no overlap — a broken offset in
    the distributed rank would show here), every step must hold exactly
    _CURR_STEP docs except the last, and quality must be non-increasing
    across step boundaries (min score of step k >= max score of k+1
    under the global order's tiebreak)."""
    from alt_spark.queries.training import _CURR_STEP, q128

    sf = "/root/testdata/sf0.001"
    rows = q128(spark, sf).collect()
    by_step: dict[int, list] = {}
    for r in rows:
        by_step.setdefault(r["step"], []).append(r)
    n_docs = sum(r["n_docs"] for r in rows)
    steps = sorted(by_step)
    assert steps == list(range(len(steps)))
    lo = 1
    for s in steps:
        cells = by_step[s]
        size = sum(c["n_docs"] for c in cells)
        assert size == (_CURR_STEP if s < steps[-1] else n_docs - _CURR_STEP * s)
        assert min(c["rank_lo"] for c in cells) == lo
        assert max(c["rank_hi"] for c in cells) == lo + size - 1
        lo += size
