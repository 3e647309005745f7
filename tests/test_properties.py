"""Property-based tests (SURVEY.md §5 item 3, hypothesis).

Spark jobs are slow per example, so examples are few but adversarial:
hypothesis drives the *data shapes* (duplicate keys, ties on the sort
key, ragged splits) that break pagination and fold-merge logic.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from alt_spark.streaming.projector import fold_batch, merge_projection

# (user_id, event_id, day-offset, event_type, value)
_EVENTS = st.lists(
    st.tuples(
        st.integers(0, 5),
        st.integers(0, 10_000),
        st.integers(0, 3),
        st.sampled_from(["click", "view", "error", "signup"]),
        st.floats(0, 100, allow_nan=False),
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[1],
)


def _events_df(spark, rows):
    return spark.createDataFrame(
        [
            (u, e, f"2024-01-0{d + 1} 00:00:00", t, v)
            for u, e, d, t, v in rows
        ],
        "user_id long, event_id long, ts_s string, event_type string, value double",
    ).select(
        "user_id", "event_id", F.to_timestamp("ts_s").alias("ts"), "event_type", "value"
    )


@settings(max_examples=8, deadline=None)
@given(rows=_EVENTS, split=st.integers(0, 59))
def test_fold_merge_associative(spark, rows, split):
    """fold(all) == merge(fold(prefix), fold(suffix)) for ANY split — the
    property that makes the streaming projector equal the batch query
    regardless of micro-batch boundaries (K1/K2)."""
    split = min(split, len(rows))
    prefix, suffix = rows[:split], rows[split:]
    whole = {tuple(r) for r in fold_batch(_events_df(spark, rows)).collect()}
    if not prefix or not suffix:
        merged_df = fold_batch(_events_df(spark, prefix or suffix))
    else:
        merged_df = merge_projection(
            fold_batch(_events_df(spark, prefix)), fold_batch(_events_df(spark, suffix))
        )
    merged = {tuple(r) for r in merged_df.collect()}
    assert merged == whole


@settings(max_examples=6, deadline=None)
@given(
    keys=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)),  # (date_bucket, id)
        min_size=1,
        max_size=50,
        unique_by=lambda t: t[1],
    ),
    page_size=st.integers(1, 7),
)
def test_keyset_pagination_complete_no_overlap(spark, keys, page_size):
    """E6: walking pages by tuple-compare cursor visits every row exactly
    once in order — including ties on the leading sort column (the case
    OFFSET pagination and naive `<` cursors get wrong)."""
    df = spark.createDataFrame(keys, "d int, id long").cache()
    expected = [
        (d, i) for d, i in sorted(keys, key=lambda t: (-t[0], -t[1]))
    ]
    seen: list[tuple] = []
    cursor = None
    while True:
        page_df = df
        if cursor is not None:
            cd, ci = cursor
            page_df = page_df.filter(
                (F.col("d") < cd) | ((F.col("d") == cd) & (F.col("id") < ci))
            )
        page = page_df.orderBy(F.desc("d"), F.desc("id")).limit(page_size).collect()
        if not page:
            break
        seen.extend((r.d, r.id) for r in page)
        cursor = (page[-1].d, page[-1].id)
    assert seen == expected


@settings(max_examples=6, deadline=None)
@given(
    words=st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=25,
        unique=True,
    )
)
def test_portable_hash64_matches_duckdb(spark, words):
    """The md5-based portable hash — the foundation every MinHash/SimHash/
    winnowing oracle stands on — agrees with its DuckDB twin for
    arbitrary unicode strings, including empty and control-char text."""
    import duckdb

    from alt_spark.functions.hashing import DDB_H64, portable_hash64

    sdf = spark.createDataFrame([(w,) for w in words], "s string")
    got = {r["s"]: r["h"] for r in sdf.select("s", portable_hash64(F.col("s")).alias("h")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(w,) for w in words])
    want = dict(con.execute(f"SELECT s, {DDB_H64('s')} FROM t").fetchall())
    con.close()
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    words=st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=25,
        unique=True,
    )
)
def test_portable_hash60_matches_duckdb(spark, words):
    """The single-conv 60-bit portable hash (winnowing's gram hash)
    agrees with its DuckDB twin and never goes negative — the property
    that lets both engines skip the sign remap."""
    import duckdb

    from alt_spark.functions.hashing import DDB_H60, portable_hash60

    sdf = spark.createDataFrame([(w,) for w in words], "s string")
    got = {
        r["s"]: r["h"]
        for r in sdf.select("s", portable_hash60(F.col("s")).alias("h")).collect()
    }
    assert all(h >= 0 for h in got.values())
    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(w,) for w in words])
    want = dict(con.execute(f"SELECT s, {DDB_H60('s')} FROM t").fetchall())
    con.close()
    assert got == want


# ----------------------------------------------------------- segment dedup (r5)
_WORDS = st.sampled_from("alpha beta gamma delta eps zeta eta theta".split())
_DOC = st.lists(_WORDS, min_size=0, max_size=30).map(" ".join)


@settings(max_examples=6, deadline=None)
@given(texts=st.lists(_DOC, min_size=1, max_size=12))
def test_segment_dedup_properties(spark, texts):
    """For ANY corpus: (a) every input doc keeps exactly one output
    row; (b) a doc's surviving text is a subsequence of its own token
    stream built from whole aligned segments; (c) n_kept + n_removed ==
    its segment count; (d) a corpus with all-distinct texts of distinct
    segments removes nothing from singleton-segment docs."""
    from alt_spark.operators.dedup import segment_dedup, segment_rows

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in segment_dedup(df, width=3, hash_segs=True).collect()}
    assert set(out) == set(range(len(texts)))  # (a)
    segs = {}
    for r in segment_rows(df, width=3).collect():
        segs.setdefault(r["id"], []).append((r["seg_no"], r["seg"]))
    for i in range(len(texts)):
        doc_segs = [s for _, s in sorted(segs.get(i, []))]
        r = out[i]
        assert r["n_kept"] + r["n_removed"] == len(doc_segs)  # (c)
        # (b): clean_text must equal the in-order join of SOME subset of
        # the doc's own segments of size n_kept — verify by greedy match.
        want_tokens = r["clean_text"].split() if r["clean_text"] else []
        pool = [s.split() for s in doc_segs]
        j = 0
        matched = 0
        for seg_toks in pool:
            if want_tokens[j : j + len(seg_toks)] == seg_toks:
                j += len(seg_toks)
                matched += 1
        assert j == len(want_tokens), (r["clean_text"], doc_segs)
        assert matched >= r["n_kept"]
    # (d): a doc whose every segment is globally unique loses nothing.
    seg_docs = {}
    for did, pairs in segs.items():
        for _, seg in pairs:
            seg_docs.setdefault(seg, set()).add(did)
    for i in range(len(texts)):
        doc_segs = [s for _, s in segs.get(i, [])]
        if doc_segs and all(len(seg_docs[s]) == 1 for s in doc_segs):
            assert out[i]["n_removed"] == 0, (i, doc_segs)


@settings(max_examples=6, deadline=None)
@given(
    n_rows=st.integers(1, 40),
    n_shards=st.integers(1, 8),
    salt=st.sampled_from(["a", "b", "epoch-1"]),
)
def test_shuffle_shards_properties(spark, n_rows, n_shards, salt):
    """For ANY (corpus size, shard count, salt): exact partition, dense
    0..c-1 positions per shard, and layout independence (repartitioned
    input yields the identical permutation)."""
    from alt_spark.operators.packing import shuffle_shards
    from pyspark.sql import functions as F

    df = spark.range(n_rows).select(F.col("id").alias("doc_id"))
    out = shuffle_shards(df, n_shards=n_shards, salt=salt).collect()
    assert len(out) == n_rows
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert sum(len(v) for v in by_shard.values()) == n_rows
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))
    again = shuffle_shards(
        df.repartition(5), n_shards=n_shards, salt=salt
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


# ---------------------------------------------------------------------------
@settings(max_examples=12, deadline=None)
@given(
    words=st.lists(
        st.text(
            alphabet="abcdefghijklmnopqrstuvwxyz0189",
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=12,
        unique=True,
    )
)
def test_unigram_viterbi_random_words_match_reference(spark, words):
    """Hypothesis sweep beyond the corpus alphabet: random words
    (including digits that force the UNK path) must segment to the
    reference DP's score AND segmentation."""
    from pyspark.sql import functions as F

    from alt_spark.operators.unigram import viterbi_segment
    from tests.test_ml_ops import _py_viterbi

    df = spark.createDataFrame([(w,) for w in words], ["word"])
    got = {
        r["word"]: (r["r"]["score"], r["r"]["seg"])
        for r in df.withColumn("r", viterbi_segment(F.col("word"))).collect()
    }
    for w in words:
        assert got[w] == _py_viterbi(w), w


@settings(max_examples=10, deadline=None)
@given(
    stream=st.lists(
        st.integers(min_value=0, max_value=30), min_size=1, max_size=400
    ),
    k=st.integers(min_value=2, max_value=16),
    parts=st.integers(min_value=1, max_value=6),
)
def test_mg_summaries_bound_properties(spark, stream, k, parts):
    """Misra-Gries invariants on random integer streams under random
    partitioning: merged summary counts never exceed true counts, and
    the per-key undercount respects the N/(k+1) bound."""
    from pyspark.sql import functions as F

    from alt_spark.operators.sketch import mg_summaries

    df = spark.createDataFrame(
        [(str(x),) for x in stream], ["s"]
    ).repartition(parts)
    merged = {
        r["key"]: r["lb"]
        for r in mg_summaries(df, "s", k)
        .groupBy("key")
        .agg(F.sum("cnt_lb").alias("lb"))
        .collect()
    }
    true: dict[str, int] = {}
    for x in stream:
        true[str(x)] = true.get(str(x), 0) + 1
    n = len(stream)
    for key, lb in merged.items():
        assert 0 < lb <= true[key], key
    for key, cnt in true.items():
        # undercount bound holds per partition, so the merged bound is
        # parts * n_p/(k+1) <= n/(k+1) summed — every key above the
        # global threshold must survive with a positive count.
        if cnt > n / (k + 1):
            assert key in merged, (key, cnt, n, k)


@settings(max_examples=8, deadline=None)
@given(
    stream=st.lists(
        st.integers(min_value=0, max_value=30), min_size=1, max_size=400
    ),
    k=st.integers(min_value=2, max_value=16),
    parts=st.integers(min_value=1, max_value=6),
)
def test_merge_mg_summaries_mergeability_properties(spark, stream, k, parts):
    """Mergeable-summaries invariants (Agarwal et al. 2012) on random
    streams under random partitioning: the MERGED summary's counts are
    lower bounds, per-key undercount respects N/(k+1), any key with
    true frequency > N/(k+1) survives the merge, the survivor set is
    k-bounded, and the sentinel carries exactly N."""
    from pyspark.sql import functions as F

    from alt_spark.operators.sketch import merge_mg_summaries, mg_summaries

    df = spark.createDataFrame(
        [(str(x),) for x in stream], ["s"]
    ).repartition(parts)
    merged_rows = merge_mg_summaries(
        mg_summaries(df, "s", k, with_total=True), k
    ).collect()
    merged = {r["key"]: r["cnt_lb"] for r in merged_rows if r["key"] is not None}
    sentinel = [r["cnt_lb"] for r in merged_rows if r["key"] is None]
    n = len(stream)
    assert sentinel == [n]
    assert len(merged) <= k
    true: dict[str, int] = {}
    for x in stream:
        true[str(x)] = true.get(str(x), 0) + 1
    for key, lb in merged.items():
        assert 0 < lb <= true[key], (key, lb, true[key])
    for key, cnt in true.items():
        assert cnt - merged.get(key, 0) <= n / (k + 1), (key, cnt)
        if cnt > n / (k + 1):
            assert key in merged, key


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),   # group
            st.integers(min_value=-50, max_value=50),  # score (ties likely)
        ),
        min_size=1,
        max_size=300,
    ),
    k=st.integers(min_value=1, max_value=8),
    parts=st.integers(min_value=1, max_value=6),
)
def test_grouped_top_k_matches_python_sort(spark, rows, k, parts):
    """Salted top-k == a plain Python sort per group, for random data,
    random k, random partitioning — rank order and membership exact
    under the (score desc, id asc) total order."""
    from pyspark.sql import functions as F

    from alt_spark.operators.topk import grouped_top_k

    data = [(g, i, s) for i, (g, s) in enumerate(rows)]
    df = spark.createDataFrame(data, "g long, i long, score long").repartition(
        parts
    )
    got: dict[int, list] = {}
    for r in grouped_top_k(
        df,
        ["g"],
        F.struct((-F.col("score")).alias("ns"), F.col("i").alias("ti")),
        F.struct("i", "score"),
        k=k,
    ).collect():
        got.setdefault(r["g"], []).append((r["rnk"], r["i"], r["score"]))
    want: dict[int, list] = {}
    for g, i, s in data:
        want.setdefault(g, []).append((i, s))
    for g, members in want.items():
        ordered = sorted(members, key=lambda t: (-t[1], t[0]))[:k]
        assert sorted(got[g]) == [
            (j + 1, i, s) for j, (i, s) in enumerate(ordered)
        ], g
    assert set(got) == set(want)


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=12, max_size=40), min_size=3, max_size=10
    )
)
def test_signature_est_jaccard_matches_direct_count(spark, texts):
    """The shared agreement-fraction helper must equal a direct Python
    count of equal signature positions for every candidate pair — the
    verify step batch and incremental dedup now both ride."""
    from pyspark.sql import functions as F

    from alt_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        signature_est_jaccard,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).filter(F.size(F.split(F.lower(F.col("text")), r"\W+")) >= 3)
    if docs.count() < 2:
        return
    sigs = minhash_signatures(docs, portable=True)
    cand = lsh_candidate_pairs(sigs, portable=True)
    got = {
        (r["id1"], r["id2"]): r["est_jaccard"]
        for r in signature_est_jaccard(cand, sigs).collect()
    }
    raw = {r["id"]: list(r["signature"]) for r in sigs.collect()}
    for (a, b), est in got.items():
        want = sum(x == y for x, y in zip(raw[a], raw[b])) / len(raw[a])
        assert est == want, (a, b)


def test_tdiv_matches_spark_div_and_duckdb_floordiv():
    """Property: tdiv == Spark `div` == DuckDB `//` on every sign
    combination — the cross-engine arithmetic q141's fold rests on."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from alt_spark.streaming.minibatch_kmeans import tdiv

    con = duckdb.connect()

    @settings(max_examples=200, deadline=None)
    @given(
        st.integers(min_value=-10**12, max_value=10**12),
        st.integers(min_value=-10**6, max_value=10**6).filter(lambda b: b != 0),
    )
    def check(a, b):
        (got,) = con.execute(f"SELECT CAST({a} AS BIGINT) // CAST({b} AS BIGINT)").fetchone()
        assert tdiv(a, b) == got, (a, b, tdiv(a, b), got)
        q = abs(a) // abs(b)
        want = q if (a >= 0) == (b > 0) else -q
        assert tdiv(a, b) == want

    check()


def test_tdiv_matches_spark_div_vectorized(spark):
    """The Spark leg of the three-engine division agreement: one job
    over an adversarial sign/magnitude grid."""
    from alt_spark.streaming.minibatch_kmeans import tdiv

    pairs = [
        (a, b)
        for a in (-10**12 - 7, -101, -7, -1, 0, 1, 7, 101, 10**12 + 7)
        for b in (-10**6 - 3, -64, -3, -1, 1, 3, 64, 10**6 + 3)
    ]
    df = spark.createDataFrame(pairs, "a long, b long").selectExpr(
        "a", "b", "a div b AS q"
    )
    for r in df.collect():
        assert tdiv(r["a"], r["b"]) == r["q"], (r["a"], r["b"])
