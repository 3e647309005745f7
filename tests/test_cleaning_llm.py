"""Cleaning, JA tokenization, LLM UDF surface, syndication (I1/I2/I4/I5/I11/I14)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from alt_spark.functions import cleaning, llm
from alt_spark.operators import syndication


def test_html_clean(spark):
    rows = [
        Row(
            id=1,
            html="<html><head><style>p{color:red}</style></head>"
            "<body><p>Hello &amp; <b>world</b></p><script>alert(1)</script>"
            "<!-- note -->  Tom &lt;3  </body></html>",
        ),
        Row(id=2, html="no markup at all"),
    ]
    df = spark.createDataFrame(rows)
    got = {r.id: r.c for r in df.select("id", cleaning.html_clean(F.col("html")).alias("c")).collect()}
    assert got[1] == "Hello & world Tom <3"
    assert got[2] == "no markup at all"


def test_sentence_split(spark):
    df = spark.createDataFrame(
        [Row(id=1, t="First one. Second!  Third?  ")]
    )
    got = df.select(cleaning.sentence_split(F.col("t")).alias("s")).first()["s"]
    assert got == ["First one.", "Second!", "Third?"]


def test_normalize_text_nfkc_and_zero_width(spark):
    df = spark.createDataFrame(
        [Row(id=1, t="ｆｕｌｌｗｉｄｔｈ　ｔｅｘｔ"), Row(id=2, t="a​b"), Row(id=3, t=None)]
    )
    got = {r.id: r.n for r in df.select("id", cleaning.normalize_text(F.col("t")).alias("n")).collect()}
    assert got[1] == "fullwidth text"
    assert got[2] == "ab"
    assert got[3] is None


def test_ja_tokenize_segmenter_goldens(spark):
    """Golden contract of the dictionary-less JA word segmenter behind
    ja_tokenize (functions/ja_segment.py): real sentences produce
    word-level tokens — stems split from particles/auxiliaries, script
    runs kept whole — not character bigrams. Frozen like the reference's
    golden_dataset_ja_sample.json pins kagome/Lindera behavior."""
    rows = [
        Row(id=1, t="Spark入門ガイド2024 edition"),
        Row(id=2, t="これはテストです。日本語の文章を書いています。"),
        Row(id=3, t="スパークで大規模なデータを処理します"),
        Row(id=4, t="関西国際空港から東京まで"),
        Row(id=5, t=None),
    ]
    df = spark.createDataFrame(rows)
    got = {
        r.id: r.t
        for r in df.select("id", cleaning.ja_tokenize(F.col("t")).alias("t")).collect()
    }
    assert got[1] == ["spark", "入門", "ガイド", "2024", "edition"]
    assert got[2] == [
        "これ", "は", "テスト", "です",
        "日本語", "の", "文章", "を", "書い", "て", "います",
    ]
    assert got[3] == [
        "スパーク", "で", "大規模", "な", "データ", "を", "処理", "します",
    ]
    # No dictionary → compounds stay whole (IPADIC would split 関西/国際/空港).
    assert got[4] == ["関西国際空港", "から", "東京", "まで"]
    assert got[5] == []


def test_ja_segment_pure_function_properties():
    """Segmenter invariants, tokenizer-contract style: concatenating the
    CJK tokens loses no CJK character, and output is deterministic."""
    from alt_spark.functions.ja_segment import segment

    s = "日本語の文章を書いています。これはテストです。"
    toks = segment(s)
    assert toks == segment(s)
    joined = "".join(toks)
    for ch in s:
        if "぀" <= ch <= "ヿ" or "一" <= ch <= "鿿":
            assert ch in joined


def test_llm_udf_batching_and_quality_gate(spark):
    rows = [
        Row(id=1, summary="rich varied summary with many distinct informative tokens present here today covering markets policy science culture"),
        Row(id=2, summary="short"),
    ] * 10
    df = spark.createDataFrame(rows).repartition(2)
    kept = llm.quality_gate(df, threshold=7).collect()
    assert {r.id for r in kept} == {1}
    assert all(r.quality >= 7 for r in kept)

    # Batching contract: the endpoint is called once per Arrow batch, not
    # per row — observable by echoing the batch size back as the value
    # (closure counters don't cross the executor boundary).
    def echo_batch_size(batch):
        return [str(len(batch))] * len(batch)

    sizes = (
        df.select(llm.make_llm_udf(echo_batch_size)(F.col("summary")).alias("s"))
        .collect()
    )
    assert all(int(r.s) > 1 for r in sizes)


def test_embedder_udf_contract_golden(spark):
    """The st_embedder-shaped contract (I14): texts in, fixed-dim
    float32 vectors out, enforced at the UDF boundary — a real model
    drops into make_embedder_udf without schema churn. Goldens pin the
    fake model so contract drift is visible in review."""
    import pytest as _pytest

    from pyspark.sql import types as T

    rows = [
        Row(id=1, text="spark shuffles data between stages"),
        Row(id=2, text="spark shuffles data between stages"),  # same → same vec
        Row(id=3, text=None),  # null folds to "" → zero-ish but valid dim
    ]
    df = spark.createDataFrame(rows)
    emb = llm.make_embedder_udf(llm.fake_embedder(dim=8), dim=8)
    out = df.select("id", emb(F.col("text")).alias("embedding"))
    # Schema contract: array<float>, the same column type the embeddings
    # testdata table uses — downstream ANN/kNN operators consume it as-is.
    assert out.schema["embedding"].dataType == T.ArrayType(T.FloatType())
    got = {r.id: r.embedding for r in out.collect()}
    assert len(got[1]) == 8
    assert got[1] == got[2]
    assert got[3] == [0.0] * 8
    # Unit-normalized output (the sentence-transformers convention).
    assert sum(x * x for x in got[1]) == _pytest.approx(1.0, abs=1e-5)

    # A model violating the dim contract fails the batch loudly, not by
    # silently widening the column.
    bad = llm.make_embedder_udf(llm.fake_embedder(dim=4), dim=8)
    with _pytest.raises(Exception, match="dim"):
        df.select(bad(F.col("text")).alias("e")).collect()


def test_canonical_url_and_syndication_collapse(spark):
    rows = [
        Row(article_id=1, link="https://WWW.Example.com:443/story/1?utm_source=x&id=9#frag", title="Big news today in the markets"),
        Row(article_id=2, link="https://example.com/story/1?id=9", title="totally different headline about sports"),
        Row(article_id=3, link="https://wire.example/agency/1", title="agency copy relay"),
        Row(article_id=4, link="https://other.example/story", title="Big news today in the markets"),
        Row(article_id=5, link="https://third.example/story", title="unrelated piece entirely about gardening"),
    ]
    df = spark.createDataFrame(rows)
    canon = {r.article_id: r.c for r in df.select("article_id", syndication.canonical_url(F.col("link")).alias("c")).collect()}
    assert canon[1] == canon[2] == "https://example.com/story/1?id=9"

    kept = {
        r.article_id
        for r in syndication.remove_syndication(
            df, wire_hosts=("wire.example",)
        ).collect()
    }
    # 2 lost to canonical-url dedup (1 wins), 3 filtered as wire host,
    # 4 collapsed into 1 by identical title, 5 survives.
    assert kept == {1, 5}


def test_scrub_pii_goldens(spark):
    """Typed redaction with the documented pattern order: URLs before
    emails (URLs embed '@'), IPs before phones (dotted quads would
    half-match the phone shape)."""
    from pyspark.sql import functions as F

    from alt_spark.functions.cleaning import scrub_pii

    cases = [
        ("mail alice@example.com now", "mail [EMAIL] now"),
        ("see https://x.io/a?b=c#d end", "see [URL] end"),
        ("via http://u:p@h.com/x end", "via [URL] end"),  # URL wins over email
        ("host 10.0.0.1 up", "host [IP] up"),
        ("call +1 (555) 123-4567 ok", "call [PHONE] ok"),
        ("plain words stay intact", "plain words stay intact"),
    ]
    df = spark.createDataFrame(cases, ["text", "expect"])
    bad = df.filter(scrub_pii(F.col("text")) != F.col("expect")).collect()
    assert not bad, bad


def test_rerank_topk_ordering_caps_and_truncation(spark):
    """Cross-encoder rerank stage (retrieval Stage 4): deterministic
    top-k by (score desc, id asc); only the best max_candidates
    incoming hits are sent to the model; candidate text is truncated
    before scoring (a match beyond the cap must not count)."""
    from alt_spark.functions.llm import fake_reranker
    from alt_spark.operators.search import rerank_topk

    query = "spark shuffle partition"
    rows = [
        (1, "spark shuffle partition join", 0.9),   # 3/3 overlap
        (2, "spark shuffle nothing else", 0.8),     # 2/3
        (3, "spark alone here", 0.7),               # 1/3
        (4, "totally unrelated words", 0.99),       # 0/3 but best incoming
        (5, "spark shuffle partition extra", 0.1),  # 3/3, worst incoming
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, score double")

    got = rerank_topk(df, query, fake_reranker, k=3).collect()
    assert [r["id"] for r in got] == [1, 5, 2], got
    assert got[0]["rerank_score"] == 1.0

    # Cap: with max_candidates=2 only ids 4 (0.99) and 1 (0.9) reach the
    # model — id 5's perfect text never gets scored.
    capped = rerank_topk(df, query, fake_reranker, k=3, max_candidates=2).collect()
    assert {r["id"] for r in capped} == {1, 4}

    # Truncation: the only overlapping tokens sit beyond the char cap.
    long_rows = [(7, ("x " * 50) + "spark shuffle partition", 0.5)]
    ldf = spark.createDataFrame(long_rows, "doc_id long, text string, score double")
    t = rerank_topk(ldf, query, fake_reranker, k=1, max_candidate_chars=40).collect()
    assert t[0]["rerank_score"] == 0.0

    # Duplicate candidate ids collapse before scoring (rerank.go's
    # candidateMap semantics) — and CONFLICTING duplicates resolve
    # deterministically to the best-scored row, so a hybrid merge that
    # carries the same id from two retrieval arms cannot flip the
    # outcome run to run.
    dup = df.union(df)
    again = rerank_topk(dup, query, fake_reranker, k=3).collect()
    assert [r["id"] for r in again] == [1, 5, 2]
    conflict = df.union(
        spark.createDataFrame(
            [(1, "no overlap at all", 0.2)], "doc_id long, text string, score double"
        )
    )
    resolved = rerank_topk(conflict, query, fake_reranker, k=3).collect()
    assert [r["id"] for r in resolved] == [1, 5, 2]
    assert resolved[0]["rerank_score"] == 1.0  # best-scored row's text won


def test_rerank_composes_with_hybrid_retrieval(spark):
    """Retrieve (hybrid RRF candidates) -> rerank -> top-k: the full
    reference retrieval chain shape, deterministic end to end with the
    fake cross-encoder."""
    from alt_spark.functions.llm import fake_reranker
    from alt_spark.operators.search import rerank_topk
    from alt_spark.queries import all_queries

    sf = "/root/testdata/sf0.001"
    # q26's hybrid RRF output is (doc_id, rrf_score, ...) over documents.
    hybrid = all_queries()["q26_hybrid_rrf"](spark, sf)  # (id, rrf_score, n_lists)
    from alt_spark.catalog import load_table

    cands = (
        hybrid.withColumnRenamed("id", "doc_id")
        .withColumnRenamed("rrf_score", "score")
        .join(load_table(spark, sf, "documents").select("doc_id", "text"), "doc_id")
    )
    out = rerank_topk(cands, "dup value table", fake_reranker, k=5)
    rows = out.collect()
    assert 0 < len(rows) <= 5
    scores = [r["rerank_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    again = [tuple(r) for r in rerank_topk(cands, "dup value table", fake_reranker, k=5).collect()]
    assert again == [tuple(r) for r in rows]


def test_rerank_explicit_missing_score_col_raises(spark):
    """A caller who NAMES a score column that isn't on the frame gets an
    error, not a silent id-ordered cap that drops the best candidates
    (r5 advice). The default sentinel keeps the documented fallback."""
    import pytest as _pytest

    from alt_spark.functions.llm import fake_reranker
    from alt_spark.operators.search import rerank_topk

    df = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text")], "doc_id long, text string"
    )
    with _pytest.raises(ValueError, match="my_score"):
        rerank_topk(df, "q", fake_reranker, k=1, incoming_score_col="my_score")
    # Default sentinel on a score-less frame: documented silent fallback.
    assert rerank_topk(df, "q", fake_reranker, k=1).count() == 1
    # Explicit None: documented opt-in to the id-ordered fallback.
    assert (
        rerank_topk(df, "q", fake_reranker, k=1, incoming_score_col=None).count()
        == 1
    )


def test_rerank_explicit_default_name_missing_also_raises(spark):
    """Passing incoming_score_col='score' EXPLICITLY on a score-less
    frame must raise too — the object sentinel distinguishes explicit
    from defaulted even when the caller names the default column."""
    import pytest as _pytest

    from alt_spark.functions.llm import fake_reranker
    from alt_spark.operators.search import rerank_topk

    df = spark.createDataFrame([(1, "alpha")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="score"):
        rerank_topk(df, "q", fake_reranker, k=1, incoming_score_col="score")
