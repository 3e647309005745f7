"""Property tests for the LLM-pipeline operator library (SURVEY §5 item 3).

Ground truth for the probabilistic operators is computed exactly (true
shingle Jaccard via set ops; brute-force cosine) and the sketches are
asserted against it: MinHash finds every strongly-duplicated pair and
estimates within ±0.15; SimHash gives Hamming 0 for identical text;
winnowing guarantees shared fingerprints for shared substrings; dedup is
idempotent. The multimodal plumbing is exercised end-to-end with the
deterministic stub kernel.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from alt_spark.catalog import load_table
from alt_spark.functions import text_analysis as ta
from alt_spark.operators import ann, dedup, multimodal

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").cache()


def _exact_jaccard_pairs(spark, docs, min_j):
    """True 3-gram shingle Jaccard >= min_j via set ops (the q24 shape)."""
    sh = docs.select(
        "doc_id", F.explode(dedup.shingles(dedup.tokens_col("text"))).alias("s")
    )
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .agg(F.count("*").alias("i"))
    )
    j = (
        inter.join(sz.select(F.col("doc_id").alias("id1"), F.col("n").alias("n1")), "id1")
        .join(sz.select(F.col("doc_id").alias("id2"), F.col("n").alias("n2")), "id2")
        .select(
            "id1",
            "id2",
            (F.col("i") / (F.col("n1") + F.col("n2") - F.col("i"))).alias("jaccard"),
        )
    )
    return {(r.id1, r.id2): r.jaccard for r in j.filter(F.col("jaccard") >= min_j).collect()}


def test_minhash_finds_all_strong_pairs_with_accurate_estimates(spark, docs):
    truth = _exact_jaccard_pairs(spark, docs, 0.9)
    assert truth, "testdata should contain planted near-duplicates"
    found = {
        (r.id1, r.id2): r.est_jaccard
        for r in dedup.minhash_near_dup(docs, threshold=0.7).collect()
    }
    missing = set(truth) - set(found)
    assert not missing, f"strong pairs missed by LSH: {missing}"
    for pair, exact in truth.items():
        assert abs(found[pair] - exact) <= 0.15, (pair, found[pair], exact)


def test_minhash_no_wild_false_positives(spark, docs):
    truth = _exact_jaccard_pairs(spark, docs, 0.4)
    found = dedup.minhash_near_dup(docs, threshold=0.7).collect()
    for r in found:
        assert (r.id1, r.id2) in truth, (
            f"pair ({r.id1},{r.id2}) est={r.est_jaccard} but true Jaccard < 0.4"
        )


def test_exact_dedup_idempotent_and_first_wins(spark, docs):
    once = dedup.exact_dedup(docs)
    twice = dedup.exact_dedup(once.drop("n_dups"))
    assert once.count() == twice.count()
    # Plant duplicates: re-id copies must lose to the lower original id.
    copies = docs.withColumn("doc_id", F.col("doc_id") + 10_000)
    planted = docs.unionByName(copies)
    kept = dedup.exact_dedup(planted)
    assert kept.count() == docs.count()
    assert kept.filter(F.col("doc_id") >= 10_000).count() == 0
    assert kept.agg(F.min("n_dups")).first()[0] >= 2


def test_simhash_identical_text_hamming_zero(spark, docs):
    base = docs.limit(20)
    copies = base.withColumn("doc_id", F.col("doc_id") + 10_000)
    pairs = dedup.simhash_near_dup(base.unionByName(copies), max_hamming=0)
    got = {(r.id1, r.id2) for r in pairs.collect()}
    expect = {(r.doc_id, r.doc_id + 10_000) for r in base.collect()}
    assert expect <= got


def test_brute_force_topk_matches_numpy(spark):
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet")
    E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    ids = np.array(t["vec_id"].to_pylist())
    q = E[0]
    sims = (E @ q) / (np.linalg.norm(E, axis=1) * np.linalg.norm(q))
    order = sorted(zip(-sims, ids))[:10]
    want = [int(i) for _, i in order]

    emb = load_table(spark, SF, "embeddings")
    got = [r.id for r in ann.brute_force_topk(emb, [float(x) for x in q], k=10).collect()]
    assert got == want


def test_lsh_topk_is_subset_with_reasonable_recall(spark):
    emb = load_table(spark, SF, "embeddings").cache()
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = [r.id for r in ann.brute_force_topk(emb, qvec, k=10).collect()]
    approx = ann.lsh_topk(emb, qvec, dim=64, k=10, num_planes=4).collect()
    assert approx, "probed buckets must not be empty"
    # Every returned similarity must be genuine (verify against exact scan).
    exact_all = {
        r.id: r.cos_sim for r in ann.brute_force_topk(emb, qvec, k=10_000).collect()
    }
    for r in approx:
        assert abs(exact_all[r.id] - r.cos_sim) < 1e-9
    recall = len({r.id for r in approx} & set(exact)) / 10
    # Deterministic given fixed hyperplanes/data; random 64-dim gaussians
    # are a worst case for SRP, so the bound is intentionally modest.
    assert recall >= 0.2, f"recall collapsed: {recall}"


def test_ivf_topk_beats_unprobed_and_scores_are_genuine(spark):
    emb = load_table(spark, SF, "embeddings").cache()
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = [r.id for r in ann.brute_force_topk(emb, qvec, k=10).collect()]
    index = ann.ivf_index(emb, nlist=8)
    approx = ann.ivf_topk(emb, qvec, k=10, nlist=8, nprobe=4, index=index).collect()
    assert approx, "probed lists must not be empty"
    exact_all = {
        r.id: r.cos_sim for r in ann.brute_force_topk(emb, qvec, k=10_000).collect()
    }
    for r in approx:
        assert abs(exact_all[r.id] - r.cos_sim) < 1e-9
    recall = len({r.id for r in approx} & set(exact)) / 10
    # Data-adaptive lists (KMeans) on clustered testdata: the query's own
    # list plus 3 neighbors should catch at least half the true top-10.
    assert recall >= 0.5, f"IVF recall collapsed: {recall}"
    # The index must actually prune: assigned lists partition the corpus.
    assigned, _ = index
    n_lists = assigned.select("list_id").distinct().count()
    assert n_lists == 8


def test_winnowing_shared_substring_guarantee(spark):
    shared = "the quick brown fox jumps over the lazy dog"
    rows = [
        Row(doc_id=1, text=f"PREFIX AAA {shared} SUFFIX BBB"),
        Row(doc_id=2, text=f"other words entirely {shared} zzz"),
        Row(doc_id=3, text="completely disjoint content qqq uuu vvv"),
        Row(doc_id=4, text="xy"),  # shorter than one k-gram: empty fingerprint set
    ]
    df = spark.createDataFrame(rows)
    fp = ta.winnowing_fingerprints(df)
    got = {r.id: set(r.fingerprints) for r in fp.collect()}
    assert got[1] & got[2], "docs sharing a long substring must share fingerprints"
    assert not (got[1] & got[3])
    assert got[4] == set()


def test_lang_id_markers_and_abstain(spark):
    rows = [
        Row(id=1, text="the cat and the dog of the house is in that garden with joy"),
        Row(id=2, text="der hund und die katze ist nicht mit dem mann"),
        Row(id=3, text="le chat est dans la maison et les jardins"),
        Row(id=4, text="el perro es una mascota que vive en los parques por aqui"),
        Row(id=5, text="xyzzy plugh"),  # too short → abstain
        Row(id=6, text="zz qq ww ee rr tt"),  # no votes → abstain
    ]
    df = spark.createDataFrame(rows)
    got = {r.id: r.lang for r in df.select("id", ta.lang_id(F.col("text")).alias("lang")).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "es", 5: None, 6: None}


def test_lang_id_cjk_script_votes(spark):
    """Kana chars vote ja (the \\W+ tokenizer yields ZERO tokens for
    unsegmented CJK text); han without kana votes zh; a couple of kana
    in otherwise-English prose must not outvote the en markers; short
    CJK abstains like short Latin (language_detection.rs EN/JA gate)."""
    rows = [
        Row(id=1, text="これはテストです。日本語の文章を書いています。"),
        Row(id=2, text="スパークで大規模なデータを処理します。"),  # katakana+han
        Row(id=3, text="这是一个测试文档只有汉字没有假名。"),  # han only → zh
        Row(id=4, text="the cat is in the house with の and that dog"),  # en wins
        Row(id=5, text="あ"),  # 1 script char < gate → abstain
    ]
    df = spark.createDataFrame(rows)
    got = {r.id: r.lang for r in df.select("id", ta.lang_id(F.col("text")).alias("lang")).collect()}
    assert got == {1: "ja", 2: "ja", 3: "zh", 4: "en", 5: None}


def test_stopword_ratio_unknown_lang_is_zero(spark):
    """A language with no marker table (e.g. ja — unsegmented script)
    scores 0.0 instead of raising KeyError at plan-build time."""
    df = spark.createDataFrame([Row(id=1, text="の の の")])
    out = df.select(ta.stopword_ratio(F.col("text"), "ja").alias("r")).collect()
    assert out[0].r == 0.0


def test_multimodal_stub_pipeline_shapes(spark):
    rows = [
        Row(
            media_id=i,
            payload=bytes([i % 251] * (50 + i)),
            meta=Row(mime="image/png", width=1000 + i, height=400, duration_ms=None),
        )
        for i in range(5)
    ] + [
        Row(
            media_id=100,
            payload=b"\x00\x01",
            meta=Row(mime="video/mp4", width=400, height=300, duration_ms=3500),
        )
    ]
    media = multimodal.media_table(spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA))

    feats = multimodal.decode_features(media, dim=8)
    got = {r.media_id: r for r in feats.collect()}
    assert len(got) == 6
    assert len(got[0].feature) == 8 and got[0].n_bytes == 50
    # Deterministic stub: same payload → same feature, twice.
    again = {r.media_id: r.feature for r in multimodal.decode_features(media, dim=8).collect()}
    assert all(got[k].feature == again[k] for k in got)

    plan = {r.media_id: r for r in multimodal.resize_plan(media, max_px=512).collect()}
    assert plan[0].needs_resize and plan[0].target_w == 512
    assert not plan[100].needs_resize and plan[100].scale == 1.0

    frames = multimodal.frame_sample_plan(media, every_ms=1000).collect()
    assert {r.frame_ts_ms for r in frames} == {0, 1000, 2000, 3000}


def _make_bmp(w: int, h: int, pixel_fn) -> bytes:
    """Minimal uncompressed 24-bit BMP (BITMAPINFOHEADER, bottom-up)."""
    import struct

    row_size = ((w * 3 + 3) // 4) * 4
    data = bytearray()
    for r in range(h):
        row = bytearray()
        for c in range(w):
            b, g, rd = pixel_fn(c, r)
            row += bytes([b, g, rd])
        row += b"\x00" * (row_size - len(row))
        data += row
    off = 54
    hdr = (
        b"BM"
        + struct.pack("<IHHI", off + len(data), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    )
    return bytes(hdr) + bytes(data)


def test_multimodal_real_bmp_decode(spark):
    """image/bmp routes through the REAL header-parse + luminance-pool
    kernel: a half-white half-black image pools to [1.0, 0.0]; a payload
    claiming image/bmp but not decodable falls back to the stub; other
    MIME types keep the stub."""
    white_black = _make_bmp(
        8, 4, lambda c, r: (255, 255, 255) if c < 4 else (0, 0, 0)
    )
    rows = [
        Row(media_id=1, payload=white_black,
            meta=Row(mime="image/bmp", width=8, height=4, duration_ms=None)),
        Row(media_id=2, payload=b"BMnot-a-real-bmp",
            meta=Row(mime="image/bmp", width=1, height=1, duration_ms=None)),
        Row(media_id=3, payload=white_black,
            meta=Row(mime="image/png", width=8, height=4, duration_ms=None)),
    ]
    media = multimodal.media_table(spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA))
    got = {r.media_id: r.feature for r in multimodal.decode_features(media, dim=2).collect()}
    assert got[1] == pytest.approx([1.0, 0.0], abs=1e-6)
    from alt_spark.operators.multimodal import _decode_stub

    assert got[2] == pytest.approx(
        _decode_stub(b"BMnot-a-real-bmp", "image/bmp", 2), abs=1e-6
    )
    # Same bytes, non-BMP mime → PNG signature check fails → stub output.
    assert got[3] != got[1]


def _make_png(w: int, h: int, pixel_fn, color_type: int = 2, filters=None) -> bytes:
    """Minimal PNG encoder (stdlib only): 8-bit depth, color type 0/2/6,
    one IDAT, per-row filter types chosen by `filters` (default all 0).
    Filtering is applied forward per the spec so the decoder's unfilter
    must invert it exactly."""
    import struct
    import zlib

    channels = {0: 1, 2: 3, 6: 4}[color_type]
    bpp = channels
    raw = bytearray()
    prior = bytes(w * channels)
    for y in range(h):
        row = bytearray()
        for x in range(w):
            row += bytes(pixel_fn(x, y)[:channels])
        f = (filters or [0] * h)[y]
        filt = bytearray()
        for i in range(len(row)):
            left = row[i - bpp] if i >= bpp else 0
            up = prior[i]
            ul = prior[i - bpp] if i >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) >> 1
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
            filt.append((row[i] - pred) & 0xFF)
        raw += bytes([f]) + bytes(filt)
        prior = bytes(row)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_multimodal_real_png_decode(spark):
    """image/png routes through the REAL zlib-inflate + unfilter +
    luminance-pool kernel: every filter type (None/Sub/Up/Average/Paeth)
    must unfilter exactly, and the same image encoded as PNG and as BMP
    must pool to identical features (cross-codec golden). Undecodable
    payloads and unsupported layouts fall back to the stub."""
    from alt_spark.operators.multimodal import _decode_png, _decode_stub

    # Half-white/half-black gradient-free image, all five filter types.
    px = lambda x, y: (255, 255, 255) if x < 4 else (0, 0, 0)  # noqa: E731
    png = _make_png(8, 5, px, color_type=2, filters=[0, 1, 2, 3, 4])
    assert _decode_png(png, 2) == pytest.approx([1.0, 0.0], abs=1e-6)

    # Cross-codec: a deterministic non-uniform image pools identically
    # through the PNG path (RGB order) and the BMP path (BGR order).
    pat = lambda x, y: ((x * 37 + y * 11) % 256,) * 3  # noqa: E731 — grey, order-proof
    png_pat = _make_png(16, 8, pat, color_type=2, filters=[4, 3, 2, 1, 0, 4, 2, 1])
    bmp_pat = _make_bmp(16, 8, pat)
    assert _decode_png(png_pat, 4) == pytest.approx(
        multimodal._decode_bmp(bmp_pat, 4), abs=1e-9
    )

    # Greyscale (color type 0) and RGBA (6) decode; alpha is ignored.
    grey = _make_png(8, 4, lambda x, y: (200,), color_type=0)
    assert _decode_png(grey, 2) == pytest.approx([200 / 255] * 2, abs=1e-6)
    rgba = _make_png(8, 4, lambda x, y: (255, 255, 255, 0), color_type=6)
    assert _decode_png(rgba, 2) == pytest.approx([1.0, 1.0], abs=1e-6)

    # Spark-side dispatch: real kernel for image/png, stub fallback for
    # truncated payloads.
    rows = [
        Row(media_id=1, payload=png,
            meta=Row(mime="image/png", width=8, height=5, duration_ms=None)),
        Row(media_id=2, payload=png[:20],
            meta=Row(mime="image/png", width=8, height=5, duration_ms=None)),
    ]
    media = multimodal.media_table(spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA))
    got = {r.media_id: r.feature for r in multimodal.decode_features(media, dim=2).collect()}
    assert got[1] == pytest.approx([1.0, 0.0], abs=1e-6)
    assert got[2] == pytest.approx(_decode_stub(png[:20], "image/png", 2), abs=1e-6)


def test_bpe_pretoken_count_goldens(spark):
    """GPT-2-style pre-tokenizer count: hand-verified piece counts.
    The pattern is the lookahead-free restriction of the public GPT-2
    pre-tokenizer, so contractions split ('t / 'll), punctuation runs
    count once, and whitespace pieces are excluded."""
    from alt_spark.functions.text_analysis import bpe_pretoken_count

    cases = [
        ("hello world", 2),           # [hello][ world]
        ("don't stop", 3),            # [don]['t][ stop]
        ("we'll we're we've", 6),     # 3 words + 3 suffixes
        ("hello, world!!", 4),        # [hello][,][ world][!!]
        ("a1b2", 4),                  # [a][1][b][2] letter/digit runs split
        ("  spaced  out  ", 2),       # whitespace pieces don't count
        ("", 0),
    ]
    df = spark.createDataFrame(cases, ["text", "expect"])
    from pyspark.sql import functions as F

    bad = df.filter(bpe_pretoken_count(F.col("text")) != F.col("expect")).collect()
    assert not bad, bad


def test_bpe_pretoken_cross_engine_incl_vertical_tab(spark, ddb):
    """The BPE pre-token pattern must count identically in Java regex
    and RE2 even on \\x0B, where \\s semantics differ (code-review
    regression: explicit whitespace class, shared pattern constant)."""
    from alt_spark.functions.text_analysis import (
        bpe_pretoken_count,
        ddb_bpe_pretoken_count,
    )

    texts = ["a\x0bb", "tab\there", "don't\x0b stop", "x \x0b y"]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    from pyspark.sql import functions as F

    got = [r[0] for r in df.select(bpe_pretoken_count(F.col("text"))).collect()]
    for t, g in zip(texts, got, strict=True):
        lit = t.replace("'", "''").replace("\x0b", "' || chr(11) || '")
        sql = "SELECT " + ddb_bpe_pretoken_count(f"('{lit}')")
        assert ddb.execute(sql).fetchone()[0] == g, t


def test_pq_adc_recall_and_rerank(spark):
    """Product quantization (operators/ann.py): codes are m small ints
    (16 bytes standing in for 64 floats), ADC search touches only codes,
    and the production shortlist→exact-rerank pattern dominates raw ADC
    recall (guaranteed: every exact-top-k member that survives into the
    shortlist is kept by the exact rerank)."""
    from alt_spark.catalog import load_table
    from alt_spark.operators.ann import pq_adc_topk, pq_encode, pq_train
    from tests.conftest import SF_ORACLE

    emb = load_table(spark, SF_ORACLE, "embeddings")
    # Determinism incl. physical layout (init sorts by the real id).
    assert pq_train(emb.repartition(7), m=4, ksub=8) == pq_train(emb, m=4, ksub=8)
    m, ksub = 16, 64
    cb = pq_train(emb, m=m, ksub=ksub)
    assert len(cb) == m and all(len(sub) == ksub for sub in cb)
    enc = pq_encode(emb, cb).persist()
    try:
        # Structural: every row has m codes in [0, ksub).
        bad = enc.filter(
            (F.size("codes") != m)
            | (F.array_min("codes") < 0)
            | (F.array_max("codes") >= ksub)
        ).count()
        assert bad == 0
        for row in emb.orderBy("vec_id").limit(3).collect():
            q = [float(v) for v in row["embedding"]]
            qa = F.array(*[F.lit(v) for v in q])
            l2 = F.aggregate(
                F.zip_with(F.col("embedding"), qa, lambda x, y: (x.cast("double") - y) ** 2),
                F.lit(0.0),
                lambda a, v: a + v,
            )
            exact = {
                r["vec_id"]
                for r in emb.select("vec_id", l2.alias("d")).orderBy("d", "vec_id").limit(10).collect()
            }
            adc = {r["id"] for r in pq_adc_topk(enc, q, cb, 10).collect()}
            short = [r["id"] for r in pq_adc_topk(enc, q, cb, 50).collect()]
            rerank = {
                r["vec_id"]
                for r in enc.filter(F.col("vec_id").isin(short))
                .select("vec_id", l2.alias("d"))
                .orderBy("d", "vec_id")
                .limit(10)
                .collect()
            }
            adc_recall = len(exact & adc) / 10
            rr_recall = len(exact & rerank) / 10
            assert adc_recall >= 0.5, (row["vec_id"], adc_recall)
            assert rr_recall >= 0.7, (row["vec_id"], rr_recall)
            assert rr_recall >= adc_recall
    finally:
        enc.unpersist()


def test_ivf_pq_composition(spark):
    """IVF + PQ compose into the canonical 100 TB ANN layout: coarse
    lists prune the scan (partition pruning at scale), ADC ranks the
    probed lists from 16-byte codes without touching vectors, and an
    exact re-rank of the shortlist recovers true neighbors."""
    import math

    from alt_spark.catalog import load_table
    from alt_spark.operators.ann import ivf_index, pq_encode, pq_train
    from tests.conftest import SF_ORACLE

    emb = load_table(spark, SF_ORACLE, "embeddings")
    assigned, centroids = ivf_index(emb, nlist=8)
    cb = pq_train(emb, m=16, ksub=64)
    enc = pq_encode(assigned, cb).select("vec_id", "embedding", "list_id", "codes").persist()
    try:
        q = [float(v) for v in emb.orderBy("vec_id").first()["embedding"]]

        def cos(u, w):
            d = sum(a * b for a, b in zip(u, w))
            nu = math.sqrt(sum(a * a for a in u)) or 1.0
            nw = math.sqrt(sum(a * a for a in w)) or 1.0
            return d / (nu * nw)

        probes = sorted(range(8), key=lambda i: -cos(q, centroids[i]))[:4]
        pruned = enc.filter(F.col("list_id").isin(probes))
        assert 0 < pruned.count() < enc.count(), "IVF must actually prune"
        # ADC over the pruned lists only; exact re-rank of the shortlist.
        from alt_spark.operators.ann import pq_adc_topk

        short = [r["id"] for r in pq_adc_topk(pruned, q, cb, 50).collect()]
        qa = F.array(*[F.lit(v) for v in q])
        l2 = F.aggregate(
            F.zip_with(F.col("embedding"), qa, lambda x, y: (x.cast("double") - y) ** 2),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        exact = {
            r["vec_id"]
            for r in emb.select("vec_id", l2.alias("d")).orderBy("d", "vec_id").limit(10).collect()
        }
        rerank = {
            r["vec_id"]
            for r in enc.filter(F.col("vec_id").isin(short))
            .select("vec_id", l2.alias("d"))
            .orderBy("d", "vec_id")
            .limit(10)
            .collect()
        }
        # Both approximations stack (lists can drop true neighbors, so
        # the bar sits below the PQ-only bound — still a real signal).
        assert len(exact & rerank) / 10 >= 0.5
    finally:
        enc.unpersist()


# ------------------------------------------------------- leakage-free splits
def test_split_assignment_rates_and_nulls(spark):
    from alt_spark.operators.mixing import split_assignment

    with pytest.raises(ValueError):
        split_assignment("gid", train_permyriad=9900, val_permyriad=200)
    with pytest.raises(ValueError):
        split_assignment("gid", train_permyriad=-1)
    df = spark.createDataFrame(
        [(1,), (2,), (None,)], "gid long"
    ).select("gid", split_assignment("gid", "s").alias("split"))
    rows = {r["gid"]: r["split"] for r in df.collect()}
    # NULL group id -> NULL split (never silently bucketed).
    assert rows[None] is None
    assert all(v in ("train", "val", "test") for k, v in rows.items() if k is not None)


def test_split_assignment_deterministic_under_repartitioning(spark):
    from alt_spark.operators.mixing import split_assignment

    docs = load_table(spark, SF, "documents").select("doc_id")
    a = {r["doc_id"]: r["split"] for r in docs.select(
        "doc_id", split_assignment("doc_id").alias("split")).collect()}
    b = {r["doc_id"]: r["split"] for r in docs.repartition(17).select(
        "doc_id", split_assignment("doc_id").alias("split")).collect()}
    assert a == b and len(set(a.values())) >= 2


def test_q77_no_neardup_pair_straddles_splits(spark):
    """The leakage property itself, checked against the ACTUAL pair
    set: both endpoints of every near-dup pair receive the same split.
    A doc-keyed split (the naive form) fails this on any corpus with
    near-dup pairs — verified as the negative control."""
    from alt_spark.operators.graph import connected_components
    from alt_spark.operators.mixing import split_assignment
    from alt_spark.queries.pipeline_ops import _SPLIT_SALT

    docs = load_table(spark, SF, "documents")
    pairs = dedup.minhash_near_dup(docs, threshold=0.7, portable=True).select(
        "id1", "id2"
    ).localCheckpoint()
    assert pairs.count() > 0, "fixture needs near-dup pairs to test leakage"
    cc = connected_components(pairs)
    assigned = (
        docs.select("doc_id")
        .join(cc.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            split_assignment(
                F.coalesce("comp", "doc_id"), _SPLIT_SALT
            ).alias("split"),
        )
        .localCheckpoint()
    )
    def straddlers(assign_df):
        s1 = assign_df.withColumnRenamed("doc_id", "id1").withColumnRenamed("split", "s1")
        s2 = assign_df.withColumnRenamed("doc_id", "id2").withColumnRenamed("split", "s2")
        return (
            pairs.join(s1, "id1").join(s2, "id2")
            .filter(F.col("s1") != F.col("s2"))
            .count()
        )
    assert straddlers(assigned) == 0
    # Negative control: doc-keyed assignment must leak somewhere on a
    # salt sweep — otherwise this test couldn't detect the bug it polices.
    leaked = 0
    for salt in ("a", "b", "c", "d", "e"):
        naive = docs.select(
            "doc_id", split_assignment("doc_id", salt).alias("split")
        )
        leaked += straddlers(naive)
    assert leaked > 0


def test_q90_matrix_accounts_for_every_pair(spark):
    """The cross-source matrix must partition the EXACT q30 pair set:
    cell counts sum to the total pair count, the id-sum checksums sum
    to the all-pairs id sum, and every cell is canonically ordered
    (source_a <= source_b)."""
    from alt_spark.queries import all_queries

    qs = all_queries()
    pairs = qs["q30_minhash_neardup"](spark, SF).select("id1", "id2")
    matrix = qs["q90_cross_source_dup_matrix"](spark, SF).collect()
    n_pairs = pairs.count()
    id_sum = pairs.selectExpr("sum(id1 + id2) AS s").first()["s"] or 0
    assert sum(r["n_pairs"] for r in matrix) == n_pairs
    assert sum(r["pair_id_checksum"] for r in matrix) == id_sum
    assert all(r["source_a"] <= r["source_b"] for r in matrix)
    assert n_pairs > 0, "fixture must contain near-dup pairs"


def _q91_corpus(spark):
    """The q91 input: embeddings plus perturbed copies of vectors 0-9
    (id+100000, +0.02 on the first 8 dims) — the planted near-dups."""
    emb = load_table(spark, SF, "embeddings")
    base = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x AS double))").alias("embedding"),
    )
    planted = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) ->"
            " cast(x AS double) + IF(i < 8, 0.02D, 0D))"
        ).alias("embedding"),
    )
    return base.unionByName(planted)


def test_embedding_near_dup_blocked_equals_brute_force(spark):
    """Sign-band blocking loses NOTHING on the planted-duplicate corpus:
    the blocked pair set (candidates sharing >=1 band, then verified)
    equals the exact all-pairs result — every perturbed dim lives in
    band 0, so bands 1-7 guarantee each true pair a shared band. Also
    pins the expected pair identities: exactly (i, i+100000) for i<10."""
    allv = _q91_corpus(spark)
    blocked = {
        (r.id_a, r.id_b): r.cos_sim
        for r in ann.embedding_near_dup(
            allv, id_col="vec_id", vec_col="embedding", threshold=0.99
        ).collect()
    }
    # Brute force: all pairs, same in-row rounded cosine, same threshold.
    a = allv.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("_va"))
    b = allv.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("_vb"))
    brute = {
        (r.id_a, r.id_b): r.cos_sim
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(ann.cosine_sim(F.col("_va"), F.col("_vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.99)
        .collect()
    }
    assert blocked == brute
    assert set(blocked) == {(i, i + 100000) for i in range(10)}
    assert all(s >= 0.99 for s in blocked.values())


def test_embedding_near_dup_incremental_matches_full(spark):
    """The daily-batch form: band the base ONCE, join only the batch
    against the stored index. On the q91 corpus (base = the 500
    originals, batch = the 10 planted perturbed copies) the
    incremental result must be exactly the full run's pair set, every
    pair flagged in_base (a planted copy pairs with its base source,
    never with another planted copy), with identical similarities.
    Rerun safety: re-submitting a batch whose ids are already in the
    stored index must not pair a vector against its own stale rows."""
    emb = load_table(spark, SF, "embeddings")
    base = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x AS double))").alias("embedding"),
    )
    new = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) ->"
            " cast(x AS double) + IF(i < 8, 0.02D, 0D))"
        ).alias("embedding"),
    )
    idx = ann.embedding_band_rows(base)
    got = {
        (r.new_id, r.match_id, r.in_base): r.cos_sim
        for r in ann.embedding_near_dup_incremental(
            new, idx, base, threshold=0.99
        ).collect()
    }
    full = {
        (r.id_a, r.id_b): r.cos_sim
        for r in ann.embedding_near_dup(
            _q91_corpus(spark), id_col="vec_id", vec_col="embedding", threshold=0.99
        ).collect()
    }
    assert {(m, n): s for (n, m, b), s in got.items()} == full
    assert all(b for (_, _, b) in got)

    # Rerun: the batch's ids are in the index already (union) — the
    # result must be unchanged, not polluted by self-pairs.
    idx2 = ann.embedding_band_rows(base.unionByName(new))
    rerun = {
        (r.new_id, r.match_id, r.in_base): r.cos_sim
        for r in ann.embedding_near_dup_incremental(
            new, idx2, base.unionByName(new), threshold=0.99
        ).collect()
    }
    assert rerun == got


# -------------------------------------------------- q95 duplicate-span coverage
def test_span_coverage_planted_shapes(spark):
    """Interval-union exactness on the planted shapes: overlapping
    windows over a shared 12-token run merge to 12 covered tokens (not
    5 windows x 8), an intra-document repeat yields two disjoint
    islands of 8, sub-width and unique pages report zeros."""
    from alt_spark.queries import all_queries
    from pyspark.sql import functions as F

    rows = {
        r["doc_id"]: r
        for r in all_queries()["q95_dup_span_coverage"](spark, SF)
        .filter(F.col("doc_id") < 0)
        .collect()
    }
    assert (
        rows[-91]["n_tok"],
        rows[-91]["n_dup_windows"],
        rows[-91]["dup_tokens"],
    ) == (17, 5, 12)
    assert (rows[-92]["n_dup_windows"], rows[-92]["dup_tokens"]) == (5, 12)
    # intra-document repetition counts (occurrences, not distinct docs)
    assert (
        rows[-93]["n_tok"],
        rows[-93]["n_dup_windows"],
        rows[-93]["dup_tokens"],
    ) == (18, 2, 16)
    for did in (-94, -95):
        assert rows[did]["n_dup_windows"] == 0
        assert rows[did]["dup_tokens"] == 0
    assert rows[-91]["dup_permyriad"] == 10000 * 12 // 17


def test_span_coverage_hash_form_equals_string_form(spark):
    """The xxhash64-keyed production shuffle must select the identical
    duplicated windows as the oracle-replayable string form."""
    from alt_spark.operators.dedup import duplicate_span_coverage

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    cols = ("id", "n_tok", "n_dup_windows", "dup_tokens")
    a = {tuple(r) for r in duplicate_span_coverage(docs, hash_grams=True).select(*cols).collect()}
    b = {tuple(r) for r in duplicate_span_coverage(docs, hash_grams=False).select(*cols).collect()}
    assert a == b


def test_span_coverage_invariants(spark):
    """dup_tokens is an interval-union size: bounded by n_tok above and
    by the window count (each window adds >= 1 and <= width tokens)."""
    from alt_spark.operators.dedup import duplicate_span_coverage

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    out = duplicate_span_coverage(docs, width=8).collect()
    assert len(out) == docs.count(), "complete surface: one row per doc"
    for r in out:
        assert 0 <= r["dup_tokens"] <= r["n_tok"], r
        if r["n_dup_windows"]:
            # n distinct-start width-8 windows cover at least n-1+8
            # tokens (stride-1 chain) and at most 8n (disjoint).
            assert r["dup_tokens"] >= r["n_dup_windows"] + 7, r
            assert r["dup_tokens"] <= 8 * r["n_dup_windows"], r
        else:
            assert r["dup_tokens"] == 0, r


def test_span_coverage_rejects_bad_args(spark):
    from alt_spark.operators.dedup import duplicate_span_coverage

    docs = load_table(spark, SF, "documents")
    with pytest.raises(ValueError):
        duplicate_span_coverage(docs, width=1)
    with pytest.raises(ValueError):
        duplicate_span_coverage(docs, min_count=1)


def test_span_coverage_incremental_matches_full(spark):
    """Incremental contract: a new batch scored against the stored
    gram-count index reports BYTE-IDENTICAL rows to a full recompute
    over (base UNION batch) restricted to the batch ids — including
    batch-internal repeats, base-batch cross duplication, and
    batch-unique pages — and an empty index degrades to the plain
    batch-only form."""
    from alt_spark.operators.dedup import (
        duplicate_span_coverage,
        duplicate_span_coverage_incremental,
        span_gram_counts,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 3 != 0)
    run12 = " ".join(f"ib{i}" for i in range(1, 13))
    batch = docs.filter(F.col("doc_id") % 3 == 0).unionByName(
        spark.createDataFrame(
            [
                # duplicates a BASE doc's opening run? no — copies a
                # batch sibling AND itself: intra-batch + self shapes
                (-101, f"x1 x2 x3 {run12} x4 x5"),
                (-102, f"y1 {run12} y2 y3 y4 y5 y6"),
                (-103, " ".join(f"zz{i}" for i in range(1, 20))),
            ],
            "doc_id long, text string",
        )
    )
    index = span_gram_counts(base)
    inc = {
        tuple(r)
        for r in duplicate_span_coverage_incremental(batch, index).collect()
    }
    full = {
        tuple(r)
        for r in duplicate_span_coverage(base.unionByName(batch))
        .join(batch.select(F.col("doc_id").alias("id")), "id", "left_semi")
        .collect()
    }
    assert inc == full and inc
    # empty index == plain coverage of the batch alone
    empty = spark.createDataFrame([], "k long, c long")
    alone = {
        tuple(r)
        for r in duplicate_span_coverage_incremental(batch, empty).collect()
    }
    plain = {tuple(r) for r in duplicate_span_coverage(batch).collect()}
    assert alone == plain


def test_span_trim_planted_content_and_coverage_consistency(spark):
    """The trim must keep EXACTLY the tokens outside the q95 interval
    union: kept_tok == n_tok - dup_tokens for every document (planted
    and natural), and the planted shared-run page keeps precisely its
    unique frame tokens in order."""
    from alt_spark.operators.dedup import (
        duplicate_span_coverage,
        trim_duplicate_spans,
    )
    from alt_spark.queries.pipeline_ops import _SPAN_EXTRA

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        spark.createDataFrame(list(_SPAN_EXTRA), "doc_id long, text string")
    )
    trim = trim_duplicate_spans(corpus, width=8)
    cov = duplicate_span_coverage(corpus, width=8).select(
        "id", F.col("dup_tokens").alias("dt")
    )
    bad = (
        trim.join(cov, "id")
        .filter(F.col("kept_tok") != F.col("n_tok") - F.col("dt"))
        .count()
    )
    assert bad == 0
    by_id = {r["id"]: r for r in trim.filter(F.col("id") < 0).collect()}
    assert by_id[-91]["trimmed_text"] == "qq91a qq91b qq91c qq91d qq91e"
    assert by_id[-93]["trimmed_text"] == "qq93a qq93b"
    assert by_id[-95]["kept_tok"] == 30  # untouched page survives whole


def test_span_trim_hash_form_equals_string_form(spark):
    from alt_spark.operators.dedup import trim_duplicate_spans

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    a = {
        tuple(r)
        for r in trim_duplicate_spans(docs, hash_grams=True).collect()
    }
    b = {
        tuple(r)
        for r in trim_duplicate_spans(docs, hash_grams=False).collect()
    }
    assert a == b


def test_span_dup_cache_shared_between_audit_and_trim(spark):
    """q95 and q97 must share ONE duplicated-gram-key entry: the
    per-session planted-extras memo keeps their corpus plans
    semantically equal (fresh createDataFrame LocalRelations would
    split the key — the _SPAN_EXTRA_MEMO rationale), so the gram
    aggregate runs once per suite."""
    from alt_spark.operators.dedup import _SPAN_DUP_CACHE
    from alt_spark.queries import all_queries

    _SPAN_DUP_CACHE.clear()
    stats0 = dict(_SPAN_DUP_CACHE.stats)
    all_queries()["q95_dup_span_coverage"](spark, SF)
    assert len(_SPAN_DUP_CACHE._d) == 1
    all_queries()["q97_span_trim"](spark, SF)
    assert len(_SPAN_DUP_CACHE._d) == 1, _SPAN_DUP_CACHE.last_miss
    all_queries()["q100_release_pipeline"](spark, SF)
    assert len(_SPAN_DUP_CACHE._d) == 1, _SPAN_DUP_CACHE.last_miss
    # One paid materialization, two served reuses (the r8 counters).
    assert _SPAN_DUP_CACHE.stats["puts"] - stats0["puts"] == 1
    assert _SPAN_DUP_CACHE.stats["hits"] - stats0["hits"] >= 2


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    starts=st.sets(st.integers(min_value=0, max_value=60), max_size=15),
    width=st.integers(min_value=2, max_value=9),
)
def test_interval_union_marginal_matches_reference(starts, width):
    """The running-max-end marginal used by _span_surface (sum of
    end - max(prev_max_end, start-1) over start-sorted windows) must
    equal the true interval-union size for ARBITRARY window start sets
    — the algebraic core the oracle replays, pinned against a direct
    Python union."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    from alt_spark.session import get_session

    spark = get_session("alt_spark-tests", shuffle_partitions=8)
    want = len({i for s in starts for i in range(s, s + width)})
    if not starts:
        assert want == 0
        return
    df = spark.createDataFrame([(1, s) for s in starts], "id long, pos long")
    w = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    end = F.col("pos") + F.lit(width - 1)
    prev_end = F.coalesce(
        F.max(F.col("pos") + F.lit(width - 1)).over(w), F.lit(-1)
    )
    got = (
        df.withColumn("m", end - F.greatest(prev_end, F.col("pos") - 1))
        .agg(F.sum("m"))
        .first()[0]
    )
    assert got == want, (sorted(starts), width, got, want)


def test_embedding_scored_pair_cache_shared_between_cut_and_histogram(spark):
    """q91 (threshold cut) and q99 (calibration histogram) must share
    ONE scored-candidate entry: the threshold applies AFTER the cached
    frame, and _neardup_corpus keeps their corpus plans canonically
    equal."""
    from alt_spark.operators import ann
    from alt_spark.queries import all_queries
    from tests.conftest import SF_ORACLE

    ann._SCORED_PAIR_CACHE.clear()
    stats0 = dict(ann._SCORED_PAIR_CACHE.stats)
    all_queries()["q91_embedding_neardup_lsh"](spark, SF_ORACLE)
    assert len(ann._SCORED_PAIR_CACHE._d) == 1
    all_queries()["q99_neardup_threshold_histogram"](spark, SF_ORACLE)
    assert len(ann._SCORED_PAIR_CACHE._d) == 1, ann._SCORED_PAIR_CACHE.last_miss
    # One paid materialization, one served reuse (the r8 counters).
    assert ann._SCORED_PAIR_CACHE.stats["puts"] - stats0["puts"] == 1
    assert ann._SCORED_PAIR_CACHE.stats["hits"] - stats0["hits"] >= 1


def test_embedding_band_rows_short_and_partial_dims(spark):
    """Band enumeration edge shapes (review finding): dim < band_bits
    must yield exactly one partial band (not a bogus descending
    sequence with an empty universal key), dim % band_bits != 0 must
    band the remainder dims (the DuckDB twin's (idx-1)//bb grouping),
    and an empty vector yields no rows."""
    df = spark.createDataFrame(
        [
            (1, [0.5, -0.5, 0.25, -1.0]),
            (2, [1.0] * 8 + [-1.0, 0.5]),
            (3, []),
        ],
        "vec_id long, embedding array<double>",
    )
    rows = sorted(tuple(r) for r in ann.embedding_band_rows(df).collect())
    assert rows == [(1, 0, "1010"), (2, 0, "11111111"), (2, 1, "01")], rows


# ---------------------------------------------------------------------------
def test_q102_flags_match_numpy_brute_force(spark):
    """Third-party pin for the semantic decontamination flag set: the
    in-row broadcast-bench fold must flag exactly the vectors a numpy
    matmul brute force flags (per-pair cosine rounded to 6 before the
    max/threshold, the query's own device)."""
    import numpy as np
    import pandas as pd

    from tests.conftest import SF_ORACLE
    from alt_spark.queries.vectors import _SEMDECON_MOD, _SEMDECON_TAU, q102

    pdf = pd.read_parquet(f"{SF_ORACLE}/embeddings.parquet")
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    is_bench = (pdf["vec_id"] % _SEMDECON_MOD == 0).to_numpy()
    cos = np.round(mat[~is_bench] @ mat[is_bench].T, 6)
    flagged = cos.max(axis=1) >= _SEMDECON_TAU
    corpus = pdf[~is_bench].reset_index(drop=True)
    want = (
        corpus.assign(flag=flagged)
        .groupby("label")
        .agg(
            n_corpus=("vec_id", "size"),
            n_contaminated=("flag", "sum"),
            contam_checksum=("vec_id", lambda s: int(s[flagged[s.index]].sum())),
        )
        .reset_index()
    )
    got = {
        r["label"]: (r["n_corpus"], r["n_contaminated"], r["contam_checksum"])
        for r in q102(spark, SF_ORACLE).collect()
    }
    assert len(got) == len(want)
    for _, w in want.iterrows():
        assert got[w["label"]] == (
            int(w["n_corpus"]),
            int(w["n_contaminated"]),
            int(w["contam_checksum"]),
        ), w["label"]


def test_q102_empty_benchmark_raises(spark):
    """ADVICE r8: an empty benchmark partition must raise, not emit
    per-label rows with n_contaminated=0 (the ungrouped collect_list
    always yields one row, so without the guard Spark and the oracle's
    inner join disagree on the empty-benchmark contract)."""
    import pytest as _pt

    from unittest import mock

    import alt_spark.queries.vectors as vx
    from tests.conftest import SF_SMOKE

    real = vx.load_table

    def no_bench(spark_, sf_, name):
        df = real(spark_, sf_, name)
        if name == "embeddings":
            # Shift ids off the benchmark residue class: no vec_id is
            # divisible by the bench modulus, so the bench side is empty.
            df = df.withColumn(
                "vec_id", F.col("vec_id") * vx._SEMDECON_MOD + 1
            )
        return df

    with mock.patch.object(vx, "load_table", no_bench):
        with _pt.raises(Exception, match="benchmark partition is empty"):
            vx.q102(spark, SF_SMOKE).collect()


def test_q118_ensemble_monotone_and_attributed(spark):
    """Ensemble clustering can only MERGE what a single signal found:
    every MinHash-only (q73) cluster must be contained in exactly one
    ensemble cluster, and the per-cluster signal attribution must
    reconcile with the raw pair counts (every pair lands in exactly
    one cluster — both endpoints are connected by construction)."""
    from alt_spark.operators.graph import connected_components
    from alt_spark.queries.pipeline_ops import q118
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents")
    mh = dedup.minhash_near_dup(docs, threshold=0.7, portable=True).select(
        "id1", "id2"
    )
    mh_comp = {
        r["id"]: r["comp"] for r in connected_components(mh).collect()
    }
    rows = q118(spark, SF_ORACLE).collect()
    # Rebuild ensemble membership from the checksummed report is not
    # possible (by design); recompute the ensemble labels directly.
    sh = dedup.simhash_near_dup(docs, portable=True).select("id1", "id2")
    ens = {
        r["id"]: r["comp"]
        for r in connected_components(mh.unionByName(sh).distinct()).collect()
    }
    # Monotone: nodes sharing a MinHash cluster share the ensemble one.
    by_mh: dict[int, set[int]] = {}
    for node, c in mh_comp.items():
        by_mh.setdefault(c, set()).add(ens[node])
    assert all(len(v) == 1 for v in by_mh.values())
    # Attribution reconciles: every pair counted exactly once.
    assert sum(r["n_mh_pairs"] for r in rows) == mh.count()
    assert sum(r["n_sh_pairs"] for r in rows) == sh.count()
    # Report covers every ensemble node exactly once.
    assert sum(r["n_docs"] for r in rows) == len(ens)
    assert {r["cluster_id"] for r in rows} == set(ens.values())


def test_empty_embedding_rows_are_invisible_to_vector_queries(spark):
    """Review finding r9: a zero-length (or NULL) embedding produces no
    (idx, val) rows under the oracles' unnest joins, so the Spark side
    must drop it too — q102/q117/q119 outputs with an injected empty
    vector must equal the outputs without it, bit for bit."""
    from unittest import mock

    import alt_spark.queries.vectors as vx
    from tests.conftest import SF_SMOKE

    real = vx.load_table

    def with_empty(spark_, sf_, name):
        df = real(spark_, sf_, name)
        if name == "embeddings":
            extra = spark_.createDataFrame(
                [(999_983, []), (999_984, None)],
                "vec_id long, embedding array<float>",
            ).withColumn("label", F.lit(0).cast(dict(df.dtypes)["label"]))
            df = df.unionByName(extra)
        return df

    for qname in ("q102", "q117", "q119"):
        qfn = getattr(vx, qname)
        base = [tuple(r) for r in qfn(spark, SF_SMOKE).collect()]
        with mock.patch.object(vx, "load_table", with_empty):
            injected = [tuple(r) for r in qfn(spark, SF_SMOKE).collect()]
        assert injected == base, qname


def test_signature_est_jaccard_raises_on_missing_endpoint(spark):
    """Review finding r9: a candidate pair whose endpoint is missing
    from the signature table (stale / over-compacted index) must raise
    loudly, not silently vanish through an inner join."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    sigs = dedup.minhash_signatures(docs, portable=True)
    pairs = spark.createDataFrame([(1, 99)], "id1 long, id2 long")
    with pytest.raises(Exception, match="missing"):
        dedup.signature_est_jaccard(pairs, sigs).collect()
    # Healthy pair still scores 1.0 (identical texts).
    ok = dedup.signature_est_jaccard(
        spark.createDataFrame([(1, 2)], "id1 long, id2 long"), sigs
    ).collect()
    assert ok[0]["est_jaccard"] == 1.0


def test_minhash_subset_derivations_exact(spark):
    """Pins the two equalities q121's r12 shared-artifact derivation
    rests on (optimization round 1):

    1. Signatures are per-document, so ``sign(corpus).filter(pred(id))``
       row-equals ``sign(corpus.filter(pred(id)))`` for an id predicate.
    2. Candidate equality and the agreement estimate are pairwise, so
       the both-ends-in-subset restriction of the corpus near-dup pair
       frame equals running the whole chain on the subset alone.
    """
    base_words = "alpha beta gamma delta epsilon zeta eta theta".split()
    rows = []
    for i in range(16):
        # Groups of near-identical docs spanning the %4 split so both
        # base-base and base-increment pairs exist.
        words = list(base_words)
        words[i % 3] = f"tok{i // 6}"
        rows.append((i, " ".join(words * 3)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    subset = docs.filter(F.col("doc_id") % 4 != 0)

    sig_all_then_filter = (
        dedup.minhash_signatures(docs, portable=True)
        .filter(F.col("id") % 4 != 0)
    )
    sig_filter_then_all = dedup.minhash_signatures(subset, portable=True)
    a = {r["id"]: list(r["signature"]) for r in sig_all_then_filter.collect()}
    b = {r["id"]: list(r["signature"]) for r in sig_filter_then_all.collect()}
    assert a == b and a

    pairs_restricted = sorted(
        (r["id1"], r["id2"], r["est_jaccard"])
        for r in dedup.minhash_near_dup(docs, threshold=0.5, portable=True)
        .filter((F.col("id1") % 4 != 0) & (F.col("id2") % 4 != 0))
        .collect()
    )
    pairs_direct = sorted(
        (r["id1"], r["id2"], r["est_jaccard"])
        for r in dedup.minhash_near_dup(
            subset, threshold=0.5, portable=True
        ).collect()
    )
    assert pairs_restricted == pairs_direct and pairs_restricted


def test_image_ahash_perceptual_dedup(spark):
    """Perceptual image dedup over the REAL BMP kernel: a uniformly
    brightness-shifted copy keeps the identical aHash (every block and
    the mean move together), a structurally different image lands far
    away in Hamming space, and undecodable payloads (declared JPEG
    stub) hash NULL and never pair. Pair generation goes through the
    same pigeonhole block join as SimHash — never all-pairs."""
    from alt_spark.operators.multimodal import (
        image_ahash,
        image_near_dup_pairs,
        media_table,
    )

    def grad(c, r):
        v = 40 if c < 16 else 200  # left dark, right bright
        return (v, v, v)

    def grad_bright(c, r):
        v = (40 if c < 16 else 200) + 30
        return (v, v, v)

    def checker(c, r):
        v = 220 if (c // 4 + r // 4) % 2 == 0 else 20
        return (v, v, v)

    from alt_spark.operators.multimodal import MEDIA_SCHEMA

    meta = ("image/bmp", 32, 32, None)
    rows = [
        (1, _make_bmp(32, 32, grad), meta),
        (2, _make_bmp(32, 32, grad_bright), meta),
        (3, _make_bmp(32, 32, checker), meta),
        (4, b"\xff\xd8not-a-decodable-jpeg", ("image/jpeg", 8, 8, None)),
    ]
    media = media_table(spark.createDataFrame(rows, MEDIA_SCHEMA))
    hashes = {r["media_id"]: r["ahash"] for r in image_ahash(media).collect()}
    assert hashes[4] is None, "stub mime must hash NULL, not a fake value"
    assert hashes[1] == hashes[2], "brightness shift must not move the aHash"
    assert hashes[1] != hashes[3]
    pairs = {
        (r["id1"], r["id2"]): r["hamming"]
        for r in image_near_dup_pairs(media, max_hamming=3).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 0
    assert all(4 not in p for p in pairs)
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_hamming_blocked_pairs_guard_and_simhash_equivalence(spark):
    """The factored block join must refuse max_hamming beyond the
    pigeonhole guarantee, and the SimHash pipeline built on it must
    still find exactly its pairs (refactor regression)."""
    import pytest as _pytest

    from alt_spark.operators import dedup

    sig = spark.createDataFrame([(1, 7), (2, 7)], "id long, h long")
    with _pytest.raises(ValueError, match="pigeonhole"):
        dedup.hamming_blocked_pairs(sig, "h", "id", max_hamming=4, bands=4)
    got = {
        (r["id1"], r["id2"]): r["hamming"]
        for r in dedup.hamming_blocked_pairs(
            sig, "h", "id", max_hamming=0, bands=4
        ).collect()
    }
    assert got == {(1, 2): 0}


def test_image_ahash_is_orientation_canonical(spark):
    """The SAME picture stored bottom-up (positive-height BMP), stored
    top-down (negative-height BMP), and encoded as PNG (always
    top-down) must hash identically — orientation is a per-FILE
    property, so without canonicalization a true duplicate pair with
    mixed storage would be silently missed (review finding)."""
    import struct

    from alt_spark.operators.multimodal import MEDIA_SCHEMA, image_ahash, media_table

    def px(c, r):  # vertically asymmetric: bright top rows, dark bottom
        v = 230 if r < 8 else 25
        return (v, v, v)

    w, h = 16, 16
    bottom_up = _make_bmp(w, h, lambda c, r: px(c, h - 1 - r))
    # Top-down twin: negative height, rows written in visual order.
    td = bytearray(_make_bmp(w, h, px))
    struct.pack_into("<i", td, 22, -h)
    top_down = bytes(td)
    # PNG rows are always top-down visual order; pixel_fn gets RGB.
    png = _make_png(w, h, lambda c, r: px(c, r)[::-1], color_type=2)
    rows = [
        (1, bottom_up, ("image/bmp", w, h, None)),
        (2, top_down, ("image/bmp", w, h, None)),
        (3, png, ("image/png", w, h, None)),
    ]
    media = media_table(spark.createDataFrame(rows, MEDIA_SCHEMA))
    hashes = {r["media_id"]: r["ahash"] for r in image_ahash(media).collect()}
    assert hashes[1] is not None
    assert hashes[1] == hashes[2] == hashes[3], hashes


def test_q126_pairs_are_exactly_the_planted_twins(spark):
    """The end-to-end image-dedup query must find EVERY planted twin
    group at hamming 0 — the brightness-shifted opposite-orientation
    BMP twin AND the +32-shifted greyscale PNG member (the cross-codec
    pin: BMP and PNG payloads of one image reduce to one fingerprint)
    — and nothing else at sf0.01: the fingerprint space is 64-bit, so
    a non-planted pair within Hamming 3 would mean the decode chain
    collapsed structure somewhere."""
    from alt_spark.queries.pipeline_ops import (
        _IMG_PNG_BASE,
        _IMG_TWIN_BASE,
        _IMG_TWIN_MOD,
        q126,
    )
    from tests.conftest import SF_ORACLE

    rows = q126(spark, SF_ORACLE).collect()
    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    twins = [d for d in doc_ids if d % _IMG_TWIN_MOD == 0]
    want = (
        {(d, _IMG_TWIN_BASE + d, 0) for d in twins}
        | {(d, _IMG_PNG_BASE + d, 0) for d in twins}
        | {(_IMG_TWIN_BASE + d, _IMG_PNG_BASE + d, 0) for d in twins}
    )
    assert {tuple(r) for r in rows} == want
    assert len(rows) == len(want) > 0


def test_q129_inrow_pairs_equal_self_join_and_lift_replay(spark):
    """q129's in-row pair generation (the 100 TB path: no token-level
    self-join) must produce exactly the pair multiset a within-document
    self-join produces, and the integer lift must equal a pure-Python
    replay over the same counts — including the floor semantics at the
    permyriad division."""
    from pyspark.sql import functions as F

    from alt_spark.catalog import load_table
    from alt_spark.operators.dedup import tokens_col
    from alt_spark.queries.text import _COLL_SUPPORT_PM, _COLL_TOP, q129
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents").select(
        "doc_id", F.array_distinct(tokens_col("text")).alias("ts")
    )
    rows = [(r["doc_id"], sorted(r["ts"])) for r in docs.collect()]
    n_docs = len(rows)
    from collections import Counter

    c_xy: Counter = Counter()
    c_t: Counter = Counter()
    for _id, ts in rows:
        for t in ts:
            c_t[t] += 1
        for i, x in enumerate(ts):
            for y in ts[i + 1 :]:
                c_xy[(x, y)] += 1
    scored = [
        (
            t1,
            t2,
            c,
            c_t[t1],
            c_t[t2],
            (10000 * c * n_docs) // (c_t[t1] * c_t[t2]),
        )
        for (t1, t2), c in c_xy.items()
        if 10000 * c >= _COLL_SUPPORT_PM * n_docs
    ]
    scored.sort(key=lambda r: (-r[5], -r[2], r[0], r[1]))
    want = scored[:_COLL_TOP]
    got = [tuple(r) for r in q129(spark, SF_ORACLE).collect()]
    assert got == want


def test_q133_triangles_match_pure_python_and_containment_is_directional(spark):
    """q133's compact-forward count must equal a brute-force pure-Python
    triangle count over the same gated bigram edge set (orientation /
    wedge-dedup bugs show here), and q132's containment must be
    DIRECTIONAL: every full-containment pair (A inside B) reports from
    the smaller fingerprint set's side."""
    from pyspark.sql import functions as F

    from alt_spark.catalog import load_table
    from alt_spark.operators.dedup import tokens_col
    from alt_spark.queries.pipeline_ops import q132
    from alt_spark.queries.text import _BG_SUPPORT_PM, q133
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents").select(
        tokens_col("text").alias("ts")
    )
    from collections import Counter

    c: Counter = Counter()
    n_docs = 0
    for r in docs.collect():
        n_docs += 1
        ts = r["ts"]
        for a, b in zip(ts, ts[1:]):
            if a != b:
                c[(min(a, b), max(a, b))] += 1
    edges = {p for p, k in c.items() if 10000 * k >= _BG_SUPPORT_PM * n_docs}
    adj: dict[str, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    from itertools import combinations

    tri = {
        t: sum(
            1
            for u, v in combinations(sorted(adj[t]), 2)
            if (min(u, v), max(u, v)) in edges
        )
        for t in adj
    }
    want = sorted(
        (
            (
                t,
                len(adj[t]),
                tri[t],
                (10000 * 2 * tri[t]) // (len(adj[t]) * (len(adj[t]) - 1))
                if len(adj[t]) >= 2
                else 0,
            )
            for t in adj
        ),
        key=lambda r: (-r[2], r[0]),
    )[:15]
    got = [tuple(r) for r in q133(spark, SF_ORACLE).collect()]
    assert got == want
    # q132 directionality: for every reported full containment the
    # denominator is the REPORTING side's own fingerprint count.
    rows = q132(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r["shared"] <= r["n_fp_a"]
        assert r["containment_pm"] == (10000 * r["shared"]) // r["n_fp_a"]


def test_q134_gain_twins_pair_and_undecodable_never_pairs(spark):
    """Audio dedup invariants: every 2x-gain twin pairs with its
    original at hamming 0 (energy-envelope gain invariance through the
    REAL WAV kernel), nothing else pairs at sf0.01, and a payload the
    kernel cannot decode hashes NULL (never manufactures pairs)."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from alt_spark.operators.multimodal import audio_bandhash, media_table
    from alt_spark.queries.pipeline_ops import (
        _SND_TWIN_BASE,
        _SND_TWIN_MOD,
        q134,
    )
    from tests.conftest import SF_ORACLE

    rows = q134(spark, SF_ORACLE).collect()
    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    want = {
        (d, _SND_TWIN_BASE + d, 0) for d in doc_ids if d % _SND_TWIN_MOD == 0
    }
    assert {tuple(r) for r in rows} == want
    assert len(rows) == len(want) > 0
    # Undecodable payloads (wrong mime, truncated bytes) hash NULL.
    bad = spark.createDataFrame(
        [
            (1, b"RIFFxxxx", ("audio/wav", None, None, None)),
            (2, b"\x00" * 200, ("audio/mp3", None, None, None)),
        ],
        "media_id long, payload binary,"
        " meta struct<mime:string,width:int,height:int,duration_ms:bigint>",
    )
    got = audio_bandhash(media_table(bad)).collect()
    assert all(r["bandhash"] is None for r in got)


def test_q135_reconciles_with_q73_clusters(spark):
    """The yield report's clustered rows must reconcile exactly with
    q73's cluster table (same pair graph, same closure — shared cached
    artifacts): per-size counts sum to q73's docs and drops, singletons
    fill the corpus, and every yield_pm replays the floor division."""
    from alt_spark.queries.pipeline_ops import q135
    from alt_spark.queries import all_queries
    from tests.conftest import SF_ORACLE

    rows = q135(spark, SF_ORACLE).collect()
    q73_rows = all_queries()["q73_neardup_clusters"](spark, SF_ORACLE).collect()
    clustered_docs = sum(r["n_docs"] for r in rows if r["cluster_size"] >= 2)
    clustered_drop = sum(r["n_removable"] for r in rows if r["cluster_size"] >= 2)
    assert clustered_docs == sum(r["n_docs"] for r in q73_rows)
    assert clustered_drop == sum(r["n_dropped"] for r in q73_rows)
    n_corpus = sum(r["n_docs"] for r in rows)
    n_docs_table = (
        spark.read.parquet(f"{SF_ORACLE}/documents.parquet").count()
    )
    assert n_corpus == n_docs_table
    for r in rows:
        assert r["yield_pm"] == (10000 * r["n_removable"]) // n_corpus
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]
        assert r["n_removable"] == (r["cluster_size"] - 1) * r["n_clusters"]


def test_ivf_assign_rows_matches_mllib_and_increment_equals_full(spark):
    """The incremental IVF path (ivf_assign_rows): (1) in-row argmin
    against the stored centroid table assigns every vector to the SAME
    list as MLlib model.transform did at fit time; (2) searching
    stored-base-lists ∪ increment-assignment equals searching a full
    re-assignment of the union — the lsh_incremental_pairs
    increment==full contract for J8."""
    emb = load_table(spark, SF, "embeddings").cache()
    assigned, centroids = ann.ivf_index(emb, nlist=8)

    # (1) Assignment parity, row for row.
    mine = ann.ivf_assign_rows(emb, centroids).select("vec_id", "list_id")
    theirs = assigned.select("vec_id", "list_id")
    assert mine.exceptAll(theirs).count() == 0
    assert theirs.exceptAll(mine).count() == 0

    # (2) increment == full: base is vec_id % 4 != 3, increment the rest.
    base = emb.filter(F.col("vec_id") % 4 != 3)
    inc = emb.filter(F.col("vec_id") % 4 == 3)
    base_lists = ann.ivf_assign_rows(base, centroids)
    inc_lists = ann.ivf_assign_rows(inc, centroids)
    merged = base_lists.unionByName(inc_lists)
    full = ann.ivf_assign_rows(emb, centroids)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    got = ann.ivf_topk(emb, qvec, k=10, nprobe=4, index=(merged, centroids)).collect()
    want = ann.ivf_topk(emb, qvec, k=10, nprobe=4, index=(full, centroids)).collect()
    assert [(r.id, r.cos_sim) for r in got] == [(r.id, r.cos_sim) for r in want]
    # The increment genuinely reaches results: at least one top row is new.
    inc_ids = {r.vec_id for r in inc.select("vec_id").collect()}
    assert any(r.id in inc_ids for r in got)


def test_ivf_list_table_rerun_safe_via_stamped_merge(spark):
    """Retrying a partially-failed increment folds to the same list
    table: the (id, list_id) rows ride the stamped-index family, so a
    re-submitted batch replaces its own rows instead of accreting —
    the merge_stamped_rows rerun-safety rule applied to the IVF lists."""
    from alt_spark.operators.index_maintenance import (
        merge_stamped_rows,
        stamp_index,
    )

    emb = load_table(spark, SF, "embeddings")
    _, centroids = ann.ivf_index(emb, nlist=4)
    base = ann.ivf_assign_rows(
        emb.filter(F.col("vec_id") < 100), centroids
    ).select("vec_id", "list_id")
    batch = ann.ivf_assign_rows(
        emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 150)),
        centroids,
    ).select("vec_id", "list_id")
    idx = stamp_index(base, 1)
    once = merge_stamped_rows(idx, batch, 2, id_col="vec_id")
    twice = merge_stamped_rows(once, batch, 2, id_col="vec_id")
    assert twice.count() == once.count()
    got = {
        (r.vec_id, r.list_id)
        for r in twice.select("vec_id", "list_id").collect()
    }
    want = {
        (r.vec_id, r.list_id)
        for r in base.unionByName(batch).collect()
    }
    assert got == want


def test_ivf_assign_rows_rejects_malformed_vectors(spark):
    """A NaN coordinate or wrong-dimension embedding must fail loudly
    (the minibatch_update malformed-vector rule), never append a
    list_id -1 row no probe selects."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    cents = [[0.0, 0.0], [1.0, 1.0]]
    ok = spark.createDataFrame(
        [(1, [0.1, 0.2])], "vec_id long, embedding array<double>"
    )
    assert ann.ivf_assign_rows(ok, cents).first()["list_id"] == 0
    for bad_vec in ([float("nan"), 0.0], [0.5]):
        bad = spark.createDataFrame(
            [(2, bad_vec)], "vec_id long, embedding array<double>"
        )
        with pytest.raises(SparkRuntimeException, match="no centroid"):
            ann.ivf_assign_rows(bad, cents).collect()
