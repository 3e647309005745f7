"""Vector similarity search (SURVEY.md §2 J8/J11).

Exact brute-force cosine top-k is the correctness baseline (pgvector
`embedding <=> $1 ORDER BY .. LIMIT k`, hybrid_search_repo.go:72-76);
the scale path is random-hyperplane LSH: vectors land in sign-pattern
buckets, queries probe only their own bucket (optionally multi-probe
neighbors at Hamming distance 1), so the scan is |bucket| not |corpus|.

All vector math is `zip_with` + `aggregate` over array<float> columns —
JVM columnar, no UDFs. Hyperplanes are derived deterministically from
xxhash64 so plans are reproducible without driver-side randomness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from alt_spark.plans.dfcache import DataFramePlanCache

# Scored sign-band candidate pairs keyed by (input plan, parameters):
# the threshold is applied AFTER this frame, so the near-dup query
# (q91) and its threshold-calibration histogram (q99) — or any two
# thresholds over one corpus snapshot — share one banding join + one
# exact-verify pass. Operationally the written candidate-pair table a
# vector-dedup run keeps next to its embedding snapshot.
_SCORED_PAIR_CACHE = DataFramePlanCache(
    max_entries=4, name="embedding_scored_pairs"
)

__all__ = [
    "cosine_sim",
    "embedding_band_rows",
    "embedding_near_dup",
    "embedding_near_dup_incremental",
    "brute_force_topk",
    "hyperplane_buckets",
    "lsh_topk",
    "ivf_index",
    "ivf_assign_rows",
    "ivf_topk",
    "pq_train",
    "pq_encode",
    "pq_adc_topk",
]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: (x * x).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns, in-row (no shuffle)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: one scan, per-row similarity, distributed
    TakeOrderedAndProject — O(n·dim), zero shuffle of the corpus."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    sim = cosine_sim(F.col(vec_col), q)
    return (
        corpus.select(F.col(id_col).alias("id"), sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "id")
        .limit(k)
    )


def embedding_near_dup(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    band_bits: int = 8,
    round_digits: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS: every (id_a < id_b) whose
    cosine similarity rounds to >= ``threshold``, found by sign-band
    blocking instead of an all-pairs scan.

    Reference semantics: the embedding-similarity dedup mode of the
    recap pipeline (recap-subworker clusterer.py FAISS neighborhoods;
    pgvector `<=>` in rag-orchestrator hybrid_search_repo.go:72-76) —
    re-expressed as the corpus-governance variant: all near-identical
    vector pairs, not top-k of one query.

    Blocking is sign-random-projection LSH (Charikar 2002) with the
    CANONICAL basis as the hyperplane set: band j's key is the sign
    pattern of dimensions [j*band_bits, (j+1)*band_bits). Two vectors
    are candidates iff they agree on at least one full band — the
    classic MinHash banding layout, but over sign bits, so the key is
    computable IN-ROW (one `transform` over the array, no per-plane
    dot products) and is portable to the SQL oracle (`val >= 0`).
    Candidates are then verified with the exact rounded cosine.

    Scale shape (100 TB): the corpus is never self-joined — the join is
    a banded EQUI-join on (band, key), the same shape as the MinHash
    LSH path in operators/dedup.py, so it hash-partitions cleanly;
    near-constant vectors that flood one sign bucket are the documented
    skew case (operators/skew.py salting applies). Verification joins
    the BOUNDED candidate pair set back to the vectors (two hash joins)
    and computes the cosine in-row via zip_with/aggregate — no explode,
    no shuffle of vector payloads beyond the two joins. Recall is the
    standard banding trade-off: a true pair is missed only if EVERY
    band has a flipped sign bit; tests pin blocked == brute-force on
    the planted-duplicate corpus, where perturbed dims all fall in one
    band by construction.

    Returns (id_a, id_b, cos_sim) with cos_sim rounded to
    ``round_digits`` BEFORE the threshold compare, so an engine-twin
    oracle filtering on the same rounded value agrees exactly.
    """
    params = (
        "embedding_scored_pairs", id_col, vec_col, int(band_bits),
        int(round_digits),
    )
    base = vecs.select(
        F.col(id_col).alias("_id"),
        F.expr(f"transform({vec_col}, x -> cast(x AS double))").alias("_v"),
    )
    bands = embedding_band_rows(vecs, id_col, vec_col, band_bits)
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    va = base.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"))
    vb = base.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"))
    sim = F.round(
        cosine_sim(F.col("_va"), F.col("_vb")), round_digits
    ).alias("cos_sim")
    raw = cand.join(va, "id_a").join(vb, "id_b").select("id_a", "id_b", sim)
    # Lazily checkpoint on first use (the _PAIR_CACHE pattern; LAZY
    # since r8 — ADVICE r7: the previous EAGER checkpoint ran real
    # Spark jobs at frame-CONSTRUCTION time and blinded plan audits):
    # the banding join runs once and every consumer of the same
    # corpus+params (q91's cut, q99's calibration histogram) reads the
    # candidate-bounded blocks.
    scored = _SCORED_PAIR_CACHE.get_or_materialize(vecs, raw, extra=params)
    return scored.filter(F.col("cos_sim") >= threshold)


def embedding_band_rows(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    band_bits: int = 8,
) -> DataFrame:
    """(id, band, key) sign-band rows for an embedding table — the
    persistable blocking index of ``embedding_near_dup`` (the
    embedding-space sibling of ``dedup.band_rows``): band j's key is
    the sign pattern of dimensions [j*band_bits, (j+1)*band_bits).
    Derived fully IN-ROW (no per-plane dot products, no explode-side
    shuffle); at 100 TB this table is written once per corpus snapshot
    and each daily batch equi-joins against it
    (``embedding_near_dup_incremental``)."""
    # Interpreted-HOF note: the lambdas here run per-row on ~dim values;
    # at the suite's scale they are scan-cheap, and they keep the whole
    # key derivation in-row (the alternative — posexplode + groupBy —
    # costs a corpus-wide shuffle before blocking even starts).
    # Band count is ceil(dim / band_bits) with an empty-vector guard:
    # int(dim/bb) dropped the remainder dims the DuckDB twin DOES band
    # ((idx-1)//bb grouping), and for dim < bb Spark's sequence(0, -1)
    # counts DOWN, emitting a bogus band -1 with an empty key that made
    # every short vector a candidate of every other (review finding).
    # The trailing partial band's slice simply returns the remainder.
    return vecs.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.expr(
                f"transform(IF(size({vec_col}) > 0, sequence(0, "
                f"cast(ceil(size({vec_col}) / cast({band_bits} AS DOUBLE)) "
                f"AS INT) - 1), cast(array() AS array<int>)), "
                f"j -> array_join(transform(slice(transform({vec_col}, "
                f"x -> cast(x AS double)), j * {band_bits} + 1, "
                f"{band_bits}), x -> IF(x >= 0D, '1', '0')), ''))"
            )
        ).alias("band", "key"),
    )


def embedding_near_dup_incremental(
    new_vecs: DataFrame,
    base_bands: DataFrame,
    base_vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    band_bits: int = 8,
    round_digits: int = 6,
) -> DataFrame:
    """Embedding near-dup pairs for an INCREMENT against a persisted
    sign-band index — the daily-batch form of ``embedding_near_dup``
    at 100 TB, mirroring ``dedup.lsh_incremental_pairs``: the base
    corpus is banded ONCE (``embedding_band_rows`` written to
    storage); each new batch bands only its own vectors and equi-joins
    them against the stored index, then verifies candidates with the
    exact rounded cosine (``base_vecs`` supplies the stored vectors
    for the base side of the verify join). Nothing about the base is
    recomputed or rescanned beyond the candidate equi-join + the
    verify join on candidate ids.

    ``base_bands`` must be (id, band, key) produced with the SAME
    band_bits. Returns (new_id, match_id, in_base, cos_sim):
    in_base=true rows pair a new vector with a base vector; false rows
    pair two new vectors (new_id < match_id there, so each in-batch
    pair appears once). Rerun-safe like the MinHash form: batch ids
    present in the stored index are excluded from the base side, so a
    retried batch cannot pair a vector with its own stale index rows.
    """
    nv = new_vecs.select(
        F.col(id_col).alias("_id"),
        F.expr(f"transform({vec_col}, x -> cast(x AS double))").alias("_v"),
    )
    nb = embedding_band_rows(new_vecs, id_col, vec_col, band_bits)
    base = base_bands.join(
        F.broadcast(nb.select("id").distinct()), "id", "left_anti"
    )
    vs_base = (
        nb.alias("a")
        .join(
            base.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key")),
        )
        .select(
            F.col("a.id").alias("new_id"),
            F.col("b.id").alias("match_id"),
            F.lit(True).alias("in_base"),
        )
        .distinct()
    )
    within = (
        nb.alias("a")
        .join(nb.alias("b"), ["band", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("new_id"),
            F.col("b.id").alias("match_id"),
            F.lit(False).alias("in_base"),
        )
        .distinct()
    )
    cand = vs_base.unionByName(within)
    bv = base_vecs.select(
        F.col(id_col).alias("_id"),
        F.expr(f"transform({vec_col}, x -> cast(x AS double))").alias("_v"),
    )
    left = nv.select(F.col("_id").alias("new_id"), F.col("_v").alias("_va"))
    # The match side may be a base vector or another batch vector; a
    # retried batch id present in BOTH sides counts as batch-only (the
    # same anti-join rule as the band index above), or the verify join
    # would emit duplicate rows per candidate.
    right = (
        bv.join(F.broadcast(nv.select("_id").distinct()), "_id", "left_anti")
        .unionByName(nv)
        .select(F.col("_id").alias("match_id"), F.col("_v").alias("_vb"))
    )
    sim = F.round(
        cosine_sim(F.col("_va"), F.col("_vb")), round_digits
    ).alias("cos_sim")
    return (
        cand.join(left, "new_id")
        .join(right, "match_id")
        .select("new_id", "match_id", "in_base", sim)
        .filter(F.col("cos_sim") >= threshold)
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: unit-free ±1 components
    derived from a counter hash (reproducible across sessions)."""
    import hashlib

    comps = []
    for d in range(dim):
        digest = hashlib.md5(f"{plane_idx}:{d}".encode()).digest()
        comps.append(1.0 if digest[0] % 2 == 0 else -1.0)
    return comps


def hyperplane_buckets(
    df: DataFrame,
    dim: int,
    num_planes: int = 16,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a `bucket` column: sign pattern of `num_planes` random
    hyperplane projections packed into a long (SRP-LSH).

    The plane matrix travels as a one-row broadcast relation, not as
    expression literals: embedding dim x num_planes floats as `lit()`s
    made the logical plan grow with the vector dimension (12k literals
    at dim=768), bloating analysis/codegen. A broadcast of one local
    row keeps plan size constant in `dim`; the bucket itself is a
    single higher-order aggregate over `sequence(0, num_planes-1)`.
    """
    planes = [_hyperplane(dim, p) for p in range(num_planes)]
    planes_df = df.sparkSession.createDataFrame(
        [(planes,)], "__planes array<array<double>>"
    )
    bucket = F.aggregate(
        F.sequence(F.lit(0), F.lit(num_planes - 1)),
        F.lit(0).cast("long"),
        lambda acc, p: acc
        + F.when(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.element_at(F.col("__planes"), p + 1),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda a, v: a + v,
            )
            > 0,
            # 2^p as an exact double->long (p < 32; shiftleft's Python
            # signature takes only int literals, not a lambda-bound Column)
            F.pow(F.lit(2.0), p).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return (
        df.crossJoin(F.broadcast(planes_df))
        .withColumn("bucket", bucket)
        .drop("__planes")
    )


def lsh_topk(
    corpus: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    num_planes: int = 8,
    multi_probe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: scan only the query's SRP bucket (plus, with
    multi_probe, all buckets at Hamming distance 1 — recovers most
    near-boundary misses for ~(num_planes+1)× bucket cost).

    At 100 TB the bucketed table is written partitioned by `bucket`, so
    this probe is partition pruning — the scan touches only probed
    buckets' files.
    """
    bucketed = hyperplane_buckets(corpus, dim, num_planes, vec_col)
    qbucket = 0
    for p in range(num_planes):
        plane = _hyperplane(dim, p)
        proj = sum(a * b for a, b in zip(query_vec, plane))
        qbucket += (1 << p) if proj > 0 else 0
    probes = [qbucket]
    if multi_probe:
        probes += [qbucket ^ (1 << p) for p in range(num_planes)]
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    sim = cosine_sim(F.col(vec_col), q)
    return (
        bucketed.filter(F.col("bucket").isin(probes))
        .select(F.col(id_col).alias("id"), sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "id")
        .limit(k)
    )


def ivf_index(
    df: DataFrame,
    nlist: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF coarse quantizer: MLlib KMeans centroids + per-vector list
    assignment (the FAISS IVF-flat layout, data-adaptive where SRP-LSH
    is data-oblivious — fewer empty/hot buckets on clustered corpora).

    Returns ``(assigned, centroids)``: ``assigned`` is the input plus a
    ``list_id`` column; ``centroids`` is an nlist-sized Python list (the
    quantizer is dim x nlist floats — driver-tiny by design, exactly
    what FAISS holds in RAM while the inverted lists stay sharded).

    At 100 TB: train on a sample, write ``assigned`` partitioned by
    ``list_id``; probes then prune partitions the same way lsh_topk's
    bucket filter does.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.withColumn("__features", array_to_vector(vec_col))
    model = KMeans(k=nlist, seed=seed, maxIter=20, featuresCol="__features").fit(
        feats.select("__features")
    )
    assigned = (
        model.transform(feats)
        .withColumnRenamed("prediction", "list_id")
        .drop("__features")
    )
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centroids


def ivf_assign_rows(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign a vector batch against STORED centroids — the
    daily-increment path of the IVF index (the lsh_incremental_pairs
    doctrine applied to J8: the quantizer is fitted once and persisted
    as a centroid table; each new batch assigns IN-ROW against it and
    only appends to the touched inverted lists, nothing about the base
    corpus is recomputed).

    Assignment is the squared-L2 argmin over a broadcast literal
    centroid array (ties to the lowest list id), folded over
    transform-precomputed (d, i) structs so each distance is evaluated
    once — the same device as the mini-batch k-means fold. Returns the
    input plus ``list_id``; it equals :func:`ivf_index`'s MLlib
    ``model.transform`` assignment for the same centroids (parity
    pytest), so stored lists and increments share one rule.

    At 100 TB: the centroid table is nlist x dim floats (driver-tiny);
    the batch pays one narrow scan, the merged list table stays
    partitioned by ``list_id``, and probes keep pruning partitions.
    Rerun-safety comes from the index-maintenance family: stamp the
    (id, list_id) rows and fold retries through ``merge_stamped_rows``.
    Reference: rag-orchestrator hybrid_search_repo.go:72-76 (the
    serving path this index feeds) + search-indexer's incremental
    index contract.
    """
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.array(*[F.lit(float(v)) for v in vec]).alias("cv"),
            )
            for i, vec in enumerate(centroids)
        ]
    )

    def dist_to(x):
        return F.aggregate(
            F.zip_with(
                F.col(vec_col).cast("array<double>"),
                x["cv"],
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda s, d: s + d,
        )

    dists = F.transform(
        cent_arr,
        lambda x: F.struct(dist_to(x).alias("d"), x["i"].alias("i")),
    )
    best = F.aggregate(
        dists,
        F.struct(F.lit(float("inf")).alias("d"), F.lit(-1).alias("i")),
        lambda acc, x: F.when(x["d"] < acc["d"], x).otherwise(acc),
    )["i"]
    # A NaN coordinate (Spark orders NaN above every numeric, so no
    # distance beats inf) or a wrong-length vector (zip_with null-pads
    # into null distances) folds to -1. Fail LOUDLY instead of
    # appending a bogus inverted list no probe ever selects — the same
    # malformed-vector rule as minibatch_update (ADVICE r11).
    guarded = F.when(best >= 0, best).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "ivf_assign_rows: no centroid is nearest (NaN or "
                    "wrong-dimension embedding) for id "
                ),
                F.col(id_col).cast("string"),
            )
        ).cast("int")
    )
    return df.withColumn("list_id", guarded)


def ivf_topk(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: tuple[DataFrame, list[list[float]]] | None = None,
) -> DataFrame:
    """Approximate top-k via IVF: score the query against the nlist
    centroids driver-side (tiny), then brute-force only the ``nprobe``
    nearest inverted lists. Pass ``index`` (from :func:`ivf_index`) to
    amortize the quantizer across queries — the production shape; built
    ad hoc otherwise.
    """
    import math

    assigned, centroids = index if index is not None else ivf_index(
        corpus, nlist, vec_col, id_col
    )

    def cos(u: list[float], w: list[float]) -> float:
        d = sum(a * b for a, b in zip(u, w))
        nu = math.sqrt(sum(a * a for a in u)) or 1.0
        nw = math.sqrt(sum(a * a for a in w)) or 1.0
        return d / (nu * nw)

    probes = sorted(
        range(len(centroids)), key=lambda i: -cos(query_vec, centroids[i])
    )[:nprobe]
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    sim = cosine_sim(F.col(vec_col), q)
    return (
        assigned.filter(F.col("list_id").isin(probes))
        .select(F.col(id_col).alias("id"), sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "id")
        .limit(k)
    )


# --------------------------------------------------------------------- PQ/ADC
def pq_train(
    df: DataFrame,
    m: int = 8,
    ksub: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> list[list[list[float]]]:
    """Product-quantization codebook: split dim into ``m`` subspaces and
    fit ``ksub`` centroids per subspace. Returns ``codebook[m][ksub]
    [dim/m]`` — m·ksub·(dim/m) = ksub·dim floats, driver-tiny at any
    corpus size (what FAISS holds in RAM while codes stay sharded with
    the data).

    ONE distributed pass trains all subspaces: vectors explode into
    (subspace, subvector) rows and each subspace group runs the same
    deterministic numpy Lloyd kernel as cluster_islands (init = the
    ksub lowest-``id_col`` members, fixed iterations) via applyInPandas
    — m sequential MLlib fits would pay m scans and m job launches for
    the same statistic. Sorting by the real id makes the codebook
    independent of physical layout, not just of randomness. At 100 TB
    train on a sample — the codebook is a statistic, not a per-row
    artifact. ``seed`` is kept for signature stability; the kernel is
    order-deterministic without randomness.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    first = df.select(F.size(vec_col).alias("d")).first()
    dim = first["d"]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m

    sub_rows = df.select(
        F.col(id_col).alias("__rid"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda j: F.slice(F.col(vec_col), j * dsub + 1, dsub).cast(
                    "array<double>"
                ),
            )
        ).alias("__j", "__sub"),
    )

    schema = T.StructType(
        [
            T.StructField("j", T.IntegerType()),
            T.StructField("c", T.IntegerType()),
            T.StructField("centroid", T.ArrayType(T.DoubleType())),
        ]
    )

    def lloyd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__rid").reset_index(drop=True)
        X = np.array(pdf["__sub"].tolist(), dtype=np.float64)
        kk = min(ksub, len(X))
        centers = X[:kk].copy()
        for _ in range(20):
            d = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for c in range(kk):
                members = X[assign == c]
                if len(members):
                    centers[c] = members.mean(axis=0)
        j = int(pdf["__j"].iloc[0])
        return pd.DataFrame(
            {
                "j": np.full(kk, j, dtype=np.int32),
                "c": np.arange(kk, dtype=np.int32),
                "centroid": list(centers),
            }
        )

    rows = sub_rows.groupBy("__j").applyInPandas(lloyd, schema).collect()
    codebook: list[list[list[float]]] = [[] for _ in range(m)]
    for r in sorted(rows, key=lambda r: (r["j"], r["c"])):
        codebook[r["j"]].append([float(x) for x in r["centroid"]])
    return codebook


def _codebook_df(df: DataFrame, codebook: list[list[list[float]]]) -> DataFrame:
    """One-row broadcast relation for the codebook (same plan-size
    rationale as hyperplane_buckets: literals would grow the plan with
    ksub·dim)."""
    return df.sparkSession.createDataFrame(
        [(codebook,)], "__cb array<array<array<double>>>"
    )


def pq_encode(
    df: DataFrame,
    codebook: list[list[list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Add ``codes`` (array<int>, length m): per subspace, the index of
    the nearest codebook centroid (squared-L2). One narrow projection
    over a broadcast codebook row — encoding shuffles nothing, and the
    output column is m small ints standing in for dim floats (16 bytes
    vs 256 at dim=64/m=16 — the 100 TB memory story).
    """
    m = len(codebook)
    dsub = len(codebook[0][0])
    ksub = len(codebook[0])

    def sub_l2(j: Column, c: Column) -> Column:
        # squared L2 between the row's j-th subvector and centroid c of
        # subspace j (both 1-indexed into the broadcast codebook).
        cent = F.element_at(F.element_at(F.col("__cb"), j + 1), c + 1)
        sub = F.slice(F.col(vec_col), j * dsub + 1, dsub)
        return F.aggregate(
            F.zip_with(sub, cent, lambda x, y: (x.cast("double") - y) ** 2),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def code_for(j: Column) -> Column:
        dists = F.transform(F.sequence(F.lit(0), F.lit(ksub - 1)), lambda c: sub_l2(j, c))
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    codes = F.transform(F.sequence(F.lit(0), F.lit(m - 1)), code_for)
    return (
        df.crossJoin(F.broadcast(_codebook_df(df, codebook)))
        .withColumn("codes", codes)
        .drop("__cb")
    )


def pq_adc_topk(
    encoded: DataFrame,
    query_vec: list[float],
    codebook: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the query builds an
    m x ksub lookup table driver-side (tiny), each row's approximate
    squared-L2 is m table lookups summed in-row — the scan never touches
    the original vectors, so a 100 TB corpus searches from its codes
    (per-row cost O(m), independent of dim).
    """
    m = len(codebook)
    dsub = len(codebook[0][0])
    lut = [
        [
            sum(
                (query_vec[j * dsub + t] - cent[t]) ** 2
                for t in range(dsub)
            )
            for cent in codebook[j]
        ]
        for j in range(m)
    ]
    lut_df = encoded.sparkSession.createDataFrame([(lut,)], "__lut array<array<double>>")
    adc = F.aggregate(
        F.zip_with(
            F.sequence(F.lit(0), F.lit(m - 1)),
            F.col("codes"),
            lambda j, c: F.element_at(F.element_at(F.col("__lut"), j + 1), c + 1),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        encoded.crossJoin(F.broadcast(lut_df))
        .select(F.col(id_col).alias("id"), adc.alias("adc_dist"))
        .orderBy("adc_dist", "id")
        .limit(k)
    )
