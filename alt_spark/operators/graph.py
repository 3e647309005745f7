"""Graph operators as iterative DataFrame joins (SURVEY.md §2 J4).

Reference: recap-worker classifier/graph.rs — kNN similarity graph
(:52-115), neighbor label propagation (:180-211), and random-walk-with-
restart `r = c·e + (1−c)·Aᵀ·r` over a CSR matrix (:258-340).

Spark shape: the adjacency is an edge DataFrame; one power-iteration
step is a join (edges × rank vector) + groupBy(dst).sum — the classic
GraphFrames/Pregel decomposition. The rank vector is tiny relative to
edges, so each step broadcasts it; edges are the stable big side and
can be cached/bucketed by src so iterations reuse the layout instead of
re-shuffling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alt_spark.plans.dfcache import DataFramePlanCache

__all__ = [
    "normalize_edges",
    "random_walk_with_restart",
    "propagate_labels",
    "connected_components",
    "connected_components_incremental",
    "orient_compact_forward",
    "compact_forward_triangles",
]

# Bounded registry of CONVERGED label tables, keyed by (session, pair
# frame's canonical plan). q73 and q77 run the identical pair graph +
# closure (together they were ~10 s of the 83 s r6 suite, ~80% shared
# computation — VERDICT r6 item 2); each query must stand alone for the
# driver, so the reuse lives here: a second closure over the SAME pair
# plan returns the already-converged labels. Entries are
# localCheckpoint'd frames (materialized, lineage-free, node-count-sized
# — the bounded-driver-state budget of the LM model cache); dropping
# the reference on evict lets the ContextCleaner reclaim the blocks, so
# no unpersist-on-evict is needed. Session scoping + collision
# confirmation come with DataFramePlanCache.
# max_entries=8 (was 4): q121 adds two label tables per run (base
# labels + the incremental merged closure) on top of q73/q77/q81/q118's
# entries — at 4 the suite thrashed (BENCH_DETAIL r9: evictions 4,
# warm q72 A/B runs re-paying CC convergence; review finding). Entries
# are label tables (id, comp) — small, bounded by corpus doc count.
_CC_CACHE = DataFramePlanCache(max_entries=8, name="cc_labels")


def connected_components(
    pairs: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iters: int = 25,
    rounds_out: list[int] | None = None,
) -> DataFrame:
    """Connected components of an undirected edge list: ``(id, comp)``
    where ``comp`` is the MINIMUM node id in the component (the
    deterministic canonical representative).

    This is the step a dedup pipeline runs after near-dup PAIR
    generation (q30/q53): pairs are not a keep-decision — transitive
    groups are (A~B, B~C means A,B,C are one cluster and one survivor
    should represent all three). The reference stops at pair-level
    similarity (minhash.rs); cluster canonicalization is the standard
    production step on top (e.g. the SlimPajama/BigQuery dedup recipes).

    Algorithm: alternating neighbor-min propagation and pointer
    jumping (label-of-label lookup), the DataFrame form of the
    two-phase CC of Kiveris et al. 2014 ("Connected Components in
    MapReduce and Beyond"). Neighbor-min alone needs O(diameter)
    rounds — a path graph degenerates to O(n); the jump step halves
    label-chain depth each round, so convergence is O(log n) rounds on
    ANY topology. Near-dup clusters are almost always tiny cliques
    (1-3 rounds); the bound is for the adversarial tail.

    Scale shape per round: one edges-side equi-join + groupBy(min) +
    one labels self-join — all hash-partitioned on node/label ids,
    nothing driver-side except the converged-count check. Labels are
    localCheckpoint'd each round (lineage truncation, the iterative-op
    doctrine) and the edge list is persisted once. Raises RuntimeError
    if max_iters rounds do not converge (never observed below the
    adversarial-path bound; raise max_iters for pathological graphs).

    ``rounds_out``: optional list that receives the number of
    convergence rounds actually run (0 on a label-cache hit) — the
    executable witness for the O(log n) bound
    (tests/test_scale_smoke.py pins round count <= ceil(log2 n) + c on
    a worst-case-diameter path).

    Converged labels are cached per (session, pair-frame plan)
    (``_CC_CACHE``): a caller re-clustering the SAME pair frame — q77
    after q73 — reuses the materialized labels instead of replaying
    pair generation plus the whole closure.
    """
    edges = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    hit = _CC_CACHE.get(edges)
    if hit is not None:
        if rounds_out is not None:
            rounds_out.append(0)
        return hit
    und = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()
    labels = (
        und.select(F.col("a").alias("id")).distinct().withColumn("comp", F.col("id"))
    ).localCheckpoint()
    # Convergence via the label-sum: every node's comp is monotonically
    # non-increasing (least-of-neighbors, then label-of-label, and
    # label(x) <= x holds inductively), so the rounds are at a fixpoint
    # exactly when sum(comp) stops decreasing — one aggregate over the
    # checkpointed label table per round, no join against the previous
    # round's labels.
    prev_sum = None
    try:
        for rounds in range(1, max_iters + 1):
            nbr_min = (
                und.join(labels, und["a"] == labels["id"])
                .groupBy(F.col("b").alias("id"))
                .agg(F.min("comp").alias("nbr"))
            )
            prop = labels.join(nbr_min, "id", "left").select(
                "id",
                F.least(F.col("comp"), F.coalesce("nbr", F.col("comp"))).alias(
                    "comp"
                ),
            )
            # Pointer jump: comp <- comp's own comp. Cuts label-chain
            # depth in half each round (comp ids are node ids, so the
            # label table doubles as the pointer table).
            ptr = prop.select(
                F.col("id").alias("pid"), F.col("comp").alias("pcomp")
            )
            jumped = (
                prop.join(ptr, prop["comp"] == ptr["pid"], "left")
                .select(
                    "id",
                    F.coalesce("pcomp", "comp").alias("comp"),
                )
            ).localCheckpoint()
            # DECIMAL(38,0) keeps the sum exact at any id scale — an
            # int64 wrap could in principle alias two distinct sums.
            cur_sum = jumped.agg(
                F.sum(F.col("comp").cast("decimal(38,0)"))
            ).first()[0]
            labels = jumped
            if cur_sum == prev_sum:
                if rounds_out is not None:
                    rounds_out.append(rounds)
                _CC_CACHE.put(edges, labels)
                return labels
            prev_sum = cur_sum
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds"
        )
    finally:
        und.unpersist()


def connected_components_incremental(
    new_pairs: DataFrame,
    base_labels: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iters: int = 25,
) -> DataFrame:
    """Update cluster assignments for an INCREMENT of near-dup pairs
    against a persisted component index — the daily-batch form of
    cluster canonicalization, completing the incremental dedup family
    (exact_dedup_incremental / lsh_incremental_pairs feed this).

    ``base_labels`` is (id, comp) from a prior :func:`connected_components`
    run (comp = component-min id). ``new_pairs`` is any pair frame —
    typically ``lsh_incremental_pairs`` output (new-vs-base and
    new-vs-new pairs). NULL-endpoint pairs are dropped.

    The prior index compresses every old component into a STAR (member
    → comp edges), so the increment never replays old pair generation:
    only components ADJACENT to the increment are pulled from the
    index (a keyed semi-join retrieval — work is proportional to
    touched components plus the increment, never the base), their star
    edges are unioned with the new pairs, and the closure runs on that
    small graph. A new pair bridging two old components merges them to
    the global min id, exactly as a full recompute would
    (increment == full-recompute parity is pytest-enforced).

    Returns (id, comp) for every node of a touched component plus the
    increment's own nodes. Untouched base rows are ABSENT by design;
    the caller's index update is::

        base_labels.join(result, "id", "left_anti").unionByName(result)

    Rerun-safe: duplicate/resubmitted pairs are idempotent under the
    closure.
    """
    pairs = new_pairs.select(
        F.col(src).alias("id1"), F.col(dst).alias("id2")
    ).filter(F.col("id1").isNotNull() & F.col("id2").isNotNull())
    nodes = (
        pairs.select(F.col("id1").alias("id"))
        .unionByName(pairs.select(F.col("id2").alias("id")))
        .distinct()
    )
    touched = (
        base_labels.join(nodes, "id").select("comp").distinct()
    )
    affected = base_labels.join(touched, "comp")
    star = affected.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias("id1"), F.col("comp").alias("id2")
    )
    merged = pairs.unionByName(star)
    return connected_components(merged, "id1", "id2", max_iters)


def normalize_edges(edges: DataFrame) -> DataFrame:
    """Row-normalize edge weights so each src's out-weights sum to 1."""
    totals = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    return (
        edges.join(totals, "src")
        .select("src", "dst", (F.col("weight") / F.col("out_w")).alias("weight"))
    )


def random_walk_with_restart(
    edges: DataFrame,
    restart: DataFrame,
    c: float = 0.15,
    iters: int = 10,
) -> DataFrame:
    """r_{t+1} = c·e + (1−c)·Aᵀ·r_t  (graph.rs:258-340).

    `edges` (src, dst, weight) should be row-normalized; `restart`
    (id, e) is the personalization vector. Returns (id, score).
    """
    norm = normalize_edges(edges).cache()
    r = restart.select("id", F.col("e").alias("score"))
    for _ in range(iters):
        spread = (
            norm.join(F.broadcast(r), norm["src"] == r["id"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("weight") * F.col("score")).alias("walked"))
        )
        r = (
            restart.join(spread, "id", "left")
            .select(
                "id",
                (c * F.col("e") + (1 - c) * F.coalesce("walked", F.lit(0.0))).alias("score"),
            )
        )
    return r


def propagate_labels(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 3,
    min_weight: float = 0.0,
) -> DataFrame:
    """Neighbor label propagation (graph.rs:180-211): unlabeled nodes take
    the argmax of neighbor label weight sums; seeds never change.

    `edges` (src, dst, weight) is treated as undirected; `seeds`
    (id, label). Returns (id, label, confidence).
    """
    undirected = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    ).filter(F.col("weight") >= min_weight)
    labels = seeds.select("id", "label", F.lit(1.0).alias("confidence"))
    seed_ids = seeds.select("id")
    for _ in range(iters):
        votes = (
            undirected.join(
                F.broadcast(labels), undirected["src"] == labels["id"]
            )
            .groupBy(F.col("dst").alias("nid"), "label")
            .agg(F.sum(F.col("weight") * F.col("confidence")).alias("vote"))
        )
        from pyspark.sql.window import Window

        w = Window.partitionBy("nid").orderBy(F.desc("vote"), "label")
        best = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                F.col("nid").alias("id"),
                "label",
                F.least(F.col("vote"), F.lit(1.0)).alias("confidence"),
            )
        )
        # Seeds are authoritative; propagated labels fill the rest.
        labels = seeds.select("id", "label", F.lit(1.0).alias("confidence")).unionByName(
            best.join(seed_ids, "id", "left_anti")
        )
    return labels


def orient_compact_forward(edges: DataFrame) -> DataFrame:
    """Degree-orient an undirected edge list (t1, t2) into (src, dst)
    with src the LOWER-degree endpoint (ties broken by name) — the
    compact-forward orientation (Latapy 2008): every node's out-degree
    is then <= sqrt(2m), because an out-degree d+ node's out-neighbors
    all carry degree >= d+, so d+ > sqrt(2m) would force the degree sum
    past 2m. That bound is what keeps the wedge join below all-pairs on
    hub-heavy graphs; `tests/test_scale_smoke.py` pins it on a planted
    100k-edge star.

    PRECONDITION: `edges` must be a deduplicated, self-loop-free
    undirected edge list with each unordered pair present EXACTLY once
    (t1 != t2, and never both (a,b) and (b,a)). A duplicate or
    reversed-duplicate edge inflates both endpoints' degrees and
    multiplies the wedge/triangle rows downstream; a self-loop orients
    to (a,a) and closes spurious triangles. Normalize first with e.g.
    ``edges.filter("t1 != t2").select(least(t1,t2), greatest(t1,t2))
    .distinct()`` — q133 does exactly this before calling in."""
    deg = (
        edges.select(F.col("t1").alias("t"))
        .unionByName(edges.select(F.col("t2").alias("t")))
        .groupBy("t")
        .agg(F.count("*").alias("d"))
    )
    e = edges.join(
        F.broadcast(deg.select(F.col("t").alias("t1"), F.col("d").alias("d1"))),
        "t1",
    ).join(
        F.broadcast(deg.select(F.col("t").alias("t2"), F.col("d").alias("d2"))),
        "t2",
    )
    fwd = (F.col("d1") < F.col("d2")) | (
        (F.col("d1") == F.col("d2")) & (F.col("t1") < F.col("t2"))
    )
    return e.select(
        F.when(fwd, F.col("t1")).otherwise(F.col("t2")).alias("src"),
        F.when(fwd, F.col("t2")).otherwise(F.col("t1")).alias("dst"),
    )


def compact_forward_triangles(oriented: DataFrame) -> DataFrame:
    """Close wedges over a compact-forward-oriented edge list: rows
    (u, v, w) — one per triangle, each exactly once (u is the lowest-
    degree corner, v before w in orientation order). The wedge build is
    an equi-join on the shared lower-degree endpoint (fan-out bounded
    by the orientation's sqrt(2m) out-degree cap) and the close is an
    equi-join on (v, w) — never an all-wedges filter against raw hub
    degrees.

    PRECONDITION: `oriented` must come from `orient_compact_forward`
    applied to a deduplicated, self-loop-free undirected edge list
    (see that function's docstring) — duplicate edges multiply wedge
    rows and over-count triangles."""
    e1, e2, e3 = oriented.alias("e1"), oriented.alias("e2"), oriented.alias("e3")
    return (
        e1.join(
            e2,
            (F.col("e1.src") == F.col("e2.src"))
            & (F.col("e1.dst") != F.col("e2.dst")),
        )
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.dst"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .select(
            F.col("e1.src").alias("u"),
            F.col("e1.dst").alias("v"),
            F.col("e2.dst").alias("w"),
        )
    )
