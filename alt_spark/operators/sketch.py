"""Frequent-items (heavy-hitters) sketch: weighted Misra-Gries
candidates + exact verification — the two-pass pattern for top-N over
a key whose cardinality explodes at scale.

The DataFrame-native top-N (`groupBy(key).count()` + TakeOrdered) is
the right plan while distinct keys fit the shuffle; when they don't
(URLs, n-grams, user agents at 100 TB), the sketch path bounds every
executor to k counters and the shuffle to partition-count x k rows:

  pass 1  per-partition weighted Misra-Gries summaries (mapInPandas —
          one of the few justified imperative islands: a
          bounded-memory fold with evictions across the partition's
          Arrow batches has no built-in expression; output is
          k-bounded per partition)
  pass 2  exact counts for the UNION of candidate keys only
          (broadcast semi-join + groupBy over a candidate-bounded
          key set), TakeOrdered top-N

Correctness is not probabilistic: Misra-Gries guarantees any key with
true frequency > N/(k+1) survives SOME partition summary (averaging
argument over the per-partition bounds), so after exact verification
the top-N is EXACT whenever min(top-N count) x (k+1) > N — and
:func:`heavy_hitters` attaches a loud assert_true guard on precisely
that inequality (the q94 union-branch device: a zero-row branch when
healthy, an action-time error telling the caller to raise k when
not). Candidate SETS may vary with partitioning; the verified output
cannot — partition-invariance is pytest-pinned.

Batched eviction: when the counter table exceeds k after folding a
batch's value_counts, subtract the (len-k)-th smallest count from all
and drop non-positives. Each such subtraction of t removes t from
> k items at once, so total undercount is <= N/(k+1) — the classic
MG bound survives batching (each eviction event charges t(k+1) mass
against the stream).

Reference anchor: the reference's trending-tags driver
(alt-backend/app/shared/driver/alt_db/trending_tags_driver.go:16-23)
is this query shape at Postgres scale; the sketch is its 100 TB form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from alt_spark.plans import dfcache

__all__ = [
    "hll_partial_sketches",
    "hll_rollup",
    "mg_summaries",
    "merge_mg_summaries",
    "heavy_hitters",
    "exact_verified_top_n",
]


def _mg_fold(batches, key_col: str, k: int, with_total: bool):
    import pandas as pd

    counters: dict[str, int] = {}
    n = 0
    for pdf in batches:
        vals = pdf[key_col].dropna()
        n += len(vals)
        vc = vals.value_counts()
        for key, cnt in vc.items():
            counters[key] = counters.get(key, 0) + int(cnt)
        if len(counters) > k:
            excess = len(counters) - k
            t = sorted(counters.values())[excess - 1]
            counters = {ky: c - t for ky, c in counters.items() if c - t > 0}
    keys: list[str | None] = list(counters.keys())
    cnts: list[int] = list(counters.values())
    if with_total:
        # Sentinel row (key NULL — unambiguous: keys are dropna'd
        # above): the partition's non-null row count, so the caller
        # can derive N from the summary frame instead of paying a
        # third corpus scan (ADVICE r8).
        keys.append(None)
        cnts.append(n)
    yield pd.DataFrame({"key": keys, "cnt_lb": cnts})


def mg_summaries(
    df: DataFrame, key_col: str, k: int, with_total: bool = False
) -> DataFrame:
    """Per-partition weighted Misra-Gries summaries: (key, cnt_lb)
    with cnt_lb a LOWER BOUND on the partition's true count and at
    most ``k`` rows per partition. ``key_col`` must be a string
    column (the sketch hashes nothing — cast upstream).

    With ``with_total=True`` each partition appends ONE extra sentinel
    row ``(NULL, partition_non_null_count)`` so a consumer can recover
    N = sum of sentinel counts from the summary frame itself — the
    device :func:`heavy_hitters` uses to keep its guarantee guard from
    rescanning the corpus (at most k+1 rows per partition then)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if dict(df.dtypes)[key_col] != "string":
        raise ValueError(f"{key_col!r} must be string, got {dict(df.dtypes)[key_col]}")
    return df.select(key_col).mapInPandas(
        lambda it: _mg_fold(it, key_col, k, with_total),
        schema="key string, cnt_lb long",
    )


def merge_mg_summaries(summ: DataFrame, k: int) -> DataFrame:
    """Merge ANY union of MG summary frames (``(key, cnt_lb)`` with
    NULL-key sentinel rows carrying totals, the ``with_total=True``
    shape) into ONE k-bounded summary plus one sentinel row — the
    mergeability that makes the sketch streamable (Agarwal et al.
    2012, "Mergeable Summaries": summing MG counters then evicting
    back to k preserves the N/(k+1) undercount bound, so a key absent
    from the MERGED summary is still guaranteed infrequent over the
    UNION of everything the inputs saw).

    Eviction mirrors the fold: subtract the (n-k)-th smallest count
    from all and drop non-positives. The summary frames are metadata-
    sized (partitions x (k+1) rows), so the single-partition rank
    window below orders bounded state, never corpus data.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    agg = summ.groupBy("key").agg(F.sum("cnt_lb").alias("cnt_lb"))
    tot = agg.filter(F.col("key").isNull())
    keys = agg.filter(F.col("key").isNotNull())
    w = Window.orderBy(F.col("cnt_lb").asc(), F.col("key").asc())
    ranked = keys.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count("*").over(Window.partitionBy(F.lit(1)))
    )
    # Threshold t = the (n-k)-th smallest count (0 when n <= k): one
    # always-1-row aggregate, broadcast back — no empty-crossJoin trap.
    thr = ranked.agg(
        F.coalesce(
            F.max(
                F.when(F.col("__rn") <= F.col("__n") - k, F.col("cnt_lb"))
            ),
            F.lit(0),
        ).alias("__t")
    )
    survivors = (
        ranked.crossJoin(F.broadcast(thr))
        .withColumn("cnt_lb", F.col("cnt_lb") - F.col("__t"))
        .filter(F.col("cnt_lb") > 0)
        .select("key", "cnt_lb")
    )
    return survivors.unionByName(tot)


def heavy_hitters(
    df: DataFrame, key_col: str, top_n: int, k: int = 4096
) -> DataFrame:
    """EXACT top-``top_n`` (count desc, key asc) via the sketch path:
    MG candidates -> exact verify -> TakeOrdered, with a loud
    guarantee guard — if min(selected count) x (k+1) <= N the sketch
    cannot exclude a hidden heavier key and the query RAISES at action
    time instead of returning silently-maybe-wrong rows.

    Returns (key, cnt) ordered (cnt desc, key). At 100 TB: pass 1 is a
    narrow scan emitting partitions x (k+1) summary rows (the +1 a
    per-partition row-count sentinel, so N for the guarantee guard
    comes from the summary frame — exactly TWO corpus scans, never a
    third just to count; ADVICE r8); pass 2 scans again but aggregates
    only candidate keys (broadcast semi-join), so the shuffle is
    candidate-bounded, never distinct-key-bounded.
    """
    if top_n <= 0:
        raise ValueError(f"top_n must be positive, got {top_n}")
    summ = mg_summaries(df, key_col, k, with_total=True)
    if dfcache.MATERIALIZE:
        # Two consumers (candidates + N) of one pass-1 frame: a lazy
        # checkpoint makes the sketch scan compute once, keeping the
        # docstring's two-pass promise literal. Bounded: partitions x
        # (k+1) rows. Hermetic switch keeps plan audits barrier-free.
        summ = summ.localCheckpoint(eager=False)
    return exact_verified_top_n(
        df,
        key_col,
        summ,
        top_n,
        k,
        guard_name="heavy_hitters",
    )


def exact_verified_top_n(
    data: DataFrame,
    key_col: str,
    summary: DataFrame,
    top_n: int,
    k: int,
    guard_name: str = "heavy_hitters",
) -> DataFrame:
    """Pass 2 of the sketch protocol, shared by the batch operator and
    the streaming consumer (one implementation — review finding, r9):
    exact counts over ``data`` for the ``summary``'s candidate keys
    (broadcast semi-join, candidate-bounded shuffle), TakeOrdered
    top-``top_n``, and the STRICT exclusion guard fed by the summary's
    NULL-key sentinel N. ``summary`` must be a ``with_total=True``
    shape (or any union/merge of such frames); ``k`` must be the k it
    was built with."""
    if top_n <= 0:
        raise ValueError(f"top_n must be positive, got {top_n}")
    cands = summary.filter(F.col("key").isNotNull()).select("key").distinct()
    exact = (
        data.select(F.col(key_col).alias("key"))
        .join(F.broadcast(cands), "key", "left_semi")
        .groupBy("key")
        .agg(F.count("*").alias("cnt"))
    )
    sel = exact.orderBy(F.desc("cnt"), "key").limit(top_n)
    total = summary.filter(F.col("key").isNull()).agg(
        F.coalesce(F.sum("cnt_lb"), F.lit(0)).alias("__n")
    )
    mn = sel.agg(F.min("cnt").alias("__mn"))
    guard = (
        mn.crossJoin(F.broadcast(total))
        .filter(
            F.assert_true(
                # STRICT: every returned count must clear the MG
                # exclusion threshold — an empty or flat-tailed result
                # (coalesce 0) always raises. A distribution flat
                # enough to fail here needs the direct groupBy, not a
                # sketch; there is no sound silent fallback.
                F.coalesce(F.col("__mn"), F.lit(0)) * (k + 1) > F.col("__n"),
                F.concat(
                    F.lit(f"{guard_name} guarantee violated: min(top-"),
                    F.lit(str(top_n)),
                    F.lit(" count) * (k+1) <= N for k="),
                    F.lit(str(k)),
                    F.lit("; raise k"),
                ),
            ).isNotNull()
        )
        .select(
            F.lit(None).cast("string").alias("key"),
            F.lit(None).cast("long").alias("cnt"),
        )
    )
    # Re-sort after the union: unionByName carries no ordering
    # guarantee even though the guard branch is empty at runtime, and
    # the docstring promises (cnt desc, key). (Review finding, r8.)
    return sel.unionByName(guard).orderBy(F.desc("cnt"), "key")


def hll_partial_sketches(
    df: DataFrame,
    value_col: str,
    part_cols: list[str],
    lg_k: int = 12,
) -> DataFrame:
    """Per-partition HLL sketches of ``value_col`` distinct cardinality
    (D13 at the 100 TB grain): one Datasketches HLL binary per
    ``part_cols`` group, persistable next to the partition it
    summarizes. The point of a sketch TABLE over a plain
    approx_count_distinct is MERGEABILITY — any rollup window over the
    partitions unions the stored binaries without rescanning rows (the
    reference's ClickHouse uniqState/uniqMerge split;
    009_create_sli_metrics.sql keeps the same insert-time-state /
    query-time-merge separation for its counters)."""
    return df.groupBy(*part_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("hll"),
        F.count("*").alias("n_rows"),
    )


def hll_rollup(
    sketches: DataFrame,
    group_cols: list[str],
) -> DataFrame:
    """Union stored partial sketches up to ``group_cols`` grain and
    estimate: rows scanned = number of PARTIALS, never source rows.
    Estimates are tolerance-grade (Datasketches promotion order makes
    union-of-sketches differ from sketch-of-union by a few counts —
    the error-bound pytest is the contract, not bit equality)."""
    agg = [
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("approx_distinct"),
        F.sum("n_rows").alias("n_rows"),
    ]
    if group_cols:
        return sketches.groupBy(*group_cols).agg(*agg)
    return sketches.agg(*agg)
