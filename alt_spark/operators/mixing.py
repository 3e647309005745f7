"""Deterministic data mixing for training corpora (north-star pillar).

A 100 TB training pipeline re-weights sources every run ("20% code, 5%
forum, ..."), and the sample must be (a) reproducible — the same doc is
kept or dropped on every run and every executor, (b) scan-local — no
shuffle, no rand() (non-deterministic under task retry, which silently
duplicates/drops rows when a stage is re-attempted), and (c) exactly
auditable cross-engine.

``stratified_sample`` keeps a row iff

    portable_hash60(salt ':' id) % PRECISION  <  rate_permyriad[stratum]

Integer arithmetic end-to-end: the md5-based portable hash and the
modulo are bit-identical in Spark and DuckDB (functions/hashing.py), so
sampling decisions — not just counts — are oracle-checkable row by row.
The filter is a narrow per-row predicate evaluated inside the scan
stage; at 100 TB it costs one md5 per row and prunes before any wide
operator runs. Changing ``salt`` draws an independent sample;
the reference has no sampling layer (it processes every feed item), so
this operator is beyond-reference by design.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from alt_spark.functions.hashing import portable_hash60

__all__ = [
    "PRECISION",
    "sample_bucket",
    "stratified_sample",
    "target_mixture_rates",
    "temperature_rates",
    "token_budget_plan",
    "cdf_buckets",
    "split_assignment",
    "ddb_split_assignment",
    "epoch_expand",
    "exact_k_sample",
]

# Sampling rates are expressed in permyriad (1/10000) so the keep
# decision stays in exact integer arithmetic in both engines.
PRECISION = 10_000


def sample_bucket(id_col: Column | str, salt: str) -> Column:
    """Deterministic bucket in [0, PRECISION) for a row id; NULL for a
    NULL id (null propagates through ``concat``, so a null-id row is
    never sampled — identically in both engines).

    DuckDB twin: ``ddb_sample_bucket`` below — same md5 bytes, same
    modulo, same value, same NULL behavior.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return portable_hash60(
        F.concat(F.lit(salt), F.lit(":"), c.cast("string"))
    ) % PRECISION


def ddb_sample_bucket(id_expr: str, salt: str) -> str:
    """DuckDB SQL twin of :func:`sample_bucket` (60-bit hash is
    non-negative, so plain ``%`` matches Spark's; ``||`` propagates
    NULL like Spark's concat — DuckDB's ``concat()`` would not)."""
    from alt_spark.functions.hashing import DDB_H60

    salt_sql = salt.replace("'", "''")
    key = f"('{salt_sql}' || ':' || CAST({id_expr} AS VARCHAR))"
    return f"({DDB_H60(key)} % {PRECISION})"


def stratified_sample(
    df: DataFrame,
    rates_permyriad: dict[str, int],
    stratum_col: str,
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its hash
    bucket falls under the stratum's rate (in 1/10000ths). Strata
    without a declared rate are dropped (rate 0) — a mixing config
    lists exactly what it wants.

    The rate map is a literal expression (broadcast-free; it lives in
    the task binary), the predicate is narrow, and the sampled subset
    is stable under re-partitioning, task retry, and cluster size.
    """
    for k, v in rates_permyriad.items():
        if not 0 <= v <= PRECISION:
            raise ValueError(f"rate for {k!r} must be in [0, {PRECISION}], got {v}")
    pairs: list[Column] = []
    for k, v in rates_permyriad.items():
        pairs.extend([F.lit(k), F.lit(int(v))])
    rate = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(stratum_col)), F.lit(0)
    )
    return df.filter(sample_bucket(id_col, salt) < rate)


def temperature_rates(
    df: DataFrame,
    stratum_col: str,
    budget_permyriad: int = 5000,
) -> DataFrame:
    """Derive per-stratum keep-rates that TEMPER the corpus mixture
    (alpha = 0.5): sampled composition follows sqrt(n_s) instead of n_s,
    boosting rare strata relative to proportional sampling — the
    standard temperature re-weighting for multilingual/multi-source
    training mixes. ``budget_permyriad`` caps the expected overall keep
    fraction.

    Returns (stratum, n, rate) where rate is in permyriad, ready for
    :func:`stratified_sample`'s keep predicate.

    Integer arithmetic end-to-end so the DuckDB oracle replays every
    rate exactly: weights are floor(sqrt(n)) (IEEE sqrt is correctly
    rounded, so floor matches bit-for-bit across engines; exact for any
    n < 2^52), and the budget→kept→rate chain is integer division only.
    Overflow bound: the widest intermediate is kept_total * w ≈
    N^1.5 * budget/PRECISION, which stays under 2^63 for corpora up to
    ~3e12 rows at a half-budget — beyond that, derive rates on a
    sampled count table (the rates only need relative sizes). alpha
    other than 0.5 would
    need pow() with a cross-engine rounding caveat; sqrt is the common
    production choice and the exactness-safe one.

    Shape at 100 TB: one count per stratum (bounded groupBy), a 1-row
    total frame, and a stratum-sized rate table — everything after the
    count is broadcast-scale.
    """
    if not 0 <= budget_permyriad <= PRECISION:
        raise ValueError(
            f"budget_permyriad must be in [0, {PRECISION}], got {budget_permyriad}"
        )
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("n"))
    w = counts.withColumn("w", F.floor(F.sqrt(F.col("n"))).cast("long"))
    tot = w.agg(F.sum("w").alias("tw"), F.sum("n").alias("tn"))
    return (
        w.crossJoin(F.broadcast(tot))
        .withColumn(
            "rate",
            F.least(
                F.lit(PRECISION).cast("long"),
                F.expr(
                    f"(({PRECISION} * ((((tn * {int(budget_permyriad)}) div {PRECISION}) * w) div tw)) div n)"
                ),
            ),
        )
        .select(stratum_col, "n", "rate")
    )


def target_mixture_rates(
    df: DataFrame,
    stratum_col: str,
    target_permyriad: dict[str, int],
    weight_col: str,
) -> DataFrame:
    """Derive per-stratum keep-rates that hit an EXOGENOUS target
    mixture ("20% code, 5% forum, ...") with the largest achievable
    corpus: the classic rebalance a training run applies when the
    declared recipe disagrees with what crawling actually produced.
    Complements :func:`temperature_rates` (which derives the target
    FROM the corpus) — here the target is a config literal and the
    corpus is cut down to match it.

    The binding constraint is the BOTTLENECK stratum: the achievable
    total is ``T = min_s floor(tok_s * PRECISION / share_s)`` — any
    larger corpus would need more of stratum argmin than exists (no
    upsampling in a keep/drop sampler). Then ``planned_s =
    floor(share_s * T / PRECISION)`` and ``rate_s = min(PRECISION,
    floor(planned_s * PRECISION / tok_s))``. Integer division only, so
    a DuckDB oracle replays every derived number exactly; the one
    product ``tok_s * PRECISION`` stays under 2^63 for strata up to
    ~9e14 tokens (beyond that, derive rates on scaled-down counts —
    only ratios matter).

    Strata present in the corpus but absent from the target get rate 0
    (a mixing config lists exactly what it wants — the
    ``stratified_sample`` contract). A DECLARED stratum with no corpus
    rows at all RAISES at action time (assert_true guard, the q94
    union-branch device): the recipe is unachievable — zero mass of a
    declared stratum binds T to 0 when the rows exist with zero weight,
    so a stratum that is entirely absent must not silently
    UN-constrain the min and ship a mixture that violates the declared
    recipe (ADVICE r8: the two adjacent degenerate cases were
    inconsistent — zero-weight dropped the whole corpus while
    fully-missing kept everything else at full rate).

    Returns (stratum, tok, planned_tok, rate) — ``tok`` the observed
    weight mass, ``planned_tok`` the post-sampling plan the rate aims
    at. Shape at 100 TB: one bounded groupBy for the per-stratum mass,
    a 1-row broadcast min, and a stratum-sized rate table; the keep
    predicate itself stays the narrow scan-local ``sample_bucket``
    filter.
    """
    tot_share = sum(target_permyriad.values())
    if tot_share != PRECISION:
        raise ValueError(
            f"target shares must sum to {PRECISION} permyriad, got {tot_share}"
        )
    for k, v in target_permyriad.items():
        if not 0 < v <= PRECISION:
            raise ValueError(f"share for {k!r} must be in (0, {PRECISION}], got {v}")
    pairs: list[Column] = []
    for k, v in target_permyriad.items():
        pairs.extend([F.lit(k), F.lit(int(v))])
    share = F.element_at(F.create_map(*pairs), F.col(stratum_col))
    counts = (
        df.groupBy(stratum_col)
        # coalesce: a stratum whose rows ALL carry NULL weight must
        # behave exactly like the zero-weight stratum (tok=0 binds the
        # achievable total to 0) — a bare sum() is NULL there, and a
        # NULL tok would silently UN-constrain the min below exactly
        # like the fully-missing stratum the guard exists to catch.
        # (Review finding, r9.)
        .agg(F.coalesce(F.sum(weight_col), F.lit(0)).cast("long").alias("tok"))
        .withColumn("share", share)
    )
    # Achievable total over DECLARED strata only; undeclared strata
    # (share NULL) don't constrain the mix — they are dropped outright.
    tot = counts.filter(F.col("share").isNotNull()).agg(
        F.min(F.expr(f"(tok * {PRECISION}) div share")).alias("t_total")
    )
    # Loud missing-stratum guard (ADVICE r8): a declared stratum with
    # zero corpus rows contributes nothing to the min above, so without
    # this the output would silently violate the declared recipe (other
    # strata kept at full rate with 0% of the missing one). Empty
    # zero-row branch when healthy; action-time raise when not.
    declared = F.array(*[F.lit(k) for k in target_permyriad])
    missing = F.array_sort(
        F.array_except(declared, F.collect_set(F.col(stratum_col)))
    )
    guard = (
        counts.agg(missing.alias("__missing"))
        .filter(
            F.assert_true(
                F.size("__missing") == 0,
                F.concat(
                    F.lit(
                        "target_mixture_rates: declared strata absent "
                        "from corpus (recipe unachievable): "
                    ),
                    F.array_join(F.col("__missing"), ", "),
                ),
            ).isNotNull()
        )
        .select(
            F.lit(None).cast("string").alias(stratum_col),
            F.lit(None).cast("long").alias("tok"),
            F.lit(None).cast("long").alias("planned_tok"),
            F.lit(None).cast("long").alias("rate"),
        )
    )
    return guard.unionByName(
        counts.crossJoin(F.broadcast(tot))
        .withColumn(
            "planned_tok",
            F.when(
                F.col("share").isNotNull(),
                F.expr(f"(share * t_total) div {PRECISION}"),
            ).otherwise(F.lit(0).cast("long")),
        )
        .withColumn(
            "rate",
            # greatest(tok, 1): a declared stratum whose rows all carry
            # zero weight has tok=0; a bare `div tok` is NULL (ANSI
            # off) and F.least SKIPS nulls, silently producing
            # rate=PRECISION (keep-all) instead of 0 — and the DuckDB
            # twin would error on //0. planned_tok is 0 there (its
            # tok*PRECISION div share contributes 0 to the min), so
            # the guarded division correctly yields rate 0. (Review
            # finding, r8.)
            F.least(
                F.lit(PRECISION).cast("long"),
                F.expr(f"(planned_tok * {PRECISION}) div greatest(tok, 1)"),
            ),
        )
        .select(stratum_col, "tok", "planned_tok", "rate")
    )


def cdf_buckets(
    counts: DataFrame,
    score_col: str,
    cnt_col: str,
    k: int = 3,
) -> DataFrame:
    """Tie-coherent CDF buckets over PRE-AGGREGATED score counts:
    appends ``bucket = (k * c_lt) div n`` in ``[0, k)``, where ``c_lt``
    is the total count of rows scoring strictly below this row's score
    and ``n`` the grand total — the RANGE-frame form of ntile(k).
    Every row with the same score lands in the same bucket (unlike
    ntile, which splits tie groups arbitrarily by physical row order —
    non-deterministic under repartitioning), so bucket sizes deviate
    from n/k exactly where ties straddle a cut, and nowhere else. This
    is the CCNet head/middle/tail device: bucket docs by a
    corpus-relative quality score without trusting any float threshold.

    The input may carry MULTIPLE rows per score (e.g. per-(source,
    score) partials): the RANGE frame sums counts by score value, so
    sibling rows of a score see the same ``c_lt`` — callers keep their
    other grouping columns and never need a separate histogram pass.

    Integer arithmetic end-to-end, so a DuckDB oracle replays bucket
    assignments exactly (``(k * c_lt) // n`` over the same window).
    Overflow bound: ``k * c_lt < k * n`` — safe for any corpus
    countable in int64.

    Scale shape: the input is an aggregate (rows bounded by grouping
    cardinality x distinct scores), so the single-partition window
    here never touches corpus rows. Callers bucket on a BOUNDED score
    — e.g. a permyriad in [0, 10000] — keeping the window provably
    tiny at any corpus size; the corpus itself is never globally
    sorted (the distributed exact-rank alternative for unbounded
    scores is operators/rank.global_row_number).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql.window import Window

    w = Window.orderBy(score_col)
    c_lt = F.coalesce(
        F.sum(cnt_col).over(w.rangeBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    n = F.sum(cnt_col).over(
        w.rangeBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    # greatest(__n, 1): a degenerate all-zero-count input must yield
    # bucket 0 everywhere, not NULL buckets (Spark's div returns NULL on
    # zero with ANSI off) — the token_budget_plan guard, same rationale.
    return counts.withColumns(
        {
            "__kc": (F.lit(k).cast("long") * c_lt),
            "__n": n.cast("long"),
        }
    ).withColumn("bucket", F.expr("__kc div greatest(__n, 1)")).drop(
        "__kc", "__n"
    )


def _check_split_rates(train_permyriad: int, val_permyriad: int) -> None:
    if train_permyriad < 0 or val_permyriad < 0:
        raise ValueError("split rates must be non-negative")
    if train_permyriad + val_permyriad > PRECISION:
        raise ValueError(
            f"train + val rates exceed {PRECISION}: "
            f"{train_permyriad} + {val_permyriad}"
        )


def split_assignment(
    group_col: Column | str,
    salt: str = "split",
    train_permyriad: int = 9000,
    val_permyriad: int = 500,
) -> Column:
    """'train' / 'val' / 'test' assignment from a GROUP id's hash
    bucket — the leakage-free split device: pass the near-dup CLUSTER
    id (a connected-components label, or the doc's own id for
    singletons) and every member of a cluster lands in the same split,
    so no near-duplicate of a held-out document can reach the training
    set. Splitting on raw doc ids — the naive form — leaks: near-dup
    pairs straddle splits and the eval set is partially memorized.

    Same determinism contract as :func:`sample_bucket` (retry-safe,
    partitioning-independent, cross-engine exact); a NULL group id
    yields a NULL split (callers coalesce the group id first).
    ``ddb_split_assignment`` is the DuckDB twin.
    """
    _check_split_rates(train_permyriad, val_permyriad)
    b = sample_bucket(group_col, salt)
    return (
        F.when(b < train_permyriad, F.lit("train"))
        .when(b < train_permyriad + val_permyriad, F.lit("val"))
        .when(b.isNotNull(), F.lit("test"))
    )


def ddb_split_assignment(
    group_expr: str,
    salt: str = "split",
    train_permyriad: int = 9000,
    val_permyriad: int = 500,
) -> str:
    """DuckDB SQL twin of :func:`split_assignment` (same hash, same
    cuts, same NULL propagation)."""
    _check_split_rates(train_permyriad, val_permyriad)
    b = ddb_sample_bucket(group_expr, salt)
    return (
        f"(CASE WHEN {b} < {train_permyriad} THEN 'train'"
        f" WHEN {b} < {train_permyriad + val_permyriad} THEN 'val'"
        f" WHEN {b} IS NOT NULL THEN 'test' END)"
    )


def epoch_expand(
    df: DataFrame,
    plan: DataFrame,
    stratum_col: str,
    id_col: str,
    tokens_col: str,
    salt: str = "epoch",
) -> DataFrame:
    """MATERIALIZE a :func:`token_budget_plan`: emit each document once
    per planned epoch, so the plan's ``planned_tok`` is actually drawn —
    the step r6 left open (``epochs_permyriad`` can prescribe up to the
    epoch cap, but ``stratified_sample`` can only keep <= 1x).

    For a stratum with ``epochs_permyriad = e``:

    - **Full copies**: every document is emitted ``e div 10000`` times
      (``copy`` = 1..n_full) — a full epoch is a complete pass by
      definition, so these are exact replicas, no sampling involved.
    - **Fractional remainder**: the remaining
      ``rem = planned_tok - n_full * avail_tok`` tokens are drawn as a
      deterministic PREFIX of the stratum in ``(bucket, id)`` order
      (bucket = the md5 sample bucket, a deterministic shuffle of the
      stratum): a document joins copy ``n_full + 1`` iff the token sum
      of all documents BEFORE it is still under ``rem``. The draw
      therefore lands within one document of the plan:
      ``planned_tok <= drawn_tok < planned_tok + max(doc tokens)``
      (exactly ``planned_tok`` when rem = 0) — property-tested, and the
      whole multiset is integer/hash-deterministic, so a DuckDB oracle
      replays it row by row (q79).

    Scale shape: the plan join is broadcast (stratum-sized). The prefix
    cut never sorts a stratum in one partition: per-(stratum, bucket)
    token partials (bounded by |strata| x 10001 — same device as
    ``cdf_buckets``) give each bucket its tokens-before via a window
    over partials; the row-level cumsum then partitions by (stratum,
    bucket) — 10000x finer than the stratum, so no skewed partition
    exists even for a 30 TB stratum. Deterministic under task retry
    and repartitioning (no rand()); duplicate-id rows violate the
    contract (ids must be unique within a stratum, NULL ids excluded
    by the hash's NULL propagation).

    Returns ``df``'s columns plus ``copy`` (long, 1-based). Strata
    absent from the plan are dropped (a plan lists what it wants —
    the ``stratified_sample`` convention). Raises if ``df`` already
    carries ``copy`` or one of the helper columns (review finding: a
    silent duplicate column name would poison every downstream
    reference — the loud guard is the export sink's shard_col
    convention).
    """
    clash = {"copy", "__nf", "__rem", "__b"} & set(df.columns)
    if clash:
        raise ValueError(
            f"epoch_expand output/helper column(s) {sorted(clash)} "
            "already exist in the input frame; rename them first"
        )
    nf = F.expr(f"epochs_permyriad div {PRECISION}")
    p = plan.select(
        stratum_col,
        nf.alias("__nf"),
        (F.col("planned_tok") - nf * F.col("avail_tok")).alias("__rem"),
    )
    joined = df.join(F.broadcast(p), stratum_col)
    full = joined.filter(F.col("__nf") >= 1).select(
        *df.columns,
        F.explode(
            F.sequence(F.lit(1).cast("long"), F.col("__nf"))
        ).alias("copy"),
    )
    from pyspark.sql.window import Window

    tok = F.col(tokens_col).cast("long")
    withb = joined.withColumn("__b", sample_bucket(id_col, salt))
    bsum = withb.groupBy(stratum_col, "__b").agg(F.sum(tok).alias("__btok"))
    wpart = (
        Window.partitionBy(stratum_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bcum = bsum.select(
        stratum_col,
        "__b",
        F.coalesce(F.sum("__btok").over(wpart), F.lit(0).cast("long")).alias(
            "__cb"
        ),
    )
    wrow = (
        Window.partitionBy(stratum_col, "__b")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frac = (
        withb.join(F.broadcast(bcum), [stratum_col, "__b"])
        .withColumn(
            "__before",
            F.col("__cb")
            + F.coalesce(F.sum(tok).over(wrow), F.lit(0).cast("long")),
        )
        .filter(F.col("__before") < F.col("__rem"))
        .select(*df.columns, (F.col("__nf") + F.lit(1)).cast("long").alias("copy"))
    )
    return full.unionByName(frac)


def token_budget_plan(
    df: DataFrame,
    stratum_col: str,
    tokens_col: str,
    budget_tokens: int,
    epoch_cap_permyriad: int = 40_000,
) -> DataFrame:
    """Per-stratum training-token plan: how many tokens each source
    contributes to a run with a global token budget and an epoch cap —
    the curriculum-planning step between mixing weights and the actual
    sampler (the LLaMA/Gopher data-mixture table: sources are tempered
    by sqrt, oversampled up to an epoch cap, never beyond it).

    Returns one row per stratum:

    - ``n_docs``, ``avail_tok``  what the stratum has;
    - ``weight``                 floor(sqrt(avail_tok)) — alpha = 0.5
      tempering, same exactness argument as :func:`temperature_rates`;
    - ``target_tok``             the budget share, (budget * w) div sum_w;
    - ``epochs_permyriad``       min(cap, (10000 * target) div avail) —
      how many passes over the stratum the plan implies, capped so a
      tiny source is never repeated into memorization;
    - ``planned_tok``            (avail * epochs_permyriad) div 10000 —
      what the run will actually draw after the cap binds.

    Integer arithmetic end-to-end (every column is oracle-exact). The
    one corpus-scale product, budget * weight, runs in DECIMAL(38,0)
    (`div` returns BIGINT; target <= budget fits long) — at 100 T
    tokens x sqrt(1e14) weights the int64 product would wrap. Remaining
    bound: avail_tok * epoch_cap must stay under 2^63 — holds to ~2e14
    tokens PER STRATUM at the default cap; beyond that, plan on a
    sampled count table (the plan only needs relative sizes).

    Shape at 100 TB: one bounded groupBy for the per-stratum sums, a
    1-row totals frame (broadcast), and a stratum-sized output — the
    plan is a driver-readable table, not a data pass.
    """
    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    if epoch_cap_permyriad < 0:
        raise ValueError(
            f"epoch_cap_permyriad must be >= 0, got {epoch_cap_permyriad}"
        )
    counts = df.groupBy(stratum_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col(tokens_col).cast("long")).alias("avail_tok"),
    )
    w = counts.withColumn(
        "weight", F.floor(F.sqrt(F.col("avail_tok"))).cast("long")
    )
    tot = w.agg(F.sum("weight").alias("tw"))
    return (
        w.crossJoin(F.broadcast(tot))
        .withColumn(
            "target_tok",
            # greatest(tw, 1): an all-empty corpus (every weight 0)
            # must yield an all-zero plan identically in both engines —
            # unguarded, Spark's div returns NULL (ANSI off) while
            # DuckDB raises division-by-zero.
            F.expr(
                f"(CAST({int(budget_tokens)} AS DECIMAL(38,0)) * weight)"
                " div greatest(tw, 1)"
            ),
        )
        .withColumn(
            "epochs_permyriad",
            F.least(
                F.lit(int(epoch_cap_permyriad)).cast("long"),
                F.expr(
                    f"({PRECISION} * target_tok) div greatest(avail_tok, 1)"
                ),
            ),
        )
        .withColumn(
            "planned_tok",
            F.expr(f"(avail_tok * epochs_permyriad) div {PRECISION}"),
        )
        .select(
            stratum_col,
            "n_docs",
            "avail_tok",
            "weight",
            "target_tok",
            "epochs_permyriad",
            "planned_tok",
        )
    )


def exact_k_sample(
    df: DataFrame,
    k: int,
    stratum_col: str,
    id_col: str = "doc_id",
    salt: str = "holdout",
    oversample: float | None = 4.0,
) -> DataFrame:
    """Exactly min(k, n) rows per stratum, deterministically: the k
    smallest rows under the total order (60-bit portable hash of
    ``salt:id``, id) within each stratum. The eval-carve complement of
    :func:`stratified_sample` — a fractional rate cannot promise
    "exactly 25 held-out docs per language", this does, and re-runs/
    retries/repartitioning always select the same rows. Returns the
    selected rows plus ``hkey`` (the hash sort key — oracle twin
    ``DDB_H60``) and ``rank`` (1-based within the stratum). Rows with a
    NULL id or NULL stratum are excluded up front in BOTH paths (a NULL
    id has no hash, a NULL stratum no carve — the ``sample_bucket``
    NULL story), keeping the pruned and plain paths row-identical.

    Scale shape (``oversample`` set, the default): a window over a
    whole 100 TB stratum is one task, so first prune with a per-stratum
    hash threshold ``~2^60 * oversample*k / n`` (from one bounded count
    aggregate, broadcast back); every pruned row sorts AFTER every
    survivor — the hash is the leading sort key — so the top-k of the
    ~oversample*k survivors equals the global top-k whenever
    >= min(k, n) rows survive. The threshold cuts in the full 60-bit
    hash space (an earlier permyriad-bucket form floored at n/10000
    survivors for billion-row strata — review finding), computed in
    double precision: the ~1e-16 relative error is absorbed by the
    oversample margin, and exactness never depends on it — survival is
    Binomial(n, ~oversample*k/n), the deficit probability at
    oversample 4 is < e^-k per stratum (Chernoff), and a deficit is
    never silent: a per-stratum ``assert_true`` guard, attached as a
    UNION branch that emits zero rows when healthy, raises at action
    time naming the stratum (a JOINED guard would be skipped by AQE's
    empty-side join elimination exactly when the starved side IS
    empty); re-run with a larger ``oversample``. ``oversample=None``
    skips the prefilter entirely (exact by construction,
    single-task-per-stratum window — the small-data path).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if oversample is not None and oversample <= 0:
        raise ValueError(f"oversample must be positive, got {oversample}")
    import math

    from pyspark.sql.window import Window

    from alt_spark.functions.hashing import portable_hash60

    df = df.filter(
        F.col(id_col).isNotNull() & F.col(stratum_col).isNotNull()
    )
    hkey = portable_hash60(
        F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))
    )
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(F.col("hkey").asc(), F.col(id_col).asc())
    )
    ranked_cols = df.columns + ["hkey", "rank"]
    if oversample is None:
        ranked = df.withColumn("hkey", hkey).withColumn(
            "rank", F.row_number().over(w)
        )
        return ranked.filter(F.col("rank") <= k).select(*ranked_cols)

    hspace = 1 << 60
    target_rows = max(1, math.ceil(oversample * k))
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("__n"))
    thresholds = counts.withColumn(
        "__t",
        F.when(F.col("__n") <= target_rows, F.lit(hspace)).otherwise(
            F.least(
                F.lit(hspace),
                F.ceil(
                    F.lit(float(hspace)) * target_rows / F.col("__n")
                ).cast("long"),
            )
        ),
    )
    survivors = (
        df.withColumn("hkey", hkey)
        .join(F.broadcast(thresholds), stratum_col)
        .filter(F.col("hkey") < F.col("__t"))
    )
    ranked = survivors.withColumn("rank", F.row_number().over(w))
    selected = ranked.filter(F.col("rank") <= k)
    surv_counts = survivors.groupBy(stratum_col).agg(
        F.count("*").alias("__m")
    )
    out = selected.select(*ranked_cols)
    guard_rows = (
        counts.join(surv_counts, stratum_col, "left")
        .filter(
            F.assert_true(
                F.coalesce(F.col("__m"), F.lit(0))
                >= F.least(F.lit(k).cast("long"), F.col("__n")),
                F.concat(
                    F.lit(
                        "exact_k_sample hash prefilter starved stratum "
                    ),
                    F.col(stratum_col).cast("string"),
                    F.lit(
                        f" (oversample={oversample}); re-run with a larger"
                        " oversample or oversample=None"
                    ),
                ),
            ).isNotNull()
        )
        .select(
            *[
                F.lit(None).cast(out.schema[c].dataType).alias(c)
                for c in ranked_cols
            ]
        )
    )
    return out.unionByName(guard_rows)
