"""Session-scoped bounded LRU of DataFrames keyed by plan semantics.

Two operators keep a small registry of expensive derived frames so that
repeated calls against the same logical input reuse one materialization
instead of replaying the lineage: the char-LM model table
(operators/lm.py — two consumers of a trained model per scoring call)
and the converged connected-components label table (operators/graph.py
— q73 and q77 share an identical pair graph + closure). Both caches
share this implementation.

Design points, each one a past review finding:

- **Keyed by (session, semanticHash) and swept per access.** A
  process-global cache keyed only by plan semantics outlives its
  SparkSession (the r6 ADVICE item): after a session stop/restart a hit
  would hand back a frame bound to a dead JVM context, and calling
  sameSemantics/unpersist on it can raise. Entries are scoped to the
  owning session and entries of stopped sessions are dropped — their
  blocks died with the session, so there is nothing to unpersist.
- **semanticHash collisions are confirmed away.** The hash is 32-bit;
  a hit re-checks full plan equality with ``sameSemantics`` (Spark's
  CacheManager compares canonical plans for the same reason), so a
  collision can never hand back a DIFFERENT input's derived frame. On
  collision the newer entry evicts the colliding one.
- **Bounded LRU with eviction release.** Total cached state is capped
  at ``max_entries`` frames; evictees are optionally unpersisted
  (persisted-frame caches) — an evicted frame some lazy plan still
  references is simply recomputed, correctness unaffected.
- **Input-file fingerprint in the ENTRY, tri-state matched (r7
  review, revised after a suite-order bug).** ``semanticHash`` keys on
  scan PATHS, so overwriting a dataset in place between two calls
  would otherwise serve stale derived frames; each entry therefore
  carries a digest of the concrete input files (path, size, mtime
  where stat-able) and a hit requires digests to AGREE — regeneration
  drops the entry and misses. The digest must not live in the KEY:
  ``Dataset.inputFiles`` reflects CACHE SUBSTITUTION, returning []
  whenever any ancestor of the scan is block-cached (and the empty
  answer is memoized per Dataset even past clearCache), so one
  fingerprint-in-key design made the key flip with unrelated tests'
  ``.cache()``/``clearCache()`` calls — the suite-order-dependent miss
  CORRECTNESS hunted in r7. An empty listing is recorded as the
  OPAQUE state; matching is asymmetric (rationale at the rule in
  ``get``): a stored-opaque entry matches any later state, while a
  stored digest that cannot be re-verified (current listing opaque)
  misses and recomputes. A listing that raises (twice) keeps the
  frame uncacheable for that call — recompute, never stale.
"""

from __future__ import annotations

import hashlib
import os
import threading
from collections import OrderedDict
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

# Test-only hermetic switch (operators/lm.SCORE_MATERIALIZE generalized
# to every plan-keyed cache): plan audits assert properties of RAW
# lineage (fused-scan shape, exchange counts, broadcast placement); a
# checkpoint barrier — even a lazy one — replaces everything upstream
# with a LogicalRDD and makes those pins vacuous, and a PROMOTED entry
# served to the audit's second construction of the same shape would do
# exactly that. With MATERIALIZE False, ``get_or_materialize`` returns
# the raw frame without caching and the operator-local inner checkpoints
# (MinHash signatures, incremental band rows, q100's survivor manifest)
# are skipped, so building any query frame is a pure plan
# transformation. Production paths never touch it; tests/test_plans.py
# flips it off for the module.
MATERIALIZE = True

# Named-cache registry for instrumentation: every cache constructed
# with a ``name`` lands here, and ``cache_stats()`` snapshots hit/miss/
# put/eviction counters across all of them — read by bench.py so
# suite-order effects (who paid a materialization, who reused it) are
# recorded per round instead of reconstructed by archaeology (the
# q66/q70/q72 r7 regression took exactly that archaeology).
_NAMED: dict[str, "DataFramePlanCache"] = {}


def clear_all() -> None:
    """Drop (and unpersist) every entry of every named cache — the
    cold-configuration lever for bench A/B runs: a query re-run after
    this pays its own materializations exactly like a first-in-suite
    position would, on the same box in the same JVM."""
    for c in _NAMED.values():
        c.clear()


def cache_stats(reset: bool = False) -> dict[str, dict[str, int]]:
    """Snapshot (optionally reset) counters of every named cache."""
    out = {}
    for name, c in _NAMED.items():
        out[name] = dict(c.stats)
        out[name]["entries"] = len(c)
        if reset:
            c.stats = dict.fromkeys(c.stats, 0)
    return out


def _session_alive(s: SparkSession) -> bool:
    try:
        return not s.sparkContext._jsc.sc().isStopped()
    except Exception:
        return False


# Cap on per-file stat calls when fingerprinting a plan's inputs: the
# suite's corpora are a handful of part files; a pathological listing
# degrades to path-names-only for the overflow (still catches most
# regeneration — parquet part names carry a fresh writer UUID per
# write job) instead of paying N driver-side stats.
_FP_MAX_STAT = 256


# Sentinel fingerprint: the listing came back EMPTY, which in practice
# means cache substitution hid the file scans (see module docstring) —
# treated as matching any digest at lookup time.
_FP_OPAQUE = "<opaque>"


def _input_fingerprint(df: DataFrame) -> str | None:
    """Digest of the plan's concrete input files (path, size, mtime).

    A plan's ``semanticHash`` keys on the PATHS in its scan relations,
    so a dataset overwritten in place between two calls would hit a
    plan-keyed cache with stale results (the r7 review finding against
    the LM score cache). The driver-side file listing — plus a local
    ``stat`` when the scheme allows — turns any regeneration into a
    detectable change. Remote schemes fall back to path names; a
    listing failure returns None (caller disables caching for that
    frame rather than risking staleness); an EMPTY listing returns
    ``_FP_OPAQUE`` (cache-substituted subtree — see module docstring,
    matches any stored digest).

    RESIDUAL WINDOW (r7 ADVICE, documented rather than closable): the
    digest is (path, size, mtime_ns), so an in-place rewrite that
    preserves byte count AND restores mtime to the nanosecond (an
    mtime-preserving restore, ``rsync -t`` onto an identical-length
    file, a clock-skewed writer landing on the same ns) is
    indistinguishable from no change and would serve the stale frame.
    Spark's own CacheManager/FileIndex freshness checks share exactly
    this blind spot (modificationTime + size), so a pipeline whose
    storage layer can do this must version its PATHS (the parquet
    writer's per-job UUID part names do this for free — any normal
    rewrite changes names). Past the stat budget the digest degrades
    to a file-count + stride-sampled stat + path-name form: an
    in-place rewrite of an unsampled file with an identical part name
    is undetectable in that regime."""
    try:
        files = sorted(df.inputFiles())
    except Exception:
        # One retry: a transient Py4J hiccup under heavy load must not
        # silently mark the frame uncacheable.
        try:
            files = sorted(df.inputFiles())
        except Exception:
            return None
    if not files:
        return _FP_OPAQUE
    # File COUNT is always part of the digest (free), so adding or
    # removing part files is detected even past the stat budget.
    parts = [f"<n={len(files)}>"]
    # Spread the stat budget EVENLY over the sorted listing instead of
    # statting a prefix (r7 ADVICE): a regeneration that rewrites only
    # late part files in a >_FP_MAX_STAT listing would be invisible to
    # a first-N policy but lands on the stride sample with probability
    # ~ rewritten_fraction * budget.
    stride = max(1, -(-len(files) // _FP_MAX_STAT))  # ceil division
    for i, p in enumerate(files):
        if i % stride == 0 and (p.startswith("file:") or p.startswith("/")):
            local = p.split(":", 1)[1] if p.startswith("file:") else p
            try:
                st = os.stat(local)
                parts.append(f"{p}|{st.st_size}|{st.st_mtime_ns}")
                continue
            except OSError:
                pass
        parts.append(p)
    return hashlib.md5("\n".join(parts).encode()).hexdigest()


class DataFramePlanCache:
    """Bounded per-session LRU: KEY DataFrame's canonical plan -> a
    derived VALUE DataFrame (possibly the key itself, persisted).

    Mapping-style introspection (``len``, iteration over keys,
    ``values()``, ``clear()``) is exposed for tests and plan audits.
    """

    def __init__(
        self,
        max_entries: int = 4,
        unpersist_on_evict: bool = False,
        fingerprint_inputs: bool = True,
        name: str | None = None,
    ):
        # key -> (session, key_df, value_df, input-file fingerprint);
        # key = (id(session), semanticHash, extra-params tuple).
        # The fingerprint is entry STATE, not key material — see the
        # module docstring for why (cache substitution makes the
        # listing session-state-dependent).
        self._d: OrderedDict[
            tuple, tuple[SparkSession, DataFrame, DataFrame, str]
        ] = OrderedDict()
        # Concurrent-job callers (guide §2.6 thread pools — q146's
        # overlapped PQ fits) get/put from driver threads; the LRU's
        # compound mutations (sweep + drop + move_to_end) are not
        # atomic under the GIL, so serialize them. Uncontended cost is
        # nanoseconds against py4j-milliseconds work per call.
        self._lock = threading.RLock()
        self._max = max_entries
        self._unpersist = unpersist_on_evict
        self._fingerprint = fingerprint_inputs
        # Why the most recent get() missed — purely diagnostic, read by
        # tests chasing intermittent misses (a miss is always SAFE —
        # recompute — but an unexplained one hides a key-stability bug).
        self.last_miss: str | None = None
        # Cumulative counters, exposed per-round by bench.py via
        # cache_stats(): a hit is a served reuse (one avoided
        # recompute), a put is a paid materialization, an eviction is
        # released capacity. ``misses`` counts only true lookups (a
        # definite cold miss), not the put() that follows.
        self.stats: dict[str, int] = {
            "hits": 0, "misses": 0, "puts": 0, "evictions": 0,
        }
        if name is not None:
            _NAMED[name] = self

    def _key(self, key_df: DataFrame, extra: tuple) -> tuple:
        return (id(key_df.sparkSession), key_df.semanticHash(), extra)

    def _fp(self, key_df: DataFrame) -> str | None:
        """Current fingerprint state; None ⇒ the frame is uncacheable
        right now (listing raised): get() misses and put() no-ops,
        which is always safe — the caller just recomputes."""
        if not self._fingerprint:
            return _FP_OPAQUE
        return _input_fingerprint(key_df)

    def _drop(self, k: tuple) -> None:
        sess, _kdf, vdf, _fp = self._d.pop(k)
        if self._unpersist and _session_alive(sess):
            try:
                vdf.unpersist()
            except Exception:
                pass

    def _sweep_dead(self) -> None:
        dead = [
            k for k, (s, *_) in self._d.items() if not _session_alive(s)
        ]
        for k in dead:
            # Dead session: its blocks are already gone; never call into it.
            self._d.pop(k)

    def get(self, key_df: DataFrame, extra: tuple = ()) -> DataFrame | None:
        """``extra``: hashable non-plan key components (operator
        parameters) — two calls over the same input plan with different
        parameters must not share an entry."""
        with self._lock:
            return self._get_locked(key_df, extra)

    def _get_locked(self, key_df: DataFrame, extra: tuple) -> DataFrame | None:
        self._sweep_dead()
        k = self._key(key_df, extra)
        ent = self._d.get(k)
        if ent is None:
            # Definite miss: skip the fingerprint entirely (review
            # finding — a cold build otherwise paid the inputFiles()
            # round-trip + stat sweep twice, here and again in put()).
            self.last_miss = (
                f"no entry for key={k!r}; cached keys={list(self._d)!r}"
            )
            self.stats["misses"] += 1
            return None
        fp = self._fp(key_df)
        if fp is None:
            self.last_miss = "uncacheable: inputFiles() listing failed"
            self.stats["misses"] += 1
            return None
        sess, kdf, vdf, stored_fp = ent
        if not key_df.sameSemantics(kdf):
            self._drop(k)  # 32-bit collision: release before slot reuse
            self.last_miss = f"semanticHash collision on key={k!r}"
            self.stats["misses"] += 1
            return None
        # Fingerprint match rule (asymmetric by design):
        # - digest == digest: inputs unchanged — hit.
        # - digest != digest: in-place regeneration — drop, miss.
        # - stored OPAQUE (entry was built while cache substitution hid
        #   the listing): matches any current state — during that epoch
        #   Spark's own block cache served the same snapshot, so the
        #   entry is exactly as fresh as Spark's answer was; this arm
        #   is what makes an unrelated .cache()/clearCache() pair a
        #   non-event instead of a permanent miss (the r7 suite bug).
        # - stored digest but current OPAQUE: the digest cannot be
        #   re-verified right now — miss WITHOUT dropping (files are
        #   probably unchanged; the recompute's put refreshes the entry
        #   under the opaque state). Costs one recompute per
        #   digest→substituted epoch transition and closes the masked-
        #   regeneration window where files were rewritten just before
        #   the subtree was block-cached.
        if stored_fp != fp and stored_fp != _FP_OPAQUE:
            if fp == _FP_OPAQUE:
                self.last_miss = (
                    "inputs hidden by cache substitution; stored digest "
                    f"unverifiable under key={k!r}"
                )
                self.stats["misses"] += 1
                return None
            self._drop(k)
            self.last_miss = f"input files changed under key={k!r}"
            self.stats["misses"] += 1
            return None
        if stored_fp == _FP_OPAQUE and fp != _FP_OPAQUE:
            # Upgrade: the entry was stored while cache substitution hid
            # the listing, but the files are visible NOW — pin the real
            # digest so a later in-place regeneration is detectable
            # (review finding: an opaque entry otherwise matched any
            # state forever, permanently masking regeneration).
            self._d[k] = (sess, kdf, vdf, fp)
        self._d.move_to_end(k)
        self.last_miss = None
        self.stats["hits"] += 1
        return vdf

    def put(self, key_df: DataFrame, value_df: DataFrame, extra: tuple = ()) -> None:
        with self._lock:
            self._sweep_dead()
            fp = self._fp(key_df)
            if fp is None:
                return
            k = self._key(key_df, extra)
            if k in self._d:
                self._drop(k)
            self._d[k] = (key_df.sparkSession, key_df, value_df, fp)
            self.stats["puts"] += 1
            while len(self._d) > self._max:
                self._drop(next(iter(self._d)))
                self.stats["evictions"] += 1

    def get_or_materialize(
        self,
        key_df: DataFrame,
        raw_df: DataFrame,
        extra: tuple = (),
    ) -> DataFrame:
        """Shared-materialization policy for expensive derived frames:
        the first request wraps ``raw_df`` in a LAZY localCheckpoint
        (construction stays plan-only — ADVICE r7; blocks materialize
        at the first ACTION, block-locked compute-once) and caches it;
        every later request for the same (key, inputs) shape returns
        the SAME frame and reads the blocks instead of recomputing.

        Lazy-always beats materialize-on-second-use here: for every
        cached shape in this engine the recompute (corpus scan +
        explode + shuffle) costs far more than the one-time block
        write, so charging a proven second consumer a full recompute
        (measured +15% on the sf0.01 suite in r8) loses to charging
        the first consumer the write. Shapes that are single-consumer
        BY CONSTRUCTION (the fused ``carry=`` scoring variant) should
        skip the cache entirely rather than pay the write — that is
        the caller's knowledge, not this cache's.

        With the hermetic ``MATERIALIZE`` switch off (plan-audit
        suites), returns ``raw_df`` untouched without consulting the
        cache.
        """
        if not MATERIALIZE:
            return raw_df
        hit = self.get(key_df, extra)
        if hit is not None:
            return hit
        ck = raw_df.localCheckpoint(eager=False)
        self.put(key_df, ck, extra)
        return ck

    # Mapping-style views (tests/plan audits).
    def __len__(self) -> int:
        return len(self._d)

    def __iter__(self) -> Iterator[tuple]:
        return iter(self._d)

    def values(self) -> list[DataFrame]:
        return [vdf for (_, _, vdf, _) in self._d.values()]

    def clear(self) -> None:
        with self._lock:
            for k in list(self._d):
                self._drop(k)
