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
"""

from __future__ import annotations

from collections import OrderedDict
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession


def _session_alive(s: SparkSession) -> bool:
    try:
        return not s.sparkContext._jsc.sc().isStopped()
    except Exception:
        return False


class DataFramePlanCache:
    """Bounded per-session LRU: KEY DataFrame's canonical plan -> a
    derived VALUE DataFrame (possibly the key itself, persisted).

    Mapping-style introspection (``len``, iteration over keys,
    ``values()``, ``clear()``) is exposed for tests and plan audits.
    """

    def __init__(self, max_entries: int = 4, unpersist_on_evict: bool = False):
        # key -> (session, key_df, value_df);
        # key = (id(session), semanticHash, extra-params tuple)
        self._d: OrderedDict[
            tuple, tuple[SparkSession, DataFrame, DataFrame]
        ] = OrderedDict()
        self._max = max_entries
        self._unpersist = unpersist_on_evict

    def _drop(self, k: tuple) -> None:
        sess, _kdf, vdf = self._d.pop(k)
        if self._unpersist and _session_alive(sess):
            try:
                vdf.unpersist()
            except Exception:
                pass

    def _sweep_dead(self) -> None:
        dead = [k for k, (s, _, _) in self._d.items() if not _session_alive(s)]
        for k in dead:
            # Dead session: its blocks are already gone; never call into it.
            self._d.pop(k)

    def get(self, key_df: DataFrame, extra: tuple = ()) -> DataFrame | None:
        """``extra``: hashable non-plan key components (operator
        parameters) — two calls over the same input plan with different
        parameters must not share an entry."""
        self._sweep_dead()
        sess = key_df.sparkSession
        k = (id(sess), key_df.semanticHash(), extra)
        ent = self._d.get(k)
        if ent is None:
            return None
        _, kdf, vdf = ent
        if not key_df.sameSemantics(kdf):
            self._drop(k)  # 32-bit collision: release before slot reuse
            return None
        self._d.move_to_end(k)
        return vdf

    def put(self, key_df: DataFrame, value_df: DataFrame, extra: tuple = ()) -> None:
        self._sweep_dead()
        sess = key_df.sparkSession
        k = (id(sess), key_df.semanticHash(), extra)
        if k in self._d:
            self._drop(k)
        self._d[k] = (sess, key_df, value_df)
        while len(self._d) > self._max:
            self._drop(next(iter(self._d)))

    # Mapping-style views (tests/plan audits).
    def __len__(self) -> int:
        return len(self._d)

    def __iter__(self) -> Iterator[tuple]:
        return iter(self._d)

    def values(self) -> list[DataFrame]:
        return [vdf for (_, _, vdf) in self._d.values()]

    def clear(self) -> None:
        for k in list(self._d):
            self._drop(k)
