"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.L / K2 — the escape hatch when built-in streaming
aggregations can't express the fold).

The built-in path (streaming groupBy / the foreachBatch projector)
covers the reference's commutative folds; applyInPandasWithState is the
declared surface for folds that need arbitrary per-key state machines —
the knowledge-sovereign projector's non-commutative `set` ops
(projector.go:53-69) would live here: state is an explicit typed tuple,
updated per micro-batch in arrival order, emitted in update mode.

Scale shape: state is partitioned by key across executors exactly like
built-in stateful aggs; each micro-batch hands the kernel Arrow batches
of that key's new rows only.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["running_user_stats", "running_user_stats_tws"]

_OUT_SCHEMA = "user_id long, n_events long, max_value double, last_event_id long"
_STATE_SCHEMA = "n long, mx double, last long"


def _fold(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, mx, last = state.get if state.exists else (0, float("-inf"), -1)
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
            # last-by-seq, the max_by(event_id) analog: rows in a batch
            # may be unordered, so take the max id's row explicitly.
            last = max(last, int(pdf["event_id"].max()))
    state.update((n, mx, last))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "max_value": [mx],
            "last_event_id": [last],
        }
    )


def running_user_stats(stream: DataFrame) -> DataFrame:
    """Per-user running (count, max, last-by-seq) over a streaming frame,
    one updated row emitted per key per micro-batch."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _fold,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_stats_tws(stream: DataFrame) -> DataFrame:
    """`running_user_stats` on Spark 4's transformWithState API — the
    successor to applyInPandasWithState (SPARK-49564): explicit typed
    state variables on a processor handle instead of one state tuple,
    timers and TTL available per variable, RocksDB-backed state store.
    Same fold, same output schema; parity with the legacy surface AND
    the batch aggregate is test-enforced
    (tests/test_streaming.py::test_transform_with_state_parity).

    Requires the RocksDB state store provider (bundled with Spark); the
    caller's session conf must set
    spark.sql.streaming.stateStore.providerClass accordingly — the test
    pins it. ALSO requires google.protobuf (the JVM↔Python state server
    protocol); this container ships without it, so the parity test
    skips here with the probe recorded — run it where protobuf exists.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Processor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, mx, last = (
                self._agg.get() if self._agg.exists() else (0, float("-inf"), -1)
            )
            for pdf in rows:
                if len(pdf):
                    n += len(pdf)
                    mx = max(mx, float(pdf["value"].max()))
                    last = max(last, int(pdf["event_id"].max()))
            self._agg.update((n, mx, last))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "max_value": [mx],
                    "last_event_id": [last],
                }
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=Processor(),
        outputStructType=_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
