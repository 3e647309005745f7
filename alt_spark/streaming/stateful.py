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

__all__ = ["running_user_stats"]

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
