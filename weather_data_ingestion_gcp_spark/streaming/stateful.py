"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no stateful stream processing (its only "state" is the
daily table it rewrites per event — T4); this is the beyond-reference
extension point SURVEY.md §2.7/§2.8 calls for: arbitrary per-key state kept
by the engine across micro-batches, checkpointed with the query.

``user_running_stats`` maintains per-user running totals (events seen,
value sum) across batches — the archetype of incremental feature
computation over an event stream. Arrow-batched per group; state is a
single tuple per key, so memory is O(active keys), not O(events).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: (n_events_total, value_total, emit_seq)
_STATE_SCHEMA = "n BIGINT, total DOUBLE, seq BIGINT"
_OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT, value_total DOUBLE, emit_seq BIGINT"


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total, seq = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    seq += 1
    state.update((n, total, seq))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "value_total": [round(total, 6)],
            "emit_seq": [seq],
        }
    )


def user_running_stats(events: DataFrame) -> DataFrame:
    """events stream (user_id, ts, value, ...) -> per-user running totals,
    one row per (user, trigger) in update mode.

    Sink note: pair with foreachBatch or a real sink for restartability —
    the in-memory sink refuses checkpoint recovery (state itself resumes
    fine across query restarts; verified)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
