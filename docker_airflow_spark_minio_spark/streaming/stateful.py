"""Custom stateful streaming operators (``applyInPandasWithState``).

For stateful logic the built-in windowed aggregations can't express --
here, per-key running totals emitted every micro-batch with idle-key
eviction.  State is an explicit (count, sum) tuple per key in the state
store; a key idle past ``ttl`` is dropped via processing-time timeout,
which is what bounds state on an unbounded stream (the hand-rolled
equivalent of a watermark for non-windowed state).

Scale notes: state shuffles once per micro-batch on the grouping key;
the pandas function sees one Arrow batch per key per trigger, so state
size is O(live keys), not O(stream).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, n_events bigint, total double"
STATE_SCHEMA = "n bigint, total double"


def running_totals(
    grouped,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Per-key running (count, sum) over a stream.

    ``grouped`` is ``df.groupBy(key_col)`` of a streaming DataFrame with
    columns ``(key: string, value: double)``.  Emits the updated totals
    for every key seen in each micro-batch; keys idle longer than
    ``ttl_ms`` are evicted (update output mode).
    """

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ):
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({"key": [key[0]], "n_events": [n], "total": [total]})

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return grouped.applyInPandasWithState(
        update, OUTPUT_SCHEMA, STATE_SCHEMA, "update", timeout
    )
