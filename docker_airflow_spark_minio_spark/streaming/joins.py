"""Unified batch/streaming interval (stream-stream) join.

The batch as-of join (operators/temporal.py) picks the single latest
left-side row; this builder is its streaming-capable sibling: an inner
equi-join plus a time-range bound -- "right event within ``lookback``
before the left event".  On two streams Spark requires watermarks on
both sides and a range condition on the event times, which together
bound the join state: each side buffers only rows inside the watermark
horizon, and expired state is evicted as the watermark advances.

Same builder, batch or streaming inputs -- the unified-model property
every module in this package follows.

Scale notes: the join shuffles both sides on the equi-key once per
micro-batch; state per key is bounded by (lookback + watermark) x rate,
independent of stream length.  Without the range condition the state
would be unbounded and Spark rejects the query -- the API here makes
the bound mandatory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: tuple[str, ...] = ("user_id",),
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "1 hour",
    left_watermark: str = "2 hours",
    right_watermark: str = "2 hours",
    right_prefix: str = "r_",
    how: str = "inner",
) -> DataFrame:
    """Rows of ``left`` paired with every ``right`` row of the same keys
    whose timestamp falls in ``[left_ts - lookback, left_ts]``.

    Right-side non-key columns come back ``right_prefix``-renamed so the
    output schema is unambiguous.  Watermarks are applied only to
    streaming inputs; batch inputs run the identical logical join.

    ``how``: ``inner`` (default) or ``left_outer`` -- the outer form
    emits a NULL-padded row for every left event with no in-range
    partner, once the watermark proves no partner can still arrive
    (Spark buffers the left row until its join window falls behind the
    right watermark; on batch inputs the outer join is immediate).
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"interval_join supports inner/left_outer, got {how!r}")
    l_df = left
    r_df = right.select(
        *[F.col(k).alias(f"{right_prefix}{k}") for k in keys],
        *[
            F.col(c).alias(f"{right_prefix}{c}")
            for c in right.columns
            if c not in keys
        ],
    )
    if l_df.isStreaming:
        l_df = l_df.withWatermark(left_ts, left_watermark)
    if r_df.isStreaming:
        r_df = r_df.withWatermark(f"{right_prefix}{right_ts}", right_watermark)

    rts = F.col(f"{right_prefix}{right_ts}")
    cond = (
        (rts >= F.col(left_ts) - F.expr(f"INTERVAL {lookback}"))
        & (rts <= F.col(left_ts))
    )
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"{right_prefix}{k}"))
    return l_df.join(r_df, cond, how).drop(
        *[f"{right_prefix}{k}" for k in keys]
    )
