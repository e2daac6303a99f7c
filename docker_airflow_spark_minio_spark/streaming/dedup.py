"""Streaming deduplication.

The streaming twin of ``workloads/dedup.py``'s exact dedup: drop rows
whose key was already seen.  On an unbounded stream the seen-set is
state, so the scalable form bounds it with a watermark
(``dropDuplicatesWithinWatermark``): a duplicate arriving later than the
watermark horizon is no longer caught, in exchange for state that grows
with the horizon instead of the stream.  The unbounded variant is kept
for reprocessing bounded backfills where exactness matters more than
state size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    df: DataFrame,
    keys: tuple[str, ...] = ("doc_id",),
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Exact key-dedup for batch or streaming DataFrames.

    With ``ts_col`` + ``watermark`` on a stream, state is evicted past
    the watermark horizon (the 100-TB/day-safe form); without them,
    state is unbounded (bounded backfills only).
    """
    if ts_col is not None and watermark is not None and df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return df.dropDuplicates(list(keys))
