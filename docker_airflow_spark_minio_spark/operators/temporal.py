"""Temporal operators Spark lacks as built-ins: as-of join, sessionize.

The reference has no joins at all (SURVEY.md section 2.8); these are part
of the engine's extension surface.  Both are implemented as compositions
of DataFrame ops -- one shuffle each, no Python in the hot path, no row
explosion -- rather than Pandas UDFs, so whole-stage codegen applies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    inclusive: bool = True,
) -> DataFrame:
    """Backward as-of join: for every left row, attach ``right_values``
    from the right row with the greatest ``right_ts`` <= ``left_ts``
    (strictly < when ``inclusive=False``) within the same ``keys``.

    Implementation: tag-and-union both sides, then one window pass per
    key ordered by (ts, side) carrying the last non-null right value
    forward.  This is a single shuffle on ``keys`` -- it avoids the naive
    range-join explosion entirely, and unlike a broadcast interval join it
    scales to arbitrarily large right sides.

    Requirement: the right side must be unique per (keys, right_ts);
    pre-aggregate it otherwise (the value carried forward would be
    whichever duplicate sorted last).
    """
    marker = 0 if inclusive else 2  # right rows sort before (0) / after (2) equal-ts left rows (1)
    # keys and left_ts already ride as the partition/order columns;
    # carrying them inside the payload struct too would double their
    # shuffled width -- the struct holds only the remaining left columns
    # and the output is reconstructed from both.
    dup = set(keys) | {left_ts}
    payload = [c for c in left.columns if c not in dup]
    l_tagged = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*payload).alias("__left"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(v) for v in right_values],
    )
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(marker).alias("__is_left"),
        F.lit(None).cast(l_tagged.schema["__left"].dataType).alias("__left"),
        *[F.col(v) for v in right_values],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        *keys,
        "__ts",
        "__is_left",
        "__left",
        *[F.last(v, ignorenulls=True).over(w).alias(v) for v in right_values],
    )
    out = carried.filter(F.col("__is_left") == 1)
    rebuilt = {
        **{k: F.col(k) for k in keys},
        left_ts: F.col("__ts").alias(left_ts),
        **{c: F.col("__left")[c].alias(c) for c in payload},
    }
    return out.select(
        *[rebuilt[c] for c in left.columns],
        *[F.col(v) for v in right_values],
    )


def asof_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    right_values: list[str],
) -> DataFrame:
    """Backward as-of join via ``cogroup().applyInPandas`` -- the
    Arrow-batched expression of :func:`asof_join` (same semantics,
    inclusive bound): both sides are co-partitioned on ``keys`` and each
    key's pair of pandas frames is merged with ``pd.merge_asof``.

    When to prefer which: :func:`asof_join` (tag-union + window) stays
    fully JVM-side -- the default.  The cogrouped form is the template
    for per-key logic that has NO window expression (model scoring,
    curve interpolation, pandas-native algorithms): same one-shuffle
    co-partitioning, custom Python per key.  Requirement: column names
    across sides must be distinct, and the right side unique per
    (keys, right_ts) -- pre-aggregate duplicates (merge_asof would take
    the last, matching :func:`asof_join`, but keep the contract tight).

    Scale notes: one shuffle on ``keys`` for each side; per-key groups
    must fit in executor memory (they arrive as whole pandas frames) --
    true of user/session keys, NOT of global keys; salt or pre-reduce
    those first.  Both sides are explicitly repartitioned on ``keys`` to
    the default parallelism: pandas-stage cost scales with GROUP COUNT,
    not bytes, and AQE's size-based coalescing would otherwise collapse
    a small-byte shuffle onto one Python worker and serialize every
    group (measured 4x the wall-clock on 1500 user keys).  The per-group
    kernel is a numpy ``searchsorted`` backward match -- semantics
    identical to ``pd.merge_asof(direction='backward')`` at ~1/100th the
    per-call overhead, which dominates when groups are small.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    out_fields = list(left.schema.fields) + [
        T.StructField(v, right.schema[v].dataType, True) for v in right_values
    ]
    out_schema = T.StructType(out_fields)
    l_cols = [f.name for f in left.schema.fields]
    # pandas nullable dtype per output column so unmatched rows (NaN)
    # survive the Arrow cast back to Spark integral types
    _pd_dtype = {"bigint": "Int64", "int": "Int32", "smallint": "Int16"}
    r_dtypes = {
        v: _pd_dtype.get(right.schema[v].dataType.simpleString()) for v in right_values
    }

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        if l_pdf.empty:
            out = l_pdf.copy()
            for v in right_values:
                out[v] = pd.Series(dtype="object")
            return out
        out = l_pdf.sort_values(left_ts, kind="stable").reset_index(drop=True)
        if r_pdf.empty:
            for v in right_values:
                out[v] = None
        else:
            r_sorted = r_pdf.sort_values(right_ts, kind="stable")
            r_ts = r_sorted[right_ts].to_numpy()
            # backward as-of, inclusive bound == searchsorted right - 1
            idx = np.searchsorted(r_ts, out[left_ts].to_numpy(), side="right") - 1
            matched = idx >= 0
            safe = np.where(matched, idx, 0)
            for v in right_values:
                vals = r_sorted[v].to_numpy()[safe]
                col = pd.Series(vals, dtype=r_dtypes[v]) if r_dtypes[v] else pd.Series(vals)
                col[~matched] = None
                out[v] = col
        for v, dt in r_dtypes.items():
            if dt is not None:
                out[v] = out[v].astype(dt)
        return out[l_cols + list(right_values)]

    n_parts = left.sparkSession.sparkContext.defaultParallelism
    return (
        left.repartition(n_parts, *keys)
        .groupBy(*keys)
        .cogroup(right.repartition(n_parts, *keys).groupBy(*keys))
        .applyInPandas(merge, schema=out_schema)
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts: Column | str,
    gap: Column,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign gap-based session ids per key: a new session starts when the
    time since the previous event is >= ``gap`` (matching Spark's native
    ``session_window`` half-open [start, last+gap) semantics).

    ``ts``/``gap`` must be numeric (e.g. epoch nanos) so the arithmetic is
    exact.  Adds a ``session_id`` column (1-based per key).  Two window
    passes over one partitioning -- a single shuffle on ``key``.
    """
    ts_col = F.col(ts) if isinstance(ts, str) else ts
    order = [ts_col] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    is_new = (
        F.when(ts_col - F.lag(ts_col).over(w) >= gap, 1)
        .otherwise(0)
        + F.when(F.lag(ts_col).over(w).isNull(), 1).otherwise(0)
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_id", F.sum(is_new).over(wsum))
