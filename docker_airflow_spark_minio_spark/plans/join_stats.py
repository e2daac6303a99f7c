"""Manifest-statistics join planning for snapshot tables -- choose
broadcast vs shuffle WITHOUT an ANALYZE scan.

Spark's own auto-broadcast decision needs table size statistics, which
for plain parquet relations come from file sizes at best and from an
ANALYZE TABLE pass at worst.  Snapshot-table manifests already carry
exact per-directory ROW COUNTS (``dir_rows``, recorded by the stats
scan) and, with ``write(ndv_cols=...)``, a mergeable HLL NDV sketch per
join-relevant column -- everything a planner needs, maintained
incrementally at write time (the Iceberg idea: stats live in table
metadata, not in a catalog-side ANALYZE).

Decision semantics (:func:`plan_snapshot_join`), stated conservatively:

* exact manifest row counts drive the broadcast choice: the smaller
  side broadcasts when its row count is known and at most
  ``broadcast_threshold_rows``;
* when a side's row count is UNKNOWN (live merge-on-read delete sets
  make ``count_rows`` refuse; masked rows are not knowable from
  metadata), its key NDV -- a LOWER bound on rows -- can still prove
  the side too big to broadcast; NDV can never prove smallness, so an
  unknown-rows side with small-or-absent NDV stays on the shuffle path
  (never an unsafe broadcast);
* the NDV sketches also give the classic equi-join output estimate
  ``|L| * |R| / max(ndv_L, ndv_R)``, returned for shuffle sizing.

Scale notes (100 TB posture): the whole decision is metadata-plane --
manifest JSON plus two 1-row sketch-estimate jobs; no data is touched
until the returned join executes.  A wrong ANALYZE-less guess here
costs a shuffle that AQE can still re-plan; the conservative rules
above only ever skip a broadcast, never force an oversized one.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..snapshots import SnapshotStore

#: default broadcast ceiling, in ROWS (manifests count rows, not bytes;
#: at ~100 B/row this tracks Spark's 10 MB autoBroadcast default's
#: order of magnitude).
BROADCAST_THRESHOLD_ROWS = 100_000


#: rows-per-distinct-key ratio above which a shuffle join is flagged
#: skew-prone (one reducer key owns many rows): the signal to salt the
#: key or lean on AQE's skew-join split.
SKEW_FACTOR_HINT = 64


@dataclass
class JoinSideStats:
    rows: int | None  # exact manifest count; None = not provable
    ndv: int | None  # HLL estimate for the join key; None = no sketch

    @property
    def skew_factor(self) -> float | None:
        """Average rows per distinct join-key value -- the duplicate
        factor a shuffle partitions by.  None when either stat is
        missing."""
        if self.rows is None or not self.ndv:
            return None
        return self.rows / self.ndv


@dataclass
class JoinDecision:
    strategy: str  # 'broadcast_left' | 'broadcast_right' | 'shuffle'
    left: JoinSideStats
    right: JoinSideStats
    est_output_rows: int | None
    reason: str
    skew_hint: str | None = None  # set on skew-prone shuffle decisions


def side_stats(store: SnapshotStore, key: str) -> JoinSideStats:
    return JoinSideStats(rows=store.count_rows(), ndv=store.column_ndv(key))


def _broadcastable(s: JoinSideStats, threshold: int) -> bool:
    """Provably small enough to broadcast.  Unknown rows are NEVER
    broadcastable (NDV is a lower bound -- it can refuse, not
    approve)."""
    return s.rows is not None and s.rows <= threshold


def plan_snapshot_join(
    left: SnapshotStore,
    right: SnapshotStore,
    on: str,
    broadcast_threshold_rows: int = BROADCAST_THRESHOLD_ROWS,
) -> JoinDecision:
    ls, rs = side_stats(left, on), side_stats(right, on)
    est = None
    if ls.rows is not None and rs.rows is not None and (ls.ndv or rs.ndv):
        est = (ls.rows * rs.rows) // max(ls.ndv or 1, rs.ndv or 1)
    lb, rb = (
        _broadcastable(ls, broadcast_threshold_rows),
        _broadcastable(rs, broadcast_threshold_rows),
    )
    if lb and (not rb or (ls.rows or 0) <= (rs.rows or 0)):
        return JoinDecision(
            "broadcast_left", ls, rs, est,
            f"left rows {ls.rows} <= {broadcast_threshold_rows}",
        )
    if rb:
        return JoinDecision(
            "broadcast_right", ls, rs, est,
            f"right rows {rs.rows} <= {broadcast_threshold_rows}",
        )
    why = []
    for name, s in (("left", ls), ("right", rs)):
        if s.rows is None:
            why.append(
                f"{name} rows unprovable"
                + (
                    f" (ndv {s.ndv} already exceeds threshold)"
                    if s.ndv is not None
                    and s.ndv > broadcast_threshold_rows
                    else ""
                )
            )
        else:
            why.append(f"{name} rows {s.rows} over threshold")
    skew = None
    hot = [
        (name, s.skew_factor)
        for name, s in (("left", ls), ("right", rs))
        if s.skew_factor is not None and s.skew_factor >= SKEW_FACTOR_HINT
    ]
    if hot:
        skew = (
            "skew-prone shuffle key: "
            + ", ".join(f"{n} ~{f:.0f} rows/key" for n, f in hot)
            + " -- salt the key or enable AQE skew-join splitting"
        )
    return JoinDecision("shuffle", ls, rs, est, "; ".join(why), skew)


def join_snapshot_tables(
    left: SnapshotStore,
    right: SnapshotStore,
    on: str,
    how: str = "inner",
    broadcast_threshold_rows: int = BROADCAST_THRESHOLD_ROWS,
) -> tuple[DataFrame, JoinDecision]:
    """Join two snapshot tables with the physical strategy chosen from
    MANIFEST STATISTICS alone (no ANALYZE, no data touched for the
    decision); returns ``(joined frame, decision)``.  The broadcast
    pick is a hint -- Catalyst/AQE still own the final plan, and a
    'shuffle' decision simply leaves them to it."""
    decision = plan_snapshot_join(left, right, on, broadcast_threshold_rows)
    ldf, rdf = left.read(), right.read()
    if decision.strategy == "broadcast_left":
        ldf = F.broadcast(ldf)
    elif decision.strategy == "broadcast_right":
        rdf = F.broadcast(rdf)
    return ldf.join(rdf, on, how), decision
