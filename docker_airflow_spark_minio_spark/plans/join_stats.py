"""Manifest-statistics join planning for snapshot tables -- choose
broadcast vs shuffle WITHOUT an ANALYZE scan.

Spark's own auto-broadcast decision needs table size statistics, which
for plain parquet relations come from file sizes at best and from an
ANALYZE TABLE pass at worst.  Snapshot-table manifests already carry
exact per-directory data-file BYTE SUMS (``dir_bytes``, recorded by
every write from a listing -- Spark's broadcast threshold is bytes, so
this is the binding statistic), exact per-directory ROW COUNTS
(``dir_rows``, recorded by the stats scan), and, with
``write(ndv_cols=...)``, a mergeable HLL NDV sketch per join-relevant
column -- everything a planner needs, maintained incrementally at
write time (the Iceberg idea: stats live in table metadata, not in a
catalog-side ANALYZE).

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

#: default broadcast ceiling, in ROWS (the pre-round-12 statistic;
#: kept as a second gate and the fallback when bytes are unrecorded).
BROADCAST_THRESHOLD_ROWS = 100_000

#: default broadcast ceiling, in BYTES -- Spark's own
#: autoBroadcastJoinThreshold default (10 MB).  Manifests record exact
#: per-directory data-file byte sums (``dir_bytes``, round 12) from a
#: write-time listing, so this is the statistic that actually matches
#: Spark's broadcast semantics; a wide-row table whose ROW count looks
#: broadcastable is refused here.
BROADCAST_THRESHOLD_BYTES = 10 * 1024 * 1024


#: rows-per-distinct-key ratio above which a shuffle join is flagged
#: skew-prone (one reducer key owns many rows): the signal to salt the
#: key or lean on AQE's skew-join split.
SKEW_FACTOR_HINT = 64


@dataclass
class JoinSideStats:
    rows: int | None  # exact manifest count; None = not provable
    ndv: int | None  # HLL estimate for the join key; None = no sketch
    bytes: int | None = None  # exact manifest data-file byte sum;
    # physical (MoR masks don't shrink it), so an UPPER bound on any
    # masked read -- None on pre-round-12 manifests

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
    return JoinSideStats(
        rows=store.count_rows(),
        ndv=store.column_ndv(key),
        bytes=store.count_bytes(),
    )


def _broadcastable(s: JoinSideStats, threshold: int, bytes_threshold: int) -> bool:
    """Provably small enough to broadcast.  BYTES are the binding
    statistic (Spark's threshold is bytes): known-oversized bytes VETO
    a row-count-approved broadcast (the wide-row case), and known-small
    bytes can approve a side whose ROW count is unprovable (live MoR
    masks) because physical bytes upper-bound the masked build side.
    With bytes unrecorded (pre-round-12 manifests), rows alone decide;
    unknown rows + unknown bytes are NEVER broadcastable (NDV is a
    lower bound -- it can refuse, not approve)."""
    if s.bytes is not None and s.bytes > bytes_threshold:
        return False
    if s.rows is not None:
        return s.rows <= threshold
    return s.bytes is not None and s.bytes <= bytes_threshold


def plan_snapshot_join(
    left: SnapshotStore,
    right: SnapshotStore,
    on: str,
    broadcast_threshold_rows: int = BROADCAST_THRESHOLD_ROWS,
    broadcast_threshold_bytes: int = BROADCAST_THRESHOLD_BYTES,
) -> JoinDecision:
    ls, rs = side_stats(left, on), side_stats(right, on)
    est = None
    if ls.rows is not None and rs.rows is not None and (ls.ndv or rs.ndv):
        est = (ls.rows * rs.rows) // max(ls.ndv or 1, rs.ndv or 1)
    lb, rb = (
        _broadcastable(ls, broadcast_threshold_rows, broadcast_threshold_bytes),
        _broadcastable(rs, broadcast_threshold_rows, broadcast_threshold_bytes),
    )
    if lb and (not rb or (ls.rows or 0) <= (rs.rows or 0)):
        return JoinDecision(
            "broadcast_left", ls, rs, est,
            f"left rows {ls.rows} / bytes {ls.bytes} within thresholds",
        )
    if rb:
        return JoinDecision(
            "broadcast_right", ls, rs, est,
            f"right rows {rs.rows} / bytes {rs.bytes} within thresholds",
        )
    why = []
    for name, s in (("left", ls), ("right", rs)):
        if s.bytes is not None and s.bytes > broadcast_threshold_bytes:
            why.append(
                f"{name} bytes {s.bytes} over the byte threshold"
                + (" (rows within the row threshold: wide rows)"
                   if s.rows is not None
                   and s.rows <= broadcast_threshold_rows
                   else "")
            )
        elif s.rows is None:
            why.append(
                f"{name} rows unprovable, bytes unrecorded"
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
    broadcast_threshold_bytes: int = BROADCAST_THRESHOLD_BYTES,
) -> tuple[DataFrame, JoinDecision]:
    """Join two snapshot tables with the physical strategy chosen from
    MANIFEST STATISTICS alone (no ANALYZE, no data touched for the
    decision); returns ``(joined frame, decision)``.  The broadcast
    pick is a hint -- Catalyst/AQE still own the final plan, and a
    'shuffle' decision simply leaves them to it."""
    decision = plan_snapshot_join(
        left, right, on, broadcast_threshold_rows, broadcast_threshold_bytes
    )
    ldf, rdf = left.read(), right.read()
    if decision.strategy == "broadcast_left":
        ldf = F.broadcast(ldf)
    elif decision.strategy == "broadcast_right":
        rdf = F.broadcast(rdf)
    return ldf.join(rdf, on, how), decision
