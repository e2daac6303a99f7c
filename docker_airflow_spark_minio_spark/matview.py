"""Incrementally-maintained aggregate tables over the snapshot store.

The reference's gold layer recomputes its GROUP BY from the FULL silver
table on every run (``/root/reference/spark/jobs/job_gold.py:40-83``
re-aggregates the whole table to produce ``tab_brewery_count``) -- fine
at its scale, a non-starter at 100 TB where the daily delta is a few
hundred GB against a 100 TB base.  :class:`IncrementalMatView` is the
Spark-first replacement: a summary table whose refresh reads ONLY the
source commits since the last refresh (via
:meth:`~.snapshots.SnapshotStore.read_appends`) and rewrites ONLY the
summary partitions those deltas touch.

Cost model per refresh at scale:

* source side -- O(delta): the incremental scan lists just the data
  directories appended after the watermark (manifest metadata), never
  the base table;
* target side -- O(affected partitions): delta partials are merged with
  the current summary rows of the partitions they touch (manifest-level
  pruning via ``read(partitions=...)``) and committed with
  ``overwrite_partitions``;
* decision side -- O(window) manifest READS
  (:meth:`~.snapshots.SnapshotStore.commit_modes`): a window containing
  anything but plain appends (merge-on-read deletes, replaces,
  compaction, rollback, retention holes) cannot be maintained from
  deltas alone, so the refresh falls back to a full recompute -- never
  a silently-wrong summary.  This is the same refusal
  ``read_appends`` gives across replace snapshots, applied one level
  up.  (``delete_keys`` windows fall back too: an equality delete may
  erase rows already folded into the summary, and counts/sums are not
  retractable without knowing exactly which rows died.)

Exactly-once: the refresh commits the consumed source version as a
carried-forward watermark (``mv_source_version``) on the summary
table's OWN snapshot log, so a re-run after a crash either sees the
mark (no-op) or re-runs the same idempotent merge; two racing
refreshes resolve through the store's single-winner commit claim (the
loser's write raises and is retried against the new head).

Only self-maintainable aggregates are offered (count / sum / min / max
-- the classic incremental-view-maintenance algebra for append-only
deltas); averages are derived at read time from a (sum, count) pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .fsmeta import hive_partition_dir
from .snapshots import SnapshotStore

WATERMARK_KEY = "mv_source_version"

#: first-stage aggregate per spec kind; the merge stage folds partials
#: with SUM for count/sum and MIN/MAX for min/max (all associative).
_KINDS = ("count", "sum", "min", "max")


class IncrementalMatView:
    """An aggregate summary of a :class:`SnapshotStore` table, stored as
    its own snapshot table and refreshed incrementally (see module
    docstring for the cost model and fallback rules).

    ``aggs`` maps output column name -> ``("count",)`` or
    ``("sum"|"min"|"max", source_column)``.  ``partition_by`` (a prefix
    subset of ``group_by``) partitions the summary table so incremental
    refreshes rewrite only affected partitions; without it each refresh
    rewrites the whole (group-cardinality-sized) summary.
    """

    def __init__(
        self,
        spark: SparkSession,
        source: SnapshotStore,
        root: str,
        *,
        group_by: list[str],
        aggs: dict[str, tuple],
        partition_by: list[str] | None = None,
    ) -> None:
        if not group_by:
            raise ValueError("group_by must be non-empty")
        if not aggs:
            raise ValueError("aggs must be non-empty")
        for name, spec in aggs.items():
            if not spec or spec[0] not in _KINDS:
                raise ValueError(
                    f"agg {name!r}: kind must be one of {_KINDS}, got {spec!r}"
                )
            if spec[0] == "count" and len(spec) != 1:
                raise ValueError(f"agg {name!r}: ('count',) takes no column")
            if spec[0] != "count" and len(spec) != 2:
                raise ValueError(f"agg {name!r}: {spec[0]} needs a source column")
            if name in group_by:
                raise ValueError(f"agg {name!r} collides with a group column")
        pby = list(partition_by or [])
        if any(c not in group_by for c in pby):
            raise ValueError(
                f"partition_by {pby} must be a subset of group_by {group_by}"
            )
        self.spark = spark
        self.source = source
        self.group_by = list(group_by)
        self.aggs = dict(aggs)
        self.partition_by = pby
        self.target = SnapshotStore(spark, root)

    # -- aggregate algebra -------------------------------------------------

    def _partial(self, df: DataFrame) -> DataFrame:
        """First-stage aggregate of raw source rows (also the full
        recompute -- the algebra makes partials and finals the same
        shape)."""
        cols = []
        for name, spec in self.aggs.items():
            if spec[0] == "count":
                cols.append(F.count(F.lit(1)).alias(name))
            elif spec[0] == "sum":
                cols.append(F.sum(spec[1]).alias(name))
            elif spec[0] == "min":
                cols.append(F.min(spec[1]).alias(name))
            else:
                cols.append(F.max(spec[1]).alias(name))
        return df.groupBy(*self.group_by).agg(*cols)

    def _merge(self, current: DataFrame, partial: DataFrame) -> DataFrame:
        """Fold delta partials into current summary rows: counts and
        sums add, mins/maxes re-extremize -- associative, so the merge
        is itself one partial aggregation (map-side combinable)."""
        cols = []
        for name, spec in self.aggs.items():
            fn = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}[
                spec[0]
            ]
            col = fn(name)
            if spec[0] == "count":
                # SUM(long) stays long in Spark, but pin it so the
                # summary schema cannot drift between full and
                # incremental refreshes.
                col = col.cast("long")
            cols.append(col.alias(name))
        u = current.select(*partial.columns).unionByName(partial)
        return u.groupBy(*self.group_by).agg(*cols)

    # -- refresh -----------------------------------------------------------

    def refresh(self) -> dict:
        """Advance the summary to the source head.  Returns
        ``{"mode": "noop"|"incremental"|"full", "source_version": ...,
        "version": <target version or None>, "reason": ...}``."""
        src_head = self.source.current_version()
        if src_head is None:
            raise ValueError(f"source {self.source.root} has no snapshots")
        last = self.target.watermark(WATERMARK_KEY)
        if last is not None and int(last) >= src_head:
            return {
                "mode": "noop",
                "source_version": int(last),
                "version": self.target.current_version(),
                "reason": "summary already at source head",
            }
        reason = "first refresh"
        incremental = False
        if last is not None:
            modes = self.source.commit_modes(int(last), as_of=src_head)
            bad = {v: m for v, m in modes.items() if m != "append"}
            incremental = not bad
            reason = (
                "append-only window"
                if incremental
                else f"window not append-only: {bad}"
            )
        wm = {WATERMARK_KEY: src_head}
        if incremental:
            delta = self.source.read_appends(int(last), as_of=src_head)
            partial = self._partial(delta)
            if self.partition_by:
                # O(affected partitions) driver rows -- the same
                # cardinality the overwrite commit itself must track.
                # Probed on the raw delta (a shuffle of the partition
                # columns only), not on ``partial``, which would
                # recompute the whole delta aggregation just to list
                # its groups.
                vals = delta.select(*self.partition_by).distinct().collect()
                dirs = [
                    hive_partition_dir(
                        self.spark,
                        self.partition_by,
                        tuple(r[c] for c in self.partition_by),
                    )
                    for r in vals
                ]
                # Affected dirs that exist in the summary yet (a delta
                # made ONLY of brand-new groups has none -- the merge is
                # then just the partial itself).
                _, by_vdir, _, _ = self.target.plan_dirs(partitions=dirs)
                existing = sorted({p for ps in by_vdir.values() for p in ps})
                current = (
                    self.target.read(partitions=existing)
                    if existing
                    else partial.limit(0)
                )
                merged = self._merge(current, partial)
                v = self.target.write(
                    merged,
                    mode="overwrite_partitions",
                    partition_by=self.partition_by,
                    watermarks=wm,
                )
            else:
                merged = self._merge(self.target.read(), partial)
                v = self.target.write(merged, mode="snapshot", watermarks=wm)
            return {
                "mode": "incremental",
                "source_version": src_head,
                "version": v,
                "reason": reason,
            }
        full = self._partial(self.source.read(as_of=src_head))
        v = self.target.write(
            full,
            mode="snapshot",
            partition_by=self.partition_by,
            watermarks=wm,
        )
        return {
            "mode": "full",
            "source_version": src_head,
            "version": v,
            "reason": reason,
        }

    def read(self, as_of: int | None = None) -> DataFrame:
        """The summary as of its last refresh (a plain snapshot read of
        the target table; pass ``as_of`` to time-travel the SUMMARY's
        own history)."""
        return self.target.read(as_of=as_of)
