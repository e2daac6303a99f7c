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
  replaces (snapshot / overwrite / compaction / rollback) or retention
  holes cannot be maintained from deltas alone, so the refresh falls
  back to a full recompute -- never a silently-wrong summary.  This is
  the same refusal ``read_appends`` gives across replace snapshots,
  applied one level up.
* ``delete_keys`` windows ARE delta-maintainable (round 8): counts and
  sums are not retractable from keys alone, but the delete sets CARRY
  the keys, and the summary's partition columns are a subset of the
  group keys -- so the summary partitions a delete touches are
  derivable from the delete-set keys without scanning the table.
  Those partitions are RECOMPUTED from the (post-delete-mask) source
  restricted to exactly their values -- literal partition predicates,
  so the source scan prunes to the affected partitions -- while
  append-only partitions keep the cheap partial-merge path.  Requires
  ``partition_by`` to be a subset of every window delete's
  ``key_cols`` (else the touched set is unknowable from keys: full
  recompute), and a non-empty ``partition_by`` (else "touched" is the
  whole summary anyway).

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
from .snapshots import DATA_DIR, SnapshotStore

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

    # -- delete-window support ----------------------------------------------

    def _delete_touched_values(
        self, src_head: int, del_versions: list[int]
    ) -> list[tuple] | None:
        """The distinct summary-partition value tuples the window's
        equality deletes touch, derived from the DELETE-SET KEYS alone
        (O(deleted keys), never a table scan).  Returns None when some
        window delete's ``key_cols`` do not cover ``partition_by`` --
        the touched set is then unknowable from keys and the caller
        falls back to a full recompute.  Window delete sets are always
        present in the head manifest: the prune rule drops a set only
        when NO live dir predates it, which inside an
        append/delete-only window would need a replace commit."""
        head_man = self.source._read_manifest(src_head)
        by_version = {
            int(d["version"]): d for d in head_man.get("delete_sets", [])
        }
        frames = []
        for dv in del_versions:
            entry = by_version.get(dv)
            if entry is None or any(
                c not in entry["key_cols"] for c in self.partition_by
            ):
                return None
            frames.append(
                self.spark.read.parquet(
                    f"{self.source.root.rstrip('/')}/{DATA_DIR}/{entry['dir']}"
                ).select(*self.partition_by)
            )
        keys = frames[0]
        for f in frames[1:]:
            keys = keys.unionByName(f)
        return [
            tuple(r[c] for c in self.partition_by)
            for r in keys.distinct().collect()
        ]

    def _partition_predicate(self, vals: list[tuple]):
        """OR of per-tuple null-safe equality conjunctions over the
        summary partition columns -- literal predicates, which the
        partitioned parquet scans prune on."""
        pred = F.lit(False)
        for tup in vals:
            c = F.lit(True)
            for col, v in zip(self.partition_by, tup):
                c = c & F.col(col).eqNullSafe(F.lit(v))
            pred = pred | c
        return pred

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
        del_versions: list[int] = []
        if last is not None:
            modes = self.source.commit_modes(int(last), as_of=src_head)
            bad = {
                v: m
                for v, m in modes.items()
                if m not in ("append", "delete_keys")
            }
            del_versions = sorted(
                v for v, m in modes.items() if m == "delete_keys"
            )
            incremental = not bad and (not del_versions or self.partition_by)
            if bad:
                reason = f"window not delta-maintainable: {bad}"
            elif del_versions and not self.partition_by:
                reason = (
                    "delete window with unpartitioned summary: 'touched' "
                    "is the whole summary"
                )
            elif del_versions:
                reason = f"append+delete window (deletes: {del_versions})"
            else:
                reason = "append-only window"
        wm = {WATERMARK_KEY: src_head}
        del_vals: list[tuple] = []
        if incremental and del_versions:
            del_vals = self._delete_touched_values(src_head, del_versions)
            if del_vals is None:
                incremental = False
                reason = (
                    "delete_keys window whose keys do not carry the "
                    "summary partition columns: touched partitions "
                    "unknowable from keys"
                )
        if incremental:
            delta = self.source.read_appends(int(last), as_of=src_head)
            if self.partition_by:
                recomputed = None
                claimed = None
                if del_vals:
                    # Exclude delete-touched partitions from the cheap
                    # merge path; they are recomputed below.  eqNullSafe
                    # so a NULL partition value routes correctly.
                    pred = self._partition_predicate(del_vals)
                    delta = delta.where(~pred)
                    # RECOMPUTE exactly the touched partitions from the
                    # post-delete-mask source: literal partition
                    # predicates, so the snapshot scan partition-prunes
                    # to the affected values.
                    recomputed = self._partial(
                        self.source.read(as_of=src_head).where(
                            self._partition_predicate(del_vals)
                        )
                    )
                    # a recomputed partition may now be EMPTY (every
                    # row deleted): claim it so the overwrite removes it
                    claimed = del_vals
                partial = self._partial(delta)
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
                if recomputed is not None:
                    merged = merged.unionByName(recomputed)
                v = self.target.write(
                    merged,
                    mode="overwrite_partitions",
                    partition_by=self.partition_by,
                    claimed_partitions=claimed,
                    watermarks=wm,
                )
            else:
                merged = self._merge(self.target.read(), self._partial(delta))
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
