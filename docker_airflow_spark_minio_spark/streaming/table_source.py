"""Snapshot tables as a Structured Streaming SOURCE (Spark 4 Python
DataSource API): ``spark.readStream.format("snapshot_table")
.option("path", root)`` streams a table's append commits as
micro-batches -- the Iceberg streaming-read parity surface
(``spark.readStream.format("iceberg")``), built on the same log the
batch side consumes via :meth:`~..snapshots.SnapshotStore.read_appends`.

Offsets ARE table versions: a micro-batch covers the published window
``(start, end]``, with one input partition per data FILE so executors
scan the window in parallel (pyarrow, Arrow-batch handoff -- the data
never routes through the driver; only manifest JSON does, O(window
commits)).  Spark's checkpoint persists the version cursor, so
kill-replay re-plans exactly the same window -- deterministic
partitions() + append-only data make replay exactly-once without any
sink-side guard.

Append-only contract (same as Iceberg's streaming read, which fails on
replace snapshots and is the reason its docs steer streaming tables to
append commits): windows crossing ``overwrite_partitions`` / full
``snapshot`` replaces / ``rollback`` / ``delete_keys`` / schema
evolution REFUSE loudly at planning time rather than re-deliver or
silently skip rows.  Staged (WAP/branch) commits are not table state
and are skipped; the initial ``snapshot`` commit (v0) streams as the
table's first batch.

The source reads manifests and data files directly (no JVM round-trip
from executors), so it serves LOCAL/POSIX table roots; scheme-qualified
stores (s3a://, mockfs://) refuse at construction -- batch-incremental
consumers there use ``read_appends`` (documented limitation, not a
silent wrong answer).
"""

from __future__ import annotations

import json
import os
from urllib.parse import unquote

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from ..sources.snapshot_batch import (
    LocalSnapshotPlanner,
    SnapshotTableBatchReader,
    SnapshotTablePushdownReader,
    arrow_type,
    check_local_root as _check_local_root,
    parse_partition_value,
)

MANIFEST_DIR = "_manifests"
DATA_DIR = "data"
HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _manifest(root: str, v: int) -> dict:
    path = f"{root}/{MANIFEST_DIR}/v{v}.json"
    try:
        with open(path, encoding="utf-8") as fh:
            return json.load(fh)
    except FileNotFoundError:
        raise ValueError(
            f"streaming window lost v{v} to retention under {root}; "
            "restart the stream from a full read"
        ) from None


def _versions(root: str) -> list[int]:
    try:
        names = os.listdir(f"{root}/{MANIFEST_DIR}")
    except FileNotFoundError:
        return []
    out = []
    for n in names:
        if n.startswith("v") and n.endswith(".json"):
            try:
                out.append(int(n[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _head_published(root: str) -> int | None:
    for v in reversed(_versions(root)):
        if _manifest(root, v).get("staged") is None:
            return v
    return None


def _added_vdirs(root: str, m: dict, v: int) -> set[str]:
    """Data dirs this commit wrote: vdir names carry their commit
    version (``v<N>-<uuid>``), and both manifest kinds list the touched
    partitions' full vdir lists.  A SHARDED full checkpoint keeps its
    partition map in shard files under ``_manifests/shards/`` -- merge
    them (the commit's own dirs can live in any shard)."""
    pmap = dict(m.get("partitions") or m.get("partitions_set") or {})
    for s in m.get("partition_shards") or []:
        path = f"{root}/{MANIFEST_DIR}/shards/{s['file']}"
        with open(path, encoding="utf-8") as fh:
            pmap.update(json.load(fh).get("partitions", {}))
    return {
        vd
        for vds in pmap.values()
        for vd in vds
        if vd.startswith(f"v{v}-")
    }


class _FilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        part_values: list,
        schema_json: str,
        session_tz: str = "UTC",
    ):
        self.path = path
        self.part_values = part_values  # [(col, raw_string_or_None)]
        self.schema_json = schema_json
        self.session_tz = session_tz


class SnapshotTableStreamReader(DataSourceStreamReader):
    def __init__(self, root: str, options: dict):
        self.root = _check_local_root(root)
        self.start = int(options.get("startingversion", -1))
        self.session_tz = options.get("session_tz", "UTC")
        head = _head_published(self.root)
        if head is None:
            raise ValueError(f"no snapshots committed under {self.root}")
        self.schema_json = _manifest(self.root, head)["schema"]

    # -- offset lifecycle -------------------------------------------------
    def initialOffset(self) -> dict:
        return {"version": self.start}

    def latestOffset(self) -> dict:
        head = _head_published(self.root)
        return {"version": self.start if head is None else head}

    def commit(self, end: dict) -> None:
        pass

    # -- planning (driver-side, manifest JSON only) ------------------------
    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["version"]), int(end["version"])
        parts: list[_FilePartition] = []
        for v in range(lo + 1, hi + 1):
            m = _manifest(self.root, v)
            if m.get("staged") is not None:
                continue  # not table state until its publish commit
            mode = m["mode"]
            if not (mode == "append" or (mode == "snapshot" and v == 0)):
                raise ValueError(
                    f"streaming window crosses a '{mode}' commit (v{v}); "
                    "the snapshot_table source is append-only (the "
                    "Iceberg streaming-read contract) -- consume "
                    "replace/delete commits via read_changes or restart "
                    "from a full read"
                )
            for vd in sorted(_added_vdirs(self.root, m, v)):
                base = f"{self.root}/{DATA_DIR}/{vd}"
                for dirpath, _dirs, files in os.walk(base):
                    rel = os.path.relpath(dirpath, base)
                    pvals = []
                    if rel != ".":
                        for seg in rel.split(os.sep):
                            col, _, raw = seg.partition("=")
                            val = unquote(raw)
                            pvals.append(
                                (col, None if val == HIVE_NULL else val)
                            )
                    for f in sorted(files):
                        if f.endswith(".parquet"):
                            parts.append(
                                _FilePartition(
                                    os.path.join(dirpath, f),
                                    pvals,
                                    self.schema_json,
                                    self.session_tz,
                                )
                            )
        return parts

    # -- execution (executor-side, pyarrow) --------------------------------
    def read(self, partition: _FilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        tab = pq.read_table(partition.path)
        n = tab.num_rows
        fields = json.loads(partition.schema_json)["fields"]
        pvals = dict(partition.part_values)
        tz = partition.session_tz

        cols = []
        for f in fields:
            name, typ = f["name"], f["type"]
            # arrow_type/parse_partition_value fail LOUDLY on types they
            # cannot map, and thread the session timezone through
            # timestamp partition values (advisor round-10 fix: the old
            # string-default + hard-coded UTC silently mis-typed or
            # shifted values).
            target = arrow_type(typ, tz)
            if name in pvals:
                cols.append(
                    pa.array(
                        [parse_partition_value(pvals[name], typ, tz)] * n,
                        type=target,
                    )
                )
            elif name in tab.column_names:
                col = tab.column(name)
                cols.append(col if col.type == target else col.cast(target))
            else:
                # column added by a later additive append: files written
                # before it null-fill (read()'s allowMissingColumns
                # semantics)
                cols.append(pa.nulls(n, type=target))
        yield from pa.table(
            cols, names=[f["name"] for f in fields]
        ).to_batches()

    def stop(self) -> None:
        pass


class SnapshotTableStreamSource(DataSource):
    """``spark.dataSource.register(SnapshotTableStreamSource)`` then:

    * ``spark.readStream.format("snapshot_table").load(root)`` --
      append commits as micro-batches (this module), or
    * ``spark.read.format("snapshot_table").load(root)`` -- a BATCH
      scan with filter pushdown into the manifest planner
      (:mod:`..sources.snapshot_batch`): snapshot tables become
      SQL-queryable temp views with hidden-partitioning / zone-map /
      bloom / sidecar pruning intact through the SQL path.  Batch
      options: ``as_of`` / ``ref`` / ``as_of_ts`` (time travel),
      ``session_tz``, ``report_path`` (JSON scan report for pruning
      assertions).  Prefer :func:`register_snapshot_view`, which
      threads the session timezone automatically."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_table"

    def _root(self) -> str:
        root = self.options.get("path")
        if not root:
            raise ValueError("snapshot_table source requires a path")
        return root

    def schema(self) -> StructType:
        root = _check_local_root(self._root())
        opts = dict(self.options)
        if any(opts.get(k) for k in ("as_of", "ref", "as_of_ts")):
            # batch time travel: serve THAT version's schema epoch
            # (its names/types -- the SnapshotStore.read contract)
            planner = LocalSnapshotPlanner.for_root(root)
            reader = SnapshotTableBatchReader(root, opts)
            m = planner._read_manifest(reader.version)
            return StructType.fromJson(json.loads(m["schema"]))
        head = _head_published(root)
        if head is None:
            raise ValueError(f"no snapshots committed under {root}")
        return StructType.fromJson(json.loads(_manifest(root, head)["schema"]))

    def streamReader(self, schema: StructType) -> SnapshotTableStreamReader:
        return SnapshotTableStreamReader(self._root(), dict(self.options))

    def reader(self, schema: StructType) -> SnapshotTableBatchReader:
        opts = dict(self.options)
        cls = (
            SnapshotTablePushdownReader
            if str(opts.get("pushdown", "")).lower() == "true"
            else SnapshotTableBatchReader
        )
        return cls(self._root(), opts)


def ensure_registered(spark) -> None:
    """Register the snapshot_table source (re-registration replaces,
    so this is safely repeatable -- same usage as the live streaming
    entries) and enable Python-DataSource filter pushdown -- a
    runtime-settable SQLConf that is OFF by default in Spark 4.1, and
    without which Spark refuses any reader implementing
    ``pushFilters``."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SnapshotTableStreamSource)


def read_snapshot_table(
    spark,
    root: str,
    as_of: int | None = None,
    ref: str | None = None,
    as_of_ts: int | None = None,
    report_path: str | None = None,
    point_filter: dict | None = None,
    range_filter: list | tuple | None = None,
    pushdown: bool = False,
):
    """Batch-read a snapshot table through the DataSource (the SQL
    path), threading the session timezone into the source so timestamp
    partition values parse under the session's rendering zone.

    ``point_filter`` / ``range_filter`` (JSON-representable values)
    prune files via the manifest planner AND are applied row-exactly by
    the scan tasks -- the SAFE pruning path for relations that live
    (views), identical for every scan of the relation.  ``pushdown``
    additionally lets Spark's own WHERE clauses reach the planner; it
    is only sound on SINGLE-QUERY relations (see the one-slot-cache
    note in :mod:`..sources.snapshot_batch`) -- prefer
    :func:`snapshot_sql`, which manages that lifecycle."""
    import json as _json

    ensure_registered(spark)
    reader = (
        spark.read.format("snapshot_table")
        .option("path", root)
        .option(
            "session_tz", spark.conf.get("spark.sql.session.timeZone")
        )
    )
    if as_of is not None:
        reader = reader.option("as_of", str(as_of))
    if ref is not None:
        reader = reader.option("ref", ref)
    if as_of_ts is not None:
        reader = reader.option("as_of_ts", str(as_of_ts))
    if report_path is not None:
        reader = reader.option("report_path", report_path)
    if point_filter:
        reader = reader.option("point_filter", _json.dumps(point_filter))
    if range_filter:
        reader = reader.option(
            "range_filter", _json.dumps([list(r) for r in range_filter])
        )
    if pushdown:
        reader = reader.option("pushdown", "true")
    return reader.load()


def register_snapshot_view(spark, root: str, name: str, **kw) -> None:
    """Register a snapshot table as a TEMP VIEW consumable with plain
    ``spark.sql`` -- the reference's consumption pattern (its gold job
    queries silver via SQL over a named table,
    /root/reference/spark/jobs/job_gold.py:71-88).  The view is safe to
    query repeatedly; file pruning comes from explicit ``point_filter``
    / ``range_filter`` kwargs (option-level, applied row-exactly).  For
    automatic WHERE-clause pushdown use :func:`snapshot_sql`."""
    read_snapshot_table(spark, root, **kw).createOrReplaceTempView(name)


def snapshot_sql(
    spark,
    sql: str,
    tables: dict[str, str],
    report_paths: dict[str, str] | None = None,
    **kw,
):
    """Run ONE SQL statement over snapshot tables with automatic
    filter pushdown into the manifest planner: registers a FRESH
    pushdown-enabled relation per table name, runs the statement, and
    drops the views -- so the upstream one-slot readInfo cache (see
    :mod:`..sources.snapshot_batch`) is never shared across statements.
    ``tables`` maps view name -> table root; ``report_paths``
    optionally maps view name -> scan-report JSON path; extra kwargs
    (``as_of``/``ref``/...) apply to every table.

    Contract: if the statement scans the SAME view name more than once
    with heterogeneous predicates (a self-join where only one side is
    filtered), register the root under TWO names -- each name is its
    own relation, which sidesteps the upstream cache entirely.  The
    returned DataFrame re-plans its own pushdown on every action and
    stays correct under further ``.where``/``.select`` chaining."""
    reports = report_paths or {}
    out = None
    try:
        for name, root in tables.items():
            register_snapshot_view(
                spark,
                root,
                name,
                pushdown=True,
                report_path=reports.get(name),
                **kw,
            )
        out = spark.sql(sql)
        return out
    finally:
        # analysis is done: the plan holds the relations; dropping the
        # names keeps later queries off these single-use relations
        for name in tables:
            spark.catalog.dropTempView(name)
