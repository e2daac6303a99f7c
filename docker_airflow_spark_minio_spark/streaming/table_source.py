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

MANIFEST_DIR = "_manifests"
DATA_DIR = "data"
HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

#: Spark schema-JSON scalar type -> pyarrow type factory (partition
#: columns are cast from their directory-name strings through arrow).
_ARROW_TYPES = {
    "byte": "int8",
    "short": "int16",
    "integer": "int32",
    "long": "int64",
    "float": "float32",
    "double": "float64",
    "string": "string",
    "boolean": "bool_",
    "date": "date32",
}


def _check_local_root(root: str) -> str:
    if "://" in root:
        raise ValueError(
            "snapshot_table streaming source reads manifests/files "
            f"directly and supports local table roots only, got {root!r};"
            " use SnapshotStore.read_appends for batch-incremental "
            "consumption of scheme-qualified stores"
        )
    return root.rstrip("/")


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
    def __init__(self, path: str, part_values: list, schema_json: str):
        self.path = path
        self.part_values = part_values  # [(col, raw_string_or_None)]
        self.schema_json = schema_json


class SnapshotTableStreamReader(DataSourceStreamReader):
    def __init__(self, root: str, options: dict):
        self.root = _check_local_root(root)
        self.start = int(options.get("startingversion", -1))
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

        def _target(typ):
            if typ == "timestamp":
                return pa.timestamp("us", tz="UTC")
            return getattr(pa, _ARROW_TYPES.get(typ, "string"))()

        cols = []
        for f in fields:
            name, typ = f["name"], f["type"]
            if name in pvals:
                cols.append(pa.array([pvals[name]] * n).cast(_target(typ)))
            elif name in tab.column_names:
                cols.append(tab.column(name))
            else:
                # column added by a later additive append: files written
                # before it null-fill (read()'s allowMissingColumns
                # semantics)
                cols.append(pa.nulls(n, type=_target(typ)))
        yield from pa.table(
            cols, names=[f["name"] for f in fields]
        ).to_batches()

    def stop(self) -> None:
        pass


class SnapshotTableStreamSource(DataSource):
    """``spark.dataSource.register(SnapshotTableStreamSource)`` then
    ``spark.readStream.format("snapshot_table").load(root)``."""

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
        head = _head_published(root)
        if head is None:
            raise ValueError(f"no snapshots committed under {root}")
        return StructType.fromJson(json.loads(_manifest(root, head)["schema"]))

    def streamReader(self, schema: StructType) -> SnapshotTableStreamReader:
        return SnapshotTableStreamReader(self._root(), dict(self.options))
