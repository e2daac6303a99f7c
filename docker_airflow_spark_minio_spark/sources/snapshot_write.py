"""BATCH WRITES to snapshot tables through the Spark Python DataSource
API -- the write half of the SQL surface: with it,

    df.write.format("snapshot_table").option("path", root)
      .mode("append" | "overwrite").save()

commits ``df`` as a new snapshot version through the store's atomic
claim protocol, and a table registered in the session catalog
(``CREATE TABLE t USING snapshot_table OPTIONS (path '...')``) takes
``INSERT INTO`` -- the reference's jobs write via the table catalog
(``df.write.format("iceberg").mode("overwrite").saveAsTable(...)``,
/root/reference/spark/jobs/job_silver.py:174-178, job_gold.py:98-102);
this is that consumption shape over the snapshot store.

Execution model (mirrors the batch reader's constraints):

* **Tasks write the parquet data files** (executor-side, pyarrow over
  Arrow record batches -- :class:`DataSourceArrowWriter`, no
  row-at-a-time path): each task routes its rows into Hive partition
  directories under an ATTEMPT-UNIQUE data dir (``v{N}-{attempt}``,
  the same convention as :meth:`SnapshotStore.write`), using the
  pinned pure-Python twin of Spark's path escaping so API-path appends
  to the same partition land in the same directory name.
* **The commit runs in a Python worker with NO SparkSession** (same
  constraint as the reader's planner), so it goes through
  :class:`LocalSnapshotCommitter` -- a
  :class:`~.snapshot_batch.LocalSnapshotPlanner` whose commit leaves
  are local: manifest claim via ``link(2)`` (write the payload to an
  attempt-unique tmp, hard-link to the final name -- creation fails
  atomically when a racer already committed, the exact file:// claim
  semantics of ``write_atomic_claim``), recursive delete via shutil.
  Manifest ASSEMBLY is **not** re-implemented: it calls the very same
  :meth:`SnapshotStore._assemble_and_commit_dir` the API write path
  uses (carry-forward of stats/sidecars/delete-set pruning/watermarks,
  delta-vs-checkpoint cadence), so the two write paths cannot drift.

Restricted surface (refused loudly, with the API alternative named):
hidden-partitioning transforms, partition-spec evolution, stats/bloom/
NDV recording, WAP staging, and ``overwrite_partitions`` stay on
:meth:`SnapshotStore.write` -- a SQL ``INSERT`` can express none of
them.  Supported: ``append`` (INSERT INTO), ``overwrite`` = full
table-replacing snapshot (INSERT OVERWRITE), identity partitioning
(inherited from the table, or ``partition_by`` option on first
write), field-id schema-evolution-aware appends (the same
renamed-away-name refusal and evolved-schema merge as the API path).

Lost-update safety: the version and parent are pinned at plan time;
the claim decides same-version races, and the commit re-checks the
head so a table that advanced DURING the write raises
:class:`SnapshotConflict` (retry the INSERT) instead of silently
committing against a stale parent.

Scale note (100 TB posture): data never routes through the driver --
tasks stream Arrow batches straight to parquet; the commit is
metadata-only (one manifest JSON).  Each task buffers its own rows
per partition value before writing one file per (task, partition) --
the same memory shape as Spark's unsorted FileFormatWriter; very
wide fan-out per task should pre-``repartition`` by the partition
columns, exactly as with ``DataFrameWriter.partitionBy``.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSourceArrowWriter,
    WriterCommitMessage,
)

from ..snapshots import DATA_DIR, SnapshotConflict
from .snapshot_batch import (
    LocalSnapshotPlanner,
    check_local_root,
    hive_dir_local,
)

#: Identity partition column types the SQL write path can round-trip
#: through a Hive directory name bit-exactly with the Spark writer's
#: own formatting.  Timestamps (session-tz rendering) and floats
#: (repr instability) are refused -- use SnapshotStore.write.
_PART_TYPES = frozenset(
    {"string", "byte", "short", "integer", "long", "date", "boolean"}
)


def _format_part_value(v) -> str | None:
    """Python value -> the string Spark's partitioned writer would put
    in the directory name (before Hive escaping)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)  # int -> digits, datetime.date -> ISO


class LocalSnapshotCommitter(LocalSnapshotPlanner):
    """A Spark-less :class:`~..snapshots.SnapshotStore` that can COMMIT:
    planning IO comes from :class:`LocalSnapshotPlanner`; the commit
    leaves (`_commit_manifest` claim, `_delete_prefix`,
    `_list_partition_dirs`) are local-filesystem implementations, and
    manifest assembly is the inherited
    :meth:`~..snapshots.SnapshotStore._assemble_and_commit_dir` --
    shared with the API write path, never a twin."""

    def _commit_manifest(self, version: int, manifest: dict) -> None:
        # Claim semantics identical to write_atomic_claim's file://
        # arm: full payload to an attempt-unique tmp, then link(2) --
        # hard-link creation fails atomically when the destination
        # exists, so a racing committer loses LOUDLY and readers never
        # observe a torn manifest.  (No shard externalization here:
        # inline checkpoints are always correct; sharding is a
        # Spark-path optimization.)
        final = self._manifest_path(version)
        d = os.path.dirname(final)
        os.makedirs(d, exist_ok=True)
        tmp = f"{d}/.v{version}.json.tmp.{uuid.uuid4().hex[:12]}"
        with open(tmp, "wb") as fh:
            fh.write(json.dumps(manifest).encode("utf-8"))
        try:
            os.link(tmp, final)
        except FileExistsError:
            os.unlink(tmp)
            raise SnapshotConflict(
                f"version {version} already committed at {final}"
            ) from None
        os.unlink(tmp)

    def _delete_prefix(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def _dir_file_sizes(self, data_path: str, depth: int) -> dict[str, int]:
        from ..snapshots import _local_dir_file_sizes

        return _local_dir_file_sizes(data_path, depth)

    def _list_partition_dirs(self, data_path: str, depth: int) -> list[str]:
        def leaves(p: str, d: int, rel: str):
            if d == 0:
                yield rel
                return
            try:
                names = sorted(os.listdir(p))
            except FileNotFoundError:
                return
            for name in names:
                fp = f"{p}/{name}"
                if os.path.isdir(fp):
                    yield from leaves(
                        fp, d - 1, f"{rel}/{name}" if rel else name
                    )

        return sorted(leaves(data_path, depth, ""))


@dataclass
class _TaskFiles(WriterCommitMessage):
    n_rows: int
    n_files: int


class SnapshotTableArrowWriter(DataSourceArrowWriter):
    """Batch writer half of the ``snapshot_table`` Python DataSource.
    Options: ``path`` (table root, local -- same contract as the batch
    reader), ``partition_by`` (comma-separated IDENTITY columns; only
    honored when the table does not exist yet -- an existing table's
    spec is inherited and a conflicting option refuses),
    ``metadata_json`` (JSON object recorded verbatim in the manifest,
    e.g. a job id)."""

    def __init__(self, schema, overwrite: bool, options: dict):
        root = options.get("path")
        if not root:
            raise ValueError("snapshot_table write requires a path")
        self.root = check_local_root(root)
        self.mode = "snapshot" if overwrite else "append"
        self.metadata = json.loads(options.get("metadata_json") or "{}")
        frame = json.loads(schema.json())
        frame_names = [f["name"] for f in frame["fields"]]
        ftypes = {f["name"]: f["type"] for f in frame["fields"]}

        c = LocalSnapshotCommitter.for_root(self.root)
        self.parent_v = c.current_version()
        parent = (
            c._read_manifest(self.parent_v)
            if self.parent_v is not None
            else None
        )
        if parent is not None and parent.get("partition_transforms"):
            raise ValueError(
                "table uses hidden-partitioning transforms "
                f"{parent['partition_transforms']}; the SQL write path "
                "cannot recompute routing columns -- write through "
                "SnapshotStore.write"
            )
        opt_pby = [
            p.strip()
            for p in (options.get("partition_by") or "").split(",")
            if p.strip()
        ]
        if parent is not None and self.mode == "append":
            pby = list(parent["partition_by"])
            if opt_pby and opt_pby != pby:
                raise ValueError(
                    f"partition_by {opt_pby} != table's {pby}; the SQL "
                    "write path does not evolve partition specs"
                )
            specs = set(
                map(tuple, _filled_dir_specs_local(parent).values())
            )
            if specs - {tuple(pby)}:
                raise ValueError(
                    "table has mixed partition specs (spec evolution); "
                    "append through SnapshotStore.write"
                )
        else:
            pby = opt_pby or (
                list(parent["partition_by"]) if parent is not None else []
            )
        missing = [p for p in pby if p not in frame_names]
        if missing:
            raise ValueError(
                f"partition columns {missing} not in the written frame "
                f"{frame_names}"
            )
        bad = {
            p: ftypes[p]
            for p in pby
            if not (
                isinstance(ftypes[p], str) and ftypes[p] in _PART_TYPES
            )
        }
        if bad:
            raise ValueError(
                f"partition column types {bad} not supported by the SQL "
                f"write path (supported: {sorted(_PART_TYPES)}); use "
                "SnapshotStore.write"
            )
        self.pby = pby

        # Field-id schema evolution: the same stale-producer refusal and
        # evolved-schema merge as SnapshotStore.write (pure dict logic).
        slog = (parent or {}).get("schema_log")
        if slog and self.mode != "snapshot":
            live_ids = {int(f["id"]) for f in slog[-1]["fields"]}
            cur_names = {f["name"] for f in slog[-1]["fields"]}
            renamed_away = set()
            for e in slog:
                for f in e["fields"]:
                    if int(f["id"]) in live_ids and f["name"] not in cur_names:
                        renamed_away.add(f["name"])
                for fid_s, nm in (e.get("synced") or {}).items():
                    if int(fid_s) in live_ids and nm not in cur_names:
                        renamed_away.add(nm)
            stale = sorted(renamed_away & set(frame_names))
            if stale:
                raise ValueError(
                    f"columns {stale} were renamed by evolve_schema; "
                    "write with the current names (see the manifest's "
                    "schema_log)"
                )
            pfields = json.loads(parent["schema"])["fields"]
            known = {f["name"] for f in pfields}
            extra = [f for f in frame["fields"] if f["name"] not in known]
            self.schema_json = json.dumps(
                {"type": "struct", "fields": pfields + extra}
            )
        else:
            self.schema_json = schema.json()
        self.slog = slog

        latest = c.latest_version()
        self.version = 0 if latest is None else latest + 1
        self.vdir = f"v{self.version}-{uuid.uuid4().hex[:8]}"
        self.data_path = f"{self.root}/{DATA_DIR}/{self.vdir}"
        # exists up front so an all-empty-tasks write still commits a
        # listable (empty) directory
        os.makedirs(self.data_path, exist_ok=True)

    # -- executor side -------------------------------------------------------

    def write(self, iterator) -> _TaskFiles:
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        bufs: dict[str, list] = {}
        for batch in iterator:
            tab = pa.Table.from_batches([batch])
            if not self.pby:
                bufs.setdefault("", []).append(tab)
                continue
            combos = tab.group_by(self.pby).aggregate([])
            for i in range(combos.num_rows):
                vals = tuple(
                    combos.column(c)[i].as_py() for c in self.pby
                )
                mask = None
                for col_name, v in zip(self.pby, vals):
                    col = tab.column(col_name)
                    if v is None:
                        m = pc.is_null(col)
                    else:
                        m = pc.fill_null(
                            pc.equal(col, pa.scalar(v, type=col.type)),
                            False,
                        )
                    mask = m if mask is None else pc.and_(mask, m)
                part = hive_dir_local(
                    self.pby, tuple(_format_part_value(v) for v in vals)
                )
                bufs.setdefault(part, []).append(
                    tab.filter(mask).drop_columns(list(self.pby))
                )
        n_rows = n_files = 0
        for part, tabs in bufs.items():
            out = pa.concat_tables(tabs)
            if out.num_rows == 0:
                continue
            dirp = f"{self.data_path}/{part}" if part else self.data_path
            os.makedirs(dirp, exist_ok=True)
            pq.write_table(out, f"{dirp}/part-{uuid.uuid4().hex}.parquet")
            n_rows += out.num_rows
            n_files += 1
        return _TaskFiles(n_rows=n_rows, n_files=n_files)

    # -- driver side (Python worker, no SparkSession) -------------------------

    def commit(self, messages) -> None:
        c = LocalSnapshotCommitter.for_root(self.root)
        latest = c.latest_version()
        if (latest if latest is not None else -1) != self.version - 1:
            # The table advanced between plan and commit: committing
            # against the pinned parent would silently drop the
            # interleaved commit (lost update) -- refuse; the claim
            # below only arbitrates SAME-version races.
            c._delete_prefix(self.data_path)
            raise SnapshotConflict(
                f"table advanced during the write (planned v{self.version}, "
                f"head now v{latest}); retry the INSERT"
            )
        parent = (
            c._read_manifest(self.parent_v)
            if self.parent_v is not None
            else None
        )
        n_rows = sum(m.n_rows for m in messages if m is not None)
        c._assemble_and_commit_dir(
            version=self.version,
            vdir=self.vdir,
            data_path=self.data_path,
            parent=parent,
            parent_v=self.parent_v,
            mode=self.mode,
            pby=self.pby,
            transforms={},
            schema_json=self.schema_json,
            slog=self.slog,
            metadata={**self.metadata, "sql_write": True, "n_rows": n_rows},
            claimed_partitions=None,
            watermarks=None,
            staged=None,
        )

    def abort(self, messages) -> None:
        shutil.rmtree(self.data_path, ignore_errors=True)


def _filled_dir_specs_local(manifest: dict) -> dict[str, list[str]]:
    from ..snapshots import _filled_dir_specs

    return _filled_dir_specs(manifest)
