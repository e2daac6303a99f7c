"""Table-maintenance job for snapshot-log tables: compaction + retention.

The operational companion to ``backend='snapshots'`` (the reference
bakes its equivalent into write options -- Iceberg's
``write.metadata.delete-after-commit`` / ``previous-versions-max``,
reference job_silver.py:174-178; a real lakehouse ALSO schedules
rewrite-data-files maintenance, which dynamic write options cannot
express).  Run it on a schedule next to the pipeline::

    python -m docker_airflow_spark_minio_spark.jobs.maintenance \\
        --warehouse /lake/warehouse --table dw.tab_brewery \\
        --keep-last 10 --compact

Scale notes: compaction rewrites only fragmented partitions (cost ~
fragmentation); retention is metadata-plane plus deletes of
unreferenced directories.  Compaction commits through the optimistic
protocol (a racing commit simply wins or loses); retention is safe to
run concurrently with writers PROVIDED ``--orphan-grace-hours`` (the
age below which an unreferenced data dir might still be an in-flight
commit) exceeds the longest possible write -- see
``SnapshotStore.expire_snapshots``.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession

from ..snapshots import SnapshotConflict, SnapshotStore, SnapshotTableManager


def run_maintenance(
    spark: SparkSession,
    warehouse: str,
    table: str,
    keep_last: int = 10,
    compact: bool = True,
    orphan_grace_ms: int = 24 * 3600 * 1000,
) -> dict:
    """Compact fragmented partitions (optional), then expire old
    snapshots; returns a summary dict.  A compaction losing an
    optimistic race is reported, not raised -- the next scheduled run
    retries it."""
    store: SnapshotStore = SnapshotTableManager(spark, warehouse).store(table)
    out: dict = {"table": table, "compacted_version": None}
    if compact:
        try:
            out["compacted_version"] = store.compact()
        except SnapshotConflict as exc:
            out["compaction_conflict"] = str(exc)
    out.update(
        store.expire_snapshots(keep_last=keep_last, orphan_grace_ms=orphan_grace_ms)
    )
    return out


def main(argv: list[str] | None = None) -> int:
    from ..session import get_spark_session

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--warehouse", required=True)
    p.add_argument("--table", required=True)
    p.add_argument("--keep-last", type=int, default=10)
    p.add_argument("--compact", action="store_true")
    p.add_argument("--orphan-grace-hours", type=float, default=24.0)
    args = p.parse_args(argv)
    spark = get_spark_session("snapshot-maintenance")
    try:
        print(
            json.dumps(
                run_maintenance(
                    spark,
                    args.warehouse,
                    args.table,
                    keep_last=args.keep_last,
                    compact=args.compact,
                    orphan_grace_ms=int(args.orphan_grace_hours * 3600 * 1000),
                )
            )
        )
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
