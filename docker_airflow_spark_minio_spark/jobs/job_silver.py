"""Silver job: bronze NDJSON -> conformed partitioned table.

Parity surface (reference spark/jobs/job_silver.py):
  * read one day's NDJSON partition                 (:113, :143-147)
  * guard on empty/missing input                    (:129, :152-154)
  * conform to declared schema                      (:160-168)
  * write partitioned by sys_file_date              (:171-178)

Deviations, on purpose (SURVEY.md section 8):
  * ``df.isEmpty()`` instead of double ``count()`` (:149,:152) -- one scan.
  * explicit all-string read schema instead of full-scan inference
    (:143-147) -- one pass over the day's JSON, not two.
  * per-partition dynamic overwrite instead of full-table replace (:174-178);
    pass ``mode='snapshot'`` for the reference's observable behavior.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .. import fsmeta
from ..catalog import SqlCatalog
from ..conform import conform, conform_with_rejects, with_literal_partition
from ..metrics import RunMetrics, observe_quality
from ..schema import (
    BREWERY_DESCRIBE_LIST,
    DescribeList,
    partition_columns,
    string_read_schema,
)
from ..sources.files import read_ndjson
from ..storage import TableManager


def run_silver(
    spark: SparkSession,
    bronze_dir: str,
    sys_file_date: str,
    warehouse: str,
    table: str = "dw.tab_brewery",
    describe_list: DescribeList | None = None,
    mode: str = "overwrite_partitions",
    metrics: RunMetrics | None = None,
    backend: str = "path",
    quarantine_table: str | None = None,
) -> int:
    """Run the silver conformance load for one day; returns rows written
    (0 = skipped on empty input, mirroring the reference's branch).

    ``backend='path'`` writes a path-rooted parquet table
    (:class:`..storage.TableManager`); ``backend='catalog'`` goes through
    the named-table DDL surface (:class:`..catalog.SqlCatalog`) -- the
    reference's storage identity (CREATE SCHEMA/TABLE IF NOT EXISTS +
    three-part names, reference job_silver.py:63-88), with ``warehouse``
    as the database location."""
    describe_list = describe_list or BREWERY_DESCRIBE_LIST
    metrics = metrics or RunMetrics()
    day_path = f"{bronze_dir.rstrip('/')}/sys_file_date={sys_file_date}"

    if not fsmeta.prefix_exists(spark, day_path):
        metrics.count("rows_written", 0)
        return 0

    part_cols = partition_columns(describe_list) or ["sys_file_date"]
    with metrics.timed("read"):
        # Explicit all-string read schema: no inference pass over the
        # day's JSON (conform try_casts to the declared types after).
        df = read_ndjson(
            spark, day_path, schema=string_read_schema(describe_list, exclude=part_cols)
        )
        if df.isEmpty():
            metrics.count("rows_written", 0)
            return 0

    with metrics.timed("transform_write"):
        if quarantine_table:
            # Route rows that would LOSE a value to the null-on-malformed
            # casts into a reject table (original raw row + the failing
            # column names) instead of silently nulling them -- both
            # frames derive from the same scan, no shuffle.
            out, rejects = conform_with_rejects(df, describe_list)
            rej = with_literal_partition(rejects, part_cols[0], sys_file_date)
            q_manager = TableManager(spark, warehouse)
            q_manager.write(
                rej,
                quarantine_table,
                partition_by=part_cols,
                mode="overwrite_partitions",
            )
            n_rej = (
                q_manager.read(quarantine_table)
                .filter(F.col(part_cols[0]) == sys_file_date)
                .count()
            )
            metrics.count("rows_rejected", n_rej)
        else:
            out = conform(df, describe_list)
        out = with_literal_partition(out, part_cols[0], sys_file_date)
        # Piggybacked data-quality metrics: row + null counts ride the
        # write job itself, zero extra scans (the reference re-counts
        # the frame per metric instead, job_silver.py:149,152).
        quality_cols = [
            e["col_name"]
            for e in describe_list
            if "#" not in e["col_name"] and e["col_name"] not in part_cols
        ][:3]
        out, harvest = observe_quality(out, quality_cols)
        if backend == "catalog":
            db, tbl = table.split(".", 1) if "." in table else ("dw", table)
            cat = SqlCatalog(spark, database=db)
            cat.ensure_database(location=f"{warehouse.rstrip('/')}/{db}")
            cat.ensure_table(tbl, describe_list)
            if mode == "overwrite_partitions":
                cat.overwrite_partitions(out, tbl)
            elif mode == "snapshot":
                cat.snapshot(out, tbl)
            else:
                cat.append(out, tbl)
            read_back = cat.read(tbl)
        elif backend == "snapshots":
            from ..snapshots import SnapshotTableManager

            manager = SnapshotTableManager(spark, warehouse)
            manager.write(out, table, partition_by=part_cols, mode=mode)
            read_back = manager.read(table)
        else:
            manager = TableManager(spark, warehouse)
            manager.write(out, table, partition_by=part_cols, mode=mode)
            read_back = manager.read(table)

    for name, value in harvest().items():
        metrics.count(f"observed_{name}", int(value))
    n = read_back.filter(read_back[part_cols[0]] == sys_file_date).count()
    metrics.count("rows_written", n)
    return n
