"""Partitioned table storage.

The reference writes Iceberg tables with ``mode("overwrite").saveAsTable``
which replaces the ENTIRE table despite the partition spec (reference
job_silver.py:174-178, job_gold.py:98-102; SURVEY.md section 1.3).  This
module provides both semantics explicitly:

 * ``overwrite_partitions`` (default) -- true per-partition idempotent
   overwrite: re-running a day replaces only that day's partitions.
 * ``snapshot`` -- full-table replace, the reference's observable behavior.

Backend is path-rooted Parquet (``file_format`` is pluggable); the
``maxRecordsPerFile`` bound keeps file sizes sane at 100 TB scale.  The
reference's Iceberg-specific surface (snapshot retention options) is a
deployment concern of its catalog, not of these write semantics; the
named-table/SQL surface lives in :mod:`.catalog`.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class TableManager:
    """Path-rooted warehouse of partitioned tables.

    ``warehouse`` is any Hadoop-FS URI (file://, s3a://, hdfs://) -- the
    same role as the reference's ``s3a://<bucket>/warehouse`` (reference
    job_silver.py:117, job_gold.py:53-57).
    """

    spark: SparkSession
    warehouse: str
    file_format: str = "parquet"
    max_records_per_file: int = 5_000_000

    def path(self, table: str) -> str:
        """`db.table` -> warehouse path (mirrors the reference's
        catalog.db.table three-part layout, job_silver.py:64)."""
        return f"{self.warehouse.rstrip('/')}/{table.replace('.', '/')}"

    # -- writes ----------------------------------------------------------

    def write(
        self,
        df: DataFrame,
        table: str,
        partition_by: list[str] | None = None,
        mode: str = "overwrite_partitions",
        sort_within_partitions: list[str] | None = None,
        global_sort_by: list[str] | None = None,
        global_sort_shards: int | None = None,
    ) -> str:
        """Write ``df`` as a partitioned table; returns the table path.

        mode: 'overwrite_partitions' | 'snapshot' | 'append'

        ``sort_within_partitions`` clusters rows inside each task's
        output files (no shuffle): parquet min/max row-group stats on
        those columns become tight, so later range predicates skip
        row groups instead of scanning them.

        ``global_sort_by`` produces a TOTALLY ordered layout: range
        repartition on the keys (sampled range boundaries -- the
        distributed sort, no single reducer) + per-task sort, so file N
        holds strictly smaller keys than file N+1 and every file is
        internally sorted.  The export pattern for consumers that read
        sequentially (tokenizer shards, merge-join inputs); costs one
        range-exchange shuffle.  Mutually exclusive with
        ``sort_within_partitions``.  ``global_sort_shards`` pins the
        shard count (otherwise spark.sql.shuffle.partitions, which AQE
        may coalesce for small outputs).
        """
        if global_sort_by:
            if sort_within_partitions:
                raise ValueError(
                    "global_sort_by already sorts within partitions"
                )
            if global_sort_shards:
                df = df.repartitionByRange(global_sort_shards, *global_sort_by)
            else:
                df = df.repartitionByRange(*global_sort_by)
            sort_within_partitions = global_sort_by
        path = self.path(table)
        self._write_path(df, path, partition_by, mode, sort_within_partitions)
        return path

    def _write_path(
        self,
        df: DataFrame,
        path: str,
        partition_by: list[str] | None,
        mode: str,
        sort_within_partitions: list[str] | None = None,
    ) -> None:
        if sort_within_partitions:
            df = df.sortWithinPartitions(*sort_within_partitions)
        writer = df.write.format(self.file_format).option(
            "maxRecordsPerFile", str(self.max_records_per_file)
        )
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        if mode == "overwrite_partitions":
            # Dynamic overwrite replaces only partitions present in df.
            writer = writer.option("partitionOverwriteMode", "dynamic").mode("overwrite")
        elif mode == "snapshot":
            writer = writer.option("partitionOverwriteMode", "static").mode("overwrite")
        elif mode == "append":
            writer = writer.mode("append")
        else:
            raise ValueError(f"unknown write mode: {mode}")
        writer.save(path)

    def merge_upsert(
        self,
        updates: DataFrame,
        table: str,
        keys: list[str],
        partition_by: list[str],
        order_by: str,
    ) -> str:
        """Key-based upsert (MERGE latest-wins) into a partitioned table.

        The CDC pattern the reference's full-table overwrite cannot
        express (SURVEY.md section 1.3): only partitions PRESENT IN THE
        UPDATE BATCH are read back, merged, and rewritten -- cost scales
        with the changed partitions, not the table.  Within a key,
        the row with the greatest ``order_by`` value survives; on a tie
        the update beats the existing row (deterministic re-apply:
        running the same batch twice is a no-op).

        Affected partitions are cleared explicitly before the rewrite:
        dynamic partition overwrite alone only replaces partitions
        present in the OUTPUT, so an affected partition whose rows all
        lose the merge (e.g. a key moving days) would otherwise keep its
        stale copy -- found by the hypothesis model test.  An update
        moving a key to a partition NOT in the batch still leaves the
        old partition untouched (the usual CDC contract: the partition
        column is part of the record identity).

        Durability: the merged rows are STAGED to a temp prefix before
        any live partition is touched (the write_bronze write-then-swap
        pattern), then swapped in with per-partition renames.  The swap
        never depends on the deleted source files -- an executor loss
        cannot trigger a lineage recompute over deleted data, and a
        crash mid-swap leaves every partition either old-complete,
        new-complete, or absent-but-present-in-tmp -- the next
        merge_upsert call auto-completes the interrupted swap from the
        staging prefix before doing anything else, so nothing is ever
        silently empty.  (On S3-like stores rename is a server-side
        copy, not atomic -- same caveat as every path-rooted swap.)

        Scale notes: the affected-partition list is collected driver-side
        -- it is partition METADATA (days, not rows), the same
        cardinality dynamic partition overwrite itself tracks.  The merge
        shuffles only the affected partitions' rows + the batch, once,
        on the key.
        """
        import functools
        import operator

        from pyspark.sql import Window, functions as F

        path = self.path(table)
        tmp_path = f"{path}__merge_tmp"
        # Complete a previous crashed swap FIRST: a partition staged in
        # tmp whose live copy is missing was deleted mid-swap -- move it
        # in before reading the current state, or the retry would merge
        # against (and then discard) a table missing those rows.
        self._recover_staging(path, tmp_path, len(partition_by))
        # A read attempt is the backend-portable existence probe
        # (AnalysisException -> first load).
        try:
            existing = self.read(table)
        except Exception:  # noqa: BLE001 -- missing table: first load
            w0 = Window.partitionBy(*keys).orderBy(F.col(order_by).desc())
            first = (
                updates.withColumn("__rn", F.row_number().over(w0))
                .where(F.col("__rn") == 1)
                .drop("__rn")
            )
            return self.write(
                first, table, partition_by=partition_by, mode="overwrite_partitions"
            )
        affected = [
            tuple(r) for r in updates.select(*partition_by).distinct().collect()
        ]
        if not affected:
            # Empty update batch on an existing table: a no-op (and the
            # or-reduce below would raise on an empty iterable).
            return path
        match = functools.reduce(
            operator.or_,
            (
                functools.reduce(
                    operator.and_,
                    (
                        F.col(c).isNull() if v is None else F.col(c) == F.lit(v)
                        for c, v in zip(partition_by, vals)
                    ),
                )
                for vals in affected
            ),
        )
        base = existing.where(match).withColumn("__upd", F.lit(0))
        merged = base.unionByName(updates.withColumn("__upd", F.lit(1)))
        w = Window.partitionBy(*keys).orderBy(
            F.col(order_by).desc(), F.col("__upd").desc()
        )
        latest = (
            merged.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn", "__upd")
        )
        from .fsmeta import _fs_and_path, delete_prefix, rename

        # Stage durably FIRST: once the temp write commits, the merged
        # rows exist on the target filesystem and nothing below re-reads
        # the soon-to-be-deleted source partitions.
        delete_prefix(self.spark, tmp_path)
        self._write_path(latest, tmp_path, partition_by, "snapshot")

        fs, _ = _fs_and_path(self.spark, path)
        jvm_path = self.spark._jvm.org.apache.hadoop.fs.Path
        for vals in affected:
            # Directory names must match what Spark's writer produced:
            # Hive path escaping + __HIVE_DEFAULT_PARTITION__ for null
            # (a raw f-string over a value like 'a:b' would probe a
            # nonexistent dir and silently skip the swap).
            part_dir = self._partition_dir(partition_by, vals)
            delete_prefix(self.spark, f"{path}/{part_dir}")
            src = jvm_path(f"{tmp_path}/{part_dir}")
            if fs.exists(src):
                dst = jvm_path(f"{path}/{part_dir}")
                fs.mkdirs(dst.getParent())
                rename(self.spark, f"{tmp_path}/{part_dir}", f"{path}/{part_dir}")
            # else: every row of this partition lost the merge -- the
            # delete alone is the correct result (see docstring).
        delete_prefix(self.spark, tmp_path)
        return path

    def _partition_dir(self, partition_by: list[str], vals: tuple) -> str:
        from .fsmeta import hive_partition_dir

        return hive_partition_dir(self.spark, partition_by, vals)

    def _recover_staging(self, path: str, tmp_path: str, depth: int) -> None:
        """Finish a crashed merge swap: every partition directory staged
        under ``tmp_path`` whose live twin is MISSING was deleted
        mid-swap -- move it into place (the live copy, when present, is
        authoritative: the crash happened before its delete).  Always
        ends by clearing the staging prefix.

        Known limit: on stores where recursive delete/rename are not
        atomic (S3 without a committer), a crash INSIDE one of those
        operations can leave a partial live directory, which this
        recovery then treats as authoritative.  Closing that window
        needs a per-partition commit marker or a table format with
        snapshot commits (catalog.py's iceberg path) -- documented
        rather than half-solved here."""
        from .fsmeta import _fs_and_path, delete_prefix

        fs, tmp_p = _fs_and_path(self.spark, tmp_path)
        if not fs.exists(tmp_p):
            return
        jvm_path = self.spark._jvm.org.apache.hadoop.fs.Path

        def leaves(p, d: int, rel: str):
            if d == 0:
                yield p, rel
                return
            for st in fs.listStatus(p):
                if st.isDirectory():
                    name = st.getPath().getName()
                    yield from leaves(
                        st.getPath(), d - 1, f"{rel}/{name}" if rel else name
                    )

        for leaf, rel in leaves(tmp_p, depth, ""):
            dst = jvm_path(f"{path}/{rel}")
            if not fs.exists(dst):
                fs.mkdirs(dst.getParent())
                fs.rename(leaf, dst)
        delete_prefix(self.spark, tmp_path)

    # -- reads -----------------------------------------------------------

    def read(self, table: str) -> DataFrame:
        """Partition-aware read; Catalyst prunes partitions from filters on
        the partition columns (the reference prunes manually by embedding
        the partition directory in the read path, job_silver.py:113)."""
        return self.spark.read.format(self.file_format).load(self.path(table))

    def read_partition(self, table: str, **partition_values: str) -> DataFrame:
        """Read with partition predicates applied (prunable)."""
        df = self.read(table)
        for col, value in partition_values.items():
            df = df.filter(df[col] == value)
        return df
