"""SQL catalog surface: named tables, DDL, ``spark.sql`` queries.

The reference's entire storage identity is named tables -- ``CREATE
SCHEMA IF NOT EXISTS`` + ``CREATE TABLE IF NOT EXISTS catalog.db.table
(...) USING ICEBERG PARTITIONED BY (...)`` (reference
spark/jobs/job_silver.py:63-88, job_gold.py:7-19), queried with SQL text
over three-part names (job_gold.py:71-88).  This module re-expresses
that surface Spark-first against the *session* catalog:

 * DDL is generated from the same declarative describe-list that drives
   :mod:`.conform` -- one schema source of truth, not a hand-typed DDL
   string to drift out of sync (the reference maintains both).
 * ``USING parquet`` by default; ``table_format="iceberg"`` emits the
   reference's exact DDL shape (``USING ICEBERG PARTITIONED BY (...)``,
   job_silver.py:66-88) and :data:`ICEBERG_WRITE_OPTIONS` carries its
   snapshot-retention write options (job_silver.py:174-178).  This
   container has no iceberg-spark-runtime jar, so the Iceberg form is
   pinned at the SQL-parser level by tests/test_iceberg_syntax.py
   (statements parse; execution is exercised only where the jar +
   ``spark.sql.catalog.*`` conf are present) -- syntax-validated, not
   runtime-validated, offline.
 * Partition replacement uses dynamic-overwrite ``INSERT OVERWRITE``
   semantics, not the reference's full-table ``saveAsTable`` replace
   (its silent snapshot bug, SURVEY.md section 1.3); ``snapshot``
   remains available for the reference's observable behavior.

Scale notes: everything here is metadata-plane except the inserts, which
inherit the same dynamic-partition-overwrite write path as
:mod:`.storage`; a query via :meth:`SqlCatalog.sql` gets full Catalyst
treatment -- partition pruning from the WHERE clause included.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .schema import DescribeList, data_entries, partition_columns, spark_type

# The reference's Iceberg snapshot-retention write options (reference
# job_silver.py:174-178, job_gold.py:96-101): expire metadata files on
# commit, keep at most 10 previous versions.  Applied by writers only
# when the table format is iceberg -- parquet tables have no metadata
# log to retain.
ICEBERG_WRITE_OPTIONS: dict[str, str] = {
    "write.metadata.delete-after-commit.enabled": "true",
    "write.metadata.previous-versions-max": "10",
}


def format_write_options(table_format: str) -> dict[str, str]:
    """Per-format writer options (reference parity for iceberg)."""
    if table_format.lower() == "iceberg":
        return dict(ICEBERG_WRITE_OPTIONS)
    return {}


@dataclass
class SqlCatalog:
    """Named-table surface over the Spark session catalog."""

    spark: SparkSession
    database: str = "dw"
    table_format: str = "parquet"

    def qualified(self, table: str) -> str:
        return table if "." in table else f"{self.database}.{table}"

    # -- DDL -------------------------------------------------------------

    def ensure_database(self, location: str | None = None) -> None:
        """``CREATE SCHEMA IF NOT EXISTS`` (reference job_silver.py:64)."""
        loc = f" LOCATION '{location}'" if location else ""
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {self.database}{loc}")

    def create_table_ddl(self, table: str, describe_list: DescribeList) -> str:
        """The reference's CREATE TABLE statement (job_silver.py:66-88),
        generated from the describe-list instead of hand-typed.
        Partition columns are emitted last (Spark moves them there in the
        resolved schema anyway; emitting them last keeps the DDL order
        identical to the stored order, so positional INSERTs line up)."""
        parts = partition_columns(describe_list)
        cols = [e for e in data_entries(describe_list) if e["col_name"] not in parts] + [
            e for e in data_entries(describe_list) if e["col_name"] in parts
        ]
        col_ddl = ",\n        ".join(
            f"{e['col_name']} {spark_type(e['data_type']).simpleString().upper()}"
            for e in cols
        )
        part_ddl = f"\n    PARTITIONED BY ({', '.join(parts)})" if parts else ""
        # Iceberg retention rides the TABLE, not the writer: insertInto
        # does not honor per-writer .option()s (see _insert_overwrite),
        # so TBLPROPERTIES is the one place every write path -- INSERT
        # OVERWRITE, append, saveAsTable -- picks the policy up from.
        props = format_write_options(self.table_format)
        props_ddl = (
            "\n    TBLPROPERTIES ("
            + ", ".join(f"'{k}'='{v}'" for k, v in sorted(props.items()))
            + ")"
            if props
            else ""
        )
        return (
            f"CREATE TABLE IF NOT EXISTS {self.qualified(table)} (\n"
            f"        {col_ddl}\n"
            f"    )\n    USING {self.table_format}{part_ddl}{props_ddl}"
        )

    def ensure_table(self, table: str, describe_list: DescribeList) -> None:
        self.spark.sql(self.create_table_ddl(table, describe_list))

    # -- DML -------------------------------------------------------------

    def _aligned(self, df: DataFrame, table: str) -> DataFrame:
        """Reorder ``df`` to the table's resolved column order by name --
        ``insertInto`` is positional, and Spark stores partition columns
        last regardless of DDL order."""
        return df.select(*self.spark.table(self.qualified(table)).columns)

    def _insert_overwrite(self, df: DataFrame, table: str, mode: str) -> None:
        """INSERT OVERWRITE with an explicit partition-overwrite mode.

        The mode must not leak: a session-wide
        ``spark.sql.sources.partitionOverwriteMode`` left flipped would
        silently change the semantics of every later overwrite in the
        session -- the exact class of data-loss bug (full-table replace,
        SURVEY.md section 1.3) this module exists to avoid.  A per-writer
        ``.option(...)`` is NOT honored on the ``insertInto`` path (the
        option rides ``save()``, not INSERT), so the conf is set for the
        single statement and restored in ``finally``."""
        key = "spark.sql.sources.partitionOverwriteMode"
        prev = self.spark.conf.get(key, None)
        self.spark.conf.set(key, mode)
        try:
            self._aligned(df, table).write.insertInto(
                self.qualified(table), overwrite=True
            )
        finally:
            if prev is None:
                self.spark.conf.unset(key)
            else:
                self.spark.conf.set(key, prev)

    def overwrite_partitions(self, df: DataFrame, table: str) -> None:
        """Replace only the partitions present in ``df``."""
        self._insert_overwrite(df, table, "dynamic")

    def snapshot(self, df: DataFrame, table: str) -> None:
        """Full-table replace -- the reference's observable write behavior
        (job_silver.py:174-178 despite its partition spec)."""
        self._insert_overwrite(df, table, "static")

    def append(self, df: DataFrame, table: str) -> None:
        self._aligned(df, table).write.insertInto(self.qualified(table), overwrite=False)

    def save_bucketed(
        self,
        df: DataFrame,
        table: str,
        bucket_cols: list[str],
        n_buckets: int = 32,
        sort_cols: list[str] | None = None,
        mode: str = "overwrite",
    ) -> None:
        """Write a bucketed (and optionally sort-ordered) table.

        Bucketing pre-shuffles the data ONCE at write time: two tables
        bucketed on the same key with the same bucket count join with NO
        exchange -- the repeated-join shuffle is paid once, at ingest.
        ``sort_cols`` additionally orders rows inside each bucket file so
        a sort-merge join can skip its sort.  Bucketing requires the
        catalog (``saveAsTable``); path-based writes cannot express it.
        """
        writer = df.write.format(self.table_format).bucketBy(n_buckets, *bucket_cols)
        for k, v in format_write_options(self.table_format).items():
            writer = writer.option(k, v)
        if sort_cols:
            writer = writer.sortBy(*sort_cols)
        writer.mode(mode).saveAsTable(self.qualified(table))

    # -- queries ---------------------------------------------------------

    def sql(self, query: str) -> DataFrame:
        """SQL text over named tables (reference job_gold.py:71-88)."""
        return self.spark.sql(query)

    def read(self, table: str) -> DataFrame:
        return self.spark.table(self.qualified(table))
