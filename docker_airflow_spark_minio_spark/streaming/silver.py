"""Incremental silver: the streaming twin of ``jobs/job_silver.py``.

The batch silver job re-reads one day per run (cron semantics,
reference datalake_silver_spark_dag.py).  This variant streams the
bronze landing zone instead: every newly landed NDJSON file becomes a
micro-batch that flows through the SAME conformance projection into the
SAME partitioned table -- no day-level re-reads, no scheduler.

End-to-end exactly-once: the checkpoint's source log guarantees each
file enters exactly one micro-batch, and the sink write is IDEMPOTENT
per batch -- every row carries a ``sys_batch_id`` partition value and
the write is a dynamic partition overwrite, so a batch replayed after a
mid-write failure replaces exactly its own (day, batch) output
directories instead of appending duplicates.  (A blind append sink
would degrade this to at-least-once.)  The cost is one subdirectory
per (day, batch) under the table -- bounded by trigger cadence, and
compactable offline; readers that don't want the bookkeeping column
just drop it.

The partition column rides in from the directory layout
(``sys_file_date=<D>/``): the file source populates it from the path
when it appears in the read schema, and conform casts it to its
declared type like any other column.

Scale notes: each micro-batch writes only the files that arrived --
backfill cost is bounded by ``max_files_per_trigger``; the sink append
is partition-local since rows carry their partition value.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..conform import conform
from ..schema import BREWERY_DESCRIBE_LIST, DescribeList, partition_columns, string_read_schema
from ..storage import TableManager
from .source import stream_bronze


def run_silver_stream(
    spark: SparkSession,
    bronze_dir: str,
    warehouse: str,
    checkpoint: str,
    table: str = "dw.tab_brewery",
    describe_list: DescribeList | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    on_batch_commit=None,
):
    """Start (and with ``available_now`` run to completion) the
    incremental silver load.  Returns the StreamingQuery.

    ``on_batch_commit(batch_id)`` fires AFTER the sink write commits and
    BEFORE the checkpoint advances -- a commit listener for metrics, and
    the fault-injection point the exactly-once restart tests use to
    prove a kill in that window replays without duplicating rows."""
    describe_list = describe_list or BREWERY_DESCRIBE_LIST
    part_cols = partition_columns(describe_list) or ["sys_file_date"]

    # data columns read as strings; partition columns appended so the
    # file source fills them from the directory names
    schema = string_read_schema(describe_list, exclude=part_cols)
    for p in part_cols:
        schema = schema.add(T.StructField(p, T.StringType(), True))

    raw = stream_bronze(
        spark, bronze_dir, schema, max_files_per_trigger=max_files_per_trigger
    )
    out = conform(raw, describe_list)

    manager = TableManager(spark, warehouse)

    def write_batch(batch_df, batch_id: int) -> None:
        # Idempotent, not append: keyed on batch_id, a replay of this
        # batch dynamically overwrites exactly its own partitions.
        manager.write(
            batch_df.withColumn("sys_batch_id", F.lit(batch_id)),
            table,
            partition_by=[*part_cols, "sys_batch_id"],
            mode="overwrite_partitions",
        )
        if on_batch_commit is not None:
            on_batch_commit(batch_id)

    writer = (
        out.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q


def run_gold_stream(
    spark: SparkSession,
    warehouse: str,
    checkpoint: str,
    silver_table: str = "dw.tab_brewery",
    gold_table: str = "dw.tab_brewery_summary",
    available_now: bool = True,
    on_batch_commit=None,
):
    """Incremental gold: watch the silver table's files and re-aggregate
    ONLY the partitions that changed.

    Each micro-batch carries the newly written silver rows; the batch's
    distinct partition values select which days to recompute from the
    full silver table, and a dynamic partition overwrite replaces just
    those days in gold -- the incremental-refresh pattern: work per
    trigger is O(changed partitions), never a full-table rebuild.
    """
    from ..jobs.job_gold import gold_summary

    manager = TableManager(spark, warehouse)
    silver_path = manager.path(silver_table)
    silver_schema = spark.read.parquet(silver_path).schema

    stream = spark.readStream.schema(silver_schema).parquet(silver_path)

    def refresh(batch_df, batch_id: int) -> None:
        # changed partitions only: a metadata-sized collect (distinct
        # partition values in this micro-batch)
        days = [
            r["sys_file_date"]
            for r in batch_df.select("sys_file_date").distinct().collect()
        ]
        if not days:
            return
        silver = manager.read(silver_table).where(
            F.col("sys_file_date").isin(days)
        )
        out = gold_summary(silver)
        manager.write(
            out, gold_table, partition_by=["sys_file_date"], mode="overwrite_partitions"
        )
        if on_batch_commit is not None:
            on_batch_commit(batch_id)

    writer = (
        stream.writeStream.foreachBatch(refresh)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q
