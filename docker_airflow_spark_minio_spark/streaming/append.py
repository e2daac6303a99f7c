"""Streaming append sink: exactly-once inserts into the snapshot log.

The CDC sink (:mod:`.cdc`) is the MERGE path; most silver tables in an
event pipeline are INSERT-ONLY (the reference's brewery feed is a full
re-fetch, but its event-log shape -- ``job_gold.py:40-62`` grouping an
append-only fact table -- is the common case at 100 TB).  This sink
lands each micro-batch as ONE ``mode='append'`` snapshot commit, which
buys the two properties the dynamic-overwrite silver sink
(:mod:`.silver`) approximates with a bookkeeping partition column:

 * **atomic commit** -- the batch becomes visible in one manifest
   rename; readers never see a torn batch;
 * **exactly-once under replay** -- the micro-batch id rides in the
   committed manifest and as a carried-forward high-water watermark
   (monotonic batch ids), so a batch replayed after a crash between
   sink commit and checkpoint advance is detected and skipped even
   after retention dropped the manifest that recorded it.

Append commits are what downstream INCREMENTAL consumers key on:
``SnapshotStore.read_appends`` delivers exactly these batches, and an
:class:`~..matview.IncrementalMatView` over the table refreshes from
the deltas alone -- the composition the ``streaming_matview_gold_live``
registry entry locks down end-to-end.

Scale notes: commit cost is O(batch) -- the table is never read; the
write shuffles the batch once on its partition columns; manifest
deltas keep commit metadata O(touched partitions) per batch.  The
small-files accumulation inherent to frequent appends is the
documented job of :meth:`SnapshotStore.compact(target_rows_per_file=)`
run offline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..snapshots import SnapshotStore

BATCH_KEY = "batch_id"
WATERMARK_KEY = "append_batch_id"


def append_snapshot_batch(
    store: SnapshotStore,
    batch: DataFrame,
    partition_by: list[str],
    batch_id: int | None = None,
    stats_cols: list[str] | None = None,
) -> int | None:
    """Commit one micro-batch as an atomic append; returns the
    committed version, or None when ``batch_id`` was already committed
    (replay).  The guard mirrors the CDC sink's: recorded batch ids
    plus the carried-forward watermark, so replay detection survives
    ``expire_snapshots`` (a distinct watermark key keeps an append
    sink and a CDC sink on the same table from eating each other's
    guards)."""
    if batch_id is not None and (
        batch_id in store.committed_metadata(BATCH_KEY)
        or batch_id <= store.watermark(WATERMARK_KEY, -1)
    ):
        return None
    return store.write(
        batch,
        mode="append",
        partition_by=partition_by,
        metadata={BATCH_KEY: batch_id} if batch_id is not None else None,
        watermarks={WATERMARK_KEY: batch_id} if batch_id is not None else None,
        stats_cols=stats_cols,
    )


def run_append_stream(
    spark: SparkSession,
    files_dir: str,
    schema: str,
    store_root: str,
    partition_by: list[str],
    checkpoint: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    stats_cols: list[str] | None = None,
    on_batch_commit=None,
):
    """Stream NDJSON files into a snapshot-log table as exactly-once
    append commits; returns the StreamingQuery.

    ``on_batch_commit(batch_id, version)`` fires after the snapshot
    commit and before the checkpoint advances (``version`` is None for
    a replay-skipped batch) -- the hook a chained incremental
    materialized-view refresh or metrics emitter runs in; anything it
    does must be idempotent, since a crash inside it replays the
    batch.  ``max_files_per_trigger`` caps files per micro-batch so one
    availableNow run can deliver several append commits from
    pre-staged files (ordered by modification time)."""
    store = SnapshotStore(spark, store_root)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    rows = reader.json(files_dir)

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        version = append_snapshot_batch(
            store,
            batch_df,
            partition_by=partition_by,
            batch_id=batch_id,
            stats_cols=stats_cols,
        )
        if on_batch_commit is not None:
            on_batch_commit(batch_id, version)

    writer = (
        rows.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q
