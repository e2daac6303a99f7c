"""Streaming CDC: exactly-once MERGE (upsert + delete) into the snapshot log.

The batch CDC path (``storage.merge_upsert``) rewrites affected
partitions with a multi-rename swap; its crash windows are recoverable
but not atomic (its docstring documents the limit).  This sink routes
the same latest-wins merge through :class:`..snapshots.SnapshotStore`
instead, which upgrades both guarantees the reference's Iceberg tables
get from snapshot commits (reference job_silver.py:174-178):

 * **atomic commit** -- the merge lands as ONE manifest rename; a crash
   mid-write leaves an orphan data directory invisible to readers, never
   a half-swapped table.
 * **exactly-once under replay** -- the micro-batch id is recorded IN
   the committed manifest (same atomic unit), both as per-commit
   metadata and as a carried-forward high-water WATERMARK
   (:meth:`SnapshotStore.watermark`): batch ids are monotonic, so a
   replayed batch is detected as ``batch_id <= watermark`` even after
   ``expire_snapshots`` dropped the manifest that recorded it or a
   compaction commit moved the head -- replay detection does not
   depend on retention exceeding the replay horizon.  This closes the
   window the dynamic-overwrite silver sink handles with batch-keyed
   partition overwrite -- here no bookkeeping column is needed in the
   data at all.
 * **deletes** -- a partition rewrite can DROP rows, so CDC delete
   records (``soft_delete_col``) work; dynamic partition overwrite
   alone cannot express a delete without rewriting unrelated rows.

Scale notes: per batch, only partitions PRESENT in the batch are read
back and rewritten (cost ~ changed partitions, not table); the merge
shuffles affected rows + batch once on the key; the affected-partition
list is a driver-side metadata collect (same cardinality dynamic
overwrite tracks); old versions stay readable (time travel) until
``expire_snapshots``.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..snapshots import SnapshotStore

BATCH_KEY = "batch_id"
WATERMARK_KEY = "cdc_batch_id"


def upsert_snapshot_batch(
    store: SnapshotStore,
    updates: DataFrame,
    keys: list[str],
    partition_by: list[str],
    order_by: str,
    batch_id: int | None = None,
    soft_delete_col: str | None = None,
    detect_moved_keys: bool = False,
    strategy: str = "copy_on_write",
) -> int | None:
    """One transactional latest-wins merge; returns the committed
    version, or None when ``batch_id`` was already committed (replay).

    ``strategy='copy_on_write'`` (default): read back the affected
    partitions, merge, rewrite them -- reads stay cheap forever, the
    merge pays the rewrite.  ``strategy='merge_on_read'`` (Iceberg v2
    MERGE): equality-DELETE the batch's keys, then APPEND the
    surviving rows -- the commit never reads the table at all (cost =
    O(batch), not O(affected partitions)), old rows are masked by the
    sequence-numbered delete set until :meth:`SnapshotStore.compact`
    folds them in, and a key that MOVES partitions is handled free
    (the equality delete masks its old row wherever it lives --
    ``detect_moved_keys`` is unnecessary and ignored).  Semantic
    difference, stated plainly: merge-on-read is BATCH-WINS -- the
    batch's latest row per key replaces whatever is stored, without
    comparing ``order_by`` against the stored row the way copy-on-
    write's read-back merge does; use copy-on-write when out-of-order
    batches must lose to already-stored newer rows.

    Exactly-once for merge-on-read spans two commits (delete, then
    append): only the APPEND carries the batch id + watermark, so a
    crash between them replays BOTH -- the duplicate delete set masks
    nothing new, and the append still lands exactly once.  This holds
    under the SINGLE-WRITER assumption a streaming sink already has
    (one query per checkpoint, no other writers on the table): a
    CONCURRENT writer appending one of the batch's keys between the
    crash and the replay would see its row masked by the replayed
    delete (the replay's delete set is newer).  If other writers share
    the table, use copy-on-write, whose merge is one commit.

    Within a key the greatest ``order_by`` wins; on a tie the update
    beats the stored row (re-applying a batch is a no-op).  When
    ``soft_delete_col`` is set, a surviving update with that column true
    removes the key from the table.

    Partition-stable keys: by default the merge reads back ONLY the
    partitions present in the batch (cost ~ changed partitions), which
    assumes a key's partition values never change -- an update that
    moves a key to a new partition value would otherwise leave the old
    row live in its old partition (duplicate key).  If keys can move,
    set ``detect_moved_keys=True``: the merge then semi-joins the batch
    keys against the REST of the table to find and also rewrite the
    partitions holding moved keys' old rows.  That adds one scan of the
    non-claimed partitions per batch (shuffling key columns only), which
    is the unavoidable price of a partition-moving MERGE -- the same
    full-table join Iceberg's MERGE INTO performs.
    """
    already = store.committed_metadata(BATCH_KEY)
    if batch_id is not None and (
        batch_id in already
        or batch_id <= store.watermark(WATERMARK_KEY, -1)
    ):
        return None
    meta = {BATCH_KEY: batch_id} if batch_id is not None else None
    marks = {WATERMARK_KEY: batch_id} if batch_id is not None else None

    if soft_delete_col is None:
        updates = updates.withColumn("__del", F.lit(False))
    else:
        updates = updates.withColumnRenamed(soft_delete_col, "__del")

    if strategy not in ("copy_on_write", "merge_on_read"):
        raise ValueError(f"unknown CDC merge strategy: {strategy}")

    if store.latest_version() is None:
        w0 = Window.partitionBy(*keys).orderBy(F.col(order_by).desc())
        first = (
            updates.withColumn("__rn", F.row_number().over(w0))
            .where((F.col("__rn") == 1) & (~F.col("__del")))
            .drop("__rn", "__del")
        )
        return store.write(
            first,
            mode="snapshot",
            partition_by=partition_by,
            metadata=meta,
            watermarks=marks,
        )

    if strategy == "merge_on_read":
        w0 = Window.partitionBy(*keys).orderBy(F.col(order_by).desc())
        latest = updates.withColumn("__rn", F.row_number().over(w0)).where(
            F.col("__rn") == 1
        )
        # 1) mask every stored row for a batch key (wherever it lives);
        #    carries a distinct metadata key so replay detection reads
        #    only the append's batch id
        store.delete_keys(
            latest.select(*keys),
            list(keys),
            metadata=(
                {f"{BATCH_KEY}_mor_delete": batch_id}
                if batch_id is not None
                else None
            ),
        )
        # 2) append the batch's surviving rows -- the only commit that
        #    advances the batch id/watermark (see docstring)
        survivors = latest.where(~F.col("__del")).drop("__rn", "__del")
        return store.write(
            survivors,
            mode="append",
            partition_by=partition_by,
            metadata=meta,
            watermarks=marks,
        )

    affected = [
        tuple(r) for r in updates.select(*partition_by).distinct().collect()
    ]
    if not affected:
        return None

    def _match(parts: list[tuple]):
        return functools.reduce(
            operator.or_,
            (
                functools.reduce(
                    operator.and_,
                    (
                        F.col(c).isNull() if v is None else F.col(c) == F.lit(v)
                        for c, v in zip(partition_by, vals)
                    ),
                )
                for vals in parts
            ),
        )

    if detect_moved_keys:
        # Partitions (outside the batch's own) still holding a row for a
        # batch key: their old rows must join the merge so latest-wins
        # can retire them, and the partitions must be claimed so the
        # rewrite actually drops the rows.  The negation must be
        # NULL-safe: for a stored row whose partition column is NULL
        # while the batch's values are non-NULL, `_match` evaluates to
        # NULL and a bare `~NULL` (also NULL) would DROP the row from
        # the moved-key scan -- leaving the stale row live in its NULL
        # partition, the exact duplicate-key bug this flag prevents
        # (ADVICE r5, medium).
        moved = [
            tuple(r)
            for r in store.read()
            .where(~F.coalesce(_match(affected), F.lit(False)))
            .join(updates.select(*keys).distinct(), on=keys, how="left_semi")
            .select(*partition_by)
            .distinct()
            .collect()
        ]
        affected += [p for p in moved if p not in affected]
    match = _match(affected)
    base = (
        store.read()
        .where(match)
        .withColumn("__del", F.lit(False))
        .withColumn("__upd", F.lit(0))
    )
    merged = base.unionByName(updates.withColumn("__upd", F.lit(1)))
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_by).desc(), F.col("__upd").desc()
    )
    latest = (
        merged.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (~F.col("__del")))
        .drop("__rn", "__upd", "__del")
    )
    return store.write(
        latest,
        mode="overwrite_partitions",
        partition_by=partition_by,
        metadata=meta,
        watermarks=marks,
        # Claim every batch-touched partition: one whose rows ALL lose
        # the merge (e.g. the last key deleted) must be dropped from the
        # manifest, not left serving its stale files.
        claimed_partitions=affected,
    )


def run_cdc_stream(
    spark: SparkSession,
    updates_dir: str,
    schema: str,
    store_root: str,
    keys: list[str],
    partition_by: list[str],
    order_by: str,
    checkpoint: str,
    soft_delete_col: str | None = None,
    available_now: bool = True,
    on_batch_commit=None,
    detect_moved_keys: bool = False,
    max_files_per_trigger: int | None = None,
    strategy: str = "copy_on_write",
):
    """Stream NDJSON update files into a snapshot-log table as
    exactly-once MERGE commits; returns the StreamingQuery.

    ``on_batch_commit(batch_id)`` fires after the snapshot commit and
    before the checkpoint advances -- the fault-injection point the
    replay test uses to kill inside the worst window.

    ``max_files_per_trigger`` caps files per micro-batch, so one
    availableNow run can deliver SEVERAL merge commits (one per
    micro-batch) from pre-staged update files -- one StreamingQuery
    cold start instead of one per feed batch.  Files are ordered by
    modification time; stage feed batches with distinct mtimes.
    """
    store = SnapshotStore(spark, store_root)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    updates = reader.json(updates_dir)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        upsert_snapshot_batch(
            store,
            batch_df,
            keys=keys,
            partition_by=partition_by,
            order_by=order_by,
            batch_id=batch_id,
            soft_delete_col=soft_delete_col,
            detect_moved_keys=detect_moved_keys,
            strategy=strategy,
        )
        if on_batch_commit is not None:
            on_batch_commit(batch_id)

    writer = (
        updates.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q
