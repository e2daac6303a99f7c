"""Streaming CDC into the snapshot log: merge semantics, deletes,
time travel, and exactly-once across the commit-to-checkpoint window.
"""

from __future__ import annotations

import json
import os

import pytest

from docker_airflow_spark_minio_spark.snapshots import SnapshotStore
from docker_airflow_spark_minio_spark.streaming.cdc import run_cdc_stream

SCHEMA = "id INT, v STRING, day STRING, ts INT, deleted BOOLEAN"


def _write_updates(updates_dir: str, name: str, rows: list[dict]) -> None:
    os.makedirs(updates_dir, exist_ok=True)
    with open(os.path.join(updates_dir, name), "w", encoding="utf-8") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(spark, tmp_path, **kw):
    return run_cdc_stream(
        spark,
        str(tmp_path / "upd"),
        SCHEMA,
        str(tmp_path / "tab"),
        keys=["id"],
        partition_by=["day"],
        order_by="ts",
        checkpoint=str(tmp_path / "ckpt"),
        soft_delete_col="deleted",
        **kw,
    )


def _table(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "tab"))
    return sorted(
        (r["id"], r["v"], r["day"]) for r in store.read().collect()
    )


def test_cdc_upsert_delete_and_time_travel(spark, tmp_path):
    upd = str(tmp_path / "upd")
    _write_updates(
        upd,
        "b0.json",
        [
            {"id": 1, "v": "a", "day": "d1", "ts": 1, "deleted": False},
            {"id": 2, "v": "b", "day": "d1", "ts": 1, "deleted": False},
            {"id": 3, "v": "c", "day": "d2", "ts": 1, "deleted": False},
        ],
    )
    _run(spark, tmp_path)
    assert _table(spark, tmp_path) == [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2")]

    # update id=1, DELETE id=2, insert id=4; d2 untouched
    _write_updates(
        upd,
        "b1.json",
        [
            {"id": 1, "v": "a2", "day": "d1", "ts": 2, "deleted": False},
            {"id": 2, "v": "b", "day": "d1", "ts": 2, "deleted": True},
            {"id": 4, "v": "d", "day": "d1", "ts": 2, "deleted": False},
        ],
    )
    _run(spark, tmp_path)
    assert _table(spark, tmp_path) == [(1, "a2", "d1"), (3, "c", "d2"), (4, "d", "d1")]

    store = SnapshotStore(spark, str(tmp_path / "tab"))
    # d2 still served by v0's files (only d1 was rewritten)
    m = store._read_manifest(store.latest_version())
    (d2,) = m["partitions"]["day=d2"]
    assert d2.startswith("v0-")
    # time travel shows the pre-merge state including the deleted row
    v0 = sorted((r["id"], r["v"]) for r in store.read(as_of=0).collect())
    assert v0 == [(1, "a"), (2, "b"), (3, "c")]
    # batch ids rode the manifests
    assert store.committed_metadata("batch_id") == {0, 1}


def test_cdc_delete_empties_whole_partition(spark, tmp_path):
    # The bug the first library drive caught: when a delete removes the
    # LAST row of a partition, the merge output holds no rows for it, so
    # partition-presence inference would keep the stale files; the sink
    # must claim the partition and drop it from the manifest.
    upd = str(tmp_path / "upd")
    _write_updates(
        upd,
        "b0.json",
        [
            {"id": 1, "v": "a", "day": "d1", "ts": 1, "deleted": False},
            {"id": 2, "v": "b", "day": "d2", "ts": 1, "deleted": False},
        ],
    )
    _run(spark, tmp_path)
    _write_updates(
        upd, "b1.json", [{"id": 2, "v": "b", "day": "d2", "ts": 2, "deleted": True}]
    )
    _run(spark, tmp_path)
    assert _table(spark, tmp_path) == [(1, "a", "d1")]
    store = SnapshotStore(spark, str(tmp_path / "tab"))
    m = store._read_manifest(store.latest_version())
    assert "day=d2" not in m["partitions"]
    # ... but time travel to v0 still shows it
    assert sorted(r["id"] for r in store.read(as_of=0).collect()) == [1, 2]


def test_cdc_stale_update_loses(spark, tmp_path):
    upd = str(tmp_path / "upd")
    _write_updates(
        upd, "b0.json", [{"id": 1, "v": "new", "day": "d1", "ts": 5, "deleted": False}]
    )
    _run(spark, tmp_path)
    _write_updates(
        upd, "b1.json", [{"id": 1, "v": "old", "day": "d1", "ts": 3, "deleted": False}]
    )
    _run(spark, tmp_path)
    assert _table(spark, tmp_path) == [(1, "new", "d1")]


def test_cdc_replay_after_kill_between_commit_and_checkpoint(spark, tmp_path):
    upd = str(tmp_path / "upd")
    _write_updates(
        upd,
        "b0.json",
        [
            {"id": 1, "v": "a", "day": "d1", "ts": 1, "deleted": False},
            {"id": 2, "v": "b", "day": "d1", "ts": 1, "deleted": False},
        ],
    )

    class Kill(Exception):
        pass

    def die_after_commit(batch_id: int) -> None:
        raise Kill(f"killed after commit of batch {batch_id}")

    with pytest.raises(Exception):  # StreamingQueryException wrapping Kill
        _run(spark, tmp_path, on_batch_commit=die_after_commit)

    # The snapshot committed before the kill.
    store = SnapshotStore(spark, str(tmp_path / "tab"))
    assert store.versions() == [0]

    # Restart with the same checkpoint: batch 0 replays, is detected as
    # committed via its manifest batch id, and is NOT re-applied.
    _run(spark, tmp_path)
    store = SnapshotStore(spark, str(tmp_path / "tab"))
    assert store.versions() == [0]  # no duplicate commit
    assert _table(spark, tmp_path) == [(1, "a", "d1"), (2, "b", "d1")]

    # New data after recovery still flows.
    _write_updates(
        upd, "b1.json", [{"id": 3, "v": "c", "day": "d1", "ts": 2, "deleted": False}]
    )
    _run(spark, tmp_path)
    assert _table(spark, tmp_path) == [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d1")]


def test_cdc_delete_empties_whole_table_then_recovers(spark, tmp_path):
    # ADVICE r4: a batch whose deletes empty EVERY partition commits a
    # zero-partition manifest; read() must serve an empty typed frame
    # (not raise), or the next micro-batch wedges the stream forever.
    upd = str(tmp_path / "upd")
    _write_updates(
        upd, "b0.json", [{"id": 1, "v": "a", "day": "d1", "ts": 1, "deleted": False}]
    )
    _run(spark, tmp_path)
    _write_updates(
        upd, "b1.json", [{"id": 1, "v": "a", "day": "d1", "ts": 2, "deleted": True}]
    )
    _run(spark, tmp_path)
    store = SnapshotStore(spark, str(tmp_path / "tab"))
    empty = store.read()
    assert empty.count() == 0
    assert {"id", "v", "day"} <= set(empty.columns)
    # the stream keeps flowing after the empty state
    _write_updates(
        upd, "b2.json", [{"id": 2, "v": "b", "day": "d2", "ts": 3, "deleted": False}]
    )
    _run(spark, tmp_path)
    assert _table(spark, tmp_path) == [(2, "b", "d2")]


def test_cdc_moved_key_detection(spark, tmp_path):
    # ADVICE r4: an update that MOVES a key to a different partition value
    # leaves the old row live under the default partition-stable contract;
    # detect_moved_keys=True finds and rewrites the old partition too.
    upd = str(tmp_path / "upd")
    _write_updates(
        upd,
        "b0.json",
        [
            {"id": 1, "v": "a", "day": "d1", "ts": 1, "deleted": False},
            {"id": 2, "v": "b", "day": "d1", "ts": 1, "deleted": False},
        ],
    )
    _run(spark, tmp_path, detect_moved_keys=True)
    # id=1 moves d1 -> d2
    _write_updates(
        upd, "b1.json", [{"id": 1, "v": "a2", "day": "d2", "ts": 2, "deleted": False}]
    )
    _run(spark, tmp_path, detect_moved_keys=True)
    # exactly one row for id=1, in its NEW partition; id=2 untouched
    assert _table(spark, tmp_path) == [(1, "a2", "d2"), (2, "b", "d1")]


def test_cdc_moved_key_out_of_null_partition(spark, tmp_path):
    # ADVICE r5 (medium): a stored row whose partition column is NULL must
    # still be found by the moved-key scan when its key moves to a
    # non-NULL partition -- `~_match(affected)` evaluates to NULL (not
    # true) for such rows unless negated NULL-safely, silently leaving
    # the stale NULL-partition row live (duplicate key).
    upd = str(tmp_path / "upd")
    _write_updates(
        upd,
        "b0.json",
        [
            {"id": 1, "v": "a", "day": None, "ts": 1, "deleted": False},
            {"id": 2, "v": "b", "day": "d1", "ts": 1, "deleted": False},
        ],
    )
    _run(spark, tmp_path, detect_moved_keys=True)
    assert _table(spark, tmp_path) == [(1, "a", None), (2, "b", "d1")]
    # id=1 moves NULL -> d2: the old NULL-partition row must be retired
    _write_updates(
        upd, "b1.json", [{"id": 1, "v": "a2", "day": "d2", "ts": 2, "deleted": False}]
    )
    _run(spark, tmp_path, detect_moved_keys=True)
    assert _table(spark, tmp_path) == [(1, "a2", "d2"), (2, "b", "d1")]


def test_cdc_moved_key_into_null_partition(spark, tmp_path):
    # Mirror case: a key moving INTO the NULL partition must retire its
    # old non-NULL-partition row (exercises _match's isNull branch for
    # affected values together with the NULL-safe negation).
    upd = str(tmp_path / "upd")
    _write_updates(
        upd,
        "b0.json",
        [
            {"id": 1, "v": "a", "day": "d1", "ts": 1, "deleted": False},
            {"id": 2, "v": "b", "day": "d1", "ts": 1, "deleted": False},
        ],
    )
    _run(spark, tmp_path, detect_moved_keys=True)
    _write_updates(
        upd, "b1.json", [{"id": 1, "v": "a2", "day": None, "ts": 2, "deleted": False}]
    )
    _run(spark, tmp_path, detect_moved_keys=True)
    assert _table(spark, tmp_path) == [(1, "a2", None), (2, "b", "d1")]


def test_cdc_replay_detection_survives_retention(spark, tmp_path):
    # ADVICE r4: replay detection must not depend on the manifest that
    # recorded the batch id surviving retention -- the high-water batch id
    # is carried forward into every descendant manifest.
    upd = str(tmp_path / "upd")
    _write_updates(
        upd, "b0.json", [{"id": 1, "v": "a", "day": "d1", "ts": 1, "deleted": False}]
    )
    _run(spark, tmp_path)
    _write_updates(
        upd, "b1.json", [{"id": 2, "v": "b", "day": "d1", "ts": 2, "deleted": False}]
    )
    _run(spark, tmp_path)
    store = SnapshotStore(spark, str(tmp_path / "tab"))
    # retention drops the manifests that recorded batches 0 and 1 ...
    store.write(
        store.read(), mode="snapshot", partition_by=["day"]
    )  # compaction-like commit carries the watermark forward
    store.expire_snapshots(keep_last=1, orphan_grace_ms=0)
    assert store.committed_metadata("batch_id") == set()  # metadata gone
    assert store.watermark("cdc_batch_id") == 1  # watermark survived
    # ... yet a replay of batch id 1 is still skipped
    from docker_airflow_spark_minio_spark.streaming.cdc import upsert_snapshot_batch

    replay = spark.createDataFrame(
        [(2, "b-DUP", "d1", 2, False)], SCHEMA
    )
    assert (
        upsert_snapshot_batch(
            store,
            replay,
            keys=["id"],
            partition_by=["day"],
            order_by="ts",
            batch_id=1,
            soft_delete_col="deleted",
        )
        is None
    )
    assert _table(spark, tmp_path) == [(1, "a", "d1"), (2, "b", "d1")]


def test_cdc_single_run_multibatch_kill_replay(spark, tmp_path):
    """Round-6 mode: one availableNow run delivering SEVERAL merge
    commits via max_files_per_trigger=1 must keep exactly-once when
    killed mid-run -- the committed batch is detected on restart via
    its manifest batch id and skipped, the staged remainder applies."""
    import os
    import time as _time

    upd = str(tmp_path / "upd")
    _write_updates(
        upd, "a.json",
        [{"id": 1, "v": "a", "day": "d1", "ts": 1, "deleted": False}],
    )
    _write_updates(
        upd, "b.json",
        [{"id": 2, "v": "b", "day": "d1", "ts": 2, "deleted": False},
         {"id": 1, "v": None, "day": "d1", "ts": 3, "deleted": True}],
    )
    now = _time.time()
    os.utime(os.path.join(upd, "a.json"), (now, now))
    os.utime(os.path.join(upd, "b.json"), (now + 2, now + 2))

    def die_after_first(batch_id: int) -> None:
        if batch_id == 0:
            raise RuntimeError("killed after commit of batch 0")

    with pytest.raises(Exception):  # StreamingQueryException wrapping the kill
        _run(
            spark, tmp_path,
            on_batch_commit=die_after_first, max_files_per_trigger=1,
        )
    store = SnapshotStore(spark, str(tmp_path / "tab"))
    assert store.versions() == [0]
    assert _table(spark, tmp_path) == [(1, "a", "d1")]

    # restart: batch 0 replays as already-committed (no duplicate
    # version), batch 1 applies its upsert + delete exactly once
    _run(spark, tmp_path, max_files_per_trigger=1)
    store = SnapshotStore(spark, str(tmp_path / "tab"))
    assert store.versions() == [0, 1]
    assert _table(spark, tmp_path) == [(2, "b", "d1")]


def test_cdc_merge_on_read_strategy_live(spark, tmp_path):
    """merge_on_read CDC: updates/deletes/partition-moves land as
    equality-delete + append commits -- no table read, no partition
    rewrite -- and the table state matches the merge semantics;
    compaction folds the deletes and prunes the sets."""
    upd = str(tmp_path / "upd")
    _write_updates(
        upd,
        "b0.json",
        [
            {"id": 1, "v": "a", "day": "d1", "ts": 1, "deleted": False},
            {"id": 2, "v": "b", "day": "d1", "ts": 1, "deleted": False},
            {"id": 3, "v": "c", "day": "d2", "ts": 1, "deleted": False},
        ],
    )
    _run(spark, tmp_path, strategy="merge_on_read")
    _write_updates(
        upd,
        "b1.json",
        [
            {"id": 1, "v": "a2", "day": "d1", "ts": 2, "deleted": False},  # update
            {"id": 2, "v": "x", "day": "d1", "ts": 2, "deleted": True},    # delete
            {"id": 3, "v": "c2", "day": "d1", "ts": 2, "deleted": False},  # MOVES d2->d1
            {"id": 4, "v": "d", "day": "d2", "ts": 2, "deleted": False},   # insert
        ],
    )
    _run(spark, tmp_path, strategy="merge_on_read")
    assert _table(spark, tmp_path) == [
        (1, "a2", "d1"),
        (3, "c2", "d1"),
        (4, "d", "d2"),
    ]
    store = SnapshotStore(spark, str(tmp_path / "tab"))
    man = store._read_manifest(store.latest_version())
    # the merge commits never rewrote v0's dirs: base snapshot dirs live
    assert any(
        vd.startswith("v0-") for vds in man["partitions"].values() for vd in vds
    )
    assert len(man["delete_sets"]) == 1
    # exactly-once: a second identical run replays nothing
    head = store.latest_version()
    _run(spark, tmp_path, strategy="merge_on_read")
    assert store.latest_version() == head
    # compaction folds + prunes; state unchanged
    store.compact(all_partitions=True)
    assert store._read_manifest(store.latest_version())["delete_sets"] == []
    assert _table(spark, tmp_path) == [
        (1, "a2", "d1"),
        (3, "c2", "d1"),
        (4, "d", "d2"),
    ]


def test_cdc_merge_on_read_kill_between_delete_and_checkpoint(spark, tmp_path):
    """Crash after the merge commits but before the checkpoint
    advances: the replayed batch re-runs delete+append; data lands
    exactly once (the duplicate delete set is harmless and pruned)."""
    upd = str(tmp_path / "upd")
    _write_updates(
        upd,
        "b0.json",
        [{"id": 1, "v": "a", "day": "d1", "ts": 1, "deleted": False}],
    )
    _run(spark, tmp_path, strategy="merge_on_read")
    _write_updates(
        upd,
        "b1.json",
        [{"id": 1, "v": "a2", "day": "d1", "ts": 2, "deleted": False}],
    )

    class Kill(Exception):
        pass

    def die_after_commit(batch_id: int) -> None:
        if batch_id >= 1:
            raise Kill(f"killed after commit of batch {batch_id}")

    with pytest.raises(Exception):
        _run(spark, tmp_path, strategy="merge_on_read",
             on_batch_commit=die_after_commit)
    store = SnapshotStore(spark, str(tmp_path / "tab"))
    head_after_kill = store.latest_version()
    _run(spark, tmp_path, strategy="merge_on_read")
    # replay detected via the append's batch id: no new commits
    assert store.latest_version() == head_after_kill
    assert _table(spark, tmp_path) == [(1, "a2", "d1")]
