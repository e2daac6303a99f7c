"""Changelog read (``SnapshotStore.read_changes``): row-level change
emission computed from manifest diffs — Iceberg ``create_changelog_view``
/ Delta CDF parity over the snapshot log.

The basic per-mode arms (append→insert, equality/positional delete→
pre-image delete rows, overwrite→delete+insert, compaction→net zero) are
also driven end-to-end by the ``snapshot_changelog_read`` registry entry
against the DuckDB oracle; this file pins the arms an oracle can't see:
rollback reappearance, WAP publish masking, refusals, window edges.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docker_airflow_spark_minio_spark.snapshots import SnapshotStore

SCHEMA = "id INT, day STRING, amt INT"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _changes(store, since=-1, as_of=None):
    return sorted(
        (r["_commit_version"], r["_change_type"], r["id"])
        for r in store.read_changes(since, as_of=as_of).collect()
    )


def test_changes_append_delete_overwrite(spark, tmp_path):
    s = SnapshotStore(spark, str(tmp_path / "t"))
    s.write(_df(spark, [(1, "d1", 10), (2, "d2", 20)]),
            mode="snapshot", partition_by=["day"])
    s.write(_df(spark, [(3, "d1", 30)]), mode="append", partition_by=["day"])
    s.delete_keys(_df(spark, [(1, "d1", 0)]).select("id", "day"),
                  key_cols=["id", "day"])
    s.write(_df(spark, [(4, "d2", 40)]),
            mode="overwrite_partitions", partition_by=["day"])
    assert _changes(s) == [
        (0, "insert", 1), (0, "insert", 2),
        (1, "insert", 3),
        (2, "delete", 1),
        (3, "delete", 2), (3, "insert", 4),
    ]
    # window semantics: strictly-after since, inclusive as_of
    assert _changes(s, since=0, as_of=2) == [(1, "insert", 3), (2, "delete", 1)]
    # empty window: zero rows, changelog schema intact
    empty = s.read_changes(s.current_version())
    assert empty.count() == 0
    assert {"_change_type", "_commit_version"} <= set(empty.columns)


def test_changes_positional_delete_and_compaction(spark, tmp_path):
    s = SnapshotStore(spark, str(tmp_path / "t"))
    s.write(_df(spark, [(1, "d1", 10), (2, "d1", 20), (3, "d2", 30)]),
            mode="snapshot", partition_by=["day"])
    pos = (s.read(with_positions=True)
           .where(F.col("id") == 2).select("_file", "_pos"))
    v = s.delete_positions(pos)
    assert _changes(s, since=v - 1) == [(v, "delete", 2)]
    # compaction: data-identical rewrite emits nothing
    cv = s.compact(all_partitions=True)
    assert s.read_changes(cv - 1).count() == 0


def test_changes_rollback_reappearance(spark, tmp_path):
    """A rollback across a merge-on-read delete drops the delete set
    while its target dirs survive: the masked rows REAPPEAR as inserts
    (scanned only from dirs older than the dropped set)."""
    s = SnapshotStore(spark, str(tmp_path / "t"))
    s.write(_df(spark, [(1, "d1", 10), (2, "d2", 20)]),
            mode="snapshot", partition_by=["day"])
    s.delete_keys(_df(spark, [(1, "d1", 0)]).select("id", "day"),
                  key_cols=["id", "day"])
    rv = s.rollback(0)
    assert _changes(s, since=rv - 1) == [(rv, "insert", 1)]
    # and the rolled-back table reads consistently with its changelog
    assert sorted(r["id"] for r in s.read().collect()) == [1, 2]


def test_changes_wap_publish(spark, tmp_path):
    """A WAP publish replays the staged chain as published commits;
    the changelog emits each one's effect at ITS publish version --
    exactly mirroring the table states time travel sees (the staged
    append's rows become visible at its publish commit, the re-stamped
    delete's pre-images — both pre-existing and just-published rows —
    surface at the delete's publish commit).  Nothing surfaces while
    staged, and the diff base of the first publish commit is the
    pre-stage head, never the stage-chain manifests."""
    s = SnapshotStore(spark, str(tmp_path / "t"))
    s.write(_df(spark, [(1, "d1", 10), (2, "d2", 20)]),
            mode="snapshot", partition_by=["day"])
    s.write(_df(spark, [(5, "d1", 50), (6, "d1", 60)]),
            mode="append", partition_by=["day"], staged="w")
    s.delete_keys(_df(spark, [(2, "d2", 0), (6, "d1", 0)])
                  .select("id", "day"),
                  key_cols=["id", "day"], staged="w")
    # staged commits are not table state: changelog stays at v0 only
    assert _changes(s) == [(0, "insert", 1), (0, "insert", 2)]
    pv = s.publish_staged("w")
    got = _changes(s, since=0)
    assert got == [
        (pv - 1, "insert", 5), (pv - 1, "insert", 6),
        (pv, "delete", 2), (pv, "delete", 6),
    ]
    # consistency with time travel at every published step
    assert sorted(r["id"] for r in s.read(as_of=pv - 1).collect()) == [
        1, 2, 5, 6,
    ]
    assert sorted(r["id"] for r in s.read(as_of=pv).collect()) == [1, 5]


def test_changes_refusals(spark, tmp_path):
    s = SnapshotStore(spark, str(tmp_path / "t"))
    s.write(_df(spark, [(1, "d1", 10)]), mode="snapshot",
            partition_by=["day"])
    s.write(_df(spark, [(2, "d2", 20)]), mode="append",
            partition_by=["day"])
    ev = s.evolve_schema(renames={"amt": "amount"})
    with pytest.raises(ValueError, match="evolve_schema"):
        s.read_changes(-1)
    s.write(_df(spark, [(3, "d1", 30)]).withColumnRenamed("amt", "amount"),
            mode="append", partition_by=["day"])
    # a window strictly past the evolution works, in the new epoch's shape
    df = s.read_changes(ev)
    assert "amount" in df.columns
    assert [r["id"] for r in df.collect()] == [3]
    # retention hole refuses like read_appends
    s.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="retention"):
        s.read_changes(0)
