"""Snapshot branches: isolated multi-commit lineage over the staged
machinery -- chained branch commits, accumulated branch reads,
fast-forward publish (repeatable), conflict refusal, drop, retention.
"""

from __future__ import annotations

import pytest

from docker_airflow_spark_minio_spark.snapshots import (
    SnapshotConflict,
    SnapshotStore,
)

SCHEMA = "id INT, day STRING, amt INT"


@pytest.fixture
def root(tmp_path):
    return str(tmp_path / "tab")


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(df):
    return sorted((r["id"], r["day"], r["amt"]) for r in df.collect())


def test_branch_isolated_until_fast_forward(spark, root):
    store = SnapshotStore(spark, root)
    store.write(_df(spark, [(1, "d1", 10)]), mode="snapshot", partition_by=["day"])

    store.branch_write("dev", _df(spark, [(2, "d1", 20)]), partition_by=["day"])
    store.branch_write("dev", _df(spark, [(3, "d2", 30)]), partition_by=["day"])

    # main readers see none of it; maintenance chains from main
    assert _rows(store.read()) == [(1, "d1", 10)]
    assert store.current_version() == 0
    # the branch reads its ACCUMULATED state (fork + both commits)
    assert _rows(store.branch_read("dev")) == [
        (1, "d1", 10),
        (2, "d1", 20),
        (3, "d2", 30),
    ]
    assert store.branches() == {"dev": store.branch_head("dev")}

    v = store.fast_forward("dev")
    assert store.current_version() == v
    assert _rows(store.read()) == [(1, "d1", 10), (2, "d1", 20), (3, "d2", 30)]
    # fully published: the branch no longer lists
    assert store.branch_head("dev") is None
    assert store.branches() == {}


def test_branch_fast_forward_repeats(spark, root):
    store = SnapshotStore(spark, root)
    store.write(_df(spark, [(1, "d1", 10)]), mode="snapshot", partition_by=["day"])
    store.branch_write("dev", _df(spark, [(2, "d1", 20)]), partition_by=["day"])
    store.fast_forward("dev")
    # keep working on the same branch name after a publish: the new
    # commit forks from the NEW head, and only it publishes next time
    store.branch_write("dev", _df(spark, [(3, "d2", 30)]), partition_by=["day"])
    assert _rows(store.branch_read("dev")) == [
        (1, "d1", 10),
        (2, "d1", 20),
        (3, "d2", 30),
    ]
    store.fast_forward("dev")
    assert _rows(store.read()) == [(1, "d1", 10), (2, "d1", 20), (3, "d2", 30)]
    with pytest.raises(ValueError, match="no staged"):
        store.fast_forward("dev")


def test_branch_appends_replay_onto_moved_main(spark, root):
    store = SnapshotStore(spark, root)
    store.write(_df(spark, [(1, "d1", 10)]), mode="snapshot", partition_by=["day"])
    store.branch_write("dev", _df(spark, [(2, "d1", 20)]), partition_by=["day"])
    store.branch_write("dev", _df(spark, [(3, "d2", 30)]), partition_by=["day"])
    # main moves after the branch point
    store.write(_df(spark, [(4, "d3", 40)]), mode="append", partition_by=["day"])
    store.fast_forward("dev")
    assert _rows(store.read()) == [
        (1, "d1", 10),
        (2, "d1", 20),
        (3, "d2", 30),
        (4, "d3", 40),
    ]


def test_branch_overwrite_chain_publishes_in_order(spark, root):
    store = SnapshotStore(spark, root)
    store.write(_df(spark, [(1, "d1", 10)]), mode="snapshot", partition_by=["day"])
    # commit 1 appends into d1; commit 2 overwrites d1 -- computed
    # against the BRANCH state, so it must land after commit 1
    store.branch_write("dev", _df(spark, [(2, "d1", 20)]), partition_by=["day"])
    store.branch_write(
        "dev",
        _df(spark, [(9, "d1", 90)]),
        mode="overwrite_partitions",
        partition_by=["day"],
    )
    assert _rows(store.branch_read("dev")) == [(9, "d1", 90)]
    store.fast_forward("dev")
    assert _rows(store.read()) == [(9, "d1", 90)]


def test_branch_overwrite_conflicts_when_main_touched_partition(spark, root):
    store = SnapshotStore(spark, root)
    store.write(_df(spark, [(1, "d1", 10)]), mode="snapshot", partition_by=["day"])
    store.branch_write(
        "dev",
        _df(spark, [(9, "d1", 90)]),
        mode="overwrite_partitions",
        partition_by=["day"],
    )
    # main rewrites the SAME partition after the branch point
    store.write(
        _df(spark, [(5, "d1", 50)]),
        mode="overwrite_partitions",
        partition_by=["day"],
    )
    with pytest.raises(SnapshotConflict):
        store.fast_forward("dev")
    # the branch survives the refusal: inspectable, droppable
    assert _rows(store.branch_read("dev")) == [(9, "d1", 90)]
    assert _rows(store.read()) == [(5, "d1", 50)]
    store.drop_branch("dev")
    assert store.branches() == {}


def test_branch_full_replace_rules(spark, root):
    store = SnapshotStore(spark, root)
    store.write(_df(spark, [(1, "d1", 10)]), mode="snapshot", partition_by=["day"])
    store.branch_write(
        "dev", _df(spark, [(7, "d9", 70)]), mode="snapshot", partition_by=["day"]
    )
    # unmoved main: full replace fast-forwards
    store.fast_forward("dev")
    assert _rows(store.read()) == [(7, "d9", 70)]

    store.branch_write("dev", _df(spark, [(8, "d9", 80)]), mode="snapshot", partition_by=["day"])
    store.write(_df(spark, [(2, "d2", 20)]), mode="append", partition_by=["day"])
    with pytest.raises(SnapshotConflict):
        store.fast_forward("dev")


def test_drop_branch_reclaims_only_unpublished(spark, root):
    store = SnapshotStore(spark, root)
    store.write(_df(spark, [(1, "d1", 10)]), mode="snapshot", partition_by=["day"])
    store.branch_write("dev", _df(spark, [(2, "d1", 20)]), partition_by=["day"])
    store.fast_forward("dev")
    store.branch_write("dev", _df(spark, [(3, "d2", 30)]), partition_by=["day"])
    assert store.drop_branch("dev") == 1  # only the post-publish commit
    assert _rows(store.read()) == [(1, "d1", 10), (2, "d1", 20)]
    with pytest.raises(ValueError, match="no staged"):
        store.drop_branch("dev")


def test_branch_published_data_survives_retention(spark, root):
    store = SnapshotStore(spark, root)
    store.write(_df(spark, [(1, "d1", 10)]), mode="snapshot", partition_by=["day"])
    store.branch_write("dev", _df(spark, [(2, "d1", 20)]), partition_by=["day"])
    store.branch_write("dev", _df(spark, [(3, "d2", 30)]), partition_by=["day"])
    store.fast_forward("dev")
    for i in range(4, 8):
        store.write(
            _df(spark, [(i, "d3", i)]), mode="append", partition_by=["day"]
        )
    # aggressive retention: branch-commit MANIFESTS may drop, but the
    # data dirs the publish commits re-pointed must stay live
    store.expire_snapshots(keep_last=1, orphan_grace_ms=0)
    assert _rows(store.read()) == [
        (1, "d1", 10),
        (2, "d1", 20),
        (3, "d2", 30),
        (4, "d3", 4),
        (5, "d3", 5),
        (6, "d3", 6),
        (7, "d3", 7),
    ]


def test_branch_read_pruning_kwargs_pass_through(spark, root):
    store = SnapshotStore(spark, root)
    store.write(_df(spark, [(1, "d1", 10)]), mode="snapshot", partition_by=["day"])
    store.branch_write("dev", _df(spark, [(2, "d2", 20)]), partition_by=["day"])
    got = _rows(store.branch_read("dev", partitions=["day=d2"]))
    assert got == [(2, "d2", 20)]


def test_branch_name_validation_and_missing(spark, root):
    store = SnapshotStore(spark, root)
    store.write(_df(spark, [(1, "d1", 10)]), mode="snapshot", partition_by=["day"])
    with pytest.raises(ValueError, match="invalid ref"):
        store.branch_write("a/b", _df(spark, [(2, "d1", 20)]), partition_by=["day"])
    with pytest.raises(ValueError, match="no such branch"):
        store.branch_read("nope")
    with pytest.raises(ValueError, match="staged= itself"):
        store.branch_write("dev", _df(spark, [(2, "d1", 20)]), partition_by=["day"], staged="x")


def test_wap_multi_commit_chain_still_publishes(spark, root):
    """The parent-resolution change (staged chains grow from their own
    head) must keep the plain multi-commit WAP path working."""
    store = SnapshotStore(spark, root)
    store.write(_df(spark, [(1, "d1", 10)]), mode="snapshot", partition_by=["day"])
    store.write(
        _df(spark, [(2, "d1", 20)]),
        mode="append",
        partition_by=["day"],
        staged="batch7",
    )
    store.write(
        _df(spark, [(3, "d2", 30)]),
        mode="append",
        partition_by=["day"],
        staged="batch7",
    )
    assert _rows(store.read()) == [(1, "d1", 10)]
    store.publish_staged("batch7")
    assert _rows(store.read()) == [(1, "d1", 10), (2, "d1", 20), (3, "d2", 30)]
    # a plain wap id still publishes at most once
    with pytest.raises(ValueError, match="already published"):
        store.publish_staged("batch7")
