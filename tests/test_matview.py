"""Incrementally-maintained aggregate tables (`matview.py`).

The scale story the tests pin: a refresh after append-only source
commits reads ONLY the appended data and rewrites ONLY the summary
partitions those deltas touch (untouched partition pointers are
byte-identical across the refresh); any window the delta algebra cannot
maintain (deletes, replaces, retention holes) falls back to a full
recompute rather than a silently-wrong summary.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from docker_airflow_spark_minio_spark.matview import (
    WATERMARK_KEY,
    IncrementalMatView,
)
from docker_airflow_spark_minio_spark.snapshots import SnapshotStore


@pytest.fixture()
def roots(tmp_path):
    src = tmp_path / "mv_source"
    tgt = tmp_path / "mv_target"
    yield str(src), str(tgt)
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(tgt, ignore_errors=True)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, roots, partition_by=("g",)):
    source = SnapshotStore(spark, roots[0])
    mv = IncrementalMatView(
        spark,
        source,
        roots[1],
        group_by=["g"],
        aggs={
            "n": ("count",),
            "s": ("sum", "x"),
            "lo": ("min", "x"),
            "hi": ("max", "x"),
        },
        partition_by=list(partition_by),
    )
    return source, mv


ORDER = ["g", "n", "s", "lo", "hi"]


def _mvrows(mv):
    return _rows(mv.read().select(*ORDER))


def _recompute(source):
    return (
        source.read()
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("s"),
            F.min("x").alias("lo"),
            F.max("x").alias("hi"),
        )
    )


def test_full_then_incremental_matches_recompute(spark, roots):
    source, mv = _mk(spark, roots)
    source.write(
        spark.createDataFrame(
            [("a", 10), ("a", 20), ("b", 5)], "g string, x int"
        ),
        mode="snapshot",
        partition_by=["g"],
    )
    r0 = mv.refresh()
    assert r0["mode"] == "full"
    assert _mvrows(mv) == _rows(_recompute(source).select(*ORDER))

    # append touching only 'a'; also a NEW group 'c'
    source.write(
        spark.createDataFrame([("a", 1), ("c", 99)], "g string, x int"),
        mode="append",
        partition_by=["g"],
    )
    before = mv.target._read_manifest(mv.target.current_version())
    r1 = mv.refresh()
    assert r1["mode"] == "incremental"
    assert _mvrows(mv) == _rows(_recompute(source).select(*ORDER))
    assert _mvrows(mv) == [("a", 3, 31, 1, 20), ("b", 1, 5, 5, 5), ("c", 1, 99, 99, 99)]
    # untouched summary partition 'b' keeps its exact data pointers:
    # the refresh rewrote only affected partitions
    after = mv.target._read_manifest(mv.target.current_version())
    assert after["partitions"]["g=b"] == before["partitions"]["g=b"]
    assert after["partitions"]["g=a"] != before["partitions"]["g=a"]
    assert "g=c" in after["partitions"]

    # column types identical between full and incremental refreshes
    # (nullability differs benignly across the parquet round-trip)
    assert (
        mv.read().select(*ORDER).schema.simpleString()
        == _recompute(source).select(*ORDER).schema.simpleString()
    )


def test_noop_and_watermark(spark, roots):
    source, mv = _mk(spark, roots)
    source.write(
        spark.createDataFrame([("a", 1)], "g string, x int"),
        mode="snapshot",
        partition_by=["g"],
    )
    r0 = mv.refresh()
    assert r0["mode"] == "full"
    assert mv.target.watermark(WATERMARK_KEY) == r0["source_version"]
    r1 = mv.refresh()
    assert r1["mode"] == "noop"
    assert mv.target.current_version() == r0["version"]


def test_full_fallback_on_delete_and_replace(spark, roots):
    source, mv = _mk(spark, roots)
    source.write(
        spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20), (3, "b", 5)], "id int, g string, x int"
        ),
        mode="snapshot",
        partition_by=["g"],
    )
    mv.refresh()
    # merge-on-read equality delete erases a row already in the summary
    source.delete_keys(
        spark.createDataFrame([(2,)], "id int"), key_cols=["id"]
    )
    r = mv.refresh()
    assert r["mode"] == "full" and "delete_keys" in r["reason"]
    assert _mvrows(mv) == _rows(_recompute(source).select(*ORDER))
    assert _rows(mv.read().select("g", "n", "s")) == [("a", 1, 10), ("b", 1, 5)]
    # a replace commit (overwrite_partitions) also forces full
    source.write(
        spark.createDataFrame([(9, "b", 7)], "id int, g string, x int"),
        mode="overwrite_partitions",
        partition_by=["g"],
    )
    r = mv.refresh()
    assert r["mode"] == "full" and "overwrite_partitions" in r["reason"]
    assert _mvrows(mv) == _rows(_recompute(source).select(*ORDER))


def test_delete_window_refreshes_incrementally(spark, roots):
    """A delete whose keys carry the summary partition columns is
    delta-maintained: only the delete-touched partitions recompute,
    untouched partitions keep byte-identical pointers, and a partition
    emptied by the delete disappears from the summary."""
    source, mv = _mk(spark, roots)
    source.write(
        spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20), (3, "b", 5), (4, "c", 7)],
            "id int, g string, x int",
        ),
        mode="snapshot",
        partition_by=["g"],
    )
    assert mv.refresh()["mode"] == "full"
    before = mv.target._read_manifest(mv.target.current_version())
    # delete one 'a' row and ALL of 'c' -- keys carry (id, g)
    source.delete_keys(
        spark.createDataFrame([(2, "a"), (4, "c")], "id int, g string"),
        key_cols=["id", "g"],
    )
    r = mv.refresh()
    assert r["mode"] == "incremental" and "delete" in r["reason"]
    assert _mvrows(mv) == _rows(_recompute(source).select(*ORDER))
    assert _rows(mv.read().select("g", "n", "s")) == [("a", 1, 10), ("b", 1, 5)]
    after = mv.target._read_manifest(mv.target.current_version())
    # untouched partition 'b' was not rewritten; emptied 'c' is gone
    assert after["partitions"]["g=b"] == before["partitions"]["g=b"]
    assert after["partitions"]["g=a"] != before["partitions"]["g=a"]
    assert "g=c" not in after["partitions"]


def test_mixed_append_and_delete_window(spark, roots):
    """One refresh window holding appends AND deletes: delete-touched
    partitions recompute, append-only partitions take the cheap merge
    path, and the result matches a from-scratch recompute."""
    source, mv = _mk(spark, roots)
    source.write(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 5)],
            "id int, g string, x int",
        ),
        mode="snapshot",
        partition_by=["g"],
    )
    assert mv.refresh()["mode"] == "full"
    # window: append into 'a' (delete-touched) and 'd' (append-only),
    # then delete one of 'a' (including the just-appended row) and the
    # only 'c' row
    source.write(
        spark.createDataFrame(
            [(5, "a", 100), (6, "d", 50)], "id int, g string, x int"
        ),
        mode="append",
        partition_by=["g"],
    )
    source.delete_keys(
        spark.createDataFrame([(5, "a"), (3, "c")], "id int, g string"),
        key_cols=["id", "g"],
    )
    before = mv.target._read_manifest(mv.target.current_version())
    r = mv.refresh()
    assert r["mode"] == "incremental"
    assert _mvrows(mv) == _rows(_recompute(source).select(*ORDER))
    assert _rows(mv.read().select("g", "n", "s")) == [
        ("a", 1, 10),
        ("b", 1, 20),
        ("d", 1, 50),
    ]
    after = mv.target._read_manifest(mv.target.current_version())
    assert after["partitions"]["g=b"] == before["partitions"]["g=b"]
    assert "g=c" not in after["partitions"]
    # a second refresh is a noop (watermark advanced exactly once)
    assert mv.refresh()["mode"] == "noop"


def test_delete_window_without_partition_keys_falls_back(spark, roots):
    """Deletes keyed WITHOUT the partition columns cannot localize the
    touched summary partitions -> full recompute, never wrong."""
    source, mv = _mk(spark, roots)
    source.write(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "id int, g string, x int"
        ),
        mode="snapshot",
        partition_by=["g"],
    )
    mv.refresh()
    source.delete_keys(
        spark.createDataFrame([(1,)], "id int"), key_cols=["id"]
    )
    r = mv.refresh()
    assert r["mode"] == "full" and "delete_keys" in r["reason"]
    assert _mvrows(mv) == _rows(_recompute(source).select(*ORDER))


def test_staged_commits_are_invisible_to_refresh(spark, roots):
    """A WAP-staged source commit is not table state: the refresh
    neither consumes it nor trips the append-only check; after publish
    the wap_publish commit forces the sound full fallback."""
    source, mv = _mk(spark, roots)
    source.write(
        spark.createDataFrame([("a", 1)], "g string, x int"),
        mode="snapshot",
        partition_by=["g"],
    )
    mv.refresh()
    source.write(
        spark.createDataFrame([("a", 100)], "g string, x int"),
        mode="append",
        partition_by=["g"],
        staged="audit-me",
    )
    r = mv.refresh()
    assert r["mode"] == "noop"  # staged commit moved no published head
    assert _rows(mv.read().select("g", "s")) == [("a", 1)]
    source.publish_staged("audit-me")
    r = mv.refresh()
    assert r["mode"] == "full" and "wap_publish" in r["reason"]
    assert _rows(mv.read().select("g", "s")) == [("a", 101)]


def test_unpartitioned_summary_and_validation(spark, roots):
    source = SnapshotStore(spark, roots[0])
    source.write(
        spark.createDataFrame([("a", 1), ("b", 2)], "g string, x int"),
        mode="snapshot",
    )
    mv = IncrementalMatView(
        spark,
        source,
        roots[1],
        group_by=["g"],
        aggs={"n": ("count",), "s": ("sum", "x")},
    )
    assert mv.refresh()["mode"] == "full"
    source.write(
        spark.createDataFrame([("b", 10)], "g string, x int"), mode="append"
    )
    assert mv.refresh()["mode"] == "incremental"
    assert _rows(mv.read().select("g", "n", "s")) == [("a", 1, 1), ("b", 2, 12)]
    with pytest.raises(ValueError, match="subset of group_by"):
        IncrementalMatView(
            spark, source, roots[1] + "_2",
            group_by=["g"], aggs={"n": ("count",)}, partition_by=["x"],
        )
    with pytest.raises(ValueError, match="kind must be one of"):
        IncrementalMatView(
            spark, source, roots[1] + "_3",
            group_by=["g"], aggs={"n": ("avg", "x")},
        )
    with pytest.raises(ValueError, match="collides"):
        IncrementalMatView(
            spark, source, roots[1] + "_4",
            group_by=["g"], aggs={"g": ("count",)},
        )


def test_delta_of_only_new_groups(spark, roots):
    """An append touching ONLY groups the summary has never seen merges
    as the bare partial (no existing partitions to read)."""
    source, mv = _mk(spark, roots)
    source.write(
        spark.createDataFrame([("a", 1)], "g string, x int"),
        mode="snapshot",
        partition_by=["g"],
    )
    mv.refresh()
    source.write(
        spark.createDataFrame([("new1", 5), ("new2", 6)], "g string, x int"),
        mode="append",
        partition_by=["g"],
    )
    assert mv.refresh()["mode"] == "incremental"
    assert _rows(mv.read().select("g", "n", "s")) == [
        ("a", 1, 1),
        ("new1", 1, 5),
        ("new2", 1, 6),
    ]


def test_null_group_partition_roundtrip(spark, roots):
    """NULL grouping values ride the Hive default-partition encoding
    through the incremental overwrite path."""
    source, mv = _mk(spark, roots)
    source.write(
        spark.createDataFrame([("a", 1), (None, 7)], "g string, x int"),
        mode="snapshot",
        partition_by=["g"],
    )
    mv.refresh()
    source.write(
        spark.createDataFrame([(None, 3)], "g string, x int"),
        mode="append",
        partition_by=["g"],
    )
    assert mv.refresh()["mode"] == "incremental"
    got = {tuple(r) for r in mv.read().select("g", "n", "s").collect()}
    assert got == {("a", 1, 1), (None, 2, 10)}


def test_refresh_incremental_with_staged_commit_in_window(spark, roots):
    """An unpublished staged (WAP) commit inside the refresh window is
    not table state: commit_modes omits it (so refresh picks
    incremental) and read_appends must skip it too -- a staged
    full-replace in the window used to crash the refresh after
    commit_modes had already promised append-only."""
    source, mv = _mk(spark, roots)
    source.write(
        spark.createDataFrame([("a", 1)], "g STRING, x INT"),
        mode="snapshot",
        partition_by=["g"],
    )
    assert mv.refresh()["mode"] == "full"
    # staged full replace (never published) + a published append
    source.write(
        spark.createDataFrame([("z", 99)], "g STRING, x INT"),
        mode="snapshot",
        partition_by=["g"],
        staged="audit-mv",
    )
    source.write(
        spark.createDataFrame([("a", 2), ("b", 5)], "g STRING, x INT"),
        mode="append",
        partition_by=["g"],
    )
    out = mv.refresh()
    assert out["mode"] == "incremental", out
    assert _mvrows(mv) == [("a", 2, 3, 1, 2), ("b", 1, 5, 5, 5)]


def test_delete_refresh_semi_join_arm_matches_literal(spark, roots, monkeypatch):
    """Past TOUCHED_ISIN_MAX touched partitions, the delete-refresh
    filters switch from literal OR-chains to broadcast semi-/anti-joins
    (r8 verdict item 4).  Forcing the cutover to 0 must produce the
    exact same summary as the literal arm, and the filter plan must be
    a join, not a growing expression tree."""
    from docker_airflow_spark_minio_spark import matview as mvmod

    source, mv = _mk(spark, roots)
    source.write(
        spark.createDataFrame(
            [(i, g, 10 * i) for i, g in enumerate("aabbccdd")],
            "id int, g string, x int",
        ),
        mode="snapshot",
        partition_by=["g"],
    )
    assert mv.refresh()["mode"] == "full"
    source.delete_keys(
        spark.createDataFrame([(0, "a"), (4, "c")], "id int, g string"),
        key_cols=["id", "g"],
    )
    monkeypatch.setattr(mvmod, "TOUCHED_ISIN_MAX", 0)
    r = mv.refresh()
    assert r["mode"] == "incremental"
    assert _mvrows(mv) == _rows(_recompute(source).select(*ORDER))
    # plan shape of the cutover arm: a broadcast LeftSemi join on the
    # touched tuples, not an OR of literal conjunctions
    plan = mv._touched_filter(
        source.read(), [("a",), ("c",)], keep=True
    )._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    anti = mv._touched_filter(
        source.read(), [("a",), ("c",)], keep=False
    )._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in anti


def test_touched_filter_arms_agree_with_nulls(spark, roots, monkeypatch):
    """Literal predicate vs broadcast join: identical row sets either
    side of the cutover, including a NULL partition value."""
    from docker_airflow_spark_minio_spark import matview as mvmod

    source, mv = _mk(spark, roots)
    df = spark.createDataFrame(
        [("a", 1), (None, 2), ("b", 3), ("c", 4)], "g string, x int"
    )
    vals = [("a",), (None,)]

    def rows(frame):
        return sorted((tuple(r) for r in frame.collect()), key=repr)

    lit_keep = rows(mv._touched_filter(df, vals, keep=True))
    lit_drop = rows(mv._touched_filter(df, vals, keep=False))
    monkeypatch.setattr(mvmod, "TOUCHED_ISIN_MAX", 0)
    assert rows(mv._touched_filter(df, vals, keep=True)) == lit_keep
    assert rows(mv._touched_filter(df, vals, keep=False)) == lit_drop
    assert lit_keep == sorted([("a", 1), (None, 2)], key=repr)
    assert lit_drop == sorted([("b", 3), ("c", 4)], key=repr)


def test_delete_refresh_many_touched_partitions_full_fallback(
    spark, roots, monkeypatch
):
    """A delete window touching more summary partitions than the sanity
    bound falls back to a full recompute (bounded driver list via
    limit, never an unbounded collect)."""
    from docker_airflow_spark_minio_spark import matview as mvmod

    source, mv = _mk(spark, roots)
    source.write(
        spark.createDataFrame(
            [(i, f"g{i}", i) for i in range(6)], "id int, g string, x int"
        ),
        mode="snapshot",
        partition_by=["g"],
    )
    assert mv.refresh()["mode"] == "full"
    source.delete_keys(
        spark.createDataFrame(
            [(0, "g0"), (1, "g1"), (2, "g2")], "id int, g string"
        ),
        key_cols=["id", "g"],
    )
    monkeypatch.setattr(mvmod, "TOUCHED_FULL_RECOMPUTE_MAX", 2)
    r = mv.refresh()
    assert r["mode"] == "full" and "more than 2 summary partitions" in r["reason"]
    assert _mvrows(mv) == _rows(_recompute(source).select(*ORDER))
