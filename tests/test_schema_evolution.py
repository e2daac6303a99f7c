"""Field-id schema evolution + positional delete files.

Pins the round-10 snapshot-store additions:

 * :meth:`SnapshotStore.evolve_schema` -- rename / drop / type-widen as
   metadata-only commits, resolved BY FIELD ID at read (Iceberg-1.3
   core semantics; the reference's tables are that format,
   /root/reference/spark/Dockerfile:12-13, though its own jobs never
   evolve a schema -- extension surface).
 * :meth:`SnapshotStore.delete_positions` -- Iceberg v2's positional
   delete files, sharing the equality deletes' sequence-number rule.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from docker_airflow_spark_minio_spark.snapshots import (
    SnapshotStore,
    _epoch_fields,
    _is_widening,
)


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="evolve_store_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _base_store(spark, root) -> SnapshotStore:
    st = SnapshotStore(spark, root)
    df = spark.createDataFrame(
        [(1, "a", 10, "x"), (2, "b", 20, "x"), (3, "c", 30, "y")],
        "id int, name string, qty int, src string",
    )
    st.write(df, mode="snapshot", partition_by=["src"])
    return st


# ---------------------------------------------------------------------------
# evolve_schema
# ---------------------------------------------------------------------------


def test_rename_widen_reads_coherently(spark, root):
    st = _base_store(spark, root)
    v = st.evolve_schema(renames={"name": "label"}, widens={"qty": "bigint"})
    assert v == 1
    out = st.read().orderBy("id")
    assert out.columns == ["id", "label", "qty", "src"]
    assert dict(out.dtypes)["qty"] == "bigint"
    assert [r["label"] for r in out.collect()] == ["a", "b", "c"]


def test_time_travel_returns_each_epoch_shape(spark, root):
    st = _base_store(spark, root)
    st.evolve_schema(renames={"name": "label"}, widens={"qty": "bigint"})
    tt = st.read(as_of=0)
    assert tt.columns == ["id", "name", "qty", "src"]
    assert dict(tt.dtypes)["qty"] == "int"
    head = st.read()
    assert "label" in head.columns and "name" not in head.columns


def test_append_after_evolve_under_new_names(spark, root):
    st = _base_store(spark, root)
    st.evolve_schema(renames={"name": "label"}, widens={"qty": "bigint"})
    # narrower qty (int) append: read reconciles to the widened type
    st.write(
        spark.createDataFrame(
            [(4, "d", 40, "y")], "id int, label string, qty int, src string"
        ),
        mode="append",
        partition_by=["src"],
    )
    out = st.read()
    assert out.count() == 4
    assert dict(out.dtypes)["qty"] == "bigint"
    # and the manifest schema did NOT un-widen
    import json

    m = st._read_manifest(st.current_version())
    types = {f["name"]: f["type"] for f in json.loads(m["schema"])["fields"]}
    assert types["qty"] == "long"


def test_stale_renamed_name_write_refused(spark, root):
    st = _base_store(spark, root)
    st.evolve_schema(renames={"name": "label"})
    with pytest.raises(ValueError, match="renamed by evolve_schema"):
        st.write(
            spark.createDataFrame(
                [(9, "z", 1, "y")], "id int, name string, qty int, src string"
            ),
            mode="append",
            partition_by=["src"],
        )


def test_mor_delete_keyed_on_renamed_column(spark, root):
    st = _base_store(spark, root)
    st.evolve_schema(renames={"name": "label"})
    st.delete_keys(
        spark.createDataFrame([("b",)], "label string"), key_cols=["label"]
    )
    assert sorted(r["label"] for r in st.read().collect()) == ["a", "c"]
    # a rename AFTER the delete: the delete frame (old physical name)
    # keeps masking under the newest name (epoch-mapped at read)
    st.evolve_schema(renames={"label": "title"})
    assert sorted(r["title"] for r in st.read().collect()) == ["a", "c"]


def test_drop_never_leaks_into_reused_name(spark, root):
    st = _base_store(spark, root)
    st.evolve_schema(drops=["name"])
    assert "name" not in st.read().columns
    # re-add the NAME via an ordinary append: old files' physical
    # 'name' column (the dropped field) must never surface
    st.write(
        spark.createDataFrame(
            [(4, 40, "y", "fresh")], "id int, qty int, src string, name string"
        ),
        mode="append",
        partition_by=["src"],
    )
    rows = {r["id"]: r["name"] for r in st.read().collect()}
    assert rows[4] == "fresh"
    assert rows[1] is None and rows[2] is None  # not "a"/"b"


def test_drop_refused_while_delete_keys_live(spark, root):
    st = _base_store(spark, root)
    st.delete_keys(
        spark.createDataFrame([("b",)], "name string"), key_cols=["name"]
    )
    with pytest.raises(ValueError, match="live merge-on-read delete"):
        st.evolve_schema(drops=["name"])
    # compaction folds the delete in; the drop then proceeds
    st.compact(all_partitions=True)
    st.evolve_schema(drops=["name"])
    assert "name" not in st.read().columns


def test_partition_column_evolution_refused(spark, root):
    st = _base_store(spark, root)
    with pytest.raises(ValueError, match="partition columns"):
        st.evolve_schema(renames={"src": "origin"})
    with pytest.raises(ValueError, match="partition columns"):
        st.evolve_schema(drops=["src"])


def test_invalid_widen_refused(spark, root):
    st = _base_store(spark, root)
    with pytest.raises(ValueError, match="not a lossless promotion"):
        st.evolve_schema(widens={"qty": "int"})  # same type
    with pytest.raises(ValueError, match="not a lossless promotion"):
        st.evolve_schema(widens={"name": "int"})  # string -> int
    with pytest.raises(ValueError, match="not a lossless promotion"):
        st.evolve_schema(widens={"qty": "smallint"})  # narrowing


def test_duplicate_rename_target_refused(spark, root):
    st = _base_store(spark, root)
    with pytest.raises(ValueError, match="duplicate columns"):
        st.evolve_schema(renames={"name": "qty"})


def test_rollback_across_evolve_restores_epoch(spark, root):
    st = _base_store(spark, root)
    st.evolve_schema(renames={"name": "label"}, widens={"qty": "bigint"})
    st.rollback(0)
    out = st.read()
    assert out.columns == ["id", "name", "qty", "src"]
    assert dict(out.dtypes)["qty"] == "int"
    # a fresh evolve after the rollback works on the restored epoch
    st.evolve_schema(renames={"name": "tag"})
    assert "tag" in st.read().columns


def test_wap_stage_published_across_concurrent_evolve(spark, root):
    """A snapshot staged BEFORE an evolve, published AFTER it: the
    replayed dirs keep their stage-time versions, so the read maps
    their physical old-name columns to the evolved names."""
    st = _base_store(spark, root)
    st.write(
        spark.createDataFrame(
            [(4, "d", 40, "y")], "id int, name string, qty int, src string"
        ),
        mode="append",
        partition_by=["src"],
        staged="batch-1",
    )
    st.evolve_schema(renames={"name": "label"})
    st.publish_staged("batch-1")
    out = st.read()
    assert "label" in out.columns and "name" not in out.columns
    assert sorted(r["label"] for r in out.collect()) == ["a", "b", "c", "d"]


def test_incremental_window_crosses_evolve(spark, root):
    st = _base_store(spark, root)
    since = st.current_version()
    st.evolve_schema(renames={"name": "label"})
    st.write(
        spark.createDataFrame(
            [(4, "d", 40, "y")], "id int, label string, qty int, src string"
        ),
        mode="append",
        partition_by=["src"],
    )
    inc = st.read_appends(since)
    assert [r["label"] for r in inc.collect()] == ["d"]


def test_epoch_fields_retroactive_sync_name_collision():
    # field 1 ("a") dropped at v5; a later write re-adds "a", synced at
    # v9 as field 7.  For dirs OLDER than v5 the stored column "a" IS
    # field 1, so the retroactive sync must not claim it.
    log = [
        {"version": 0, "fields": [{"id": 1, "name": "a", "type": "int"}], "synced": {"1": "a"}},
        {"version": 5, "fields": [], "synced": {}},
        {"version": 9, "fields": [{"id": 7, "name": "a", "type": "int"}], "synced": {"7": "a"}},
    ]
    assert _epoch_fields(log, 2) == {1: "a"}
    assert _epoch_fields(log, 6) == {7: "a"}
    assert _epoch_fields(log, 10) == {7: "a"}


def test_is_widening_both_spellings():
    assert _is_widening("int", "bigint")
    assert _is_widening("integer", "long")
    assert _is_widening("float", "double")
    assert _is_widening("decimal(10,2)", "decimal(18,2)")
    assert not _is_widening("decimal(18,2)", "decimal(10,2)")
    assert not _is_widening("decimal(10,2)", "decimal(18,4)")  # scale change
    assert not _is_widening("bigint", "int")
    assert not _is_widening("string", "bigint")


# ---------------------------------------------------------------------------
# positional deletes
# ---------------------------------------------------------------------------


def test_positional_delete_masks_and_time_travels(spark, root):
    st = _base_store(spark, root)
    pos = (
        st.read(with_positions=True)
        .where(F.col("id") == 2)
        .select("_file", "_pos")
    )
    v = st.delete_positions(pos)
    assert sorted(r["id"] for r in st.read().collect()) == [1, 3]
    assert sorted(r["id"] for r in st.read(as_of=v - 1).collect()) == [1, 2, 3]


def test_positional_sequence_rule_reinsert_visible(spark, root):
    st = _base_store(spark, root)
    st.delete_positions(
        st.read(with_positions=True)
        .where(F.col("id") == 2)
        .select("_file", "_pos")
    )
    # same logical row re-appended AFTER the delete: visible (newer dir)
    st.write(
        spark.createDataFrame(
            [(2, "b", 20, "x")], "id int, name string, qty int, src string"
        ),
        mode="append",
        partition_by=["src"],
    )
    assert sorted(r["id"] for r in st.read().collect()) == [1, 2, 3]


def test_mixed_delete_kinds_and_compaction_prune(spark, root):
    st = _base_store(spark, root)
    st.delete_keys(
        spark.createDataFrame([("a",)], "name string"), key_cols=["name"]
    )
    st.delete_positions(
        st.read(with_positions=True)
        .where(F.col("id") == 3)
        .select("_file", "_pos")
    )
    assert sorted(r["id"] for r in st.read().collect()) == [2]
    st.compact(all_partitions=True)
    m = st._read_manifest(st.current_version())
    assert m["delete_sets"] == []
    assert sorted(r["id"] for r in st.read().collect()) == [2]


def test_delete_positions_requires_handle_columns(spark, root):
    st = _base_store(spark, root)
    with pytest.raises(ValueError, match="_file"):
        st.delete_positions(st.read().select("id"))


def test_positions_roundtrip_through_manager(spark, root):
    from docker_airflow_spark_minio_spark.snapshots import SnapshotTableManager

    mgr = SnapshotTableManager(spark, root)
    df = spark.createDataFrame(
        [(1, "x"), (2, "y")], "id int, src string"
    )
    mgr.write(df, "t", mode="snapshot", partition_by=["src"])
    store = mgr.store("t")
    mgr.delete_positions(
        "t",
        store.read(with_positions=True)
        .where(F.col("id") == 1)
        .select("_file", "_pos"),
    )
    assert [r["id"] for r in mgr.read("t").collect()] == [2]
    mgr.evolve_schema("t", renames={"id": "key"})
    assert [r["key"] for r in mgr.read("t").collect()] == [2]


# ---------------------------------------------------------------------------
# z-ordered compaction
# ---------------------------------------------------------------------------


def test_zorder_value_n_matches_2d(spark):
    from docker_airflow_spark_minio_spark.operators.zorder import (
        zorder_value,
        zorder_value_n,
    )

    df = spark.range(64).select(
        F.col("id").alias("x"),
        F.pmod(F.col("id") * 7 + 3, F.lit(64)).alias("y"),
    )
    rows = df.select(
        zorder_value(F.col("x"), F.col("y"), bits=6).alias("z2"),
        zorder_value_n([F.col("x"), F.col("y")], bits=6).alias("zn"),
    ).collect()
    assert all(r["z2"] == r["zn"] for r in rows)

    # 3-D: distinct inputs map to distinct codes within the bit budget
    rows3 = spark.range(27).select(
        zorder_value_n(
            [
                F.pmod(F.col("id"), F.lit(3)),
                F.pmod(F.col("id") / 3, F.lit(3)).cast("long"),
                F.pmod(F.col("id") / 9, F.lit(3)).cast("long"),
            ],
            bits=2,
        ).alias("z")
    ).collect()
    assert len({r["z"] for r in rows3}) == 27

    with pytest.raises(ValueError, match="overflow"):
        zorder_value_n([F.lit(1), F.lit(1), F.lit(1), F.lit(1)], bits=16)
    with pytest.raises(ValueError, match="at least 2"):
        zorder_value_n([F.lit(1)])


def test_zorder_compaction_improves_offaxis_pruning(spark, root):
    import math

    st = SnapshotStore(spark, root)
    n = 4096
    df = (
        spark.range(n)
        .select(
            F.col("id").cast("bigint").alias("x"),
            # y decorrelated from x, deterministic
            F.pmod(F.col("id") * 2654435761, F.lit(n)).cast("bigint").alias("y"),
        )
    )
    st.write(
        df.repartitionByRange(8, "x").sortWithinPartitions("x"),
        mode="snapshot",
        stats_cols=["x", "y"],
    )

    probe = ("y", 100, 500)

    def opened():
        _, _, skipped, total = st.plan_files(range_filter=probe)
        return total - skipped

    before = opened()
    st.compact(
        all_partitions=True,
        cluster_by=["x", "y"],
        target_rows_per_file=math.ceil(n / 8),
    )
    after = opened()
    assert after < before, (before, after)
    # rows unchanged, exact filter still correct
    got = sorted(
        r["x"] for r in st.read(range_filter=probe).collect()
    )
    want = sorted(
        r["x"]
        for r in df.where((F.col("y") >= 100) & (F.col("y") <= 500)).collect()
    )
    assert got == want


def test_zorder_cluster_by_validation(spark, root):
    st = _base_store(spark, root)
    with pytest.raises(ValueError, match="at least 2|>= 2"):
        st.compact(all_partitions=True, cluster_by=["id"])
    with pytest.raises(ValueError, match="not in table"):
        st.compact(all_partitions=True, cluster_by=["id", "nope"])
    with pytest.raises(ValueError, match="non-orderable-numeric"):
        st.compact(all_partitions=True, cluster_by=["id", "name"])
