"""Row-level predicate operations on snapshot tables
(``update_where`` copy-on-write, ``delete_where`` MoR/COW) — the
Iceberg ``write.update.mode`` / ``write.delete.mode`` surface.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docker_airflow_spark_minio_spark.snapshots import SnapshotStore

SCHEMA = "id INT, day STRING, amt INT"


def _store(spark, tmp_path, rows, partition_by=["day"]):
    s = SnapshotStore(spark, str(tmp_path / "t"))
    s.write(spark.createDataFrame(rows, SCHEMA), mode="snapshot",
            partition_by=partition_by or None)
    return s


def _rows(s, **kw):
    return sorted(
        (r["id"], r["day"], r["amt"]) for r in s.read(**kw).collect()
    )


def test_update_where_cow_touched_partitions_only(spark, tmp_path):
    s = _store(spark, tmp_path,
               [(1, "d1", 10), (2, "d1", 20), (3, "d2", 30), (4, "d3", 40)])
    v = s.update_where(F.col("id") % 2 == 1, {"amt": F.col("amt") + 100})
    assert v == 1
    assert _rows(s) == [
        (1, "d1", 110), (2, "d1", 20), (3, "d2", 130), (4, "d3", 40),
    ]
    # only the touched partitions were rewritten: d3's dir is still v0's
    m = s._read_manifest(v)
    assert all(vd.startswith("v0-") for vd in m["partitions"]["day=d3"])
    assert all(vd.startswith("v1-") for vd in m["partitions"]["day=d1"])
    # atomic: time travel sees the pre-update state
    assert _rows(s, as_of=0)[0] == (1, "d1", 10)
    # no match -> no commit
    assert s.update_where(F.col("id") > 999, {"amt": F.lit(0)}) is None
    assert s.current_version() == v


def test_update_where_null_condition_keeps_row(spark, tmp_path):
    s = _store(spark, tmp_path, [(1, "d1", 10), (2, "d1", None)])
    # amt > 5 is NULL for row 2: NOT TRUE, so the row must stay as-is
    s.update_where(F.col("amt") > 5, {"amt": F.lit(0)})
    assert _rows(s) == [(1, "d1", 0), (2, "d1", None)]


def test_update_where_refuses_partition_assignment(spark, tmp_path):
    s = _store(spark, tmp_path, [(1, "d1", 10)])
    with pytest.raises(ValueError, match="partition columns"):
        s.update_where(F.col("id") == 1, {"day": F.lit("d9")})
    with pytest.raises(ValueError, match="not in table schema"):
        s.update_where(F.col("id") == 1, {"nope": F.lit(1)})


def test_update_where_unpartitioned_rewrites_fully(spark, tmp_path):
    s = _store(spark, tmp_path, [(1, "d1", 10), (2, "d2", 20)],
               partition_by=None)
    s.update_where(F.col("id") == 2, {"amt": F.lit(99)})
    assert _rows(s) == [(1, "d1", 10), (2, "d2", 99)]


def test_delete_where_mor_positions(spark, tmp_path):
    s = _store(spark, tmp_path,
               [(1, "d1", 10), (2, "d1", 20), (3, "d2", 30)])
    v = s.delete_where(F.col("amt") >= 20)
    assert v == 1
    assert _rows(s) == [(1, "d1", 10)]
    # MoR: no data rewrite — v0 dirs still live, masked by a delete set
    m = s._read_manifest(v)
    assert all(vd.startswith("v0-")
               for vds in m["partitions"].values() for vd in vds)
    assert m["delete_sets"] and m["delete_sets"][0]["kind"] == "positional"
    # changelog sees the pre-image rows
    ch = sorted((r["_change_type"], r["id"])
                for r in s.read_changes(0).collect())
    assert ch == [("delete", 2), ("delete", 3)]
    # nothing matches -> no commit
    assert s.delete_where(F.col("id") > 999) is None


def test_delete_where_cow_claims_emptied_partitions(spark, tmp_path):
    s = _store(spark, tmp_path,
               [(1, "d1", 10), (2, "d2", 20), (3, "d2", 30), (4, "d3", 40)])
    v = s.delete_where(F.col("day") == "d2", approach="cow")
    assert _rows(s) == [(1, "d1", 10), (4, "d3", 40)]
    # the fully-deleted partition DROPPED from the manifest (claimed)
    m = s._read_manifest(v)
    assert "day=d2" not in m["partitions"]
    assert set(m["partitions"]) == {"day=d1", "day=d3"}
    # NULL-evaluating rows survive a COW delete too
    s2 = _store(spark, tmp_path / "n", [(1, "d1", 10), (2, "d1", None)])
    s2.delete_where(F.col("amt") > 5, approach="cow")
    assert _rows(s2) == [(2, "d1", None)]
