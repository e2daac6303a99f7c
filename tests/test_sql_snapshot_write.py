"""SQL write path for snapshot tables: the batch writer half of the
``snapshot_table`` Python DataSource (``sources/snapshot_write.py``).

Covers (1) write-through-DataSource == write-through-API parity
(directory naming, manifest shape, read-back through BOTH paths),
(2) the restricted-surface refusals (transforms, spec drift, stale
renamed-away producers), (3) the claim protocol: same-version racer
loses loudly with its data dir reclaimed, and a table that advanced
during the write refuses at commit (lost-update guard), and (4) the
``INSERT INTO`` / ``INSERT OVERWRITE`` statement forms via
``snapshot_sql``.
"""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from docker_airflow_spark_minio_spark.snapshots import (
    SnapshotConflict,
    SnapshotStore,
)
from docker_airflow_spark_minio_spark.sources.snapshot_write import (
    LocalSnapshotCommitter,
    SnapshotTableArrowWriter,
)
from docker_airflow_spark_minio_spark.streaming.table_source import (
    read_snapshot_table,
    snapshot_sql,
    write_snapshot_table,
)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(str(v) for v in r) for r in df.select(*cols).collect()
    )


def test_sql_write_roundtrip_partitioned(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [
            (datetime.date(2024, 1, 1), 1, "a"),
            (datetime.date(2024, 1, 2), 2, "b"),
            (None, 3, "c"),
        ],
        "day date, id long, val string",
    )
    write_snapshot_table(spark, df, root, partition_by=["day"])
    s = SnapshotStore(spark, root)
    assert _rows(s.read()) == _rows(df)
    assert _rows(read_snapshot_table(spark, root)) == _rows(df)
    # partition directory names are the SPARK names (pinned escaping +
    # HIVE_NULL), so an API append to the same value shares the dir key
    s.write(
        spark.createDataFrame(
            [(datetime.date(2024, 1, 2), 4, "d")],
            "day date, id long, val string",
        ),
        mode="append",
        partition_by=["day"],
    )
    m = s._read_manifest(s.current_version())
    assert set(m["partitions"]) == {
        "day=2024-01-01",
        "day=2024-01-02",
        "day=__HIVE_DEFAULT_PARTITION__",
    }
    assert len(m["partitions"]["day=2024-01-02"]) == 2  # SQL + API vdirs
    # and the SQL path reads the mixed table identically to the API
    assert _rows(read_snapshot_table(spark, root)) == _rows(s.read())


def test_sql_write_overwrite_and_metadata(spark, tmp_path):
    root = str(tmp_path / "o")
    write_snapshot_table(
        spark, spark.range(10).selectExpr("id", "id*2 AS amt"), root,
        metadata={"job": "j1"},
    )
    s = SnapshotStore(spark, root)
    meta = s._read_manifest(s.current_version())["metadata"]
    assert meta["job"] == "j1" and meta["sql_write"] is True
    assert meta["n_rows"] == 10
    write_snapshot_table(
        spark, spark.range(3).selectExpr("id", "id AS amt"), root,
        mode="overwrite",
    )
    assert s.read().count() == 3
    assert s._read_manifest(s.current_version())["mode"] == "snapshot"


def test_sql_write_refusals(spark, tmp_path):
    root = str(tmp_path / "r")
    s = SnapshotStore(spark, root)
    s.write(
        spark.range(8).selectExpr("id", "id % 3 AS k"),
        mode="snapshot",
        partition_by=["bucket(4, id)"],
    )
    with pytest.raises(Exception, match="hidden-partitioning"):
        write_snapshot_table(
            spark, spark.range(2).selectExpr("id", "id AS k"), root
        )
    root2 = str(tmp_path / "r2")
    s2 = SnapshotStore(spark, root2)
    s2.write(
        spark.range(4).selectExpr("id", "CAST(id AS STRING) AS p"),
        mode="snapshot",
        partition_by=["p"],
    )
    with pytest.raises(Exception, match="partition_by"):
        write_snapshot_table(
            spark,
            spark.range(2).selectExpr("id", "CAST(id AS STRING) AS p"),
            root2,
            partition_by=["id"],
        )
    # evolved table: stale renamed-away producer refused, current name ok
    root3 = str(tmp_path / "r3")
    s3 = SnapshotStore(spark, root3)
    s3.write(spark.createDataFrame([(1, 10)], "id int, qty int"), mode="snapshot")
    s3.evolve_schema(renames={"qty": "quantity"})
    with pytest.raises(Exception, match="renamed"):
        write_snapshot_table(
            spark, spark.createDataFrame([(2, 20)], "id int, qty int"), root3
        )
    write_snapshot_table(
        spark, spark.createDataFrame([(2, 20)], "id int, quantity int"), root3
    )
    got = {(r["id"], r["quantity"]) for r in s3.read().collect()}
    assert got == {(1, 10), (2, 20)}


def test_claim_conflict_and_advance_guard(spark, tmp_path):
    root = str(tmp_path / "c")
    write_snapshot_table(
        spark, spark.range(5).selectExpr("id"), root
    )
    schema = StructType.fromJson(
        {"type": "struct", "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}}
        ]}
    )
    # two writers plan against the same head
    w1 = SnapshotTableArrowWriter(schema, False, {"path": root})
    w2 = SnapshotTableArrowWriter(schema, False, {"path": root})
    assert w1.version == w2.version == 1
    import pyarrow as pa

    msg1 = w1.write(iter(pa.table({"id": [10]}).to_batches()))
    msg2 = w2.write(iter(pa.table({"id": [20]}).to_batches()))
    w1.commit([msg1])
    loser_dir = w2.data_path
    with pytest.raises(SnapshotConflict):
        w2.commit([msg2])
    assert not os.path.exists(loser_dir)  # loser's data reclaimed
    s = SnapshotStore(spark, root)
    assert sorted(r["id"] for r in s.read().collect()) == [0, 1, 2, 3, 4, 10]
    # advanced-during-write guard: head moves PAST the planned version
    w3 = SnapshotTableArrowWriter(schema, False, {"path": root})
    s.write(spark.range(1).selectExpr("id + 100 AS id"), mode="append")
    s.write(spark.range(1).selectExpr("id + 200 AS id"), mode="append")
    msg3 = w3.write(iter(pa.table({"id": [30]}).to_batches()))
    with pytest.raises(SnapshotConflict, match="advanced"):
        w3.commit([msg3])
    assert 30 not in {r["id"] for r in s.read().collect()}


def test_local_committer_claim_is_linkwise_atomic(tmp_path):
    """The local claim twin: payload fully written before the link, and
    the second claimant of one version loses with SnapshotConflict."""
    root = str(tmp_path / "lc")
    c = LocalSnapshotCommitter.for_root(root)
    c._commit_manifest(0, {"version": 0, "x": 1})
    with pytest.raises(SnapshotConflict):
        c._commit_manifest(0, {"version": 0, "x": 2})
    import json

    assert json.load(open(f"{root}/_manifests/v0.json"))["x"] == 1
    # no tmp litter after either outcome
    assert [
        n for n in os.listdir(f"{root}/_manifests") if n.startswith(".")
    ] == []


def test_insert_into_and_overwrite_via_snapshot_sql(spark, tmp_path):
    src, tgt = str(tmp_path / "src"), str(tmp_path / "tgt")
    SnapshotStore(spark, src).write(
        spark.range(20).selectExpr("id", "id * 2 AS amt"), mode="snapshot"
    )
    write_snapshot_table(
        spark, spark.createDataFrame([(100, 0)], "id long, amt long"), tgt
    )
    res = snapshot_sql(
        spark,
        "INSERT INTO tgt SELECT id, amt FROM src WHERE id >= 15",
        {"src": src, "tgt": tgt},
    ).collect()
    assert res[0]["n_rows"] == 5
    got = sorted(
        r["id"] for r in read_snapshot_table(spark, tgt).collect()
    )
    assert got == [15, 16, 17, 18, 19, 100]
    snapshot_sql(
        spark,
        "INSERT OVERWRITE tgt SELECT id, amt FROM src WHERE id < 3",
        {"src": src, "tgt": tgt},
    ).collect()
    assert SnapshotStore(spark, tgt).read().count() == 3
    with pytest.raises(ValueError, match="INSERT target"):
        snapshot_sql(spark, "INSERT INTO nope SELECT 1", {"src": src})


def test_sql_write_then_mor_delete_sequence(spark, tmp_path):
    """Sequence-number semantics hold across mixed writers: an equality
    delete older than a SQL append does not mask the re-added key."""
    root = str(tmp_path / "seq")
    write_snapshot_table(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        root,
    )
    s = SnapshotStore(spark, root)
    s.delete_keys(spark.createDataFrame([(1,)], "id long"), ["id"])
    write_snapshot_table(
        spark, spark.createDataFrame([(1, "re")], "id long, v string"), root
    )
    assert {(r["id"], r["v"]) for r in s.read().collect()} == {
        (1, "re"),
        (2, "b"),
    }
    assert _rows(read_snapshot_table(spark, root)) == _rows(s.read())
