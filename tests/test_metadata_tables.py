"""Metadata inspection tables (``SnapshotStore.metadata_table``):
snapshots / partitions / files, answered from manifests.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docker_airflow_spark_minio_spark.snapshots import SnapshotStore

SCHEMA = "id INT, day STRING, amt INT"


def test_metadata_snapshots_lists_retained_history(spark, tmp_path):
    s = SnapshotStore(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([(1, "d1", 10)], SCHEMA)
    s.write(df, mode="snapshot", partition_by=["day"])
    s.write(df, mode="append", partition_by=["day"], staged="w")
    s.delete_keys(df.select("id"), key_cols=["id"])
    got = [
        (r["version"], r["mode"], r["staged"], r["is_published"])
        for r in s.metadata_table("snapshots").orderBy("version").collect()
    ]
    assert got == [
        (0, "snapshot", None, True),
        (1, "append", "w", False),
        (2, "delete_keys", None, True),
    ]


def test_metadata_partitions_rows_exact_or_null(spark, tmp_path):
    s = SnapshotStore(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(1, "d1", 10), (2, "d1", 20), (3, "d2", 30)], SCHEMA
    )
    # stats write records dir_rows -> exact counts, no scan
    s.write(df, mode="snapshot", partition_by=["day"], stats_cols=["amt"])
    got = {
        r["partition"]: (r["n_dirs"], r["n_rows"])
        for r in s.metadata_table("partitions").collect()
    }
    assert got == {"day=d1": (1, 2), "day=d2": (1, 1)}
    # byte sums are recorded by EVERY write (a listing, no stats scan)
    # and exact vs the data files on disk
    import os

    m = s._read_manifest(0)
    by_part = {
        r["partition"]: r["n_bytes"]
        for r in s.metadata_table("partitions").collect()
    }
    for part, vds in m["partitions"].items():
        disk = sum(
            os.path.getsize(f"{s.root}/data/{vd}/{part}/{f}")
            for vd in vds
            for f in os.listdir(f"{s.root}/data/{vd}/{part}")
            if f.endswith(".parquet")
        )
        assert by_part[part] == disk > 0
    # a live MoR delete set makes counts unprovable -> NULL, never a guess
    s.delete_keys(df.where(F.col("id") == 1).select("id"), key_cols=["id"])
    got = {
        r["partition"]: r["n_rows"]
        for r in s.metadata_table("partitions").collect()
    }
    assert got == {"day=d1": None, "day=d2": None}
    # ...but PHYSICAL byte sums stay known (masks don't shrink files)
    assert all(
        r["n_bytes"] is not None
        for r in s.metadata_table("partitions").collect()
    )
    # time travel back to the clean snapshot restores exactness
    got = {
        r["partition"]: r["n_rows"]
        for r in s.metadata_table("partitions", as_of=0).collect()
    }
    assert got == {"day=d1": 2, "day=d2": 1}


def test_metadata_files_inventory(spark, tmp_path):
    s = SnapshotStore(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([(1, "d1", 10), (2, "d2", 20)], SCHEMA)
    s.write(df, mode="snapshot", partition_by=["day"], stats_cols=["amt"])
    # second commit WITHOUT stats: files come from a directory listing
    s.write(
        spark.createDataFrame([(3, "d1", 30)], SCHEMA),
        mode="append",
        partition_by=["day"],
    )
    files = s.metadata_table("files").collect()
    assert all(r["file"].endswith(".parquet") for r in files)
    by_part = {}
    for r in files:
        by_part.setdefault(r["partition"], set()).add(r["vdir"])
    assert {vd[:3] for vd in by_part["day=d1"]} == {"v0-", "v1-"}
    assert {vd[:3] for vd in by_part["day=d2"]} == {"v0-"}
    # the inventory covers exactly the table's row count
    import pyarrow.parquet as pq

    n = sum(
        pq.read_metadata(
            f"{tmp_path}/t/data/{r['vdir']}/{r['partition']}/{r['file']}"
        ).num_rows
        for r in files
    )
    assert n == s.read().count() == 3
    with pytest.raises(ValueError, match="unknown metadata table"):
        s.metadata_table("nope")


def test_metadata_column_stats(spark, tmp_path):
    """column_stats inspection: table-level bounds only when EVERY live
    dir carries them, bloom flags, NDV estimates from the sketches."""
    from pyspark.sql import functions as F

    from docker_airflow_spark_minio_spark.snapshots import SnapshotStore

    s = SnapshotStore(spark, str(tmp_path / "t"))
    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("grp"),
        F.concat(F.lit("v"), F.col("id")).alias("name"),
    )
    s.write(df, mode="snapshot", stats_cols=["k"], bloom_cols=["grp"],
            ndv_cols=["grp"])
    stats = {r["column"]: r for r in s.metadata_table("column_stats").collect()}
    assert set(stats) == {"k", "grp", "name"}
    assert stats["k"]["min"] == "0" and stats["k"]["max"] == "99"
    assert stats["grp"]["has_bloom"] and not stats["k"]["has_bloom"]
    assert abs(stats["grp"]["ndv_estimate"] - 7) <= 1
    assert stats["k"]["ndv_estimate"] is None  # no sketch for k
    assert stats["name"]["min"] is None  # no stats col -> no bounds
    # an append WITHOUT stats makes k's bounds non-table-level
    s.write(
        spark.createDataFrame([(999, 1, "x")], "k long, grp long, name string"),
        mode="append",
    )
    stats = {r["column"]: r for r in s.metadata_table("column_stats").collect()}
    assert stats["k"]["min"] is None and stats["k"]["max"] is None
