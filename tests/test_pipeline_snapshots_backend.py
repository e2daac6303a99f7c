"""Silver/gold e2e on the snapshot-log backend: every write is an atomic
snapshot commit, day reruns repoint only their partition, prior states
stay readable by time travel, and retention bounds the log -- the
reference's Iceberg silver/gold behavior (job_silver.py:174-178),
executed.
"""

from __future__ import annotations

from docker_airflow_spark_minio_spark.jobs import run_gold, run_silver
from docker_airflow_spark_minio_spark.snapshots import SnapshotStore
from test_pipeline_e2e import DAY_A, DAY_B, RECORDS_A, lake  # noqa: F401


def test_snapshots_backend_e2e_with_time_travel(spark, lake):  # noqa: F811
    bronze, warehouse = lake
    n_a = run_silver(spark, bronze, DAY_A, warehouse, backend="snapshots")
    n_b = run_silver(spark, bronze, DAY_B, warehouse, backend="snapshots")
    assert (n_a, n_b) == (3, 1)
    # two gold groups for day A: (micro, US) and (nano, PT)
    assert run_gold(spark, warehouse, DAY_A, backend="snapshots") == 2

    silver = SnapshotStore(spark, f"{warehouse}/dw/tab_brewery")
    assert silver.versions() == [0, 1]

    # Re-run day A (idempotent): a NEW snapshot commit repointing only
    # day A's partition; day B still served from its original commit.
    assert run_silver(spark, bronze, DAY_A, warehouse, backend="snapshots") == 3
    assert silver.versions() == [0, 1, 2]
    m = silver._read_manifest(2)
    (da,) = m["partitions"][f"sys_file_date={DAY_A}"]
    (db,) = m["partitions"][f"sys_file_date={DAY_B}"]
    assert da.startswith("v2-") and db.startswith("v1-")

    # The head equals the pre-rerun state (idempotence), and time travel
    # to v1 shows the same rows too.
    ids_now = sorted(
        r["id"] for r in silver.read().where(f"sys_file_date = '{DAY_A}'").collect()
    )
    ids_v1 = sorted(
        r["id"]
        for r in silver.read(as_of=1).where(f"sys_file_date = '{DAY_A}'").collect()
    )
    assert ids_now == ids_v1 == ["1", "2", "3"]

    # Retention: keep only the head; the table still reads completely.
    silver.expire_snapshots(keep_last=1)
    assert silver.versions() == [2]
    assert silver.read().count() == 4

    gold = SnapshotStore(spark, f"{warehouse}/dw/tab_brewery_summary")
    rows = {
        (r["brewery_type"], r["country"]): r["qtd"]
        for r in gold.read().where(f"sys_file_date = '{DAY_A}'").collect()
    }
    assert rows == {("micro", "US"): 2, ("nano", "PT"): 1}


def test_maintenance_job_compacts_and_expires(spark, tmp_path):
    from docker_airflow_spark_minio_spark.jobs.maintenance import run_maintenance
    from docker_airflow_spark_minio_spark.snapshots import SnapshotTableManager

    wh = str(tmp_path / "wh")
    tm = SnapshotTableManager(spark, wh)
    tm.write(
        spark.createDataFrame([(1, "d1")], "id int, day string"),
        "dw.t",
        partition_by=["day"],
    )
    for i in (2, 3):
        tm.write(
            spark.createDataFrame([(i, "d1")], "id int, day string"),
            "dw.t",
            partition_by=["day"],
            mode="append",
        )
    out = run_maintenance(spark, wh, "dw.t", keep_last=1, compact=True)
    assert out["compacted_version"] == 3
    assert out["kept_versions"] == [3]
    assert sorted(r["id"] for r in tm.read("dw.t").collect()) == [1, 2, 3]


def test_reference_retention_number_via_maintenance(spark, lake):  # noqa: F811
    # The reference's Iceberg tables keep at most 10 previous versions
    # (write.metadata.previous-versions-max: 10, job_silver.py:174-178).
    # Re-run silver 12 times on the snapshots backend, then run the
    # maintenance job with its default keep_last=10: exactly the 10
    # newest snapshots survive and the table still reads completely.
    from docker_airflow_spark_minio_spark.jobs.maintenance import run_maintenance
    from docker_airflow_spark_minio_spark.snapshots import SnapshotStore

    bronze, warehouse = lake
    for _ in range(12):
        assert run_silver(spark, bronze, DAY_A, warehouse, backend="snapshots") == 3
    silver = SnapshotStore(spark, f"{warehouse}/dw/tab_brewery")
    assert len(silver.versions()) == 12
    out = run_maintenance(spark, warehouse, "dw.tab_brewery", compact=False)
    assert len(out["kept_versions"]) == 10
    assert silver.versions() == out["kept_versions"]
    assert silver.read().count() == 3


def test_snapshots_sql_backend_gold(spark, lake):  # noqa: F811
    """backend='snapshots_sql': the reference's declared-SQL gold query
    served by the snapshot store through the snapshot_table batch
    DataSource -- same result as the API-path gold, day filter pushed
    into the manifest planner."""
    bronze, warehouse = lake
    assert run_silver(spark, bronze, DAY_A, warehouse, backend="snapshots") == 3
    assert run_silver(spark, bronze, DAY_B, warehouse, backend="snapshots") == 1
    n_sql = run_gold(
        spark, warehouse, DAY_A, backend="snapshots_sql",
        gold_table="dw.tab_brewery_summary_sql",
    )
    n_api = run_gold(
        spark, warehouse, DAY_A, backend="snapshots",
        gold_table="dw.tab_brewery_summary_api",
    )
    assert n_sql == n_api == 2
    a = SnapshotStore(spark, f"{warehouse}/dw/tab_brewery_summary_sql")
    b = SnapshotStore(spark, f"{warehouse}/dw/tab_brewery_summary_api")
    rows = lambda s: sorted(  # noqa: E731
        (str(r["sys_file_date"]), r["brewery_type"], r["country"], r["qtd"])
        for r in s.read().collect()
    )
    assert rows(a) == rows(b)
