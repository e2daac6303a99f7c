"""Subprocess driver: run the pipeline + snapshot store over a
NON-file:// Hadoop filesystem (``mockfs://``, the local-disk-backed
fixture in MockFileSystem.java).

Exercises the scheme-qualified URI surface an ``s3a://`` deployment
uses -- every storage touch must go through the Hadoop FileSystem API
resolved from the session (a stray ``open()``/``os.path`` on a table
path fails here).  Run by tests/test_nonlocal_fs_pipeline.py in its own
process because the fs impl jar must be on the driver classpath at JVM
launch.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))))

from docker_airflow_spark_minio_spark.session import get_spark_session  # noqa: E402


def main() -> int:
    jar = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mockfs.jar")
    work = tempfile.mkdtemp(prefix="mockfs_e2e_")
    spark = get_spark_session(
        "nonlocal-fs-e2e",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.driver.memory": "4g",
            "spark.hadoop.fs.mockfs.impl": "MockFileSystem",
            "spark.driver.extraClassPath": jar,
            "spark.executor.extraClassPath": jar,
        },
    )
    try:
        root = f"mockfs://{work}"

        # --- bronze -> silver -> gold over mockfs:// -------------------
        from docker_airflow_spark_minio_spark.jobs.pipeline import run_pipeline
        from docker_airflow_spark_minio_spark.sources.rest import (
            PaginatedRestSource,
        )

        records = [
            {"id": "b1", "name": "alpha", "brewery_type": "micro", "state": "SP"},
            {"id": "b2", "name": "beta", "brewery_type": "micro", "state": "SP"},
            {"id": "b3", "name": "gamma", "brewery_type": "nano", "state": "RJ"},
        ]

        def fetcher(url: str) -> str:
            if url.endswith("/meta"):
                return json.dumps({"total": len(records)})
            page = int(url.split("page=")[1].split("&")[0])
            return json.dumps(records[(page - 1) * 2 : page * 2])

        src = PaginatedRestSource("http://fake/api", per_page=2, fetcher=fetcher)
        m = run_pipeline(
            spark,
            src,
            f"{root}/bronze",
            f"{root}/warehouse",
            sys_file_date="2024-06-01",
        )
        assert m.counters["bronze_rows"] == 3, m.counters
        gold = spark.read.parquet(f"{root}/warehouse/dw/tab_brewery_summary")
        assert gold.count() == 2, gold.count()
        print("PIPELINE-OK")

        # --- snapshot store over mockfs:// -----------------------------
        from docker_airflow_spark_minio_spark.snapshots import SnapshotStore

        store = SnapshotStore(spark, f"{root}/snaptab")
        df = spark.createDataFrame(
            [(1, "a", "d1"), (2, "b", "d2")], "id int, v string, day string"
        )
        v0 = store.write(df, mode="snapshot", partition_by=["day"])
        store.write(
            spark.createDataFrame([(3, "c", "d1")], "id int, v string, day string"),
            mode="append",
            partition_by=["day"],
        )
        assert store.read(as_of=v0).count() == 2
        assert store.read().count() == 3
        out = store.expire_snapshots(keep_last=1, orphan_grace_ms=0)
        assert store.read().count() == 3
        print("SNAPSHOTS-OK", json.dumps(out))
        return 0
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
