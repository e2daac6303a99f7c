"""Subprocess driver: multi-table transactions on an S3-SEMANTICS store.

Drives the transaction coordinator's WAL over mocks3:// (rename is
copy+delete and OVERWRITES; the only atomic primitive is
create-if-absent): the WAL claim must take the conditional-put branch,
a crash between the claim and the publishes must roll FORWARD on
recover(), and two transactions racing for the SAME txn id must admit
exactly one winner.

Run by tests/test_transactions.py in its own process (the fs impl jar
must be on the driver classpath at JVM launch).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))))

from docker_airflow_spark_minio_spark.session import get_spark_session  # noqa: E402


def main() -> int:
    jar = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mockfs.jar")
    work = tempfile.mkdtemp(prefix="mocks3_txn_")
    spark = get_spark_session(
        "s3-semantics-txn",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.driver.memory": "4g",
            "spark.hadoop.fs.mocks3.impl": "MockS3FileSystem",
            "spark.driver.extraClassPath": jar,
            "spark.executor.extraClassPath": jar,
        },
    )
    try:
        from docker_airflow_spark_minio_spark import transactions as tx
        from docker_airflow_spark_minio_spark.snapshots import (
            SnapshotConflict,
            SnapshotStore,
        )

        log = f"mocks3://{work}/txlog"
        a = SnapshotStore(spark, f"mocks3://{work}/a")
        b = SnapshotStore(spark, f"mocks3://{work}/b")
        df = lambda rows: spark.createDataFrame(rows, "id int, day string")  # noqa: E731
        a.write(df([(1, "d1")]), mode="snapshot", partition_by=["day"])
        b.write(df([(9, "d1")]), mode="snapshot", partition_by=["day"])

        # happy path: stage both, commit, both visible
        t = tx.MultiTableTransaction(spark, log)
        t.write(a, df([(2, "d2")]), mode="append", partition_by=["day"])
        t.write(b, df([(8, "d2")]), mode="append", partition_by=["day"])
        assert [r["id"] for r in a.read().collect()] == [1]
        t.commit()
        assert sorted(r["id"] for r in a.read().collect()) == [1, 2]
        assert sorted(r["id"] for r in b.read().collect()) == [8, 9]
        print("S3TXN-COMMIT-OK")

        # crash between claim and publishes -> recover rolls forward
        t2 = tx.MultiTableTransaction(spark, log)
        t2.write(a, df([(3, "d3")]), mode="append", partition_by=["day"])
        t2.write(b, df([(7, "d3")]), mode="append", partition_by=["day"])
        real = tx._publish_all
        tx._publish_all = lambda *args: (_ for _ in ()).throw(
            RuntimeError("crash")
        )
        try:
            try:
                t2.commit()
                raise AssertionError("commit should have crashed")
            except RuntimeError:
                pass
        finally:
            tx._publish_all = real
        out = tx.recover(spark, log)
        assert out["rolled_forward"] == [t2.txn_id], out
        assert sorted(r["id"] for r in a.read().collect()) == [1, 2, 3]
        assert sorted(r["id"] for r in b.read().collect()) == [7, 8, 9]
        print("S3TXN-RECOVER-OK")

        # same txn id racing: the conditional-put WAL claim admits ONE
        t3 = tx.MultiTableTransaction(spark, log, txn_id="fixed-id")
        t3.write(a, df([(4, "d4")]), mode="append", partition_by=["day"])
        t3.commit()
        t4 = tx.MultiTableTransaction(spark, log, txn_id="fixed-id")
        t4.write(a, df([(5, "d5")]), mode="append", partition_by=["day"])
        try:
            t4.commit()
            raise AssertionError("duplicate txn id must lose the claim")
        except SnapshotConflict:
            pass
        assert sorted(r["id"] for r in a.read().collect()) == [1, 2, 3, 4]
        print("S3TXN-CLAIM-RACE-OK")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
