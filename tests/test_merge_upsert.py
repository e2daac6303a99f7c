"""merge_upsert: key-based latest-wins CDC merge into a partitioned table.

Covers: first load dedups the batch; an update batch replaces changed
keys, inserts new keys, leaves untouched partitions byte-identical; tie
on the ordering column prefers the update (idempotent re-apply)."""

from __future__ import annotations

from pyspark.sql import functions as F

from docker_airflow_spark_minio_spark.storage import TableManager


def _rows(df):
    return {
        (r["k"], r["day"]): (r["v"], r["seq"]) for r in df.collect()
    }


def test_merge_upsert_flow(spark, tmp_path):
    tm = TableManager(spark, warehouse=str(tmp_path))
    schema = "k long, day string, v string, seq long"

    base = spark.createDataFrame(
        [
            (1, "d1", "a", 1),
            (1, "d1", "a2", 2),   # same key twice: first load keeps seq 2
            (2, "d1", "b", 1),
            (3, "d2", "c", 1),    # untouched partition
        ],
        schema,
    )
    tm.merge_upsert(base, "dw.dim", keys=["k"], partition_by=["day"], order_by="seq")
    got = _rows(tm.read("dw.dim"))
    assert got == {(1, "d1"): ("a2", 2), (2, "d1"): ("b", 1), (3, "d2"): ("c", 1)}

    updates = spark.createDataFrame(
        [
            (1, "d1", "a3", 3),   # newer seq: replaces
            (2, "d1", "b0", 1),   # SAME seq: update wins the tie
            (4, "d1", "d", 1),    # new key in an existing partition
        ],
        schema,
    )
    tm.merge_upsert(updates, "dw.dim", keys=["k"], partition_by=["day"], order_by="seq")
    got = _rows(tm.read("dw.dim"))
    assert got == {
        (1, "d1"): ("a3", 3),
        (2, "d1"): ("b0", 1),
        (3, "d2"): ("c", 1),      # d2 never rewritten
        (4, "d1"): ("d", 1),
    }

    # Re-applying the same batch is a no-op.
    tm.merge_upsert(updates, "dw.dim", keys=["k"], partition_by=["day"], order_by="seq")
    assert _rows(tm.read("dw.dim")) == got


def test_stale_update_does_not_regress(spark, tmp_path):
    tm = TableManager(spark, warehouse=str(tmp_path))
    schema = "k long, day string, v string, seq long"
    tm.merge_upsert(
        spark.createDataFrame([(1, "d1", "new", 5)], schema),
        "dw.dim", keys=["k"], partition_by=["day"], order_by="seq",
    )
    # A late-arriving OLDER version must not overwrite the newer row.
    tm.merge_upsert(
        spark.createDataFrame([(1, "d1", "old", 2)], schema),
        "dw.dim", keys=["k"], partition_by=["day"], order_by="seq",
    )
    [r] = tm.read("dw.dim").collect()
    assert (r["v"], r["seq"]) == ("new", 5)


def test_empty_update_batch_is_noop(spark, tmp_path):
    tm = TableManager(spark, warehouse=str(tmp_path))
    schema = "k long, day string, v string, seq long"
    base = spark.createDataFrame([(1, "d1", "a", 1)], schema)
    tm.merge_upsert(base, "dw.dim", keys=["k"], partition_by=["day"], order_by="seq")
    empty = spark.createDataFrame([], schema)
    tm.merge_upsert(empty, "dw.dim", keys=["k"], partition_by=["day"], order_by="seq")
    assert _rows(tm.read("dw.dim")) == {(1, "d1"): ("a", 1)}


def test_merge_staging_prefix_is_cleaned(spark, tmp_path):
    import os

    tm = TableManager(spark, warehouse=str(tmp_path))
    schema = "k long, day string, v string, seq long"
    base = spark.createDataFrame([(1, "d1", "a", 1)], schema)
    tm.merge_upsert(base, "dw.dim", keys=["k"], partition_by=["day"], order_by="seq")
    upd = spark.createDataFrame([(1, "d1", "a2", 2)], schema)
    tm.merge_upsert(upd, "dw.dim", keys=["k"], partition_by=["day"], order_by="seq")
    assert not os.path.exists(tm.path("dw.dim") + "__merge_tmp")
    assert _rows(tm.read("dw.dim")) == {(1, "d1"): ("a2", 2)}


def test_partition_values_needing_hive_escaping(spark, tmp_path):
    # Spark writes day='a:b' as day=a%3Ab; the swap must probe the
    # escaped directory or it silently discards the merged rows.
    tm = TableManager(spark, warehouse=str(tmp_path))
    schema = "k long, day string, v string, seq long"
    base = spark.createDataFrame([(1, "a:b", "x", 1), (2, "plain", "y", 1)], schema)
    tm.merge_upsert(base, "dw.dim", keys=["k"], partition_by=["day"], order_by="seq")
    upd = spark.createDataFrame([(1, "a:b", "x2", 2)], schema)
    tm.merge_upsert(upd, "dw.dim", keys=["k"], partition_by=["day"], order_by="seq")
    assert _rows(tm.read("dw.dim")) == {
        (1, "a:b"): ("x2", 2),
        (2, "plain"): ("y", 1),
    }


def test_crashed_swap_recovers_on_next_merge(spark, tmp_path):
    # Simulate the worst window: a partition was deleted from the live
    # table but its merged replacement still sits in the staging prefix
    # (crash between delete and rename).  The next merge_upsert must
    # complete the swap before merging, not wipe the staging copy.
    import os
    import shutil

    tm = TableManager(spark, warehouse=str(tmp_path))
    schema = "k long, day string, v string, seq long"
    base = spark.createDataFrame([(1, "d1", "a", 1), (2, "d2", "b", 1)], schema)
    tm.merge_upsert(base, "dw.dim", keys=["k"], partition_by=["day"], order_by="seq")

    live = tm.path("dw.dim")
    tmp = live + "__merge_tmp"
    os.makedirs(tmp, exist_ok=True)
    shutil.move(f"{live}/day=d1", f"{tmp}/day=d1")  # crashed mid-swap
    assert not os.path.exists(f"{live}/day=d1")

    upd = spark.createDataFrame([(2, "d2", "b2", 2)], schema)
    tm.merge_upsert(upd, "dw.dim", keys=["k"], partition_by=["day"], order_by="seq")
    assert _rows(tm.read("dw.dim")) == {
        (1, "d1"): ("a", 1),      # restored from staging, not lost
        (2, "d2"): ("b2", 2),
    }
    assert not os.path.exists(tmp)
