"""Manifest NDV sketches + ANALYZE-less join planning
(snapshots.write(ndv_cols=...), plans/join_stats.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docker_airflow_spark_minio_spark.plans import physical_plan
from docker_airflow_spark_minio_spark.plans.join_stats import (
    join_snapshot_tables,
    plan_snapshot_join,
)
from docker_airflow_spark_minio_spark.snapshots import SnapshotStore


@pytest.fixture()
def no_auto_broadcast(spark):
    """Disable Spark's own size-based auto-broadcast so any broadcast
    in the plan is attributable to OUR manifest-stats decision."""
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    yield spark
    spark.conf.set(key, old)


def _facts(spark, root, n=5000):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("dim_id"),
        (F.col("id") * 3).alias("val"),
    )
    s = SnapshotStore(spark, root)
    s.write(df, mode="snapshot", stats_cols=["k"], ndv_cols=["dim_id"])
    return s


def _dim(spark, root, n=97):
    df = spark.range(n).select(
        F.col("id").alias("dim_id"),
        F.concat(F.lit("name-"), F.col("id")).alias("name"),
    )
    s = SnapshotStore(spark, root)
    s.write(df, mode="snapshot", stats_cols=["dim_id"], ndv_cols=["dim_id"])
    return s


def test_ndv_sketch_estimates_and_merges(spark, tmp_path):
    root = str(tmp_path / "t")
    s = SnapshotStore(spark, root)
    df = spark.range(1000).select(
        (F.col("id") % 300).alias("u"), F.col("id").alias("k")
    )
    s.write(df, mode="snapshot", stats_cols=["k"], ndv_cols=["u", "k"])
    assert abs(s.column_ndv("u") - 300) <= 15  # HLL ~2% at lgK 12
    assert abs(s.column_ndv("k") - 1000) <= 50
    assert s.column_ndv("missing") is None
    # append MERGES: 200 new distinct u values
    s.write(
        spark.range(1000, 1200).select(
            F.col("id").alias("u"), F.col("id").alias("k")
        ),
        mode="append",
        ndv_cols=["u", "k"],
    )
    assert abs(s.column_ndv("u") - 500) <= 25
    # full replace RESTARTS the sketch
    s.write(
        spark.range(10).select(F.col("id").alias("u"), F.col("id").alias("k")),
        mode="snapshot",
        stats_cols=["k"],
        ndv_cols=["u"],
    )
    assert s.column_ndv("u") <= 11
    # time travel reads the old sketch
    assert s.column_ndv("u", as_of=1) > 400


def test_ndv_invalidated_by_unsketched_data_commits(spark, tmp_path):
    """A data commit that skips ndv_cols INVALIDATES the sketch (a
    stale estimate is worse than none); masking-only deletes keep it
    as an upper bound; compaction (data-identical) keeps it too."""
    s = SnapshotStore(spark, str(tmp_path / "t"))
    df = spark.range(500).select(
        (F.col("id") % 50).alias("u"), F.col("id").alias("k")
    )
    s.write(df, mode="snapshot", stats_cols=["k"], ndv_cols=["u"])
    assert abs(s.column_ndv("u") - 50) <= 5
    # masking-only delete: sketch survives (upper bound)
    s.delete_keys(spark.createDataFrame([(1,)], "k long"), ["k"])
    assert abs(s.column_ndv("u") - 50) <= 5
    # compaction: data-identical, sketch survives
    s.compact(all_partitions=True)
    assert abs(s.column_ndv("u") - 50) <= 5
    # unsketched append: sketch dropped (would under-count the batch)
    s.write(
        spark.range(5000, 5400).select(
            F.col("id").alias("u"), F.col("id").alias("k")
        ),
        mode="append",
        stats_cols=["k"],
    )
    assert s.column_ndv("u") is None
    # update_where rewrites values -> sketch (re-added) dropped again
    s.write(df, mode="snapshot", stats_cols=["k"], ndv_cols=["u"])
    s.update_where(F.col("k") == 5, {"u": F.lit(999)})
    assert s.column_ndv("u") is None


def test_join_flips_smj_to_broadcast_from_manifest_stats(
    no_auto_broadcast, tmp_path
):
    spark = no_auto_broadcast
    facts = _facts(spark, str(tmp_path / "facts"))
    dim = _dim(spark, str(tmp_path / "dim"))

    joined, decision = join_snapshot_tables(facts, dim, "dim_id")
    assert decision.strategy == "broadcast_right", decision
    assert decision.right.rows == 97 and decision.left.rows == 5000
    assert "BroadcastHashJoin" in physical_plan(joined)
    assert joined.count() == 5000

    # threshold 0: the SAME tables stay on the shuffle path
    joined2, decision2 = join_snapshot_tables(
        facts, dim, "dim_id", broadcast_threshold_rows=0
    )
    assert decision2.strategy == "shuffle"
    assert "SortMergeJoin" in physical_plan(joined2)
    assert "BroadcastHashJoin" not in physical_plan(joined2)

    # output estimate: 5000 * 97 / max(ndv) ~ 5000
    assert decision.est_output_rows is not None
    assert abs(decision.est_output_rows - 5000) <= 300


def test_unknown_rows_never_broadcast(spark, tmp_path):
    """Live MoR delete sets make row counts unprovable; NDV (a lower
    bound) can refuse a broadcast but never approve one."""
    s = _facts(spark, str(tmp_path / "facts"), n=3000)
    dim = SnapshotStore(spark, str(tmp_path / "dim"))
    dim.write(
        spark.range(50).select(
            F.col("id").alias("dim_id"), F.col("id").alias("x")
        ),
        mode="snapshot",
        stats_cols=["dim_id"],
        ndv_cols=["dim_id"],
    )
    dim.delete_keys(spark.createDataFrame([(1,)], "dim_id long"), ["dim_id"])
    assert dim.count_rows() is None
    # facts (3000 rows) exceed the threshold; dim rows are unknowable:
    # NDV alone must not approve a broadcast
    d = plan_snapshot_join(s, dim, "dim_id", broadcast_threshold_rows=1000)
    assert d.strategy == "shuffle" and "unprovable" in d.reason


def test_skew_hint_on_shuffle_decisions(spark, tmp_path):
    """rows/ndv from the manifest sketches flags skew-prone shuffle
    keys (the salting / AQE-skew-split signal) without any data scan."""
    skewed = SnapshotStore(spark, str(tmp_path / "sk"))
    skewed.write(
        spark.range(20000).select(
            (F.col("id") % 5).alias("dim_id"), F.col("id").alias("v")
        ),
        mode="snapshot",
        stats_cols=["v"],
        ndv_cols=["dim_id"],
    )
    def _uniform(root):
        s = SnapshotStore(spark, root)
        s.write(
            spark.range(20000).select(
                F.col("id").alias("dim_id"), F.col("id").alias("v")
            ),
            mode="snapshot",
            stats_cols=["v"],
            ndv_cols=["dim_id"],
        )
        return s

    other = _uniform(str(tmp_path / "f"))
    d = plan_snapshot_join(skewed, other, "dim_id", broadcast_threshold_rows=100)
    assert d.strategy == "shuffle"
    assert d.skew_hint is not None and "left" in d.skew_hint
    assert d.left.skew_factor is not None and d.left.skew_factor > 1000
    # well-distributed keys on BOTH sides carry no hint
    d2 = plan_snapshot_join(
        _uniform(str(tmp_path / "f2")),
        other,
        "dim_id",
        broadcast_threshold_rows=100,
    )
    assert d2.skew_hint is None
