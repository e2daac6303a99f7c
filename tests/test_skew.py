"""Salted-join equivalence: results identical to the plain join, salt
spread actually splits the hot key, and the salt column never leaks."""

from __future__ import annotations

from pyspark.sql import functions as F

from docker_airflow_spark_minio_spark.operators.skew import SALT_COL, salted_join


def _skewed_frames(spark):
    # 90% of probe rows share one hot key
    probe = spark.createDataFrame(
        [(("hot" if i % 10 else f"k{i}"), i) for i in range(1000)], "k string, v long"
    )
    build = spark.createDataFrame(
        [("hot", 100), ("k10", 1), ("k20", 2), ("missing", 9)], "k string, w long"
    )
    return probe, build


def test_salted_join_equals_plain_join(spark):
    probe, build = _skewed_frames(spark)
    for how in ("inner", "left"):
        got = salted_join(probe, build, on=["k"], salts=8, how=how)
        expected = probe.join(build, ["k"], how)
        assert SALT_COL not in got.columns
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, expected.collect())
        )


def test_salt_spreads_hot_key(spark):
    probe, _ = _skewed_frames(spark)
    spread = probe.where(F.col("k") == "hot").withColumn(
        SALT_COL, F.floor(F.rand(42) * 8).cast("int")
    )
    n_salts = spread.select(SALT_COL).distinct().count()
    assert n_salts == 8  # 900 hot rows land in all 8 sub-keys


def test_salt_by_column_is_deterministic(spark):
    probe, build = _skewed_frames(spark)
    a = salted_join(probe, build, on=["k"], salts=4, salt_by="v")
    b = salted_join(probe, build, on=["k"], salts=4, salt_by="v")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_salted_join_rejects_build_preserving_joins(spark):
    import pytest

    probe, build = _skewed_frames(spark)
    with pytest.raises(ValueError):
        salted_join(probe, build, on=["k"], how="right")
    with pytest.raises(ValueError):
        salted_join(probe, build, on=["k"], how="full")


def test_aqe_splits_skewed_sortmerge_join(spark):
    """The session factory turns AQE skew-join on; prove it fires: a
    hot-key sort-merge join's final adaptive plan carries skew=true
    (AQE splits the oversized partition into parallel sub-reads)."""
    from docker_airflow_spark_minio_spark import plans

    conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    prev = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        probe = spark.range(0, 300_000).selectExpr(
            "CASE WHEN id % 10 < 9 THEN 0 ELSE id END AS k",
            "repeat('x', 32) AS pad",
        )
        build = spark.range(0, 1000).selectExpr("id AS k", "id AS w")
        j = probe.join(build, "k").select("k")
        # collect() drives THIS DataFrame's own query execution, so the
        # adaptive plan below is the final (post-replan) one -- count()
        # would execute a separate plan instance
        n = len(j.collect())
        assert n == 270_000 + 100  # hot key 0 (270k rows) + keys 10,20,...
        final = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final
        assert "skew=true" in final, final[:2000]
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)
