"""distributed_rank: bit-equality with the direct window and real
sharding of the sort work."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from docker_airflow_spark_minio_spark.operators.rank import distributed_rank


def _data(spark):
    # Two groups, heavily skewed: group 'a' has 5000 rows, 'b' has 7.
    # Values interleave so range chunks cut through both groups.
    rows = [("a", (i * 37) % 5000, i) for i in range(5000)]
    rows += [("b", i * 11, 10_000 + i) for i in range(7)]
    return spark.createDataFrame(rows, "g string, v long, id long")


def test_matches_direct_window_exactly(spark):
    df = _data(spark)
    got = {
        r["id"]: r["rn"]
        for r in distributed_rank(df, ["g"], ["v", "id"]).collect()
    }
    w = Window.partitionBy("g").orderBy("v", "id")
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_sort_work_is_sharded(spark):
    # The whole point: the heavy local-rank window partitions on
    # (group, chunk-id), so with 8 shuffle partitions group 'a' is
    # processed as MULTIPLE chunks, not one reducer task.
    df = _data(spark)
    ranked = distributed_rank(df, ["g"], ["v", "id"], num_partitions=8)
    # recompute the chunk spread the operator used
    chunks = (
        df.repartitionByRange(8, F.col("g"), F.col("v"), F.col("id"))
        .withColumn("pid", F.spark_partition_id())
        .where(F.col("g") == "a")
        .select("pid")
        .distinct()
        .count()
    )
    assert chunks > 1
    assert ranked.count() == 5007
