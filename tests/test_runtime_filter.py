"""Runtime (bloom) filter injection: the AQE-era answer to scanning a
huge fact table for a selective dim-filtered join.

At 100 TB the single biggest read saving on star joins is the runtime
filter: Spark builds a bloom filter from the filtered dimension side
and applies it to the fact scan, skipping rows (and with parquet,
row groups) whose keys cannot join.  This test pins the feature ON in
the session config and asserts the optimizer actually injects it for
the selective-join shape, so a config regression cannot silently turn
100 TB scans back on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from docker_airflow_spark_minio_spark import plans


def test_bloom_runtime_filter_injected(spark, tmp_path):
    assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"

    fact_dir = str(tmp_path / "fact")
    dim_dir = str(tmp_path / "dim")
    spark.range(0, 200_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    ).write.parquet(fact_dir)
    spark.range(0, 20_000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("cat")
    ).write.parquet(dim_dir)

    fact = spark.read.parquet(fact_dir)
    dim = spark.read.parquet(dim_dir).where(F.col("cat") == 3)  # selective

    prev_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_app = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    # force a shuffle join (runtime filters target non-broadcast joins)
    # and scale the 10GB production application-side threshold down to
    # the test's MB-sized fact table -- the INJECTION RULE is what's
    # under test, not the threshold value
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    try:
        j = fact.join(dim, "k").groupBy("cat").agg(F.sum("v").alias("s"))
        plan = plans.physical_plan(j)
        assert "bloomfilter" in plan.lower().replace("_", ""), plan
        assert j.count() == 1  # single surviving cat group; plan executes
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            prev_app,
        )
