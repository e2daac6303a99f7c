"""SparkSession factory.

Covers the reference's session/config surface (reference:
spark/jobs/job_silver.py:96-117 and job_gold.py:26-58 build sessions with
catalog + S3A confs injected via ``spark-submit --conf``;
airflow/dags/datalake_silver_spark_dag.py:173-190 shows the full conf list).
Here the same knobs are a single factory with scale-appropriate defaults:
AQE on, explicit shuffle parallelism, Arrow for any Python exchange, UTC
session timezone so results are engine-portable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the local[32] test harness; on a real cluster the
# caller overrides master/shuffle-partitions (rule of thumb: 2-3x total
# cores, or rely on AQE coalescing from a high initial value).
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark_session(
    app_name: str = "docker-airflow-spark-minio-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    s3a: dict[str, str] | None = None,
) -> SparkSession:
    """Build a SparkSession tuned for large-scale batch analytics.

    ``s3a`` maps the reference's MinIO connection surface
    (endpoint/access-key/secret/path-style -- reference
    datalake_silver_spark_dag.py:178-189) onto hadoop confs; pass only when
    an object store is actually in play.
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{DEFAULT_CPUS}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(DEFAULT_CPUS))
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- scale posture (SURVEY.md section 7.2.6) ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # Arrow makes any unavoidable Python exchange (pandas UDFs,
        # toPandas) batch-columnar instead of row-at-a-time.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic, engine-portable time semantics.
        .config("spark.sql.session.timeZone", "UTC")
        # Partitioned writes replace only the partitions present in the
        # incoming DataFrame (fixes the reference's full-table overwrite,
        # SURVEY.md section 1.3 / section 8.1).
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # Long-lived sessions running many queries age badly with the
        # 30min default: shuffle files / broadcast blocks are freed by
        # the ContextCleaner only when driver GC collects their weak
        # refs, and a large driver heap may not GC for the whole run.
        # Measured on the 112-query sf0.1 sweep: 274s -> 138s total
        # (worst query 27s -> 4.5s) from this one conf.
        .config("spark.cleaner.periodicGC.interval", "60s")
        # Session-catalog tables (catalog.py) default under /tmp, not cwd;
        # real deployments point this at the lake warehouse.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_warehouse"),
        )
        .config("spark.ui.enabled", "false")
    )

    if s3a:
        endpoint = s3a.get("endpoint")
        if endpoint:
            builder = builder.config("spark.hadoop.fs.s3a.endpoint", endpoint)
        if s3a.get("access_key"):
            builder = builder.config("spark.hadoop.fs.s3a.access.key", s3a["access_key"])
        if s3a.get("secret_key"):
            builder = builder.config("spark.hadoop.fs.s3a.secret.key", s3a["secret_key"])
        builder = (
            builder.config("spark.hadoop.fs.s3a.path.style.access", "true")
            .config("spark.hadoop.fs.s3a.connection.ssl.enabled", "false")
            .config(
                "spark.hadoop.fs.s3a.aws.credentials.provider",
                "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider",
            )
        )

    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)

    return builder.getOrCreate()
