"""Catalog/DDL surface test: the reference's named-table flow end-to-end.

CREATE SCHEMA/TABLE IF NOT EXISTS from the describe-list (reference
job_silver.py:63-88, job_gold.py:7-19), silver + gold through the
``backend='catalog'`` path, queries as SQL text over named tables
(job_gold.py:71-88), idempotent re-runs, and per-partition overwrite.
"""

from __future__ import annotations

import pytest

from docker_airflow_spark_minio_spark.catalog import SqlCatalog
from docker_airflow_spark_minio_spark.jobs import run_gold, run_silver
from docker_airflow_spark_minio_spark.schema import BREWERY_DESCRIBE_LIST

from test_pipeline_e2e import DAY_A, DAY_B, RECORDS_A, _write_bronze

RECORDS_B2 = [
    {"id": "4", "name": "Delta", "brewery_type": "micro", "country": "US"},
    {"id": "5", "name": "Eps", "brewery_type": "brewpub", "country": "DE"},
]


def test_ddl_from_describe_list(spark):
    cat = SqlCatalog(spark, database="dw")
    ddl = cat.create_table_ddl("tab_brewery", BREWERY_DESCRIBE_LIST)
    assert "CREATE TABLE IF NOT EXISTS dw.tab_brewery" in ddl
    assert "USING parquet" in ddl
    assert "PARTITIONED BY (sys_file_date)" in ddl
    assert "phone BIGINT" in ddl
    # partition column last, like the stored schema
    assert ddl.index("sys_file_date DATE") > ddl.index("street STRING")


def test_catalog_pipeline_end_to_end(spark, tmp_path):
    bronze = str(tmp_path / "bronze" / "brewery")
    warehouse = str(tmp_path / "warehouse")
    _write_bronze(bronze, DAY_A, RECORDS_A)
    _write_bronze(bronze, DAY_B, RECORDS_B2)

    # silver via named tables; rerun is idempotent (dynamic overwrite)
    assert run_silver(spark, bronze, DAY_A, warehouse, backend="catalog") == 3
    assert run_silver(spark, bronze, DAY_A, warehouse, backend="catalog") == 3
    assert run_silver(spark, bronze, DAY_B, warehouse, backend="catalog") == 2

    # the table is a real catalog name queryable with SQL text
    n = spark.sql(
        f"SELECT count(*) AS n FROM dw.tab_brewery WHERE sys_file_date = '{DAY_A}'"
    ).collect()[0]["n"]
    assert n == 3
    assert spark.table("dw.tab_brewery").count() == 5
    # conformance survived the catalog path (cast-to-null etc.)
    rows = {r["id"]: r for r in spark.table("dw.tab_brewery").collect()}
    assert rows["1"]["phone"] == 5551234
    assert rows["2"]["phone"] is None

    # gold: the reference's SQL-text aggregation over the named table
    assert run_gold(spark, warehouse, DAY_A, backend="catalog") == 2
    assert run_gold(spark, warehouse, DAY_B, backend="catalog") == 2
    got = [
        (str(r["sys_file_date"]), r["brewery_type"], r["country"], r["qtd"])
        for r in spark.sql(
            "SELECT * FROM dw.tab_brewery_summary ORDER BY sys_file_date, brewery_type"
        ).collect()
    ]
    assert got == [
        (DAY_A, "micro", "US", 2),
        (DAY_A, "nano", "PT", 1),
        (DAY_B, "brewpub", "DE", 1),
        (DAY_B, "micro", "US", 1),
    ]

    # day-A gold survives a day-B rerun (per-partition overwrite)
    assert run_gold(spark, warehouse, DAY_B, backend="catalog") == 2
    assert spark.table("dw.tab_brewery_summary").count() == 4

    # snapshot mode reproduces the reference's full-table replace
    run_silver(spark, bronze, DAY_B, warehouse, backend="catalog", mode="snapshot")
    assert spark.table("dw.tab_brewery").count() == 2

    spark.sql("DROP TABLE IF EXISTS dw.tab_brewery")
    spark.sql("DROP TABLE IF EXISTS dw.tab_brewery_summary")
    spark.sql("DROP DATABASE IF EXISTS dw")


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    from docker_airflow_spark_minio_spark import plans

    cat = SqlCatalog(spark, database="bkt")
    cat.ensure_database(location=str(tmp_path / "bkt"))
    left = spark.range(0, 10_000).selectExpr("id AS k", "id * 2 AS v")
    right = spark.range(0, 10_000, 3).selectExpr("id AS k", "id * 7 AS w")
    cat.save_bucketed(left, "l", ["k"], n_buckets=8, sort_cols=["k"])
    cat.save_bucketed(right, "r", ["k"], n_buckets=8, sort_cols=["k"])

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bkt.l").join(spark.table("bkt.r"), "k")
        # the join consumes the write-time bucketing: zero exchanges
        assert plans.shuffle_count(j) == 0, plans.physical_plan(j)
        assert j.count() == 3334  # multiples of 3 in [0, 10000)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt.l")
        spark.sql("DROP TABLE IF EXISTS bkt.r")
        spark.sql("DROP DATABASE IF EXISTS bkt")


def test_overwrite_modes_do_not_leak_session_conf(spark, tmp_path):
    """snapshot/overwrite_partitions must restore the session's
    partitionOverwriteMode: a leaked 'static' silently turns later
    dynamic overwrites into full-table replaces (data loss)."""
    key = "spark.sql.sources.partitionOverwriteMode"
    before = spark.conf.get(key)
    cat = SqlCatalog(spark, database="leakchk")
    cat.ensure_database(location=str(tmp_path / "leakchk"))
    df = spark.createDataFrame([(1, "a")], "id long, part string")
    spark.sql(
        "CREATE TABLE IF NOT EXISTS leakchk.t (id BIGINT, part STRING) "
        "USING parquet PARTITIONED BY (part)"
    )
    try:
        cat.snapshot(df, "t")
        assert spark.conf.get(key) == before
        cat.overwrite_partitions(df, "t")
        assert spark.conf.get(key) == before
        cat.append(df, "t")
        assert spark.table("leakchk.t").count() == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS leakchk.t")
        spark.sql("DROP DATABASE IF EXISTS leakchk")
