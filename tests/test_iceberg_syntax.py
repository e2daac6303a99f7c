"""Pin the Iceberg form of the catalog DDL/DML to valid syntax.

No iceberg-spark-runtime jar ships in this container, so the Iceberg
path cannot run end-to-end here.  Re-checked round 6 (2026-08-14): no
jar on disk; `pip install/download` of apache-airflow and pyiceberg
both fail with "versions: none" and repo1.maven.org does not resolve
(no DNS), so vendoring remains impossible; the executed snapshot
semantics live in snapshots.py and these parse-pins stay the gate.  If a jar ever lands, point
``spark.jars`` at it and the `test_iceberg_ddl_fails_only_on_missing_jar`
branch flips to a live execution check automatically.  These tests keep
the catalog-agnostic claim honest anyway:

 * the generated ``USING ICEBERG`` DDL must PARSE with Spark's SQL
   parser (catches structural rot: bad commas, misplaced PARTITIONED
   BY, reserved-word columns);
 * executing it must fail ONLY with the missing-data-source error --
   never a parse error -- proving the statement is valid up to the jar;
 * the DDL shape and writer options match the reference exactly
   (reference job_silver.py:66-88, :174-178).
"""

from __future__ import annotations

import pytest

from docker_airflow_spark_minio_spark.catalog import (
    ICEBERG_WRITE_OPTIONS,
    SqlCatalog,
    format_write_options,
)
from docker_airflow_spark_minio_spark.schema import BREWERY_DESCRIBE_LIST


@pytest.fixture()
def iceberg_catalog(spark):
    return SqlCatalog(spark, database="dw", table_format="ICEBERG")


def _parse(spark, sql_text: str) -> None:
    """Raises ParseException on invalid SQL."""
    spark._jsparkSession.sessionState().sqlParser().parsePlan(sql_text)


def test_iceberg_ddl_parses(spark, iceberg_catalog):
    ddl = iceberg_catalog.create_table_ddl("tab_brewery", BREWERY_DESCRIBE_LIST)
    _parse(spark, ddl)


def test_iceberg_ddl_shape_matches_reference(iceberg_catalog):
    ddl = iceberg_catalog.create_table_ddl("tab_brewery", BREWERY_DESCRIBE_LIST)
    assert "USING ICEBERG" in ddl
    assert "PARTITIONED BY (sys_file_date)" in ddl
    # Partition column emitted last in the column list (stored order).
    cols_part = ddl.split("USING", 1)[0].split("(", 1)[1].rsplit(")", 1)[0]
    assert cols_part.rstrip().endswith("sys_file_date DATE")
    # Retention policy lives on the TABLE (TBLPROPERTIES), so every
    # write path honors it -- insertInto ignores per-writer options.
    assert "TBLPROPERTIES" in ddl
    assert "'write.metadata.previous-versions-max'='10'" in ddl
    assert "'write.metadata.delete-after-commit.enabled'='true'" in ddl


def test_parquet_ddl_has_no_tblproperties(spark):
    ddl = SqlCatalog(spark, database="dw", table_format="parquet").create_table_ddl(
        "tab_brewery", BREWERY_DESCRIBE_LIST
    )
    assert "TBLPROPERTIES" not in ddl


def test_iceberg_ddl_fails_only_on_missing_jar(spark, iceberg_catalog):
    """The statement must be valid Iceberg SQL: without the runtime jar
    Spark rejects it at data-source lookup, NOT at parsing."""
    ddl = iceberg_catalog.create_table_ddl("tab_brewery_icb_probe", BREWERY_DESCRIBE_LIST)
    spark.sql("CREATE DATABASE IF NOT EXISTS dw")
    try:
        spark.sql(ddl)
    except Exception as exc:  # noqa: BLE001
        msg = str(exc)
        assert "ParseException" not in type(exc).__name__, msg
        assert "iceberg" in msg.lower(), msg  # failed finding the source
    else:  # pragma: no cover - only on clusters with the jar present
        spark.sql("DROP TABLE IF EXISTS dw.tab_brewery_icb_probe")


def test_reference_write_options_pinned():
    assert format_write_options("iceberg") == ICEBERG_WRITE_OPTIONS
    assert format_write_options("ICEBERG") == ICEBERG_WRITE_OPTIONS
    assert format_write_options("parquet") == {}
    assert ICEBERG_WRITE_OPTIONS == {
        "write.metadata.delete-after-commit.enabled": "true",
        "write.metadata.previous-versions-max": "10",
    }
