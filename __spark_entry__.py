"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` exposes
every implemented operator from SURVEY.md section 2 (plus the extension
surface); ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL for each.
Implementations live in ``docker_airflow_spark_minio_spark/workloads/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from docker_airflow_spark_minio_spark.workloads import REGISTRY  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["q1_pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator; each callable takes
    (spark, sf_dir) and returns a DataFrame."""
    return {name: wl.fn for name, wl in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted for the few
    non-SQL-expressible ops -> driver records a rows-only check)."""
    return {name: wl.oracle for name, wl in REGISTRY.items() if wl.oracle is not None}
