"""Pipeline driver: bronze -> silver -> gold in one entry point.

The reference's user-facing surface is an orchestrator DAG that triggers
the three stages sequentially with wait-for-completion (reference
datalake_pipeline_breweries.py:200-256, cron ``20 0 * * *`` at :202).
Spark-first, the stages are function calls sharing one SparkSession --
no per-stage cluster spin-up, no XCom -- and the cron schedule is a
deployment concern: point any scheduler at :func:`main`
(``python -m docker_airflow_spark_minio_spark.jobs.pipeline``).

Failure semantics match the reference: a stage raising aborts the run
(downstream stages don't fire); metrics capture per-stage wall clock and
row counts either way.
"""

from __future__ import annotations

import argparse
import sys
from datetime import datetime, timezone

from pyspark.sql import SparkSession

from ..dates import load_date
from ..metrics import RunMetrics, format_duration
from ..schema import DescribeList
from ..sources.rest import PaginatedRestSource
from .job_gold import run_gold
from .job_silver import run_silver


def run_pipeline(
    spark: SparkSession,
    source: PaginatedRestSource,
    bronze_dir: str,
    warehouse: str,
    sys_file_date: str | None = None,
    silver_table: str = "dw.tab_brewery",
    gold_table: str = "dw.tab_brewery_summary",
    describe_list: DescribeList | None = None,
    backend: str = "path",
    metrics: RunMetrics | None = None,
) -> RunMetrics:
    """Run fetch -> conform -> aggregate for one load date.

    ``sys_file_date`` defaults to today's date in the reference's
    timezone (America/Sao_Paulo, C8 semantics)."""
    metrics = metrics or RunMetrics()
    day = sys_file_date or load_date(datetime.now(timezone.utc))

    with metrics.timed("pipeline_total"):
        with metrics.timed("bronze"):
            n_bronze = source.write_bronze(spark, bronze_dir, day)
            metrics.count("bronze_rows", n_bronze)
        with metrics.timed("silver"):
            run_silver(
                spark,
                bronze_dir,
                day,
                warehouse,
                table=silver_table,
                describe_list=describe_list,
                metrics=metrics,
                backend=backend,
            )
        with metrics.timed("gold"):
            run_gold(
                spark,
                warehouse,
                day,
                silver_table=silver_table,
                gold_table=gold_table,
                metrics=metrics,
                backend=backend,
            )
    return metrics


def main(argv: list[str] | None = None) -> int:
    from ..session import get_spark_session

    p = argparse.ArgumentParser(description="bronze->silver->gold pipeline")
    p.add_argument("--base-url", required=True, help="paginated REST endpoint")
    p.add_argument("--bronze-dir", required=True)
    p.add_argument("--warehouse", required=True)
    p.add_argument("--date", default=None, help="load date YYYY-MM-DD (default: today, America/Sao_Paulo)")
    p.add_argument("--backend", choices=["path", "catalog"], default="path")
    p.add_argument("--per-page", type=int, default=200)
    args = p.parse_args(argv)

    spark = get_spark_session("pipeline")
    try:
        metrics = run_pipeline(
            spark,
            PaginatedRestSource(args.base_url, per_page=args.per_page),
            args.bronze_dir,
            args.warehouse,
            sys_file_date=args.date,
            backend=args.backend,
        )
        print(metrics.to_json())
        print(f"total {format_duration(metrics.timings['pipeline_total'])}", file=sys.stderr)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
