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


# ---------------------------------------------------------------------------
# Airflow task callables (airflow_integration/spec.py targets)
# ---------------------------------------------------------------------------
#
# Stage-granular entry points so an Airflow deployment can map one task
# per stage (the reference's DAG shape) onto this pipeline.  Config comes
# from env vars (the usual Airflow Variable -> env handoff) overridable
# per-call via op_kwargs; each stage opens and closes its own session,
# matching the reference's one-spark-submit-per-DAG model (reference
# datalake_silver_spark_dag.py:169).


def stage_config(**overrides) -> dict:
    import os

    cfg = {
        "base_url": os.environ.get("PIPELINE_BASE_URL", ""),
        "bronze_dir": os.environ.get("PIPELINE_BRONZE_DIR", ""),
        "warehouse": os.environ.get("PIPELINE_WAREHOUSE", ""),
        "date": os.environ.get("PIPELINE_DATE")
        or load_date(datetime.now(timezone.utc)),
        "per_page": int(os.environ.get("PIPELINE_PER_PAGE", "200")),
        "backend": os.environ.get("PIPELINE_BACKEND", "path"),
    }
    cfg.update({k: v for k, v in overrides.items() if v is not None})
    return cfg


def probe_source_total(**kw) -> int:
    """Meta-endpoint dataset-size probe (no Spark session needed) --
    the reference's task_fetch_breweries_meta."""
    cfg = stage_config(**kw)
    src = PaginatedRestSource(cfg["base_url"], per_page=cfg["per_page"])
    return src.total_pages()


def branch_on_source_total(total_pages: int | None = None, **kw) -> str:
    """Branch-on-empty (reference task_check_and_clean_breweries_meta):
    returns the task_id to follow, per airflow_integration.spec
    BRONZE_DAG choices."""
    if total_pages is None:
        total_pages = probe_source_total(**kw)
    return "task_fetch_and_land" if total_pages > 0 else "task_skip_empty"


def _with_session(fn):
    from ..session import get_spark_session

    spark = get_spark_session("pipeline-stage")
    try:
        return fn(spark)
    finally:
        spark.stop()


def run_bronze_stage(**kw) -> int:
    cfg = stage_config(**kw)
    src = PaginatedRestSource(cfg["base_url"], per_page=cfg["per_page"])
    return _with_session(
        lambda spark: src.write_bronze(spark, cfg["bronze_dir"], cfg["date"])
    )


def run_silver_stage(**kw) -> None:
    cfg = stage_config(**kw)
    _with_session(
        lambda spark: run_silver(
            spark,
            cfg["bronze_dir"],
            cfg["date"],
            cfg["warehouse"],
            backend=cfg["backend"],
        )
    )


def run_gold_stage(**kw) -> None:
    cfg = stage_config(**kw)
    _with_session(
        lambda spark: run_gold(
            spark, cfg["warehouse"], cfg["date"], backend=cfg["backend"]
        )
    )


def main(argv: list[str] | None = None) -> int:
    from ..session import get_spark_session

    p = argparse.ArgumentParser(description="bronze->silver->gold pipeline")
    p.add_argument("--base-url", required=True, help="paginated REST endpoint")
    p.add_argument("--bronze-dir", required=True)
    p.add_argument("--warehouse", required=True)
    p.add_argument("--date", default=None, help="load date YYYY-MM-DD (default: today, America/Sao_Paulo)")
    p.add_argument(
        "--backend", choices=["path", "catalog", "snapshots"], default="path"
    )
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
