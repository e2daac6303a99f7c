"""Declarative DAG topology for the bronze -> silver -> gold pipeline.

Pure data, no Airflow import: the same spec drives the real DAG builder
(:mod:`.dags`) and the structural unit tests, so the deployment story is
CI-checked even where ``apache-airflow`` is not installed.

Mirrors the reference's shape (cited per DAG below): an orchestrator
chaining three stage DAGs via TriggerDagRun with wait-for-completion, a
bronze DAG with a meta probe, a branch-on-empty, and a page-fetch
fan-out, and one-job silver/gold DAGs.  Retry policy matches the
reference's ``default_args`` (retries=1, retry_delay=2s; the fetch tasks
additionally retry 5x at the source level -- sources/rest.py:37-53).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class TaskSpec:
    task_id: str
    kind: str  # 'empty' | 'python' | 'trigger_dag' | 'branch'
    # python: dotted callable path into this package; trigger_dag: the
    # triggered dag_id; branch: dotted callable returning a task_id.
    target: str = ""
    # branch tasks: the task ids the branch may choose between.
    choices: tuple[str, ...] = ()
    retries: int = 1
    retry_delay_s: int = 2
    # trigger_dag semantics (reference pipeline DAG :218-236)
    wait_for_completion: bool = False
    reset_dag_run: bool = False
    # Airflow trigger rule; a join task downstream of a branch needs
    # 'none_failed_min_one_success' or the skipped arm's skip cascades
    # into it and it never runs.
    trigger_rule: str = "all_success"
    # python/branch tasks: task_id whose XCom return value is passed as
    # this callable's first positional argument (e.g. the branch
    # consumes the probe's result instead of re-fetching it).
    xcom_arg_from: str = ""


@dataclass(frozen=True)
class DagSpec:
    dag_id: str
    schedule: str | None  # cron, or None for triggered-only DAGs
    tasks: tuple[TaskSpec, ...]
    edges: tuple[tuple[str, str], ...]  # (upstream_id, downstream_id)
    tags: tuple[str, ...] = field(default=())

    def task(self, task_id: str) -> TaskSpec:
        for t in self.tasks:
            if t.task_id == task_id:
                return t
        raise KeyError(task_id)

    def downstream(self, task_id: str) -> tuple[str, ...]:
        return tuple(d for u, d in self.edges if u == task_id)


_JOBS = "docker_airflow_spark_minio_spark.jobs"

# -- 1: bronze (reference datalake_bronze_fetch_raw_data_api_dag.py:339-377:
# meta fetch w/ retry -> BranchPythonOperator on empty meta -> page
# fetch fan-out -> join).  Here the page fan-out is ONE task: the Spark
# source already fans pages out executor-side (sources/rest.py:95-119),
# so Airflow-level per-page tasks would serialize what Spark
# parallelizes.
BRONZE_DAG = DagSpec(
    dag_id="1_datalake_bronze_ingest",
    schedule=None,
    tasks=(
        TaskSpec("task_init", "empty"),
        TaskSpec(
            "task_probe_meta",
            "python",
            target=f"{_JOBS}.pipeline.probe_source_total",
            retries=5,
            retry_delay_s=5,
        ),
        TaskSpec(
            "task_branch_on_empty",
            "branch",
            target=f"{_JOBS}.pipeline.branch_on_source_total",
            choices=("task_fetch_and_land", "task_skip_empty"),
            # Decide from the probe task's XCom result -- no second meta
            # fetch (which would carry the branch's weaker retry policy).
            xcom_arg_from="task_probe_meta",
        ),
        TaskSpec(
            "task_fetch_and_land",
            "python",
            target=f"{_JOBS}.pipeline.run_bronze_stage",
        ),
        TaskSpec("task_skip_empty", "empty"),
        # Join of the two branch arms: exactly one arm is skipped per
        # run, so all_success would skip the join forever.
        TaskSpec("task_end", "empty", trigger_rule="none_failed_min_one_success"),
    ),
    edges=(
        ("task_init", "task_probe_meta"),
        ("task_probe_meta", "task_branch_on_empty"),
        ("task_branch_on_empty", "task_fetch_and_land"),
        ("task_branch_on_empty", "task_skip_empty"),
        ("task_fetch_and_land", "task_end"),
        ("task_skip_empty", "task_end"),
    ),
    tags=("datalake", "bronze"),
)

# -- 2/3: silver and gold (reference datalake_silver_spark_dag.py:163-222,
# datalake_gold_spark_dag.py -- one Spark job per DAG).
SILVER_DAG = DagSpec(
    dag_id="2_datalake_silver_conform",
    schedule=None,
    tasks=(
        TaskSpec("task_init", "empty"),
        TaskSpec(
            "task_run_spark_job_silver",
            "python",
            target=f"{_JOBS}.pipeline.run_silver_stage",
        ),
        TaskSpec("task_end", "empty"),
    ),
    edges=(
        ("task_init", "task_run_spark_job_silver"),
        ("task_run_spark_job_silver", "task_end"),
    ),
    tags=("datalake", "silver"),
)

GOLD_DAG = DagSpec(
    dag_id="3_datalake_gold_aggregate",
    schedule=None,
    tasks=(
        TaskSpec("task_init", "empty"),
        TaskSpec(
            "task_run_spark_job_gold",
            "python",
            target=f"{_JOBS}.pipeline.run_gold_stage",
        ),
        TaskSpec("task_end", "empty"),
    ),
    edges=(
        ("task_init", "task_run_spark_job_gold"),
        ("task_run_spark_job_gold", "task_end"),
    ),
    tags=("datalake", "gold"),
)

# -- 0: orchestrator (reference datalake_pipeline_breweries.py:200-256:
# cron '20 0 * * *', linear TriggerDagRun chain, each trigger
# wait_for_completion + reset_dag_run).
ORCHESTRATOR_DAG = DagSpec(
    dag_id="0_datalake_pipeline",
    schedule="20 0 * * *",
    tasks=(
        TaskSpec("task_init", "empty"),
        TaskSpec(
            "task_trigger_bronze",
            "trigger_dag",
            target=BRONZE_DAG.dag_id,
            wait_for_completion=True,
            reset_dag_run=True,
        ),
        TaskSpec(
            "task_trigger_silver",
            "trigger_dag",
            target=SILVER_DAG.dag_id,
            wait_for_completion=True,
            reset_dag_run=True,
        ),
        TaskSpec(
            "task_trigger_gold",
            "trigger_dag",
            target=GOLD_DAG.dag_id,
            wait_for_completion=True,
            reset_dag_run=True,
        ),
        TaskSpec("task_end", "empty"),
    ),
    edges=(
        ("task_init", "task_trigger_bronze"),
        ("task_trigger_bronze", "task_trigger_silver"),
        ("task_trigger_silver", "task_trigger_gold"),
        ("task_trigger_gold", "task_end"),
    ),
    tags=("datalake", "pipeline"),
)

PIPELINE_DAGS: tuple[DagSpec, ...] = (
    ORCHESTRATOR_DAG,
    BRONZE_DAG,
    SILVER_DAG,
    GOLD_DAG,
)
