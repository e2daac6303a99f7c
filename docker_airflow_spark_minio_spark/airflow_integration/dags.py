"""Build real Airflow DAGs from :mod:`.spec`.

Drop this file (or a two-line shim importing it) into an Airflow dags
folder: when ``apache-airflow`` is importable, module import builds all
four DAGs and registers them in ``globals()`` the way Airflow's DAG
discovery expects.  Without Airflow the module still imports (the spec
stays testable); calling :func:`build_dags` then raises a clear
ImportError.

Reference parity: orchestrator = linear TriggerDagRun chain with
wait_for_completion + reset_dag_run (datalake_pipeline_breweries.py:
218-243), bronze = probe -> BranchPythonOperator -> fetch
(datalake_bronze_fetch_raw_data_api_dag.py:339-372), default retry
policy retries=1/2s (:321-322).
"""

from __future__ import annotations

import importlib
from datetime import datetime, timedelta

from .spec import PIPELINE_DAGS, DagSpec

try:  # pragma: no cover - exercised only where airflow is installed
    import airflow  # noqa: F401

    AIRFLOW_AVAILABLE = True
except ImportError:
    AIRFLOW_AVAILABLE = False


def _resolve(dotted: str):
    mod, name = dotted.rsplit(".", 1)
    return getattr(importlib.import_module(mod), name)


def build_dag(spec: DagSpec):
    """One DagSpec -> one airflow.DAG with operators wired per edges."""
    if not AIRFLOW_AVAILABLE:
        raise ImportError(
            "apache-airflow is not installed; the DAG structure is still "
            "available as data in airflow_integration.spec"
        )
    from airflow import DAG
    from airflow.operators.empty import EmptyOperator
    from airflow.operators.python import BranchPythonOperator, PythonOperator
    from airflow.operators.trigger_dagrun import TriggerDagRunOperator

    with DAG(
        dag_id=spec.dag_id,
        schedule=spec.schedule,
        start_date=datetime(2024, 1, 1),
        catchup=False,
        tags=list(spec.tags),
    ) as dag:
        ops = {}
        for t in spec.tasks:
            common = {
                "task_id": t.task_id,
                "retries": t.retries,
                "retry_delay": timedelta(seconds=t.retry_delay_s),
                "trigger_rule": t.trigger_rule,
            }

            def _callable(ts):
                fn = _resolve(ts.target)
                if not ts.xcom_arg_from:
                    return fn

                def pull_and_call(ti, **_ctx):
                    return fn(ti.xcom_pull(task_ids=ts.xcom_arg_from))

                return pull_and_call

            if t.kind == "empty":
                ops[t.task_id] = EmptyOperator(
                    task_id=t.task_id, trigger_rule=t.trigger_rule
                )
            elif t.kind == "python":
                ops[t.task_id] = PythonOperator(
                    python_callable=_callable(t), **common
                )
            elif t.kind == "branch":
                ops[t.task_id] = BranchPythonOperator(
                    python_callable=_callable(t), **common
                )
            elif t.kind == "trigger_dag":
                ops[t.task_id] = TriggerDagRunOperator(
                    trigger_dag_id=t.target,
                    wait_for_completion=t.wait_for_completion,
                    reset_dag_run=t.reset_dag_run,
                    poke_interval=30,
                    **common,
                )
            else:  # pragma: no cover
                raise ValueError(f"unknown task kind: {t.kind}")
        for up, down in spec.edges:
            ops[up] >> ops[down]
    return dag


def build_dags() -> dict:
    """All four pipeline DAGs, keyed by dag_id."""
    return {spec.dag_id: build_dag(spec) for spec in PIPELINE_DAGS}


if AIRFLOW_AVAILABLE:  # Airflow DAG discovery scans module globals
    globals().update(build_dags())
