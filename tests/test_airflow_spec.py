"""Structural tests for the Airflow deployment surface.

No Airflow installed here, so the checks run against the pure-data spec
(airflow_integration/spec.py) plus import-degradation of the builder --
the same properties Airflow's DAG validation would enforce: unique task
ids, edges referencing real tasks, acyclic topology, the reference's
orchestrator chain/branch shape, and resolvable python callables.
"""

from __future__ import annotations

import importlib

import pytest

from docker_airflow_spark_minio_spark.airflow_integration import (
    PIPELINE_DAGS,
    spec,
)
from docker_airflow_spark_minio_spark.airflow_integration import dags as dagmod


def _toposort_ok(d: spec.DagSpec) -> bool:
    ids = [t.task_id for t in d.tasks]
    indeg = {i: 0 for i in ids}
    for _, down in d.edges:
        indeg[down] += 1
    ready = [i for i in ids if indeg[i] == 0]
    seen = 0
    while ready:
        n = ready.pop()
        seen += 1
        for u, v in d.edges:
            if u == n:
                indeg[v] -= 1
                if indeg[v] == 0:
                    ready.append(v)
    return seen == len(ids)


def test_dag_specs_are_well_formed():
    assert len({d.dag_id for d in PIPELINE_DAGS}) == 4
    for d in PIPELINE_DAGS:
        ids = [t.task_id for t in d.tasks]
        assert len(ids) == len(set(ids)), f"dup task ids in {d.dag_id}"
        for up, down in d.edges:
            assert up in ids and down in ids, f"dangling edge in {d.dag_id}"
        assert _toposort_ok(d), f"cycle in {d.dag_id}"


def test_orchestrator_is_linear_trigger_chain():
    orch = spec.ORCHESTRATOR_DAG
    assert orch.schedule == "20 0 * * *"  # reference pipeline DAG :202
    triggers = [t for t in orch.tasks if t.kind == "trigger_dag"]
    assert [t.target for t in triggers] == [
        spec.BRONZE_DAG.dag_id,
        spec.SILVER_DAG.dag_id,
        spec.GOLD_DAG.dag_id,
    ]
    for t in triggers:
        assert t.wait_for_completion and t.reset_dag_run
    # Linear: every task has at most one downstream edge.
    for t in orch.tasks:
        assert len(orch.downstream(t.task_id)) <= 1


def test_bronze_branch_on_empty():
    bronze = spec.BRONZE_DAG
    branch = bronze.task("task_branch_on_empty")
    assert branch.kind == "branch"
    assert set(branch.choices) == set(bronze.downstream("task_branch_on_empty"))
    # Both branch arms rejoin at task_end.
    assert bronze.downstream("task_fetch_and_land") == ("task_end",)
    assert bronze.downstream("task_skip_empty") == ("task_end",)
    # The meta probe carries the reference's 5x retry policy.
    assert bronze.task("task_probe_meta").retries == 5
    # The branch consumes the probe's XCom result (no second fetch
    # under the branch's weaker retry policy), and its source is a real
    # upstream task.
    assert branch.xcom_arg_from == "task_probe_meta"
    assert ("task_probe_meta", "task_branch_on_empty") in bronze.edges
    # The rejoin downstream of the branch must not inherit all_success
    # or the skipped arm's skip cascades into it every run.
    assert bronze.task("task_end").trigger_rule == "none_failed_min_one_success"


def test_python_targets_resolve():
    for d in PIPELINE_DAGS:
        for t in d.tasks:
            if t.kind in ("python", "branch"):
                mod, name = t.target.rsplit(".", 1)
                fn = getattr(importlib.import_module(mod), name)
                assert callable(fn)


def test_branch_callable_semantics():
    from docker_airflow_spark_minio_spark.jobs.pipeline import (
        branch_on_source_total,
    )

    assert branch_on_source_total(total_pages=3) == "task_fetch_and_land"
    assert branch_on_source_total(total_pages=0) == "task_skip_empty"
    # The returned ids are real choices of the branch task.
    assert branch_on_source_total(total_pages=1) in spec.BRONZE_DAG.task(
        "task_branch_on_empty"
    ).choices


def test_builder_degrades_without_airflow():
    if dagmod.AIRFLOW_AVAILABLE:  # pragma: no cover
        pytest.skip("airflow installed: builder covered by real import")
    with pytest.raises(ImportError):
        dagmod.build_dags()


@pytest.mark.skipif(
    not dagmod.AIRFLOW_AVAILABLE,
    reason="apache-airflow not installed in this sandbox "
    "(re-checked round 5: no PyPI network access) -- build_dags() "
    "materialization runs wherever a scheduler image provides airflow",
)
def test_build_dags_materializes_reference_topology():  # pragma: no cover
    dags = dagmod.build_dags()
    assert set(dags) == {s.dag_id for s in spec.PIPELINE_DAGS}
    for s in spec.PIPELINE_DAGS:
        dag = dags[s.dag_id]
        assert {t.task_id for t in dag.tasks} == {t.id for t in s.tasks}
        for up, down in s.edges:
            assert dag.get_task(down) in dag.get_task(up).downstream_list
        assert dag.schedule_interval == s.schedule
