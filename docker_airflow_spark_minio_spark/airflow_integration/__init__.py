"""Airflow deployment surface.

The reference's user-facing entry point is four Airflow DAGs (reference
datalake_pipeline_breweries.py:200-256: a linear TriggerDagRun chain with
wait-for-completion; datalake_bronze_fetch_raw_data_api_dag.py:339-377:
meta probe -> branch-on-empty -> page fetch fan-out; the silver/gold DAGs
wrap one Spark job each).  This package re-expresses that deployment
story around :mod:`..jobs.pipeline`:

 * :mod:`.spec` -- the DAG topology as PURE DATA (task ids, edges,
   branch semantics, retry policy, schedule), importable and unit-
   testable with no Airflow installed;
 * :mod:`.dags` -- builds real Airflow DAG objects from the spec when
   ``apache-airflow`` is importable (drop the file in a dags folder),
   and degrades to a clear ImportError otherwise.
"""

from .spec import PIPELINE_DAGS, DagSpec, TaskSpec  # noqa: F401
