"""Persist-cache lifecycle: a session sweeping several scale factors must
not accumulate pinned executor storage (round-3 ADVICE: the module-level
persist caches were unbounded and never unpersisted).

Rules under test (workloads/base.py PersistCache):
 * switching sf_dir evicts + unpersists the previous sf_dir's entries
   for the same application -- pinned RDD count does not grow with the
   number of scale factors visited;
 * clear_persist_caches() releases everything.
"""

from __future__ import annotations

from docker_airflow_spark_minio_spark.workloads import base
from docker_airflow_spark_minio_spark.workloads.dedup import _shingles, _verified_pairs

SF_A = "/root/testdata/sf0.001"
SF_B = "/root/testdata/sf0.01"


def _n_persisted(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_sf_switch_evicts_previous_sf(spark):
    base.clear_persist_caches()
    baseline = _n_persisted(spark)

    _shingles(spark, SF_A).count()
    _verified_pairs(spark, SF_A).count()
    after_a = _n_persisted(spark)
    assert after_a > baseline  # the caches really persist something

    # Same sf again: cache hit, no new pinned RDDs.
    _shingles(spark, SF_A).count()
    assert _n_persisted(spark) == after_a

    # New sf for the same application: old entries unpersisted, so the
    # pinned count stays flat instead of doubling.
    _shingles(spark, SF_B).count()
    _verified_pairs(spark, SF_B).count()
    assert _n_persisted(spark) <= after_a

    # And back: still flat -- no growth across an arbitrary sweep.
    _shingles(spark, SF_A).count()
    _verified_pairs(spark, SF_A).count()
    assert _n_persisted(spark) <= after_a


def test_clear_persist_caches_releases_everything(spark):
    _shingles(spark, SF_A).count()
    assert _n_persisted(spark) > 0
    base.clear_persist_caches()
    assert _n_persisted(spark) == 0


def test_table_plan_cache_is_bounded(spark):
    base.clear_persist_caches()
    # 12 DISTINCT cache keys (trailing slashes: same data, new key), so
    # the eviction loop actually fires -- removing the bound must fail
    # this test, not pass it vacuously.
    for i in range(12):
        base.load_tables(spark, SF_A + "/" * i)
    assert len(base._TABLE_CACHE) <= 8
