"""Connected-components operator tests: chains (path-halving pays off),
cliques, isolated pairs, and the loud non-convergence guard."""

from __future__ import annotations

import pytest

from docker_airflow_spark_minio_spark.operators.graph import connected_components


def test_chain_clique_and_pair(spark):
    edges = (
        [(i, i + 1) for i in range(24)]            # 25-node chain
        + [(100, 101), (101, 102), (100, 102)]     # triangle
        + [(200, 201)]                             # isolated pair
    )
    e = spark.createDataFrame(edges, "src long, dst long")
    comp = connected_components(e)
    got = {r["id"]: r["component"] for r in comp.collect()}
    comp.unpersist()
    assert all(got[i] == 0 for i in range(25))     # chain collapses to min id
    assert got[100] == got[101] == got[102] == 100
    assert got[200] == got[201] == 200


def test_direction_irrelevant(spark):
    forward = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    backward = spark.createDataFrame([(2, 1), (3, 2)], "src long, dst long")
    for e in (forward, backward):
        comp = connected_components(e)
        got = {r["id"]: r["component"] for r in comp.collect()}
        comp.unpersist()
        assert got == {1: 1, 2: 1, 3: 1}


def test_unconverged_raises(spark):
    # a 9-node chain cannot settle in one round even with path halving
    e = spark.createDataFrame([(i, i + 1) for i in range(8)], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(e, max_iter=1)
