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


def test_pagerank_regular_graph_is_stationary(spark):
    from docker_airflow_spark_minio_spark.operators.graph import (
        PAGERANK_SCALE,
        pagerank_int,
    )

    # On a single edge both endpoints have degree 1: each iteration maps
    # rank 1e9 -> 150e6 + 850e6 = 1e9, the exact stationary point.
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {r["id"]: r["rank"] for r in pagerank_int(e, n_iter=4).collect()}
    assert got == {1: PAGERANK_SCALE, 2: PAGERANK_SCALE}


def test_pagerank_star_ranks_hub_highest(spark):
    from docker_airflow_spark_minio_spark.operators.graph import pagerank_int

    e = spark.createDataFrame([(0, i) for i in (1, 2, 3)], "src long, dst long")
    got = {r["id"]: r["rank"] for r in pagerank_int(e, n_iter=1).collect()}
    # hub: 150e6 + 850*(3 * 1e9)//1000; leaves: 150e6 + 850*(1e9//3)//1000
    assert got[0] == 150_000_000 + (850 * 3_000_000_000) // 1000
    leaf = 150_000_000 + (850 * (1_000_000_000 // 3)) // 1000
    assert got[1] == got[2] == got[3] == leaf
    assert got[0] > got[1]
