"""Lloyd k-means operator tests: convergence on separated clusters,
deterministic tie-breaks, and final-centroid distances."""

from __future__ import annotations

from pyspark.sql import functions as F

from docker_airflow_spark_minio_spark.operators.clustering import kmeans_assign


def _vectors(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


def test_separated_clusters_converge(spark):
    # Two tight blobs far apart in 2-d; modulo init scatters both blobs
    # across both initial clusters, one re-average + re-assign fixes it.
    left = [(i, [0.0 + 0.01 * i, 0.0]) for i in range(0, 8)]
    right = [(i, [10.0 + 0.01 * i, 10.0]) for i in range(8, 16)]
    v = _vectors(spark, left + right)
    out = kmeans_assign(v, k=2, n_iter=3, dim=2).collect()
    by_id = {r["vec_id"]: r["cluster"] for r in out}
    left_labels = {by_id[i] for i in range(0, 8)}
    right_labels = {by_id[i] for i in range(8, 16)}
    assert len(left_labels) == 1
    assert len(right_labels) == 1
    assert left_labels != right_labels


def test_equidistant_tie_breaks_to_smaller_cluster(spark):
    # Point 2 sits exactly between the two blob centroids after any
    # number of iterations; lexicographic (dist, cid) argmin must send
    # it to cluster with the SMALLER id, every iteration.
    rows = [
        (0, [0.0]), (2, [0.0]),    # init cluster 0: mean 0.0
        (1, [2.0]), (3, [2.0]),    # init cluster 1: mean 2.0
        (4, [1.0]),                # equidistant from both centroids
    ]
    v = _vectors(spark, rows)
    out = {r["vec_id"]: r for r in kmeans_assign(v, k=2, n_iter=1, dim=1).collect()}
    assert out[4]["cluster"] == min(out[0]["cluster"], out[1]["cluster"])


def test_sq_dist_is_to_final_centroids(spark):
    # Identical points per cluster -> final centroid equals the point ->
    # sq_dist 0 (up to the 6dp centroid rounding) for every row.
    rows = [(i, [float(i % 2) * 5.0, 1.0]) for i in range(10)]
    v = _vectors(spark, rows)
    out = kmeans_assign(v, k=2, n_iter=2, dim=2)
    max_d = out.agg(F.max("sq_dist")).first()[0]
    assert max_d <= 1e-10
