"""Iterative clustering: Lloyd k-means over an embedding column.

An operator Spark SQL has no built-in for (MLlib's KMeans exists but is
RDD/ML-pipeline shaped, non-deterministic by default, and not
oracle-able); this is the deterministic DataFrame-native variant used by
training-data pipelines for corpus bucketing / semantic dedup prep.

Design (100 TB posture):
 * centroids are MODEL METADATA: k rows, folded into ONE array<struct>
   value and attached to every vector row via a broadcast single-row
   cross join -- assignment is a pure map over the corpus scan, no
   corpus x k shuffle (same trick as the IVF quantizer in
   workloads/similarity.py).
 * each Lloyd iteration is one map (assign) + one partial-aggregated
   groupBy (re-average): shuffle bytes per iteration = partitions x k x
   dim doubles, independent of corpus size.
 * determinism: fixed modulo init, 6dp-rounded centroid components, and
   (distance, cluster-id) lexicographic argmin -- bit-identical across
   engines, so an ANSI-SQL oracle can replay the whole iteration
   unrolled (workloads/corpus_extra.py).

The reference has no clustering surface (SURVEY.md section 2.8); this is
extension surface per SURVEY.md section 7.2.5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import dot_product


def _sq_dist(v, cv):
    """||v - c||^2 via the dot identity, evaluated in the same IEEE
    operation order as the oracle's ``a - 2*b + c`` (left-assoc)."""
    return dot_product(v, v) - 2 * dot_product(v, cv) + dot_product(cv, cv)


def _centroids(assigned: DataFrame, dim: int) -> DataFrame:
    """Per-cluster 6dp-rounded mean vectors.  One F.expr string, not dim
    py4j Column objects (the py4j tree measured ~5s of driver time at
    dim=64); the plan and its map-side partial aggregation are
    identical."""
    arr = (
        "array(" + ", ".join(f"round(avg(v[{i}]), 6)" for i in range(dim)) + ")"
    )
    return assigned.groupBy("cid").agg(F.expr(arr).alias("cv"))


def kmeans_assign(
    vectors: DataFrame,
    k: int,
    n_iter: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Deterministic Lloyd k-means; returns ``(id, cluster, sq_dist)``.

    ``vectors`` must expose an integer id column and an array<double>
    vector column.  Init: cluster j = mean of vectors with id % k == j.
    Each iteration re-assigns every vector to the nearest centroid
    (squared euclidean; ties break to the smaller cluster id) and
    re-averages.  ``sq_dist`` is the distance to the FINAL centroid set.
    """
    v = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    assigned = v.withColumn("cid", F.pmod(F.col("vec_id"), F.lit(k)))
    for _ in range(n_iter):
        cents = _centroids(assigned, dim).agg(
            F.sort_array(F.collect_list(F.struct("cid", "cv"))).alias("cents")
        )
        # struct(dist, cid) array_min = lexicographic argmin: min distance,
        # then min cluster id -- the oracle's ORDER BY dist, cid.
        best = F.array_min(
            F.transform(
                "cents",
                lambda c: F.struct(
                    _sq_dist(F.col("v"), c["cv"]).alias("d"),
                    c["cid"].alias("cid"),
                ),
            )
        )
        assigned = v.crossJoin(F.broadcast(cents)).select(
            "vec_id", "v", best["cid"].alias("cid"), best["d"].alias("sq_dist")
        )
    return assigned.select("vec_id", F.col("cid").alias("cluster"), "sq_dist")
