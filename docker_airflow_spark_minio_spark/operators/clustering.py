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
   dim integers, independent of corpus size.
 * determinism: INTEGER-EXACT arithmetic (the PageRank pattern).  Vector
   components are pre-quantized to micro-units (floor(x * 1e6), a single
   IEEE multiply + floor -- bit-identical across engines), and from
   there every quantity is an integer:
     - centroid component = floor(sum(q) / n) -- integer sum is
       order-independent, the one division is a single IEEE op;
     - squared distance via the dot identity a.a - 2a.b + b.b, where
       every product and partial sum stays below 2^53 (|q| <= ~1e6,
       dims <= 64 -> max ~8e13), so even a double-typed accumulator is
       EXACT regardless of accumulation order.
   The earlier round(avg(double), 6) centroids had a residual flake
   mode: Spark partial aggregation and DuckDB accumulate doubles in
   different orders, and a mean landing within one ulp of a 0.5e-6
   rounding boundary could flip the hash gate.  Integer arithmetic has
   no such boundary.
 * argmin ties break (distance, cluster-id) lexicographically -- the
   oracle's ORDER BY dist, cid.

``sq_dist`` is reported in quantized units (micro-unit^2 = 1e-12 of the
input's squared scale).

The reference has no clustering surface (SURVEY.md section 2.8); this is
extension surface per SURVEY.md section 7.2.5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import dot_product

QUANT = 1_000_000


def quantize(vec) -> "F.Column":
    """array<double> -> array<long> micro-units: floor(x * 1e6) per
    component.  One multiply + one floor per element -- single IEEE ops,
    bit-identical across engines (no accumulation involved)."""
    c = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(c, lambda x: F.floor(x * F.lit(float(QUANT))).cast("long"))


def _sq_dist_q(v, cv):
    """Integer ||v - c||^2 via the dot identity.  All inputs are
    micro-unit integers; every intermediate is an integer below 2^53, so
    the double accumulator inside dot_product is exact and
    order-independent."""
    return (
        dot_product(v, v) - 2 * dot_product(v, cv) + dot_product(cv, cv)
    ).cast("long")


def _centroids(assigned: DataFrame, dim: int) -> DataFrame:
    """Per-cluster integer centroid vectors: floor(sum / count) per
    component.  One F.expr string, not dim py4j Column objects (the py4j
    tree measured ~5s of driver time at dim=64); the plan and its
    map-side partial aggregation are identical."""
    arr = (
        "array("
        + ", ".join(
            f"cast(floor(cast(sum(v[{i}]) as double) / count(1)) as bigint)"
            for i in range(dim)
        )
        + ")"
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
    vector column (quantized internally -- see module docstring).  Init:
    cluster j = mean of vectors with id % k == j.  Each iteration
    re-assigns every vector to the nearest centroid (squared euclidean
    over micro-unit integers; ties break to the smaller cluster id) and
    re-averages.  ``sq_dist`` is the integer quantized distance to the
    FINAL centroid set.
    """
    v = vectors.select(
        F.col(id_col).alias("vec_id"), quantize(F.col(vec_col)).alias("v")
    )
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
                    _sq_dist_q(F.col("v"), c["cv"]).alias("d"),
                    c["cid"].alias("cid"),
                ),
            )
        )
        assigned = v.crossJoin(F.broadcast(cents)).select(
            "vec_id", "v", best["cid"].alias("cid"), best["d"].alias("sq_dist")
        )
    return assigned.select("vec_id", F.col("cid").alias("cluster"), "sq_dist")
