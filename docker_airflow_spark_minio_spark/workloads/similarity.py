"""Similarity-search workloads over the ``embeddings`` table.

Approximate-nearest-neighbor surface for a training-data pipeline
(extension per SURVEY.md section 7.2.5; the reference has no vector
operations):

 * **brute-force cosine top-k** -- the exactness baseline: broadcast the
   (tiny, fixed-size) query set against the corpus scan, fold the dot
   product JVM-side (``zip_with`` + ``aggregate``, no Python), take
   top-k per query with a two-phase salted window.
 * **sign-bucket LSH top-k** -- the scale path: both sides bucketed by
   the axis-sign signature of the leading dimensions
   (random-hyperplane LSH with axis-aligned hyperplanes, so it is
   deterministic and ANSI-SQL expressible); candidates come from a
   bucket-equality join -- never a cross join.
 * **bucket histogram** -- LSH partition-balance profile: per-bucket
   counts + exact integer-scaled norm sums.

Cross-engine exactness: cosine is computed as left-to-right double
folds on both engines (Spark ``aggregate``; DuckDB ``list_dot_product``
on ``DOUBLE[]``, verified bit-identical to an explicit ``list_reduce``
fold -- unlike DuckDB's ``list_cosine_similarity``, which accumulates
differently and drifts ~1e-9).  Values are emitted ROUND()ed, rankings
order by the rounded measure with a vec_id tie-break.

Scale notes (100 TB posture):
 * the query set is broadcast (fixed small size); the corpus is never
   shuffled for brute-force scoring -- scoring is map-only over the scan
 * top-k per query is two-phase (salted partial top-k, then final) so
   no single reducer sees the whole corpus: with Q queries and S salts,
   stage 1 fans out to Q*S tasks of ~corpus/S rows, stage 2 sees only
   Q*S*k rows
 * the LSH variant joins on bucket id: candidate generation cost is
   |matching buckets|, not |corpus|; the bucket histogram is the
   skew-monitoring query you would run before trusting that join
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import cosine_similarity, l2_norm, sign_bucket, sign_bucket_sql
from .base import load_tables, register

N_QUERIES = 8          # query set: vec_id < 8
TOP_K = 5
LSH_BITS = 8
TOPK_SALTS = 16        # stage-1 fan-out for the two-phase top-k

_DOT = "list_dot_product"


def _cos_sql(a: str, b: str) -> str:
    return (
        f"ROUND({_DOT}({a}, {b}) / "
        f"(sqrt({_DOT}({a}, {a})) * sqrt({_DOT}({b}, {b}))), 6)"
    )


def _two_phase_topk(scored: DataFrame) -> DataFrame:
    """Top-k per query_id without a whole-corpus reducer: salted partial
    top-k, then final top-k over Q*S*k survivors."""
    order = [F.col("cos_sim").desc(), F.col("vec_id").asc()]
    salt = F.pmod(F.col("vec_id"), F.lit(TOPK_SALTS))
    w1 = Window.partitionBy("query_id", "salt").orderBy(*order)
    partial = (
        scored.withColumn("salt", salt)
        .withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") <= TOP_K)
        .drop("salt", "rn")
    )
    w2 = Window.partitionBy("query_id").orderBy(*order)
    return (
        partial.withColumn("rank", F.row_number().over(w2).cast("long"))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", "rank", "cos_sim")
        .orderBy("query_id", "rank")
    )


def _split(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    emb = load_tables(spark, sf_dir)["embeddings"]
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    queries = v.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    corpus = v.where(F.col("vec_id") >= N_QUERIES)
    return queries, corpus


# ---------------------------------------------------------------------------
# Brute-force cosine top-k (exactness baseline)
# ---------------------------------------------------------------------------


@register(
    "ann_cosine_topk_bruteforce",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ), c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id >= {N_QUERIES}
    ), s AS (
        SELECT query_id, vec_id, {_cos_sql('qv', 'v')} AS cos_sim FROM q, c
    ), r AS (
        SELECT query_id, vec_id, cos_sim,
               CAST(ROW_NUMBER() OVER (
                    PARTITION BY query_id
                    ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rank
        FROM s
    )
    SELECT query_id, vec_id, rank, cos_sim
    FROM r WHERE rank <= {TOP_K} ORDER BY query_id, rank
    """,
    category="similarity",
    description=f"brute-force cosine top-{TOP_K} for {N_QUERIES} broadcast "
    "query vectors: map-only scoring over the corpus scan, two-phase "
    "salted top-k (no whole-corpus reducer)",
)
def ann_cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    queries, corpus = _split(spark, sf_dir)
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        "query_id",
        "vec_id",
        F.round(cosine_similarity(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
    )
    return _two_phase_topk(scored)


# ---------------------------------------------------------------------------
# Sign-bucket LSH top-k (the scale path)
# ---------------------------------------------------------------------------


@register(
    "ann_lsh_sign_bucket_topk",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv,
               {sign_bucket_sql('CAST(embedding AS DOUBLE[])', LSH_BITS)} AS bucket
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ), c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               {sign_bucket_sql('CAST(embedding AS DOUBLE[])', LSH_BITS)} AS bucket
        FROM embeddings WHERE vec_id >= {N_QUERIES}
    ), s AS (
        SELECT q.query_id, c.vec_id, {_cos_sql('q.qv', 'c.v')} AS cos_sim
        FROM q JOIN c ON q.bucket = c.bucket
    ), r AS (
        SELECT query_id, vec_id, cos_sim,
               CAST(ROW_NUMBER() OVER (
                    PARTITION BY query_id
                    ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rank
        FROM s
    )
    SELECT query_id, vec_id, rank, cos_sim
    FROM r WHERE rank <= {TOP_K} ORDER BY query_id, rank
    """,
    category="similarity",
    description=f"ANN via {LSH_BITS}-bit axis-sign LSH: candidates from a "
    "bucket-equality join (cost ~ matching buckets, not corpus), then "
    f"cosine top-{TOP_K} rerank within candidates",
)
def ann_lsh_sign_bucket_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    queries, corpus = _split(spark, sf_dir)
    qb = queries.withColumn("bucket", sign_bucket(F.col("qv"), LSH_BITS))
    cb = corpus.withColumn("bucket", sign_bucket(F.col("v"), LSH_BITS))
    scored = cb.join(F.broadcast(qb), "bucket").select(
        "query_id",
        "vec_id",
        F.round(cosine_similarity(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
    )
    return _two_phase_topk(scored)


# ---------------------------------------------------------------------------
# Bucket histogram (LSH partition-balance profile)
# ---------------------------------------------------------------------------


@register(
    "embedding_bucket_histogram",
    oracle=f"""
    WITH b AS (
        SELECT label,
               {sign_bucket_sql('CAST(embedding AS DOUBLE[])', LSH_BITS)} AS bucket,
               CAST(FLOOR(sqrt({_DOT}(CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[]))) * 1000000)
                    AS BIGINT) AS norm_x1e6
        FROM embeddings
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT)           AS n_vectors,
           CAST(COUNT(DISTINCT label) AS BIGINT) AS n_labels,
           CAST(SUM(norm_x1e6) AS BIGINT)     AS sum_norm_x1e6
    FROM b GROUP BY bucket ORDER BY bucket
    """,
    category="similarity",
    description=f"{LSH_BITS}-bit LSH bucket histogram: per-bucket vector "
    "counts, label diversity, integer-exact norm sums -- the skew profile "
    "you check before trusting a bucket-equality join",
)
def embedding_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir)["embeddings"]
    v = F.col("embedding").cast("array<double>")
    b = emb.select(
        "label",
        sign_bucket(v, LSH_BITS).alias("bucket"),
        F.floor(l2_norm(v) * 1e6).cast("long").alias("norm_x1e6"),
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.countDistinct("label").cast("long").alias("n_labels"),
            F.sum("norm_x1e6").alias("sum_norm_x1e6"),
        )
        .orderBy("bucket")
    )
