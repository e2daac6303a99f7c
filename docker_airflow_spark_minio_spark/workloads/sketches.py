"""Approximate-sketch workloads: HLL distinct counts, approximate
quantiles, mergeable sketch unions.

Sketches are the 100 TB workhorse for cardinality/quantile questions: a
single pass, fixed memory per group, and -- the property that matters on
a 1000-executor cluster -- MERGEABILITY: per-partition sketches combine
associatively, so the shuffle carries kilobyte sketch buffers instead of
the raw distinct values.

Cross-engine story: Spark's HLL++/GK implementations and DuckDB's
sketches are different algorithms, so raw estimates can never
hash-match.  Each query therefore emits (a) the EXACT answer (computed
alongside, hash-checkable) and (b) a boolean asserting the sketch landed
inside its published error bound.  The oracle computes the exact answer
and a literal TRUE -- so a sketch drifting outside its bound fails the
correctness gate, which is precisely the contract a sketch offers.
(The exact twin is for the gate at test scale; production at 100 TB
runs the sketch alone.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import h32_sql
from .base import load_tables, register

HLL_RSD = 0.05          # approx_count_distinct relative standard deviation
HLL_TOL = 0.15          # gate at 3 sigma
PCTL_ACCURACY = 1000    # GK sketch accuracy knob: rank error <= n/accuracy


@register(
    "sketch_hll_distinct_bound",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE                      AS hll_within_bound
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    category="sketch",
    description=f"HLL++ distinct estimate vs exact per group: emits the "
    f"exact count and asserts the sketch is within {HLL_TOL:.0%} "
    f"(3 sigma at rsd={HLL_RSD}); the estimate itself is "
    "engine-specific, the bound is the contract",
)
def sketch_hll_distinct_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.approx_count_distinct("l_partkey", rsd=HLL_RSD).alias("est"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("est") - F.col("exact_parts"))
                <= F.lit(HLL_TOL) * F.col("exact_parts")
            ).alias("hll_within_bound"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "sketch_quantile_bound",
    oracle="""
    SELECT o_orderstatus,
           ROUND(quantile_disc(o_totalprice, 0.5), 2) AS exact_p50,
           TRUE AS approx_within_rank_bound
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    category="sketch",
    description=f"GK-sketch median vs exact per group: emits the exact "
    f"p50 and asserts the approx value lies inside the sketch's rank "
    f"bound (between the exact p45 and p55 for accuracy={PCTL_ACCURACY})",
)
def sketch_quantile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]

    def disc(q: float):
        return F.expr(f"percentile_disc({q}) WITHIN GROUP (ORDER BY o_totalprice)")

    # rank error of approx_percentile is n/accuracy; the p45..p55 window
    # is 0.05*n ranks wide on each side, far beyond n/1000 -- a sketch
    # violating it is broken, not unlucky
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(disc(0.5), 2).alias("exact_p50"),
            F.expr(f"approx_percentile(o_totalprice, 0.5, {PCTL_ACCURACY})").alias("ap"),
            disc(0.45).alias("lo"),
            disc(0.55).alias("hi"),
        )
        .select(
            "o_orderstatus",
            "exact_p50",
            ((F.col("ap") >= F.col("lo")) & (F.col("ap") <= F.col("hi"))).alias(
                "approx_within_rank_bound"
            ),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "sketch_hll_merge_bound",
    oracle="""
    SELECT COUNT(DISTINCT l_partkey) AS exact_total,
           CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS n_sketches,
           TRUE AS union_within_bound
    FROM lineitem
    """,
    category="sketch",
    description="Datasketches-HLL mergeability: one sketch per "
    "returnflag group, merged with hll_union_agg into a global distinct "
    "estimate -- the shuffle carries sketch buffers, never the distinct "
    "values; asserts the merged estimate is within bound of the exact "
    "global count",
)
def sketch_hll_merge_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    # stage 1: one HLL sketch per group (what each executor/partition
    # would hold); stage 2: merge sketches + estimate -- the two-level
    # shape that makes sketches work on a 1000-executor cluster
    per_group = li.groupBy("l_returnflag").agg(
        F.expr("hll_sketch_agg(l_partkey)").alias("sk")
    )
    merged = per_group.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"),
        F.count(F.lit(1)).alias("n_sketches"),
    )
    exact = li.agg(F.countDistinct("l_partkey").alias("exact_total"))
    return exact.crossJoin(merged).select(
        "exact_total",
        "n_sketches",
        (
            F.abs(F.col("est") - F.col("exact_total"))
            <= F.lit(HLL_TOL) * F.col("exact_total")
        ).alias("union_within_bound"),
    )


MG_COUNTERS = 8         # Misra-Gries counter budget per partition summary
MG_TOP = 5              # verified heavy hitters


@register(
    "sketch_mg_heavy_hitters",
    oracle=f"""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ), cnt AS (
        SELECT token, COUNT(*) AS exact_cnt FROM tok GROUP BY token
    ), top AS (
        SELECT token, exact_cnt,
               ROW_NUMBER() OVER (ORDER BY exact_cnt DESC, token) AS rn
        FROM cnt
    )
    SELECT token,
           CAST(exact_cnt AS BIGINT) AS exact_cnt,
           TRUE                      AS mg_within_bound
    FROM top WHERE rn <= {MG_TOP} ORDER BY token
    """,
    category="sketch",
    description=f"Misra-Gries heavy hitters over document tokens: one "
    f"{MG_COUNTERS}-counter MG summary per partition (mapInPandas), "
    "merged by per-token summation -- the summed estimate undercounts "
    "each true frequency by at most N/k, which is the asserted bound; "
    "the shuffle carries <= k rows per partition, never the token stream",
)
def sketch_mg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens_expr

    docs = load_tables(spark, sf_dir)["documents"]
    ex = docs.select(F.explode(tokens_expr("text")).alias("token"))

    def mg_partition(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for tok in pdf["token"]:
                if tok in counters:
                    counters[tok] += 1
                elif len(counters) < MG_COUNTERS:
                    counters[tok] = 1
                else:
                    # decrement-all step; drop exhausted counters
                    for t in list(counters):
                        counters[t] -= 1
                        if counters[t] == 0:
                            del counters[t]
        yield pd.DataFrame(
            {"token": list(counters), "est": list(counters.values())}
        )

    summary = ex.mapInPandas(mg_partition, schema="token string, est long")
    merged = summary.groupBy("token").agg(F.sum("est").alias("est"))
    exact = ex.groupBy("token").agg(F.count(F.lit(1)).alias("exact_cnt"))
    n_total = ex.agg(F.count(F.lit(1)).alias("n"))
    # TakeOrderedAndProject (distributed partial top-k), not a global
    # window: the vocab-sized count frame never funnels through one task
    top = exact.orderBy(F.col("exact_cnt").desc(), F.col("token")).limit(MG_TOP)
    return (
        top.join(merged, "token", "left")
        .crossJoin(n_total)
        .select(
            "token",
            "exact_cnt",
            (
                (F.coalesce(F.col("est"), F.lit(0)) <= F.col("exact_cnt"))
                & (
                    F.col("exact_cnt") - F.coalesce(F.col("est"), F.lit(0))
                    <= F.col("n") / MG_COUNTERS
                )
            ).alias("mg_within_bound"),
        )
        .orderBy("token")
    )


# ---------------------------------------------------------------------------
# Count-min sketch point-frequency estimates
# ---------------------------------------------------------------------------

# Unlike the HLL/GK entries above (engine-native sketches, gated on
# error bounds only), this CMS is built FROM the shared h32 hash
# streams, so Spark and DuckDB construct bit-identical sketches and the
# ESTIMATES themselves hash-match -- the stronger correctness contract.
# Structure: CMS_D rows x CMS_W counters; token t adds its count to
# bucket h_r(t) = h32('cms<r>:' || t) % CMS_W in every row; the point
# estimate is the min across rows.  One-sided by construction
# (est >= exact always); the flag asserts the standard width bound
# overcount <= ~e*N/W, integerized as overcount*W <= 3*N.
CMS_W = 1024
CMS_D = 4
CMS_TOP = 8


@register(
    "sketch_cms_point_queries",
    oracle=f"""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ), cnt AS (
        SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
    ), n AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM cnt
    ), rows_r AS (
        SELECT unnest(generate_series(0, {CMS_D - 1})) AS r
    ), rb AS (
        SELECT r,
               {h32_sql("'cms' || CAST(r AS VARCHAR) || ':' || token")}
                   % {CMS_W} AS b,
               cnt
        FROM cnt, rows_r
    ), sk AS (
        SELECT r, b, SUM(cnt) AS bsum FROM rb GROUP BY r, b
    ), top AS (
        SELECT token, cnt AS exact_cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rn
        FROM cnt
    ), q AS (
        SELECT t.token, t.exact_cnt, r.r,
               {h32_sql("'cms' || CAST(r.r AS VARCHAR) || ':' || t.token")}
                   % {CMS_W} AS b
        FROM top t, rows_r r WHERE t.rn <= {CMS_TOP}
    ), est AS (
        SELECT token, exact_cnt, MIN(sk.bsum) AS cms_est
        FROM q JOIN sk USING (r, b) GROUP BY token, exact_cnt
    )
    SELECT token,
           CAST(exact_cnt AS BIGINT)           AS exact_cnt,
           CAST(cms_est AS BIGINT)             AS cms_est,
           CAST(cms_est - exact_cnt AS BIGINT) AS overcount,
           CASE WHEN (cms_est - exact_cnt) * {CMS_W} <= 3 * n_total
                THEN 1 ELSE 0 END              AS within_bound
    FROM est, n ORDER BY token
    """,
    category="sketch",
    description=f"count-min sketch ({CMS_D}x{CMS_W}, shared-h32 double "
    "hashing) over document tokens: both engines build the IDENTICAL "
    "sketch, so the point estimates hash-match exactly (stronger than "
    "the HLL/GK bound-flag contract); estimates for the top "
    f"{CMS_TOP} tokens with the one-sided overcount and its e*N/W "
    "width bound",
)
def sketch_cms_point_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale notes: the sketch is D*W counters regardless of N -- the
    build aggregates (row, bucket) keys (<= D*W groups, map-side
    combined), inserting from the token-count table so each distinct
    token hashes once per row, not once per occurrence.  Point queries
    broadcast-join the D probe buckets per query against the tiny
    sketch table.  At 100 TB the sketch stays 4 KiB of longs per
    partition summary and merges associatively -- the same mergeability
    argument as the HLL/MG entries (module docstring)."""
    from ..functions.hashing import h32
    from ..functions.text import tokens_expr

    docs = load_tables(spark, sf_dir)["documents"]
    tok = docs.select(F.explode(tokens_expr("text")).alias("token"))
    cnt = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    n_total = cnt.agg(F.sum("cnt").alias("n_total"))

    def bucket(r: int, col):
        return h32(F.concat(F.lit(f"cms{r}:"), col)) % CMS_W

    pairs = cnt.select(
        "cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), bucket(r, F.col("token")).alias("b")
                    )
                    for r in range(CMS_D)
                ]
            )
        ).alias("rb"),
    )
    sketch = pairs.groupBy("rb.r", "rb.b").agg(F.sum("cnt").alias("bsum"))
    top = (
        cnt.orderBy(F.col("cnt").desc(), "token")
        .limit(CMS_TOP)
        .withColumnRenamed("cnt", "exact_cnt")
    )
    probes = top.select(
        "token",
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), bucket(r, F.col("token")).alias("b")
                    )
                    for r in range(CMS_D)
                ]
            )
        ).alias("rb"),
    ).select("token", "exact_cnt", "rb.r", "rb.b")
    est = (
        F.broadcast(probes)
        .join(sketch, ["r", "b"])
        .groupBy("token", "exact_cnt")
        .agg(F.min("bsum").alias("cms_est"))
    )
    return (
        est.crossJoin(F.broadcast(n_total))
        .select(
            "token",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
            F.when(
                (F.col("cms_est") - F.col("exact_cnt")) * CMS_W
                <= 3 * F.col("n_total"),
                1,
            )
            .otherwise(0)
            .alias("within_bound"),
        )
        .orderBy("token")
    )


# ---------------------------------------------------------------------------
# KMV / theta sketch set operations (deterministic, hash-exact)
# ---------------------------------------------------------------------------

# Unlike HLL (engine-specific registers -- only the BOUND is checkable),
# a K-minimum-values / theta sketch is a deterministic FUNCTION of the
# hashed input: keep the K smallest distinct 32-bit hashes; theta = the
# K-th smallest; estimate = |{h < theta}| * 2^32 / theta.  Set algebra
# (the reason theta sketches exist -- Dasgupta et al. 2016, "A Framework
# for Estimating Stream Expression Cardinalities"): union = K smallest
# of the combined retained sets under min(theta); intersection = common
# retained hashes under min(theta).  Because the hash (portable md5 h32)
# and the min-K selection are deterministic, BOTH the estimates and the
# error are bit-identical across engines -- the estimates themselves are
# oracle-gated, not just their bounds.
KMV_K = 64
_TWO32 = 4_294_967_296
_KMV_SALTS = 16  # stage-1 fan-out for the two-phase min-K


@register(
    "sketch_kmv_theta_setops",
    oracle=f"""
    WITH dh AS (
        SELECT DISTINCT event_type,
               {h32_sql("CAST(user_id AS VARCHAR)")} AS h
        FROM events
    ), rk AS (
        SELECT event_type, h,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM dh
    ), sk AS (
        SELECT event_type, h, rn FROM rk WHERE rn <= {KMV_K}
    ), st AS (
        SELECT event_type,
               COUNT(*) AS n_sk,
               CASE WHEN COUNT(*) >= {KMV_K}
                    THEN MAX(CASE WHEN rn = {KMV_K} THEN h END)
                    ELSE {_TWO32} END AS theta
        FROM sk GROUP BY event_type
    ), ret AS (
        SELECT sk.event_type, sk.h
        FROM sk JOIN st USING (event_type) WHERE sk.h < st.theta
    ), per_type AS (
        SELECT st.event_type AS set_name,
               (SELECT COUNT(*) FROM ret r
                 WHERE r.event_type = st.event_type)
                   * {_TWO32} // st.theta AS est,
               (SELECT COUNT(DISTINCT user_id) FROM events e
                 WHERE e.event_type = st.event_type) AS exact
        FROM st
    ), tu AS (
        SELECT MIN(theta) AS theta FROM st
    ), u AS (
        SELECT 'union_all' AS set_name,
               (SELECT COUNT(DISTINCT r.h) FROM ret r, tu
                 WHERE r.h < tu.theta) * {_TWO32} // (SELECT theta FROM tu)
                   AS est,
               (SELECT COUNT(DISTINCT user_id) FROM events) AS exact
    ), ti AS (
        SELECT MIN(theta) AS theta FROM st
        WHERE event_type IN ('view', 'click')
    ), i AS (
        SELECT 'view_x_click' AS set_name,
               (SELECT COUNT(*) FROM
                  (SELECT h FROM ret WHERE event_type = 'view'
                   INTERSECT
                   SELECT h FROM ret WHERE event_type = 'click') x, ti
                 WHERE x.h < ti.theta) * {_TWO32} // (SELECT theta FROM ti)
                   AS est,
               (SELECT COUNT(*) FROM
                  (SELECT user_id FROM events WHERE event_type = 'view'
                   INTERSECT
                   SELECT user_id FROM events WHERE event_type = 'click') y)
                   AS exact
    ), allr AS (
        SELECT * FROM per_type UNION ALL SELECT * FROM u
        UNION ALL SELECT * FROM i
    )
    SELECT set_name,
           CAST(est AS BIGINT)   AS est_distinct_users,
           CAST(exact AS BIGINT) AS exact_distinct_users,
           CAST((ABS(est - exact) * 1000) // GREATEST(exact, 1) AS BIGINT)
               AS err_pm
    FROM allr ORDER BY set_name
    """,
    category="sketch",
    description=f"KMV/theta sketch (K={KMV_K}, portable md5 hash): "
    "per-event-type distinct-user estimates plus UNION and INTERSECTION "
    "estimates via theta-sketch set algebra -- fully deterministic, so "
    "the ESTIMATES hash-match the oracle (not just an error bound); "
    "exact twins and integer per-mille error alongside",
)
def sketch_kmv_theta_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the sketch build shuffles DISTINCT (type, hash) pairs --
    8-byte hashes, never user ids -- and min-K selection is two-phase
    (salted partial min-K, then final over type*salts*K survivors), so
    no single reducer sorts a whole type's distinct set.  All set
    algebra then runs on <= types*K retained hashes: metadata-sized,
    whatever the corpus size.  The exact twins are for the gate at test
    scale; production at 100 TB keeps only the sketches."""
    from pyspark.sql.window import Window

    from ..functions.hashing import h32

    ev = load_tables(spark, sf_dir)["events"].select("event_type", "user_id")
    dh = ev.select(
        "event_type", h32(F.col("user_id").cast("string")).alias("h")
    ).distinct()
    w1 = Window.partitionBy("event_type", "salt").orderBy("h")
    partial = (
        dh.withColumn("salt", F.pmod("h", F.lit(_KMV_SALTS)))
        .withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") <= KMV_K)
        .drop("salt", "rn")
    )
    w2 = Window.partitionBy("event_type").orderBy("h")
    sk = partial.withColumn("rn", F.row_number().over(w2)).where(
        F.col("rn") <= KMV_K
    )
    st = sk.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_sk"),
        F.when(
            F.count(F.lit(1)) >= KMV_K,
            F.max(F.when(F.col("rn") == KMV_K, F.col("h"))),
        )
        .otherwise(F.lit(_TWO32))
        .alias("theta"),
    )
    ret = (
        sk.join(F.broadcast(st), "event_type")
        .where(F.col("h") < F.col("theta"))
        .select("event_type", "h", "theta")
    )
    exact_t = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact")
    )
    per_type = (
        ret.groupBy("event_type", "theta")
        .agg(F.count(F.lit(1)).alias("n_ret"))
        .join(exact_t, "event_type")
        .select(
            F.col("event_type").alias("set_name"),
            F.expr(f"(n_ret * {_TWO32}) DIV theta").alias("est"),
            F.col("exact").cast("long").alias("exact"),
        )
    )
    tu = st.agg(F.min("theta").alias("theta"))
    exact_u = ev.agg(F.countDistinct("user_id").alias("exact"))
    u = (
        ret.select("h")
        .distinct()
        .crossJoin(F.broadcast(tu))
        .where(F.col("h") < F.col("theta"))
        .groupBy("theta")
        .agg(F.count(F.lit(1)).alias("n_ret"))
        .crossJoin(F.broadcast(exact_u))
        .select(
            F.lit("union_all").alias("set_name"),
            F.expr(f"(n_ret * {_TWO32}) DIV theta").alias("est"),
            F.col("exact").cast("long").alias("exact"),
        )
    )
    ti = st.where(F.col("event_type").isin("view", "click")).agg(
        F.min("theta").alias("theta")
    )
    common = (
        ret.where(F.col("event_type") == "view")
        .select("h")
        .join(
            ret.where(F.col("event_type") == "click").select("h"),
            "h",
            "left_semi",
        )
    )
    exact_i = (
        ev.where(F.col("event_type").isin("view", "click"))
        .groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("nt"))
        .where(F.col("nt") == 2)
        .agg(F.count(F.lit(1)).alias("exact"))
    )
    # global (non-grouped) aggregate so an EMPTY intersection still
    # emits its row (est 0), matching the oracle's scalar COUNT
    common_cnt = (
        common.crossJoin(F.broadcast(ti))
        .where(F.col("h") < F.col("theta"))
        .agg(F.count(F.lit(1)).alias("n_ret"))
    )
    i = (
        ti.crossJoin(F.broadcast(common_cnt))
        .crossJoin(F.broadcast(exact_i))
        .select(
            F.lit("view_x_click").alias("set_name"),
            F.expr(f"(n_ret * {_TWO32}) DIV theta").alias("est"),
            F.col("exact").cast("long").alias("exact"),
        )
    )
    out = per_type.unionByName(u).unionByName(i)
    res = out.select(
        "set_name",
        F.col("est").alias("est_distinct_users"),
        F.col("exact").alias("exact_distinct_users"),
        F.expr("(ABS(est - exact) * 1000) DIV GREATEST(exact, 1)").alias(
            "err_pm"
        ),
    ).orderBy("set_name")
    return res
