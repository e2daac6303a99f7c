"""Data-layout workloads: Z-order clustering keys.

The write-side twin of the query surface: at 100 TB the layout decides
how much a scan reads.  ``operators/zorder.py`` provides the Morton
key; this workload checks the key arithmetic cross-engine (pure integer
shifts, bit-identical in ANSI SQL), and ``tests/test_layout.py`` asserts
the physical claim -- a z-sorted layout bounds per-chunk min/max spread
on BOTH dimensions, where a one-column sort leaves the second dimension
unclustered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.zorder import zorder_sql, zorder_value
from .base import load_tables, money_finish, money_sum, money_sum_agg, register

Z_BITS = 8          # 8 bits per dimension -> 16-bit Morton code
Z_BUCKET_SHIFT = 4  # bucket = z >> shift: 4096 buckets


@register(
    "zorder_locality_buckets",
    oracle=f"""
    WITH m AS (
        SELECT o_custkey % 256 AS x,
               date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) % 256
                   AS y
        FROM orders
    ), z AS (
        SELECT x, y, {zorder_sql('x', 'y', Z_BITS)} >> {Z_BUCKET_SHIFT} AS z_bucket
        FROM m
    )
    SELECT z_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(x) AS BIGINT) AS min_x, CAST(MAX(x) AS BIGINT) AS max_x,
           CAST(MIN(y) AS BIGINT) AS min_y, CAST(MAX(y) AS BIGINT) AS max_y
    FROM z GROUP BY z_bucket ORDER BY z_bucket
    """,
    category="layout",
    description=f"Z-order (Morton) clustering key over (custkey, order-day): "
    f"{Z_BITS}-bit interleave, bucketed by the code's high bits -- each "
    "bucket spans a bounded square in BOTH dimensions, the property that "
    "makes z-sorted parquet skip row groups on either predicate",
)
def zorder_locality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    x = F.pmod(F.col("o_custkey"), F.lit(256))
    y = F.pmod(
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")),
        F.lit(256),
    )
    m = o.select(x.alias("x"), y.alias("y"))
    z = m.select(
        "x",
        "y",
        F.shiftright(zorder_value(F.col("x"), F.col("y"), Z_BITS), Z_BUCKET_SHIFT).alias(
            "z_bucket"
        ),
    )
    return (
        z.groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
        .orderBy("z_bucket")
    )


# ---------------------------------------------------------------------------
# Bucketed join (write-time shuffle, zero-exchange reads)
# ---------------------------------------------------------------------------

BUCKETS = 8

# (applicationId, sf_dir) pairs whose bucketed tables already exist in
# this session's catalog -- write once per ingest, join many times.
_BUCKETED_READY: set[tuple[str, str]] = set()


@register(
    "bucketed_join_orders_per_segment",
    oracle=f"""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {money_sum("o.o_totalprice")} AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """,
    category="layout",
    description=f"bucketed join under the gate: orders and customer are "
    f"written bucketBy({BUCKETS}, custkey) + sortBy, then sort-merge "
    "joined with ZERO exchanges AND zero sorts (runtime-asserted in the "
    "entry) -- the pay-the-shuffle-once-at-ingest layout that makes "
    "repeated fact-dim joins exchange-free at 100 TB",
)
def bucketed_join_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale notes: bucketing pre-shuffles ONCE at write; every later
    join on the bucket key reads co-located buckets (no exchange) and,
    with sortBy, skips the sort-merge sort too.  The merge hint pins the
    SMJ so the plan exercises the layout even where a broadcast would
    win at test scale; the aggregate after the join is the only
    exchange in the query."""
    import hashlib
    import shutil
    import sys
    import tempfile
    import time

    from .. import plans
    from ..catalog import SqlCatalog
    from .base import _CACHE_LOCK, CACHE_BUILD_SECONDS

    t = load_tables(spark, sf_dir)
    db = f"bkt_{hashlib.md5(sf_dir.encode()).hexdigest()[:10]}"
    cat = SqlCatalog(spark, database=db)
    location = f"{tempfile.gettempdir()}/{db}"
    key = (spark.sparkContext.applicationId, sf_dir)
    # Bucketed-table SETUP is a once-per-ingest cost (the whole point of
    # the layout); build once per (app, sf_dir) and attribute the write
    # time as a cache build so the entry's figure is the JOIN, not the
    # fixture.  Idempotent across sessions too: drop catalog entries
    # this session may hold, then clear any on-disk leftover from an
    # EARLIER process -- saveAsTable refuses a managed-table location
    # that exists without a catalog entry (LOCATION_ALREADY_EXISTS).
    if key not in _BUCKETED_READY:
        t0 = time.perf_counter()
        if spark.catalog.databaseExists(db):
            spark.sql(f"DROP TABLE IF EXISTS {db}.orders_b")
            spark.sql(f"DROP TABLE IF EXISTS {db}.customer_b")
        shutil.rmtree(location, ignore_errors=True)
        cat.ensure_database(location=location)
        cat.save_bucketed(
            t["orders"].select("o_custkey", "o_totalprice"),
            "orders_b",
            ["o_custkey"],
            n_buckets=BUCKETS,
            sort_cols=["o_custkey"],
        )
        cat.save_bucketed(
            t["customer"].select(
                F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
            ),
            "customer_b",
            ["o_custkey"],
            n_buckets=BUCKETS,
            sort_cols=["o_custkey"],
        )
        sec = time.perf_counter() - t0
        with _CACHE_LOCK:
            CACHE_BUILD_SECONDS["bucketed_tables"] = (
                CACHE_BUILD_SECONDS.get("bucketed_tables", 0.0) + sec
            )
            _BUCKETED_READY.add(key)
        print(f"CACHE-BUILD bucketed_tables {round(sec, 3)}", file=sys.stderr)
    o = spark.table(f"{db}.orders_b")
    c = spark.table(f"{db}.customer_b")
    j = o.hint("merge").join(c, "o_custkey")
    bucketing_on = (
        spark.conf.get("spark.sql.sources.bucketing.enabled", "true") == "true"
    )
    n_shuffles = plans.shuffle_count(j)
    if bucketing_on and n_shuffles != 0:
        # the layout claim IS the entry -- fail loudly (but only where
        # the session actually has bucketed scans enabled)
        raise AssertionError(
            f"bucketed join planned {n_shuffles} exchanges:\n"
            + plans.physical_plan(j)
        )
    agg = j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum_agg("o_totalprice", "total_price"),
    )
    return money_finish(agg, "total_price").orderBy("c_mktsegment")
