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
from .base import load_tables, register

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
