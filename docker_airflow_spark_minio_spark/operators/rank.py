"""Distributed global rank: row_number over low-cardinality partitions
without a single-reducer sort.

``Window.partitionBy(status)`` with 3 distinct statuses executes as 3
reducer tasks no matter how many executors exist -- the classic
100 TB window bottleneck.  ``distributed_rank`` computes the identical
row_number in three scalable steps:

 1. range-repartition on (partition_cols, order_cols): Spark's
    distributed sort spreads each logical partition's rows over MANY
    contiguous physical partitions;
 2. local row_number within (partition_cols, physical-partition-id):
    the window key now has ~shuffle-partition cardinality, so the sort
    work is sharded across the cluster;
 3. per-chunk counts -> cumulative offsets (a metadata-sized frame, one
    row per (group, chunk)) broadcast back; global rank = offset +
    local rank.

The result is bit-identical to the direct window whenever the order
columns are a total order within each group (the same uniqueness
requirement every oracle-checked ranking query here already obeys --
ties split across chunk boundaries would otherwise order arbitrarily).

Range-partition boundaries come from sampling and may vary run to run;
the produced ranks do not (offsets absorb any boundary placement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def distributed_rank(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    rank_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global per-group row_number, sharded over the cluster.

    ``order_cols`` must totally order rows within each group (add a
    unique id as the last column, as the ranking workloads here do).
    Returns ``df`` plus ``rank_col`` (long, 1-based).
    """
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    keys = [F.col(c) for c in (*partition_cols, *order_cols)]
    ranged = df.repartitionByRange(n, *keys).withColumn(
        "__pid", F.spark_partition_id()
    )
    wl = Window.partitionBy(*partition_cols, "__pid").orderBy(
        *[F.col(c) for c in order_cols]
    )
    local = ranged.withColumn("__lrn", F.row_number().over(wl))
    counts = local.groupBy(*partition_cols, "__pid").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    wo = (
        Window.partitionBy(*partition_cols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__cnt").over(wo), F.lit(0))
    ).select(*partition_cols, "__pid", "__off")
    # one row per (group, chunk) -- metadata-sized at any data scale
    out = local.join(F.broadcast(offsets), [*partition_cols, "__pid"])
    return (
        out.withColumn(rank_col, (F.col("__off") + F.col("__lrn")).cast("long"))
        .drop("__pid", "__lrn", "__off")
    )
