"""Gold job: silver table -> aggregate summary table.

Parity surface (reference spark/jobs/job_gold.py:71-102): the declared
query

    SELECT sys_file_date, brewery_type, country, count(*) AS qtd
    FROM silver.dw.tab_brewery WHERE sys_file_date = :d
    GROUP BY 1,2,3 ORDER BY 1,2,3

then a partitioned overwrite write.  The reference executes its plan three
times (show :92, write :98-102, count :105 -- SURVEY.md section 8.2); here
the plan runs once for the write and the returned count reads the written
partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import SqlCatalog
from ..metrics import RunMetrics, observe_quality
from ..schema import DescribeList
from ..storage import TableManager

# The reference's gold table schema (reference job_gold.py:7-19).
GOLD_SUMMARY_DESCRIBE_LIST: DescribeList = [
    {"col_name": "brewery_type", "data_type": "string", "order": 1},
    {"col_name": "country", "data_type": "string", "order": 2},
    {"col_name": "qtd", "data_type": "bigint", "order": 3},
    {
        "col_name": "sys_file_date",
        "data_type": "date",
        "order": 4,
        "comment": {"partition": {"enabled": True, "order_sort": 1}},
    },
]


def gold_summary(
    silver_df: DataFrame,
    sys_file_date: str | None = None,
    ordered: bool = False,
) -> DataFrame:
    """The gold aggregation as a reusable transform.  Partial (map-side)
    aggregation + final hash aggregate come free from Catalyst; the filter
    on the partition column prunes partitions at the scan.

    ``ordered`` adds the reference's ORDER BY for interactive/oracle use;
    the write path leaves it off -- a global sort before a partitioned
    parquet write is a full extra shuffle whose order the write does not
    meaningfully preserve."""
    df = silver_df
    if sys_file_date is not None:
        df = df.filter(F.col("sys_file_date") == F.lit(sys_file_date).cast("date"))
    out = df.groupBy("sys_file_date", "brewery_type", "country").agg(
        F.count(F.lit(1)).alias("qtd")
    )
    if ordered:
        out = out.orderBy("sys_file_date", "brewery_type", "country")
    return out


def run_gold(
    spark: SparkSession,
    warehouse: str,
    sys_file_date: str,
    silver_table: str = "dw.tab_brewery",
    gold_table: str = "dw.tab_brewery_summary",
    mode: str = "overwrite_partitions",
    metrics: RunMetrics | None = None,
    backend: str = "path",
) -> int:
    """Run the gold aggregation for one day; returns rows written.

    ``backend='catalog'`` runs the reference's actual flow: the declared
    SQL text over the three-part silver table name via ``spark.sql``
    (reference job_gold.py:71-88), then a named-table partition overwrite
    (:98-102, minus its full-table-replace bug)."""
    metrics = metrics or RunMetrics()

    with metrics.timed("aggregate_write"):
        if backend == "catalog":
            db, tbl = (
                gold_table.split(".", 1) if "." in gold_table else ("dw", gold_table)
            )
            cat = SqlCatalog(spark, database=db)
            out = cat.sql(
                f"""
                SELECT sys_file_date, brewery_type, country,
                       count(*) AS qtd
                FROM {cat.qualified(silver_table)}
                WHERE sys_file_date = '{sys_file_date}'
                GROUP BY 1, 2, 3
                """
            )
            cat.ensure_database(location=f"{warehouse.rstrip('/')}/{db}")
            cat.ensure_table(tbl, GOLD_SUMMARY_DESCRIBE_LIST)
            # Observed row count rides the write job (zero extra scan);
            # the read-back count below stays as on-disk verification.
            out, harvest = observe_quality(out, [])
            if mode == "snapshot":
                cat.snapshot(out, tbl)
            else:
                cat.overwrite_partitions(out, tbl)
            read_back = cat.read(tbl)
        elif backend == "snapshots_sql":
            # the reference's ACTUAL consumption shape -- the declared
            # SQL text over a named table (job_gold.py:71-88) -- served
            # by the SNAPSHOT store through the snapshot_table batch
            # DataSource: the WHERE pushes into the manifest planner,
            # so the day's partition segments prune at plan time
            # exactly like the catalog backend's partition filter.
            # Local table roots only (the source's documented scope).
            from ..snapshots import SnapshotTableManager
            from ..streaming.table_source import snapshot_sql

            manager = SnapshotTableManager(spark, warehouse)
            out = snapshot_sql(
                spark,
                f"""
                SELECT sys_file_date, brewery_type, country,
                       count(*) AS qtd
                FROM silver_snapshot
                WHERE sys_file_date = DATE '{sys_file_date}'
                GROUP BY 1, 2, 3
                """,
                {"silver_snapshot": manager.path(silver_table)},
            )
            out, harvest = observe_quality(out, [])
            manager.write(out, gold_table, partition_by=["sys_file_date"], mode=mode)
            read_back = manager.read(gold_table)
        else:
            if backend == "snapshots":
                from ..snapshots import SnapshotTableManager

                manager = SnapshotTableManager(spark, warehouse)
            else:
                manager = TableManager(spark, warehouse)
            silver = manager.read(silver_table)
            out = gold_summary(silver, sys_file_date)
            out, harvest = observe_quality(out, [])
            manager.write(out, gold_table, partition_by=["sys_file_date"], mode=mode)
            read_back = manager.read(gold_table)

    metrics.count("observed_rows", int(harvest()["rows"]))
    n = read_back.filter(read_back["sys_file_date"] == sys_file_date).count()
    metrics.count("rows_written", n)
    return n
