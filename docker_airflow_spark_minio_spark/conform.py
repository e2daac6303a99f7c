"""Schema conformance as ONE Catalyst projection.

The reference runs four separate passes over the DataFrame: drop extra
columns (job_silver.py:8-19), cast-by-schema with add-missing-as-null
(decase/utils.py:168-267), reorder (job_silver.py:21-31), then add the
partition literal (job_silver.py:166-168).  Catalyst would collapse those
anyway (CollapseProject), but here they are a single ``select`` by
construction, so the logical plan is one projection regardless of
optimizer behavior -- and the semantics are identical:

 * missing declared column   -> NULL of the declared type (utils.py:199-201)
 * extra incoming column     -> dropped (utils.py:204-207)
 * type mismatch             -> cast (non-castable values become NULL,
                                e.g. phone string->bigint, utils.py:258-263)
 * output column order       -> declared ``order``
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .schema import DescribeList, data_entries, spark_type


def conform(df: DataFrame, describe_list: DescribeList) -> DataFrame:
    """Conform ``df`` to the declared schema in a single projection."""
    incoming = {f.name.lower(): f for f in df.schema.fields}
    exprs: list[Column] = []
    for entry in data_entries(describe_list):
        name = entry["col_name"]
        target = spark_type(entry["data_type"])
        field = incoming.get(name.lower())
        if field is None:
            exprs.append(F.lit(None).cast(target).alias(name))
        else:
            # try_cast: malformed values become NULL (the reference ran
            # Spark 3.x non-ANSI casts, utils.py:258-263; under Spark 4's
            # ANSI default a plain cast would throw).  Always emitted --
            # Catalyst's SimplifyCasts removes no-op casts, so the
            # reference's need_cast decision table (utils.py:241-257) is
            # unnecessary.
            exprs.append(F.col(field.name).try_cast(target).alias(name))
    return df.select(*exprs)


def conform_with_rejects(
    df: DataFrame, describe_list: DescribeList
) -> tuple[DataFrame, DataFrame]:
    """:func:`conform`, plus a quarantine frame of the rows that LOST
    data to the null-on-malformed casts (a non-null input became NULL).

    The reference silently nulls malformed values (utils.py:258-263);
    production ETL routes them to a reject table for replay after a
    schema fix.  Returns ``(valid, rejects)`` where ``rejects`` carries
    the ORIGINAL (uncast) row plus a ``_reject_cols`` array naming every
    column that failed its cast.  Each frame is a scan + map-only
    filter (no shuffle); materializing BOTH costs two passes over the
    day's input -- bounded by one day's bronze, and the alternative
    (persist or a two-sink foreachBatch) costs the same data movement.
    Note ``valid`` here means "no value was lost": rows with
    declared-but-missing columns pass (missing -> NULL is schema
    evolution, not corruption).
    """
    incoming = {f.name.lower(): f for f in df.schema.fields}
    fail_flags: list[Column] = []
    for entry in data_entries(describe_list):
        name = entry["col_name"]
        target = spark_type(entry["data_type"])
        field = incoming.get(name.lower())
        if field is None:
            continue
        src = F.col(field.name)
        fail_flags.append(
            F.when(
                src.isNotNull() & src.try_cast(target).isNull(), F.lit(name)
            ).otherwise(F.lit(None))
        )
    if fail_flags:
        reject_cols = F.array_compact(F.array(*fail_flags))
        rejects = (
            df.withColumn("_reject_cols", reject_cols)
            .where(F.size("_reject_cols") > 0)
        )
        valid = conform(df.where(F.size(reject_cols) == 0), describe_list)
    else:
        rejects = df.withColumn(
            "_reject_cols", F.array().cast("array<string>")
        ).where(F.lit(False))
        valid = conform(df, describe_list)
    return valid, rejects


def with_literal_partition(
    df: DataFrame, col_name: str, value: str, data_type: str = "date"
) -> DataFrame:
    """Add the load-date partition literal (reference job_silver.py:166-168:
    ``lit(date)`` then ``to_date``)."""
    return df.withColumn(col_name, F.lit(value).cast(spark_type(data_type)))
