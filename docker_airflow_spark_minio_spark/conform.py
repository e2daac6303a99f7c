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


def with_literal_partition(
    df: DataFrame, col_name: str, value: str, data_type: str = "date"
) -> DataFrame:
    """Add the load-date partition literal (reference job_silver.py:166-168:
    ``lit(date)`` then ``to_date``)."""
    return df.withColumn(col_name, F.lit(value).cast(spark_type(data_type)))
