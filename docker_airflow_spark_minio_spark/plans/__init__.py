"""Physical-plan inspection helpers.

Scale regressions (a filter that stopped pushing down, a join that went
cartesian, a forced broadcast of a huge table) are invisible to
row-count tests -- they only show in the physical plan.  These helpers
make plan properties assertable in pytest, so the 100-TB posture is
enforced by CI, not by eyeballing ``explain()`` output.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed (post-AQE-initial) physical plan as text, with scan
    metadata un-truncated so PushedFilters/ReadSchema parse reliably."""
    spark = df.sparkSession
    key = "spark.sql.maxMetadataStringLength"
    prev = spark.conf.get(key)
    spark.conf.set(key, "100000")
    try:
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(key, prev)


def has_cartesian_product(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the data source (parquet row-group pruning)."""
    return [
        f.strip()
        for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", physical_plan(df))
        for f in m.group(1).split(",")
        if f.strip()
    ]


def read_schema_columns(df: DataFrame) -> set[str]:
    """Columns actually read from the source (column-pruning check)."""
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", physical_plan(df)):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def broadcast_join_count(df: DataFrame) -> int:
    return physical_plan(df).count("BroadcastHashJoin")


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (lower is better; each is
    a full network rewrite of its input)."""
    return len(re.findall(r"Exchange (?:hash|range|Single)", physical_plan(df)))
