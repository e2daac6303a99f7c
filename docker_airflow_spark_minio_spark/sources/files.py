"""File readers.

The reference reads bronze NDJSON with full-scan schema inference
(reference job_silver.py:143-147).  Inference over 100 TB is an extra full
pass, so the scalable default here takes an explicit schema (or samples);
inference remains available for parity/tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_ndjson(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    sampling_ratio: float | None = None,
) -> DataFrame:
    """NDJSON reader. Explicit schema > sampled inference > full inference."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif sampling_ratio is not None:
        reader = reader.option("samplingRatio", str(sampling_ratio))
    return reader.json(path)


TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Load the driver's synthetic star-schema tables (TESTDATA.md)."""
    return {t: spark.read.parquet(f"{sf_dir.rstrip('/')}/{t}.parquet") for t in tables}
