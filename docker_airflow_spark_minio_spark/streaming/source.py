"""Streaming ingest from the bronze landing zone.

Turns the batch pipeline's NDJSON landing layout (``sources/rest.py``
writes ``<bronze>/sys_file_date=<D>/``) into an incremental file-source
stream: each new landed file becomes a micro-batch, which upgrades the
reference's daily-cron re-read (reference datalake_silver_spark_dag.py)
to continuous processing with exactly-once file tracking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def stream_bronze(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a bronze NDJSON directory.

    An explicit schema is mandatory for streaming reads (no inference
    pass exists on an unbounded source -- the same reason the batch
    silver read takes one, ``schema.string_read_schema``).
    ``max_files_per_trigger`` bounds micro-batch size for backfills.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(path)
