"""Structured Streaming surface.

The reference is batch-only (its "streaming" is a daily cron re-run of
the whole pipeline, reference datalake_pipeline_breweries.py:200-216).
This package provides the streaming expressions of the engine's windowed
shapes -- the same builders work on batch and streaming DataFrames, the
idiomatic-Spark unified model -- plus a file-source ingest helper that
turns the bronze NDJSON landing zone into an incremental stream.
"""

from .dedup import dedup_stream  # noqa: F401
from .joins import interval_join  # noqa: F401
from .silver import run_gold_stream, run_silver_stream  # noqa: F401
from .stateful import running_totals  # noqa: F401
from .windows import hopping_counts, session_stats, tumbling_counts  # noqa: F401
from .source import stream_bronze  # noqa: F401
from .table_source import SnapshotTableStreamSource  # noqa: F401
