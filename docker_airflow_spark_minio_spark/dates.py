"""Load-date derivation (C8).

The reference derives its partition key by shifting the Airflow execution
timestamp from UTC to America/Sao_Paulo as a FIXED -3h offset
(``get_datetime_UTC_SaoPaulo``, reference
datalake_pipeline_breweries.py:197-198 and copies in every DAG) -- which
is wrong during Brazil's historical DST windows.  Both semantics are
provided: the reference's fixed offset for parity, and proper
zone-aware conversion as the default.
"""

from __future__ import annotations

from datetime import datetime, timedelta
from zoneinfo import ZoneInfo

from pyspark.sql import Column
from pyspark.sql import functions as F

UTC = ZoneInfo("UTC")


def load_date(
    execution_ts: datetime,
    tz: str = "America/Sao_Paulo",
) -> str:
    """Partition-key date (YYYY-MM-DD) for a UTC execution timestamp,
    zone-aware (DST-correct)."""
    if execution_ts.tzinfo is None:
        execution_ts = execution_ts.replace(tzinfo=UTC)
    return execution_ts.astimezone(ZoneInfo(tz)).strftime("%Y-%m-%d")


def load_datetime_fixed_offset(execution_ts: datetime, hours: int = -3) -> str:
    """The reference's exact semantics: fixed -3h shift, formatted
    ``%Y-%m-%d_%H:%M:%S`` (datalake_pipeline_breweries.py:197-198)."""
    return (execution_ts + timedelta(hours=hours)).strftime("%Y-%m-%d_%H:%M:%S")


def load_date_col(ts_col: Column | str, tz: str = "America/Sao_Paulo") -> Column:
    """Distributed variant: derive the local load-date from a UTC
    timestamp COLUMN (for backfills that stamp per-row dates instead of
    one driver-side literal)."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return F.to_date(F.from_utc_timestamp(c, tz))
