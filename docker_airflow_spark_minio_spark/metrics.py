"""Run metrics & timing -- single implementation.

The reference copy-pastes its notification/duration helpers across four DAG
files (reference datalake_pipeline_breweries.py:53-181 and near-identical
copies in the bronze/silver/gold DAGs; SURVEY.md section 2.7 C7).  Here one
small module provides structured timings and data-volume reporting.
"""

from __future__ import annotations

import json
import time
from contextlib import contextmanager
from dataclasses import dataclass, field


def observe_quality(df, columns):
    """Attach piggybacked data-quality metrics to ``df``.

    Returns ``(df, harvest)`` where ``harvest()`` -- callable AFTER the
    next action on the returned frame -- yields ``{"rows": n,
    "null_<col>": n, ...}``.  ``df.observe`` accumulates the aggregates
    inside the SAME job that materializes the frame (the write, here):
    row counts and null counts cost ZERO extra scans, unlike the
    reference's pattern of re-counting the frame per metric (reference
    job_silver.py:149,152 runs the scan twice just for logging).
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation()
    exprs = [F.count(F.lit(1)).alias("rows")]
    for c in columns:
        exprs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"null_{c}")
        )
    return df.observe(obs, *exprs), (lambda: dict(obs.get))


def format_duration(seconds: float) -> str:
    """HH:MM:SS, as the reference logs pipeline duration
    (datalake_pipeline_breweries.py:151-163)."""
    s = int(seconds)
    return f"{s // 3600:02d}:{(s % 3600) // 60:02d}:{s % 60:02d}"


@dataclass
class RunMetrics:
    """Collects named wall-clock timings and counters for one job run."""

    timings: dict[str, float] = field(default_factory=dict)
    counters: dict[str, int] = field(default_factory=dict)

    @contextmanager
    def timed(self, name: str):
        t0 = time.monotonic()
        try:
            yield
        finally:
            self.timings[name] = self.timings.get(name, 0.0) + (time.monotonic() - t0)

    def count(self, name: str, value: int) -> None:
        """Accumulate a counter (+=, consistent with ``timed``)."""
        self.counters[name] = self.counters.get(name, 0) + value

    def to_json(self) -> str:
        return json.dumps(
            {
                "timings_sec": {k: round(v, 3) for k, v in self.timings.items()},
                "counters": self.counters,
            },
            sort_keys=True,
        )
