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
