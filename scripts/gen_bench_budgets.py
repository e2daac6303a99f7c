#!/usr/bin/env python
"""Regenerate bench_budgets.json from the latest bench_full.json.

Budget formula: ``round(2.0 * max(min_of_2_marginal, 0.5) + 0.75, 2)``
-- the judge-prescribed ~2x ceiling plus an absolute floor absorbing
the recorded 0.288 median run-to-run noise, with the measured time
floored at 0.5 s so entries whose marginal cost rounds to ~0 (shared
cache builds absorbed their work that run) do not get a budget tighter
than the CACHE-ATTRIBUTION jitter: which consumer of a shared persisted
set pays the residual varies run to run by up to ~1 s (observed:
dedup_cluster_components 0.0 -> 0.92 across two clean runs with zero
code delta).  Regenerate AFTER a clean full bench on a quiet machine;
the budgets are sf-tagged and only evaluated when bench.py runs at the
same scale factor.

Usage: python scripts/gen_bench_budgets.py [bench_full.json path]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "bench_full.json")
    with open(src, encoding="utf-8") as fh:
        full = json.load(fh)
    budgets = {
        name: round(2.0 * max(sec, 0.5) + 0.75, 2)
        for name, sec in full["queries"].items()
        if sec is not None
    }
    out = {
        "sf": full["sf"],
        "formula": "2.0 * max(min_of_2_marginal, 0.5) + 0.75",
        "source_value": full["value"],
        "budgets": budgets,
    }
    dst = os.path.join(REPO, "bench_budgets.json")
    with open(dst, "w", encoding="utf-8") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {dst}: {len(budgets)} budgets at sf={full['sf']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
