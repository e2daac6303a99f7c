#!/usr/bin/env python
"""Regenerate QUERIES.md from the workload registry."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from collections import OrderedDict

from docker_airflow_spark_minio_spark.workloads import REGISTRY

cats = OrderedDict()
for name, wl in REGISTRY.items():
    cats.setdefault(wl.category, []).append(wl)
lines = ["# QUERIES — the registered surface (generated from the registry)",
         "",
         f"{len(REGISTRY)} entries; every one listed here ships a DuckDB oracle",
         "(`oracle_sql()`), so the driver's correctness gate covers 100% of the",
         "surface. Regenerate with: `python scripts/gen_queries_md.py`.",
         ""]
for cat, wls in sorted(cats.items()):
    lines.append(f"## {cat} ({len(wls)})")
    lines.append("")
    lines.append("| query | description |")
    lines.append("|---|---|")
    for wl in sorted(wls, key=lambda w: w.name):
        desc = " ".join(wl.description.split())
        lines.append(f"| `{wl.name}` | {desc} |")
    lines.append("")
with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md"), "w") as f:
    f.write("\n".join(lines))
print(f"QUERIES.md: {len(REGISTRY)} entries")
