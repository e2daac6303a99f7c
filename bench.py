#!/usr/bin/env python
"""Benchmark harness: every registered workload at the bench scale factor.

Prints exactly ONE JSON line on stdout:

    {"metric": "total_query_wall_seconds", "value": N, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

All Spark chatter goes to stderr; per-query failures are recorded as null
and never abort the run, so the line always parses.

Each query is materialized with a ``noop``-format write: the full plan
executes on the executors (same work a real sink would do) but nothing is
collected to the driver -- timing measures the engine, not driver
materialization of result sets.

Environment:
    SPARK_GRAFT_SF_DIR  data dir    (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS    local cores (default 32)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from docker_airflow_spark_minio_spark.session import get_spark_session  # noqa: E402
from docker_airflow_spark_minio_spark.workloads import REGISTRY  # noqa: E402


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    return float(m.group(1)) if m else -1.0


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark_session(
        "bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up (untimed): JVM JIT + codegen + parquet footer caches.
    try:
        _materialize(REGISTRY["q1_pricing_summary"].fn(spark, sf_dir))
    except Exception as exc:  # noqa: BLE001
        print(f"warmup failed: {exc}", file=sys.stderr)

    # Python/Arrow worker warm-up (untimed): the first pandas-UDF stage
    # otherwise pays one interpreter+pandas import cold start per core.
    try:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("long")
        def _ident(s):
            return s

        _materialize(spark.range(0, cpus, 1, cpus).select(_ident("id")))
    except Exception as exc:  # noqa: BLE001
        print(f"python warmup failed: {exc}", file=sys.stderr)

    times: dict[str, float | None] = {}
    for name in sorted(REGISTRY):
        t0 = time.perf_counter()
        try:
            _materialize(REGISTRY[name].fn(spark, sf_dir))
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: {exc}", file=sys.stderr)
            times[name] = None

    total = round(sum(t for t in times.values() if t is not None), 3)
    line = json.dumps(
        {
            "metric": "total_query_wall_seconds",
            "value": total,
            "unit": "sec",
            "queries": times,
            "sf": _sf_from_dir(sf_dir),
        }
    )
    print(line, flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
