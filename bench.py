#!/usr/bin/env python
"""Benchmark harness: every registered workload at the bench scale factor.

Prints exactly ONE compact JSON line on stdout:

    {"metric": "total_query_wall_seconds", "value": N, "unit": "sec",
     "sf": 0.1, "n_queries": 108, "n_failed": 0,
     "queries": {"<10 slowest>": sec, ...}}

The final line stays small no matter how large the registry grows (the
round-3 full per-query map outgrew the driver's output-tail capture and
made the artifact unparseable), so:

* every per-query time is ALSO streamed to stderr as it completes
  (``TIME <name> <sec>`` lines), and
* the complete per-query map is written to ``bench_full.json`` next to
  this script.

Per-query failures are recorded as null and never abort the run, so the
line always parses.

Each query is materialized with a ``noop``-format write: the full plan
executes on the executors (same work a real sink would do) but nothing is
collected to the driver -- timing measures the engine, not driver
materialization of result sets.

Environment:
    SPARK_GRAFT_SF_DIR  data dir    (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS    local cores (default 32)
    SPARK_GRAFT_BENCH_ONLY  comma-separated query names (default: all)
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

    # Plain-RDD Python workers are a SEPARATE pool from the Arrow/pandas
    # one; warm them too (interpreter spawn + the pyarrow import the REST
    # fan-out pays inside its fetch closure).
    try:

        def _warm(_):
            import pyarrow.parquet  # noqa: F401

            return 1

        spark.sparkContext.parallelize(range(cpus), cpus).map(_warm).count()
    except Exception as exc:  # noqa: BLE001
        print(f"rdd warmup failed: {exc}", file=sys.stderr)

    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "")
    if only:
        wanted = {n.strip() for n in only.split(",") if n.strip()}
        unknown = wanted - set(REGISTRY)
        if unknown:
            # Fail loudly: a typo must not produce a plausible-looking
            # artifact benchmarking a silently shrunken query set.
            print(f"unknown SPARK_GRAFT_BENCH_ONLY names: {sorted(unknown)}", file=sys.stderr)
            spark.stop()
            return 2
        selected = sorted(wanted)
    else:
        selected = sorted(REGISTRY)

    times: dict[str, float | None] = {}
    for name in selected:
        t0 = time.perf_counter()
        try:
            _materialize(REGISTRY[name].fn(spark, sf_dir))
            times[name] = round(time.perf_counter() - t0, 3)
            print(f"TIME {name} {times[name]}", file=sys.stderr, flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: {exc}", file=sys.stderr)
            times[name] = None

    ok = {k: v for k, v in times.items() if v is not None}
    total = round(sum(ok.values()), 3)
    sf = _sf_from_dir(sf_dir)

    # Full per-query map: sidecar file (unbounded) + stderr lines above.
    full = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_full.json")
    try:
        with open(full_path, "w", encoding="utf-8") as fh:
            json.dump(full, fh)
            fh.write("\n")
    except OSError as exc:
        print(f"bench_full.json write failed: {exc}", file=sys.stderr)

    # Final stdout line: compact summary only (top-10 slowest), so it
    # survives the driver's output-tail capture at any registry size.
    slowest = dict(sorted(ok.items(), key=lambda kv: kv[1], reverse=True)[:10])
    line = json.dumps(
        {
            "metric": "total_query_wall_seconds",
            "value": total,
            "unit": "sec",
            "sf": sf,
            "n_queries": len(times),
            "n_failed": len(times) - len(ok),
            "queries": slowest,
        }
    )
    print(line, flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
