"""Structured Streaming tests: the unified builders produce identical
results on a batch DataFrame and on a file-source stream of the same
data (availableNow trigger -> deterministic, self-terminating)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from docker_airflow_spark_minio_spark.streaming import (
    session_stats,
    stream_bronze,
    tumbling_counts,
)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

EVENTS = [
    (1, "click", "2024-05-01 10:05:00"),
    (1, "click", "2024-05-01 10:45:00"),
    (2, "view", "2024-05-01 10:50:00"),
    (1, "click", "2024-05-01 11:20:00"),  # >30min gap for user 1 -> new session
    (2, "view", "2024-05-01 11:40:00"),
    (2, "purchase", "2024-05-01 12:10:00"),
    (1, "view", "2024-05-01 12:59:00"),
]


@pytest.fixture
def event_files(tmp_path):
    src = tmp_path / "events_in"
    src.mkdir()
    # three files -> three potential micro-batches
    for i in range(3):
        with open(src / f"part_{i}.json", "w") as f:
            for u, e, ts in EVENTS[i::3]:
                f.write(json.dumps({"user_id": u, "event_type": e, "ts": ts}) + "\n")
    return str(src)


def _run_to_memory(stream_df, name: str, checkpoint: str, mode: str) -> None:
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_tumbling_stream_matches_batch(spark, event_files, tmp_path):
    batch = spark.createDataFrame(
        [(u, e, ts) for u, e, ts in EVENTS], "user_id long, event_type string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    expected = sorted(
        tuple(r) for r in tumbling_counts(batch).collect()
    )

    stream = stream_bronze(spark, event_files, SCHEMA, max_files_per_trigger=1)
    assert stream.isStreaming
    _run_to_memory(
        tumbling_counts(stream), "tumbling_mem", str(tmp_path / "ckpt_t"), "complete"
    )
    got = sorted(tuple(r) for r in spark.table("tumbling_mem").collect())
    assert got == expected
    assert len(got) == 6  # 3 hours x types present in each


def test_session_window_batch_and_stream(spark, event_files, tmp_path):
    batch = spark.createDataFrame(
        [(u, e, ts) for u, e, ts in EVENTS], "user_id long, event_type string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    rows = {
        (r["user_id"], str(r["window_start"])): r["n_events"]
        for r in session_stats(batch).collect()
    }
    # user 1: 10:05+10:45 merge (40min span, gaps<30min? 10:05->10:45 is 40min -> split)
    assert rows[(1, "2024-05-01 10:05:00")] == 1
    assert rows[(1, "2024-05-01 10:45:00")] == 1
    assert rows[(2, "2024-05-01 11:40:00")] == 2  # 11:40 + 12:10 merge

    # streaming session windows: state-backed merge, append mode with
    # watermark; availableNow + per-file batches advances the watermark
    # so earlier sessions finalize
    stream = stream_bronze(spark, event_files, SCHEMA, max_files_per_trigger=1)
    _run_to_memory(
        session_stats(stream), "session_mem", str(tmp_path / "ckpt_s"), "append"
    )
    emitted = spark.table("session_mem").collect()
    # only watermark-finalized sessions appear; every emitted row must
    # match the batch result exactly
    for r in emitted:
        assert rows[(r["user_id"], str(r["window_start"]))] == r["n_events"]


def test_streaming_dedup_within_watermark(spark, tmp_path):
    from docker_airflow_spark_minio_spark.streaming import dedup_stream

    src = tmp_path / "dup_in"
    src.mkdir()
    rows = [
        (1, "2024-05-01 10:00:00"),
        (2, "2024-05-01 10:01:00"),
        (1, "2024-05-01 10:02:00"),  # dup of key 1
        (3, "2024-05-01 10:03:00"),
        (2, "2024-05-01 10:04:00"),  # dup of key 2
    ]
    for i, (k, ts) in enumerate(rows):
        with open(src / f"f{i}.json", "w") as f:
            f.write(json.dumps({"doc_id": k, "ts": ts}) + "\n")
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("ts", T.TimestampType())]
    )
    stream = stream_bronze(spark, str(src), schema, max_files_per_trigger=2)
    out = dedup_stream(stream, keys=("doc_id",), ts_col="ts", watermark="1 hour")
    _run_to_memory(out, "dedup_mem", str(tmp_path / "ckpt_d"), "append")
    got = sorted(r["doc_id"] for r in spark.table("dedup_mem").collect())
    assert got == [1, 2, 3]

    # batch path: same builder, same result
    batch = spark.createDataFrame(rows, "doc_id long, ts string")
    assert sorted(
        r["doc_id"] for r in dedup_stream(batch, keys=("doc_id",)).collect()
    ) == [1, 2, 3]


def test_streaming_dedup_state_survives_restart(spark, tmp_path):
    # the operational contract of checkpointed dedup: a duplicate that
    # arrives AFTER a stop/restart (same checkpoint) is still dropped,
    # because the key state is restored from the state store
    from docker_airflow_spark_minio_spark.streaming import dedup_stream

    src = tmp_path / "restart_in"
    src.mkdir()
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("ts", T.TimestampType())]
    )
    ckpt = str(tmp_path / "ckpt_restart")
    sink = str(tmp_path / "restart_out")

    def run_once():
        # file sink, not memory: the memory sink refuses checkpoint
        # recovery, and recovery is exactly what this test exercises
        stream = stream_bronze(spark, str(src), schema, max_files_per_trigger=1)
        out = dedup_stream(stream, keys=("doc_id",), ts_col="ts", watermark="1 hour")
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    with open(src / "f0.json", "w") as f:
        f.write(json.dumps({"doc_id": 1, "ts": "2024-05-01 10:00:00"}) + "\n")
        f.write(json.dumps({"doc_id": 2, "ts": "2024-05-01 10:01:00"}) + "\n")
    run_once()

    # second run: one replayed key (1), one new key (3) -- both inside
    # the watermark horizon of the first run's data
    with open(src / "f1.json", "w") as f:
        f.write(json.dumps({"doc_id": 1, "ts": "2024-05-01 10:02:00"}) + "\n")
        f.write(json.dumps({"doc_id": 3, "ts": "2024-05-01 10:03:00"}) + "\n")
    run_once()

    got = sorted(r["doc_id"] for r in spark.read.parquet(sink).collect())
    assert got == [1, 2, 3]  # the restarted query dropped the replayed key 1


def test_stateful_running_totals(spark, tmp_path):
    from docker_airflow_spark_minio_spark.streaming import running_totals, stream_bronze

    src = tmp_path / "state_in"
    src.mkdir()
    batches = [
        [("a", 1.0), ("b", 2.0)],
        [("a", 3.0)],
        [("b", 4.0), ("a", 5.0)],
    ]
    for i, rows in enumerate(batches):
        with open(src / f"f{i}.json", "w") as f:
            for k, v in rows:
                f.write(json.dumps({"key": k, "value": v}) + "\n")
    schema = T.StructType(
        [T.StructField("key", T.StringType()), T.StructField("value", T.DoubleType())]
    )
    stream = stream_bronze(spark, str(src), schema, max_files_per_trigger=1)
    out = running_totals(stream.groupBy("key"), ttl_ms=3_600_000)
    _run_to_memory(out, "totals_mem", str(tmp_path / "ckpt_rt"), "update")
    # memory sink in update mode appends every emission in arbitrary
    # order; totals are monotone per key, so the max emission is final
    rows = spark.table("totals_mem").collect()
    last: dict = {}
    for r in rows:
        cur = (r["n_events"], r["total"])
        last[r["key"]] = max(last.get(r["key"], cur), cur)
    assert last == {"a": (3, 9.0), "b": (2, 6.0)}


def test_incremental_silver_exactly_once(spark, tmp_path):
    from test_pipeline_e2e import DAY_A, DAY_B, RECORDS_A, _write_bronze

    from docker_airflow_spark_minio_spark.streaming.silver import run_silver_stream

    bronze = str(tmp_path / "bronze")
    warehouse = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    _write_bronze(bronze, DAY_A, RECORDS_A)

    run_silver_stream(spark, bronze, warehouse, ckpt)
    silver = spark.read.parquet(f"{warehouse}/dw/tab_brewery")
    assert silver.count() == 3
    rows = {r["id"]: r for r in silver.collect()}
    assert rows["1"]["phone"] == 5551234      # conformance applied
    assert rows["2"]["phone"] is None          # malformed -> null
    assert str(rows["1"]["sys_file_date"]) == DAY_A  # from the dir name

    # land a new day; rerun with the SAME checkpoint: only new files load
    _write_bronze(bronze, DAY_B, [{"id": "9", "name": "Z", "brewery_type": "nano",
                                   "country": "DE"}])
    run_silver_stream(spark, bronze, warehouse, ckpt)
    silver = spark.read.parquet(f"{warehouse}/dw/tab_brewery")
    assert silver.count() == 4                 # 3 + 1, day A not re-ingested

    # a third run with nothing new is a no-op
    run_silver_stream(spark, bronze, warehouse, ckpt)
    assert spark.read.parquet(f"{warehouse}/dw/tab_brewery").count() == 4


def test_incremental_gold_refreshes_changed_partitions(spark, tmp_path):
    from test_pipeline_e2e import DAY_A, DAY_B, RECORDS_A, _write_bronze

    from docker_airflow_spark_minio_spark.streaming.silver import (
        run_gold_stream,
        run_silver_stream,
    )

    bronze = str(tmp_path / "bronze")
    warehouse = str(tmp_path / "wh")
    _write_bronze(bronze, DAY_A, RECORDS_A)
    run_silver_stream(spark, bronze, warehouse, str(tmp_path / "ck_s"))
    run_gold_stream(spark, warehouse, str(tmp_path / "ck_g"))

    gold = spark.read.parquet(f"{warehouse}/dw/tab_brewery_summary")
    got = {(str(r["sys_file_date"]), r["brewery_type"], r["country"]): r["qtd"]
           for r in gold.collect()}
    assert got == {(DAY_A, "micro", "US"): 2, (DAY_A, "nano", "PT"): 1}

    # land day B; both stream stages pick up ONLY the new partition
    _write_bronze(bronze, DAY_B, [{"id": "7", "name": "N", "brewery_type": "micro",
                                   "country": "US"}])
    run_silver_stream(spark, bronze, warehouse, str(tmp_path / "ck_s"))
    run_gold_stream(spark, warehouse, str(tmp_path / "ck_g"))
    gold = spark.read.parquet(f"{warehouse}/dw/tab_brewery_summary")
    assert gold.count() == 3  # day A rows intact + 1 day-B group


def test_interval_join_stream_matches_batch(spark, event_files, tmp_path):
    """Stream-stream interval join: purchases paired with the clicks of
    the preceding hour, identical result on batch and streaming inputs."""
    from docker_airflow_spark_minio_spark.streaming import interval_join, stream_bronze

    batch = spark.createDataFrame(
        [(u, e, ts) for u, e, ts in EVENTS], "user_id long, event_type string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    b_left = batch.where(F.col("event_type") == "purchase")
    b_right = batch.where(F.col("event_type") == "click")
    expected = sorted(
        (r["user_id"], str(r["ts"]), str(r["r_ts"]))
        for r in interval_join(b_left, b_right, lookback="1 hour").collect()
    )
    # user 2 purchases at 12:10 but has no clicks; no user-1 purchase
    assert expected == []

    # a purchase for user 1 at 11:45 catches the 11:20 click and the
    # 10:45 click (exactly on the inclusive 1-hour boundary)
    extra = spark.createDataFrame(
        [(1, "purchase", "2024-05-01 11:45:00")],
        "user_id long, event_type string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    expected2 = sorted(
        (r["user_id"], str(r["ts"]), str(r["r_ts"]))
        for r in interval_join(extra, b_right, lookback="1 hour").collect()
    )
    assert expected2 == [
        (1, "2024-05-01 11:45:00", "2024-05-01 10:45:00"),
        (1, "2024-05-01 11:45:00", "2024-05-01 11:20:00"),
    ]

    # streaming twin: both sides as file streams, same rows out
    import json as _json

    src = tmp_path / "purchases_in"
    src.mkdir()
    with open(src / "p0.json", "w") as f:
        f.write(_json.dumps({"user_id": 1, "event_type": "purchase",
                             "ts": "2024-05-01 11:45:00"}) + "\n")
    s_left = stream_bronze(spark, str(src), SCHEMA)
    s_right = stream_bronze(spark, event_files, SCHEMA).where(
        F.col("event_type") == "click"
    )
    out = interval_join(s_left, s_right, lookback="1 hour")
    _run_to_memory(out, "ij_mem", str(tmp_path / "ckpt_ij"), "append")
    got = sorted(
        (r["user_id"], str(r["ts"]), str(r["r_ts"]))
        for r in spark.table("ij_mem").collect()
    )
    assert got == expected2


def test_silver_replay_after_kill_between_commit_and_checkpoint(spark, tmp_path):
    # Exactly-once under the worst failure window: the sink write has
    # COMMITTED but the process dies before the checkpoint advances.
    # The restart replays the same micro-batch (same batch_id); the
    # batch-keyed dynamic overwrite must replace its own output instead
    # of appending a second copy.
    from test_pipeline_e2e import DAY_A, RECORDS_A, _write_bronze

    from docker_airflow_spark_minio_spark.streaming.silver import run_silver_stream

    bronze = str(tmp_path / "bronze")
    warehouse = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    _write_bronze(bronze, DAY_A, RECORDS_A)

    class Kill(Exception):
        pass

    def die_after_commit(batch_id: int) -> None:
        raise Kill(f"killed after commit of batch {batch_id}")

    with pytest.raises(Exception):  # StreamingQueryException wrapping Kill
        run_silver_stream(
            spark, bronze, warehouse, ckpt, on_batch_commit=die_after_commit
        )
    # The write itself committed before the kill.
    silver_path = f"{warehouse}/dw/tab_brewery"
    assert spark.read.parquet(silver_path).count() == 3

    # Restart with the same checkpoint: the batch replays, rows do NOT
    # duplicate, and ids survive exactly once.
    run_silver_stream(spark, bronze, warehouse, ckpt)
    silver = spark.read.parquet(silver_path)
    assert silver.count() == 3
    assert sorted(r["id"] for r in silver.collect()) == ["1", "2", "3"]

    # Nothing pending afterwards.
    run_silver_stream(spark, bronze, warehouse, ckpt)
    assert spark.read.parquet(silver_path).count() == 3


def test_gold_replay_after_kill_between_commit_and_checkpoint(spark, tmp_path):
    from test_pipeline_e2e import DAY_A, RECORDS_A, _write_bronze

    from docker_airflow_spark_minio_spark.streaming.silver import (
        run_gold_stream,
        run_silver_stream,
    )

    bronze = str(tmp_path / "bronze")
    warehouse = str(tmp_path / "wh")
    _write_bronze(bronze, DAY_A, RECORDS_A)
    run_silver_stream(spark, bronze, warehouse, str(tmp_path / "ck_s"))

    def die_after_commit(batch_id: int) -> None:
        raise RuntimeError(f"killed after commit of batch {batch_id}")

    with pytest.raises(Exception):
        run_gold_stream(
            spark, warehouse, str(tmp_path / "ck_g"), on_batch_commit=die_after_commit
        )
    gold_path = f"{warehouse}/dw/tab_brewery_summary"
    expected = {(DAY_A, "micro", "US"): 2, (DAY_A, "nano", "PT"): 1}
    got = {(str(r["sys_file_date"]), r["brewery_type"], r["country"]): r["qtd"]
           for r in spark.read.parquet(gold_path).collect()}
    assert got == expected  # committed before the kill

    # Replay: the changed-day overwrite recomputes the SAME days -- no
    # duplicate groups, identical aggregates.
    run_gold_stream(spark, warehouse, str(tmp_path / "ck_g"))
    got = {(str(r["sys_file_date"]), r["brewery_type"], r["country"]): r["qtd"]
           for r in spark.read.parquet(gold_path).collect()}
    assert got == expected


def test_stream_static_join_dimension_frozen_at_start(spark, tmp_path):
    """Pin the stream-static dimension REFRESH semantics (VERDICT r5
    item 8): with a path-based parquet static side, the file listing is
    resolved ONCE when the static DataFrame is created -- the static
    plan re-EXECUTES each micro-batch, but a dimension file appended
    mid-stream is NOT visible to later batches.  Production pipelines
    needing per-batch dimension freshness must re-resolve the dimension
    inside foreachBatch (positive control below) or restart the query;
    `streaming_static_enrich_live` exercises the frozen semantics.
    """
    dim_dir = str(tmp_path / "dim")
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    spark.createDataFrame(
        [(1, "gold")], "user_id long, tier string"
    ).coalesce(1).write.mode("overwrite").parquet(dim_dir)
    for i, name in enumerate(["f1.json", "f2.json"]):
        with open(os.path.join(src_dir, name), "w", encoding="utf-8") as f:
            f.write(json.dumps({"user_id": 1, "src": name}) + "\n")
            f.write(json.dumps({"user_id": 2, "src": name}) + "\n")

    static = spark.read.parquet(dim_dir)
    stream = (
        spark.readStream.schema("user_id long, src string")
        .option("maxFilesPerTrigger", 1)
        .json(src_dir)
        .join(static, "user_id")
    )
    captured: dict[int, list] = {}

    def cap(df, bid: int) -> None:
        captured[bid] = sorted(
            (r["user_id"], r["tier"], r["src"]) for r in df.collect()
        )
        if bid == 0:
            # user 2 joins the dimension mid-stream (new parquet file)
            spark.createDataFrame(
                [(2, "silver")], "user_id long, tier string"
            ).coalesce(1).write.mode("append").parquet(dim_dir)

    q = (
        stream.writeStream.foreachBatch(cap)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sorted(captured) == [0, 1]
    # the frozen listing: user 2 never enriches, in EITHER batch --
    # the mid-stream dimension append is invisible to the running query
    for bid, rows in captured.items():
        assert all(uid == 1 for uid, _, _ in rows), (bid, rows)
    assert len(captured[1]) == 1  # user 1 only, from the second file

    # positive control -- per-batch re-resolution inside foreachBatch
    # IS the pattern that sees dimension updates
    fresh = spark.read.parquet(dim_dir)
    batch2 = spark.createDataFrame([(2, "f3.json")], "user_id long, src string")
    seen = sorted(
        (r["user_id"], r["tier"]) for r in batch2.join(fresh, "user_id").collect()
    )
    assert seen == [(2, "silver")]
