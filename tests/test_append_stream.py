"""Streaming append sink: atomic per-batch commits, exactly-once across
the commit-to-checkpoint window, and the chained incremental
materialized-view refresh staying correct under replay.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from docker_airflow_spark_minio_spark.matview import IncrementalMatView
from docker_airflow_spark_minio_spark.snapshots import SnapshotStore
from docker_airflow_spark_minio_spark.streaming.append import (
    append_snapshot_batch,
    run_append_stream,
)

SCHEMA = "id INT, day STRING, amt INT"


def _write_feed(feed_dir: str, name: str, rows: list[dict]) -> None:
    os.makedirs(feed_dir, exist_ok=True)
    with open(os.path.join(feed_dir, name), "w", encoding="utf-8") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(spark, tmp_path, **kw):
    return run_append_stream(
        spark,
        str(tmp_path / "feed"),
        SCHEMA,
        str(tmp_path / "tab"),
        partition_by=["day"],
        checkpoint=str(tmp_path / "ckpt"),
        **kw,
    )


def _table(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "tab"))
    return sorted((r["id"], r["day"], r["amt"]) for r in store.read().collect())


def test_append_batches_commit_atomically_and_accumulate(spark, tmp_path):
    feed = str(tmp_path / "feed")
    _write_feed(feed, "b0.json", [{"id": 1, "day": "d1", "amt": 10}])
    _run(spark, tmp_path)
    _write_feed(feed, "b1.json", [{"id": 2, "day": "d2", "amt": 20}])
    _run(spark, tmp_path)

    store = SnapshotStore(spark, str(tmp_path / "tab"))
    assert store.versions() == [0, 1]
    assert _table(spark, tmp_path) == [(1, "d1", 10), (2, "d2", 20)]
    # time travel sees only the first batch
    assert [r["id"] for r in store.read(as_of=0).collect()] == [1]


def test_append_replay_after_kill_between_commit_and_checkpoint(
    spark, tmp_path
):
    feed = str(tmp_path / "feed")
    _write_feed(feed, "b0.json", [{"id": 1, "day": "d1", "amt": 10}])

    class Kill(Exception):
        pass

    def die_after_commit(batch_id: int, version) -> None:
        raise Kill(f"killed after commit of batch {batch_id}")

    with pytest.raises(Exception):  # StreamingQueryException wrapping Kill
        _run(spark, tmp_path, on_batch_commit=die_after_commit)

    store = SnapshotStore(spark, str(tmp_path / "tab"))
    assert store.versions() == [0]

    # Restart with the same checkpoint: batch 0 replays and is skipped.
    seen: list[tuple] = []
    _run(spark, tmp_path, on_batch_commit=lambda b, v: seen.append((b, v)))
    store = SnapshotStore(spark, str(tmp_path / "tab"))
    assert store.versions() == [0]  # no duplicate append
    assert seen == [(0, None)]  # hook sees the replay as skipped
    assert _table(spark, tmp_path) == [(1, "d1", 10)]


def test_append_replay_detection_survives_retention(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "tab"))
    df = spark.createDataFrame([(1, "d1", 10)], SCHEMA)
    assert append_snapshot_batch(store, df, ["day"], batch_id=0) == 0
    assert append_snapshot_batch(store, df, ["day"], batch_id=1) == 1
    # replay of an already-committed batch is a no-op
    assert append_snapshot_batch(store, df, ["day"], batch_id=1) is None

    # drop the manifests that recorded the ids; the carried watermark
    # still rejects the replay
    store.write(df, mode="append", partition_by=["day"])
    store.write(df, mode="append", partition_by=["day"])
    store.expire_snapshots(keep_last=1)
    assert append_snapshot_batch(store, df, ["day"], batch_id=0) is None
    assert append_snapshot_batch(store, df, ["day"], batch_id=1) is None
    # a genuinely new batch still lands
    assert append_snapshot_batch(store, df, ["day"], batch_id=2) is not None


def test_append_chained_matview_replay_is_idempotent(spark, tmp_path):
    """A crash AFTER the matview refresh (worst window: sink committed,
    gold refreshed, checkpoint not advanced) must replay to a skipped
    append + noop refresh -- gold stays correct, no double counting."""
    feed = str(tmp_path / "feed")
    _write_feed(
        feed,
        "b0.json",
        [
            {"id": 1, "day": "d1", "amt": 10},
            {"id": 2, "day": "d2", "amt": 20},
        ],
    )
    store = SnapshotStore(spark, str(tmp_path / "tab"))
    mv = IncrementalMatView(
        spark,
        store,
        str(tmp_path / "mv"),
        group_by=["day"],
        aggs={"n": ("count",), "s": ("sum", "amt")},
        partition_by=["day"],
    )

    class Kill(Exception):
        pass

    def refresh_then_die(batch_id: int, version) -> None:
        mv.refresh()
        raise Kill("killed after gold refresh")

    with pytest.raises(Exception):
        _run(spark, tmp_path, on_batch_commit=refresh_then_die)

    modes: list[str] = []
    _run(
        spark,
        tmp_path,
        on_batch_commit=lambda b, v: modes.append(mv.refresh()["mode"]),
    )
    assert modes == ["noop"]  # replayed batch: nothing new to fold
    got = sorted(
        (r["day"], r["n"], r["s"]) for r in mv.read().collect()
    )
    assert got == [("d1", 1, 10), ("d2", 1, 20)]

    # and the chain keeps flowing afterwards
    _write_feed(feed, "b1.json", [{"id": 3, "day": "d1", "amt": 5}])
    modes.clear()
    _run(
        spark,
        tmp_path,
        on_batch_commit=lambda b, v: modes.append(mv.refresh()["mode"]),
    )
    assert modes == ["incremental"]
    got = sorted((r["day"], r["n"], r["s"]) for r in mv.read().collect())
    assert got == [("d1", 2, 15), ("d2", 1, 20)]


DOC_SCHEMA = "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
#: passes all five corpus-adapted Gopher rules (>=20 tokens, 2 stopwords,
#: all-alpha tokens, no symbol runs, 3-10 chars/token)
_PASS_TEXT = "data row " + " ".join(["alpha"] * 20)


def _doc(doc_id: int, lang: str, text: str) -> dict:
    return {
        "doc_id": doc_id,
        "text": text,
        "lang": lang,
        "source": "t",
        "n_chars": len(text),
    }


def test_streaming_curation_clean_stage_kill_replay(spark, tmp_path):
    """Worst window for the chained clean stage: raw sink committed AND
    clean refreshed, checkpoint not advanced.  The replay must see a
    skipped raw append + a noop clean refresh (watermark already at the
    raw head) -- no double-append into clean -- and the chain must keep
    flowing for genuinely new batches afterwards."""
    from docker_airflow_spark_minio_spark.workloads.curation_pipeline import (
        _gopher_clean,
        refresh_clean_stage,
    )

    feed = str(tmp_path / "feed")
    _write_feed(
        feed,
        "b0.json",
        [
            _doc(1, "en", _PASS_TEXT),
            _doc(2, "fr", _PASS_TEXT + " beta"),
            _doc(3, "en", "tiny doc"),  # fails the 20-token floor
        ],
    )
    raw = SnapshotStore(spark, str(tmp_path / "raw"))
    clean = SnapshotStore(spark, str(tmp_path / "clean"))

    def run(hook):
        return run_append_stream(
            spark,
            feed,
            DOC_SCHEMA,
            str(tmp_path / "raw"),
            partition_by=["lang"],
            checkpoint=str(tmp_path / "ckpt"),
            on_batch_commit=hook,
        )

    class Kill(Exception):
        pass

    def refresh_then_die(batch_id: int, version) -> None:
        refresh_clean_stage(raw, clean)
        raise Kill("killed after clean refresh, before checkpoint advance")

    with pytest.raises(Exception):  # StreamingQueryException wrapping Kill
        run(refresh_then_die)
    assert raw.versions() == [0]
    assert clean.versions() == [0]

    # restart with the same checkpoint: batch 0 replays -> raw append
    # skipped, clean refresh noop
    modes: list[str] = []
    run(lambda b, v: modes.append(refresh_clean_stage(raw, clean)))
    assert modes == ["noop"]
    assert raw.versions() == [0]
    assert clean.versions() == [0]  # no double-append
    got = sorted(r["doc_id"] for r in clean.read().collect())
    assert got == [1, 2]  # survivors only, exactly once
    want = _gopher_clean(raw.read()).count()
    assert clean.read().count() == want

    # the opposite window -- crash BEFORE the refresh (raw committed,
    # clean stale): the replayed hook must still refresh, because the
    # mode keys on watermark-vs-head, not on this firing's sink commit
    _write_feed(feed, "b1.json", [_doc(4, "en", _PASS_TEXT + " gamma")])

    def die_before_refresh(batch_id: int, version) -> None:
        raise Kill("killed before the clean refresh")

    with pytest.raises(Exception):
        run(die_before_refresh)
    assert raw.versions() == [0, 1]
    assert clean.watermark("curation_src_version") == 0  # stale

    modes.clear()
    run(lambda b, v: modes.append(refresh_clean_stage(raw, clean)))
    assert modes == ["incremental"]  # replayed batch, live refresh
    got = sorted(r["doc_id"] for r in clean.read().collect())
    assert got == [1, 2, 4]
