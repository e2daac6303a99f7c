"""Manifest NDV sketches + ANALYZE-less join planning
(snapshots.write(ndv_cols=...), plans/join_stats.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docker_airflow_spark_minio_spark.plans import physical_plan
from docker_airflow_spark_minio_spark.plans.join_stats import (
    join_snapshot_tables,
    plan_snapshot_join,
)
from docker_airflow_spark_minio_spark.snapshots import SnapshotStore


@pytest.fixture()
def no_auto_broadcast(spark):
    """Disable Spark's own size-based auto-broadcast so any broadcast
    in the plan is attributable to OUR manifest-stats decision."""
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    yield spark
    spark.conf.set(key, old)


def _facts(spark, root, n=5000):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("dim_id"),
        (F.col("id") * 3).alias("val"),
    )
    s = SnapshotStore(spark, root)
    s.write(df, mode="snapshot", stats_cols=["k"], ndv_cols=["dim_id"])
    return s


def _dim(spark, root, n=97):
    df = spark.range(n).select(
        F.col("id").alias("dim_id"),
        F.concat(F.lit("name-"), F.col("id")).alias("name"),
    )
    s = SnapshotStore(spark, root)
    s.write(df, mode="snapshot", stats_cols=["dim_id"], ndv_cols=["dim_id"])
    return s


def test_ndv_sketch_estimates_and_merges(spark, tmp_path):
    root = str(tmp_path / "t")
    s = SnapshotStore(spark, root)
    df = spark.range(1000).select(
        (F.col("id") % 300).alias("u"), F.col("id").alias("k")
    )
    s.write(df, mode="snapshot", stats_cols=["k"], ndv_cols=["u", "k"])
    assert abs(s.column_ndv("u") - 300) <= 15  # HLL ~2% at lgK 12
    assert abs(s.column_ndv("k") - 1000) <= 50
    assert s.column_ndv("missing") is None
    # append MERGES: 200 new distinct u values
    s.write(
        spark.range(1000, 1200).select(
            F.col("id").alias("u"), F.col("id").alias("k")
        ),
        mode="append",
        ndv_cols=["u", "k"],
    )
    assert abs(s.column_ndv("u") - 500) <= 25
    # full replace RESTARTS the sketch
    s.write(
        spark.range(10).select(F.col("id").alias("u"), F.col("id").alias("k")),
        mode="snapshot",
        stats_cols=["k"],
        ndv_cols=["u"],
    )
    assert s.column_ndv("u") <= 11
    # time travel reads the old sketch
    assert s.column_ndv("u", as_of=1) > 400


def test_ndv_invalidated_by_unsketched_data_commits(spark, tmp_path):
    """A data commit that skips ndv_cols INVALIDATES the sketch (a
    stale estimate is worse than none); masking-only deletes keep it
    as an upper bound; compaction (data-identical) keeps it too."""
    s = SnapshotStore(spark, str(tmp_path / "t"))
    df = spark.range(500).select(
        (F.col("id") % 50).alias("u"), F.col("id").alias("k")
    )
    s.write(df, mode="snapshot", stats_cols=["k"], ndv_cols=["u"])
    assert abs(s.column_ndv("u") - 50) <= 5
    # masking-only delete: sketch survives (upper bound)
    s.delete_keys(spark.createDataFrame([(1,)], "k long"), ["k"])
    assert abs(s.column_ndv("u") - 50) <= 5
    # compaction: data-identical, sketch survives
    s.compact(all_partitions=True)
    assert abs(s.column_ndv("u") - 50) <= 5
    # unsketched append: sketch dropped (would under-count the batch)
    s.write(
        spark.range(5000, 5400).select(
            F.col("id").alias("u"), F.col("id").alias("k")
        ),
        mode="append",
        stats_cols=["k"],
    )
    assert s.column_ndv("u") is None
    # update_where rewrites values -> sketch (re-added) dropped again
    s.write(df, mode="snapshot", stats_cols=["k"], ndv_cols=["u"])
    s.update_where(F.col("k") == 5, {"u": F.lit(999)})
    assert s.column_ndv("u") is None


def test_join_flips_smj_to_broadcast_from_manifest_stats(
    no_auto_broadcast, tmp_path
):
    spark = no_auto_broadcast
    facts = _facts(spark, str(tmp_path / "facts"))
    dim = _dim(spark, str(tmp_path / "dim"))

    joined, decision = join_snapshot_tables(facts, dim, "dim_id")
    assert decision.strategy == "broadcast_right", decision
    assert decision.right.rows == 97 and decision.left.rows == 5000
    assert "BroadcastHashJoin" in physical_plan(joined)
    assert joined.count() == 5000

    # threshold 0: the SAME tables stay on the shuffle path
    joined2, decision2 = join_snapshot_tables(
        facts, dim, "dim_id", broadcast_threshold_rows=0
    )
    assert decision2.strategy == "shuffle"
    assert "SortMergeJoin" in physical_plan(joined2)
    assert "BroadcastHashJoin" not in physical_plan(joined2)

    # output estimate: 5000 * 97 / max(ndv) ~ 5000
    assert decision.est_output_rows is not None
    assert abs(decision.est_output_rows - 5000) <= 300


def _strip_dir_bytes(store: SnapshotStore) -> None:
    """Simulate a pre-round-12 table: remove the recorded byte sums
    from every manifest (deltas and checkpoints)."""
    import json

    for v in store.versions():
        path = store._manifest_path(v)
        m = json.loads(open(path).read())
        m.pop("dir_bytes", None)
        m.pop("dir_bytes_added", None)
        open(path, "w").write(json.dumps(m))


def test_unknown_rows_never_broadcast_without_bytes(spark, tmp_path):
    """Live MoR delete sets make row counts unprovable.  With recorded
    BYTE sums, physical bytes upper-bound the masked build side and may
    still approve the broadcast; WITHOUT them (pre-round-12 manifests),
    NDV (a lower bound) can refuse a broadcast but never approve one."""
    s = _facts(spark, str(tmp_path / "facts"), n=3000)
    dim = SnapshotStore(spark, str(tmp_path / "dim"))
    dim.write(
        spark.range(50).select(
            F.col("id").alias("dim_id"), F.col("id").alias("x")
        ),
        mode="snapshot",
        stats_cols=["dim_id"],
        ndv_cols=["dim_id"],
    )
    dim.delete_keys(spark.createDataFrame([(1,)], "dim_id long"), ["dim_id"])
    assert dim.count_rows() is None
    # bytes recorded and tiny: the masked build side is upper-bounded
    # by physical bytes -> broadcast is sound and taken
    assert dim.count_bytes() is not None
    d = plan_snapshot_join(s, dim, "dim_id", broadcast_threshold_rows=1000)
    assert d.strategy == "broadcast_right", d
    # pre-round-12 table (no byte sums): rows unknowable, bytes
    # unrecorded -- NDV alone must not approve a broadcast
    _strip_dir_bytes(dim)
    assert dim.count_bytes() is None
    d2 = plan_snapshot_join(s, dim, "dim_id", broadcast_threshold_rows=1000)
    assert d2.strategy == "shuffle" and "unprovable" in d2.reason


def test_wide_rows_refuse_row_approved_broadcast(
    no_auto_broadcast, tmp_path
):
    """The round-12 byte statistic: a WIDE-ROW dimension whose row
    count is comfortably under the row threshold is refused by its
    manifest byte sum (Spark's broadcast threshold is bytes), and the
    executed plan stays on the shuffle path; raising the byte
    threshold flips it back."""
    spark = no_auto_broadcast
    facts = _facts(spark, str(tmp_path / "facts"), n=5000)
    dim = SnapshotStore(spark, str(tmp_path / "dim"))
    # ~200 rows x ~250 KB of DISTINCT hash text (repeats would
    # compress away in parquet and defeat the byte gate)
    wide = spark.range(200).select(
        (F.col("id") % 97).alias("dim_id"),
        F.expr(
            "concat_ws('', transform(sequence(0, 1999), "
            "i -> sha2(concat(cast(id AS STRING), '-', "
            "cast(i AS STRING)), 512)))"
        ).alias("fat"),
    )
    dim.write(wide, mode="snapshot", stats_cols=["dim_id"],
              ndv_cols=["dim_id"])
    nbytes = dim.count_bytes()
    assert nbytes is not None and nbytes > 10 * 1024 * 1024
    assert dim.count_rows() == 200  # row gate alone would approve
    # row threshold 1000 keeps the 5000-row fact side off the
    # broadcast path, isolating the wide dimension's byte veto
    joined, d = join_snapshot_tables(
        facts, dim, "dim_id", broadcast_threshold_rows=1000
    )
    assert d.strategy == "shuffle", d
    assert "bytes" in d.reason and "wide rows" in d.reason
    assert "BroadcastHashJoin" not in physical_plan(joined)
    # an explicit fatter byte budget approves it again
    _j2, d2 = join_snapshot_tables(
        facts, dim, "dim_id",
        broadcast_threshold_rows=1000,
        broadcast_threshold_bytes=200 * 1024 * 1024,
    )
    assert d2.strategy == "broadcast_right", d2


def test_count_bytes_manifest_accounting(spark, tmp_path):
    """dir_bytes: exact vs the on-disk files, carried across appends
    and partition overwrites, survives delta folding and time travel."""
    import os

    root = str(tmp_path / "t")
    s = SnapshotStore(spark, root)
    df = spark.range(100).select(
        (F.col("id") % 2).cast("string").alias("p"), F.col("id").alias("v")
    )
    s.write(df, mode="snapshot", partition_by=["p"])

    def disk_bytes() -> int:
        total = 0
        m = s._read_manifest(s.current_version())
        for part, vds in m["partitions"].items():
            for vd in vds:
                d = f"{root}/data/{vd}/{part}"
                total += sum(
                    os.path.getsize(f"{d}/{f}")
                    for f in os.listdir(d)
                    if f.endswith(".parquet")
                )
        return total

    assert s.count_bytes() == disk_bytes() > 0
    v0_bytes = s.count_bytes()
    s.write(
        spark.createDataFrame([("0", 999)], "p string, v long"),
        mode="append", partition_by=["p"],
    )
    assert s.count_bytes() == disk_bytes() > v0_bytes
    s.write(
        spark.createDataFrame([("1", 1)], "p string, v long"),
        mode="overwrite_partitions", partition_by=["p"],
    )
    assert s.count_bytes() == disk_bytes()
    assert s.count_bytes(as_of=0) == v0_bytes  # time travel


def test_skew_hint_on_shuffle_decisions(spark, tmp_path):
    """rows/ndv from the manifest sketches flags skew-prone shuffle
    keys (the salting / AQE-skew-split signal) without any data scan."""
    skewed = SnapshotStore(spark, str(tmp_path / "sk"))
    skewed.write(
        spark.range(20000).select(
            (F.col("id") % 5).alias("dim_id"), F.col("id").alias("v")
        ),
        mode="snapshot",
        stats_cols=["v"],
        ndv_cols=["dim_id"],
    )
    def _uniform(root):
        s = SnapshotStore(spark, root)
        s.write(
            spark.range(20000).select(
                F.col("id").alias("dim_id"), F.col("id").alias("v")
            ),
            mode="snapshot",
            stats_cols=["v"],
            ndv_cols=["dim_id"],
        )
        return s

    other = _uniform(str(tmp_path / "f"))
    d = plan_snapshot_join(skewed, other, "dim_id", broadcast_threshold_rows=100)
    assert d.strategy == "shuffle"
    assert d.skew_hint is not None and "left" in d.skew_hint
    assert d.left.skew_factor is not None and d.left.skew_factor > 1000
    # well-distributed keys on BOTH sides carry no hint
    d2 = plan_snapshot_join(
        _uniform(str(tmp_path / "f2")),
        other,
        "dim_id",
        broadcast_threshold_rows=100,
    )
    assert d2.skew_hint is None
