"""SQL write path for snapshot tables: the batch writer half of the
``snapshot_table`` Python DataSource (``sources/snapshot_write.py``).

Covers (1) write-through-DataSource == write-through-API parity
(directory naming, manifest shape, read-back through BOTH paths),
(2) the restricted-surface refusals (transforms, spec drift, stale
renamed-away producers), (3) the claim protocol: same-version racer
loses loudly with its data dir reclaimed, and a table that advanced
during the write refuses at commit (lost-update guard), and (4) the
``INSERT INTO`` / ``INSERT OVERWRITE`` statement forms via
``snapshot_sql``.
"""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from docker_airflow_spark_minio_spark.snapshots import (
    SnapshotConflict,
    SnapshotStore,
)
from docker_airflow_spark_minio_spark.sources.snapshot_write import (
    LocalSnapshotCommitter,
    SnapshotTableArrowWriter,
)
from docker_airflow_spark_minio_spark.streaming.table_source import (
    read_snapshot_table,
    snapshot_sql,
    write_snapshot_table,
)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(str(v) for v in r) for r in df.select(*cols).collect()
    )


def test_sql_write_roundtrip_partitioned(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [
            (datetime.date(2024, 1, 1), 1, "a"),
            (datetime.date(2024, 1, 2), 2, "b"),
            (None, 3, "c"),
        ],
        "day date, id long, val string",
    )
    write_snapshot_table(spark, df, root, partition_by=["day"])
    s = SnapshotStore(spark, root)
    assert _rows(s.read()) == _rows(df)
    assert _rows(read_snapshot_table(spark, root)) == _rows(df)
    # partition directory names are the SPARK names (pinned escaping +
    # HIVE_NULL), so an API append to the same value shares the dir key
    s.write(
        spark.createDataFrame(
            [(datetime.date(2024, 1, 2), 4, "d")],
            "day date, id long, val string",
        ),
        mode="append",
        partition_by=["day"],
    )
    m = s._read_manifest(s.current_version())
    assert set(m["partitions"]) == {
        "day=2024-01-01",
        "day=2024-01-02",
        "day=__HIVE_DEFAULT_PARTITION__",
    }
    assert len(m["partitions"]["day=2024-01-02"]) == 2  # SQL + API vdirs
    # and the SQL path reads the mixed table identically to the API
    assert _rows(read_snapshot_table(spark, root)) == _rows(s.read())


def test_sql_write_overwrite_and_metadata(spark, tmp_path):
    root = str(tmp_path / "o")
    write_snapshot_table(
        spark, spark.range(10).selectExpr("id", "id*2 AS amt"), root,
        metadata={"job": "j1"},
    )
    s = SnapshotStore(spark, root)
    meta = s._read_manifest(s.current_version())["metadata"]
    assert meta["job"] == "j1" and meta["sql_write"] is True
    assert meta["n_rows"] == 10
    write_snapshot_table(
        spark, spark.range(3).selectExpr("id", "id AS amt"), root,
        mode="overwrite",
    )
    assert s.read().count() == 3
    assert s._read_manifest(s.current_version())["mode"] == "snapshot"


def test_sql_write_refusals(spark, tmp_path):
    root = str(tmp_path / "r")
    s = SnapshotStore(spark, root)
    s.write(
        spark.range(8).selectExpr("id", "id % 3 AS k"),
        mode="snapshot",
        partition_by=["bucket(4, id)"],
    )
    # transform-partitioned appends are SUPPORTED (round 12); a
    # MISMATCHED restated spec still refuses
    write_snapshot_table(
        spark, spark.range(100, 102).selectExpr("id", "id AS k"), root
    )
    assert s.read().count() == 10
    with pytest.raises(Exception, match="does not evolve"):
        write_snapshot_table(
            spark,
            spark.range(2).selectExpr("id", "id AS k"),
            root,
            partition_by=["bucket(8, id)"],
        )
    root2 = str(tmp_path / "r2")
    s2 = SnapshotStore(spark, root2)
    s2.write(
        spark.range(4).selectExpr("id", "CAST(id AS STRING) AS p"),
        mode="snapshot",
        partition_by=["p"],
    )
    with pytest.raises(Exception, match="does not evolve"):
        write_snapshot_table(
            spark,
            spark.range(2).selectExpr("id", "CAST(id AS STRING) AS p"),
            root2,
            partition_by=["id"],
        )
    # evolved table: stale renamed-away producer refused, current name ok
    root3 = str(tmp_path / "r3")
    s3 = SnapshotStore(spark, root3)
    s3.write(spark.createDataFrame([(1, 10)], "id int, qty int"), mode="snapshot")
    s3.evolve_schema(renames={"qty": "quantity"})
    with pytest.raises(Exception, match="renamed"):
        write_snapshot_table(
            spark, spark.createDataFrame([(2, 20)], "id int, qty int"), root3
        )
    write_snapshot_table(
        spark, spark.createDataFrame([(2, 20)], "id int, quantity int"), root3
    )
    got = {(r["id"], r["quantity"]) for r in s3.read().collect()}
    assert got == {(1, 10), (2, 20)}


def test_claim_conflict_and_advance_guard(spark, tmp_path):
    root = str(tmp_path / "c")
    write_snapshot_table(
        spark, spark.range(5).selectExpr("id"), root
    )
    schema = StructType.fromJson(
        {"type": "struct", "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}}
        ]}
    )
    # two writers plan against the same head
    w1 = SnapshotTableArrowWriter(schema, False, {"path": root})
    w2 = SnapshotTableArrowWriter(schema, False, {"path": root})
    assert w1.version == w2.version == 1
    import pyarrow as pa

    msg1 = w1.write(iter(pa.table({"id": [10]}).to_batches()))
    msg2 = w2.write(iter(pa.table({"id": [20]}).to_batches()))
    w1.commit([msg1])
    loser_dir = w2.data_path
    with pytest.raises(SnapshotConflict):
        w2.commit([msg2])
    assert not os.path.exists(loser_dir)  # loser's data reclaimed
    s = SnapshotStore(spark, root)
    assert sorted(r["id"] for r in s.read().collect()) == [0, 1, 2, 3, 4, 10]
    # advanced-during-write guard: head moves PAST the planned version
    w3 = SnapshotTableArrowWriter(schema, False, {"path": root})
    s.write(spark.range(1).selectExpr("id + 100 AS id"), mode="append")
    s.write(spark.range(1).selectExpr("id + 200 AS id"), mode="append")
    msg3 = w3.write(iter(pa.table({"id": [30]}).to_batches()))
    with pytest.raises(SnapshotConflict, match="advanced"):
        w3.commit([msg3])
    assert 30 not in {r["id"] for r in s.read().collect()}


def test_local_committer_claim_is_linkwise_atomic(tmp_path):
    """The local claim twin: payload fully written before the link, and
    the second claimant of one version loses with SnapshotConflict."""
    root = str(tmp_path / "lc")
    c = LocalSnapshotCommitter.for_root(root)
    c._commit_manifest(0, {"version": 0, "x": 1})
    with pytest.raises(SnapshotConflict):
        c._commit_manifest(0, {"version": 0, "x": 2})
    import json

    assert json.load(open(f"{root}/_manifests/v0.json"))["x"] == 1
    # no tmp litter after either outcome
    assert [
        n for n in os.listdir(f"{root}/_manifests") if n.startswith(".")
    ] == []


def test_insert_into_and_overwrite_via_snapshot_sql(spark, tmp_path):
    src, tgt = str(tmp_path / "src"), str(tmp_path / "tgt")
    SnapshotStore(spark, src).write(
        spark.range(20).selectExpr("id", "id * 2 AS amt"), mode="snapshot"
    )
    write_snapshot_table(
        spark, spark.createDataFrame([(100, 0)], "id long, amt long"), tgt
    )
    res = snapshot_sql(
        spark,
        "INSERT INTO tgt SELECT id, amt FROM src WHERE id >= 15",
        {"src": src, "tgt": tgt},
    ).collect()
    assert res[0]["n_rows"] == 5
    got = sorted(
        r["id"] for r in read_snapshot_table(spark, tgt).collect()
    )
    assert got == [15, 16, 17, 18, 19, 100]
    snapshot_sql(
        spark,
        "INSERT OVERWRITE tgt SELECT id, amt FROM src WHERE id < 3",
        {"src": src, "tgt": tgt},
    ).collect()
    assert SnapshotStore(spark, tgt).read().count() == 3
    with pytest.raises(ValueError, match="INSERT target"):
        snapshot_sql(spark, "INSERT INTO nope SELECT 1", {"src": src})


def test_vectorized_transform_twins_match_scalar_pins():
    """The numpy-vectorized bucket/truncate/time twins equal the
    scalar eval_transform_pure (itself JVM-pinned) over adversarial
    values -- the bit-exactness the SQL write path's routing needs."""
    import datetime as dt

    import numpy as np
    import pyarrow as pa

    from docker_airflow_spark_minio_spark.sources.snapshot_batch import (
        eval_transform_pure,
    )
    from docker_airflow_spark_minio_spark.sources.snapshot_write import (
        derive_transform_column,
    )

    cases = [
        ({"kind": "bucket", "src": "c", "arg": 8}, "long", pa.int64(),
         [0, 1, -1, 42, 2**62, -(2**62), 123456789012345, None]),
        ({"kind": "bucket", "src": "c", "arg": 16}, "integer", pa.int32(),
         [0, 7, -7, 2**31 - 1, -(2**31), None]),
        ({"kind": "bucket", "src": "c", "arg": 8}, "string", pa.string(),
         ["", "k", "key-0042", "日本", None]),
        ({"kind": "bucket", "src": "c", "arg": 4}, "date", pa.date32(),
         [dt.date(2024, 1, 2), dt.date(1969, 12, 31), None]),
        ({"kind": "truncate", "src": "c", "arg": 10}, "long", pa.int64(),
         [0, 5, 10, 99, -1, -10, -11, None]),
        ({"kind": "truncate", "src": "c", "arg": 3}, "string", pa.string(),
         ["", "ab", "abcdef", "日本語テキスト", None]),
        ({"kind": "years", "src": "c"}, "date", pa.date32(),
         [dt.date(1969, 6, 1), dt.date(2024, 12, 31), None]),
        ({"kind": "months", "src": "c"}, "date", pa.date32(),
         [dt.date(1969, 6, 1), dt.date(2024, 2, 29), None]),
        ({"kind": "days", "src": "c"}, "date", pa.date32(),
         [dt.date(1969, 12, 31), dt.date(2024, 1, 2), None]),
    ]
    for spec, ftype, patype, values in cases:
        got = derive_transform_column(
            pa.array(values, type=patype), ftype, spec
        ).to_pylist()
        for v, g in zip(values, got):
            if v is None:
                if spec["kind"] == "bucket":
                    # Spark xxhash64(NULL) -> the seed (42)
                    assert g == 42 % spec["arg"], (spec, ftype)
                else:
                    assert g is None, (spec, ftype)
            else:
                assert g == eval_transform_pure(spec, v, ftype), (
                    spec, ftype, v, g,
                )
    # wide randomized sweep on the hash lanes
    rng = np.random.default_rng(7)
    longs = rng.integers(-(2**62), 2**62, size=500).tolist()
    got = derive_transform_column(
        pa.array(longs, type=pa.int64()), "long",
        {"kind": "bucket", "src": "c", "arg": 32},
    ).to_pylist()
    spec = {"kind": "bucket", "src": "c", "arg": 32}
    assert got == [eval_transform_pure(spec, v, "long") for v in longs]


def test_sql_write_hidden_partitioning_parity(spark, tmp_path):
    """SQL writes to a transform-partitioned table route rows into
    EXACTLY the directories the API path would (bit-exact xxhash
    routing), so point-filter pruning finds every SQL-written row; a
    null source value routes like Spark's xxhash64(NULL)."""
    import json

    api_root = str(tmp_path / "api")
    sql_root = str(tmp_path / "sql")
    df = spark.createDataFrame(
        [(i, f"L{i % 3}", float(i)) for i in range(100)] + [(None, "LX", -1.0)],
        "doc_id long, lang string, score double",
    )
    spec = ["lang", "bucket(8, doc_id)"]
    SnapshotStore(spark, api_root).write(
        df, mode="snapshot", partition_by=spec
    )
    write_snapshot_table(spark, df, sql_root, mode="append",
                         partition_by=spec)
    sa = SnapshotStore(spark, api_root)
    sb = SnapshotStore(spark, sql_root)
    ma = sa._read_manifest(sa.current_version())
    mb = sb._read_manifest(sb.current_version())
    assert set(ma["partitions"]) == set(mb["partitions"])  # same dirs
    assert ma["partition_transforms"] == mb["partition_transforms"]
    assert json.loads(ma["schema"]) == json.loads(mb["schema"])
    # point-filter pruned reads agree row-for-row (the pruning the
    # routing must serve)
    for probe in (0, 17, 55, 99):
        ga = {tuple(r) for r in sa.read(point_filter={"doc_id": probe}).collect()}
        gb = {tuple(r) for r in sb.read(point_filter={"doc_id": probe}).collect()}
        assert ga == gb and len(ga) == 1, probe
    assert _rows(sb.read()) == _rows(sa.read())
    # append via SQL restating the spec; then an API append interleaves
    write_snapshot_table(
        spark,
        spark.createDataFrame([(1000, "L1", 5.0)],
                              "doc_id long, lang string, score double"),
        sql_root,
    )
    sb.write(
        spark.createDataFrame([(2000, "L2", 6.0)],
                              "doc_id long, lang string, score double"),
        mode="append", partition_by=spec,
    )
    got = sb.read(point_filter={"doc_id": [1000, 2000]})
    assert {r["doc_id"] for r in got.collect()} == {1000, 2000}
    # caller-supplied derived column is replaced, never trusted
    poisoned = spark.createDataFrame(
        [(3000, "L0", 7.0, 999)],
        "doc_id long, lang string, score double, doc_id_bucket_8 int",
    )
    write_snapshot_table(spark, poisoned, sql_root)
    assert sb.read(point_filter={"doc_id": 3000}).count() == 1
    cols = sb.read().columns
    assert "doc_id_bucket_8" not in cols
    # unsupported transform source refuses toward the API
    with pytest.raises(Exception, match="not supported by the SQL write"):
        write_snapshot_table(
            spark,
            spark.createDataFrame([(1.5, 1)], "x double, y long"),
            str(tmp_path / "bad"),
            partition_by=["bucket(4, x)"],
        )


def test_sql_write_then_mor_delete_sequence(spark, tmp_path):
    """Sequence-number semantics hold across mixed writers: an equality
    delete older than a SQL append does not mask the re-added key."""
    root = str(tmp_path / "seq")
    write_snapshot_table(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        root,
    )
    s = SnapshotStore(spark, root)
    s.delete_keys(spark.createDataFrame([(1,)], "id long"), ["id"])
    write_snapshot_table(
        spark, spark.createDataFrame([(1, "re")], "id long, v string"), root
    )
    assert {(r["id"], r["v"]) for r in s.read().collect()} == {
        (1, "re"),
        (2, "b"),
    }
    assert _rows(read_snapshot_table(spark, root)) == _rows(s.read())


def test_sql_write_hours_transform_parity(spark, tmp_path):
    """Round 13: hours() over tz-aware timestamps on the SQL write
    path routes bit-identically with Catalyst's expression (Arrow's
    int64 is the session-independent UTC instant; the twin mirrors the
    double math exactly) -- pinned over exact hour boundaries, +/-1
    micro, pre-1970 instants, and NULL, under a non-UTC check via the
    recorded integer dir values.  timestamp_ntz sources still refuse
    (their wall-time interpretation is session-entangled)."""
    from pyspark.sql import functions as F

    bases = [
        0,
        3_600_000_000,
        -3_600_000_000,
        1_700_000_000_000_000,
        1_678_669_200_000_000,
    ]
    vals = sorted({b + d for b in bases for d in (-1, 0, 1)})
    df = (
        spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "id INT, micros LONG"
        )
        .withColumn("ts", F.timestamp_micros(F.col("micros")))
        .drop("micros")
    )
    api_root, sql_root = str(tmp_path / "api"), str(tmp_path / "sql")
    SnapshotStore(spark, api_root).write(
        df, mode="snapshot", partition_by=["hours(ts)"]
    )
    write_snapshot_table(
        spark, df, sql_root, mode="overwrite", partition_by=["hours(ts)"]
    )
    sa, sb = SnapshotStore(spark, api_root), SnapshotStore(spark, sql_root)
    ma = sa._read_manifest(sa.current_version())
    mb = sb._read_manifest(sb.current_version())
    assert set(ma["partitions"]) == set(mb["partitions"])
    assert ma["partition_transforms"] == mb["partition_transforms"]
    a = sorted((r["id"], str(r["ts"])) for r in sa.read().collect())
    b = sorted((r["id"], str(r["ts"])) for r in sb.read().collect())
    assert a == b
    # NULL instant routes to the same (default) partition on both paths
    nulls = spark.createDataFrame([(99, None)], "id INT, ts TIMESTAMP")
    SnapshotStore(spark, api_root).write(
        nulls, mode="append", partition_by=["hours(ts)"]
    )
    write_snapshot_table(spark, nulls, sql_root, mode="append")
    pa_ = {p for p in sa._read_manifest(1)["partitions"]}
    pb_ = {p for p in sb._read_manifest(1)["partitions"]}
    assert pa_ == pb_
    # ntz refuses toward the API path
    with pytest.raises(Exception, match="not supported by the SQL write"):
        write_snapshot_table(
            spark,
            df.withColumn("ts", F.col("ts").cast("timestamp_ntz")),
            str(tmp_path / "ntz"),
            mode="overwrite",
            partition_by=["hours(ts)"],
        )
