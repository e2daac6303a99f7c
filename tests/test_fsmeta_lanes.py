"""The pure-Python local fast lanes in fsmeta must agree with the
Hadoop-FileSystem branch they bypass: same routing decisions, same
results for every primitive, same conflict semantics for the atomic
claim.  The Hadoop branch is forced by monkeypatching ``local_path`` to
decline, so both implementations run against the identical on-disk
tree."""

from __future__ import annotations

import os

import pytest

from docker_airflow_spark_minio_spark import fsmeta
from docker_airflow_spark_minio_spark import snapshots as snap


def test_local_path_routing():
    assert fsmeta.local_path("/tmp/x") == "/tmp/x"
    assert fsmeta.local_path("file:/tmp/x") == "/tmp/x"
    assert fsmeta.local_path("file:///tmp/x") == "/tmp/x"
    assert fsmeta.local_path("file://localhost/tmp/x") == "/tmp/x"
    # non-local authorities and real schemes stay on the Hadoop branch
    assert fsmeta.local_path("file://nas01/tmp/x") is None
    assert fsmeta.local_path("s3a://bucket/k") is None
    assert fsmeta.local_path("hdfs://nn/k") is None
    assert fsmeta.local_path("mockfs://x/k") is None
    assert fsmeta.local_path("mocks3://x/k") is None
    # RELATIVE bare paths resolve against Hadoop's working dir, not the
    # driver CWD -- no fast lane (advisor round 13)
    assert fsmeta.local_path("rel/path") is None
    assert fsmeta.local_path("") is None


def test_lane_declines_bare_paths_on_nonlocal_defaultfs(spark, monkeypatch):
    """When fs.defaultFS is not file:, a scheme-less path names a
    CLUSTER location -- the fast lanes must route it to Hadoop, while
    explicit file: URIs keep the lane (advisor round 13)."""
    assert fsmeta._bare_paths_local(spark) is True  # out-of-the-box
    assert fsmeta._lane(spark, "/tmp/x") == "/tmp/x"
    monkeypatch.setitem(
        fsmeta._DEFAULT_FS_LOCAL, id(spark.sparkContext), False
    )
    assert fsmeta._lane(spark, "/tmp/x") is None
    assert fsmeta._lane(spark, "file:///tmp/x") == "/tmp/x"


@pytest.fixture()
def tree(tmp_path):
    d = tmp_path / "t"
    (d / "sub").mkdir(parents=True)
    (d / "a.txt").write_bytes(b"alpha")
    (d / "sub" / "b.txt").write_bytes(b"bee-content")
    return str(d)


def _hadoop_lane(monkeypatch):
    monkeypatch.setattr(fsmeta, "local_path", lambda uri: None)


def test_primitives_match_hadoop_branch(spark, tree, monkeypatch):
    probes = [tree, f"{tree}/a.txt", f"{tree}/sub", f"{tree}/missing"]
    fast = {
        "exists": [fsmeta.exists(spark, p) for p in probes],
        "prefix_exists": [fsmeta.prefix_exists(spark, p) for p in probes[:3]],
        "stats": [
            (s.total_objects, s.total_bytes)
            for s in (fsmeta.prefix_stats(spark, p) for p in probes[:3])
        ],
        "entries": sorted(
            (e.name, e.is_dir, e.size)
            for e in fsmeta.list_entries(spark, tree)
        ),
        "missing_entries": fsmeta.list_entries(spark, f"{tree}/missing"),
        "read": fsmeta.read_bytes(spark, f"{tree}/a.txt"),
    }
    _hadoop_lane(monkeypatch)
    slow = {
        "exists": [fsmeta.exists(spark, p) for p in probes],
        "prefix_exists": [fsmeta.prefix_exists(spark, p) for p in probes[:3]],
        "stats": [
            (s.total_objects, s.total_bytes)
            for s in (fsmeta.prefix_stats(spark, p) for p in probes[:3])
        ],
        "entries": sorted(
            (e.name, e.is_dir, e.size)
            for e in fsmeta.list_entries(spark, tree)
        ),
        "missing_entries": fsmeta.list_entries(spark, f"{tree}/missing"),
        "read": fsmeta.read_bytes(spark, f"{tree}/a.txt"),
    }
    assert fast == slow


def test_delete_file_both_lanes(spark, tree, monkeypatch):
    assert fsmeta.delete_file(spark, f"{tree}/a.txt") is True
    assert fsmeta.delete_file(spark, f"{tree}/a.txt") is False
    _hadoop_lane(monkeypatch)
    assert fsmeta.delete_file(spark, f"{tree}/sub/b.txt") is True
    assert fsmeta.delete_file(spark, f"{tree}/sub/b.txt") is False


def test_atomic_claim_conflict_both_lanes(spark, tmp_path, monkeypatch):
    """Single-winner semantics and no leaked staging files, on the
    os.link lane AND the Hadoop createLink branch."""
    for lane, force_hadoop in (("fast", False), ("hadoop", True)):
        if force_hadoop:
            monkeypatch.setattr(snap, "local_path", lambda uri: None)
        d = tmp_path / lane
        d.mkdir()
        final, tmp = f"{d}/m.json", f"{d}/.m.tmp"
        snap.write_atomic_claim(spark, final, b"one", tmp, what="t")
        with pytest.raises(snap.SnapshotConflict):
            snap.write_atomic_claim(spark, final, b"two", tmp, what="t")
        assert open(final, "rb").read() == b"one"
        snap.write_atomic_replace(spark, final, b"three", tmp)
        assert open(final, "rb").read() == b"three"
        # the Hadoop branch's checksum FS leaves .crc sidecars for its
        # staging files (pre-existing behavior); no PAYLOAD staging
        # file may leak on either lane
        assert [
            f
            for f in os.listdir(d)
            if f != "m.json" and not f.endswith(".crc")
        ] == []


def test_atomic_claim_oserror_falls_back_to_hadoop(
    spark, tmp_path, monkeypatch
):
    """A filesystem without hard links (os.link raising a generic
    OSError) must not fail the claim outright: the Hadoop branch gets
    one attempt (advisor round 13).  Conflict semantics are preserved
    through the fallback."""
    def _no_link(src, dst):
        raise OSError(95, "Operation not supported")

    monkeypatch.setattr(snap.os, "link", _no_link)
    d = tmp_path / "nolink"
    d.mkdir()
    final, tmp = f"{d}/m.json", f"{d}/.m.tmp"
    snap.write_atomic_claim(spark, final, b"one", tmp, what="t")
    assert open(final, "rb").read() == b"one"
    with pytest.raises(snap.SnapshotConflict):
        snap.write_atomic_claim(spark, final, b"two", tmp, what="t")


def test_expire_grace_zero_reclaims_same_millisecond(
    spark, tmp_path, monkeypatch
):
    """grace 0 ("no in-flight writers") must reclaim an unreferenced
    tmp and an abandoned stage even when expire runs in the very same
    millisecond they were created -- the fast metadata lanes made
    commit+expire sub-millisecond, which flaked the old exclusive age
    bounds (kept same-ms items under grace 0)."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    s = snap.SnapshotStore(spark, root)
    s.write(spark.range(3).select(F.col("id")), mode="snapshot")
    sv = s.write(
        spark.range(3, 5).select(F.col("id")),
        mode="append",
        staged="audit",
    )
    tmp = f"{root}/_manifests/.v9.json.tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write("{}")
    # pin "now" to the exact commit/creation instants: age == 0 ms
    at_ms = snap.SnapshotStore(spark, root)._read_manifest_raw(sv)[
        "committed_at_ms"
    ]
    now_ms = max(at_ms, int(os.stat(tmp).st_mtime * 1000))
    monkeypatch.setattr(snap.time, "time", lambda: now_ms / 1000.0)
    s.expire_snapshots(keep_last=1, orphan_grace_ms=0)
    assert sv not in s.versions()  # age-0 stage reclaimed under grace 0
    assert not os.path.exists(tmp)  # age-0 tmp reclaimed under grace 0


def test_declared_schema_read_parity(spark, tmp_path):
    """_scan with the manifest-declared data schema must return the
    exact schema AND rows footer inference returns -- including the
    partition-type re-inference semantics (numeric-looking string
    partition values come back int on this path) and hidden-partition
    routing dirs, across a schema-evolution epoch."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    df = spark.range(40).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("k"),  # numeric-looking
        (F.col("id") * 2).alias("amt"),
    )
    s = snap.SnapshotStore(spark, root)
    s.write(
        df.where("doc_id < 30"),
        mode="snapshot",
        partition_by=["k", "bucket(4, doc_id)"],
    )
    s.evolve_schema(renames={"amt": "amount"})
    # non-empty post-evolution slice: the appended epoch's files
    # physically carry the RENAMED column, so the declared-schema lane
    # is exercised against a renamed-column dir (advisor round 13: the
    # old `doc_id >= 40` slice was empty, making this leg vacuous)
    s.write(
        df.where("doc_id >= 30").withColumnRenamed("amt", "amount"),
        mode="append",
        partition_by=["k", "bucket(4, doc_id)"],
    )

    declared = s.read()
    d_schema, d_rows = declared.schema, sorted(map(tuple, declared.collect()))

    inferred_store = snap.SnapshotStore(spark, root)
    inferred_store._declared_dir_schema = lambda vd, parts: None
    inferred = inferred_store.read()
    assert inferred.schema == d_schema
    assert sorted(map(tuple, inferred.collect())) == d_rows


def test_eval_transform_many_mixes_pure_and_spark(spark):
    """The batch planner hook serves twin-supported literals without a
    job and still falls back to Spark for the rest; values map back to
    the right inputs either way."""
    import json as _json

    store = snap.SnapshotStore(spark, "/tmp/__unused_eval__")
    spec = {"kind": "bucket", "src": "c", "arg": 8}
    m = {
        "schema": _json.dumps(
            {
                "type": "struct",
                "fields": [
                    {
                        "name": "c",
                        "type": "long",
                        "nullable": True,
                        "metadata": {},
                    }
                ],
            }
        )
    }
    vals = [0, 1, 42, 10**15]
    got = store._eval_transform_many(spec, vals, m)
    want = [store._eval_transform_spark(spec, v, m) for v in vals]
    assert got == want
