"""Executor-built parquet stats sidecars (`snapshots.py`).

Above ``stats_sidecar_threshold`` the per-file zone-map/bloom rows never
reach the driver: executors write them as a parquet sidecar the manifest
references, and ``plan_files`` prunes sidecar-backed directories through
a Spark job that collects only surviving file names.  The contract under
test: the sidecar path makes BIT-IDENTICAL pruning decisions to the
inline-JSON path, survives append/publish/rollback carry-forward, and is
reclaimed by retention exactly like the data dirs it describes.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from docker_airflow_spark_minio_spark.snapshots import (
    STATS_DIR,
    SnapshotStore,
)

INLINE = 10**9  # threshold no sandbox write exceeds -> inline JSON
SIDECAR = 0  # every stats write goes to the sidecar


def _frame(spark, n=400, offset=0):
    return (
        spark.range(offset, offset + n)
        .select(
            F.col("id").cast("int").alias("id"),
            F.concat(F.lit("d"), (F.col("id") % 2).cast("string")).alias("day"),
            (F.col("id") * 7).cast("int").alias("val"),
            F.concat(F.lit("k"), F.col("id").cast("string")).alias("key"),
        )
        .repartition(8)  # many files per partition dir
    )


def _write_pair(spark, tmp_path, **kw):
    stores = {}
    for name, thr in (("inline", INLINE), ("sidecar", SIDECAR)):
        s = SnapshotStore(spark, str(tmp_path / name))
        s.write(
            _frame(spark),
            mode="snapshot",
            partition_by=["day"],
            stats_cols=["val"],
            bloom_cols=["key"],
            stats_sidecar_threshold=thr,
            **kw,
        )
        stores[name] = s
    return stores["inline"], stores["sidecar"]


FILTERS = [
    dict(range_filter=("val", 0, 70)),  # prunes most files
    dict(range_filter=("val", 10**6, 2 * 10**6)),  # prunes everything
    dict(range_filter=("val", -10, 10**6)),  # prunes nothing
    dict(point_filter={"key": "k37"}),  # bloom point hit
    dict(point_filter={"key": "absent-key"}),  # bloom prunes all
    dict(range_filter=("val", 0, 700), point_filter={"key": "k55"}),
    dict(range_filter=("id", 0, 5)),  # no stats for col: inconclusive
    dict(range_filter=("val", "not-an-int", "zz")),  # type mismatch: keep
]


def _plan(store, **kw):
    _, units, n_skip, n_tot = store.plan_files(**kw)
    # normalize: vdir names and part-file UUIDs are attempt-unique;
    # compare by partition and part index (the repartition(8) layout is
    # deterministic, so part-0000N holds the same rows in both stores)
    norm = {}
    for vd, parts in units.items():
        for p, files in parts.items():
            norm.setdefault(p, []).append(
                sorted("-".join(f.split("-")[:2]) for f in files)
                if files is not None
                else None
            )
    for p in norm:
        norm[p].sort(key=lambda x: (x is None, x))
    return norm, n_skip, n_tot


def test_sidecar_prunes_identically_to_inline(spark, tmp_path):
    inline, sidecar = _write_pair(spark, tmp_path)
    m_i = inline._read_manifest(inline.current_version())
    m_s = sidecar._read_manifest(sidecar.current_version())
    # representations are what they claim to be
    assert m_i["file_stats"] and m_i["file_blooms"]
    assert not m_i.get("file_stats_sidecars")
    assert not m_s["file_stats"] and not m_s["file_blooms"]
    assert len(m_s["file_stats_sidecars"]) == 1
    assert os.path.isdir(
        os.path.join(sidecar.root, m_s["file_stats_sidecars"][0]["path"])
    )
    # the dir-level rollup is identical (manifests stay O(directories))
    def _strip_vdir(d):
        return {k.split("/", 1)[1]: v for k, v in d.items()}

    assert _strip_vdir(m_i["dir_stats"]) == _strip_vdir(m_s["dir_stats"])
    assert _strip_vdir(m_i["dir_rows"]) == _strip_vdir(m_s["dir_rows"])
    for kw in FILTERS:
        assert _plan(inline, **kw) == _plan(sidecar, **kw), kw
    # and the filtered reads agree row-for-row
    for kw in (FILTERS[0], FILTERS[3], FILTERS[5]):
        a = sorted(r["id"] for r in inline.read(**kw).collect())
        b = sorted(r["id"] for r in sidecar.read(**kw).collect())
        assert a == b, kw


def test_sidecar_survives_append_and_carry_forward(spark, tmp_path):
    inline, sidecar = _write_pair(spark, tmp_path)
    for s, thr in ((inline, INLINE), (sidecar, SIDECAR)):
        s.write(
            _frame(spark, n=400, offset=1000),
            mode="append",
            partition_by=["day"],
            stats_cols=["val"],
            bloom_cols=["key"],
            stats_sidecar_threshold=thr,
        )
    m_s = sidecar._read_manifest(sidecar.current_version())
    assert len(m_s["file_stats_sidecars"]) == 2  # both commits' sidecars
    for kw in FILTERS:
        assert _plan(inline, **kw) == _plan(sidecar, **kw), kw
    # point lookups hit the right rows through two sidecar generations
    got = sorted(
        r["id"]
        for r in sidecar.read(point_filter={"key": "k1205"}).collect()
    )
    assert got == [1205]


def test_mixed_inline_and_sidecar_commits(spark, tmp_path):
    """A table whose history mixes representations (small commit inline,
    big commit sidecar) plans correctly across both."""
    s = SnapshotStore(spark, str(tmp_path / "mixed"))
    s.write(
        _frame(spark),
        mode="snapshot",
        partition_by=["day"],
        stats_cols=["val"],
        bloom_cols=["key"],
        stats_sidecar_threshold=SIDECAR,
    )
    s.write(
        _frame(spark, n=400, offset=1000),
        mode="append",
        partition_by=["day"],
        stats_cols=["val"],
        bloom_cols=["key"],
        stats_sidecar_threshold=INLINE,
    )
    m = s._read_manifest(s.current_version())
    assert len(m["file_stats_sidecars"]) == 1 and m["file_stats"]
    # a range spanning both generations (so neither dir zone-prunes
    # whole): both generations' stats-bearing files are consulted
    _, units, n_skip, n_tot = s.plan_files(range_filter=("val", 0, 7070))
    assert n_tot == 32 and n_skip > 0
    got = sorted(r["id"] for r in s.read(range_filter=("val", 0, 70)).collect())
    assert got == list(range(11))


def test_sidecar_publish_and_rollback_carry(spark, tmp_path):
    s = SnapshotStore(spark, str(tmp_path / "wap"))
    kw = dict(
        partition_by=["day"],
        stats_cols=["val"],
        bloom_cols=["key"],
        stats_sidecar_threshold=SIDECAR,
    )
    s.write(_frame(spark), mode="snapshot", **kw)
    v1 = s.current_version()
    s.write(_frame(spark, n=400, offset=1000), mode="append", staged="audit1", **kw)
    s.publish_staged("audit1")
    m = s._read_manifest(s.current_version())
    assert len(m["file_stats_sidecars"]) == 2
    got = sorted(r["id"] for r in s.read(point_filter={"key": "k1205"}).collect())
    assert got == [1205]
    s.rollback(v1)
    m = s._read_manifest(s.current_version())
    assert len(m["file_stats_sidecars"]) == 1
    _, _, n_skip, n_tot = s.plan_files(range_filter=("val", 0, 70))
    assert n_tot == 16 and n_skip > 0


def test_sidecar_parity_with_escaped_and_null_partitions(spark, tmp_path):
    """input_file_name() returns a URI: partition dirs with characters
    the path layer escapes ('a b' -> 'a%20b', hive-escaped 'x%3Ay' ->
    'x%253Ay') and the NULL default partition must still produce dkeys
    matching the manifest's on-disk names -- caught in round 8 as a
    pruning (not correctness) regression."""
    df = spark.createDataFrame(
        [(1, "a b", 10), (2, "x:y", 20), (3, None, 30), (4, "a b", 40),
         (5, "p+q", 50)],
        "id INT, day STRING, val INT",
    ).repartition(2)
    stores = {}
    for name, thr in (("inline", INLINE), ("side", SIDECAR)):
        s = SnapshotStore(spark, str(tmp_path / name))
        s.write(df, mode="snapshot", partition_by=["day"],
                stats_cols=["val"], bloom_cols=["id"],
                stats_sidecar_threshold=thr)
        stores[name] = s
    for kw in (
        dict(range_filter=("val", 35, 50)),
        dict(point_filter={"id": 4}),
        dict(range_filter=("val", 45, 60), point_filter={"id": 5}),
    ):
        assert _plan(stores["inline"], **kw) == _plan(stores["side"], **kw), kw
        a = sorted(r["id"] for r in stores["inline"].read(**kw).collect())
        b = sorted(r["id"] for r in stores["side"].read(**kw).collect())
        assert a == b, kw
    # the sidecar genuinely pruned inside the escaped partitions
    _, _, n_skip, n_tot = stores["side"].plan_files(point_filter={"id": 4})
    assert n_tot > 0 and n_skip == n_tot - 1


def test_sidecar_semijoin_filter_arm(spark, tmp_path, monkeypatch):
    """Above _SIDECAR_ISIN_MAX live dirs the dkey filter switches from
    an isin literal list to a broadcast semi-join (plan stays O(1) in
    size at 10^5 directories); both arms must plan identically."""
    s = SnapshotStore(spark, str(tmp_path / "semi"))
    s.write(
        _frame(spark),
        mode="snapshot",
        partition_by=["day"],
        stats_cols=["val"],
        bloom_cols=["key"],
        stats_sidecar_threshold=SIDECAR,
    )
    kw = dict(range_filter=("val", 0, 700), point_filter={"key": "k55"})
    via_isin = _plan(s, **kw)
    monkeypatch.setattr(SnapshotStore, "_SIDECAR_ISIN_MAX", 0)
    assert _plan(s, **kw) == via_isin


def test_sidecar_retention_and_abandon(spark, tmp_path):
    s = SnapshotStore(spark, str(tmp_path / "ret"))
    kw = dict(
        partition_by=["day"],
        stats_cols=["val"],
        bloom_cols=["key"],
        stats_sidecar_threshold=SIDECAR,
    )
    s.write(_frame(spark), mode="snapshot", **kw)
    s.write(_frame(spark, n=400, offset=1000), mode="snapshot", **kw)  # replaces
    sdir = os.path.join(s.root, STATS_DIR)
    assert len(os.listdir(sdir)) == 2
    # default grace: an EXPIRED manifest's sidecar reclaims with its
    # history immediately (like its data dirs), not after the orphan
    # age gate
    out = s.expire_snapshots(keep_last=1)
    assert out["dropped_stats_sidecars"] == 1
    # the survivor still plans through its sidecar
    left = os.listdir(sdir)
    assert len(left) == 1
    _, _, n_skip, n_tot = s.plan_files(point_filter={"key": "k1205"})
    assert n_tot == 16 and n_skip == 15
    # a kept manifest's sidecar is never reclaimed
    out2 = s.expire_snapshots(keep_last=1, orphan_grace_ms=0)
    assert out2["dropped_stats_sidecars"] == 0 and os.listdir(sdir) == left
    # abandoning a staged commit drops its sidecar with its data
    s.write(_frame(spark, n=50, offset=5000), mode="append", staged="bad", **kw)
    assert len(os.listdir(sdir)) == 2
    s.abandon_staged("bad")
    assert sorted(os.listdir(sdir)) == sorted(left)


def test_sidecar_wide_directory_chunked_collect(spark, tmp_path):
    """One directory with >=10^4 stats rows (r8 verdict item 7): the
    planner must stream surviving (dkey, fname) rows instead of
    collecting one giant per-directory array row, and still return the
    exact survivor set, sorted."""
    root = str(tmp_path / "wide")
    store = SnapshotStore(spark, root)
    vdir = "v0-deadbeef"
    n = 12_000
    sdf = spark.range(n).selectExpr(
        f"'{vdir}/day=a' AS dkey",
        "format_string('part-%05d.parquet', id) AS fname",
        "CAST(1 AS BIGINT) AS rows",
        "id AS mn_val",
        "id AS mx_val",
    )
    relpath = f"_stats/{vdir}-stats"
    sdf.write.mode("overwrite").parquet(f"{root}/{relpath}")
    ref = {
        "path": relpath,
        "vdir": vdir,
        "stats_cols": ["val"],
        "bloom_cols": [],
        "bloom_bits": 0,
    }
    out = store._plan_files_sidecar(
        {vdir: ref},
        [(vdir, "day=a")],
        [("val", 100, 199)],
        {},
    )
    total, keep = out[f"{vdir}/day=a"]
    assert total == n
    assert keep == [f"part-{i:05d}.parquet" for i in range(100, 200)]
