"""Multi-table atomic transactions (`transactions.py`).

The contract under test: after the WAL claim the transaction applies to
EVERY table (crash -> roll-forward), before it to NONE (crash -> orphan
roll-back); staged writes are invisible until the decision; readers can
get a cross-table-consistent pin.
"""

from __future__ import annotations

import pytest

from docker_airflow_spark_minio_spark import transactions as tx
from docker_airflow_spark_minio_spark.snapshots import (
    SnapshotConflict,
    SnapshotStore,
)

SCHEMA = "id INT, day STRING, amt INT"


@pytest.fixture
def roots(tmp_path):
    return (
        str(tmp_path / "txlog"),
        str(tmp_path / "silver"),
        str(tmp_path / "gold"),
    )


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _ids(store):
    return sorted(r["id"] for r in store.read().collect())


def _seed(spark, roots):
    silver = SnapshotStore(spark, roots[1])
    gold = SnapshotStore(spark, roots[2])
    silver.write(_df(spark, [(1, "d1", 10)]), mode="snapshot", partition_by=["day"])
    gold.write(_df(spark, [(100, "d1", 1)]), mode="snapshot", partition_by=["day"])
    return silver, gold


def test_commit_all_or_nothing_visibility(spark, roots):
    silver, gold = _seed(spark, roots)
    t = tx.MultiTableTransaction(spark, roots[0])
    t.write(silver, _df(spark, [(2, "d2", 20)]), mode="append", partition_by=["day"])
    t.write(gold, _df(spark, [(200, "d2", 2)]), mode="append", partition_by=["day"])
    # staged: invisible on BOTH tables
    assert _ids(silver) == [1] and _ids(gold) == [100]
    t.commit()
    assert _ids(silver) == [1, 2] and _ids(gold) == [100, 200]
    # terminal: no further use
    with pytest.raises(ValueError, match="finished"):
        t.commit()


def test_abort_rolls_back_everything(spark, roots):
    silver, gold = _seed(spark, roots)
    t = tx.MultiTableTransaction(spark, roots[0])
    t.write(silver, _df(spark, [(2, "d2", 20)]), mode="append", partition_by=["day"])
    t.write(gold, _df(spark, [(200, "d2", 2)]), mode="append", partition_by=["day"])
    t.abort()
    assert _ids(silver) == [1] and _ids(gold) == [100]
    assert silver.staged_versions() == {} and gold.staged_versions() == {}


def test_crash_mid_publish_rolls_forward(spark, roots, monkeypatch):
    silver, gold = _seed(spark, roots)
    t = tx.MultiTableTransaction(spark, roots[0])
    t.write(silver, _df(spark, [(2, "d2", 20)]), mode="append", partition_by=["day"])
    t.write(gold, _df(spark, [(200, "d2", 2)]), mode="append", partition_by=["day"])

    real = tx._publish_all

    def _crash_after_first(spark_, roots_, wap, heads=None):
        real(spark_, roots_[:1], wap)
        raise RuntimeError("simulated coordinator crash")

    monkeypatch.setattr(tx, "_publish_all", _crash_after_first)
    with pytest.raises(RuntimeError, match="simulated"):
        t.commit()
    monkeypatch.setattr(tx, "_publish_all", real)

    # exactly one table published -- the inconsistent window recover()
    # exists to close
    published = [s for s in (silver, gold) if len(_ids(s)) == 2]
    assert len(published) == 1
    out = tx.recover(spark, roots[0])
    assert out["rolled_forward"] == [t.txn_id]
    assert _ids(silver) == [1, 2] and _ids(gold) == [100, 200]
    # idempotent: second recover is a no-op
    out2 = tx.recover(spark, roots[0])
    assert out2["rolled_forward"] == [] and out2["already_terminal"] == 1


def test_abort_refuses_after_claim(spark, roots, monkeypatch):
    silver, gold = _seed(spark, roots)
    t = tx.MultiTableTransaction(spark, roots[0])
    t.write(silver, _df(spark, [(2, "d2", 20)]), mode="append", partition_by=["day"])

    real = tx._publish_all

    def _boom(spark_, roots_, wap, heads=None):
        raise RuntimeError("crash before any publish")

    monkeypatch.setattr(tx, "_publish_all", _boom)
    with pytest.raises(RuntimeError):
        t.commit()
    monkeypatch.setattr(tx, "_publish_all", real)
    with pytest.raises(SnapshotConflict, match="recover"):
        t.abort()
    tx.recover(spark, roots[0])
    assert _ids(silver) == [1, 2]


def test_abort_orphans_grace_gated(spark, roots):
    silver, gold = _seed(spark, roots)
    t = tx.MultiTableTransaction(spark, roots[0])
    t.write(silver, _df(spark, [(2, "d2", 20)]), mode="append", partition_by=["day"])
    # no WAL record exists (coordinator died before deciding)
    # young: the default grace keeps it
    assert tx.abort_orphans(spark, roots[0], [roots[1], roots[2]]) == []
    assert silver.staged_versions() != {}
    # grace 0: swept
    dropped = tx.abort_orphans(
        spark, roots[0], [roots[1], roots[2]], grace_ms=0
    )
    assert dropped == [f"{roots[1]}::{t.wap}"]
    assert silver.staged_versions() == {}
    assert _ids(silver) == [1]


def test_orphan_sweep_spares_claimed_txns(spark, roots, monkeypatch):
    silver, gold = _seed(spark, roots)
    t = tx.MultiTableTransaction(spark, roots[0])
    t.write(silver, _df(spark, [(2, "d2", 20)]), mode="append", partition_by=["day"])

    real = tx._publish_all

    def _boom(spark_, roots_, wap, heads=None):
        raise RuntimeError("crash")

    monkeypatch.setattr(tx, "_publish_all", _boom)
    with pytest.raises(RuntimeError):
        t.commit()
    monkeypatch.setattr(tx, "_publish_all", real)
    # WAL exists (committing): the sweep must NOT touch it even at
    # grace 0 -- it carries a roll-forward obligation
    assert tx.abort_orphans(spark, roots[0], [roots[1]], grace_ms=0) == []
    tx.recover(spark, roots[0])
    assert _ids(silver) == [1, 2]


def test_consistent_read_pins_and_blocks(spark, roots, monkeypatch):
    silver, gold = _seed(spark, roots)
    t = tx.MultiTableTransaction(spark, roots[0])
    t.write(silver, _df(spark, [(2, "d2", 20)]), mode="append", partition_by=["day"])
    t.write(gold, _df(spark, [(200, "d2", 2)]), mode="append", partition_by=["day"])
    t.commit()
    frames = tx.consistent_read(spark, roots[0], [roots[1], roots[2]])
    assert sorted(r["id"] for r in frames[roots[1]].collect()) == [1, 2]
    assert sorted(r["id"] for r in frames[roots[2]].collect()) == [100, 200]

    # a stuck 'committing' record overlapping the tables blocks the read
    t2 = tx.MultiTableTransaction(spark, roots[0])
    t2.write(silver, _df(spark, [(3, "d3", 30)]), mode="append", partition_by=["day"])

    real = tx._publish_all

    def _boom(spark_, roots_, wap, heads=None):
        raise RuntimeError("crash")

    monkeypatch.setattr(tx, "_publish_all", _boom)
    with pytest.raises(RuntimeError):
        t2.commit()
    monkeypatch.setattr(tx, "_publish_all", real)
    with pytest.raises(SnapshotConflict, match="recover"):
        tx.consistent_read(
            spark, roots[0], [roots[1]], retries=2, wait_s=0.05
        )
    tx.recover(spark, roots[0])
    frames = tx.consistent_read(spark, roots[0], [roots[1]])
    assert sorted(r["id"] for r in frames[roots[1]].collect()) == [1, 2, 3]


def test_expire_txns_keeps_committing(spark, roots, monkeypatch):
    silver, gold = _seed(spark, roots)
    t = tx.MultiTableTransaction(spark, roots[0])
    t.write(silver, _df(spark, [(2, "d2", 20)]), mode="append", partition_by=["day"])
    t.commit()
    # terminal + old enough -> expired
    assert tx.expire_txns(spark, roots[0], keep_ms=0) == 1
    assert tx._list_txns(spark, roots[0]) == []

    t2 = tx.MultiTableTransaction(spark, roots[0])
    t2.write(silver, _df(spark, [(3, "d3", 30)]), mode="append", partition_by=["day"])

    def _boom(spark_, roots_, wap, heads=None):
        raise RuntimeError("crash")

    monkeypatch.setattr(tx, "_publish_all", _boom)
    with pytest.raises(RuntimeError):
        t2.commit()
    # committing records carry an obligation: never expired
    assert tx.expire_txns(spark, roots[0], keep_ms=0) == 0
    assert len(tx._list_txns(spark, roots[0])) == 1


def test_write_restrictions(spark, roots):
    silver, gold = _seed(spark, roots)
    t = tx.MultiTableTransaction(spark, roots[0])
    # a full replace can refuse at publish time -> rejected at write time
    with pytest.raises(ValueError, match="full"):
        t.write(silver, _df(spark, [(2, "d2", 20)]), mode="snapshot",
                partition_by=["day"])
    t.write(silver, _df(spark, [(2, "d2", 20)]), mode="append",
            partition_by=["day"])
    # one write per table: a crash between two same-table cherry-picks
    # would strand the second stage
    with pytest.raises(ValueError, match="one write per table"):
        t.write(silver, _df(spark, [(3, "d3", 30)]), mode="append",
                partition_by=["day"])
    t.abort()


def test_commit_survives_concurrent_main_append(spark, roots):
    """The reason for the append-only restriction: another writer moves
    a table's head between stage and commit, and the publish must merge
    (replay), never refuse -- a claimed txn has no abort path."""
    silver, gold = _seed(spark, roots)
    t = tx.MultiTableTransaction(spark, roots[0])
    t.write(silver, _df(spark, [(2, "d2", 20)]), mode="append", partition_by=["day"])
    t.write(gold, _df(spark, [(200, "d2", 2)]), mode="append", partition_by=["day"])
    # independent writer advances silver AFTER the stage
    silver.write(_df(spark, [(5, "d5", 50)]), mode="append", partition_by=["day"])
    t.commit()
    assert _ids(silver) == [1, 2, 5]
    assert _ids(gold) == [100, 200]


def test_orphan_sweep_spares_torn_wal_records(spark, roots, monkeypatch):
    """Protection against the sweep derives from WAL FILENAMES: a record
    caught torn mid-write parses as absent, but its stages must NOT be
    rolled back -- recover() owes them a roll-forward."""
    silver, gold = _seed(spark, roots)
    t = tx.MultiTableTransaction(spark, roots[0])
    t.write(silver, _df(spark, [(2, "d2", 20)]), mode="append", partition_by=["day"])

    real = tx._publish_all

    def _boom(spark_, roots_, wap, heads=None):
        raise RuntimeError("crash")

    monkeypatch.setattr(tx, "_publish_all", _boom)
    with pytest.raises(RuntimeError):
        t.commit()
    monkeypatch.setattr(tx, "_publish_all", real)
    # corrupt the WAL record in place (simulated torn write)
    import glob
    import os

    path = glob.glob(os.path.join(roots[0], "_txns", "*.json"))[0]
    with open(path, "w") as fh:
        fh.write('{"txn_id": "trunc')
    # parses as absent...
    assert tx._list_txns(spark, roots[0]) == []
    # ...but the filename still shields the stages
    assert tx.abort_orphans(spark, roots[0], [roots[1]], grace_ms=0) == []
    assert silver.staged_versions() != {}


def test_overwrite_txn_commits_atomically(spark, roots):
    """A mixed transaction (overwrite on silver, append on gold)
    commits all-or-nothing, and the WAL records the claimed
    partitions."""
    silver, gold = _seed(spark, roots)
    silver.write(_df(spark, [(2, "d2", 20)]), mode="append",
                 partition_by=["day"])
    t = tx.MultiTableTransaction(spark, roots[0])
    t.write(silver, _df(spark, [(9, "d1", 90)]),
            mode="overwrite_partitions", partition_by=["day"])
    t.write(gold, _df(spark, [(200, "d2", 2)]), mode="append",
            partition_by=["day"])
    assert _ids(silver) == [1, 2]  # staged: invisible
    t.commit()
    assert _ids(silver) == [2, 9]  # d1 replaced, d2 untouched
    assert _ids(gold) == [100, 200]
    rec = tx._list_txns(spark, roots[0])[0]
    assert rec["table_modes"][roots[1]] == "overwrite_partitions"
    assert rec["overwrite_claims"][roots[1]] == ["day=d1"]


def test_overwrite_txn_conflict_detected_before_claim(spark, roots):
    """A concurrent commit touching a CLAIMED partition between stage
    and commit surfaces as SnapshotConflict BEFORE the WAL claim --
    abort stays possible and no table moved."""
    silver, gold = _seed(spark, roots)
    t = tx.MultiTableTransaction(spark, roots[0])
    t.write(silver, _df(spark, [(9, "d1", 90)]),
            mode="overwrite_partitions", partition_by=["day"])
    # concurrent writer replaces d1 after the stage
    silver.write(_df(spark, [(7, "d1", 70)]),
                 mode="overwrite_partitions", partition_by=["day"])
    with pytest.raises(SnapshotConflict, match="no WAL claim"):
        t.commit()
    assert tx._list_txns(spark, roots[0]) == []  # nothing claimed
    t.abort()  # still possible
    assert _ids(silver) == [7] and silver.staged_versions() == {}


def test_overwrite_txn_survives_untouched_concurrent_commits(spark, roots):
    """Concurrent commits on partitions OUTSIDE the claimed set replay
    cleanly -- the overwrite analogue of
    test_commit_survives_concurrent_main_append."""
    silver, gold = _seed(spark, roots)
    t = tx.MultiTableTransaction(spark, roots[0])
    t.write(silver, _df(spark, [(9, "d1", 90)]),
            mode="overwrite_partitions", partition_by=["day"])
    t.write(gold, _df(spark, [(200, "d2", 2)]), mode="append",
            partition_by=["day"])
    # a different partition appends after the stage
    silver.write(_df(spark, [(5, "d5", 50)]), mode="append",
                 partition_by=["day"])
    t.commit()
    assert _ids(silver) == [5, 9]  # d1 replaced, d5 kept
    assert _ids(gold) == [100, 200]


def test_overwrite_txn_crash_windows_roll_forward(spark, roots, monkeypatch):
    """The crash matrix for the overwrite mode, mirroring
    test_commit_survives_concurrent_main_append: after the claim, a
    crash mid-publish rolls FORWARD even when a racer overwrote a
    claimed partition inside the validate-to-claim window -- the claim
    holder wins (last-writer-wins by claim order), never a wedge."""
    silver, gold = _seed(spark, roots)
    t = tx.MultiTableTransaction(spark, roots[0])
    t.write(silver, _df(spark, [(9, "d1", 90)]),
            mode="overwrite_partitions", partition_by=["day"])
    t.write(gold, _df(spark, [(200, "d2", 2)]), mode="append",
            partition_by=["day"])

    real = tx._publish_all

    def _crash_after_claim(spark_, roots_, wap, heads=None):
        # simulates the racer landing after validation (which already
        # ran) and the coordinator dying before ANY publish
        SnapshotStore(spark_, roots[1]).write(
            _df(spark, [(7, "d1", 70)]),
            mode="overwrite_partitions",
            partition_by=["day"],
        )
        raise RuntimeError("simulated crash inside the claim window")

    monkeypatch.setattr(tx, "_publish_all", _crash_after_claim)
    with pytest.raises(RuntimeError, match="simulated"):
        t.commit()
    monkeypatch.setattr(tx, "_publish_all", real)
    # racer's overwrite is visible pre-recovery
    assert _ids(silver) == [7]
    out = tx.recover(spark, roots[0])
    assert out["rolled_forward"] == [t.txn_id] and out["stuck"] == {}
    # the claimed transaction wins the contested partition
    assert _ids(silver) == [9] and _ids(gold) == [100, 200]
    # idempotent
    out2 = tx.recover(spark, roots[0])
    assert out2["rolled_forward"] == [] and out2["already_terminal"] == 1


def test_plain_wap_overwrite_still_refuses_on_conflict(spark, roots):
    """force_overwrite_replay is a transaction-only escape hatch: the
    ordinary WAP publish path keeps refusing conflicting overwrites."""
    silver, gold = _seed(spark, roots)
    silver.write(_df(spark, [(9, "d1", 90)]),
                 mode="overwrite_partitions", partition_by=["day"],
                 staged="audit-ow")
    silver.write(_df(spark, [(7, "d1", 70)]),
                 mode="overwrite_partitions", partition_by=["day"])
    with pytest.raises(SnapshotConflict, match="changed between"):
        silver.publish_staged("audit-ow")


def test_orphan_sweep_survives_published_dead_stage(spark, roots):
    """A reused txn id whose first life published leaves its second
    life's stage permanently unpublishable (a wap publishes at most
    once).  Once expire_txns drops the terminal WAL record the stage
    stops being shielded -- the sweep must take the dead-stage drop
    path (abandon_staged refuses published waps) instead of crashing
    and leaking every orphan after it."""
    silver, gold = _seed(spark, roots)
    t1 = tx.MultiTableTransaction(spark, roots[0], txn_id="reused01")
    t1.write(silver, _df(spark, [(2, "d2", 20)]), mode="append",
             partition_by=["day"])
    t1.commit()
    assert _ids(silver) == [1, 2]
    # second life of the same id: stages, then loses the WAL claim
    t2 = tx.MultiTableTransaction(spark, roots[0], txn_id="reused01")
    t2.write(silver, _df(spark, [(3, "d3", 30)]), mode="append",
             partition_by=["day"])
    with pytest.raises(SnapshotConflict):
        t2.commit()
    # terminal record ages out -> the wap leaves the protection set
    assert tx.expire_txns(spark, roots[0], keep_ms=0) == 1
    # an unrelated orphan AFTER the dead stage in sweep order must
    # still be reclaimed (the pre-fix crash leaked it)
    t3 = tx.MultiTableTransaction(spark, roots[0])
    t3.write(gold, _df(spark, [(300, "d3", 3)]), mode="append",
             partition_by=["day"])
    dropped = tx.abort_orphans(
        spark, roots[0], [roots[1], roots[2]], grace_ms=0
    )
    assert sorted(dropped) == sorted(
        [f"{roots[1]}::{t2.wap}", f"{roots[2]}::{t3.wap}"]
    )
    # published history untouched; dead stage gone
    assert _ids(silver) == [1, 2]
    assert silver.staged_versions() == {} and gold.staged_versions() == {}


def test_expire_snapshots_txn_safe_shields_claimed_stage(spark, roots, monkeypatch):
    """A transaction stuck mid-commit past the orphan grace (table A
    published, coordinator crashed) still owes table B a roll-forward;
    table maintenance run through the txn-safe wrapper must keep the
    shielded stage even at grace 0, and recover() must then complete
    the transaction."""
    silver, gold = _seed(spark, roots)
    t = tx.MultiTableTransaction(spark, roots[0])
    t.write(silver, _df(spark, [(2, "d2", 20)]), mode="append",
            partition_by=["day"])
    t.write(gold, _df(spark, [(200, "d2", 2)]), mode="append",
            partition_by=["day"])

    real = tx._publish_all

    def _crash_after_first(spark_, roots_, wap, heads=None):
        real(spark_, roots_[:1], wap)
        raise RuntimeError("simulated coordinator crash")

    monkeypatch.setattr(tx, "_publish_all", _crash_after_first)
    with pytest.raises(RuntimeError, match="simulated"):
        t.commit()
    monkeypatch.setattr(tx, "_publish_all", real)
    unpublished = silver if len(_ids(silver)) == 1 else gold
    # routine maintenance at grace 0: the WAL-shielded stage survives
    out = tx.expire_snapshots_txn_safe(
        spark, unpublished, roots[0], keep_last=1, orphan_grace_ms=0
    )
    assert unpublished.staged_versions(t.wap) != {}
    assert any(v in out["kept_versions"]
               for v in unpublished.staged_versions(t.wap))
    rec = tx.recover(spark, roots[0])
    assert rec["rolled_forward"] == [t.txn_id] and rec["stuck"] == {}
    assert _ids(silver) == [1, 2] and _ids(gold) == [100, 200]


def test_orphan_sweep_relists_wal_before_each_drop(spark, roots, monkeypatch):
    """A coordinator that claims AFTER the sweep's initial WAL listing
    (stages already past grace) must keep its stages: the sweep
    re-lists immediately before each drop."""
    silver, gold = _seed(spark, roots)
    t = tx.MultiTableTransaction(spark, roots[0])
    t.write(silver, _df(spark, [(2, "d2", 20)]), mode="append",
            partition_by=["day"])
    # no WAL record yet; simulate the claim landing between the sweep's
    # first listing and the drop by hiding the record on call #1 only
    import json as _json
    import os

    os.makedirs(os.path.join(roots[0], tx.TXN_DIR), exist_ok=True)
    with open(os.path.join(roots[0], tx.TXN_DIR, f"{t.txn_id}.json"), "w") as fh:
        fh.write(_json.dumps(t._wal("committing")))
    real = tx._wal_entries
    calls = {"n": 0}

    def _hide_first(spark_, root_):
        calls["n"] += 1
        return [] if calls["n"] == 1 else real(spark_, root_)

    monkeypatch.setattr(tx, "_wal_entries", _hide_first)
    assert tx.abort_orphans(spark, roots[0], [roots[1]], grace_ms=0) == []
    assert calls["n"] >= 2
    assert silver.staged_versions(t.wap) != {}


def test_abort_surfaces_committing_record_after_torn_probe(spark, roots, monkeypatch):
    """abort()'s probe can read a record torn (parses as absent); when
    the subsequent claim conflicts and the re-read shows 'committing',
    abort must raise toward recover(), not silently report success --
    it may have just abandoned a claimed transaction's stages."""
    silver, gold = _seed(spark, roots)
    t = tx.MultiTableTransaction(spark, roots[0], txn_id="tornprobe")
    t.write(silver, _df(spark, [(2, "d2", 20)]), mode="append",
            partition_by=["day"])
    import json as _json
    import os

    os.makedirs(os.path.join(roots[0], tx.TXN_DIR), exist_ok=True)
    with open(os.path.join(roots[0], tx.TXN_DIR, "tornprobe.json"), "w") as fh:
        fh.write(_json.dumps(t._wal("committing")))
    real = tx._read_json
    calls = {"n": 0}

    def _torn_first(spark_, path_):
        calls["n"] += 1
        return None if calls["n"] == 1 else real(spark_, path_)

    monkeypatch.setattr(tx, "_read_json", _torn_first)
    with pytest.raises(SnapshotConflict, match="recover"):
        t.abort()
    assert calls["n"] >= 2


def test_root_normalization_guard(spark, roots):
    """Trailing-slash root handles must not defeat the one-write-per-
    table guard or consistent_read's overlap check."""
    silver, gold = _seed(spark, roots)
    silver_slash = SnapshotStore(spark, roots[1] + "/")
    t = tx.MultiTableTransaction(spark, roots[0])
    t.write(silver_slash, _df(spark, [(2, "d2", 20)]), mode="append",
            partition_by=["day"])
    with pytest.raises(ValueError, match="one write per table"):
        t.write(silver, _df(spark, [(3, "d3", 30)]), mode="append",
                partition_by=["day"])
    # leave the txn claimed-but-unfinished; a slash-variant target must
    # still see the overlap and block
    import json as _json
    import os

    os.makedirs(os.path.join(roots[0], tx.TXN_DIR), exist_ok=True)
    with open(os.path.join(roots[0], tx.TXN_DIR, f"{t.txn_id}.json"), "w") as fh:
        fh.write(_json.dumps(t._wal("committing")))
    with pytest.raises(SnapshotConflict, match="recover"):
        tx.consistent_read(
            spark, roots[0], [roots[1] + "/"], retries=2, wait_s=0.05
        )
    rec = tx.recover(spark, roots[0])
    assert rec["rolled_forward"] == [t.txn_id]
    assert _ids(silver) == [1, 2]


def test_s3_semantics_txn_commit_recover_claim():
    """The coordinator WAL on an S3-semantics store (mocks3://):
    conditional-put claim, crash roll-forward, duplicate-txn-id race --
    in a subprocess so the fs impl jar is on the JVM classpath."""
    import os
    import subprocess
    import sys

    from test_nonlocal_fs_pipeline import FIXTURE_DIR, _ensure_jar

    if not _ensure_jar():
        pytest.skip("mockfs fixture jar unavailable (no javac)")
    proc = subprocess.run(
        [sys.executable, os.path.join(FIXTURE_DIR, "drive_s3txn.py")],
        capture_output=True,
        text=True,
        timeout=600,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-4000:]
    assert "S3TXN-COMMIT-OK" in out
    assert "S3TXN-RECOVER-OK" in out
    assert "S3TXN-CLAIM-RACE-OK" in out


def test_overwrite_txn_conflicts_with_interleaved_delete(spark, roots):
    """A delete_keys commit between stage and claim never changes the
    partitions map, but published after the claim it would mask the
    overwrite's replacement rows (their vdirs carry the STAGE version,
    older than the delete).  _validate_overwrites must raise pre-claim
    (advisor r8, medium)."""
    silver, _ = _seed(spark, roots)
    silver.write(
        _df(spark, [(2, "d2", 20)]), mode="append", partition_by=["day"]
    )
    t = tx.MultiTableTransaction(spark, roots[0])
    t.write(
        silver,
        _df(spark, [(7, "d1", 70)]),
        mode="overwrite_partitions",
        partition_by=["day"],
    )
    # interleaved direct delete whose keys CAN target the claimed d1
    silver.delete_keys(
        spark.createDataFrame([(1, "d1")], "id INT, day STRING"),
        key_cols=["id", "day"],
    )
    with pytest.raises(SnapshotConflict, match="delete_keys .* landed after"):
        t.commit()
    # no WAL claim was made: abort is still available, table untouched
    t.abort()
    assert _ids(silver) == [2]  # the delete applied; the overwrite never did
    # re-stage against the new head and retry: succeeds
    t2 = tx.MultiTableTransaction(spark, roots[0])
    t2.write(
        silver,
        _df(spark, [(7, "d1", 70)]),
        mode="overwrite_partitions",
        partition_by=["day"],
    )
    t2.commit()
    assert _ids(silver) == [2, 7]


def test_overwrite_txn_ignores_delete_on_unclaimed_partition(spark, roots):
    """A post-stage delete whose keys provably target only UNCLAIMED
    partitions is not a conflict: the overwrite's claimed partitions
    are disjoint from the masked rows."""
    silver, _ = _seed(spark, roots)
    silver.write(
        _df(spark, [(2, "d2", 20), (3, "d2", 30)]),
        mode="append",
        partition_by=["day"],
    )
    t = tx.MultiTableTransaction(spark, roots[0])
    t.write(
        silver,
        _df(spark, [(7, "d1", 70)]),
        mode="overwrite_partitions",
        partition_by=["day"],
    )
    silver.delete_keys(
        spark.createDataFrame([(2, "d2")], "id INT, day STRING"),
        key_cols=["id", "day"],
    )
    t.commit()
    # overwrite landed (7 replaces 1 in d1), delete applied in d2
    assert _ids(silver) == [3, 7]


def test_overwrite_txn_conservative_on_partition_blind_delete(spark, roots):
    """Delete keys NOT carrying the partition columns cannot prove they
    miss the claimed set -> conservative conflict."""
    silver, _ = _seed(spark, roots)
    silver.write(
        _df(spark, [(2, "d2", 20)]), mode="append", partition_by=["day"]
    )
    t = tx.MultiTableTransaction(spark, roots[0])
    t.write(
        silver,
        _df(spark, [(7, "d1", 70)]),
        mode="overwrite_partitions",
        partition_by=["day"],
    )
    silver.delete_keys(
        spark.createDataFrame([(2,)], "id INT"), key_cols=["id"]
    )
    with pytest.raises(SnapshotConflict, match="cannot be ruled out"):
        t.commit()
    t.abort()


# -- staged MoR deletes inside transactions (round 9) -----------------------


def test_staged_delete_invisible_until_publish(spark, roots):
    """Store-level: delete_keys(staged=...) is durable but invisible;
    publish applies it; time travel before the publish is unaffected;
    data appended AFTER the publish is never masked."""
    silver, _ = _seed(spark, roots)
    silver.write(
        _df(spark, [(2, "d2", 20)]), mode="append", partition_by=["day"]
    )
    sv = silver.delete_keys(
        spark.createDataFrame([(1, "d1")], "id INT, day STRING"),
        key_cols=["id", "day"],
        staged="audit-del",
    )
    assert _ids(silver) == [1, 2]  # invisible while staged
    assert silver.staged_versions("audit-del") == {sv: "audit-del"}
    pv = silver.publish_staged("audit-del")
    assert _ids(silver) == [2]
    # time travel to the pre-stage published head still sees the row
    # (sv is the staged manifest itself -- the auditor's view, delete
    # applied; sv-1 is the last published state before it)
    assert sorted(
        r["id"] for r in silver.read(as_of=sv - 1).collect()
    ) == [1, 2]
    assert pv == sv + 1
    # a fresh (1, d1) appended after the publish is NOT masked
    silver.write(
        _df(spark, [(1, "d1", 11)]), mode="append", partition_by=["day"]
    )
    assert _ids(silver) == [1, 2]


def test_staged_delete_abandon_reclaims_key_parquet(spark, roots):
    silver, _ = _seed(spark, roots)
    sv = silver.delete_keys(
        spark.createDataFrame([(1, "d1")], "id INT, day STRING"),
        key_cols=["id", "day"],
        staged="audit-del2",
    )
    man = silver._read_manifest(sv)
    own = [d for d in man["delete_sets"] if int(d["version"]) == sv]
    assert len(own) == 1
    import os

    dpath = f"{silver.root}/data/{own[0]['dir']}"
    assert os.path.exists(dpath)
    silver.abandon_staged("audit-del2")
    assert not os.path.exists(dpath)
    assert silver.staged_versions() == {}
    assert _ids(silver) == [1]


def test_delete_txn_cross_table_upsert_and_delete(spark, roots):
    """The gated-entry shape: one txn appends (upsert arm) to gold and
    deletes keys from silver, atomically."""
    silver, gold = _seed(spark, roots)
    t = tx.MultiTableTransaction(spark, roots[0])
    t.write(
        gold, _df(spark, [(200, "d2", 2)]), mode="append", partition_by=["day"]
    )
    t.delete_keys(
        silver,
        spark.createDataFrame([(1, "d1")], "id INT, day STRING"),
        key_cols=["id", "day"],
    )
    # staged: neither visible
    assert _ids(silver) == [1] and _ids(gold) == [100]
    t.commit()
    assert _ids(silver) == [] and _ids(gold) == [100, 200]
    # one write per table: a second op on silver in a new txn is fine,
    # but within one txn it is rejected
    t2 = tx.MultiTableTransaction(spark, roots[0])
    t2.delete_keys(
        silver,
        spark.createDataFrame([(9, "d1")], "id INT, day STRING"),
        key_cols=["id", "day"],
    )
    with pytest.raises(ValueError, match="one write per table"):
        t2.write(
            silver,
            _df(spark, [(3, "d3", 30)]),
            mode="append",
            partition_by=["day"],
        )
    t2.abort()


def test_delete_txn_masks_interleaved_appends(spark, roots):
    """Re-stamp semantics: the transactional delete happens at COMMIT
    time, so a matching row appended between stage and commit is masked
    too -- exactly what a direct delete issued at commit would do."""
    silver, gold = _seed(spark, roots)
    t = tx.MultiTableTransaction(spark, roots[0])
    t.delete_keys(
        silver,
        spark.createDataFrame([(1, "d1")], "id INT, day STRING"),
        key_cols=["id", "day"],
    )
    t.write(
        gold, _df(spark, [(200, "d2", 2)]), mode="append", partition_by=["day"]
    )
    # a second copy of the doomed key lands while the txn is in flight
    silver.write(
        _df(spark, [(1, "d1", 11)]), mode="append", partition_by=["day"]
    )
    t.commit()
    assert _ids(silver) == []  # both copies masked
    # appended after commit: visible (the delete never hides newer data)
    silver.write(
        _df(spark, [(1, "d1", 12)]), mode="append", partition_by=["day"]
    )
    assert _ids(silver) == [1]


def test_delete_txn_crash_matrix_rolls_forward(spark, roots, monkeypatch):
    """Both crash windows for a delete-bearing txn: (a) after the WAL
    claim before ANY publish, (b) between the two tables' publishes.
    recover() rolls forward in both; idempotent afterwards."""
    silver, gold = _seed(spark, roots)
    real = tx._publish_all

    # (a) crash before any publish
    t = tx.MultiTableTransaction(spark, roots[0])
    t.delete_keys(
        silver,
        spark.createDataFrame([(1, "d1")], "id INT, day STRING"),
        key_cols=["id", "day"],
    )
    t.write(
        gold, _df(spark, [(200, "d2", 2)]), mode="append", partition_by=["day"]
    )

    def _crash_before_any(spark_, roots_, wap, heads=None):
        raise RuntimeError("simulated crash before any publish")

    monkeypatch.setattr(tx, "_publish_all", _crash_before_any)
    with pytest.raises(RuntimeError, match="simulated"):
        t.commit()
    monkeypatch.setattr(tx, "_publish_all", real)
    assert _ids(silver) == [1] and _ids(gold) == [100]  # nothing applied
    out = tx.recover(spark, roots[0])
    assert out["rolled_forward"] == [t.txn_id] and out["stuck"] == {}
    assert _ids(silver) == [] and _ids(gold) == [100, 200]

    # (b) crash between the two publishes (sorted-root order)
    t2 = tx.MultiTableTransaction(spark, roots[0])
    t2.write(
        gold, _df(spark, [(300, "d3", 3)]), mode="append", partition_by=["day"]
    )
    t2.delete_keys(
        silver,
        spark.createDataFrame([(200, "d2")], "id INT, day STRING"),
        key_cols=["id", "day"],
    )
    gold.write(_df(spark, [(200, "d2", 9)]), mode="append", partition_by=["day"])

    def _crash_after_first(spark_, roots_, wap, heads=None):
        real(spark_, roots_[:1], wap)
        raise RuntimeError("simulated crash mid-publish")

    monkeypatch.setattr(tx, "_publish_all", _crash_after_first)
    with pytest.raises(RuntimeError, match="simulated"):
        t2.commit()
    monkeypatch.setattr(tx, "_publish_all", real)
    out2 = tx.recover(spark, roots[0])
    assert out2["rolled_forward"] == [t2.txn_id] and out2["stuck"] == {}
    assert 300 in _ids(gold)
    assert _ids(silver) == []
    out3 = tx.recover(spark, roots[0])
    assert out3["rolled_forward"] == []


# -- round-9 review hardening ------------------------------------------------


def test_staged_delete_must_be_chain_terminal(spark, roots):
    """A wap chain may not stage data commits AFTER a staged delete:
    replay re-stamps the delete past the chain's later commits, which
    would mask the chain's own rows on a moved head but keep them on
    fast-forward.  Append-then-delete chains stay allowed."""
    silver, _ = _seed(spark, roots)
    silver.delete_keys(
        spark.createDataFrame([(1, "d1")], "id INT, day STRING"),
        key_cols=["id", "day"],
        staged="chain-a",
    )
    with pytest.raises(ValueError, match="last commit of their chain"):
        silver.write(
            _df(spark, [(5, "d5", 50)]),
            mode="append",
            partition_by=["day"],
            staged="chain-a",
        )
    silver.abandon_staged("chain-a")
    # the consistent order: append first, delete last
    silver.write(
        _df(spark, [(5, "d5", 50)]),
        mode="append",
        partition_by=["day"],
        staged="chain-b",
    )
    silver.delete_keys(
        spark.createDataFrame([(1, "d1")], "id INT, day STRING"),
        key_cols=["id", "day"],
        staged="chain-b",
    )
    silver.publish_staged("chain-b")
    assert _ids(silver) == [5]


def test_plain_wap_overwrite_refuses_interleaved_delete(spark, roots):
    """Non-txn WAP publish: an overwrite replay must refuse when a
    delete committed after the stage could target a touched partition
    (the replayed dirs would be masked); a delete provably targeting
    only other partitions does not block."""
    silver, _ = _seed(spark, roots)
    silver.write(
        _df(spark, [(2, "d2", 20)]), mode="append", partition_by=["day"]
    )
    silver.write(
        _df(spark, [(9, "d1", 90)]),
        mode="overwrite_partitions",
        partition_by=["day"],
        staged="audit-ow-del",
    )
    # interleaved delete on the UNclaimed d2: publish must succeed
    silver.delete_keys(
        spark.createDataFrame([(2, "d2")], "id INT, day STRING"),
        key_cols=["id", "day"],
    )
    silver.publish_staged("audit-ow-del")
    assert _ids(silver) == [9]
    # now the conflicting case: new stage, delete targets claimed d1
    silver.write(
        _df(spark, [(7, "d1", 70)]),
        mode="overwrite_partitions",
        partition_by=["day"],
        staged="audit-ow-del2",
    )
    silver.delete_keys(
        spark.createDataFrame([(9, "d1")], "id INT, day STRING"),
        key_cols=["id", "day"],
    )
    with pytest.raises(SnapshotConflict, match="would mask the replayed"):
        silver.publish_staged("audit-ow-del2")
    silver.abandon_staged("audit-ow-del2")


def test_overwrite_txn_conflicts_with_claimed_staged_delete(
    spark, roots, monkeypatch
):
    """A delete staged by a CLAIMED concurrent transaction is invisible
    in head delete_sets, but its roll-forward is unstoppable -- the
    overwrite validation must treat it as a conflict; after the delete
    publishes, a re-staged overwrite goes through."""
    silver, gold = _seed(spark, roots)
    # hazard ordering: the overwrite stages FIRST, a published commit
    # then moves the head past its stage version, and only THEN does
    # the deleting transaction claim -- its claim-head restamp now
    # outranks the staged overwrite dirs, so validation must refuse
    t2 = tx.MultiTableTransaction(spark, roots[0])
    t2.write(
        silver,
        _df(spark, [(7, "d1", 70)]),
        mode="overwrite_partitions",
        partition_by=["day"],
    )
    silver.write(
        _df(spark, [(2, "d2", 20)]), mode="append", partition_by=["day"]
    )
    t1 = tx.MultiTableTransaction(spark, roots[0])
    t1.delete_keys(
        silver,
        spark.createDataFrame([(1, "d1")], "id INT, day STRING"),
        key_cols=["id", "day"],
    )
    real = tx._publish_all

    def _crash(spark_, roots_, wap, heads=None):
        raise RuntimeError("claimed, publish pending")

    monkeypatch.setattr(tx, "_publish_all", _crash)
    with pytest.raises(RuntimeError):
        t1.commit()
    monkeypatch.setattr(tx, "_publish_all", real)
    # t1 is claimed-but-unpublished and targets the claimed d1
    with pytest.raises(SnapshotConflict, match="CLAIMED concurrent"):
        t2.commit()
    t2.abort()
    # roll t1 forward, then the overwrite re-stages cleanly
    out = tx.recover(spark, roots[0])
    assert out["rolled_forward"] == [t1.txn_id]
    assert _ids(silver) == [2]
    t3 = tx.MultiTableTransaction(spark, roots[0])
    t3.write(
        silver,
        _df(spark, [(7, "d1", 70)]),
        mode="overwrite_partitions",
        partition_by=["day"],
    )
    t3.commit()
    assert _ids(silver) == [2, 7]


def test_recovered_delete_does_not_mask_post_claim_appends(
    spark, roots, monkeypatch
):
    """The delete happens at the WAL claim: rows appended AFTER the
    claim but before a crash-delayed recover() must survive the
    roll-forward (the delete's sequence number is pinned to the
    claim-time head recorded in the WAL)."""
    silver, gold = _seed(spark, roots)
    t = tx.MultiTableTransaction(spark, roots[0])
    t.delete_keys(
        silver,
        spark.createDataFrame([(1, "d1")], "id INT, day STRING"),
        key_cols=["id", "day"],
    )
    t.write(
        gold, _df(spark, [(200, "d2", 2)]), mode="append", partition_by=["day"]
    )
    real = tx._publish_all

    def _crash(spark_, roots_, wap, heads=None):
        raise RuntimeError("crash after claim")

    monkeypatch.setattr(tx, "_publish_all", _crash)
    with pytest.raises(RuntimeError):
        t.commit()
    monkeypatch.setattr(tx, "_publish_all", real)
    # hours later: a producer re-inserts the key with a corrected row
    silver.write(
        _df(spark, [(1, "d1", 11)]), mode="append", partition_by=["day"]
    )
    out = tx.recover(spark, roots[0])
    assert out["rolled_forward"] == [t.txn_id] and out["stuck"] == {}
    rows = {(r["id"], r["amt"]) for r in silver.read().collect()}
    # the pre-claim copy (amt 10) is gone; the post-claim copy survives
    assert rows == {(1, 11)}


def test_recovered_delete_survives_interleaved_compaction(
    spark, roots, monkeypatch
):
    """A compaction between the WAL claim and a crash-delayed recover()
    rewrites the to-be-deleted rows into dirs NEWER than the claim
    head; the roll-forward must fall back to publish-version stamping
    so the deleted key cannot resurrect (resurrection is worse than
    the conservative over-masking of post-claim appends)."""
    silver, gold = _seed(spark, roots)
    silver.write(
        _df(spark, [(2, "d1", 20)]), mode="append", partition_by=["day"]
    )
    t = tx.MultiTableTransaction(spark, roots[0])
    t.delete_keys(
        silver,
        spark.createDataFrame([(1, "d1")], "id INT, day STRING"),
        key_cols=["id", "day"],
    )
    t.write(
        gold, _df(spark, [(200, "d2", 2)]), mode="append", partition_by=["day"]
    )
    real = tx._publish_all

    def _crash(spark_, roots_, wap, heads=None):
        raise RuntimeError("crash after claim")

    monkeypatch.setattr(tx, "_publish_all", _crash)
    with pytest.raises(RuntimeError):
        t.commit()
    monkeypatch.setattr(tx, "_publish_all", real)
    # routine maintenance rewrites d1 (both rows) into a newer dir
    assert silver.compact() is not None
    out = tx.recover(spark, roots[0])
    assert out["rolled_forward"] == [t.txn_id] and out["stuck"] == {}
    # the deleted key must NOT resurrect from the compacted copies
    assert _ids(silver) == [2]


def test_recovered_delete_spares_concurrent_append_txn_rows(
    spark, roots, monkeypatch
):
    """A concurrent APPEND transaction committing (mode 'wap_publish')
    inside the delete's crash-recovery window is append-only: the
    roll-forward must keep the claim-time stamp and spare its rows,
    not fall back to over-masking."""
    silver, gold = _seed(spark, roots)
    t = tx.MultiTableTransaction(spark, roots[0])
    t.delete_keys(
        silver,
        spark.createDataFrame([(1, "d1")], "id INT, day STRING"),
        key_cols=["id", "day"],
    )
    real = tx._publish_all

    def _crash(spark_, roots_, wap, heads=None):
        raise RuntimeError("crash after claim")

    monkeypatch.setattr(tx, "_publish_all", _crash)
    with pytest.raises(RuntimeError):
        t.commit()
    monkeypatch.setattr(tx, "_publish_all", real)
    # a concurrent append TRANSACTION re-inserts the key and commits
    # (its publish lands as a 'wap_publish' commit in the window)
    t2 = tx.MultiTableTransaction(spark, roots[0])
    t2.write(
        silver, _df(spark, [(1, "d1", 11)]), mode="append", partition_by=["day"]
    )
    t2.commit()
    out = tx.recover(spark, roots[0])
    assert out["rolled_forward"] == [t.txn_id] and out["stuck"] == {}
    rows = {(r["id"], r["amt"]) for r in silver.read().collect()}
    # pre-claim copy (amt 10) deleted; the committed txn's copy survives
    assert rows == {(1, 11)}


def test_update_where_txn_cross_table(spark, roots):
    """Round-11 gated-entry shape: one txn appends to gold and applies a
    predicate COW update to silver, atomically."""
    from pyspark.sql import functions as F

    silver, gold = _seed(spark, roots)
    t = tx.MultiTableTransaction(spark, roots[0])
    v = t.update_where(silver, F.col("id") == 1, {"amt": 99})
    assert v is not None
    t.write(
        gold, _df(spark, [(200, "d2", 2)]), mode="append", partition_by=["day"]
    )
    # staged: update invisible, append invisible
    assert [r["amt"] for r in silver.read().collect()] == [10]
    assert _ids(gold) == [100]
    t.commit()
    assert [r["amt"] for r in silver.read().collect()] == [99]
    assert _ids(gold) == [100, 200]


def test_update_where_txn_no_match_stages_nothing(spark, roots):
    from pyspark.sql import functions as F

    silver, gold = _seed(spark, roots)
    t = tx.MultiTableTransaction(spark, roots[0])
    assert t.update_where(silver, F.col("id") == 777, {"amt": 0}) is None
    assert silver.staged_versions() == {}
    # the table is NOT enrolled: a real write on it still allowed
    t.write(
        silver, _df(spark, [(2, "d2", 20)]), mode="append", partition_by=["day"]
    )
    t.commit()
    assert _ids(silver) == [1, 2]


def test_delete_where_txn_cow_only_and_partitioned_only(spark, roots, tmp_path):
    from pyspark.sql import functions as F

    silver, _gold = _seed(spark, roots)
    t = tx.MultiTableTransaction(spark, roots[0])
    with pytest.raises(ValueError, match="COW-only"):
        t.delete_where(silver, F.col("id") == 1, approach="mor")
    # staged MoR refused at the store level too
    with pytest.raises(ValueError, match="cow"):
        silver.delete_where(F.col("id") == 1, approach="mor", staged="w1")
    flat = SnapshotStore(spark, str(tmp_path / "flat"))
    flat.write(_df(spark, [(1, "d1", 10)]), mode="snapshot")
    with pytest.raises(ValueError, match="partitioned"):
        t.update_where(flat, F.col("id") == 1, {"amt": 0})
    t.abort()


def test_update_where_txn_conflict_detected_before_claim(spark, roots):
    """A concurrent commit into a claimed partition between stage and
    commit surfaces as SnapshotConflict BEFORE the WAL claim."""
    from pyspark.sql import functions as F

    silver, gold = _seed(spark, roots)
    t = tx.MultiTableTransaction(spark, roots[0])
    t.update_where(silver, F.col("id") == 1, {"amt": 99})
    # interloper appends into the claimed partition d1
    silver.write(
        _df(spark, [(7, "d1", 70)]), mode="append", partition_by=["day"]
    )
    with pytest.raises(SnapshotConflict, match="changed since the stage"):
        t.commit()
    # no WAL claim was made: abort still possible, table untouched
    t.abort()
    assert sorted(_ids(silver)) == [1, 7]
    assert [r["amt"] for r in silver.read().where("id = 1").collect()] == [10]


def test_update_where_txn_crash_matrix_rolls_forward(spark, roots, monkeypatch):
    """Both 2PC crash windows for an update-bearing txn: (a) after the
    WAL claim before ANY publish, (b) between the two tables'
    publishes; recover() rolls forward in both."""
    from pyspark.sql import functions as F

    silver, gold = _seed(spark, roots)
    real = tx._publish_all

    # (a) crash before any publish
    t = tx.MultiTableTransaction(spark, roots[0])
    t.update_where(silver, F.col("id") == 1, {"amt": 99})
    t.write(
        gold, _df(spark, [(200, "d2", 2)]), mode="append", partition_by=["day"]
    )

    def _crash_before_any(spark_, roots_, wap, heads=None):
        raise RuntimeError("simulated crash before any publish")

    monkeypatch.setattr(tx, "_publish_all", _crash_before_any)
    with pytest.raises(RuntimeError, match="simulated"):
        t.commit()
    monkeypatch.setattr(tx, "_publish_all", real)
    assert [r["amt"] for r in silver.read().where("id = 1").collect()] == [10]
    out = tx.recover(spark, roots[0])
    assert out["rolled_forward"] == [t.txn_id] and out["stuck"] == {}
    assert [r["amt"] for r in silver.read().where("id = 1").collect()] == [99]
    assert _ids(gold) == [100, 200]

    # (b) crash between the two publishes
    t2 = tx.MultiTableTransaction(spark, roots[0])
    t2.update_where(silver, F.col("id") == 1, {"amt": 55})
    t2.write(
        gold, _df(spark, [(300, "d3", 3)]), mode="append", partition_by=["day"]
    )

    def _crash_after_first(spark_, roots_, wap, heads=None):
        real(spark_, roots_[:1], wap)
        raise RuntimeError("simulated crash mid-publish")

    monkeypatch.setattr(tx, "_publish_all", _crash_after_first)
    with pytest.raises(RuntimeError, match="simulated"):
        t2.commit()
    monkeypatch.setattr(tx, "_publish_all", real)
    out2 = tx.recover(spark, roots[0])
    assert out2["rolled_forward"] == [t2.txn_id] and out2["stuck"] == {}
    assert [r["amt"] for r in silver.read().where("id = 1").collect()] == [55]
    assert 300 in _ids(gold)


def test_merge_into_txn_cross_table(spark, roots):
    """Round-13: one txn MERGEs a source batch into silver (update +
    insert + by-source delete) and appends to gold, atomically."""
    silver, gold = _seed(spark, roots)
    src = _df(spark, [(1, "d1", 99), (5, "d2", 50)])
    t = tx.MultiTableTransaction(spark, roots[0])
    v = t.merge_into(
        silver,
        src,
        on="target.id = source.id",
        matched=[("update", None, {"amt": "source.amt"})],
        not_matched=[("insert", None, None)],
    )
    assert v is not None
    t.write(
        gold, _df(spark, [(200, "d2", 2)]), mode="append",
        partition_by=["day"],
    )
    # staged: merge invisible
    assert sorted(_ids(silver)) == [1]
    t.commit()
    rows = {(r["id"], r["amt"]) for r in silver.read().collect()}
    assert rows == {(1, 99), (5, 50)}
    assert _ids(gold) == [100, 200]


def test_merge_into_txn_conflict_before_claim(spark, roots):
    silver, gold = _seed(spark, roots)
    src = _df(spark, [(1, "d1", 99)])
    t = tx.MultiTableTransaction(spark, roots[0])
    t.merge_into(
        silver, src, on="target.id = source.id",
        matched=[("update", None, {"amt": "source.amt"})],
    )
    silver.write(
        _df(spark, [(7, "d1", 70)]), mode="append", partition_by=["day"]
    )
    with pytest.raises(SnapshotConflict, match="changed since the stage"):
        t.commit()
    t.abort()
    assert sorted(_ids(silver)) == [1, 7]


def test_merge_into_staged_requires_partitioned(spark, roots, tmp_path):
    silver, _gold = _seed(spark, roots)
    flat = SnapshotStore(spark, str(tmp_path / "flat"))
    flat.write(_df(spark, [(1, "d1", 10)]), mode="snapshot")
    t = tx.MultiTableTransaction(spark, roots[0])
    with pytest.raises(ValueError, match="partitioned"):
        t.merge_into(
            flat,
            _df(spark, [(1, "d1", 5)]),
            on="target.id = source.id",
            matched=[("delete", None)],
        )
    t.abort()
