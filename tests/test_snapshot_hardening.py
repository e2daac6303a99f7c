"""Round-7 hardening regressions for the snapshot store (advisor items):

* ``read_appends`` must skip unpublished staged (WAP/branch) commits in
  its window -- same rule as ``commit_modes`` -- or an abandoned staged
  full-replace wedges every incremental consumer (IncrementalMatView
  picks incremental from commit_modes, then read_appends refuses).
* ``delete_keys`` keyed on a column added by schema evolution must not
  wedge reads of pre-evolution directories (NULL key never matches).
* Lost commit races must be classified by Java exception class / 412
  markers, not just an "AlreadyExists" substring.
* ``tag()`` creation is a single-winner claim (no RawLocalFileSystem
  rename TOCTOU), and replace never transiently drops the ref.
* ``publish_staged`` chained fast-forward is only taken while the head
  state still equals the staged chain's state (lost-update regression).
"""

from __future__ import annotations

import threading

import pytest

from docker_airflow_spark_minio_spark.snapshots import (
    SnapshotStore,
    _is_conflict_exc,
)

SCHEMA = "id INT, day STRING, amt INT"


@pytest.fixture
def root(tmp_path):
    return str(tmp_path / "tab")


def _df(spark, rows, schema=SCHEMA):
    return spark.createDataFrame(rows, schema)


def _rows(df):
    return sorted((r["id"], r["day"], r["amt"]) for r in df.collect())


# -- read_appends vs staged commits -------------------------------------


def test_read_appends_skips_unpublished_staged_replace(spark, root):
    store = SnapshotStore(spark, root)
    store.write(_df(spark, [(1, "d1", 10)]), mode="snapshot", partition_by=["day"])
    # unpublished staged FULL REPLACE inside the window -- not table
    # state, so it must not trip the replace refusal
    store.write(
        _df(spark, [(9, "d9", 90)]),
        mode="snapshot",
        partition_by=["day"],
        staged="audit-1",
    )
    store.write(_df(spark, [(2, "d2", 20)]), mode="append", partition_by=["day"])

    # commit_modes already omitted the staged commit; read_appends must
    # agree or the two metadata views contradict each other
    modes = store.commit_modes(0)
    assert set(modes.values()) == {"append"}
    assert _rows(store.read_appends(0)) == [(2, "d2", 20)]


def test_read_appends_still_refuses_published_replace(spark, root):
    store = SnapshotStore(spark, root)
    store.write(_df(spark, [(1, "d1", 10)]), mode="snapshot", partition_by=["day"])
    store.write(_df(spark, [(9, "d9", 90)]), mode="snapshot", partition_by=["day"])
    with pytest.raises(ValueError, match="crosses a 'snapshot' commit"):
        store.read_appends(0)


# -- delete_keys on an evolved column ------------------------------------


def test_delete_keys_on_evolved_column_does_not_wedge_reads(spark, root):
    store = SnapshotStore(spark, root)
    # v0: written BEFORE the 'src' column existed
    store.write(_df(spark, [(1, "d1", 10)]), mode="snapshot", partition_by=["day"])
    # v1: additive schema evolution adds 'src'
    store.write(
        _df(
            spark,
            [(2, "d1", 20, "a"), (3, "d2", 30, "b")],
            "id INT, day STRING, amt INT, src STRING",
        ),
        mode="append",
        partition_by=["day"],
    )
    # delete keyed on the NEW column: validated against the head schema,
    # but the v0 directory's parquet lacks it -- the anti-join must
    # null-fill, not AnalysisException on every subsequent read
    store.delete_keys(_df(spark, [("b",)], "src STRING"), ["src"])

    got = sorted((r["id"], r["src"]) for r in store.read().collect())
    # row 3 deleted; row 1 (NULL src) SURVIVES: NULL never matches a key
    assert got == [(1, None), (2, "a")]
    # incremental consumers keep working too
    assert sorted(r["id"] for r in store.read_appends(0).collect()) == [2]


# -- conflict classification ---------------------------------------------


class _J:
    """Minimal py4j JavaObject stand-in: getClass().getName() etc."""

    def __init__(self, name, msg="", cause=None):
        self._name, self._msg, self._cause = name, msg, cause

    def getClass(self):
        return self

    def getName(self):
        return self._name

    def getMessage(self):
        return self._msg

    def getCause(self):
        return self._cause


class _PyExc(Exception):
    def __init__(self, text, j=None):
        super().__init__(text)
        if j is not None:
            self.java_exception = j


def test_conflict_classifier_matches_s3a_failure_shapes():
    # the easy case the old substring check already handled
    assert _is_conflict_exc(_PyExc("FileAlreadyExistsException: /x"))
    # 412 conditional-PUT rejection with no AlreadyExists in the text
    assert _is_conflict_exc(
        _PyExc("PUT on x: Status Code: 412; PreconditionFailed")
    )
    # class-name-only signal, message unhelpful
    assert _is_conflict_exc(
        _PyExc(
            "write failed",
            _J("org.apache.hadoop.fs.s3a.RemoteFileChangedException", "etag"),
        )
    )
    # signal buried in the getCause() chain
    assert _is_conflict_exc(
        _PyExc(
            "wrapped",
            _J(
                "java.io.IOException",
                "boom",
                _J("org.apache.hadoop.fs.FileAlreadyExistsException", "/x"),
            ),
        )
    )
    # genuine infrastructure failures must NOT classify as conflicts
    assert not _is_conflict_exc(
        _PyExc(
            "connection reset",
            _J("java.net.SocketException", "Connection reset"),
        )
    )
    assert not _is_conflict_exc(_PyExc("No space left on device"))


# -- tag claim race --------------------------------------------------------


def test_tag_create_race_single_winner(spark, root):
    store = SnapshotStore(spark, root)
    store.write(_df(spark, [(1, "d1", 10)]), mode="snapshot", partition_by=["day"])
    store.write(_df(spark, [(2, "d2", 20)]), mode="append", partition_by=["day"])

    # Two threads race tag() creation pointing at DIFFERENT versions.
    # Exactly one must win, and the surviving ref must be the winner's
    # version -- a rename-based TOCTOU lets both "succeed" with one
    # silently clobbered.
    for i in range(12):
        name = f"pin{i}"
        barrier = threading.Barrier(2)
        results: dict[int, str] = {}

        def tagger(version):
            barrier.wait()
            try:
                store.tag(name, version=version)
                results[version] = "ok"
            except ValueError:
                results[version] = "conflict"

        threads = [threading.Thread(target=tagger, args=(v,)) for v in (0, 1)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert sorted(results.values()) == ["conflict", "ok"], results
        winner = next(v for v, r in results.items() if r == "ok")
        assert store.tags()[name] == winner


def test_tag_replace_repoints_atomically(spark, root):
    store = SnapshotStore(spark, root)
    store.write(_df(spark, [(1, "d1", 10)]), mode="snapshot", partition_by=["day"])
    store.write(_df(spark, [(2, "d2", 20)]), mode="append", partition_by=["day"])
    store.tag("rel", version=0)
    with pytest.raises(ValueError, match="already exists"):
        store.tag("rel", version=1)
    assert store.tag("rel", version=1, replace=True) == 1
    assert store.tags()["rel"] == 1
    # replace also works when the tag does not exist yet (create)
    assert store.tag("fresh", version=0, replace=True) == 0
    assert store.tags()["fresh"] == 0


# -- publish_staged chained fast-forward soundness -------------------------


def test_publish_chain_after_replay_keeps_main_commits(spark, root):
    """A staged chain published onto a MOVED head: the first commit
    replays (merges main's new data); the second must NOT take the
    chained fast-forward arm, whose manifest predates main's move --
    that silently dropped main's intervening append (round-6 bug)."""
    store = SnapshotStore(spark, root)
    store.write(_df(spark, [(1, "d1", 10)]), mode="snapshot", partition_by=["day"])
    store.write(
        _df(spark, [(2, "d1", 20)]),
        mode="append",
        partition_by=["day"],
        staged="wap-chain",
    )
    store.write(
        _df(spark, [(3, "d2", 30)]),
        mode="append",
        partition_by=["day"],
        staged="wap-chain",
    )
    # main moves after the stage
    store.write(_df(spark, [(4, "d3", 40)]), mode="append", partition_by=["day"])
    store.publish_staged("wap-chain")
    assert _rows(store.read()) == [
        (1, "d1", 10),
        (2, "d1", 20),
        (3, "d2", 30),
        (4, "d3", 40),
    ]


def test_publish_chain_overwrite_after_replay_onto_moved_head(spark, root):
    """Chain [append, overwrite_partitions(d1)] published after main
    appended to an UNTOUCHED partition: the overwrite replays against
    the merged head and main's data survives."""
    store = SnapshotStore(spark, root)
    store.write(_df(spark, [(1, "d1", 10)]), mode="snapshot", partition_by=["day"])
    store.write(
        _df(spark, [(2, "d1", 20)]),
        mode="append",
        partition_by=["day"],
        staged="wap-ow",
    )
    store.write(
        _df(spark, [(9, "d1", 90)]),
        mode="overwrite_partitions",
        partition_by=["day"],
        staged="wap-ow",
    )
    store.write(_df(spark, [(4, "d3", 40)]), mode="append", partition_by=["day"])
    store.publish_staged("wap-ow")
    assert _rows(store.read()) == [(4, "d3", 40), (9, "d1", 90)]


def test_publish_chain_crash_retry_keeps_main_commits(spark, root, monkeypatch):
    """A fast_forward that REPLAYS its first staged commit onto a moved
    main, then crashes before the second, must NOT fast-forward the
    second on retry: the retry runs with fresh process state, so the
    state-equality signal has to live in the publish commit's metadata
    (published_state_equal), not in a local flag."""
    store = SnapshotStore(spark, root)
    store.write(_df(spark, [(1, "d1", 10)]), mode="snapshot", partition_by=["day"])
    store.branch_write("dev", _df(spark, [(2, "d1", 20)]), partition_by=["day"])
    store.branch_write("dev", _df(spark, [(3, "d2", 30)]), partition_by=["day"])
    # main moves after the branch point -> the first publish REPLAYS
    store.write(_df(spark, [(4, "d3", 40)]), mode="append", partition_by=["day"])

    real = SnapshotStore._commit_manifest
    calls = {"n": 0}

    def _crash_on_second_publish(self, version, manifest):
        if manifest["mode"] == "wap_publish":
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("simulated crash between publishes")
        return real(self, version, manifest)

    monkeypatch.setattr(SnapshotStore, "_commit_manifest", _crash_on_second_publish)
    with pytest.raises(RuntimeError, match="simulated"):
        store.fast_forward("dev")
    monkeypatch.setattr(SnapshotStore, "_commit_manifest", real)

    # retry in "a new process": only the second commit is still staged
    store.fast_forward("dev")
    assert _rows(store.read()) == [
        (1, "d1", 10),
        (2, "d1", 20),
        (3, "d2", 30),
        (4, "d3", 40),
    ]


def test_publish_records_state_equality_marker_durably(spark, root):
    """Every publish commit must record published_state_equal in its
    metadata: True for a state-equal fast-forward, False for a replay
    onto a moved head -- the durable signal the chained fast-forward
    arm reads (a crash-retry starts with fresh process state)."""
    store = SnapshotStore(spark, root)
    store.write(_df(spark, [(1, "d1", 10)]), mode="snapshot", partition_by=["day"])
    # fast-forward publish: head unchanged since the stage
    store.write(
        _df(spark, [(2, "d1", 20)]),
        mode="append",
        partition_by=["day"],
        staged="wap-ff",
    )
    v_ff = store.publish_staged("wap-ff")
    m_ff = store._read_manifest(v_ff)
    assert m_ff["metadata"]["published_state_equal"] is True
    # replay publish: head moved after the stage
    store.write(
        _df(spark, [(3, "d2", 30)]),
        mode="append",
        partition_by=["day"],
        staged="wap-replay",
    )
    store.write(_df(spark, [(4, "d3", 40)]), mode="append", partition_by=["day"])
    v_rp = store.publish_staged("wap-replay")
    m_rp = store._read_manifest(v_rp)
    assert m_rp["metadata"]["published_state_equal"] is False
    assert _rows(store.read()) == [
        (1, "d1", 10),
        (2, "d1", 20),
        (3, "d2", 30),
        (4, "d3", 40),
    ]
