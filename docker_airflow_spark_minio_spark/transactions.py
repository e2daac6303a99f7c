"""Multi-table atomic transactions over :class:`~.snapshots.SnapshotStore`
tables -- two-phase commit with a coordinator write-ahead log.

The reference's pipeline writes silver THEN gold as separate jobs
(/root/reference/spark/jobs/job_silver.py, job_gold.py): a crash between
them leaves the two tables describing different states of the world, and
nothing records that a repair is owed.  This module closes that gap the
way a lakehouse catalog does (the transactional-catalog idea behind
Nessie / Iceberg REST catalog multi-table commits), built entirely from
primitives this repo already trusts:

* every table write in the transaction is a **staged WAP snapshot**
  (``SnapshotStore.write(staged=...)``) -- durable, invisible, auditable;
* ``commit()`` first claims a single **WAL record** (the same
  single-winner :func:`~.snapshots.write_atomic_claim` as manifest
  commits -- the WAL claim IS the transaction's commit point), then
  publishes each table's stage in deterministic (sorted-root) order,
  then marks the record ``committed``;
* a crash anywhere is repaired by :func:`recover`: a claimed-but-
  unfinished WAL record is rolled FORWARD (publish is idempotent per
  table -- a wap id publishes at most once, and already-published
  tables are detected via ``committed_metadata``), and staged writes
  with NO WAL record are rolled BACK by :func:`abort_orphans` after a
  grace period (the coordinator died before deciding).

Contract, stated honestly:

* **Atomic durability**: after the WAL claim succeeds, the transaction
  WILL apply to every table (roll-forward); before it, it never applies
  anywhere (roll-back).  There is no state from which half the tables
  keep the writes permanently.  This holds BECAUSE a claimed
  transaction's publish can never refuse: appends replay cleanly onto
  any moved head, staged MoR deletes replay refusal-free (their entry
  is re-stamped to the WAL-claim-time head -- the delete happens at
  commit time, even across a crash-delayed roll-forward; see
  :meth:`MultiTableTransaction.delete_keys`), and
  ``overwrite_partitions`` stages record a CLAIMED
  PARTITION SET validated immediately before the WAL claim (conflicts
  -- including interleaved direct deletes that could mask the
  replacement rows -- raise there, pre-claim, where abort is still
  possible) and publish
  with ``force_overwrite_replay`` after it -- a race inside the
  validate-to-claim window resolves last-writer-wins by claim order,
  recorded in the WAL (``overwrite_claims``).  Full replaces stay
  banned: their conflict surface is the whole table, which cannot be
  claimed partition-wise (see :meth:`MultiTableTransaction.write`).
* **Per-table snapshot isolation**, not cross-table serializability:
  during the publish window a reader pinning table heads itself can see
  table A published and table B not yet.  :func:`consistent_read` closes
  this for readers by pinning every table's head version and REFUSING
  while a claimed-but-unfinished WAL overlaps the table set -- the same
  read-repair contract a catalog-level commit offers.

Scale notes (100 TB posture): everything here is metadata-plane.  The
data was already written (once) by the staged commits; commit/recover
cost is O(tables) manifest reads + one WAL record, independent of data
size.  The WAL directory is bounded by retention (``expire_txns``).
"""

from __future__ import annotations

import json
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from .fsmeta import delete_prefix, list_entries, read_bytes
from .fsmeta import exists as path_exists
from .snapshots import (
    SnapshotConflict,
    SnapshotStore,
    _vdir_version,
    write_atomic_claim,
    write_atomic_replace,
)

TXN_DIR = "_txns"
TXN_WAP_PREFIX = "txn-"

#: WAL record states.  ``committing`` = claimed, roll FORWARD on
#: recovery; ``committed`` / ``aborted`` = terminal.
_STATES = ("committing", "committed", "aborted")


def _txn_path(root: str, txn_id: str) -> str:
    return f"{root.rstrip('/')}/{TXN_DIR}/{txn_id}.json"


def _txn_tmp(root: str, txn_id: str) -> str:
    return f"{root.rstrip('/')}/{TXN_DIR}/.{txn_id}.tmp"


def _wal_entries(spark: SparkSession, coordinator_root: str) -> list[tuple[str, str]]:
    """(txn_id, record path) for every WAL record FILE, parsed or not --
    the shared listing behind :func:`_list_txns` (which reads each) and
    :func:`abort_orphans` (which needs only the ids: a torn record must
    still shield its stages)."""
    d = f"{coordinator_root.rstrip('/')}/{TXN_DIR}"
    out = []
    for e in list_entries(spark, d):
        n = e.name
        if n.endswith(".json") and not n.startswith("."):
            out.append((n[: -len(".json")], f"{d}/{n}"))
    return out


def _read_json(spark: SparkSession, path: str) -> dict | None:
    if not path_exists(spark, path):
        return None
    try:
        return json.loads(read_bytes(spark, path).decode("utf-8"))
    except ValueError:
        # torn read on a store without atomic replace (create-overwrite
        # window): treat as absent -- a committing record reappears to
        # the NEXT recover/scan, which is when its obligation is due.
        # (abort_orphans derives its protection set from FILENAMES, so
        # a torn record still shields its stages from the sweep.)
        return None


class MultiTableTransaction:
    """One transaction instance; not thread-safe (one writer drives it).

    ``coordinator_root`` holds the WAL; it can be any URI the session's
    Hadoop FS layer reaches (file://, s3a://, the mockfs fixtures) and
    is usually a sibling of the table roots.
    """

    def __init__(
        self,
        spark: SparkSession,
        coordinator_root: str,
        txn_id: str | None = None,
    ) -> None:
        self.spark = spark
        self.root = coordinator_root
        self.txn_id = txn_id or uuid.uuid4().hex[:16]
        if not all(c.isalnum() or c in "._-" for c in self.txn_id):
            raise ValueError(f"invalid txn id: {self.txn_id!r}")
        self.wap = f"{TXN_WAP_PREFIX}{self.txn_id}"
        self._stores: dict[str, SnapshotStore] = {}
        self._modes: dict[str, str] = {}
        self._staged_v: dict[str, int] = {}
        self._claims: dict[str, list[str]] = {}
        self._del_heads: dict[str, int] = {}
        self._done = False

    # -- staging -----------------------------------------------------------

    def _guard_stage(self, store: SnapshotStore, kw: dict, what: str) -> str:
        """Shared pre-stage checks for every staging method: txn still
        open, no explicit staged=, one write per table (roll-forward
        detects a finished table by its published wap id, recorded by
        the FIRST cherry-pick -- a second same-table stage would read
        as 'done' and strand half-applied).  Returns the normalized
        table root (trailing-slash differences must not defeat the
        guard or the WAL's table_roots comparisons)."""
        if self._done:
            raise ValueError(f"txn {self.txn_id} already finished")
        if "staged" in kw:
            raise ValueError(f"txn {what} stage implicitly; drop staged=")
        root = store.root.rstrip("/")
        if root in self._stores:
            raise ValueError(
                f"table {root} already written in txn "
                f"{self.txn_id}: one write per table per transaction "
                "(combine the operations into one instead)"
            )
        return root

    def _enroll(
        self, root: str, store: SnapshotStore, mode: str, version: int
    ) -> int:
        self._stores[root] = store
        self._modes[root] = mode
        self._staged_v[root] = version
        return version

    def write(self, store: SnapshotStore, df: DataFrame, **kw) -> int:
        """Stage ``df`` into ``store`` under this transaction (the
        ``SnapshotStore.write`` kwargs except ``staged``).  Durable
        immediately, invisible everywhere until :meth:`commit`.

        Restrictions that keep the commit contract TRUE rather than
        aspirational:

        * ``mode`` must be ``append`` or ``overwrite_partitions``.
          An append replays cleanly onto any moved head, so publish
          cannot refuse after the WAL claim.  A partition overwrite
          CLAIMS its touched partition set: ``commit()`` validates
          that no concurrent commit touched those partitions between
          stage and claim (conflict -> SnapshotConflict BEFORE the
          claim, while abort is still possible -- the caller re-stages
          and retries), and after the claim the roll-forward publishes
          with ``force_overwrite_replay`` so it can never refuse; a
          race landing inside the validate-to-claim window resolves
          last-writer-wins by claim order, recorded in the WAL.  A
          staged FULL replace stays banned -- its conflict surface is
          the whole table, which cannot be claimed partition-wise.
        * one write per table per transaction -- roll-forward detects a
          finished table by its published wap id, which is recorded by
          the FIRST cherry-pick; a crash between two same-table
          cherry-picks would read as "done" and strand the second
          stage half-applied forever.
        """
        mode = kw.get("mode", "snapshot")
        if mode not in ("append", "overwrite_partitions"):
            raise ValueError(
                "multi-table transactions support mode='append' or "
                "'overwrite_partitions' only (see docstring: a full "
                "replace can refuse at publish time, wedging a claimed "
                "transaction)"
            )
        if kw.get("evolve_partitioning"):
            raise ValueError(
                "partition-spec evolution cannot ride a multi-table "
                "transaction (publish would refuse under the new spec)"
            )
        root = self._guard_stage(store, kw, "writes")
        return self._enroll(
            root, store, mode, store.write(df, staged=self.wap, **kw)
        )

    def delete_keys(
        self,
        store: SnapshotStore,
        keys_df: DataFrame,
        key_cols: list[str],
        **kw,
    ) -> int:
        """Stage a MERGE-ON-READ equality delete on ``store`` under this
        transaction (round 9; ``SnapshotStore.delete_keys`` kwargs
        except ``staged``).  The key set is written durably NOW but
        invisible until :meth:`commit`; at publish the delete-set
        entry's sequence number is re-stamped to the table head
        recorded at WAL-CLAIM time (the commit point), so it masks
        exactly the data existing at commit -- the same rows a direct
        delete issued at that moment would remove, even when a crash
        delays the roll-forward past later appends.  Publish is
        refusal-free
        (no partition-claim surface), so the post-claim roll-forward
        contract holds; counts as this table's one write.

        Read-to-claim race (the delete analog of the overwrite
        validate-to-claim note on :meth:`commit`): the head is read
        immediately before the WAL claim is written, and an append
        whose commit lands inside that window receives a version above
        the recorded head, so the strict ``>`` masking rule leaves it
        untouched.  This is the defined serialization, not a defect --
        an append not yet visible at the head read orders AFTER the
        delete, exactly as a racing overwrite resolves last-writer-wins
        by claim order.  Callers needing appends quiesced before a
        delete must sequence them externally."""
        root = self._guard_stage(store, kw, "deletes")
        return self._enroll(
            root,
            store,
            "delete_keys",
            store.delete_keys(keys_df, key_cols, staged=self.wap, **kw),
        )

    def update_where(
        self, store: SnapshotStore, condition, assignments: dict, **kw
    ) -> int | None:
        """Stage a row-level COW ``UPDATE ... SET ... WHERE`` on
        ``store`` under this transaction (round 11;
        ``SnapshotStore.update_where`` kwargs except ``staged``).  The
        rewrite of the touched partitions stages invisibly and rides
        the transaction's overwrite-claim machinery: matching rows are
        computed from the published head at STAGE time, the touched
        partition set is validated unchanged immediately before the WAL
        claim (a concurrent writer surfaces as SnapshotConflict there,
        while abort is still possible -- snapshot-isolation semantics,
        never a lost update), and the post-claim roll-forward publishes
        refusal-free.  PARTITIONED tables only (an unpartitioned COW
        update is a full replace, banned for the same
        whole-table-conflict-surface reason as staged full replaces).
        Returns the staged version, or None when nothing matched --
        then NOTHING was staged and the table is not enrolled in the
        transaction (a no-op update must not claim partitions)."""
        root = self._guard_stage(store, kw, "updates")
        v = store.update_where(condition, assignments, staged=self.wap, **kw)
        if v is None:
            return None
        return self._enroll(root, store, "overwrite_partitions", v)

    def merge_into(
        self, store: SnapshotStore, source, on, **kw
    ) -> int | None:
        """Stage a full conditional-clause ``MERGE INTO`` on ``store``
        under this transaction (round 13;
        :meth:`SnapshotStore.merge_into` kwargs except ``staged``) --
        the Iceberg-on-Spark headline statement in its transactional
        form: the copy-on-write rewrite of the touched partitions
        (matched-clause partitions, insert partitions, and NOT MATCHED
        BY SOURCE partitions) stages invisibly and rides the
        overwrite-claim machinery exactly like :meth:`update_where`
        (clause effects computed from the published head at stage time,
        claims validated pre-WAL-claim, refusal-free roll-forward).
        PARTITIONED tables only.  Returns the staged version, or None
        when no clause changed anything (nothing staged)."""
        root = self._guard_stage(store, kw, "merges")
        v = store.merge_into(source, on, staged=self.wap, **kw)
        if v is None:
            return None
        return self._enroll(root, store, "overwrite_partitions", v)

    def delete_where(self, store: SnapshotStore, condition, **kw) -> int | None:
        """Stage a row-level COW ``DELETE WHERE`` on ``store`` under
        this transaction (round 11) -- the predicate analog of
        :meth:`delete_keys` for rows with no natural key, implemented
        as a claimed partition rewrite exactly like :meth:`update_where`
        (same conflict window, same refusal-free roll-forward, same
        partitioned-only restriction; fully-deleted partitions drop via
        the claimed set).  ``approach`` is pinned to ``'cow'``: a
        staged positional delete could be silently unmasked by a
        compaction landing before publish, and ``delete_keys`` already
        IS the transactional MoR form.  Returns the staged version or
        None when nothing matched (nothing staged)."""
        if kw.pop("approach", "cow") != "cow":
            raise ValueError(
                "transactional delete_where is COW-only; use "
                "txn.delete_keys for the MoR (equality) form"
            )
        root = self._guard_stage(store, kw, "deletes")
        v = store.delete_where(
            condition, approach="cow", staged=self.wap, **kw
        )
        if v is None:
            return None
        return self._enroll(root, store, "overwrite_partitions", v)

    # -- decision ----------------------------------------------------------

    def _wal(self, state: str) -> dict:
        return {
            "txn_id": self.txn_id,
            "wap": self.wap,
            "table_roots": sorted(self._stores),
            "table_modes": dict(sorted(self._modes.items())),
            # claimed partition sets of the overwrite stages, recorded
            # durably at claim time: the audit trail for the
            # last-writer-wins decision force_overwrite_replay makes
            "overwrite_claims": {
                r: ps for r, ps in sorted(self._claims.items())
            },
            # table head at WAL-claim time for each delete table: the
            # roll-forward re-stamps the delete to this + 1, so a
            # crash-delayed recover() masks exactly the data existing
            # at the commit point, never rows appended since
            "delete_claim_heads": {
                r: v for r, v in sorted(self._del_heads.items())
            },
            "state": state,
            "ts_ms": int(time.time() * 1000),
        }

    def _validate_overwrites(self) -> dict[str, list[str]]:
        """Pre-claim conflict check for overwrite stages: every claimed
        partition must be UNCHANGED between the stage's base and the
        current head.  Returns {root: sorted claimed partitions}.
        Raising here is safe -- no WAL claim exists yet, so abort (or a
        re-stage-and-retry loop) remains available to the caller."""
        claims: dict[str, list[str]] = {}
        for root in sorted(self._stores):
            if self._modes.get(root) != "overwrite_partitions":
                continue
            store = self._stores[root]
            sv = self._staged_v[root]
            raw = store._read_manifest_raw(sv)
            st = store._read_manifest(sv)
            base_v = raw["parent"]
            base = (
                store._read_manifest(base_v) if base_v is not None else {}
            )
            st_vdirs = {
                vd
                for vds in st["partitions"].values()
                for vd in vds
                if _vdir_version(vd) == sv
            }
            touched = {
                p
                for p, vds in st["partitions"].items()
                if any(vd in st_vdirs for vd in vds)
            } | (set(base.get("partitions", {})) - set(st["partitions"]))
            claims[root] = sorted(touched)
            head_v = store.current_version()
            if head_v == base_v:
                continue
            head = (
                store._read_manifest(head_v) if head_v is not None else {}
            )
            for p in claims[root]:
                if head.get("partitions", {}).get(p) != base.get(
                    "partitions", {}
                ).get(p):
                    raise SnapshotConflict(
                        f"txn {self.txn_id}: partition {p!r} of {root} "
                        "changed since the stage; abort or re-stage and "
                        "retry (no WAL claim was made -- the table is "
                        "untouched)"
                    )
            # Interleaved MoR deletes (advisor r8, medium): a
            # delete_keys commit landing between stage and claim never
            # changes the partitions map -- the pointer check above
            # passes -- but its delete set carries a sequence number
            # NEWER than the staged vdirs (named v{sv}), so after the
            # claimed publish (force_overwrite_replay) it would MASK
            # the overwrite's replacement rows, rows a DIRECT overwrite
            # (whose dirs outrank the delete) would keep.  Any
            # post-stage delete that can target a claimed partition is
            # therefore a conflict, raised here pre-claim where abort /
            # re-stage is still possible.  Targeting is decided exactly
            # from the delete-set KEYS when they carry the partition
            # columns (bounded probe), conservatively otherwise
            # (SnapshotStore._delete_may_target).
            pby = st["partition_by"]
            for entry in head.get("delete_sets", []):
                dv = int(entry["version"])
                if dv <= sv:
                    continue  # predates the stage: never masks v{sv} dirs
                why = store._delete_may_target(entry, claims[root], pby)
                if why is None:
                    continue
                raise SnapshotConflict(
                    f"txn {self.txn_id}: delete_keys v{dv} of {root} "
                    f"landed after the overwrite stage (v{sv}) and {why}; "
                    "published, it would mask the overwrite's replacement "
                    "rows.  Abort or re-stage and retry (no WAL claim was "
                    "made -- the table is untouched)"
                )
            # The SAME hazard from a not-yet-published delete staged by
            # a CLAIMED concurrent transaction (round-9 review): it is
            # invisible in head delete_sets, but its roll-forward is
            # unstoppable and its re-stamped sequence number can outrank
            # our staged dirs.  Conservative conflict whenever such a
            # stage may target a claimed partition.  (Only transactions
            # sharing this coordinator are visible -- the same
            # single-coordinator assumption consistent_read documents.)
            committing_waps = {
                r["wap"]
                for r in _list_txns(self.spark, self.root)
                if r["state"] == "committing"
            }
            if committing_waps:
                for ov, owap in sorted(store.staged_versions().items()):
                    if owap == self.wap or owap not in committing_waps:
                        continue
                    oraw = store._read_manifest_raw(ov)
                    if oraw["mode"] != "delete_keys":
                        continue
                    own = [
                        d
                        for d in store._read_manifest(ov).get(
                            "delete_sets", []
                        )
                        if int(d["version"]) == ov
                    ]
                    for entry in own:
                        why = store._delete_may_target(
                            entry, claims[root], pby
                        )
                        if why is None:
                            continue
                        raise SnapshotConflict(
                            f"txn {self.txn_id}: a CLAIMED concurrent "
                            f"transaction ({owap}) holds a staged delete "
                            f"(v{ov}) on {root} whose roll-forward cannot "
                            f"refuse, and {why}; abort or wait for its "
                            "publish and re-stage (no WAL claim was made)"
                        )
        return claims

    def commit(self) -> None:
        """Validate overwrite claims, claim the WAL record (the commit
        point), publish every table's stage in sorted-root order, mark
        committed.  A crash after the claim is repaired forward by
        :func:`recover`; publish runs with ``force_overwrite_replay``
        so a race landing inside the validate-to-claim window resolves
        last-writer-wins (by claim order) instead of wedging."""
        if self._done:
            raise ValueError(f"txn {self.txn_id} already finished")
        if not self._stores:
            raise ValueError("nothing staged in this transaction")
        self._claims = self._validate_overwrites()
        # Head read deliberately LAST before the claim write: an append
        # committing inside this narrowest-possible window orders after
        # the delete by contract (see delete_keys docstring).
        self._del_heads = {
            root: int(self._stores[root].current_version())
            for root, mode in self._modes.items()
            if mode == "delete_keys"
        }
        path = _txn_path(self.root, self.txn_id)
        write_atomic_claim(
            self.spark,
            path,
            json.dumps(self._wal("committing")).encode("utf-8"),
            _txn_tmp(self.root, self.txn_id),
            what=f"txn {self.txn_id}",
        )
        _publish_all(
            self.spark, sorted(self._stores), self.wap, self._del_heads
        )
        write_atomic_replace(
            self.spark,
            path,
            json.dumps(self._wal("committed")).encode("utf-8"),
            _txn_tmp(self.root, self.txn_id),
        )
        self._done = True

    def abort(self) -> None:
        """Drop every staged write (manifests + data) and record the
        decision.  Refuses if the transaction already claimed its WAL
        (a claimed txn rolls FORWARD -- use :func:`recover`)."""
        if self._done:
            raise ValueError(f"txn {self.txn_id} already finished")
        path = _txn_path(self.root, self.txn_id)
        existing = _read_json(self.spark, path)
        if existing is not None and existing["state"] != "aborted":
            raise SnapshotConflict(
                f"txn {self.txn_id} already claimed "
                f"({existing['state']}); recover() it instead"
            )
        for root in sorted(self._stores):
            store = self._stores[root]
            if store.staged_versions(self.wap):
                store.abandon_staged(self.wap)
        try:
            write_atomic_claim(
                self.spark,
                path,
                json.dumps(self._wal("aborted")).encode("utf-8"),
                _txn_tmp(self.root, self.txn_id),
                what=f"txn {self.txn_id}",
            )
        except SnapshotConflict:
            # A record appeared between the probe above and this claim.
            # abort_orphans never writes WAL records, so "raced the
            # sweep" cannot explain it -- the probe read the record torn
            # (parses as absent) or a reused txn_id's coordinator
            # claimed concurrently.  Re-read and decide: a 'committing'
            # record means we may have just abandoned a CLAIMED
            # transaction's stages -- surface that instead of reporting
            # a clean abort.
            rec = _read_json(self.spark, path)
            if rec is not None and rec.get("state") == "committing":
                raise SnapshotConflict(
                    f"txn {self.txn_id}: a 'committing' WAL record "
                    "surfaced during abort -- its stages may have been "
                    "abandoned; run recover() and inspect 'stuck'"
                )
            # terminal record (committed/aborted) or still torn: the
            # abort decision stands, nothing claimed is at risk.
        self._done = True


def _publish_all(
    spark: SparkSession,
    roots: list[str],
    wap: str,
    delete_claim_heads: dict | None = None,
) -> None:
    """Publish ``wap`` on every table, skipping tables where it already
    published (idempotent roll-forward).  Always runs with
    ``force_overwrite_replay``: this path executes only AFTER a WAL
    claim (commit() or recover()), past the point of no return --
    overwrite conflicts were validated before the claim, and anything
    that landed inside the validate-to-claim window loses
    last-writer-wins to the claim holder.  ``delete_claim_heads``
    (root -> head version recorded at WAL-claim time) pins each staged
    delete's replay sequence number to the commit point, so a
    crash-delayed roll-forward never masks rows appended after the
    claim."""
    heads = delete_claim_heads or {}
    for root in roots:
        store = SnapshotStore(spark, root)
        if wap in store.committed_metadata("published_wap"):
            continue  # this table already rolled forward
        if not store.staged_versions(wap):
            raise SnapshotConflict(
                f"txn wap {wap!r} neither staged nor published on "
                f"{root}: stage was lost (abandoned out-of-band?)"
            )
        store.publish_staged(
            wap,
            force_overwrite_replay=True,
            delete_restamp_to=heads.get(root.rstrip("/")),
        )


def _list_txns(spark: SparkSession, coordinator_root: str) -> list[dict]:
    out = []
    for _txn_id, path in _wal_entries(spark, coordinator_root):
        rec = _read_json(spark, path)
        if rec is not None and rec.get("state") in _STATES:
            out.append(rec)
    return sorted(out, key=lambda r: r["ts_ms"])


def recover(spark: SparkSession, coordinator_root: str) -> dict:
    """Repair after a coordinator crash: every ``committing`` WAL record
    is rolled FORWARD (publish remaining tables, mark committed).
    Idempotent -- safe to run unconditionally at startup.  A record
    whose roll-forward itself refuses (possible only through
    out-of-band interference: a partition-spec evolution between stage
    and publish, or a stage abandoned by hand) is reported under
    ``stuck`` with its error instead of aborting the pass -- other
    transactions still recover.  Returns ``{"rolled_forward": [...],
    "already_terminal": n, "stuck": {txn_id: reason}}``."""
    rolled = []
    stuck: dict[str, str] = {}
    terminal = 0
    for rec in _list_txns(spark, coordinator_root):
        if rec["state"] != "committing":
            terminal += 1
            continue
        try:
            _publish_all(
                spark,
                list(rec["table_roots"]),
                rec["wap"],
                rec.get("delete_claim_heads"),
            )
        except SnapshotConflict as exc:
            stuck[rec["txn_id"]] = str(exc)
            continue
        write_atomic_replace(
            spark,
            _txn_path(coordinator_root, rec["txn_id"]),
            json.dumps({**rec, "state": "committed"}).encode("utf-8"),
            _txn_tmp(coordinator_root, rec["txn_id"]),
        )
        rolled.append(rec["txn_id"])
    return {
        "rolled_forward": rolled,
        "already_terminal": terminal,
        "stuck": stuck,
    }


def abort_orphans(
    spark: SparkSession,
    coordinator_root: str,
    table_roots: list[str],
    grace_ms: int = 24 * 3600 * 1000,
) -> list[str]:
    """Roll BACK transaction stages whose coordinator died before the
    WAL claim: staged ``txn-*`` wap ids on the given tables with NO WAL
    record and every staged commit older than ``grace_ms`` (the same
    age-gate expire_snapshots applies to orphan data dirs -- an
    in-flight young txn is indistinguishable from a dead one).  Returns
    the abandoned wap ids.

    The protection set derives from WAL FILENAMES (``<txn_id>.json`` ->
    ``txn-<txn_id>``), not parsed record contents: a record caught torn
    mid-write parses as absent, and content-derived protection would
    let the sweep roll back a CLAIMED transaction's stages -- after
    which its recover() raises "stage was lost".  The set is re-listed
    immediately before each drop (not once per sweep): a coordinator
    that claims AFTER the initial listing, whose stages were already
    past grace (a long-staging transaction), must keep them -- the
    re-list shrinks that TOCTOU window from the whole sweep to one
    call.

    A stage under a wap that ALREADY PUBLISHED on the table is a dead
    stage (a reused txn id staged again after its first life published,
    then lost the claim); once ``expire_txns`` drops the terminal WAL
    record it stops shielding the stage, and ``abandon_staged`` refuses
    published waps -- so dead stages take the dedicated
    ``drop_dead_staged`` path rather than crashing the sweep and
    leaking every orphan after them."""

    def _known() -> set:
        return {
            f"{TXN_WAP_PREFIX}{txn_id}"
            for txn_id, _path in _wal_entries(spark, coordinator_root)
        }

    known = _known()
    now = int(time.time() * 1000)
    dropped = []
    for root in table_roots:
        store = SnapshotStore(spark, root)
        by_wap: dict[str, list[int]] = {}
        for v, wap in store.staged_versions().items():
            if wap.startswith(TXN_WAP_PREFIX) and wap not in known:
                by_wap.setdefault(wap, []).append(v)
        for wap, versions in by_wap.items():
            ages = [
                now - store._read_manifest_raw(v)["committed_at_ms"]
                for v in versions
            ]
            if min(ages) < grace_ms:
                continue
            known = _known()
            if wap in known:
                continue  # claimed since the last listing; now protected
            if wap in store.committed_metadata("published_wap"):
                store.drop_dead_staged(wap)
            else:
                store.abandon_staged(wap)
            dropped.append(f"{root}::{wap}")
    return dropped


def expire_txns(
    spark: SparkSession,
    coordinator_root: str,
    keep_ms: int = 7 * 24 * 3600 * 1000,
) -> int:
    """Drop TERMINAL (committed/aborted) WAL records older than
    ``keep_ms``.  ``committing`` records are never expired -- they carry
    a roll-forward obligation.  Returns the number removed."""
    now = int(time.time() * 1000)
    n = 0
    for rec in _list_txns(spark, coordinator_root):
        if rec["state"] == "committing":
            continue
        if now - rec["ts_ms"] >= keep_ms:
            delete_prefix(
                spark, _txn_path(coordinator_root, rec["txn_id"])
            )
            n += 1
    return n


def expire_snapshots_txn_safe(
    spark: SparkSession,
    store: SnapshotStore,
    coordinator_root: str,
    **kw,
) -> dict:
    """Run ``store.expire_snapshots`` with every WAL-shielded ``txn-*``
    stage exempt from the age gate.  Plain ``expire_snapshots`` expires
    ANY staged snapshot older than ``orphan_grace_ms`` -- but a claimed
    transaction stuck mid-commit past the grace (table A published,
    coordinator crashed) still carries a roll-forward obligation on
    table B's stage; letting routine table maintenance reclaim it makes
    :func:`recover` report "stage was lost" forever, permanently
    half-applying the transaction.  Protection derives from WAL
    FILENAMES (torn records still shield, matching
    :func:`abort_orphans`); unshielded ``txn-*`` orphans keep aging out
    normally.  Tables that take transactional writes should expire
    through this wrapper, not directly."""
    protected = {
        f"{TXN_WAP_PREFIX}{txn_id}"
        for txn_id, _path in _wal_entries(spark, coordinator_root)
    }
    return store.expire_snapshots(protected_waps=protected, **kw)


def consistent_read(
    spark: SparkSession,
    coordinator_root: str,
    table_roots: list[str],
    retries: int = 20,
    wait_s: float = 0.25,
) -> dict[str, DataFrame]:
    """Cross-table snapshot-consistent read: pin every table's head
    version while NO claimed-but-unfinished transaction overlaps the
    table set, then read each table ``as_of`` its pin.  Retries through
    publish windows (they are metadata-only, O(tables) manifest writes);
    raises if one stays open past the retry budget -- at that point a
    coordinator crashed mid-commit and :func:`recover` is owed."""
    # Compare NORMALIZED roots on both sides: the WAL records normalized
    # roots since round 8, but older records (and caller-supplied
    # targets) may carry trailing slashes, and a slash mismatch here
    # silently defeats the cross-table consistency guard.
    targets = {r.rstrip("/") for r in table_roots}

    def _overlapping_inflight() -> bool:
        return any(
            r["state"] == "committing"
            and targets & {t.rstrip("/") for t in r["table_roots"]}
            for r in _list_txns(spark, coordinator_root)
        )

    for _ in range(retries):
        if not _overlapping_inflight():
            stores = {root: SnapshotStore(spark, root) for root in table_roots}
            pins = {root: s.current_version() for root, s in stores.items()}
            # Validate AFTER pinning: a multi-table commit is fast
            # (metadata-only), so one that claims between the scan and
            # the pins can have published into SOME of the pinned heads
            # -- and may already read 'committed' again, which a
            # committing-only re-check would miss.  Two conditions close
            # it: no overlapping record is mid-commit now, AND every
            # pinned head is still the head (any concurrent commit --
            # txn or ordinary writer -- moved a head between our pins,
            # so the pins may straddle it).
            moved = any(
                stores[root].current_version() != pins[root]
                for root in table_roots
            )
            if not _overlapping_inflight() and not moved:
                return {
                    root: stores[root].read(as_of=pins[root])
                    for root in table_roots
                }
        time.sleep(wait_s)
    raise SnapshotConflict(
        "a multi-table commit stayed in 'committing' past the retry "
        "budget; run transactions.recover() and retry the read"
    )
