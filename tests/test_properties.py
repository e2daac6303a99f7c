"""Property-based tests (hypothesis) for the conformance pass and the
cross-engine hash primitives.

Conformance invariants (reference utils.py:168-267 semantics): for ANY
incoming record shape, the output has exactly the declared columns in
declared order; extra keys never leak; missing keys are NULL; malformed
values cast to NULL, never raise (Spark 4 ANSI mode would throw on a
plain cast -- try_cast is load-bearing).

Hash invariants: h32 stays in [0, 2^32) (so MinHash's a*h+b stays in
int64 on engines that raise on overflow) and is deterministic; the
DuckDB twin produces identical values -- checked value-by-value against
duckdb in-process, which doubles as a regression net for the oracle
definitions themselves.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from docker_airflow_spark_minio_spark.conform import conform
from docker_airflow_spark_minio_spark.functions.hashing import h32, h32_sql

DESCRIBE = [
    {"col_name": "id", "data_type": "string", "order": 1},
    {"col_name": "qty", "data_type": "bigint", "order": 2},
    {"col_name": "price", "data_type": "double", "order": 3},
    {"col_name": "day", "data_type": "date", "order": 4},
]

record = st.dictionaries(
    keys=st.sampled_from(["id", "qty", "price", "day", "extra1", "weird key"]),
    values=st.one_of(
        st.none(),
        st.text(max_size=12),
        st.integers(min_value=-(2**40), max_value=2**40).map(str),
        st.sampled_from(["1.5", "not-a-number", "2024-01-31", "31/01/2024", ""]),
    ),
    max_size=6,
)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(record, min_size=1, max_size=8))
def test_conform_total_for_any_record_shape(spark, records):
    df = spark.createDataFrame(
        [(r,) for r in records], "m map<string,string>"
    ).selectExpr(
        *[
            f"m['{c}'] AS `{c}`"
            for c in {k for r in records for k in r} or {"id"}
        ]
    )
    out = conform(df, DESCRIBE)
    assert out.columns == ["id", "qty", "price", "day"]
    # count() executes the full plan JVM-side: try_cast never throwing on
    # any input (incl. the date column) is proven here.  collect() skips
    # `day`: Spark's proleptic calendar admits year-0 dates (e.g. the
    # string '0-1-1' casts fine) that Python's datetime.date cannot
    # represent -- a pyspark materialization limit, not a conform bug
    # (found by hypothesis).
    assert out.count() == len(records)
    for row in out.select("id", "qty", "price").collect():
        # every value is either NULL or of the declared type
        assert row["qty"] is None or isinstance(row["qty"], int)
        assert row["price"] is None or isinstance(row["price"], float)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.text(min_size=0, max_size=30), min_size=1, max_size=20, unique=True))
def test_h32_matches_duckdb_and_stays_32bit(spark, strings):
    sdf = spark.createDataFrame([(s,) for s in strings], "s string").select(
        "s", h32("s").alias("h")
    )
    got = {r["s"]: r["h"] for r in sdf.collect()}
    con = duckdb.connect()
    for s in strings:
        expected = con.execute(f"SELECT {h32_sql('?')}", [s]).fetchone()[0]
        assert got[s] == expected, f"h32 mismatch for {s!r}"
        assert 0 <= got[s] < 2**32


# -- merge_upsert model check ----------------------------------------------

# Rows are (key, day, seq); seqs are globally unique by construction so
# the latest-wins pick is fully determined and the dict model below is
# exact.  The deliberate-tie semantics (update beats existing on equal
# seq) are pinned separately in test_merge_upsert.py.
_mk_batches = st.lists(
    st.lists(
        st.tuples(st.integers(1, 4), st.sampled_from(["d1", "d2"])),
        min_size=1,
        max_size=5,
    ),
    min_size=1,
    max_size=3,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_mk_batches)
def test_merge_upsert_matches_dict_model(spark, tmp_path_factory, batches):
    from docker_airflow_spark_minio_spark.storage import TableManager

    tm = TableManager(spark, warehouse=str(tmp_path_factory.mktemp("wh")))
    schema = "k long, day string, v string, seq long"
    # model state: (k, day) may coexist across days; within the batch's
    # affected days the per-key latest wins globally.
    state: dict[tuple[int, str], tuple[str, int]] = {}
    seq = 0
    for batch in batches:
        rows = []
        for k, day in batch:
            seq += 1
            rows.append((k, day, f"v{seq}", seq))
        tm.merge_upsert(
            spark.createDataFrame(rows, schema),
            "dw.t", keys=["k"], partition_by=["day"], order_by="seq",
        )
        affected = {day for _, day, _, _ in rows}
        pool = [
            (k, day, v, s)
            for (k, day), (v, s) in state.items()
            if day in affected
        ] + rows
        for (k, day) in [key for key in state if key[1] in affected]:
            del state[(k, day)]
        best: dict[int, tuple[int, str, str]] = {}
        for k, day, v, s in pool:
            if k not in best or s > best[k][0]:
                best[k] = (s, day, v)
        for k, (s, day, v) in best.items():
            state[(k, day)] = (v, s)
        got = {
            (r["k"], r["day"]): (r["v"], r["seq"])
            for r in tm.read("dw.t").collect()
        }
        assert got == state


# -- snapshot log model check -----------------------------------------------

# Random sequences of snapshot-log operations checked against a dict
# model: every committed version's visible rows must equal the model's
# state AT THAT VERSION (time travel included), across write modes,
# compaction (row-preserving), and retention (drops old versions only).
_snap_ops = st.lists(
    st.one_of(
        st.tuples(
            st.sampled_from(["snapshot", "append", "overwrite_partitions"]),
            st.lists(
                st.tuples(st.integers(0, 99), st.sampled_from(["d1", "d2", "d3"])),
                min_size=1,
                max_size=4,
            ),
        ),
        st.just(("compact", None)),
        st.just(("expire", None)),
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_snap_ops)
def test_snapshot_log_matches_dict_model(spark, tmp_path_factory, ops):
    from docker_airflow_spark_minio_spark.snapshots import SnapshotStore

    store = SnapshotStore(spark, str(tmp_path_factory.mktemp("snap")) + "/t")
    schema = "id long, day string"
    # model: version -> multiset of (id, day); surviving = versions not
    # yet expired (read requires >= 1, expire keeps the newest 2)
    versions: dict[int, list[tuple[int, str]]] = {}
    seq = 0
    for op, rows in ops:
        head = max(versions) if versions else None
        if op == "compact":
            v = store.compact()
            if v is not None:
                versions[v] = list(versions[head])
            continue
        if op == "expire":
            if head is None:
                continue
            store.expire_snapshots(keep_last=2)
            for old in [k for k in versions if k < head - 1]:
                del versions[old]
            continue
        seq += 1
        rows = [(id_ + 100 * seq, day) for id_, day in rows]  # unique ids
        df = spark.createDataFrame(rows, schema)
        v = store.write(df, mode=op, partition_by=["day"])
        prev = versions.get(head, []) if head is not None else []
        if op == "snapshot" or head is None:
            versions[v] = list(rows)
        elif op == "append":
            versions[v] = prev + rows
        else:  # overwrite_partitions
            days = {d for _, d in rows}
            versions[v] = [r for r in prev if r[1] not in days] + rows
    for v, expect in versions.items():
        got = sorted((r["id"], r["day"]) for r in store.read(as_of=v).collect())
        assert got == sorted(expect), f"version {v}"


@given(
    st.lists(
        st.decimals(
            min_value="-99999999.999999",
            max_value="99999999.999999",
            places=6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=200, deadline=None)
def test_money_sum_matches_decimal_half_up(values):
    """The integer-micros money_sum SQL (run through DuckDB) must equal
    the exact-decimal model: per-value HALF_UP round to 6dp (a no-op for
    6dp inputs), exact sum, HALF_UP round to cents -- for any mix of
    signs and magnitudes.  DuckDB executes the identical text Spark
    does (trunc division via (t - t%b)/b), so this property pins the
    shared formula against an independent exact model."""
    import decimal

    from docker_airflow_spark_minio_spark.workloads.base import money_sum

    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(float(v),) for v in values])
    got = con.execute(f"SELECT {money_sum('x')} AS s FROM t").fetchone()[0]

    # exact model: round each double to integer micros half-up (away
    # from zero), integer-sum, round micros to cents half-up
    def micros(f: float) -> int:
        d = decimal.Decimal(f) * 1_000_000
        return int(d.to_integral_value(rounding=decimal.ROUND_FLOOR) + (
            1 if (d - d.to_integral_value(rounding=decimal.ROUND_FLOOR)) >= decimal.Decimal("0.5") else 0
        ))

    s = sum(micros(float(v)) for v in values)
    cents = (abs(s) + 5000) // 10000 * (1 if s >= 0 else -1)
    assert got == pytest.approx(cents / 100.0, abs=0)


@given(
    st.integers(min_value=-(2**62), max_value=2**62),
    st.sampled_from([2, 4]),
)
@settings(max_examples=300, deadline=None)
def test_micros_round_exact_past_2_53(micros_total, dp):
    """micros_round must be TRUE half-up (away from zero) for the full
    BIGINT micros range, not just below 2^53 -- the rounding division
    is decomposed into two provably exact double divisions recombined
    in BIGINT (ADVICE r5: the old single double-intermediate division
    could land one cent off past ~$9e9 per group, which TPC-H q1
    reaches at sf>=1; the DECIMAL(38,0) attempt was killed by a
    hypothesis counterexample -- DuckDB lowers decimal division to
    DOUBLE).  Model: exact integer half-up of
    micros -> 10^-dp units.  The final value is compared as the exact
    integer (re-multiplied), since the display double itself is allowed
    to be the nearest-double of a >2^53 integer."""
    from docker_airflow_spark_minio_spark.workloads.base import micros_round

    import decimal

    con = duckdb.connect()
    got = con.execute(f"SELECT {micros_round(str(micros_total), dp)}").fetchone()[0]
    b = 10 ** (6 - dp)
    want = (abs(micros_total) + b // 2) // b * (1 if micros_total >= 0 else -1)
    # `want` is the exact integer quotient the DECIMAL division must
    # produce; the SQL then displays CAST(want AS DOUBLE) / 10^dp.
    # While |want| < 2^53 the CAST is exact and the single division is
    # correctly rounded, so the display double must EQUAL the
    # correctly-rounded double of the exact ratio.  Past 2^53 the CAST
    # itself rounds, so allow the one extra rounding step (<= 1 ulp).
    true_double = float(decimal.Decimal(want) / (10**dp))
    if abs(want) < 2**53:
        assert got == true_double
    else:
        assert got == pytest.approx(true_double, rel=2**-51)


@pytest.mark.parametrize("micros_total", [5676543219876540000, -5676543219876540000, 2**53 + 2, 9007199254740992 * 10000 + 4999])
def test_micros_round_spark_duckdb_agree_huge(spark, micros_total):
    """Spark and DuckDB must produce IDENTICAL micros_round output for
    micros sums past 2^53 (the regime the old double-intermediate
    division made engine-divergence possible)."""
    from docker_airflow_spark_minio_spark.workloads.base import micros_round

    expr = micros_round(str(micros_total), 2)
    s = spark.sql(f"SELECT {expr} AS x").collect()[0][0]
    d = duckdb.connect().execute(f"SELECT {expr} AS x").fetchone()[0]
    assert s == d
    b, half = 10**4, 5000
    want = (abs(micros_total) + half) // b * (1 if micros_total >= 0 else -1)
    assert s == pytest.approx(want / 100.0, rel=2**-50)


@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-100, 100)),
            st.one_of(st.none(), st.integers(-100, 100)),
        ),
        min_size=0,
        max_size=4,
    ),
    st.lists(st.tuples(st.integers(-100, 100), st.integers(-100, 100)), min_size=1, max_size=4),
)
@settings(max_examples=300, deadline=None)
def test_zone_map_disjointness_is_sound(bounds, ranges):
    """The manifest pruning predicate must NEVER skip a file/dir that
    could hold a matching row: for every recorded [mn, mx] and filter
    [lo, hi], skipping requires provable disjointness, and missing or
    degenerate (None) stats must be inconclusive (kept).  Model: a unit
    is skippable only if NO value in [mn, mx] satisfies ALL ranges."""
    from docker_airflow_spark_minio_spark.snapshots import SnapshotStore

    cols = [f"c{i}" for i in range(len(bounds))]
    col_stats = {
        c: [mn, mx] for c, (mn, mx) in zip(cols, bounds)
    }
    flt = [
        (cols[i % max(len(cols), 1)] if cols else "c0", min(lo, hi), max(lo, hi))
        for i, (lo, hi) in enumerate(ranges)
    ]
    skipped = SnapshotStore._provably_disjoint(col_stats, flt)
    if skipped:
        # soundness: there must exist NO candidate value satisfying all
        # ranges for at least one constrained column with full stats
        def could_match(col, lo, hi):
            s = col_stats.get(col)
            if not s or s[0] is None or s[1] is None:
                return True  # unknown stats: could match
            mn, mx = s
            return not (mx < lo or mn > hi)

        assert not all(could_match(c, lo, hi) for c, lo, hi in flt)
