"""SQL-queryable snapshot tables under the correctness gate.

The reference's primary table-consumption pattern is SQL over a named
catalog table (its gold job: ``spark.sql("SELECT ... FROM
db.silver_table WHERE ...")``, /root/reference/spark/jobs/job_gold.py:71-88).
These entries exercise that pattern against the SNAPSHOT store through
the ``snapshot_table`` Python DataSource batch reader
(:mod:`..sources.snapshot_batch`):

 * :func:`snapshot_sql_pushdown_join` -- one SQL statement joining two
   snapshot-table views with the WHERE clause PUSHED into the manifest
   planner (``snapshot_sql``: fresh single-statement relations), the
   hidden-partitioning bucket pruning runtime-asserted through the SQL
   path's scan report;
 * :func:`snapshot_sql_view_pruned` -- the long-lived-view shape: a
   registered view with EXPLICIT option-level pruning (safe under the
   upstream one-slot readInfo cache; see snapshot_batch docstring),
   scanned twice to pin that repeated queries of the same view stay
   correct.

Scale notes (100 TB posture): planning is manifest-metadata only
(O(matching shards + surviving files), same as the API path); the scan
is one task per SURVIVING file.  A point lookup on the bucket transform
plans O(files of one bucket), never a listing of the table.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import load_tables, register, scratch_root

#: IN-list for the pushdown join: four customer keys -> at most four of
#: the eight o_custkey hash buckets, so >= 4 bucket dirs MUST prune at
#: plan time (the runtime assert).
SQL_PUSH_KEYS = [7, 118, 223, 350]
SQL_PUSH_BUCKETS = 8

# integer cents per row (deterministic across engines; see base.py's
# new-aggregate checklist -- double SUM order flakes at boundaries)
_CENTS = "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"


@register(
    "snapshot_sql_pushdown_join",
    oracle=f"""
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM({_CENTS}) AS BIGINT) AS revenue_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_custkey IN ({", ".join(str(k) for k in SQL_PUSH_KEYS)})
    GROUP BY segment ORDER BY segment
    """,
    category="etl",
    description="snapshot tables consumed as SQL (the reference's gold-"
    "job pattern): orders land as a hidden-partitioned snapshot table "
    f"(bucket({SQL_PUSH_BUCKETS}, o_custkey) + blooms), customer as a "
    "second table; ONE spark.sql statement joins the two views with the "
    "IN-list WHERE pushed through the Python DataSource filter-pushdown "
    "API into the manifest planner -- bucket-segment dir pruning is "
    "runtime-asserted from the SQL path's scan report (>= 4 of 8 bucket "
    "dirs skipped), and the aggregate must hash-match a direct join of "
    "the raw sources",
)
def snapshot_sql_pushdown_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..snapshots import SnapshotStore
    from ..streaming.table_source import snapshot_sql

    t = load_tables(spark, sf_dir)
    root_o = scratch_root("snapsql_orders", sf_dir)
    root_c = scratch_root("snapsql_cust", sf_dir)
    SnapshotStore(spark, root_o).write(
        t["orders"].select(
            "o_orderkey", "o_custkey", F.expr(_CENTS).alias("cents")
        ),
        mode="snapshot",
        partition_by=[f"bucket({SQL_PUSH_BUCKETS}, o_custkey)"],
        bloom_cols=["o_custkey"],
    )
    SnapshotStore(spark, root_c).write(
        t["customer"].select("c_custkey", "c_mktsegment"), mode="snapshot"
    )
    rep = f"{root_o}.report.json"
    out = snapshot_sql(
        spark,
        f"""
        SELECT c.c_mktsegment AS segment,
               COUNT(*) AS n_orders,
               SUM(o.cents) AS revenue_cents
        FROM snap_orders o JOIN snap_customer c
          ON o.o_custkey = c.c_custkey
        WHERE o.o_custkey IN ({", ".join(str(k) for k in SQL_PUSH_KEYS)})
        GROUP BY segment ORDER BY segment
        """,
        {"snap_orders": root_o, "snap_customer": root_c},
        report_paths={"snap_orders": rep},
    )
    rows = out.collect()  # plan + scan now, so the report exists
    report = json.load(open(rep))
    # the pruning claim IS the entry: the IN-list hits at most
    # len(keys) of the bucket dirs, the rest must be plan-time skipped
    min_skipped = SQL_PUSH_BUCKETS - len(SQL_PUSH_KEYS)
    if report["n_dirs_skipped"] < min_skipped:
        raise AssertionError(
            "bucket pruning missing through the SQL path: "
            f"{report['n_dirs_skipped']} dirs skipped of "
            f"{report['n_dirs_total']} (expected >= {min_skipped}); "
            f"report={report}"
        )
    if sorted(report["pushed_points"]) != ["o_custkey"]:
        raise AssertionError(f"IN-list not pushed: {report}")
    return spark.createDataFrame(rows, out.schema)


@register(
    "snapshot_sql_projected_scan",
    oracle="""
    SELECT l_returnflag AS flag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    WHERE l_orderkey % 11 = 0
    GROUP BY flag ORDER BY flag
    """,
    category="etl",
    description="PROJECTION through the SQL path: the full 16-column "
    "lineitem slice lands as a snapshot table, and one snapshot_sql "
    "statement referencing only 3 of its columns must decode only "
    "those (the Python DataSource API has no column-pruning hook, so "
    "snapshot_sql INFERS a columns option from the statement's "
    "identifiers) -- runtime-asserted from the scan report "
    "(n_cols_projected=3 < n_cols_table=16), and the aggregate must "
    "hash-match the raw-source oracle",
)
def snapshot_sql_projected_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..snapshots import SnapshotStore
    from ..streaming.table_source import snapshot_sql

    li = (
        load_tables(spark, sf_dir)["lineitem"]
        .where("l_orderkey % 11 = 0")
        .withColumn("l_quantity", F.col("l_quantity").cast("bigint"))
    )
    root = scratch_root("snapsql_proj", sf_dir)
    SnapshotStore(spark, root).write(li, mode="snapshot")
    rep = f"{root}.report.json"
    out = snapshot_sql(
        spark,
        """
        SELECT l_returnflag AS flag,
               COUNT(*) AS n_items,
               SUM(l_quantity) AS sum_qty
        FROM snap_li GROUP BY flag ORDER BY flag
        """,
        {"snap_li": root},
        report_paths={"snap_li": rep},
    )
    rows = out.collect()
    report = json.load(open(rep))
    n_table = len(li.columns)
    if not (
        report["n_cols_projected"] < report["n_cols_table"] == n_table
    ):
        raise AssertionError(
            "projection missing through the SQL path: "
            f"{report['n_cols_projected']} of {report['n_cols_table']} "
            f"columns decoded (table has {n_table})"
        )
    if sorted(report["columns"]) != ["l_quantity", "l_returnflag"]:
        raise AssertionError(f"unexpected inferred projection: {report}")
    return spark.createDataFrame(rows, out.schema)


@register(
    "snapshot_sql_insert_write",
    oracle=f"""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM({_CENTS}) AS BIGINT) AS revenue_cents
    FROM orders
    WHERE o_custkey % 37 IN (0, 1)
    GROUP BY status ORDER BY status
    """,
    category="etl",
    description="the SQL WRITE path (the reference writes via the table "
    "catalog, job_silver.py:174-178): two INSERT INTO statements through "
    "snapshot_sql commit slices of an orders snapshot table into a "
    "target table via the Python DataSource batch writer -- executor "
    "tasks write the parquet files, the Spark-less commit goes through "
    "the store's atomic link(2) claim and the SAME manifest assembler "
    "as the API path; the entry runtime-asserts both commits carry the "
    "sql_write marker and the read-back aggregate (also via SQL) must "
    "hash-match the raw-source oracle",
)
def snapshot_sql_insert_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..snapshots import SnapshotStore
    from ..streaming.table_source import snapshot_sql

    t = load_tables(spark, sf_dir)
    root_src = scratch_root("snapins_src", sf_dir)
    root_tgt = scratch_root("snapins_tgt", sf_dir)
    SnapshotStore(spark, root_src).write(
        t["orders"].select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.expr(_CENTS).alias("cents"),
        ),
        mode="snapshot",
    )
    for pred in ("o_custkey % 37 = 0", "o_custkey % 37 = 1"):
        snapshot_sql(
            spark,
            "INSERT INTO tgt SELECT o_orderkey, o_orderstatus, cents "
            f"FROM src WHERE {pred}",
            {"src": root_src, "tgt": root_tgt},
        )
    tgt = SnapshotStore(spark, root_tgt)
    metas = [
        tgt._read_manifest(m["version"]).get("metadata", {})
        for m in tgt.history()
    ]
    if len(metas) != 2 or not all(m.get("sql_write") for m in metas):
        raise AssertionError(
            f"expected 2 sql_write commits on the target, got {metas}"
        )
    return snapshot_sql(
        spark,
        """
        SELECT o_orderstatus AS status,
               COUNT(*) AS n_orders,
               SUM(cents) AS revenue_cents
        FROM tgt GROUP BY status ORDER BY status
        """,
        {"tgt": root_tgt},
    )


@register(
    "snapshot_sql_insert_bucketed",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM({_CENTS}) AS BIGINT) AS revenue_cents,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM orders WHERE o_custkey IN ({", ".join(str(k) for k in SQL_PUSH_KEYS)})
    """,
    category="etl",
    description="SQL writes INTO a HIDDEN-PARTITIONED table (round 12: "
    "the DataSource writer recomputes bucket routing with "
    "numpy-vectorized xxhash twins, bit-exact with Catalyst): the "
    "bucket(8, o_custkey) table is CREATED by one SQL write and grown "
    "by an INSERT INTO through snapshot_sql, then a point lookup on "
    "the SQL-written data must BOTH prune to the probed buckets "
    "(runtime-asserted from the scan report: surviving dirs <= probed "
    "keys x 2 commits -- proof the rows landed in exactly the "
    "directories plan-time pruning expects) AND hash-match the "
    "raw-source oracle",
)
def snapshot_sql_insert_bucketed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..snapshots import SnapshotStore
    from ..streaming.table_source import snapshot_sql, write_snapshot_table

    t = load_tables(spark, sf_dir)
    orders = t["orders"].select(
        "o_orderkey", "o_custkey", F.expr(_CENTS).alias("cents")
    )
    root_src = scratch_root("snapins_bkt_src", sf_dir)
    root_tgt = scratch_root("snapins_bkt_tgt", sf_dir)
    SnapshotStore(spark, root_src).write(orders, mode="snapshot")
    # CREATE via the SQL write path, transform spec in the option
    write_snapshot_table(
        spark,
        orders.where("o_custkey % 2 = 1"),
        root_tgt,
        partition_by=[f"bucket({SQL_PUSH_BUCKETS}, o_custkey)"],
    )
    # grow via INSERT INTO (spec inherited from the table)
    snapshot_sql(
        spark,
        "INSERT INTO tgt SELECT o_orderkey, o_custkey, cents FROM src "
        "WHERE o_custkey % 2 = 0",
        {"src": root_src, "tgt": root_tgt},
    )
    rep = f"{root_tgt}.report.json"
    out = snapshot_sql(
        spark,
        f"""
        SELECT COUNT(*) AS n_orders,
               SUM(cents) AS revenue_cents,
               MIN(o_orderkey) AS min_key,
               MAX(o_orderkey) AS max_key
        FROM tgt
        WHERE o_custkey IN ({", ".join(str(k) for k in SQL_PUSH_KEYS)})
        """,
        {"tgt": root_tgt},
        report_paths={"tgt": rep},
    )
    rows = out.collect()
    report = json.load(open(rep))
    surviving = report["n_dirs_total"] - report["n_dirs_skipped"]
    # two commits x at most len(keys) probed buckets may survive; more
    # would mean SQL-written rows landed outside their bucket dirs
    if not (0 < surviving <= 2 * len(SQL_PUSH_KEYS)):
        raise AssertionError(
            "bucket pruning over SQL-written data is wrong: "
            f"{surviving} dirs survive of {report['n_dirs_total']} "
            f"(expected <= {2 * len(SQL_PUSH_KEYS)}); report={report}"
        )
    return spark.createDataFrame(rows, out.schema)


@register(
    "snapshot_sql_mor_read",
    oracle=f"""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM({_CENTS}) AS BIGINT) AS revenue_cents,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM orders
    WHERE o_orderkey % 97 <> 0 AND o_orderkey % 101 <> 0
    GROUP BY status ORDER BY status
    """,
    category="etl",
    description="SQL read over a snapshot table with LIVE merge-on-read "
    "deletes of BOTH kinds: orders land identity-partitioned by "
    "o_orderstatus, an EQUALITY delete keyed on (o_orderstatus, "
    "o_orderkey) -- the key shape that includes an identity PARTITION "
    "column, whose value lives in the directory name, not the file "
    "(advisor-flagged: the SQL path used to null-fill it and resurrect "
    "deleted rows) -- removes every key divisible by 97, a POSITIONAL "
    "delete removes keys divisible by 101, and the aggregate through "
    "snapshot_sql must hash-match the raw-source oracle that excludes "
    "both; the entry runtime-asserts both delete kinds are live in the "
    "manifest (so the scan really traverses both masking arms, now "
    "vectorized pyarrow.compute end-to-end)",
)
def snapshot_sql_mor_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..snapshots import SnapshotStore
    from ..streaming.table_source import snapshot_sql

    orders = load_tables(spark, sf_dir)["orders"].select(
        "o_orderkey", "o_orderstatus", F.expr(_CENTS).alias("cents")
    )
    root = scratch_root("snapsql_mor", sf_dir)
    s = SnapshotStore(spark, root)
    s.write(orders, mode="snapshot", partition_by=["o_orderstatus"])
    eq_keys = orders.where("o_orderkey % 97 = 0").select(
        "o_orderstatus", "o_orderkey"
    )
    if eq_keys.limit(1).isEmpty():
        raise AssertionError("no %97 keys at this SF: entry is vacuous")
    s.delete_keys(eq_keys, ["o_orderstatus", "o_orderkey"])
    if s.delete_where(F.expr("o_orderkey % 101 = 0")) is None:
        raise AssertionError("no %101 rows at this SF: entry is vacuous")
    kinds = {
        d.get("kind", "equality")
        for d in s._read_manifest(s.current_version()).get(
            "delete_sets", []
        )
    }
    if kinds != {"equality", "positional"}:
        raise AssertionError(
            f"expected both live MoR delete kinds, manifest has {kinds}"
        )
    return snapshot_sql(
        spark,
        """
        SELECT o_orderstatus AS status,
               COUNT(*) AS n_orders,
               SUM(cents) AS revenue_cents,
               MIN(o_orderkey) AS min_key,
               MAX(o_orderkey) AS max_key
        FROM snap_mor_orders GROUP BY status ORDER BY status
        """,
        {"snap_mor_orders": root},
    )


@register(
    "snapshot_sql_update_read",
    oracle=f"""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM({_CENTS} + CASE WHEN o_orderstatus = 'F'
                                     AND o_custkey % 13 = 0
                                    THEN 100 ELSE 0 END) AS BIGINT)
               AS revenue_cents
    FROM orders
    WHERE o_orderkey % 101 <> 0
    GROUP BY status ORDER BY status
    """,
    category="etl",
    description="SQL row-level statements (round 13; the Iceberg-on-"
    "Spark surface the reference's users get): an `UPDATE t SET "
    "cents = cents + 100 WHERE o_orderstatus = 'F' AND o_custkey % 13 "
    "= 0` statement through snapshot_sql routes to the copy-on-write "
    "update_where rewrite -- the entry runtime-asserts the UNtouched "
    "status partitions kept their v0 directories (touched-partition "
    "rewrite, not a table rewrite) -- then a `DELETE FROM t WHERE "
    "o_orderkey % 101 = 0` statement lands as a merge-on-read "
    "positional delete set (runtime-asserted live in the manifest, no "
    "data rewritten); the read-back aggregate (also via SQL) must "
    "hash-match the raw-source oracle applying both statements",
)
def snapshot_sql_update_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..snapshots import SnapshotStore
    from ..streaming.table_source import snapshot_sql

    orders = load_tables(spark, sf_dir)["orders"].select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.expr(_CENTS).alias("cents"),
    )
    root = scratch_root("snapsql_upd", sf_dir)
    s = SnapshotStore(spark, root)
    s.write(orders, mode="snapshot", partition_by=["o_orderstatus"])
    v = snapshot_sql(
        spark,
        "UPDATE t SET cents = cents + 100 "
        "WHERE o_orderstatus = 'F' AND o_custkey % 13 = 0",
        {"t": root},
    ).collect()[0]["version"]
    if v != 1:
        raise AssertionError(f"UPDATE did not commit v1 (got {v})")
    m = s._read_manifest(v)
    untouched = [
        p for p in m["partitions"] if p != "o_orderstatus=F"
    ]
    if not untouched or not all(
        vd.startswith("v0-")
        for p in untouched
        for vd in m["partitions"][p]
    ):
        raise AssertionError(
            "COW UPDATE rewrote partitions its predicate never "
            f"touched: {m['partitions']}"
        )
    v2 = snapshot_sql(
        spark, "DELETE FROM t WHERE o_orderkey % 101 = 0", {"t": root}
    ).collect()[0]["version"]
    if v2 != 2:
        raise AssertionError(f"DELETE did not commit v2 (got {v2})")
    if not any(
        d.get("kind") == "positional"
        for d in s._read_manifest(v2).get("delete_sets", [])
    ):
        raise AssertionError(
            "SQL DELETE default must land as a positional MoR set"
        )
    return snapshot_sql(
        spark,
        """
        SELECT o_orderstatus AS status,
               COUNT(*) AS n_orders,
               SUM(cents) AS revenue_cents
        FROM t GROUP BY status ORDER BY status
        """,
        {"t": root},
    )


#: MERGE thresholds over integer cents (cents ~ o_totalprice * 100):
#: doubled-cents above UPDATE_T update, below it delete; source-only
#: rows insert only below INSERT_C -- all three clause arms populated
#: at every shipped SF (runtime-asserted).
MERGE_UPDATE_T = 20_000_000
MERGE_INSERT_C = 50_000_000
#: by-source delete threshold: target-only rows below this many cents
#: are dropped by the WHEN NOT MATCHED BY SOURCE arm (the full-sync
#: MERGE shape)
MERGE_BS_DELETE_D = 5_000_000


@register(
    "snapshot_sql_merge_read",
    oracle=f"""
    WITH oc AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CAST({_CENTS} AS BIGINT) AS cents
        FROM orders
    ), merged AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_custkey % 6 = 0 THEN 2 * cents
                    ELSE cents END AS cents
        FROM oc
        WHERE o_custkey % 3 = 0
          AND NOT (o_custkey % 6 = 0 AND 2 * cents <= {MERGE_UPDATE_T})
          AND NOT (o_custkey % 2 <> 0 AND cents < {MERGE_BS_DELETE_D})
        UNION ALL
        SELECT o_orderkey, o_orderstatus, 2 * cents AS cents
        FROM oc
        WHERE o_custkey % 2 = 0 AND o_custkey % 3 <> 0
          AND 2 * cents <= {MERGE_INSERT_C}
    )
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM merged GROUP BY status ORDER BY status
    """,
    category="etl",
    description="full conditional-clause MERGE INTO via SQL (round 13; "
    "Iceberg-on-Spark's headline statement): target = orders slice "
    "(custkey%3=0) as a status-partitioned snapshot table, source = "
    "doubled-cents slice (custkey%2=0) as a second snapshot table; "
    "one MERGE statement exercises all FOUR clause arms -- WHEN "
    "MATCHED AND cents>T THEN UPDATE SET, WHEN MATCHED THEN DELETE, "
    "WHEN NOT MATCHED AND cents<=C THEN INSERT (cols) VALUES, and "
    "WHEN NOT MATCHED BY SOURCE AND cents<D THEN DELETE (the "
    "full-sync arm over unmatched target rows) -- "
    "routed to SnapshotStore.merge_into's copy-on-write touched-"
    "partition rewrite (ON-key-unique, cardinality-validated, "
    "require_parent_v-pinned single atomic commit); the read-back "
    "aggregate must hash-match the oracle's relational restatement of "
    "the clause semantics, and the entry runtime-asserts every arm "
    "changed at least one row",
)
def snapshot_sql_merge_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..snapshots import SnapshotStore
    from ..streaming.table_source import snapshot_sql

    orders = load_tables(spark, sf_dir)["orders"].select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.expr(_CENTS).alias("cents"),
    )
    root_t = scratch_root("snapsql_mrg_t", sf_dir)
    root_s = scratch_root("snapsql_mrg_s", sf_dir)
    tgt = SnapshotStore(spark, root_t)
    tgt.write(
        orders.where("o_custkey % 3 = 0").select(
            "o_orderkey", "o_orderstatus", "cents"
        ),
        mode="snapshot",
        partition_by=["o_orderstatus"],
    )
    SnapshotStore(spark, root_s).write(
        orders.where("o_custkey % 2 = 0").select(
            "o_orderkey",
            "o_orderstatus",
            (F.col("cents") * 2).alias("cents"),
        ),
        mode="snapshot",
    )
    n_before = tgt.read().count()
    v = snapshot_sql(
        spark,
        f"""MERGE INTO t USING s ON t.o_orderkey = s.o_orderkey
            WHEN MATCHED AND s.cents > {MERGE_UPDATE_T}
                THEN UPDATE SET cents = s.cents
            WHEN MATCHED THEN DELETE
            WHEN NOT MATCHED AND s.cents <= {MERGE_INSERT_C}
                THEN INSERT (o_orderkey, o_orderstatus, cents)
                     VALUES (s.o_orderkey, s.o_orderstatus, s.cents)
            WHEN NOT MATCHED BY SOURCE AND t.cents < {MERGE_BS_DELETE_D}
                THEN DELETE""",
        {"t": root_t, "s": root_s},
    ).collect()[0]["version"]
    if v != 1:
        raise AssertionError(f"MERGE did not commit exactly once (v={v})")
    # every clause arm must have fired, or the entry is vacuous: arm
    # counts recomputed relationally from the raw slice
    arms = orders.select(
        F.sum(
            F.expr(
                "CAST(o_custkey % 6 = 0 AND "
                f"2 * cents > {MERGE_UPDATE_T} AS INT)"
            )
        ).alias("n_upd"),
        F.sum(
            F.expr(
                "CAST(o_custkey % 6 = 0 AND "
                f"2 * cents <= {MERGE_UPDATE_T} AS INT)"
            )
        ).alias("n_del"),
        F.sum(
            F.expr(
                "CAST(o_custkey % 2 = 0 AND o_custkey % 3 <> 0 AND "
                f"2 * cents <= {MERGE_INSERT_C} AS INT)"
            )
        ).alias("n_ins"),
        F.sum(
            F.expr(
                "CAST(o_custkey % 3 = 0 AND o_custkey % 2 <> 0 AND "
                f"cents < {MERGE_BS_DELETE_D} AS INT)"
            )
        ).alias("n_bs"),
    ).collect()[0]
    if not (
        arms["n_upd"] and arms["n_del"] and arms["n_ins"] and arms["n_bs"]
    ):
        raise AssertionError(f"a MERGE clause arm fired on 0 rows: {arms}")
    n_after = tgt.read().count()
    expect = n_before - arms["n_del"] - arms["n_bs"] + arms["n_ins"]
    if n_after != expect:
        raise AssertionError(
            f"MERGE row accounting off: expected {expect}, got {n_after}"
        )
    return snapshot_sql(
        spark,
        """
        SELECT o_orderstatus AS status,
               COUNT(*) AS n_rows,
               SUM(cents) AS revenue_cents,
               MIN(o_orderkey) AS min_key,
               MAX(o_orderkey) AS max_key
        FROM t GROUP BY status ORDER BY status
        """,
        {"t": root_t},
    )


@register(
    "snapshot_join_manifest_planned",
    oracle=f"""
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM({_CENTS}) AS BIGINT) AS revenue_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY segment ORDER BY segment
    """,
    category="etl",
    description="ANALYZE-less join planning from MANIFEST statistics "
    "(plans/join_stats.py): orders and customer land as snapshot "
    "tables with exact manifest row counts plus mergeable HLL NDV "
    "sketches on the join key (write(ndv_cols=...)); the join strategy "
    "is chosen from table metadata alone -- Spark's own size-based "
    "auto-broadcast is DISABLED for the run, and the entry "
    "runtime-asserts the decision picked broadcast for the dimension "
    "side AND that BroadcastHashJoin appears in the executed plan "
    "(manifest stats alone flipped SMJ to broadcast); the aggregate "
    "must hash-match a direct join of the raw sources",
)
def snapshot_join_manifest_planned(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Scale notes: the decision is metadata-plane (manifest JSON + two
    1-row sketch estimates), so a 1000-table pipeline can plan joins
    without ANALYZE scans; a conservative miss only costs a shuffle
    that AQE re-plans.  The NDV lower bound refuses broadcasts when
    MoR deletes make row counts unprovable (tests/test_join_stats.py)."""
    from ..plans import physical_plan
    from ..plans.join_stats import join_snapshot_tables
    from ..snapshots import SnapshotStore

    t = load_tables(spark, sf_dir)
    root_o = scratch_root("snapjoin_orders", sf_dir)
    root_c = scratch_root("snapjoin_cust", sf_dir)
    facts = SnapshotStore(spark, root_o)
    facts.write(
        t["orders"].select(
            "o_orderkey", "o_custkey", F.expr(_CENTS).alias("cents")
        ),
        mode="snapshot",
        stats_cols=["o_orderkey"],
        ndv_cols=["o_custkey"],
    )
    dim = SnapshotStore(spark, root_c)
    dim.write(
        t["customer"].select(
            F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
        ),
        mode="snapshot",
        stats_cols=["o_custkey"],
        ndv_cols=["o_custkey"],
    )
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        joined, decision = join_snapshot_tables(facts, dim, "o_custkey")
        if decision.strategy != "broadcast_right":
            raise AssertionError(
                f"expected broadcast_right from manifest stats: {decision}"
            )
        if "BroadcastHashJoin" not in physical_plan(joined):
            raise AssertionError(
                "manifest-stats broadcast hint missing from the plan"
            )
        out = (
            joined.groupBy(F.col("c_mktsegment").alias("segment"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("cents").alias("revenue_cents"),
            )
            .orderBy("segment")
        )
        rows = out.collect()
    finally:
        spark.conf.set(key, old)
    return spark.createDataFrame(rows, out.schema)


@register(
    "snapshot_sql_view_pruned",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM orders
    WHERE o_orderkey >= 1000 AND o_orderkey <= 4999
    GROUP BY status ORDER BY status
    """,
    category="etl",
    description="the long-lived-VIEW consumption shape: a snapshot "
    "table registered once as a temp view with an EXPLICIT option-level "
    "range filter (the safe pruning path under the upstream one-slot "
    "readInfo cache -- identical for every scan of the relation, "
    "applied row-exactly by the tasks), range-clustered files so the "
    "planner skips non-intersecting files (runtime-asserted from the "
    "scan report), and the SAME view scanned twice with identical "
    "results (the repeatability claim pushdown relations cannot make)",
)
def snapshot_sql_view_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..snapshots import SnapshotStore
    from ..streaming.table_source import register_snapshot_view

    orders = load_tables(spark, sf_dir)["orders"].select(
        "o_orderkey", "o_orderstatus"
    )
    root = scratch_root("snapsql_view", sf_dir)
    SnapshotStore(spark, root).write(
        orders.repartitionByRange(8, "o_orderkey"),
        mode="snapshot",
        stats_cols=["o_orderkey"],
    )
    rep = f"{root}.report.json"
    register_snapshot_view(
        spark,
        root,
        "snap_view_orders",
        range_filter=[("o_orderkey", 1000, 4999)],
        report_path=rep,
    )
    sql = """
        SELECT o_orderstatus AS status,
               COUNT(*) AS n_orders,
               MIN(o_orderkey) AS min_key,
               MAX(o_orderkey) AS max_key
        FROM snap_view_orders GROUP BY status ORDER BY status
    """
    first = [tuple(r) for r in spark.sql(sql).collect()]
    report = json.load(open(rep))
    if not (0 < report["n_files_skipped"] < report["n_files_total"]):
        raise AssertionError(
            f"expected partial file pruning through the view: {report}"
        )
    second = spark.sql(sql)
    if [tuple(r) for r in second.collect()] != first:
        raise AssertionError(
            "repeated scans of the option-pruned view diverged"
        )
    return second
