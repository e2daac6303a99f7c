"""Plan-inspection assertions (the 100-TB posture as CI checks), C8 date
derivation, and the single-entry pipeline driver."""

from __future__ import annotations

import json
from datetime import datetime, timezone

from docker_airflow_spark_minio_spark import plans
from docker_airflow_spark_minio_spark.dates import (
    load_date,
    load_date_col,
    load_datetime_fixed_offset,
)
from docker_airflow_spark_minio_spark.jobs import run_pipeline
from docker_airflow_spark_minio_spark.sources.rest import PaginatedRestSource
from docker_airflow_spark_minio_spark.workloads import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


# -- plans ----------------------------------------------------------------


def test_filter_and_projection_reach_the_scan(spark):
    df = REGISTRY["filter_pushdown_scan"].fn(spark, SF_DIR)
    pushed = plans.pushed_filters(df)
    assert any("l_quantity" in f for f in pushed)
    assert any("l_returnflag" in f for f in pushed)
    # column pruning: only the 2 filter + 4 output columns are read
    assert plans.read_schema_columns(df) <= {
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag",
    }


def test_no_cartesian_anywhere_in_the_registry(spark):
    # deliberate broadcast cross joins against tiny, bounded sides only:
    # the fixed query set (brute-force ANN baseline), the hour-grid x
    # distinct-event-type lattice (gap-fill), the 1x1/1xT scalar combines
    # of sketch estimates with exact counts, and the single-row centroid
    # model attach (IVF + k-means)
    allowed = {
        "ann_cosine_topk_bruteforce",
        # eval-suite-sized benchmark side broadcast against the train
        # scan (the brute-force-baseline pattern, cross-set)
        "semantic_decontam_audit",
        "timeseries_gapfill_hourly",
        "sketch_hll_merge_bound",
        "sketch_mg_heavy_hitters",
        "ann_ivf_topk",
        "q11_important_parts",
        "kmeans_embedding_buckets",
        "dedup_semantic_representatives",  # composes kmeans_assign
        "ann_lsh_recall_at_k",  # composes the brute-force baseline
        # single-row COUNT(*) attach deriving the corpus-scaled LSH
        # bucket width (workloads/dedup.py) -- broadcast 1x1, not data
        "dedup_embedding_cosine_pairs",
        # single-row PQ codebook model attach (the kmeans/IVF pattern)
        "ann_pq_adc_topk",
        "ann_ivfpq_topk",  # coarse + PQ codebook single-row attaches
        # single-row corpus-stats (N, avgdl, df) attach for BM25 scoring
        "text_bm25_topk",
        # BM25 stats attach + single query-vector attach (round 5)
        "retrieval_rrf_hybrid_topk",
        # composes the brute-force baseline + IVF (both allowed above)
        "ann_ivf_recall_at_k",
        # single-row fitted-quantizer model attach (round 6): the new
        # batch maps against ONE broadcast array<struct> centroid value
        "ann_ivf_incremental_assign",
        # single-row total-token-count attach for the e*N/W width bound
        # (the Q11 global-total pattern; the sketch side is <= D*W rows)
        "sketch_cms_point_queries",
        # round 7: 1-row weight-total / min attach over the per-source
        # aggregate (rows == number of sources)
        "corpus_temperature_weights",
        # round 7: theta / exact-count scalar attaches over <= types*K
        # retained sketch hashes -- every cross side is a 1-row aggregate
        "sketch_kmv_theta_setops",
        # round 7: composes the brute-force baseline (allowed above) and
        # its own broadcast fixed query set for the truncated side
        "ann_matryoshka_truncation_recall",
        # round 10: the same single-row frozen-quantizer model attach as
        # ann_ivf_topk / ann_ivf_incremental_assign, read back from the
        # committed snapshot table (broadcast 1x1, never data x data)
        "ann_ivf_persisted_index",
        "ann_ivf_drift_monitor",
    }
    for name, wl in REGISTRY.items():
        if name in allowed:
            continue
        assert not plans.has_cartesian_product(
            wl.fn(spark, SF_DIR)
        ), f"{name} has a cartesian/nested-loop join"


def test_chunking_is_map_only_before_the_rollup(spark):
    # The chunk fan-out is array expressions, never an explode: the only
    # exchanges are the final per-source aggregation + output sort, and
    # the scan reads just the two needed columns.
    df = REGISTRY["text_chunk_sliding_windows"].fn(spark, SF_DIR)
    assert plans.shuffle_count(df) <= 2
    assert plans.read_schema_columns(df) <= {"source", "text"}


def test_scd2_windows_share_one_shuffle(spark):
    # Change detection (lag) and interval close (lead) both partition by
    # user_id: Catalyst must plan ONE hash exchange (+ the output sort).
    df = REGISTRY["scd2_user_event_history"].fn(spark, SF_DIR)
    assert plans.shuffle_count(df) <= 2


def test_uniform_sample_plans_as_take_ordered(spark):
    # Top-N by hash must be partial-top-N-per-partition, not a global
    # sort of the corpus.
    df = REGISTRY["corpus_uniform_hash_sample"].fn(spark, SF_DIR)
    plan = plans.physical_plan(df)
    assert "TakeOrderedAndProject" in plan


def test_profile_scans_prune_to_single_columns(spark):
    # Round 5: one branch per column, each scan PRUNED to exactly its
    # column (total bytes ~ one full-row scan in columnar storage) and
    # no Expand -- the combined 11-way multi-distinct form replicated
    # every wide row 12x through an Expand and measured 3x slower.
    df = REGISTRY["profile_lineitem_columns"].fn(spark, SF_DIR)
    plan = plans.physical_plan(df)
    assert plan.count("FileScan parquet") == 11
    assert "Expand" not in plan
    import re

    for schema in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        assert schema.count(":") == 1, f"unpruned scan: {schema}"


def test_star_join_broadcasts_fixed_dims(spark):
    df = REGISTRY["q5_local_supplier_volume"].fn(spark, SF_DIR)
    assert plans.broadcast_join_count(df) >= 2  # nation + region at least


# -- dates (C8) -----------------------------------------------------------


def test_load_date_zone_aware():
    # 01:30 UTC is still the previous day in Sao Paulo (UTC-3)
    assert load_date(datetime(2024, 10, 19, 1, 30, tzinfo=timezone.utc)) == "2024-10-18"
    assert load_date(datetime(2024, 10, 19, 12, 0, tzinfo=timezone.utc)) == "2024-10-19"


def test_reference_fixed_offset_parity():
    # reference get_datetime_UTC_SaoPaulo: fixed -3h, %Y-%m-%d_%H:%M:%S
    assert (
        load_datetime_fixed_offset(datetime(2024, 10, 19, 1, 30))
        == "2024-10-18_22:30:00"
    )


def test_load_date_col_distributed(spark):
    df = spark.createDataFrame(
        [("2024-10-19 01:30:00",), ("2024-10-19 12:00:00",)], "ts string"
    ).select(load_date_col("ts").alias("d"))
    assert [str(r["d"]) for r in df.collect()] == ["2024-10-18", "2024-10-19"]


# -- pipeline driver (C1) -------------------------------------------------


def test_run_pipeline_chains_all_stages(spark, tmp_path):
    records = [
        {"id": "1", "name": "A", "brewery_type": "micro", "country": "US"},
        {"id": "2", "name": "B", "brewery_type": "micro", "country": "US"},
        {"id": "3", "name": "C", "brewery_type": "nano", "country": "PT"},
    ]

    def fetcher(url: str) -> str:
        if url.endswith("/meta"):
            return json.dumps({"total": len(records)})
        page = int(url.split("page=")[1].split("&")[0])
        return json.dumps(records[(page - 1) * 2 : page * 2])

    src = PaginatedRestSource("http://fake/api", per_page=2, fetcher=fetcher)
    m = run_pipeline(
        spark,
        src,
        str(tmp_path / "bronze"),
        str(tmp_path / "warehouse"),
        sys_file_date="2024-06-01",
    )
    assert m.counters["bronze_rows"] == 3
    assert m.counters["rows_written"] == 3 + 2  # silver rows + gold groups
    assert set(m.timings) >= {"bronze", "silver", "gold", "pipeline_total"}
    gold = spark.read.parquet(f"{tmp_path}/warehouse/dw/tab_brewery_summary")
    assert gold.count() == 2


def test_q6_all_predicates_reach_the_scan(spark):
    """TPC-H Q6 is the pushdown stress test: every predicate is
    single-column, so all of them must show up as PushedFilters."""
    df = REGISTRY["q6_revenue_change"].fn(spark, SF_DIR)
    pushed = " ".join(plans.pushed_filters(df))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"


def test_q19_disjunction_prefilter_extracted(spark):
    """Catalyst must extract the common single-side conjuncts of Q19's
    OR-of-ANDs (quantity ranges on lineitem) as a pushed pre-filter --
    without it the scan reads every row and the join does all the work."""
    df = REGISTRY["q19_disjunctive_revenue"].fn(spark, SF_DIR)
    pushed = " ".join(plans.pushed_filters(df))
    assert "l_quantity" in pushed, f"no quantity prefilter pushed: {pushed}"


def test_new_entry_plan_posture(spark):
    # BM25: the corpus-stats attach and the scoring joins must all be
    # broadcast (no sort-merge path for model-metadata-sized sides), and
    # the whole query needs no more than the stats-aggregate exchange.
    bm25 = REGISTRY["text_bm25_topk"].fn(spark, SF_DIR)
    p = plans.physical_plan(bm25)
    assert "SortMergeJoin" not in p
    # PQ: codebook update + model attach + LUT join -- every join
    # broadcast, never a shuffle join against the corpus.
    pq = REGISTRY["ann_pq_adc_topk"].fn(spark, SF_DIR)
    p = plans.physical_plan(pq)
    assert "SortMergeJoin" not in p
    # Blocklist filter: map-only until the final tiny aggregate -- no
    # join at all.
    bl = REGISTRY["text_blocklist_filter_stats"].fn(spark, SF_DIR)
    p = plans.physical_plan(bl)
    assert "Join" not in p


def test_cbo_column_stats_enable_filtered_dim_broadcast(spark, tmp_path):
    """Statistics-driven planning, pinned: with CBO on and ANALYZE'd
    column stats, a SELECTIVE filter on a dimension shrinks its size
    estimate below the broadcast threshold and the join plans as
    BroadcastHashJoin; without stats the estimate stays at file size
    and the same query sort-merge joins.  At 100 TB this is the
    difference between shipping a few post-filter dim rows to every
    executor and shuffling the fact table -- ANALYZE TABLE is the
    cheap metadata pass that buys it."""
    import uuid

    from pyspark.sql import functions as F

    db = f"cbo_{uuid.uuid4().hex[:8]}"
    olds = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.cbo.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.enabled",
        )
    }
    try:
        spark.sql(f"CREATE DATABASE {db} LOCATION '{tmp_path}/cbo'")
        cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
            "c_custkey", "c_mktsegment", "c_acctbal"
        )
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        cust.write.saveAsTable(f"{db}.customer_t")
        orders.write.saveAsTable(f"{db}.orders_t")
        # threshold below the dim's file-size estimate (measured 2.8 KiB
        # at sf0.001 -- without CBO a Filter passes its child's size
        # through), above the stats-based post-filter estimate (484 B,
        # rowCount=11); AQE off so the check reads the STATIC planner's
        # decision, not a runtime re-plan
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.cbo.enabled", "true")

        def _join():
            c = spark.table(f"{db}.customer_t").where(F.col("c_custkey") <= 10)
            o = spark.table(f"{db}.orders_t")
            return o.join(c, o.o_custkey == c.c_custkey)

        before = plans.physical_plan(_join())
        assert "BroadcastHashJoin" not in before, before

        spark.sql(
            f"ANALYZE TABLE {db}.customer_t COMPUTE STATISTICS FOR COLUMNS c_custkey"
        )
        after = plans.physical_plan(_join())
        assert "BroadcastHashJoin" in after, after
    finally:
        for k, v in olds.items():
            spark.conf.set(k, v)
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
