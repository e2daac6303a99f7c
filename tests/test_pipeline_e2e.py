"""Golden end-to-end pipeline test: bronze NDJSON -> silver -> gold.

Mirrors the reference pipeline (SURVEY.md section 3) on a brewery-shaped
fixture (FIXTURES.md section 1): records with missing keys, extra keys, and
non-numeric phone/longitude; verifies gold counts against hand-computed
values, idempotency (run twice -> same result), and per-partition overwrite
(day A survives a day-B rerun — the deviation from the reference's
full-table overwrite, SURVEY.md section 1.3).
"""

from __future__ import annotations

import json
import os

import pytest

from docker_airflow_spark_minio_spark import fsmeta
from docker_airflow_spark_minio_spark.jobs import run_gold, run_silver

DAY_A = "2024-03-01"
DAY_B = "2024-03-02"

RECORDS_A = [
    {"id": "1", "name": "Alpha", "brewery_type": "micro", "country": "US",
     "phone": "5551234", "longitude": "-71.1", "latitude": "42.3"},
    {"id": "2", "name": "Beta", "brewery_type": "micro", "country": "US",
     "phone": "not-a-phone", "extra_key": "dropped"},
    {"id": "3", "name": "Gamma", "brewery_type": "nano", "country": "PT"},
]
RECORDS_B = [
    {"id": "4", "name": "Delta", "brewery_type": "micro", "country": "US"},
]


def _write_bronze(base: str, day: str, records: list[dict], pages: int = 2) -> None:
    day_dir = os.path.join(base, f"sys_file_date={day}")
    os.makedirs(day_dir, exist_ok=True)
    # one NDJSON file per (node, page) like the reference layout
    for p in range(pages):
        chunk = records[p::pages]
        with open(os.path.join(day_dir, f"node_0_page_{p}.json"), "w") as f:
            for rec in chunk:
                f.write(json.dumps(rec) + "\n")


@pytest.fixture
def lake(tmp_path):
    bronze = str(tmp_path / "bronze" / "brewery")
    warehouse = str(tmp_path / "warehouse")
    _write_bronze(bronze, DAY_A, RECORDS_A)
    _write_bronze(bronze, DAY_B, RECORDS_B)
    return bronze, warehouse


def test_silver_conforms_and_partitions(spark, lake):
    bronze, warehouse = lake
    assert run_silver(spark, bronze, DAY_A, warehouse) == 3
    df = spark.read.parquet(f"{warehouse}/dw/tab_brewery")
    rows = {r["id"]: r for r in df.collect()}
    assert rows["1"]["phone"] == 5551234
    assert rows["2"]["phone"] is None  # non-numeric cast -> null
    assert rows["1"]["longitude"] == pytest.approx(-71.1)
    assert "extra_key" not in df.columns
    assert rows["3"]["address_1"] is None  # missing key added as null
    assert str(rows["1"]["sys_file_date"]) == DAY_A


def test_silver_empty_input_skips(spark, tmp_path):
    bronze = str(tmp_path / "bronze" / "none")
    warehouse = str(tmp_path / "warehouse")
    assert run_silver(spark, bronze, "2024-01-01", warehouse) == 0
    assert not fsmeta.prefix_exists(spark, f"{warehouse}/dw/tab_brewery")


def test_gold_counts_and_order(spark, lake):
    bronze, warehouse = lake
    run_silver(spark, bronze, DAY_A, warehouse)
    assert run_gold(spark, warehouse, DAY_A) == 2
    gold = spark.read.parquet(f"{warehouse}/dw/tab_brewery_summary")
    got = [
        (str(r["sys_file_date"]), r["brewery_type"], r["country"], r["qtd"])
        for r in gold.orderBy("sys_file_date", "brewery_type", "country").collect()
    ]
    assert got == [(DAY_A, "micro", "US", 2), (DAY_A, "nano", "PT", 1)]


def test_idempotent_rerun_and_partition_isolation(spark, lake):
    bronze, warehouse = lake
    run_silver(spark, bronze, DAY_A, warehouse)
    run_silver(spark, bronze, DAY_B, warehouse)
    run_gold(spark, warehouse, DAY_A)
    run_gold(spark, warehouse, DAY_B)

    silver = spark.read.parquet(f"{warehouse}/dw/tab_brewery")
    assert silver.count() == 4

    # rerun day B: day A partitions must survive (dynamic overwrite)
    assert run_silver(spark, bronze, DAY_B, warehouse) == 1
    assert run_gold(spark, warehouse, DAY_B) == 1
    silver = spark.read.parquet(f"{warehouse}/dw/tab_brewery")
    assert silver.count() == 4
    gold = spark.read.parquet(f"{warehouse}/dw/tab_brewery_summary")
    assert gold.count() == 3  # 2 groups day A + 1 group day B

    # snapshot mode reproduces the reference's full-table replace
    run_silver(spark, bronze, DAY_B, warehouse, mode="snapshot")
    assert spark.read.parquet(f"{warehouse}/dw/tab_brewery").count() == 1


def test_fsmeta_stats_and_delete(spark, lake):
    bronze, _ = lake
    stats = fsmeta.prefix_stats(spark, bronze)
    assert stats.total_objects == 4  # 2 days x 2 page files
    assert stats.total_bytes > 0
    day_a = f"{bronze}/sys_file_date={DAY_A}"
    assert fsmeta.prefix_exists(spark, day_a)
    assert fsmeta.delete_prefix(spark, day_a)
    assert not fsmeta.prefix_exists(spark, day_a)


def test_sort_within_partitions_clusters_files(spark, tmp_path):
    import glob

    from docker_airflow_spark_minio_spark.storage import TableManager

    df = spark.range(0, 10_000).selectExpr(
        "pmod(hash(id), 1000000) AS k", "id AS v"
    ).repartition(4)
    m = TableManager(spark, str(tmp_path / "wh"))
    m.write(df, "dw.sorted", mode="snapshot", sort_within_partitions=["k"])
    files = glob.glob(f"{tmp_path}/wh/dw/sorted/*.parquet")
    assert files
    for f in files:  # every file individually ordered by k
        ks = [r["k"] for r in spark.read.parquet(f).select("k").collect()]
        assert ks == sorted(ks)


def test_observe_quality_counts(spark):
    from docker_airflow_spark_minio_spark.metrics import observe_quality

    df = spark.createDataFrame(
        [(1, None), (2, "x"), (None, None)], "a int, b string"
    )
    out, harvest = observe_quality(df, ["a", "b"])
    out.write.format("noop").mode("overwrite").save()
    assert harvest() == {"rows": 3, "null_a": 1, "null_b": 2}


def test_silver_emits_observed_metrics(spark, lake):
    from docker_airflow_spark_minio_spark.metrics import RunMetrics

    bronze, warehouse = lake
    m = RunMetrics()
    n = run_silver(spark, bronze, DAY_A, warehouse, metrics=m)
    # row count observed on the write job itself, no extra scan
    assert m.counters["observed_rows"] == n == 3
    null_keys = sorted(k for k in m.counters if k.startswith("observed_null_"))
    assert len(null_keys) == 3
    assert all(0 <= m.counters[k] <= 3 for k in null_keys)
