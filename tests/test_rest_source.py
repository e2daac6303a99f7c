"""Hermetic tests for the paginated REST source (injected fetcher)."""

from __future__ import annotations

import json

import pytest

from docker_airflow_spark_minio_spark.sources.rest import (
    PaginatedRestSource,
    fetch_with_retry,
    is_valid_json_list,
)

DATA = [{"id": str(i), "brewery_type": "micro" if i % 2 else "nano"} for i in range(450)]
PER_PAGE = 200


def make_fake_fetcher():
    # defined as a closure so cloudpickle ships it by value to executors
    # (a module-level function would be pickled by reference and the
    # Python workers can't import the test module)
    data = list(DATA)

    def fake_fetcher(url: str) -> str:
        if url.endswith("/meta"):
            return json.dumps({"total": len(data), "page": 1, "per_page": PER_PAGE})
        page = int(url.split("page=")[1].split("&")[0])
        return json.dumps(data[(page - 1) * PER_PAGE : page * PER_PAGE])

    return fake_fetcher


def test_is_valid_json_list():
    assert is_valid_json_list('[{"a": 1}]')
    assert not is_valid_json_list("[]")  # non-empty required (reference parity)
    assert not is_valid_json_list('{"a": 1}')
    assert not is_valid_json_list("nonsense")


def test_retry_exhaustion():
    calls = []

    def failing(url):
        calls.append(url)
        raise IOError("boom")

    with pytest.raises(IOError):
        fetch_with_retry(failing, "http://x", max_retries=3, wait_time=0)
    assert len(calls) == 3


def test_paginated_read(spark):
    src = PaginatedRestSource("http://fake/v1/breweries", fetcher=make_fake_fetcher(), wait_time=0)
    assert src.total_pages() == 3
    df = src.read(spark)
    assert df.count() == len(DATA)
    assert set(df.columns) == {"id", "brewery_type"}


def test_write_bronze_layout(spark, tmp_path):
    src = PaginatedRestSource("http://fake/v1/breweries", fetcher=make_fake_fetcher(), wait_time=0)
    out = str(tmp_path / "bronze")
    n = src.write_bronze(spark, out, "2024-05-01")
    assert n == len(DATA)
    df = spark.read.json(f"{out}/sys_file_date=2024-05-01")
    assert df.count() == len(DATA)
    # idempotent re-run replaces the day prefix
    assert src.write_bronze(spark, out, "2024-05-01") == len(DATA)
    assert spark.read.json(f"{out}/sys_file_date=2024-05-01").count() == len(DATA)


# -- Spark 4 Python DataSource variant ------------------------------------


def test_paginated_rest_datasource_file_mode(spark, tmp_path):
    """The DataFrame-reader expression of the REST source: partition
    planning, page fetch, validation, and raw-line output -- exercised
    through the file:// page protocol (same code path as HTTP minus the
    socket)."""
    from docker_airflow_spark_minio_spark.sources.rest_datasource import (
        PaginatedRestDataSource,
    )

    pages = tmp_path / "pages"
    pages.mkdir()
    for p in range(1, 4):
        rows = DATA[(p - 1) * PER_PAGE : p * PER_PAGE]
        (pages / f"page_{p}.json").write_text(json.dumps(rows))
    (pages / f"page_4.json").write_text("[]")          # empty page skipped
    (pages / f"page_5.json").write_text("not json")    # invalid page skipped

    spark.dataSource.register(PaginatedRestDataSource)
    df = (
        spark.read.format("paginated_rest")
        .option("url", f"file://{pages}")
        .option("pages_per_partition", "2")
        .load()
    )
    assert df.schema.simpleString() == "struct<value:string>"
    # partition planning: 5 pages / 2 per partition = 3 input partitions
    assert df.rdd.getNumPartitions() == 3
    vals = [json.loads(r["value"]) for r in df.collect()]
    assert len(vals) == len(DATA)
    assert sorted(v["id"] for v in vals) == sorted(d["id"] for d in DATA)

    # raw lines flow into the same distributed JSON parse as bronze
    parsed = spark.read.json(df.rdd.map(lambda r: r["value"]))
    assert parsed.count() == len(DATA)
    assert set(parsed.columns) == {"id", "brewery_type"}


def test_paginated_rest_datasource_streaming_incremental(spark, tmp_path):
    """Streaming variant: the page number is the offset.  New pages
    landed between runs are picked up incrementally; already-read pages
    are never re-fetched (checkpointed offset log).  File sink: the
    memory sink cannot recover from a checkpoint across restarts."""
    from docker_airflow_spark_minio_spark.sources.rest_datasource import (
        PaginatedRestDataSource,
    )

    pages = tmp_path / "pages"
    pages.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    for p in (1, 2):
        rows = DATA[(p - 1) * PER_PAGE : p * PER_PAGE]
        (pages / f"page_{p}.json").write_text(json.dumps(rows))

    spark.dataSource.register(PaginatedRestDataSource)

    def run_batch():
        q = (
            spark.readStream.format("paginated_rest")
            .option("url", f"file://{pages}")
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_batch()
    assert spark.read.parquet(out_dir).count() == 2 * PER_PAGE

    # a third page lands; the next run reads ONLY it
    (pages / "page_3.json").write_text(json.dumps(DATA[2 * PER_PAGE :]))
    run_batch()
    got = [json.loads(r["value"])["id"] for r in spark.read.parquet(out_dir).collect()]
    assert len(got) == len(DATA)          # no page re-read, no duplicates
    assert sorted(got) == sorted(d["id"] for d in DATA)

    # an unchanged source is a no-op micro-batch
    run_batch()
    assert spark.read.parquet(out_dir).count() == len(DATA)
