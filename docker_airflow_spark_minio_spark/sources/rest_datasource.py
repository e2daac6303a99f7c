"""Paginated REST endpoint as a Spark 4 Python DataSource.

The idiomatic-Spark-4 expression of the reference's ingestion surface
(reference airflow/plugins/fetch_api_operator.py:8-52 retrying GET +
datalake_bronze_fetch_raw_data_api_dag.py:226-260 page partitioner):
instead of a hand-rolled RDD fan-out (:class:`.rest.PaginatedRestSource`,
kept as the portable variant), the source plugs into the DataFrame
reader API --

    spark.dataSource.register(PaginatedRestDataSource)
    df = (spark.read.format("paginated_rest")
          .option("url", "https://api.example.com/v1/items")
          .option("per_page", "200")
          .load())

Spark plans one :class:`InputPartition` per page range (the reference's
static 3-node page split becomes real source partitioning the scheduler
can see), executors fetch their pages independently with the same
retry policy, and each record surfaces as one raw JSON line (``value
string``) -- bronze keeps bodies raw by design, and the silver conform
pass owns typing, exactly like the file-based bronze path.

Offline/testable by construction: with ``url=file:///dir`` the fetcher
reads ``page_N.json`` files from that directory -- the page protocol,
partition planning, validation, and retry code paths are identical to
the HTTP case, so tests exercise everything but the socket.

Scale notes: page bodies never touch the driver (only page COUNT does);
fetch parallelism = ``ceil(pages / pages_per_partition)`` tasks, and a
failed page fails its task and retries through Spark's task retry on
top of the in-task HTTP retry loop.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from .rest import fetch_with_retry, is_valid_json_list


@dataclass
class PageRange(InputPartition):
    start: int  # inclusive, 1-based
    end: int    # exclusive


def _fetch_page(url_base: str, page: int, per_page: int, max_retries: int,
                wait_time: float) -> str:
    """One page body: HTTP GET or local file, same validation after."""
    if url_base.startswith("file://"):
        path = f"{url_base[len('file://'):]}/page_{page}.json"
        with open(path, encoding="utf-8") as f:
            return f.read()
    url = f"{url_base}?page={page}&per_page={per_page}"
    import urllib.request

    def fetcher(u: str) -> str:
        with urllib.request.urlopen(u, timeout=30.0) as resp:  # noqa: S310
            if not (200 <= resp.status < 300):
                raise IOError(f"HTTP {resp.status} for {u}")
            return resp.read().decode("utf-8")

    return fetch_with_retry(fetcher, url, max_retries, wait_time)


class PaginatedRestReader(DataSourceReader):
    def __init__(self, options: dict):
        self.url = options["url"].rstrip("/")
        self.per_page = int(options.get("per_page", "200"))
        self.num_pages = int(options["num_pages"]) if "num_pages" in options else None
        self.pages_per_partition = int(options.get("pages_per_partition", "1"))
        self.max_retries = int(options.get("max_retries", "5"))
        self.wait_time = float(options.get("wait_time", "0"))

    def _total_pages(self) -> int:
        """Driver-side size probe (reference bronze dag :262-268): page
        count = ceil(total / per_page) from the meta endpoint; for
        file:// sources, count the page files."""
        if self.num_pages is not None:
            return self.num_pages
        if self.url.startswith("file://"):
            import os

            d = self.url[len("file://"):]
            return len([f for f in os.listdir(d) if f.startswith("page_")])
        body = _fetch_page(f"{self.url}/meta", 0, 0, self.max_retries, self.wait_time)
        return math.ceil(int(json.loads(body)["total"]) / self.per_page)

    def partitions(self) -> Sequence[InputPartition]:
        n = self._total_pages()
        step = self.pages_per_partition
        return [PageRange(p, min(p + step, n + 1)) for p in range(1, n + 1, step)]

    def read(self, partition: PageRange) -> Iterator[tuple]:
        for page in range(partition.start, partition.end):
            body = _fetch_page(
                self.url, page, self.per_page, self.max_retries, self.wait_time
            )
            if not is_valid_json_list(body):
                continue  # reference behavior: invalid/empty pages skipped
            for rec in json.loads(body):
                yield (json.dumps(rec),)


class PaginatedRestStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin: the page number IS the offset.

    Each micro-batch re-probes the dataset size and reads every page
    that appeared since the last committed offset -- the incremental
    expression of the reference's daily full re-fetch (its cron re-reads
    all pages every run; here a page is fetched exactly once, and the
    checkpoint's offset log makes restarts resume, not restart).
    ``readBetweenOffsets`` replays a committed range deterministically
    for recovery, which is sound because REST pages are stable within a
    day (the same assumption the reference's day-partitioned refetch
    makes).
    """

    def __init__(self, options: dict):
        self.inner = PaginatedRestReader(options)

    def initialOffset(self) -> dict:
        return {"next_page": 1}

    def read(self, start: dict):
        first = start["next_page"]
        last = self.inner._total_pages()  # current high-water mark
        # iter(list(...)), not a bare generator or list: the runtime
        # pickles the prefetched rows into its driver-side cache
        # (generators don't pickle) AND calls next() on the handle when
        # the offset did not advance (lists aren't iterators)
        rows = list(self.readBetweenOffsets(start, {"next_page": last + 1}))
        return iter(rows), {"next_page": max(first, last + 1)}

    def readBetweenOffsets(self, start: dict, end: dict):
        for page in range(start["next_page"], end["next_page"]):
            yield from self.inner.read(PageRange(page, page + 1))

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: pages are immutable within a run


class PaginatedRestDataSource(DataSource):
    """``spark.read.format("paginated_rest")`` -- see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "paginated_rest"

    def schema(self) -> str:
        # raw NDJSON lines, like the bronze landing files (reference
        # bronze dag :299-307); typing happens in the silver conform
        return "value string"

    def reader(self, schema) -> PaginatedRestReader:  # noqa: ANN001
        return PaginatedRestReader(self.options)

    def simpleStreamReader(self, schema) -> PaginatedRestStreamReader:  # noqa: ANN001
        return PaginatedRestStreamReader(self.options)
