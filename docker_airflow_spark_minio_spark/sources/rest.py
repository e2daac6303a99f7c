"""Paginated REST source -> DataFrame.

Re-expresses the reference's ingestion surface -- retrying GET operator
(reference airflow/plugins/fetch_api_operator.py:8-52), dataset-size probe
(datalake_bronze_fetch_raw_data_api_dag.py:262-268, page count =
ceil(total/per_page) with per_page=200 at :25), and static page->node
partitioner (:226-260) -- Spark-first: the page list is parallelized as an
RDD so fetching fans out across executors, replacing the reference's
hand-rolled 3-node page assignment with Spark's own partitioning.

The HTTP call is injectable (``fetcher``) so tests run hermetically and so
a cluster deployment can swap in an authenticated client.  Only page
*metadata* rides the driver; page *bodies* stay on executors (the
reference likewise kept bodies out of XCom -- SURVEY.md section 7.2.6).
"""

from __future__ import annotations

import json
import math
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def default_fetcher(url: str, timeout: float = 30.0) -> str:
    """stdlib urllib GET returning the body as text (2xx only)."""
    import urllib.request

    with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
        if not (200 <= resp.status < 300):
            raise IOError(f"HTTP {resp.status} for {url}")
        return resp.read().decode("utf-8")


def fetch_with_retry(
    fetcher: Callable[[str], str],
    url: str,
    max_retries: int = 5,
    wait_time: float = 5.0,
) -> str:
    """Retry loop with the reference's policy: 5 tries x 5 s, raise after
    exhaustion (fetch_api_operator.py:24-47)."""
    last: Exception | None = None
    for attempt in range(max_retries):
        try:
            return fetcher(url)
        except Exception as exc:  # noqa: BLE001
            last = exc
            if attempt < max_retries - 1:
                time.sleep(wait_time)
    raise IOError(f"fetch failed after {max_retries} retries: {url}") from last


def is_valid_json_list(body: str) -> bool:
    """Bronze validation predicate: body parses as a NON-EMPTY JSON list
    (reference datalake_bronze_fetch_raw_data_api_dag.py:207-224)."""
    try:
        parsed = json.loads(body)
    except (ValueError, TypeError):
        return False
    return isinstance(parsed, list) and len(parsed) > 0


class PaginatedRestSource:
    """Reads a paginated JSON-list REST endpoint into a DataFrame."""

    def __init__(
        self,
        base_url: str,
        per_page: int = 200,
        fetcher: Callable[[str], str] | None = None,
        max_retries: int = 5,
        wait_time: float = 0.0,
    ):
        self.base_url = base_url.rstrip("/")
        self.per_page = per_page
        self.fetcher = fetcher or default_fetcher
        self.max_retries = max_retries
        self.wait_time = wait_time

    def page_url(self, page: int) -> str:
        return f"{self.base_url}?page={page}&per_page={self.per_page}"

    def total_pages(self) -> int:
        """Probe the meta endpoint for the dataset size (reference bronze
        dag :262-268: pages = ceil(total / per_page))."""
        body = fetch_with_retry(
            self.fetcher, f"{self.base_url}/meta", self.max_retries, self.wait_time
        )
        meta = json.loads(body)
        return math.ceil(int(meta["total"]) / self.per_page)

    def _lines_rdd(
        self,
        spark: SparkSession,
        num_pages: int | None = None,
        parallelism: int | None = None,
    ):
        """NDJSON lines as an RDD[str]: page fetches fan out over
        executors, one JSON line per record (reference bronze dag
        :299-307)."""
        pages = list(range(1, (num_pages or self.total_pages()) + 1))
        if not pages:
            return spark.sparkContext.emptyRDD()
        parallelism = parallelism or min(len(pages), spark.sparkContext.defaultParallelism)

        fetcher = self.fetcher
        max_retries, wait_time = self.max_retries, self.wait_time
        url_of = self.page_url

        def fetch_page(page: int) -> list[str]:
            body = fetch_with_retry(fetcher, url_of(page), max_retries, wait_time)
            if not is_valid_json_list(body):
                return []
            return [json.dumps(rec) for rec in json.loads(body)]

        return spark.sparkContext.parallelize(pages, parallelism).flatMap(fetch_page)

    def read(
        self,
        spark: SparkSession,
        num_pages: int | None = None,
        parallelism: int | None = None,
    ) -> DataFrame:
        """Fan page fetches out over executors; JSON lines are parsed by
        Spark's distributed JSON reader (schema inferred from the data, as
        the reference's silver read does, job_silver.py:143-147)."""
        n = num_pages or self.total_pages()
        if n <= 0:
            return spark.createDataFrame([], "id string")
        return spark.read.json(self._lines_rdd(spark, n, parallelism))

    def write_bronze(
        self,
        spark: SparkSession,
        out_dir: str,
        sys_file_date: str,
        num_pages: int | None = None,
    ) -> int:
        """Bronze landing: NDJSON under ``<out>/sys_file_date=<D>/`` exactly
        like the reference's layout (bronze dag :288).  Returns row count.

        The fetched lines go straight to text files -- no JSON-inference
        round trip -- and the lines are cached across the count + write
        actions, so every REST page is fetched exactly once (the reference
        re-fetched per action; SURVEY.md section 8.2).  The write lands in
        a temporary prefix and swaps in only on success, so a mid-fetch
        failure leaves the previous day's data intact (the reference
        deletes the day prefix before fetching, bronze dag :269-271 -- a
        durability hazard).  Note: on S3-like stores the swap rename is a
        copy; a real deployment would use a cloud committer there.

        Empty-fetch semantics (explicit): a fetch that SUCCEEDS with zero
        rows deletes the day prefix -- the source says the day is empty,
        and keeping yesterday's files would resurrect stale data (this
        matches the reference's delete-then-fetch observable state).  A
        fetch that FAILS raises before any delete, preserving prior data.
        """
        from .. import fsmeta

        day_dir = f"{out_dir.rstrip('/')}/sys_file_date={sys_file_date}"
        tmp_dir = day_dir + ".inprogress"
        fsmeta.delete_prefix(spark, tmp_dir)

        df = spark.createDataFrame(
            self._lines_rdd(spark, num_pages).map(lambda s: (s,)), "value string"
        )
        df.persist()
        try:
            n = df.count()
            if n:
                df.write.mode("overwrite").text(tmp_dir)
                fsmeta.delete_prefix(spark, day_dir)
                if not fsmeta.rename(spark, tmp_dir, day_dir):
                    raise IOError(
                        f"bronze swap failed: could not rename {tmp_dir} "
                        f"to {day_dir} (data is intact in the temp prefix)"
                    )
            else:
                # source reported an empty day: clear any stale prior data
                fsmeta.delete_prefix(spark, day_dir)
        finally:
            df.unpersist()
        return n
