"""Filesystem/object-store metadata probes.

Re-expresses the reference's boto3/minio utilities -- prefix existence
check (reference decase/utils.py:14-63), size/count probe (utils.py:81-114,
which is capped at one unpaginated list_objects_v2 page of 1000 keys --
fixed here), and recursive prefix delete
(datalake_bronze_fetch_raw_data_api_dag.py:140-156) -- on top of the
Hadoop FileSystem API, so one implementation covers file://, s3a://, hdfs://.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass
class PrefixStats:
    total_objects: int
    total_bytes: int


def _fs_and_path(spark: SparkSession, uri: str):
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(uri)
    fs = path.getFileSystem(hconf)
    return fs, path


def prefix_exists(spark: SparkSession, uri: str) -> bool:
    """True if the prefix/directory exists and is non-empty (guards the
    silver job like the reference's check, job_silver.py:129)."""
    fs, path = _fs_and_path(spark, uri)
    if not fs.exists(path):
        return False
    it = fs.listFiles(path, True)
    return it.hasNext()


def prefix_stats(spark: SparkSession, uri: str) -> PrefixStats:
    """Recursive object count + byte sum (full listing, not capped at 1000
    keys like the reference probe, utils.py:99-107)."""
    fs, path = _fs_and_path(spark, uri)
    total, size = 0, 0
    if fs.exists(path):
        it = fs.listFiles(path, True)
        while it.hasNext():
            st = it.next()
            total += 1
            size += st.getLen()
    return PrefixStats(total_objects=total, total_bytes=size)


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    """Atomic-on-HDFS directory rename (write-then-swap commits; on
    S3-like stores this is a server-side copy, not atomic)."""
    fs, src_path = _fs_and_path(spark, src)
    dst_path = spark._jvm.org.apache.hadoop.fs.Path(dst)
    return bool(fs.rename(src_path, dst_path))


def delete_prefix(spark: SparkSession, uri: str) -> bool:
    """Recursive delete for idempotent re-ingest (reference bronze dag
    :269-271 deletes the day prefix before refetch)."""
    fs, path = _fs_and_path(spark, uri)
    if fs.exists(path):
        return bool(fs.delete(path, True))
    return False


def hive_partition_dir(spark: SparkSession, cols: list[str], vals: tuple) -> str:
    """Relative partition directory exactly as Spark's writer lays it
    out: Hive path escaping on names and values (the same
    ``ExternalCatalogUtils.escapePathName`` the write path uses, so the
    charsets cannot drift), nulls as the Hive default partition name."""
    esc = spark._jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    parts = []
    for c, v in zip(cols, vals):
        pv = "__HIVE_DEFAULT_PARTITION__" if v is None else esc.escapePathName(str(v))
        parts.append(f"{esc.escapePathName(c)}={pv}")
    return "/".join(parts)


def read_bytes(spark: SparkSession, uri: str) -> bytes:
    """Slurp one file JVM-side (commons-io ships with Spark): a single
    py4j round-trip for the whole payload instead of one per byte.  The
    shared read primitive behind manifest/tag/WAL record loading."""
    fs, p = _fs_and_path(spark, uri)
    stream = fs.open(p)
    try:
        return bytes(
            spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
    finally:
        stream.close()
