"""E2E over a NON-file:// Hadoop filesystem (mockfs://).

The reference runs against MinIO via s3a:// (reference
docker-compose.yml:121-135; S3A confs in
datalake_silver_spark_dag.py:174-189).  No object store exists in this
sandbox, so this drives the same SURFACE -- scheme-qualified URIs
resolved through the Hadoop FileSystem API -- with a local-disk-backed
FileSystem that reports a foreign scheme (tests/fixtures/mockfs).  Any
code path that shortcuts to ``open()``/``os.path`` on a table path, or
assumes ``file://`` semantics, fails here the same way it would on
s3a://.

Runs in a subprocess: the fs impl jar must be on the driver classpath
at JVM launch, which the shared session fixture cannot provide.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "mockfs")
JAR = os.path.join(FIXTURE_DIR, "mockfs.jar")


def _ensure_jar() -> bool:
    sources = [
        f for f in os.listdir(FIXTURE_DIR) if f.endswith(".java")
    ]
    if os.path.exists(JAR) and all(
        os.path.getmtime(JAR) >= os.path.getmtime(os.path.join(FIXTURE_DIR, s))
        for s in sources
    ):
        return True
    javac = shutil.which("javac")
    jartool = shutil.which("jar")
    if not javac or not jartool:
        return os.path.exists(JAR)  # stale-but-present beats nothing
    import pyspark

    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    hadoop = [f for f in os.listdir(jars) if f.startswith("hadoop-client-api")]
    if not hadoop:
        return os.path.exists(JAR)
    try:
        subprocess.run(
            [javac, "-cp", os.path.join(jars, hadoop[0]), *sorted(sources)],
            cwd=FIXTURE_DIR,
            check=True,
            capture_output=True,
        )
        classes = [f for f in os.listdir(FIXTURE_DIR) if f.endswith(".class")]
        subprocess.run(
            [jartool, "cf", "mockfs.jar", *sorted(classes)],
            cwd=FIXTURE_DIR,
            check=True,
            capture_output=True,
        )
    except subprocess.CalledProcessError:
        return False
    return os.path.exists(JAR)


@pytest.mark.skipif(not _ensure_jar(), reason="mockfs fixture jar unavailable (no javac)")
def test_pipeline_and_snapshots_over_nonlocal_scheme():
    proc = subprocess.run(
        [sys.executable, os.path.join(FIXTURE_DIR, "drive_nonlocal.py")],
        capture_output=True,
        text=True,
        timeout=600,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-4000:]
    assert "PIPELINE-OK" in out
    assert "SNAPSHOTS-OK" in out
