"""Exact-substring dedup (Lee et al. 2022 projection): the within-doc
occurrence cap (round 9) and the excision operator.

The cap test plants the exact pathology the r8 verdict flagged: one
W-token window repeated hundreds of times inside BOTH docs of a pair.
Uncapped, aligned pair generation is per-occurrence (k*j pairs per
hash); capped, any doc pair's per-hash fanout is <= SUBSTR_OCC_CAP^2.
The DuckDB oracle is run on the same planted corpus to prove the cap
stays in lockstep on pathological data, not just on the driver tables.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from docker_airflow_spark_minio_spark.workloads.base import (
    REGISTRY,
    TABLES,
    clear_persist_caches,
)
from docker_airflow_spark_minio_spark.workloads.dedup import (
    _SUBSTR_ALIGN_CACHE,
    SUBSTR_OCC_CAP,
    SUBSTR_WINDOW,
    dedup_substring_excise,
    dedup_substring_pairs,
)

from conftest import SF_DIR


@pytest.fixture()
def spam_sf_dir(spark, tmp_path):
    """A tiny sf dir whose documents table is two token-repetition spam
    docs (every other table symlinks the real sf0.001 fixture)."""
    d = tmp_path / "sfspam"
    d.mkdir()
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    phrase = " ".join(f"w{i}" for i in range(SUBSTR_WINDOW))
    spam = " ".join([phrase] * 300)  # 2400 tokens, 8 hashes x ~300 occ
    docs = spark.createDataFrame(
        [(1, spam, "en", "spam", len(spam)), (2, spam, "en", "spam", len(spam))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    clear_persist_caches()
    yield str(d)
    clear_persist_caches()


def test_occ_cap_bounds_pair_generation_on_spam(spark, spam_sf_dir):
    rows = dedup_substring_pairs(spark, spam_sf_dir).collect()
    # One doc pair; the periodic doc has exactly W distinct window
    # hashes; the kept (first CAP per hash) positions are 1..W*CAP in
    # both docs, so the diag-0 chain is W*CAP long.
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["n_shared_windows"] == SUBSTR_WINDOW
    assert r["max_run_tokens"] == SUBSTR_WINDOW * SUBSTR_OCC_CAP + (
        SUBSTR_WINDOW - 1
    )
    # The bounded-fanout claim, asserted on the alignment frame itself:
    # uncapped this would be ~W * 293^2 (~690k) rows; capped it is
    # exactly W * CAP^2.
    app = spark.sparkContext.applicationId
    m = _SUBSTR_ALIGN_CACHE._entries[(app, spam_sf_dir)]
    assert m.count() == SUBSTR_WINDOW * SUBSTR_OCC_CAP**2


def test_occ_cap_oracle_lockstep_on_spam(spark, spam_sf_dir):
    got = sorted(
        dedup_substring_pairs(spark, spam_sf_dir).collect(),
        key=lambda r: (r["doc_a"], r["doc_b"]),
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{spam_sf_dir}/{t}.parquet"
            + ("/*.parquet')" if t == "documents" else "')")
        )
    want = con.execute(REGISTRY["dedup_substring_pairs"].oracle).fetchall()
    assert [
        (r["doc_a"], r["doc_b"], r["n_shared_windows"], r["max_run_tokens"])
        for r in got
    ] == [tuple(w) for w in want]


def test_excise_removes_capped_run_from_higher_doc(spark, spam_sf_dir):
    rows = dedup_substring_excise(spark, spam_sf_dir).collect()
    # Keep-first policy: doc 1 survives intact (never doc_b), doc 2
    # excises the merged covered range [1, W*CAP + W - 1].
    assert len(rows) == 1
    r = rows[0]
    covered = SUBSTR_WINDOW * SUBSTR_OCC_CAP + (SUBSTR_WINDOW - 1)
    assert r["doc_id"] == 2
    assert r["n_tokens"] == 2400
    assert r["removed_tokens"] == covered
    assert r["kept_tokens"] == 2400 - covered


def test_excise_interval_merge_no_double_count(spark, tmp_path):
    """Three docs sharing one run: the highest doc_id gets the run from
    TWO partners; the merged accounting must not double-count it."""
    d = tmp_path / "sftri"
    d.mkdir()
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    run = " ".join(f"r{i}" for i in range(SUBSTR_WINDOW + 4))  # 12-token run
    docs = spark.createDataFrame(
        [
            (1, "a1 a2 a3 " + run, "en", "t", 0),
            (2, "b1 b2 b3 b4 " + run, "en", "t", 0),
            (3, run + " c1 c2 c3", "en", "t", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    clear_persist_caches()
    try:
        rows = {
            r["doc_id"]: r
            for r in dedup_substring_excise(spark, str(d)).collect()
        }
        # docs 2 and 3 each lose the 12-token run exactly once; doc 1
        # (lowest id) keeps its copy
        assert set(rows) == {2, 3}
        assert rows[2]["removed_tokens"] == SUBSTR_WINDOW + 4
        assert rows[3]["removed_tokens"] == SUBSTR_WINDOW + 4
        assert rows[2]["n_tokens"] == 4 + SUBSTR_WINDOW + 4
        assert rows[3]["kept_tokens"] == 3
    finally:
        clear_persist_caches()


def test_decontaminate_excise_planted_overlap(spark, tmp_path):
    """A benchmark doc (doc_id % DECONTAM_MOD == 0) shares a verbatim
    run with two training docs: both get exactly that span excised;
    a training doc with no benchmark overlap is untouched; the
    benchmark doc itself is never reported."""
    from docker_airflow_spark_minio_spark.workloads.dedup import (
        DECONTAM_MOD,
        dedup_decontaminate_excise,
    )

    d = tmp_path / "sfdecon"
    d.mkdir()
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    W = SUBSTR_WINDOW
    run = " ".join(f"q{i}" for i in range(W + 2))  # 10-token benchmark span
    bench_id = DECONTAM_MOD * 3  # % == 0 -> benchmark side
    docs = spark.createDataFrame(
        [
            (bench_id, "b0 " + run + " b1", "en", "t", 0),
            (1, "x1 x2 x3 " + run, "en", "t", 0),          # tail overlap
            (2, run + " y1 y2 y3 y4", "en", "t", 0),        # head overlap
            (3, "z1 z2 z3 z4 z5 z6 z7 z8 z9", "en", "t", 0),  # clean
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    clear_persist_caches()
    try:
        rows = {
            r["doc_id"]: r
            for r in dedup_decontaminate_excise(spark, str(d)).collect()
        }
        assert set(rows) == {1, 2}
        for did in (1, 2):
            assert rows[did]["n_spans"] == 1
            assert rows[did]["contaminated_tokens"] == W + 2
        assert rows[1]["n_tokens"] == 3 + W + 2
        assert rows[1]["clean_tokens"] == 3
        assert rows[2]["clean_tokens"] == 4
    finally:
        clear_persist_caches()
