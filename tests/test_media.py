"""Multimodal operator tests: Arrow-batched byte features, frame
sampling (row expansion), and the gated decode stubs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docker_airflow_spark_minio_spark.operators.media import (
    FRAME_BYTES,
    decode_audio,
    decode_image,
    extract_byte_features,
    sample_frame_rows,
)


@pytest.fixture
def payloads(spark):
    rows = [
        (1, b"abc"),
        (2, b""),                        # empty payload edge
        (3, bytes(range(200)) * 2),      # 400 bytes -> multiple frames
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_extract_byte_features(spark, payloads):
    got = {r["doc_id"]: r for r in extract_byte_features(payloads).collect()}
    assert got[1]["n_bytes"] == 3
    assert got[1]["byte_sum"] == ord("a") + ord("b") + ord("c")
    assert got[1]["first_byte"] == ord("a") and got[1]["last_byte"] == ord("c")
    assert got[2]["n_bytes"] == 0 and got[2]["first_byte"] == -1
    assert got[3]["n_bytes"] == 400
    assert got[3]["byte_sum"] == sum(range(200)) * 2


def test_sample_frame_rows_expands(spark, payloads):
    frames = sample_frame_rows(payloads).collect()
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 3 bytes -> 1 partial frame; empty -> 0 frames; 400 bytes -> 7 frames
    assert len(by_doc[1]) == 1 and by_doc[1][0]["frame_len"] == 3
    assert 2 not in by_doc
    assert len(by_doc[3]) == (400 + FRAME_BYTES - 1) // FRAME_BYTES
    # frame sums reassemble to the full byte sum (no byte lost/duplicated)
    assert sum(r["frame_sum"] for r in by_doc[3]) == sum(range(200)) * 2
    assert sum(r["frame_len"] for r in by_doc[3]) == 400
    # frame indexes are dense from 0
    assert sorted(r["frame_idx"] for r in by_doc[3]) == list(range(len(by_doc[3])))


def test_frame_rows_roll_up(spark, payloads):
    """Rolling the expanded frames back up recovers whole-payload totals."""
    rolled = (
        sample_frame_rows(payloads)
        .groupBy("doc_id")
        .agg(F.sum("frame_sum").alias("s"), F.sum("frame_len").alias("n"))
    )
    got = {r["doc_id"]: (r["s"], r["n"]) for r in rolled.collect()}
    assert got[1] == (ord("a") + ord("b") + ord("c"), 3)
    assert got[3] == (sum(range(200)) * 2, 400)


def test_decode_stubs_are_gated(spark):
    """The real decode entry points fail loudly (NotImplementedError)
    when the media libs are absent -- never a silent wrong answer."""
    for fn in (decode_image, decode_audio):
        try:
            fn(b"\x00\x01")
        except NotImplementedError:
            pass  # expected here: libs not installed
        except Exception as exc:  # noqa: BLE001
            pytest.fail(f"{fn.__name__} raised {type(exc).__name__}, expected "
                        "NotImplementedError gate")


def test_resize_block_downsample_edges(spark):
    from docker_airflow_spark_minio_spark.operators.media import (
        resize_block_downsample,
    )

    df = spark.createDataFrame(
        [
            (1, bytearray(b"A" * 20)),  # 2 full 8-byte blocks, 4 dropped
            (2, bytearray(b"xyz")),     # shorter than one block
            (3, bytearray(b"")),        # empty payload
        ],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in resize_block_downsample(df).collect()}
    assert got[1]["n_blocks"] == 2
    assert got[1]["block_checksum"] == 16 * ord("A")
    assert got[1]["first_block_sum"] == 8 * ord("A")
    assert got[2]["n_blocks"] == 0 and got[2]["max_block_sum"] == -1
    assert got[3]["n_blocks"] == 0 and got[3]["block_checksum"] == 0


# ---------------------------------------------------------------------------
# perceptual dHash
# ---------------------------------------------------------------------------


def _dhash_of(spark, payloads: dict[int, bytes]) -> dict[int, int]:
    from docker_airflow_spark_minio_spark.operators.media import dhash_payloads

    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()],
        "doc_id long, payload binary",
    )
    return {r["doc_id"]: r["dhash"] for r in dhash_payloads(df).collect()}


def test_dhash_invariances(spark):
    import random

    rng = random.Random(7)
    base = bytes(rng.randrange(256) for _ in range(400))
    trailer = base + b" extra metadata trailer beyond the grid"
    bright = bytes(min(b + 3, 255) for b in base)  # constant shift
    noisy = bytearray(base)
    noisy[5] ^= 1  # one-bit byte noise inside the grid
    different = bytes(rng.randrange(256) for _ in range(400))
    hs = _dhash_of(
        spark,
        {1: base, 2: trailer, 3: bright, 4: bytes(noisy), 5: different},
    )
    assert hs[1] == hs[2]  # appended trailer: identical hash
    assert hs[1] == hs[3]  # uniform brightness shift: identical hash
    assert bin(hs[1] ^ hs[4]).count("1") <= 2  # tiny noise: hamming-close
    assert bin(hs[1] ^ hs[5]).count("1") > 10  # unrelated payload: far


def test_dhash_skips_short_payloads(spark):
    hs = _dhash_of(spark, {1: b"x" * 100, 2: b"y" * 300})
    assert set(hs) == {2}  # below the 244-byte grid -> no signature


def test_perceptual_hot_bucket_cap(spark):
    """A degenerate corpus (every member shares one band bucket) must
    not generate a quadratic candidate set: buckets over the cap are
    dropped entirely, small buckets keep emitting pairs."""
    from pyspark.sql import functions as F

    from docker_airflow_spark_minio_spark.workloads.multimodal import (
        _capped_band_pairs,
    )

    rows = [(i, "dg", 0, 7) for i in range(30)]  # hot: 30 members, bkey 7
    rows += [(100, "dg", 0, 9), (101, "dg", 1, 9)]  # cold: 2 members
    bands = spark.createDataFrame(
        rows, "doc_id long, digest string, dhash long, bkey long"
    )
    capped = _capped_band_pairs(bands, cap=10).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in capped} == {(100, 101)}
    assert capped[0]["hamming"] == 1 and capped[0]["byte_identical"] == 1
    uncapped = _capped_band_pairs(bands, cap=1000)
    assert uncapped.count() == 30 * 29 // 2 + 1
