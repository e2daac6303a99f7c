"""Multimodal (binary-column) workloads.

The ``documents`` table provides a deterministic binary payload
(``encode(text, 'utf-8')`` -- the corpus is pure ASCII, so byte offsets
and code points agree between engines), carried next to typed metadata
exactly the way image/audio payloads would be.  Two surfaces:

 * **JVM-side metadata pass** -- octet lengths, content digests,
   duplicate-payload detection: everything a catalog scan over a binary
   column needs, with no Python anywhere.
 * **``mapInPandas`` feature pass** -- the Arrow-batched decode shape
   (:mod:`..operators.media`): per-payload byte features including an
   every-k-th-byte "frame sample", verified row-for-row by a DuckDB
   oracle.  Real image/audio decode slots into the same operator; the
   libs are absent here so that step is a clearly-marked stub.

Scale notes (100 TB posture):
 * payload bytes never enter a shuffle: the metadata pass reduces to
   per-source sums on the scan; the feature pass emits small typed rows
 * the feature query's only shuffle is the final ORDER BY on doc_id
   (driver-side determinism for the oracle; drop it in production)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.media import (
    FRAME_BYTES,
    FRAME_STEP,
    RESIZE_BLOCK,
    extract_byte_features,
    resize_block_downsample,
    sample_frame_rows,
)
from .base import load_tables, register


def _with_payload(docs: DataFrame) -> DataFrame:
    """Attach the binary payload + typed media metadata columns."""
    return docs.select(
        "doc_id",
        "lang",
        "source",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
    )


# ---------------------------------------------------------------------------
# JVM-side binary metadata scan
# ---------------------------------------------------------------------------


@register(
    "multimodal_binary_metadata",
    oracle="""
    WITH b AS (
        SELECT source,
               octet_length(encode(text)) AS n_bytes,
               md5(text)                  AS digest
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT)              AS n_payloads,
           CAST(SUM(n_bytes) AS BIGINT)          AS total_bytes,
           CAST(MAX(n_bytes) AS BIGINT)          AS max_bytes,
           CAST(COUNT(DISTINCT digest) AS BIGINT) AS n_distinct_payloads
    FROM b GROUP BY source ORDER BY source
    """,
    category="multimodal",
    description="binary-column metadata scan: per-source payload counts, "
    "byte totals, md5-distinct payloads -- all JVM-side, bytes never "
    "shuffled",
)
def multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _with_payload(load_tables(spark, sf_dir)["documents"])
    b = docs.select(
        "source",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("digest"),
    )
    return (
        b.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_payloads"),
            F.sum("n_bytes").alias("total_bytes"),
            F.max("n_bytes").alias("max_bytes"),
            F.countDistinct("digest").cast("long").alias("n_distinct_payloads"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Arrow-batched byte-feature extraction (the decode shape)
# ---------------------------------------------------------------------------


@register(
    "multimodal_byte_features",
    oracle=f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(list_sum(list_transform(range(1, len(text) + 1),
                                        i -> ord(text[i]))) AS BIGINT) AS byte_sum,
           CAST(ord(text[1]) AS BIGINT)  AS first_byte,
           CAST(ord(text[-1]) AS BIGINT) AS last_byte,
           CAST(len(range(1, len(text) + 1, {FRAME_STEP})) AS BIGINT) AS n_frames,
           CAST(list_sum(list_transform(range(1, len(text) + 1, {FRAME_STEP}),
                                        i -> ord(text[i]))) AS BIGINT) AS frame_sum
    FROM documents ORDER BY doc_id
    """,
    category="multimodal",
    description=f"mapInPandas byte-feature extraction (Arrow batches, one "
    f"typed row per payload): size, checksum, boundary bytes, every-"
    f"{FRAME_STEP}th-byte frame sample -- the real decode plumbing with a "
    "deterministic extractor",
)
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _with_payload(load_tables(spark, sf_dir)["documents"])
    return extract_byte_features(docs).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Frame sampling: one payload -> N frame rows (the video/audio shape)
# ---------------------------------------------------------------------------


@register(
    "multimodal_frame_sample",
    oracle=f"""
    WITH f AS (
        SELECT doc_id,
               CAST(i AS BIGINT) AS frame_idx,
               CAST(least({FRAME_BYTES}, len(text) - i * {FRAME_BYTES}) AS BIGINT)
                   AS frame_len,
               CAST(list_sum(list_transform(
                    range(i * {FRAME_BYTES} + 1,
                          i * {FRAME_BYTES}
                            + least({FRAME_BYTES}, len(text) - i * {FRAME_BYTES}) + 1),
                    j -> ord(text[j]))) AS BIGINT) AS frame_sum
        FROM documents
        CROSS JOIN (SELECT unnest(range(0, 200)) AS i)
        WHERE i * {FRAME_BYTES} < len(text)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT)      AS n_frames,
           CAST(SUM(frame_len) AS BIGINT) AS total_len,
           CAST(SUM(frame_sum) AS BIGINT) AS total_sum,
           CAST(MAX(frame_sum) AS BIGINT) AS max_frame_sum
    FROM f GROUP BY doc_id ORDER BY doc_id
    """,
    category="multimodal",
    description=f"frame sampling (1 payload -> N {FRAME_BYTES}-byte frame "
    "rows via mapInPandas, the video/audio windowing shape), then a "
    "per-doc roll-up over the expanded frames -- payload bytes never "
    "leave the executor, the shuffle carries only typed frame rows",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _with_payload(load_tables(spark, sf_dir)["documents"])
    frames = sample_frame_rows(docs)
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum("frame_len").alias("total_len"),
            F.sum("frame_sum").alias("total_sum"),
            F.max("frame_sum").alias("max_frame_sum"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Resize: box-filter block downsample (one payload -> fixed smaller signal)
# ---------------------------------------------------------------------------


@register(
    "multimodal_resize_downsample",
    oracle=f"""
    WITH r AS (
        SELECT doc_id,
               len(text) // {RESIZE_BLOCK} AS n_blocks,
               list_transform(range(0, len(text) // {RESIZE_BLOCK}),
                   i -> CAST(list_sum(list_transform(
                            range(i * {RESIZE_BLOCK} + 1,
                                  i * {RESIZE_BLOCK} + {RESIZE_BLOCK} + 1),
                            j -> ord(text[j]))) AS BIGINT)) AS sums
        FROM documents
    )
    SELECT doc_id,
           CAST(n_blocks AS BIGINT) AS n_blocks,
           CAST(COALESCE(list_sum(sums), 0) AS BIGINT) AS block_checksum,
           CAST(COALESCE(list_max(sums), -1) AS BIGINT) AS max_block_sum,
           CAST(COALESCE(sums[1], -1) AS BIGINT)        AS first_block_sum
    FROM r ORDER BY doc_id
    """,
    category="multimodal",
    description=f"resize shape: box-filter downsample of each payload "
    f"({RESIZE_BLOCK}-byte blocks -> integer block sums, vectorized "
    "numpy reshape per Arrow batch); a real image resize swaps the "
    "reshape for a 2-D block mean, same plumbing",
)
def multimodal_resize_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _with_payload(load_tables(spark, sf_dir)["documents"])
    return resize_block_downsample(docs).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Exact payload dedup (keep-first by content digest)
# ---------------------------------------------------------------------------


@register(
    "multimodal_payload_dedup",
    oracle="""
    WITH b AS (
        SELECT doc_id, source,
               octet_length(encode(text)) AS n_bytes,
               md5(text)                  AS digest
        FROM documents
    ), r AS (
        SELECT source, n_bytes,
               ROW_NUMBER() OVER (PARTITION BY digest ORDER BY doc_id) AS rn
        FROM b
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT)                      AS n_payloads,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                                                         AS n_kept,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                                                         AS n_dupes,
           CAST(SUM(CASE WHEN rn > 1 THEN n_bytes ELSE 0 END) AS BIGINT)
                                                         AS reclaimed_bytes
    FROM r GROUP BY source ORDER BY source
    """,
    category="multimodal",
    description="exact payload dedup (the image/audio-pipeline step): "
    "keep the first copy per content digest (md5 of the binary payload, "
    "min doc_id), account dropped duplicates and RECLAIMED BYTES per "
    "source -- the storage-savings number a media-dedup pass reports; "
    "one hash shuffle on the 16-byte digest, payload bytes never travel",
)
def multimodal_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale notes: the only shuffle keys on the md5 digest (16 bytes +
    small metadata per row -- payloads stay in the scan); keep-first is
    one row_number window per digest group, and the per-source rollup
    is a second metadata-sized aggregate.  At 100 TB of media this is
    the standard first dedup pass (byte-identical copies dominate crawl
    duplicates) run before any perceptual/near-dup method; the near-dup
    analogs live in the dedup family (SimHash/MinHash/embedding)."""
    from pyspark.sql import Window

    docs = _with_payload(load_tables(spark, sf_dir)["documents"])
    b = docs.select(
        "doc_id",
        "source",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("digest"),
    )
    r = b.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("digest").orderBy("doc_id")),
    )
    return (
        r.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_payloads"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.sum(F.when(F.col("rn") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dupes"),
            F.sum(F.when(F.col("rn") > 1, F.col("n_bytes")).otherwise(0))
            .cast("long")
            .alias("reclaimed_bytes"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Perceptual near-duplicate detection (dHash + Hamming bands)
# ---------------------------------------------------------------------------

# dHash geometry (operators.media.dhash_payloads): 61 grid cells of 4
# bytes -> 60 gradient bits; payloads below the grid have no stable
# signature and are excluded IDENTICALLY in both engines.
PDHASH_MIN_BYTES = (60 + 1) * 4
# banding: 4 bands x 15 bits -- same construction as the text SimHash
# banding (dedup.py): docs sharing ANY band key become candidates, so
# candidate cost ~ sum of band-bucket^2, never all-pairs.
PDHASH_BANDS = 4
PDHASH_BAND_BITS = 15
PDHASH_HAM_MAX = 4  # verified Hamming radius (of 60 bits)
# Hot-bucket cap (family parity with the text candidate generators --
# JACCARD_DF_CAP / SUBSTR_DF_CAP in dedup.py): a band bucket holding
# more than this many members is dropped from pair generation, so a
# degenerate corpus where thousands of payloads share one downsample
# grid can never make a quadratic band bucket (worst case per bucket is
# CAP^2 comparisons, a bounded task).  The documented recall trade: a
# genuinely hot visual motif loses ONE band's candidates but keeps the
# other bands' (a pair is found via ANY shared band).
PDHASH_BUCKET_CAP = 256
# planted byte-distinct visually-identical variants: same leading
# bytes (the whole dHash grid), different trailer -- the appended-
# metadata / EXIF-trailer case; md5 differs, dHash is equal.
PDHASH_PLANT_MOD = 5
PDHASH_PLANT_OFFSET = 10_000_000
PDHASH_TRAILER = " [exif-stripped duplicate trailer]"


def _capped_band_pairs(bands: DataFrame, cap: int) -> DataFrame:
    """Band-equality candidate pairs with the HOT-BUCKET CAP applied
    before the self-join: band keys held by more than ``cap`` members
    are dropped from pair generation entirely (left-semi against the
    small-bucket key set -- evaluated map-side on the same bkey shuffle
    the self-join needs), so per-bucket work is bounded by ``cap**2``
    regardless of corpus degeneracy.  Input needs columns
    ``doc_id, digest, dhash, bkey``; output is distinct
    ``(doc_a, doc_b, hamming, byte_identical)`` candidate pairs (the
    caller applies the Hamming radius)."""
    sizes = bands.groupBy("bkey").agg(F.count(F.lit(1)).alias("bsz"))
    kept = bands.join(
        sizes.where(F.col("bsz") <= cap).select("bkey"), "bkey", "left_semi"
    )
    a, b = kept.alias("a"), kept.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.dhash").bitwiseXOR(F.col("b.dhash")))
            .cast("long")
            .alias("hamming"),
            F.when(F.col("a.digest") == F.col("b.digest"), 1)
            .otherwise(0)
            .cast("long")
            .alias("byte_identical"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )


def _pdhash_band_key_sql(k: int) -> str:
    return (
        f"CAST({k} * {1 << PDHASH_BAND_BITS} + "
        f"((dhash >> {k * PDHASH_BAND_BITS}) & {(1 << PDHASH_BAND_BITS) - 1}) AS BIGINT)"
    )


@register(
    "multimodal_perceptual_dedup",
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id, text AS t FROM documents
        WHERE length(text) >= {PDHASH_MIN_BYTES}
        UNION ALL
        SELECT doc_id + {PDHASH_PLANT_OFFSET},
               text || '{PDHASH_TRAILER}'
        FROM documents
        WHERE length(text) >= {PDHASH_MIN_BYTES}
          AND doc_id % {PDHASH_PLANT_MOD} = 0
    ),
    grids AS (
        SELECT doc_id, md5(t) AS digest,
               list_transform(range(0, 61), j ->
                   list_sum(list_transform(range(1, 5), i ->
                       CAST(ord(substr(t, j * 4 + i, 1)) AS BIGINT)))
               ) AS g
        FROM corpus
    ),
    hashes AS (
        SELECT doc_id, digest,
               list_sum(list_transform(range(1, 61), j ->
                   CASE WHEN g[j + 1] > g[j]
                        THEN (CAST(1 AS BIGINT) << (j - 1))
                        ELSE CAST(0 AS BIGINT) END)) AS dhash
        FROM grids
    ),
    bands AS (
        {" UNION ALL ".join(
            f"SELECT doc_id, digest, dhash, {_pdhash_band_key_sql(k)} AS bkey FROM hashes"
            for k in range(PDHASH_BANDS)
        )}
    ),
    kept AS (
        SELECT * FROM bands WHERE bkey IN (
            SELECT bkey FROM bands
            GROUP BY bkey HAVING COUNT(*) <= {PDHASH_BUCKET_CAP}
        )
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming,
               CAST(CASE WHEN a.digest = b.digest THEN 1 ELSE 0 END AS BIGINT)
                   AS byte_identical
        FROM kept a JOIN kept b
          ON a.bkey = b.bkey AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, hamming, byte_identical
    FROM pairs WHERE hamming <= {PDHASH_HAM_MAX}
    ORDER BY doc_a, doc_b
    """,
    category="multimodal",
    description=f"perceptual media near-dup (dHash + Hamming bands): "
    f"{PDHASH_BANDS * PDHASH_BAND_BITS}-bit difference hash over the "
    "box-filter downsample grid (operators.media.dhash_payloads -- the "
    "image dHash computed on the byte signal; a real pipeline swaps in "
    "the decoded luminance grid), banded "
    f"{PDHASH_BANDS}x{PDHASH_BAND_BITS} bits for candidates (never "
    f"all-pairs), verified at Hamming <= {PDHASH_HAM_MAX}; planted "
    "byte-DISTINCT visually-identical variants (same grid bytes, "
    "different trailer -- md5 differs) are runtime-asserted found and "
    "flagged; only 8-byte hashes + band keys ever shuffle; band buckets "
    f"holding > {PDHASH_BUCKET_CAP} members are dropped pre-join "
    "(hot-bucket cap, family parity with JACCARD_DF_CAP/SUBSTR_DF_CAP) "
    "so a degenerate corpus can never make a quadratic bucket",
)
def multimodal_perceptual_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.media import dhash_payloads

    docs = load_tables(spark, sf_dir)["documents"].where(
        F.length("text") >= PDHASH_MIN_BYTES
    )
    corpus = docs.select("doc_id", F.col("text").alias("t")).unionAll(
        docs.where(F.col("doc_id") % PDHASH_PLANT_MOD == 0).select(
            (F.col("doc_id") + PDHASH_PLANT_OFFSET).alias("doc_id"),
            F.concat(F.col("text"), F.lit(PDHASH_TRAILER)).alias("t"),
        )
    )
    payloads = corpus.select(
        "doc_id",
        F.md5(F.encode("t", "utf-8")).alias("digest"),
        F.encode("t", "utf-8").alias("payload"),
    )
    hashes = dhash_payloads(payloads, id_col="doc_id").join(
        payloads.select("doc_id", "digest"), "doc_id"
    )
    mask = (1 << PDHASH_BAND_BITS) - 1
    bands = hashes.select(
        "doc_id",
        "digest",
        "dhash",
        F.explode(
            F.array(
                *[
                    (
                        F.lit(k * (1 << PDHASH_BAND_BITS))
                        + F.shiftright("dhash", k * PDHASH_BAND_BITS).bitwiseAND(
                            F.lit(mask)
                        )
                    ).cast("long")
                    for k in range(PDHASH_BANDS)
                ]
            )
        ).alias("bkey"),
    )
    pairs = _capped_band_pairs(bands, PDHASH_BUCKET_CAP).where(
        F.col("hamming") <= PDHASH_HAM_MAX
    )
    # Materialize the (small, bucket-capped) pair set ONCE: the planted
    # gate below and the returned frame otherwise each recompute the
    # whole dhash+band pipeline -- the same single-compute pattern the
    # graph operators use (operators/graph.py localCheckpoint).
    pairs = pairs.localCheckpoint(eager=True)
    out = pairs.orderBy("doc_a", "doc_b")
    # runtime gate: every planted variant is FOUND (hamming 0, same
    # band keys by construction) and flagged byte-DISTINCT
    planted = out.where(
        (F.col("doc_b") - F.col("doc_a") == PDHASH_PLANT_OFFSET)
        & (F.col("doc_a") % PDHASH_PLANT_MOD == 0)
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("hamming") == 0, 1).otherwise(0)).alias("exact"),
        F.sum("byte_identical").alias("byteid"),
    ).collect()[0]
    expected = docs.where(F.col("doc_id") % PDHASH_PLANT_MOD == 0).count()
    if planted["n"] < expected or planted["exact"] < expected:
        raise AssertionError(
            f"planted near-dups missed: found {planted['n']}/{expected} "
            f"({planted['exact']} at hamming 0)"
        )
    if planted["byteid"] != 0:
        raise AssertionError(
            "planted variants must be byte-DISTINCT (md5 differs)"
        )
    return out
