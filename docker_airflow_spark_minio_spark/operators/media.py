"""Multimodal (binary-payload) column operators.

Images/audio/video are carried as opaque ``binary`` columns with typed
metadata, per the training-data-pipeline extension (SURVEY.md section
7.2.5; the reference has no binary payloads -- its closest notion is the
opaque JSON body it round-trips through bronze, reference
datalake_silver_spark_dag.py:120-140).

Decode paths:

 * :func:`decode_image` / :func:`decode_audio` -- the REAL decode entry
   points, gated behind import-try of the media libraries.  The libs are
   not installed in this environment, so these raise
   ``NotImplementedError`` (STUB, clearly marked); the Spark-side
   plumbing around them -- binary column handling, Arrow batch shape,
   ``mapInPandas`` signature, output schema -- is real and tested via the
   deterministic byte-level extractor below.
 * :func:`extract_byte_features` -- a deterministic feature extractor
   over the raw bytes (length, checksum, boundary bytes, every-k-th-byte
   "frame sample").  It has the exact shape a real image/audio feature
   pass would have (``mapInPandas`` over Arrow batches, one output row
   per payload, typed schema), and is ANSI-SQL expressible so the DuckDB
   oracle can verify the whole pipeline bit-for-bit.

Scale notes (100 TB posture):
 * ``mapInPandas`` streams Arrow record batches executor-side: no
   shuffle, no driver involvement, and column pruning still reaches the
   parquet scan (only id + payload columns are read)
 * per-batch work is bounded by
   ``spark.sql.execution.arrow.maxRecordsPerBatch``; payload bytes never
   enter a shuffle -- downstream aggregations see only the small typed
   feature rows
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

FRAME_STEP = 16  # every-k-th-byte "frame sample" step

BYTE_FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, byte_sum long, first_byte long, "
    "last_byte long, n_frames long, frame_sum long"
)


def decode_image(payload: bytes) -> "np.ndarray":
    """Decode an image payload to an HxWxC uint8 array.

    STUB: requires an image library (e.g. Pillow) that is not installed
    here; the surrounding Spark plumbing is exercised through
    :func:`extract_byte_features` instead.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires Pillow, which is not installed in this "
            "environment; use extract_byte_features for the tested "
            "deterministic path"
        ) from exc
    import io

    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(payload)))


def decode_audio(payload: bytes) -> "np.ndarray":
    """Decode an audio payload to a 1-D sample array.

    STUB: requires an audio library (e.g. soundfile); not installed here.
    """
    try:
        import soundfile  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "audio decode requires soundfile, which is not installed in "
            "this environment"
        ) from exc
    import io

    import soundfile

    data, _rate = soundfile.read(io.BytesIO(payload))
    return data


def extract_byte_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_step: int = FRAME_STEP,
) -> DataFrame:
    """Deterministic per-payload byte features via ``mapInPandas``.

    One output row per payload: size, byte checksum, boundary bytes, and
    an every-``frame_step``-th-byte "frame sample" (count + checksum) --
    the same batch shape a real decode/feature pass would use.  Empty
    payloads yield zero counts and -1 boundary bytes.
    """

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, buf in zip(pdf[id_col], pdf[payload_col]):
                b = np.frombuffer(bytes(buf), dtype=np.uint8)
                frames = b[::frame_step]
                out.append(
                    (
                        int(doc_id),
                        int(b.size),
                        int(b.sum()),
                        int(b[0]) if b.size else -1,
                        int(b[-1]) if b.size else -1,
                        int(frames.size),
                        int(frames.sum()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "n_bytes",
                    "byte_sum",
                    "first_byte",
                    "last_byte",
                    "n_frames",
                    "frame_sum",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(
        _batches, schema=BYTE_FEATURE_SCHEMA
    )


FRAME_BYTES = 64  # fixed-size frame window for sample_frame_rows

FRAME_ROW_SCHEMA = "doc_id long, frame_idx long, frame_len long, frame_sum long"


def sample_frame_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_bytes: int = FRAME_BYTES,
) -> DataFrame:
    """Split each payload into fixed-size frames: ONE INPUT ROW -> N
    OUTPUT ROWS, the video-frame-sampling / audio-windowing shape.

    ``mapInPandas`` is the right operator for row-expanding media work:
    the output row count per input is data-dependent (a UDTF shape a
    scalar pandas_udf cannot express), payload bytes stay inside the
    Arrow batch on the executor, and downstream sees only small typed
    frame rows.  A real video pipeline swaps the byte-slice for a codec
    frame iterator; the plumbing (batch iteration, schema, expansion) is
    identical and oracle-tested here.
    """

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, sums = [], [], [], []
            for doc_id, buf in zip(pdf[id_col], pdf[payload_col]):
                b = np.frombuffer(bytes(buf), dtype=np.uint8)
                for i in range(0, max((b.size + frame_bytes - 1) // frame_bytes, 0)):
                    fr = b[i * frame_bytes : (i + 1) * frame_bytes]
                    ids.append(int(doc_id))
                    idxs.append(i)
                    lens.append(int(fr.size))
                    sums.append(int(fr.sum()))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_len": lens, "frame_sum": sums}
            )

    return df.select(id_col, payload_col).mapInPandas(_frames, schema=FRAME_ROW_SCHEMA)


RESIZE_BLOCK = 8  # box-filter block size for resize_block_downsample

RESIZE_SCHEMA = (
    "doc_id long, n_blocks long, block_checksum long, max_block_sum long, "
    "first_block_sum long"
)


def resize_block_downsample(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    block: int = RESIZE_BLOCK,
) -> DataFrame:
    """Box-filter downsample of each payload: the RESIZE shape.

    Treats the payload as a 1-D uint8 signal and reduces every ``block``
    bytes to one integer block sum (a box filter without the final
    divide, so the output stays integer-exact and oracle-able).  A real
    image resize swaps the reshape for a 2-D block mean over the decoded
    array -- the plumbing (vectorized numpy kernel per Arrow batch,
    fixed small output schema, payloads never leaving the executor) is
    identical.  Trailing partial blocks are dropped, as a strided
    resize would.
    """

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, buf in zip(pdf[id_col], pdf[payload_col]):
                b = np.frombuffer(bytes(buf), dtype=np.uint8)
                n = (b.size // block) * block
                sums = (
                    b[:n].reshape(-1, block).sum(axis=1, dtype=np.int64)
                    if n
                    else np.empty(0, dtype=np.int64)
                )
                out.append(
                    (
                        int(doc_id),
                        int(sums.size),
                        int(sums.sum()),
                        int(sums.max()) if sums.size else -1,
                        int(sums[0]) if sums.size else -1,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "n_blocks",
                    "block_checksum",
                    "max_block_sum",
                    "first_block_sum",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(_batches, schema=RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual dHash (difference hash) over the downsample grid
# ---------------------------------------------------------------------------

DHASH_BLOCK = 4  # bytes per grid cell (the downsample "pixel")
DHASH_BITS = 60  # gradient bits -> the hash; 60 keeps int64 positive


def dhash_payloads(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    block: int = DHASH_BLOCK,
    bits: int = DHASH_BITS,
) -> DataFrame:
    """Perceptual DIFFERENCE HASH of each payload: box-filter the first
    ``(bits+1) * block`` bytes into a ``bits+1``-cell grid (the same
    kernel as :func:`resize_block_downsample`), then set gradient bit j
    iff cell j+1 > cell j.  The classic image dHash, computed over the
    1-D byte signal: uniform transforms that preserve local gradients --
    appended trailers/metadata (past the grid), constant brightness
    shifts, re-encodes with small noise -- keep the hash identical or
    Hamming-close, while md5 changes on any byte.  A real image pipeline
    swaps the byte grid for the decoded luminance grid; the hash
    construction, banding and verification are identical.

    Payloads shorter than the grid are SKIPPED (no stable gradient
    signature exists); filter consistently upstream.  Pure map
    (``mapInPandas``, vectorized numpy per Arrow batch): payload bytes
    never leave the executor -- only the 8-byte hash shuffles into the
    band join downstream.
    """
    need = (bits + 1) * block

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shifts = np.arange(bits, dtype=np.int64)
        for pdf in batches:
            ids, hs = [], []
            for doc_id, buf in zip(pdf[id_col], pdf[payload_col]):
                b = np.frombuffer(bytes(buf), dtype=np.uint8)
                if b.size < need:
                    continue
                g = b[:need].reshape(bits + 1, block).sum(axis=1, dtype=np.int64)
                diff = (g[1:] > g[:-1]).astype(np.int64)
                hs.append(int((diff << shifts).sum()))
                ids.append(int(doc_id))
            yield pd.DataFrame({id_col: ids, "dhash": hs})

    return df.select(id_col, payload_col).mapInPandas(
        _batches, schema=f"{id_col} long, dhash long"
    )
