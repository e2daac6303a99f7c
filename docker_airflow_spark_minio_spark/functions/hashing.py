"""Cross-engine deterministic hashing.

Spark's ``hash``/``xxhash64`` and DuckDB's ``hash`` are different
algorithms, so anything hash-partitioned could never be oracle-checked.
Both engines DO share md5.  ``h32`` derives a 32-bit integer hash from
md5 that is bit-identical in both:

 * DuckDB: ``md5_number_lower(s)`` = lower 8 bytes of the digest,
   little-endian -> take ``% 2^32`` (the low 4 bytes = digest bytes 8..11).
 * Spark: the same 4 digest bytes from the hex form, reversed pairwise
   (little-endian), parsed via ``conv(..., 16, 10)``.

32-bit values keep ``a*h + b`` inside signed-64 range in both engines
(DuckDB raises on BIGINT overflow), which the MinHash permutations need.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Permutation count / banding for MinHash-LSH: 16 hashes = 4 bands x 4 rows.
MINHASH_K = 16
MINHASH_BANDS = 4
MINHASH_ROWS = MINHASH_K // MINHASH_BANDS
MINHASH_PRIME = 4_294_967_311  # smallest prime > 2^32


def _lcg_params(k: int = MINHASH_K) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the permutations h_j(x) = (a*x+b) % p.
    Plain LCG so the constants are reproducible from code alone (no RNG
    state); a is kept < 2^30 so a*h32 cannot overflow int64."""
    params, state = [], 42
    for _ in range(k):
        state = (state * 6_364_136_223_846_793_005 + 1_442_695_040_888_963_407) % (1 << 63)
        a = (state >> 33) % ((1 << 30) - 1) + 1
        state = (state * 6_364_136_223_846_793_005 + 1_442_695_040_888_963_407) % (1 << 63)
        b = (state >> 33) % MINHASH_PRIME
        params.append((a, b))
    return params


MINHASH_PARAMS: list[tuple[int, int]] = _lcg_params()


def h32(col: Column | str) -> Column:
    """32-bit md5-derived hash (Spark side). Equals
    ``(md5_number_lower(x) % 4294967296)`` in DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    hexd = F.md5(c)
    le = F.concat(
        F.substring(hexd, 23, 2),
        F.substring(hexd, 21, 2),
        F.substring(hexd, 19, 2),
        F.substring(hexd, 17, 2),
    )
    return F.conv(le, 16, 10).cast("long")


def h32_sql(expr: str) -> str:
    """The DuckDB-SQL equivalent of :func:`h32` for oracle strings."""
    return f"CAST(md5_number_lower({expr}) % 4294967296 AS BIGINT)"


def h32_hi(col: Column | str) -> Column:
    """The OTHER 32 bits of the same md5 low-quadword (digest bytes
    12..15): an independent second hash stream for the price of zero
    extra digests -- one md5 yields both :func:`h32` and this."""
    c = F.col(col) if isinstance(col, str) else col
    hexd = F.md5(c)
    le = F.concat(
        F.substring(hexd, 31, 2),
        F.substring(hexd, 29, 2),
        F.substring(hexd, 27, 2),
        F.substring(hexd, 25, 2),
    )
    return F.conv(le, 16, 10).cast("long")


def h32_hi_sql(expr: str) -> str:
    """DuckDB equivalent of :func:`h32_hi`."""
    return f"CAST((md5_number_lower({expr}) // 4294967296) % 4294967296 AS BIGINT)"


def minhash_expr(hash_col: Column, j: int) -> Column:
    """j-th MinHash permutation of a 32-bit hash column (Spark side)."""
    a, b = MINHASH_PARAMS[j]
    return (hash_col * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)


def minhash_sql(hash_expr: str, j: int) -> str:
    """DuckDB-SQL equivalent of :func:`minhash_expr`."""
    a, b = MINHASH_PARAMS[j]
    return f"(({hash_expr}) * {a} + {b}) % {MINHASH_PRIME}"
