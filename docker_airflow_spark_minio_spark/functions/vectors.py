"""Vector math over ``array<float>`` embedding columns.

Pure JVM-side higher-order functions (``zip_with`` + ``aggregate``) -- no
Python in the hot path, so similarity scans stay inside codegen.  All
arithmetic is double: DuckDB's ``list_cosine_similarity`` on a FLOAT[]
cast to DOUBLE[] accumulates left-to-right in double exactly like
``aggregate`` does here, which keeps the oracle bit-compatible before
rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot_product(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def sign_bucket(a: Column | str, bits: int = 8) -> Column:
    """Random-hyperplane LSH bucket using the first ``bits`` axis signs
    (axis-aligned hyperplanes -- deterministic and ANSI-SQL expressible).
    Bucket id in [0, 2^bits)."""
    c = _as_double(a)
    expr = F.lit(0).cast("long")
    for i in range(bits):
        expr = expr + F.when(F.element_at(c, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return expr


def sign_bucket_sql(expr: str, bits: int = 8) -> str:
    """DuckDB equivalent of :func:`sign_bucket` (1-based list indexing)."""
    terms = [f"CASE WHEN ({expr})[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END" for i in range(bits)]
    return "(" + " + ".join(terms) + ")"
