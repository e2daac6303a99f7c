"""Z-order (Morton) clustering key: multi-dimensional data layout.

A single-column sort gives parquet row-group min/max stats that prune
scans on THAT column only; range predicates on a second dimension read
everything.  Interleaving the bits of two (or more) normalized columns
into one Morton code and sorting by it keeps rows that are close in
EVERY dimension close on disk -- both dimensions get usable min/max
pruning from one layout.  This is the same technique behind
Delta/Iceberg ``ZORDER BY``; here it is a plain column expression, so
``sortWithinPartitions(z)`` + the existing writers reproduce it with no
table-format dependency.

The interleave is pure integer arithmetic (shifts + masks), identical
in ANSI SQL -- so the key itself is oracle-checkable, and the layout
benefit is asserted by the accompanying test (per-chunk min/max spread
shrinks on BOTH dimensions vs a one-column sort).

Scale notes: computing z is a pure map; the sort is the same shuffle a
one-column cluster-write already pays.  At 100 TB you z-sort once at
ingest and every later range scan on either dimension skips row groups.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ZORDER_BITS = 16  # bits kept per dimension -> 2*bits-bit Morton code


def zorder_value(x: Column, y: Column, bits: int = ZORDER_BITS) -> Column:
    """Morton code of two non-negative integer columns (low ``bits`` of
    each, interleaved x-even / y-odd).  Columns should be pre-normalized
    to [0, 2^bits) -- e.g. ``F.pmod(col, F.lit(1 << bits))`` or a
    rank/bucket transform for skewed domains."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(
                F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return z


def zorder_value_n(cols: list[Column], bits: int = ZORDER_BITS) -> Column:
    """Morton code of N non-negative integer columns (low ``bits`` of
    each, interleaved round-robin -- column i owns output bit
    ``j*N + i`` for its input bit j).  ``N * bits`` must stay below 63
    so the code fits a signed long.  With N=2 this equals
    :func:`zorder_value`'s bit layout."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs at least 2 columns")
    if n * bits > 62:
        raise ValueError(f"{n} columns x {bits} bits overflow a long")
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        for j in range(bits):
            z = z + F.shiftleft(
                F.shiftright(c.cast("long"), j).bitwiseAND(F.lit(1)),
                j * n + i,
            )
    return z


def zorder_sql(x: str, y: str, bits: int = ZORDER_BITS) -> str:
    """ANSI-SQL twin of :func:`zorder_value` for oracle strings."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"
