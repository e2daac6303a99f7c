"""Declarative data-quality expectations, evaluated Spark-first.

The deequ/Great-Expectations-shaped surface a production pipeline runs
on every load before publishing a table: a list of CONSTRAINTS compiled
into as few passes as possible, returning one row per constraint with
its violation count.  The reference has no data-quality layer (its
silver job trusts the conform pass); this is extension surface per
SURVEY.md section 7.2.5, and the natural gate in front of
``storage``/``snapshots`` publishes.

Compilation strategy (100 TB posture):

 * every ROW-LEVEL constraint (``not_null``, ``in_range``,
   ``accepted_values``, ``matches``) becomes one conditional-count
   aggregate; ALL of them run in a single scan + single partial+final
   aggregate -- adding a constraint adds a column, not a pass.
 * ``unique`` needs a distinct count, compiled as ``COUNT(col) -
   COUNT(DISTINCT col)``.  ONE unique constraint rides the shared
   row-level aggregate (a single distinct group plans without a wide
   Expand); with TWO OR MORE, each compiles into its OWN
   single-distinct pass instead -- N distinct groups in one aggregate
   make Spark Expand every input row N+1 ways (the measured 12x row
   blow-up ``profile_lineitem_columns`` documents), while per-column
   passes each scan once with no Expand (measured 3x faster there).
 * ``references`` (referential integrity) cannot ride a single-table
   aggregate: each one compiles to a LEFT ANTI join against the
   (deduplicated) target keys and counts survivors.  The target side is
   aggregated to distinct keys first, so the join shuffles keys only;
   a dimension-sized target broadcasts under AQE.

Everything returns integers (violation counts), so results are
oracle-exact across engines.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One named constraint; ``kind`` selects the compilation path."""

    name: str
    kind: str  # not_null | in_range | accepted_values | matches | unique | references
    col: str
    lo: float | None = None
    hi: float | None = None
    values: tuple = ()
    pattern: str | None = None
    ref: DataFrame | None = None
    ref_col: str | None = None


def not_null(col: str) -> Expectation:
    return Expectation(f"not_null({col})", "not_null", col)


def in_range(col: str, lo, hi) -> Expectation:
    return Expectation(f"in_range({col},{lo},{hi})", "in_range", col, lo=lo, hi=hi)


def accepted_values(col: str, *values) -> Expectation:
    return Expectation(
        f"accepted_values({col})", "accepted_values", col, values=tuple(values)
    )


def matches(col: str, pattern: str) -> Expectation:
    return Expectation(f"matches({col})", "matches", col, pattern=pattern)


def unique(col: str) -> Expectation:
    return Expectation(f"unique({col})", "unique", col)


def references(col: str, ref: DataFrame, ref_col: str) -> Expectation:
    """Referential integrity: every non-NULL ``col`` value exists in
    ``ref[ref_col]``.  NULL foreign keys are NOT violations here --
    compose with :func:`not_null` to also require presence."""
    return Expectation(
        f"references({col}->{ref_col})", "references", col, ref=ref, ref_col=ref_col
    )


def _violation(e: Expectation) -> Column:
    """NULL handling: only ``not_null`` flags NULLs -- value constraints
    apply to PRESENT values (completeness and validity are separate
    dimensions, the deequ convention), so a NULL is never double-counted
    across constraints."""
    c = F.col(e.col)
    if e.kind == "not_null":
        return c.isNull()
    if e.kind == "in_range":
        return c.isNotNull() & ~c.between(e.lo, e.hi)
    if e.kind == "accepted_values":
        return c.isNotNull() & ~c.isin(*e.values)
    if e.kind == "matches":
        return c.isNotNull() & ~c.rlike(e.pattern)
    raise ValueError(f"not a row-level expectation: {e.kind}")


def check(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Evaluate every expectation; returns ``(constraint_name,
    n_violations, passed)`` ordered by constraint name.

    Row-level constraints (plus a single ``unique``) share ONE
    aggregate over one scan; with 2+ uniques each gets its own
    single-distinct pass (no wide Expand -- see module docstring); each
    referential constraint adds one anti-join count.  The result is
    constraint-count rows -- metadata-sized regardless of input size.
    """
    if not expectations:
        raise ValueError("no expectations given")
    uniques = [e for e in expectations if e.kind == "unique"]
    split_uniques = len(uniques) > 1
    aggs: list[Column] = []
    names: list[str] = []
    for e in expectations:
        if e.kind == "unique":
            if split_uniques:
                continue
            aggs.append(
                (F.count(e.col) - F.countDistinct(e.col)).alias(f"v{len(names)}")
            )
            names.append(e.name)
        elif e.kind != "references":
            aggs.append(
                F.sum(F.when(_violation(e), 1).otherwise(0))
                .cast("long")
                .alias(f"v{len(names)}")
            )
            names.append(e.name)
    parts: list[DataFrame] = []
    if split_uniques:
        for e in uniques:
            parts.append(
                df.agg(
                    (F.count(e.col) - F.countDistinct(e.col))
                    .cast("long")
                    .alias("n_violations")
                ).select(F.lit(e.name).alias("constraint_name"), "n_violations")
            )
    if aggs:
        one = df.agg(*aggs)
        stack = ", ".join(f"'{n}', v{i}" for i, n in enumerate(names))
        parts.append(
            one.selectExpr(
                f"stack({len(names)}, {stack}) AS (constraint_name, n_violations)"
            )
        )
    for e in expectations:
        if e.kind != "references":
            continue
        keys = e.ref.select(F.col(e.ref_col).alias(e.col)).distinct()
        orphan = (
            df.where(F.col(e.col).isNotNull())
            .join(keys, e.col, "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
            .select(F.lit(e.name).alias("constraint_name"), "n_violations")
        )
        parts.append(orphan)
    out = reduce(lambda a, b: a.unionByName(b), parts)
    return out.select(
        "constraint_name",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("constraint_name")
