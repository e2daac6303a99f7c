"""Skew mitigation: salted joins.

AQE's skew-join handles sort-merge skew at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on by default in
:mod:`..session`), and partial aggregation already absorbs groupBy skew.
The remaining case is a shuffle join whose probe side has a few huge hot
keys: one task receives the whole hot partition and the stage runs at
the speed of that straggler.  The classic fix is salting -- spread each
probe row across ``salts`` sub-keys and replicate every build row to all
of them:

    probe:  (k)       -> (k, pmod(rand_or_id, S))
    build:  (k)       -> (k, 0), (k, 1), ... (k, S-1)   [explode]
    join on (k, salt) -> each hot key now fills S tasks

Replication multiplies the build side by S, so use it when build is the
(much) smaller side and AQE's split isn't available (e.g. broadcast is
too big but the build side is still modest).  Results are identical to
the plain join -- pytest asserts that, no oracle needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    salts: int = 8,
    how: str = "inner",
    salt_by: str | None = None,
) -> DataFrame:
    """Join ``probe`` with ``build`` on ``on`` with ``salts``-way key
    spreading.

    ``salt_by``: a probe column whose hash spreads the rows OF ONE KEY
    across salts -- it must vary within a key (a row id, a timestamp),
    never the join key itself (same key -> same salt -> no spreading).
    Default: seeded ``rand()`` -- the join result is salt-invariant, so
    nondeterministic salt values are safe; pass ``salt_by`` when you
    want task-stable placement too.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "left_anti"):
        # right/full joins would surface each unmatched build row once
        # PER REPLICA (salts copies) -- semantically wrong by construction
        raise ValueError(f"salted_join supports probe-preserving joins only, not {how!r}")
    if salt_by:
        spread = F.pmod(F.hash(F.col(salt_by)), F.lit(salts))
    else:
        spread = F.floor(F.rand(42) * salts).cast("int")
    p = probe.withColumn(SALT_COL, spread)
    b = build.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    return p.join(b, [*on, SALT_COL], how).drop(SALT_COL)
