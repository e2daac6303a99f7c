"""Z-order layout test: the physical claim behind the Morton key.

Sorting by the interleaved code must bound per-chunk min/max spread on
BOTH dimensions; a one-column sort clusters its own column perfectly
and leaves the other dimension's spread near the full domain.  This is
exactly what parquet row-group pruning sees, asserted on in-memory
chunks so the test stays fast and deterministic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from docker_airflow_spark_minio_spark.operators.zorder import zorder_value

DOMAIN = 64          # x, y in [0, 64)
CHUNK = 256          # rows per simulated row group (4096 rows total)


def _chunk_spreads(rows: list[tuple[int, int]]) -> tuple[float, float]:
    """Mean per-chunk (max-min) spread of x and y over fixed-size chunks
    of the given row order -- a stand-in for row-group min/max width."""
    xs, ys = [], []
    for i in range(0, len(rows), CHUNK):
        chunk = rows[i : i + CHUNK]
        cx = [r[0] for r in chunk]
        cy = [r[1] for r in chunk]
        xs.append(max(cx) - min(cx))
        ys.append(max(cy) - min(cy))
    return sum(xs) / len(xs), sum(ys) / len(ys)


def test_zorder_bounds_both_dimensions(spark):
    grid = spark.range(DOMAIN * DOMAIN).select(
        (F.col("id") % DOMAIN).alias("x"), (F.col("id") / DOMAIN).cast("long").alias("y")
    )
    z_sorted = grid.withColumn("z", zorder_value(F.col("x"), F.col("y"), 6)).orderBy("z")
    x_sorted = grid.orderBy("x")

    z_rows = [(r["x"], r["y"]) for r in z_sorted.collect()]
    x_rows = [(r["x"], r["y"]) for r in x_sorted.collect()]

    zx, zy = _chunk_spreads(z_rows)
    sx, sy = _chunk_spreads(x_rows)

    # one-column sort: x chunks are razor thin, y spans the whole domain
    assert sx <= 4 and sy >= DOMAIN - 1
    # z-order: BOTH dimensions bounded well below the domain width
    assert zx <= DOMAIN / 2 and zy <= DOMAIN / 2
    # and the max(worst dimension) is strictly better than the 1-col sort
    assert max(zx, zy) < max(sx, sy) / 2


def test_zorder_value_is_monotone_interleave(spark):
    """Spot-check the bit interleave: (x=3, y=5, 3 bits) ->
    x bits 11 at even positions, y bits 101 at odd -> 0b100111 = 39."""
    row = (
        spark.range(1)
        .select(zorder_value(F.lit(3), F.lit(5), 3).alias("z"))
        .collect()[0]
    )
    assert row["z"] == 39
