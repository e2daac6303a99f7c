"""Extended TPC-H query shapes (Q4/Q6/Q8/Q9/Q12/Q14/Q15/Q16/Q17/Q18/Q19/Q21/Q22).

The reference's own query surface is one group-by count (reference
job_gold.py:71-83); these shapes exercise the rest of the classic
decision-support patterns -- correlated EXISTS, conditional aggregation,
market-share ratios, HAVING filters, disjunctive pushdown, multi-EXISTS
correlation -- on the driver's synthetic star schema.

The synthetic tables lack ``partsupp``, ``l_commitdate``/``l_receiptdate``,
``l_shipmode`` and ``c_phone``, so shapes that need them are adapted to
equivalent plan structures over the available columns (noted per query);
the POINT of each query (its operator shape and its physical plan) is
preserved.

Cross-engine exactness rules (see workloads/base.py): every computed
column aliased identically in both engines; double sums that feed a
ROUND go through integer micro-units (``base.money_sum`` -- exact like
decimal, fast like BIGINT) so partial-aggregation order can never flip
a cent; ratios round late and coarse (6 dp).

Scale notes: filters sit on scans (parquet pushdown), only the fixed-size
``nation``/``region`` dims are broadcast by hint, every other join is left
to AQE's size check; semi/anti joins never multiply rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import (
    load_tables,
    micros,
    micros_round,
    money_finish,
    money_sum,
    money_sum_agg,
    register,
)

# Money terms, unqualified (Spark expr) and l-qualified (oracle SQL).
_REV = "l_extendedprice * (1 - l_discount)"
_REVQ = "l.l_extendedprice * (1 - l.l_discount)"


@register(
    "q6_revenue_change",
    oracle=f"""
    SELECT {money_sum("l_extendedprice * l_discount")} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    category="aggregation",
    description="TPC-H Q6: pure filtered scan + scalar aggregate -- every "
    "predicate reaches the parquet scan, no shuffle beyond the final "
    "single-row combine",
)
def q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    return li.filter(
        (F.col("l_shipdate") >= lo)
        & (F.col("l_shipdate") < hi)
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        money_sum_agg("l_extendedprice * l_discount", "revenue"),
        F.count(F.lit(1)).alias("n_items"),
    ).transform(money_finish, "revenue")


@register(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
    category="join",
    description="TPC-H Q4 shape: priority histogram of orders having a "
    "late lineitem (no l_commitdate in the synthetic schema; lateness = "
    "shipped >60 days after order) -- correlated EXISTS compiles to a "
    "left-semi join, no row multiplication",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp_ntz")
    o = t["orders"].filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           ROUND({micros_round("num_s", 4)} / {micros_round("den_s", 4)}, 6)
             AS mkt_share
    FROM (
        SELECT o_year,
               SUM(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END) AS num_s,
               SUM(volume) AS den_s
        FROM (
            SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
                   {micros(_REVQ)} AS volume,
                   n2.n_name AS nation
            FROM part p
            JOIN lineitem l ON p.p_partkey = l.l_partkey
            JOIN orders o   ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
            JOIN region r   ON n1.n_regionkey = r.r_regionkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
            WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        )
        GROUP BY o_year
    )
    ORDER BY o_year
    """,
    category="join",
    description="TPC-H Q8: national market share inside a region -- "
    "conditional numerator over an integer-micros volume, both sides of "
    "the ratio summed exactly then divided late; two nation broadcasts "
    "play different roles (customer region gate vs supplier identity)",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    p = t["part"].filter(F.col("p_type") == "PROMO").select("p_partkey")
    r = t["region"].filter(F.col("r_name") == "ASIA").select("r_regionkey")
    base = (
        t["lineitem"]
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.expr(micros(_REV)).alias("volume"),
            "nation",
        )
    )
    return (
        base.groupBy("o_year")
        .agg(
            F.sum(
                F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(
                    F.lit(0).cast("long")
                )
            ).alias("num_s"),
            F.sum("volume").alias("den_s"),
        )
        .select(
            "o_year",
            F.round(
                F.expr(micros_round("num_s", 4)) / F.expr(micros_round("den_s", 4)), 6
            ).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT nation, o_year, {micros_round("SUM(amount)", 2)} AS sum_profit
    FROM (
        SELECT n.n_name AS nation,
               CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
               {micros(_REVQ)}
                 - {micros("p.p_retailprice * 0.1 * l.l_quantity")} AS amount
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%widget%'
    )
    GROUP BY nation, o_year ORDER BY nation, o_year DESC
    """,
    category="join",
    description="TPC-H Q9 shape: profit per supplier-nation per year over "
    "name-matched parts (no partsupp table; supply cost proxied as 10% of "
    "retail price) -- LIKE filter on the part scan, four-way join "
    "shuffling on partkey/orderkey only, broadcast nation",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    p = t["part"].filter(F.col("p_name").like("%widget%")).select(
        "p_partkey", "p_retailprice"
    )
    amount = F.expr(
        f"{micros(_REV)} - {micros('p_retailprice * 0.1 * l_quantity')}"
    )
    return (
        t["lineitem"]
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").alias("__sum_profit_us"))
        .transform(money_finish, "sum_profit")
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "q12_shipping_priority_class",
    oracle="""
    SELECT ship_speed,
           COUNT(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM (
        SELECT l_orderkey,
               CASE WHEN l_shipdate >= o_orderdate + INTERVAL 90 DAY
                    THEN 'late' ELSE 'on_time' END AS ship_speed,
               o_orderpriority
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    ) o
    GROUP BY ship_speed ORDER BY ship_speed
    """,
    category="aggregation",
    description="TPC-H Q12 shape: priority-class conditional counts by "
    "shipping-speed bucket (no l_shipmode column; the mode dimension is "
    "replaced by a lateness bucket) -- the classic "
    "CASE-inside-COUNT two-way split, one shuffle on the 2-row group key",
)
def q12_shipping_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    li = t["lineitem"].filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
    speed = F.when(
        F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"), "late"
    ).otherwise("on_time")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(speed.alias("ship_speed"), "o_orderpriority")
        .groupBy("ship_speed")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("ship_speed")
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT ROUND(100.0
             * {micros_round("num_s", 4)}
             / {micros_round("den_s", 4)}, 6) AS promo_revenue_pct
    FROM (
        SELECT SUM(CASE WHEN p.p_type = 'PROMO'
                        THEN {micros(_REVQ)} ELSE 0 END) AS num_s,
               SUM({micros(_REVQ)}) AS den_s
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    )
    """,
    category="join",
    description="TPC-H Q14: promo revenue share in one month -- "
    "conditional/total ratio, date filter pushed to the fact scan, "
    "exact integer-micros sums divided late",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    lo = F.lit("1996-03-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp_ntz")
    li = t["lineitem"].filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
    rev = F.expr(micros(_REV))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("long"))
    return (
        li.join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .agg(F.sum(promo).alias("num_s"), F.sum(rev).alias("den_s"))
        .select(
            F.round(
                F.lit(100.0)
                * F.expr(micros_round("num_s", 4))
                / F.expr(micros_round("den_s", 4)),
                6,
            ).alias("promo_revenue_pct")
        )
    )


_Q15_REVENUE = f"""
        SELECT l_suppkey AS supplier_no,
               {money_sum(_REV)} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
"""


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS ({_Q15_REVENUE})
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
    category="join",
    description="TPC-H Q15: supplier(s) with the quarter's max revenue -- "
    "the derived revenue view feeds both the join and the scalar-max "
    "subquery; exact integer-micros revenue so the equality against MAX "
    "cannot wobble at the ulp",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp_ntz")
    revenue = (
        t["lineitem"]
        .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(money_sum_agg(_REV, "total_revenue"))
        .transform(money_finish, "total_revenue")
    )
    best = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        t["supplier"]
        .join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(best), F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_part_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type NOT LIKE 'MEDIUM%'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    category="aggregation",
    description="TPC-H Q16 shape: distinct-supplier variety per part "
    "attribute cell (supplier-part pairs come from lineitem; the "
    "synthetic schema has no partsupp) -- negated predicates + IN list "
    "still push to the part scan, distinct agg expands then two-phase "
    "aggregates",
)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    p = t["part"].filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("MEDIUM%")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    return (
        t["lineitem"]
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


def _avg_yearly_7(s: str) -> str:
    """``ROUND(SUM(price)/7.0, 2)`` on an integer-micros sum ``s``:
    half-up cents of s/7, computed integer-side (engine-neutral trunc
    division; the summed prices are positive).  1 cent = 70000 micros/7."""
    t = f"(({s}) + 35000)"
    ival = f"CAST(({t} - ({t} % 70000)) / 70000 AS BIGINT)"
    return f"(CAST({ival} AS DOUBLE) / 100.0)"


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT {_avg_yearly_7("SUM(" + micros("l.l_extendedprice") + ")")} AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < (
          SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = p.p_partkey)
    """,
    category="sql",
    description="TPC-H Q17: small-quantity order revenue -- correlated "
    "scalar AVG subquery against the same fact table; Catalyst "
    "decorrelates it into an aggregate + join on partkey",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    per_part = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("avg_partkey"))
        .agg((F.lit(0.5) * F.avg("l_quantity")).alias("half_avg_qty"))
    )
    p = t["part"].filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    return (
        t["lineitem"]
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.expr("SUM(" + micros("l_extendedprice") + ")").alias("price_us"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            F.expr(_avg_yearly_7("price_us")).alias("avg_yearly"), "n_items"
        )
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           ROUND(o.o_totalprice, 2) AS o_totalprice,
           CAST(ROUND(SUM(l.l_quantity), 2) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 210)
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o_totalprice DESC, o.o_orderkey LIMIT 20
    """,
    category="join",
    description="TPC-H Q18: customers behind the largest-volume orders -- "
    "the IN subquery (aggregate + HAVING) compiles to a semi join on "
    "orderkey; quantities are integer-valued doubles so SUM is exact",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 210)
        .select("l_orderkey")
    )
    return (
        t["orders"]
        .join(big.withColumnRenamed("l_orderkey", "big_orderkey"),
              F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .agg(F.round(F.sum("l_quantity"), 2).cast("double").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {money_sum(_REVQ)} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
    category="join",
    description="TPC-H Q19: three-way disjunction of conjunctive "
    "predicates spanning both join sides -- Catalyst extracts the "
    "common single-side conjuncts (brand/size on part, quantity on "
    "lineitem) as pushed pre-filters, the full OR applies post-join",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & s.between(1, 5) & (q >= 1) & (q <= 11))
        | ((b == "Brand#23") & s.between(1, 10) & (q >= 10) & (q <= 20))
        | ((b == "Brand#34") & s.between(1, 15) & (q >= 20) & (q <= 30))
    )
    return (
        t["lineitem"]
        .join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            money_sum_agg(_REV, "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .transform(money_finish, "revenue")
    )


_Q21_SQL = """
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name LIMIT 20
"""


@register(
    "q21_waiting_suppliers",
    oracle=_Q21_SQL,
    category="sql",
    description="TPC-H Q21 shape: the sole late supplier on a failed "
    "multi-supplier order (lateness = shipped >90 days after order date; "
    "the synthetic schema has no commit/receipt dates) -- EXISTS + "
    "NOT EXISTS over the same fact with different correlation, compiled "
    "to a semi + anti join pair on orderkey; identical ANSI text on both "
    "engines",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    for name in ("supplier", "lineitem", "orders"):
        t[name].createOrReplaceTempView(name)
    return spark.sql(_Q21_SQL)


_Q22_SQL = f"""
    SELECT segment_code, numcust, {micros_round("tot_us")} AS totacctbal
    FROM (
        SELECT segment_code, COUNT(*) AS numcust,
               SUM({micros("c_acctbal")}) AS tot_us
        FROM (
            SELECT c_custkey % 7 AS segment_code, c_acctbal
            FROM customer c
            WHERE c_acctbal > (
                SELECT AVG(c_acctbal) FROM customer
                WHERE c_acctbal > 0.0 AND c_custkey % 7 IN (0, 1, 2, 3))
              AND c_custkey % 7 IN (0, 1, 2, 3)
              AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        )
        GROUP BY segment_code
    )
    ORDER BY segment_code
"""


@register(
    "q22_idle_balances",
    oracle=_Q22_SQL,
    category="sql",
    description="TPC-H Q22 shape: well-funded customers with no orders "
    "(country-code substring replaced by a custkey segment; no c_phone "
    "column) -- uncorrelated scalar AVG + NOT EXISTS anti join; "
    "identical ANSI text on both engines",
)
def q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    for name in ("customer", "orders"):
        t[name].createOrReplaceTempView(name)
    return spark.sql(_Q22_SQL)


# ---------------------------------------------------------------------------
# Q2 / Q11 / Q20: the partsupp-family shapes, adapted.  The synthetic
# schema has no partsupp table; the (l_partkey, l_suppkey) associations
# observed in lineitem stand in for it, with MIN(l_extendedprice /
# l_quantity) as the per-pair supply cost and SUM(l_quantity) as the
# available quantity.  The operator shapes -- correlated per-group MIN
# (Q2), global-fraction HAVING (Q11), aggregate-derived semi-join chain
# (Q20) -- are preserved.
# ---------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
        SELECT l_partkey AS pk, l_suppkey AS sk,
               MIN(l_extendedprice / l_quantity) AS sc
        FROM lineitem GROUP BY 1, 2
    ), eps AS (
        SELECT ps.pk, ps.sk, ps.sc, s.s_acctbal, s.s_name, n.n_name
        FROM ps
        JOIN supplier s ON s.s_suppkey = ps.sk
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
    )
    SELECT ROUND(e.s_acctbal, 2) AS s_acctbal_r, e.s_name, e.n_name,
           p.p_partkey, p.p_brand, e.sk AS s_suppkey,
           ROUND(e.sc, 2) AS supplycost_r
    FROM part p JOIN eps e ON e.pk = p.p_partkey
    WHERE p.p_size = 15
      AND e.sc = (SELECT MIN(e2.sc) FROM eps e2 WHERE e2.pk = p.p_partkey)
    ORDER BY s_acctbal_r DESC, n_name, s_name, p_partkey, s_suppkey
    LIMIT 20
    """,
    category="join",
    description="TPC-H Q2 shape: min-supply-cost supplier per part in a "
    "region -- correlated per-group MIN (window-min + filter on the Spark "
    "side), fixed dims broadcast, the derived partsupp association joined "
    "once",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    ps = (
        t["lineitem"]
        .groupBy(
            F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("sc"))
    )
    eps = (
        ps.join(t["supplier"], ps["sk"] == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "EUROPE")
        .select("pk", "sk", "sc", "s_acctbal", "s_name", "n_name")
    )
    msc = F.min("sc").over(Window.partitionBy("pk"))
    best = eps.withColumn("msc", msc).where(F.col("sc") == F.col("msc"))
    return (
        t["part"]
        .where(F.col("p_size") == 15)
        .join(best, F.col("p_partkey") == best["pk"])
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal_r"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.col("sk").alias("s_suppkey"),
            F.round("sc", 2).alias("supplycost_r"),
        )
        .orderBy(
            F.col("s_acctbal_r").desc(), "n_name", "s_name", "p_partkey", "s_suppkey"
        )
        .limit(20)
    )


@register(
    "q11_important_parts",
    oracle=f"""
    WITH v AS (
        SELECT l_partkey,
               SUM({micros(_REV)}) AS v
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_7'
        GROUP BY 1
    ), g AS (
        SELECT CAST(SUM(v) AS DOUBLE) AS total, COUNT(*) AS n FROM v
    )
    SELECT v.l_partkey,
           {micros_round("v.v", 2)} AS part_value
    FROM v, g
    WHERE CAST(v.v AS DOUBLE) * g.n * 100 > 130 * g.total
    ORDER BY part_value DESC, l_partkey
    """,
    category="aggregation",
    description="TPC-H Q11 shape: per-part value filtered against a "
    "fraction of the GLOBAL total (1.3x the mean) -- the "
    "aggregate-vs-scalar-subquery HAVING pattern; the global total is a "
    "1-row broadcast combine, exact integer-micros sums on both engines",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    v = (
        t["lineitem"]
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .where(F.col("n_name") == "NATION_7")
        .groupBy("l_partkey")
        .agg(F.sum(F.expr(micros(_REV))).alias("v"))
    )
    g = v.agg(
        F.sum("v").cast("double").alias("total"), F.count(F.lit(1)).alias("n")
    )
    return (
        v.crossJoin(g)
        .where(F.col("v").cast("double") * F.col("n") * 100 > 130 * F.col("total"))
        .select(
            "l_partkey", F.expr(micros_round("v", 2)).alias("part_value")
        )
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


@register(
    "q20_excess_suppliers",
    oracle="""
    WITH pq AS (
        SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY 1, 2
    )
    SELECT s.s_suppkey, s.s_name, ROUND(s.s_acctbal, 2) AS s_acctbal_r
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_3'
      AND s.s_suppkey IN (
          SELECT pq.l_suppkey
          FROM pq JOIN part p ON p.p_partkey = pq.l_partkey
          WHERE p.p_name LIKE '%bolt%' AND pq.qty > 40)
    ORDER BY s_suppkey
    """,
    category="join",
    description="TPC-H Q20 shape: suppliers with excess shipped quantity "
    "of a part family in a year -- an aggregate-derived candidate set "
    "consumed by a LEFT SEMI join (no row multiplication), date filter on "
    "the scan",
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    pq = (
        t["lineitem"]
        .where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    eligible = (
        pq.join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .where(F.col("p_name").contains("bolt") & (F.col("qty") > 40))
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .where(F.col("n_name") == "NATION_3")
        .join(eligible, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal_r"))
        .orderBy("s_suppkey")
    )
