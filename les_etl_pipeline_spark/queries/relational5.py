"""Third relational analytics pack: the remaining TPC-H shapes the
testdata schema can express (q10 returned-item reporting, q14 promotion
effect, q15 top supplier via revenue view, q18 large-volume customers,
q19 OR-of-ANDs predicate join) plus two adapted shapes for the columns
the synthetic tables lack (q12 -> shipping-delay by priority, q21 ->
sole-returner suppliers via EXISTS / NOT EXISTS self-joins).

Plan notes (100 TB posture):
- q10: facts join on their keys (shuffle), nation broadcast; top-k via
  TakeOrderedAndProject, never a global sort.
- q14: single pass over lineitem joined to part on partkey; conditional
  aggregation — no second scan for the numerator.
- q15: revenue agg once, then a 1-row max broadcast back — the classic
  scalar-subquery-as-broadcast-join; no window over the whole table.
- q18: groupBy orderkey HAVING, then the big-order keys (tiny set)
  semi-join back into orders/customer — filter before the wide join.
- q19: predicate pushed below the join where it references one side
  only; the OR-of-ANDs residual evaluates post-join without explosion.
- q12_shape: one shuffle on the groupBy key; the lateness predicate is
  a scan-level expression (shipdate - orderdate), pushdown-friendly.
- q21_shape: three passes over lineitem expressed as aggregate
  fingerprints per (orderkey) — NOT correlated per-row subqueries; the
  exists/not-exists become one groupBy + joins, O(1) shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.rounding import cents_sum, hround
from .registry import register


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue_cents DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: customers who returned items in a quarter-half, ranked
    by lost revenue. Filters sit below the joins (orderdate on orders,
    returnflag on lineitem -> parquet pushdown); nation broadcasts; the
    top-20 compiles to TakeOrderedAndProject, no global sort."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = F.broadcast(table(spark, sf_dir, "nation"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(cents_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue_cents"))
        .select("c_custkey", "c_name", "revenue_cents", "n_name")
        .orderBy(F.desc("revenue_cents"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q14_promo_effect",
    oracle="""
    SELECT (floor((100.0 * sum(CASE WHEN p_type = 'PROMO'
                       THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0)
           AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-02-01'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: share of revenue from PROMO parts in one month. One
    pass: conditional sum in the same aggregate as the denominator —
    never two scans. Date filter pushed to the lineitem scan; part joins
    on partkey (broadcast at small SF, AQE decides at scale)."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-02-01")
    )
    part = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            hround(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev)
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             (floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the max quarterly revenue. The
    revenue agg runs ONCE; the max is a 1-row aggregate broadcast back
    as a join (scalar-subquery shape) — not a global window, and not a
    second scan of lineitem."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(hround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("total_revenue"))
    )
    # localCheckpoint-free reuse: Spark plans the agg subtree twice, but
    # AQE reuses the exchange (ReusedExchange) — the scan+agg runs once.
    max_rev = F.broadcast(revenue.agg(F.max("total_revenue").alias("max_rev")))
    sup = table(spark, sf_dir, "supplier")
    return (
        sup.join(revenue, sup.s_suppkey == revenue.supplier_no)
        .join(max_rev, F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q18_large_volume_customer",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           sum(l_quantity) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a threshold, with
    their customers. The HAVING subquery runs first and yields a TINY
    key set; orders/lineitem are semi-joined against it BEFORE the wide
    customer join — filter early, join late."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 150)
        .select("l_orderkey")
    )
    orders = table(spark, sf_dir, "orders").join(
        big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi"
    )
    cust = table(spark, sf_dir, "customer")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q19_discounted_revenue",
    oracle="""
    SELECT (floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 10 AND l_quantity <= 35)
       OR (p_brand = 'Brand#5' AND p_size BETWEEN 20 AND 50
           AND l_quantity >= 20 AND l_quantity <= 50)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate across both join sides.
    Catalyst derives the single-side implications (p_brand IN (...),
    p_size <= 50, l_quantity <= 50) and pushes them below the join; the
    mixed residual evaluates on joined rows only."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    j = li.join(part, part.p_partkey == li.l_partkey)
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    pred = (
        ((b == "Brand#11") & s.between(1, 15) & q.between(1, 20))
        | ((b == "Brand#22") & s.between(10, 30) & q.between(10, 35))
        | ((b == "Brand#5") & s.between(20, 50) & q.between(20, 50))
    )
    return j.where(pred).agg(
        hround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue")
    )


@register(
    "q12_shipping_delay",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90
                    THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
           count(*) AS line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q12_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted (testdata has no shipmode/commit/receipt
    dates): late-shipment counts per order priority, lateness =
    shipdate > orderdate + 90 days. One fact-fact join on orderkey, one
    groupBy on a 5-value domain — map-side partial aggregation does
    almost all the work."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    late = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(late, 1).otherwise(0)).alias("late_count"),
            F.count(F.lit(1)).alias("line_count"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q21_sole_returner_suppliers",
    oracle="""
    WITH order_stats AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_ret_supp
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT s_name, count(*) AS numwait
    FROM (
      SELECT DISTINCT l.l_suppkey, l.l_orderkey
      FROM lineitem l
      JOIN order_stats os ON l.l_orderkey = os.l_orderkey
      WHERE l.l_returnflag = 'R'
        AND os.n_supp > 1 AND os.n_ret_supp = 1
    ) flagged
    JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 25
    """,
)
def q21_sole_returner_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape adapted (no commit/receipt dates -> returnflag
    stands in for lateness): suppliers who were the ONLY supplier with
    returned lines on a multi-supplier order. The reference Q21 plan is
    EXISTS + NOT EXISTS correlated self-joins on lineitem; here both
    collapse into ONE aggregate fingerprint per orderkey (n_supp,
    n_ret_supp) joined back — one groupBy + one join instead of two
    per-row semi/anti passes over the fact table."""
    li = table(spark, sf_dir, "lineitem")
    order_stats = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))).alias("n_ret_supp"),
    )
    flagged = (
        li.where(F.col("l_returnflag") == "R")
        .join(order_stats.where((F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1)), "l_orderkey")
        .select("l_suppkey", "l_orderkey")
        .distinct()
    )
    sup = table(spark, sf_dir, "supplier")
    return (
        flagged.join(sup, flagged.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(25)
    )
