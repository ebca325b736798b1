"""Second relational analytics pack: TPC-H shapes the first packs didn't
cover (bi-national volume q7, distribution q13, anti-join q22) and an
event-funnel analysis — plus the approximate-percentile scale twin.

Plan notes (100 TB posture):
- q7: two nation dims broadcast; the fact joins shuffle on their keys.
- q13: left join + two-level aggregation; the second groupBy is on the
  tiny distinct-count domain.
- q22: scalar subquery broadcast (1 row), anti join is a broadcast-able
  semi-structure; no row explosion anywhere.
- funnel: ONE exchange on user_id reused by all three chained window
  stages (same partitioning) — the whole funnel is a single shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import table
from ..functions.rounding import hround
from .registry import register


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           (floor((sum(volume)) * 100.0 + 0.5) / 100.0) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    ) GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue flow between two nations by year. The two
    nation dims broadcast (25 rows); supplier/customer join in, facts
    shuffle on their keys."""
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    n1 = F.broadcast(nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")))
    joined = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .where(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(hround(F.sum("volume")).alias("revenue"))
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count distribution over customers. Left
    join keeps zero-order customers; second aggregation groups on the
    tiny count domain."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q22_dormant_accounts",
    oracle="""
    SELECT n_name,
           count(*) AS n_custs,
           (floor((sum(c_acctbal)) * 100.0 + 0.5) / 100.0) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY n_name
    """,
)
def q22_dormant_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (phone prefixes adapted to nations): customers
    with above-average balance and no orders since 2000 (every customer
    in the synthetic data has SOME order, so dormancy is time-bounded).
    Scalar subquery is a 1-row broadcast; NOT EXISTS is a left-anti
    join against the filtered order set."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = cust.join(F.broadcast(avg_bal)).where(F.col("c_acctbal") > F.col("avg_bal"))
    recent = orders.where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    dormant = rich.join(
        recent.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
    )
    return (
        dormant.join(F.broadcast(nation), dormant.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            hround(F.sum("c_acctbal")).alias("total_bal"),
        )
    )


@register(
    "funnel_conversion",
    oracle="""
    WITH s1 AS (
      SELECT user_id, ts, event_type,
             min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS first_view
      FROM events
    ), s2 AS (
      SELECT *, min(CASE WHEN event_type = 'click' AND ts >= first_view THEN ts END)
                  OVER (PARTITION BY user_id) AS first_click
      FROM s1
    ), s3 AS (
      SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= first_click THEN ts END)
                  OVER (PARTITION BY user_id) AS first_purchase
      FROM s2
    ), per_user AS (
      SELECT user_id, max(first_view) AS v, max(first_click) AS c,
             max(first_purchase) AS p
      FROM s3 GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           CAST(sum(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
           CAST(sum(CASE WHEN c IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked,
           CAST(sum(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchased
    FROM per_user
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event funnel view -> click-after-view -> purchase-after-click.
    Three chained window stages share the user_id partitioning, so the
    whole funnel costs ONE exchange; the per-user rollup reuses it too."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id")
    s1 = ev.withColumn(
        "first_view", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    s2 = s1.withColumn(
        "first_click",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") >= F.col("first_view")),
                F.col("ts"),
            )
        ).over(w),
    )
    s3 = s2.withColumn(
        "first_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.col("first_click")),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = s3.groupBy("user_id").agg(
        F.max("first_view").alias("v"),
        F.max("first_click").alias("c"),
        F.max("first_purchase").alias("p"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("v").isNotNull().cast("long")).alias("n_viewed"),
        F.sum(F.col("c").isNotNull().cast("long")).alias("n_clicked"),
        F.sum(F.col("p").isNotNull().cast("long")).alias("n_purchased"),
    )


@register("agg_approx_percentiles")  # sketch-based -> rows-only check
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (KLL-style sketch): the mergeable scale twin of
    agg_exact_percentiles — partials combine map-side, no global sort.
    Approximate by construction -> rows-only driver check; accuracy is
    bounded against the exact form in tests/test_properties.py."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000).alias("pcts")
    ).select(
        "l_returnflag",
        F.col("pcts")[0].alias("p50"),
        F.col("pcts")[1].alias("p95"),
        F.col("pcts")[2].alias("p99"),
    )
